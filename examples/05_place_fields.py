"""Post-fit GPLVM place-field analysis at notebook depth.

End-to-end port of the reference's ``post-fit-GPLVM-place-fields.ipynb``
(16 code cells) on synthetic data: fit + persist a model and its decode
results, then reload both the way the notebook does (cells 0-1's
``pickle.load`` / ``np.load``) -> decoded-posterior heatmap with the
binned position overlaid (cells 11-12) -> speed estimation with a
movement threshold and its histogram (cell 14) -> decode accuracy split
by moving vs stationary -> posterior-weighted position per latent bin
(the post-fit place-field mapping, reference analysis_helper.py:11-30)
-> peak-sorted tuning-curve ratemap + latent-field widths ->
expected-rate reconstruction check (reference core.py:716-733).
"""

import os
import pickle
import tempfile

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import jax.numpy as jnp
import jax.random as jr
from scipy.ndimage import gaussian_filter1d

import poor_man_gplvm_tpu as pmg
from poor_man_gplvm_tpu import analysis
from poor_man_gplvm_tpu.plotting import save_fig
from poor_man_gplvm_tpu.utils import post_fit_sort_neuron
from poor_man_gplvm_tpu.utils.timeseries import Tsd, TsdFrame

OUT_DIR = os.environ.get("PMG_EXAMPLE_OUT", tempfile.mkdtemp(prefix="pmg05_"))
FIG_DIR = os.path.join(OUT_DIR, "figures")
os.makedirs(FIG_DIR, exist_ok=True)

# ---------------------------------------------------------------------------
# Synthetic linear-maze session with place-field units
# ---------------------------------------------------------------------------
rng = np.random.default_rng(5)
T, DT, N, L = 2000, 0.01, 18, 20
pos = np.cumsum(rng.normal(0, 0.3, T))
pos = (pos - pos.min()) / (pos.max() - pos.min() + 1e-12)
times = np.arange(T) * DT

centers = rng.uniform(0, 1, N)
widths = rng.uniform(0.05, 0.12, N)
peak = rng.uniform(5.0, 14.0, N)
rates = peak[None, :] * np.exp(
    -0.5 * ((pos[:, None] - centers[None, :]) / widths[None, :]) ** 2
) + 0.2
spk = rng.poisson(rates * DT).astype(np.float32)

# ---------------------------------------------------------------------------
# Fit, persist, reload (notebook cells 0-1: the pickle/np.load contract)
# ---------------------------------------------------------------------------
model = pmg.PoissonGPLVMJump1D(
    N, n_latent_bin=L, movement_variance=1.0, tuning_lengthscale=8.0
)
# the notebook analyzes an already-fitted production model; anchor the
# latent to binned position with a supervised init (initializers.py) so
# the post-fit analyses below see a comparable-quality fit
from poor_man_gplvm_tpu.initializers import init_with_label_1D

pos_edges0 = np.linspace(pos.min(), pos.max(), L + 1)
pos_bins0 = np.clip(np.digitize(pos, pos_edges0) - 1, 0, L - 1)
lp_init = jnp.asarray(init_with_label_1D(pos_bins0.astype(float),
                                         n_latent_bin=L))
em_res = model.fit_em(jnp.asarray(spk), key=jr.PRNGKey(0), n_iter=4,
                      log_posterior_init=lp_init, verboase=False)
dec = model.decode_latent(jnp.asarray(spk))

model_path = os.path.join(OUT_DIR, "model.pkl")
results_path = os.path.join(OUT_DIR, "decode_results.npz")
with open(model_path, "wb") as f:
    pickle.dump(model, f)  # jit closures are dropped (reference core.py:757)
np.savez(
    results_path,
    posterior_latent_marg=np.asarray(dec["posterior_latent_marg"]),
    posterior_dynamics_marg=np.asarray(dec["posterior_dynamics_marg"]),
    log_marginal_l=np.asarray(em_res["log_marginal_l"]),
)
with open(model_path, "rb") as f:
    model = pickle.load(f)
results = np.load(results_path)
posterior = results["posterior_latent_marg"]
print(f"reloaded model + results: posterior {posterior.shape}, "
      f"keys {sorted(results.keys())}")

# ---------------------------------------------------------------------------
# Position discretization + posterior heatmap overlay (cells 11-12)
# ---------------------------------------------------------------------------
pos_edges = np.linspace(pos.min(), pos.max(), L + 1)
pos_bin_idx = np.clip(np.digitize(pos, pos_edges) - 1, 0, L - 1)

fig, ax = plt.subplots(figsize=(12, 4))
im = ax.imshow(posterior.T, aspect="auto", origin="lower", cmap="viridis",
               extent=[times[0], times[-1], 0, L])
ax.plot(times, pos_bin_idx, color="white", linewidth=1.2, alpha=0.6,
        label="position")
fig.colorbar(im, label="posterior")
ax.set_xlabel("time (s)")
ax.set_ylabel("latent bin")
ax.set_title("decoded latent vs position")
save_fig(fig, "posterior_overlay", fig_dir=FIG_DIR, fig_format="png",
         do_close=True)

# ---------------------------------------------------------------------------
# Speed threshold (cell 14): moving vs stationary decode accuracy
# ---------------------------------------------------------------------------
pos_smooth = gaussian_filter1d(pos, sigma=2)
speed = np.abs(gaussian_filter1d(np.gradient(pos_smooth, times), sigma=2))
SPEED_THRESHOLD = float(np.median(speed))
moving = speed >= SPEED_THRESHOLD

fig, ax = plt.subplots(figsize=(6, 3))
ax.hist(speed, bins=60, color="gray", alpha=0.7)
ax.axvline(SPEED_THRESHOLD, color="red", linestyle="--",
           label=f"threshold = median = {SPEED_THRESHOLD:.3f}")
ax.set_xlabel("speed")
ax.legend()
save_fig(fig, "speed_hist", fig_dir=FIG_DIR, fig_format="png",
         do_close=True)

map_bin = posterior.argmax(axis=1)
# the latent is identifiable only up to order; align sign via correlation
sign = np.sign(np.corrcoef(map_bin, pos_bin_idx)[0, 1] or 1.0)
aligned = map_bin if sign > 0 else (L - 1 - map_bin)
err = np.abs(aligned - pos_bin_idx)
print(f"median decode |err|: moving {np.median(err[moving]):.1f} bins, "
      f"stationary {np.median(err[~moving]):.1f} bins "
      f"({moving.mean():.0%} of time moving)")

# ---------------------------------------------------------------------------
# Posterior-weighted position per latent bin — the post-fit "place field"
# of each latent state (reference analysis_helper.py:11-30)
# ---------------------------------------------------------------------------
pwa = analysis.get_posterior_weighted_average(
    Tsd(d=pos, t=times), TsdFrame(d=posterior, t=times)
)
pwa = np.asarray(pwa)
rho = np.corrcoef(np.arange(L), pwa)[0, 1]
print(f"latent-bin vs position-field correlation: {abs(rho):.2f} "
      "(identifiable up to mirror flip)")

fig, ax = plt.subplots(figsize=(5, 3.2))
ax.plot(np.arange(L), pwa, marker="o")
ax.set_xlabel("latent bin")
ax.set_ylabel("posterior-weighted position")
save_fig(fig, "latent_position_map", fig_dir=FIG_DIR, fig_format="png",
         do_close=True)

# ---------------------------------------------------------------------------
# Peak-sorted tuning ratemap + latent-field widths
# ---------------------------------------------------------------------------
sort_res = post_fit_sort_neuron({"tuning": np.asarray(model.tuning)},
                                spk=spk, do_norm="max")
tuning_sorted = np.asarray(model.tuning)[:, sort_res["argsort"]]
fig, ax = plt.subplots(figsize=(5, 4))
ax.imshow((tuning_sorted / tuning_sorted.max(axis=0)).T, aspect="auto",
          origin="lower", cmap="viridis")
ax.set_xlabel("latent bin")
ax.set_ylabel("unit (peak-sorted)")
ax.set_title("fitted tuning curves")
save_fig(fig, "tuning_ratemap", fig_dir=FIG_DIR, fig_format="png",
         do_close=True)

half_widths = []
for n in range(N):
    tc = np.asarray(model.tuning)[:, n]
    half_widths.append(int((tc >= 0.5 * tc.max()).sum()))
print(f"latent-field half-max widths: median {np.median(half_widths):.0f} "
      f"bins (range {min(half_widths)}-{max(half_widths)})")

# ---------------------------------------------------------------------------
# Expected-rate reconstruction (reference core.py:716-733)
# ---------------------------------------------------------------------------
expected = np.asarray(model.predict_expected_rate(posterior)) * DT
obs_mean = spk.mean(axis=0)
exp_mean = expected.mean(axis=0)
r = np.corrcoef(obs_mean, exp_mean)[0, 1]
print(f"observed vs expected mean-count correlation across units: {r:.3f}")
print(f"figures in {FIG_DIR}")
