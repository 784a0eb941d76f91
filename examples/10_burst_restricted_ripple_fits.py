"""Burst-restricted GPLVM fits across two probes (ripple-type tunings).

End-to-end port of the reference's ``ripple-type-GPLVM-tunings.ipynb``
(33 cells): compute z-scored/smoothed MUA per probe -> detect population
bursts -> merge + classify burst subtypes across probes (synchronous /
leading / lagging / local, cell 12) -> fit the GPLVM restricted to burst
bins -> convergence + tuning-curve grid (cell 20) -> decode (cell 21) ->
pickle save/load round-trip (cells 22-23) -> posterior heatmap (cell 27)
-> per-subtype latent activation distributions (cells 29-30).

Synthetic stand-in for the notebook's cell-metrics session: two probes
record the same latent process; bursts are epochs of globally elevated
rate, offset between probes so every subtype occurs.
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
from scipy.stats import zscore

import poor_man_gplvm_tpu as pmg
from poor_man_gplvm_tpu.data import (
    detect_population_bursts,
    merge_overlapping_bursts_two_probes,
)
from poor_man_gplvm_tpu.plotting import save_fig, shade_intervals, \
    subplots_wrapper

OUT_DIR = os.environ.get("PMG_EXAMPLE_OUT", tempfile.mkdtemp(prefix="pmg10_"))
FIG_DIR = os.path.join(OUT_DIR, "figures")
os.makedirs(FIG_DIR, exist_ok=True)

# ---------------------------------------------------------------------------
# Synthetic two-probe session with population bursts
# ---------------------------------------------------------------------------
T, N, L = 1000, 16, 15
STEP_SIZE = 0.01  # notebook's spike-count step (s)
rng = np.random.default_rng(0)
gen = pmg.PoissonGPLVMJump1D(N, n_latent_bin=L, tuning_lengthscale=3.0)
state_l, base_spk = gen.sample(T, key=jr.PRNGKey(0))
latent_path = np.asarray(state_l)[:, 1]

# burst gain envelope: probe B's bursts lag probe A's by a couple of bins
# except one synchronous and one A-only (local) event
burst_centers_a = [120, 330, 560, 800]
lags_b = [0, 3, -3, None]  # None -> local to probe A; negative -> B leads
gain = {"A": np.ones(T), "B": np.ones(T)}
for c, lag in zip(burst_centers_a, lags_b):
    gain["A"][c : c + 12] = 5.0
    if lag is not None:
        gain["B"][c + lag : c + lag + 12] = 5.0
spk = {p: rng.poisson(np.asarray(base_spk) * gain[p][:, None] + 0.02)
       .astype(np.float32) for p in "AB"}
time_bins = np.arange(T) * STEP_SIZE

# ---------------------------------------------------------------------------
# MUA -> burst detection per probe (notebook cells 8-10;
# reference core.py:1375-1420)
# ---------------------------------------------------------------------------
data_dict = {}
for probe in "AB":
    mua = spk[probe].sum(axis=1)
    zmua = zscore(gaussian_filter1d(mua.astype(float), sigma=1))
    boundaries = detect_population_bursts(
        zmua, BURST_THRESHOLD=1.5, BURST_BOUNDARY_THRESHOLD=0.5,
        MIN_BURST_DURATION=0.03, MIN_INTERBURST_INTERVAL=0.1,
        STEP_SIZE=STEP_SIZE,
    )
    data_dict[probe] = {
        "time_bins": time_bins,
        "burst_boundaries": boundaries,
        "zmoothed_mua": zmua,
    }
    print(f"probe {probe}: {len(boundaries)} population bursts")

# ---------------------------------------------------------------------------
# Merge overlapping bursts across probes + subtype classification
# (notebook cells 11-12; reference core.py:1266-1372)
# ---------------------------------------------------------------------------
merged_a, merged_b, groups = merge_overlapping_bursts_two_probes(
    data_dict, "A", "B", end_inclusive=True, strict_overlap=True
)
SYNCHRONY_THRESHOLD = 0.02  # s (scaled to the synthetic bin width)
subtypes = []
for g in groups:
    if g["A_time"] is None or g["B_time"] is None:
        subtypes.append("local")
    elif abs(g["A_time"][0] - g["B_time"][0]) <= SYNCHRONY_THRESHOLD:
        subtypes.append("synchronous")
    elif g["A_time"][0] < g["B_time"][0]:
        subtypes.append("leading")   # A starts first
    else:
        subtypes.append("lagging")
print("burst subtypes:", {s: subtypes.count(s) for s in set(subtypes)})

# ---------------------------------------------------------------------------
# Burst-restricted GPLVM fit on probe A (notebook cell 18): only burst
# bins contribute to the likelihood, via the spatio-temporal neuron mask
# ---------------------------------------------------------------------------
ma = np.zeros((T, N), dtype=np.float32)
for s, e in data_dict["A"]["burst_boundaries"]:
    ma[s : e + 1] = 1.0
model = pmg.PoissonGPLVMJump1D(
    N, n_latent_bin=L, movement_variance=0.5, tuning_lengthscale=3.0
)
em_res = model.fit_em(
    spk["A"], key=jr.PRNGKey(3), n_iter=8, ma_neuron=jnp.asarray(ma),
    verboase=False,
)
lml = np.asarray(em_res["log_marginal_l"])
assert lml[-1] > lml[0]
print(f"burst-restricted fit: lml {lml[0]:.0f} -> {lml[-1]:.0f}")

# convergence + tuning-curve grid (notebook cell 20)
fig, axs = subplots_wrapper(1 + min(8, N), basewidth=3, baseheight=2)
axs = np.atleast_1d(axs).ravel()
axs[0].plot(lml, lw=2)
axs[0].set(xlabel="EM iteration", ylabel="log marginal")
tuning = np.asarray(model.tuning)
for k in range(min(8, N)):
    axs[k + 1].plot(tuning[:, k])
    axs[k + 1].set_title(f"unit {k}", fontsize=7)
save_fig(fig, "burst_fit_tunings", fig_dir=FIG_DIR, fig_format=("png",))

# ---------------------------------------------------------------------------
# Decode + pickle save/load round-trip (notebook cells 21-23): the loaded
# model must decode identically without refitting
# ---------------------------------------------------------------------------
decode_res = model.decode_latent(spk["A"])
model_path = os.path.join(OUT_DIR, "gplvm_model_burst_fit.pkl")
with open(model_path, "wb") as f:
    pickle.dump(model, f, protocol=pickle.HIGHEST_PROTOCOL)
with open(model_path, "rb") as f:
    model_loaded = pickle.load(f)
decode_res2 = model_loaded.decode_latent(spk["A"])
np.testing.assert_allclose(
    np.asarray(decode_res2["posterior_latent_marg"]),
    np.asarray(decode_res["posterior_latent_marg"]), atol=1e-6,
)
print(f"pickle round-trip OK -> {model_path}")

# posterior heatmap with bursts shaded (notebook cell 27)
posterior = np.asarray(decode_res["posterior_latent_marg"])
fig, ax = plt.subplots(figsize=(10, 3))
ax.imshow(posterior.T, aspect="auto", origin="lower", cmap="viridis",
          extent=[time_bins[0], time_bins[-1], 0, L])
ax.plot(time_bins, latent_path, color="w", lw=1, alpha=0.6)
shade_intervals(
    [ax],
    [(time_bins[s], time_bins[e]) for s, e in
     data_dict["A"]["burst_boundaries"]],
)
ax.set(xlabel="time (s)", ylabel="latent bin",
       title="decoded latent (bursts shaded)")
save_fig(fig, "burst_posterior", fig_dir=FIG_DIR, fig_format=("png",))

# ---------------------------------------------------------------------------
# Latent activation distributions per burst subtype (notebook cells 29-30):
# mean decoded posterior within each subtype's merged probe-A intervals
# ---------------------------------------------------------------------------
activation = {}
for subtype in ("synchronous", "leading", "lagging", "local"):
    rows = []
    for g, st in zip(groups, subtypes):
        if st != subtype or g["A_time"] is None:
            continue
        s = np.searchsorted(time_bins, g["A_time"][0])
        e = np.searchsorted(time_bins, g["A_time"][1])
        rows.append(posterior[s : e + 1].mean(axis=0))
    if rows:
        activation[subtype] = np.mean(rows, axis=0)

fig, ax = plt.subplots(figsize=(6, 3))
for subtype, dist in activation.items():
    ax.plot(dist, label=subtype)
ax.set(xlabel="latent bin", ylabel="mean posterior",
       title="activation by burst subtype")
ax.legend(fontsize=7)
save_fig(fig, "activation_by_subtype", fig_dir=FIG_DIR, fig_format=("png",))
print(f"activation distributions for {sorted(activation)} -> {FIG_DIR}")
