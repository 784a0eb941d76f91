"""Bilateral L/R Bayesian decoding at notebook depth.

End-to-end port of the reference's ``bayessian_decoding.ipynb`` (18 code
cells) on synthetic data: build per-hemisphere spike-count matrices ->
filter units on total spikes / mean rate / presence ratio (cell 2) ->
place fields + occupancy normalization + sort by field peak (cell 7) ->
raster + position figure (cell 8) -> supervised ``log_posterior_init``
from binned position (cell 9) -> fit a ``PoissonGPLVMJump1D`` per
hemisphere with ``n_iter=1`` ("Bayesian inference" mode, cell 10) ->
EM monitor (cell 11) -> L/R tuning-curve comparison (cell 12) ->
``decode_latent`` with latent posteriors + jump probabilities
(cells 13-14) -> decode-vs-position accuracy, plus the naive-Bayes
baseline decoders with Hardcastle blocked CV that the fork's root
``core.py`` provides (reference root core.py:1522-1845).
"""

import os
import tempfile

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import jax.numpy as jnp
import jax.random as jr

import poor_man_gplvm_tpu as pmg
from poor_man_gplvm_tpu.data import (
    DecoderDataset,
    GaussianBayesDecoder,
    PoissonBayesDecoder,
    get_presence_ratio,
)
from poor_man_gplvm_tpu.initializers import init_with_label_1D
from poor_man_gplvm_tpu.plotting import save_fig
from poor_man_gplvm_tpu.utils import post_fit_sort_neuron

OUT_DIR = os.environ.get("PMG_EXAMPLE_OUT", tempfile.mkdtemp(prefix="pmg03_"))
FIG_DIR = os.path.join(OUT_DIR, "figures")
os.makedirs(FIG_DIR, exist_ok=True)

# ---------------------------------------------------------------------------
# Synthetic bilateral session (stand-in for the notebook's 4-probe
# Kilosort + OptiTrack linear-maze recording)
# ---------------------------------------------------------------------------
rng = np.random.default_rng(0)
T, DT = 2000, 0.01
N_SPATIAL_BINS = 20
N_GOOD_PER_HEMI, N_BAD_PER_HEMI = 14, 4

# smooth 1-D position walk on a linear maze, binned like notebook cell 5
pos = np.cumsum(rng.normal(0, 0.35, T))
pos = (pos - pos.min()) / (pos.max() - pos.min() + 1e-12)
bin_edges = np.linspace(0.0, 1.0, N_SPATIAL_BINS + 1)
pos_bins = np.clip(
    np.digitize(pos, bin_edges) - 1, 0, N_SPATIAL_BINS - 1
)
times = np.arange(T) * DT


def hemisphere_population(seed, n_good, n_bad):
    """Place-field units + deliberately-bad units (low-rate, half-absent)
    so the notebook's quality filtering has something to reject."""
    r = np.random.default_rng(seed)
    centers = r.uniform(0, 1, n_good)
    widths = r.uniform(0.06, 0.15, n_good)
    peak = r.uniform(4.0, 12.0, n_good)  # Hz
    rates = peak[None, :] * np.exp(
        -0.5 * ((pos[:, None] - centers[None, :]) / widths[None, :]) ** 2
    ) + 2.0  # 2 Hz baseline keeps good units above the presence threshold
    counts = r.poisson(rates * DT).astype(np.float64)
    # bad units: near-silent, or silent for the second half of the session
    bad = r.poisson(0.002, size=(T, n_bad)).astype(np.float64)
    bad[T // 2:, n_bad // 2:] = 0.0
    return np.concatenate([counts, bad], axis=1)


spk_d = {
    "L": hemisphere_population(1, N_GOOD_PER_HEMI, N_BAD_PER_HEMI),
    "R": hemisphere_population(2, N_GOOD_PER_HEMI, N_BAD_PER_HEMI),
}

# ---------------------------------------------------------------------------
# Unit filtering (notebook cell 2): total spikes, mean rate, presence ratio
# ---------------------------------------------------------------------------
MIN_TOTAL_SPIKES = 20
MIN_MEAN_RATE_HZ = 0.1
MIN_PRESENCE_RATIO = 0.6
N_COARSE_BINS = 20

for hemi, counts in spk_d.items():
    total_spikes = counts.sum(axis=0)
    mean_rates = counts.mean(axis=0) / DT
    presence = get_presence_ratio(counts.T, times, N_COARSE_BINS)
    mask = (
        (total_spikes >= MIN_TOTAL_SPIKES)
        & (mean_rates >= MIN_MEAN_RATE_HZ)
        & (presence >= MIN_PRESENCE_RATIO)
    )
    print(f"hemisphere {hemi}: keeping {mask.sum()} / {len(mask)} units "
          "after filtering")
    spk_d[hemi] = counts[:, mask]

# ---------------------------------------------------------------------------
# Place fields + sort by field peak (notebook cell 7)
# ---------------------------------------------------------------------------
occ = np.bincount(pos_bins, minlength=N_SPATIAL_BINS).astype(float)
occ_safe = np.where(occ > 0, occ, np.nan)

place_fields = {}
order_d = {}
for hemi, counts in spk_d.items():
    pf_sum = np.zeros((N_SPATIAL_BINS, counts.shape[1]))
    np.add.at(pf_sum, pos_bins, counts)
    pf_rate = pf_sum / occ_safe[:, None] / DT  # Hz per spatial bin
    place_fields[hemi] = pf_rate
    # same peak-sort the library applies post-fit (reference utils.py:43-78)
    order = post_fit_sort_neuron({"tuning": np.nan_to_num(pf_rate)})["argsort"]
    order_d[hemi] = order
    spk_d[hemi] = counts[:, order]
    place_fields[hemi] = pf_rate[:, order]

fig, axs = plt.subplots(1, 2, figsize=(9, 4), sharey=True)
for ax, hemi in zip(axs, ("L", "R")):
    pf = place_fields[hemi]
    ax.imshow((pf / np.nanmax(pf, axis=0)).T, aspect="auto",
              origin="lower", cmap="viridis")
    ax.set_title(f"place fields ({hemi}), peak-sorted")
    ax.set_xlabel("position bin")
axs[0].set_ylabel("unit (sorted)")
save_fig(fig, "place_fields", fig_dir=FIG_DIR, fig_format="png",
         do_close=True)

# ---------------------------------------------------------------------------
# Raster + position figure (notebook cell 8)
# ---------------------------------------------------------------------------
START, STOP = 0, 600
fig, axs = plt.subplots(3, 1, figsize=(10, 6), sharex=True)
for ax, hemi in zip(axs[:2], ("L", "R")):
    ax.imshow(spk_d[hemi][START:STOP].T, aspect="auto", cmap="Purples",
              vmin=0, vmax=1, interpolation="nearest")
    ax.set_ylabel(f"unit ({hemi})")
axs[2].plot(np.arange(STOP - START), pos_bins[START:STOP], color="blue")
axs[2].set_ylabel("position bin")
axs[2].set_xlabel(f"time bin ({DT * 1e3:.0f} ms)")
axs[2].invert_yaxis()
save_fig(fig, "raster_position", fig_dir=FIG_DIR, fig_format="png",
         do_close=True)

# ---------------------------------------------------------------------------
# Supervised init from binned position (notebook cell 9; the library's
# init_with_label_1D reproduces the one-hot + floor + log construction)
# ---------------------------------------------------------------------------
log_posterior_init = jnp.asarray(
    init_with_label_1D(pos_bins.astype(float), n_latent_bin=N_SPATIAL_BINS)
)
print(f"log_posterior_init shape: {log_posterior_init.shape}")

# ---------------------------------------------------------------------------
# Fit one model per hemisphere, n_iter=1 (notebook cell 10's "only 1
# iteration for bayesian inference")
# ---------------------------------------------------------------------------
models, em_res_d = {}, {}
for hemi, counts in spk_d.items():
    model = pmg.PoissonGPLVMJump1D(
        counts.shape[1], n_latent_bin=N_SPATIAL_BINS, movement_variance=1,
        tuning_lengthscale=10.0,
    )
    em_res_d[hemi] = model.fit_em(
        jnp.asarray(counts), key=jr.PRNGKey(3), n_iter=1,
        log_posterior_init=log_posterior_init, n_time_per_chunk=10_000,
        verboase=False,
    )
    models[hemi] = model

# EM monitor (notebook cell 11)
fig, axs = plt.subplots(1, 2, figsize=(9, 3.2))
for ax, hemi in zip(axs, ("L", "R")):
    ax.plot(np.asarray(em_res_d[hemi]["log_marginal_l"]), linewidth=3)
    ax.set_xlabel("iteration")
    ax.set_title(f"log marginal ({hemi})")
save_fig(fig, "em_monitor", fig_dir=FIG_DIR, fig_format="png",
         do_close=True)

# L vs R tuning curves (notebook cell 12)
n_show = min(5, *(m.tuning.shape[1] for m in models.values()))
fig, axs = plt.subplots(1, n_show, figsize=(14, 2.6), sharex=True,
                        squeeze=False)
for neuron, ax in enumerate(axs[0]):
    ax.plot(np.asarray(models["R"].tuning)[:, neuron], label="R")
    ax.plot(np.asarray(models["L"].tuning)[:, neuron], label="L")
    ax.set_title(f"unit {neuron}")
    ax.set_xlabel("position bin")
axs[0, 0].set_ylabel("rate")
axs[0, 0].legend()
save_fig(fig, "tuning_curves_LR", fig_dir=FIG_DIR, fig_format="png",
         do_close=True)

# ---------------------------------------------------------------------------
# Decode (notebook cells 13-14): latent posteriors + jump probabilities
# ---------------------------------------------------------------------------
decode_d = {h: m.decode_latent(jnp.asarray(spk_d[h])) for h, m in
            models.items()}
fig, axs = plt.subplots(3, 1, figsize=(10, 6), sharex=True,
                        gridspec_kw={"height_ratios": [3, 3, 1]})
for ax, hemi in zip(axs[:2], ("R", "L")):
    post = np.asarray(decode_d[hemi]["posterior_latent_marg"])
    ax.imshow(post[START:STOP].T, aspect="auto", origin="lower",
              cmap="viridis")
    ax.set_ylabel("latent bin")
    ax.set_title(f"{hemi} hemisphere")
axs[2].plot(np.arange(STOP - START), pos_bins[START:STOP], color="blue")
axs[2].invert_yaxis()
axs[2].set_ylabel("position")
save_fig(fig, "decoded_posteriors", fig_dir=FIG_DIR, fig_format="png",
         do_close=True)

for hemi in ("L", "R"):
    post = np.asarray(decode_d[hemi]["posterior_latent_marg"])
    map_bin = post.argmax(axis=1)
    med_err = np.median(np.abs(map_bin - pos_bins))
    jump_prob = np.asarray(
        decode_d[hemi]["posterior_dynamics_marg"]
    )[:, 1].mean()
    rho = np.corrcoef(map_bin, pos_bins)[0, 1]
    print(f"{hemi}: GPLVM MAP-vs-position corr {rho:+.2f}, median |err| "
          f"{med_err:.1f} bins, mean jump prob {jump_prob:.3f}")

# cross-hemisphere agreement (the notebook's qualitative L-vs-R check)
map_l = np.asarray(decode_d["L"]["posterior_latent_marg"]).argmax(axis=1)
map_r = np.asarray(decode_d["R"]["posterior_latent_marg"]).argmax(axis=1)
print(f"cross-hemisphere MAP corr: {np.corrcoef(map_l, map_r)[0, 1]:+.2f}")

# ---------------------------------------------------------------------------
# Naive-Bayes baselines under blocked CV (reference root core.py:1522-1845)
# ---------------------------------------------------------------------------
X = np.concatenate([spk_d["L"], spk_d["R"]], axis=1).T  # (n_units, T)
ds = DecoderDataset(X, pos_bins)
accs, errs = [], []
for k in range(5):
    (X_tr, Y_tr), (X_te, Y_te), _, _ = ds.split(k, k_CV=5, n_blocks=10)
    dec = PoissonBayesDecoder(n_bins=N_SPATIAL_BINS).fit(X_tr, Y_tr)
    pred = dec.predict(X_te)
    accs.append((pred == Y_te).mean())
    errs.append(np.median(np.abs(pred - Y_te)))
print(f"Poisson Bayes 5-fold: accuracy {np.mean(accs):.2f}, "
      f"median |err| {np.mean(errs):.1f} bins")
gdec = GaussianBayesDecoder(n_bins=N_SPATIAL_BINS).fit(X, pos_bins)
print(f"Gaussian Bayes train accuracy: "
      f"{(gdec.predict(X) == pos_bins).mean():.2f}")
print(f"figures in {FIG_DIR}")
