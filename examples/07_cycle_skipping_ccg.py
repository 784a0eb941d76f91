"""Theta cycle-skipping CCG analysis at notebook depth.

End-to-end port of the reference's ``cycle_skipping_CCG.ipynb`` (7 code
cells) on synthetic spikes.  The notebook builds a TSV index of unit
pairs with their theta-skip indices, then renders per-pair CCG panels
(``plot_ccgs_from_index_tsv``, cell 0) and per-unit ACG grids
(``plot_acgs_from_index_tsv``, cell 4), including across-hemisphere
pairs (cell 5).  Here: simulate a theta-modulated population where half
the units skip alternate theta cycles -> per-unit ACGs + skip indices ->
the pairwise index TSV (written and read back, as the notebook consumes
it) -> CCG panels for the top-|index| pairs -> within- vs
across-hemisphere comparison figure.
"""

import os
import tempfile

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

from poor_man_gplvm_tpu.analysis import (
    compute_acg_counts,
    compute_ccg_counts,
    theta_skipping_index,
)
from poor_man_gplvm_tpu.plotting import save_fig

OUT_DIR = os.environ.get("PMG_EXAMPLE_OUT", tempfile.mkdtemp(prefix="pmg07_"))
FIG_DIR = os.path.join(OUT_DIR, "figures")
os.makedirs(FIG_DIR, exist_ok=True)

# ---------------------------------------------------------------------------
# Synthetic theta-modulated units: "skippers" fire on alternate theta
# cycles, "regulars" on every cycle; two pseudo-hemispheres
# ---------------------------------------------------------------------------
rng = np.random.default_rng(0)
THETA = 0.125  # s (8 Hz)
DURATION = 120.0
BIN_S, HALF_WIN = 0.005, 0.3


def make_unit(skip, jitter=0.006, p_fire=0.9, phase=0.0):
    period = 2 * THETA if skip else THETA
    base = np.arange(phase, DURATION, period)
    keep = rng.random(base.size) < p_fire
    return np.sort(base[keep] + rng.normal(0, jitter, int(keep.sum())))


units = {}
hemisphere = {}
for i in range(4):
    units[f"L{i}"] = make_unit(skip=(i % 2 == 0),
                               phase=rng.uniform(0, THETA))
    hemisphere[f"L{i}"] = "L"
for i in range(4):
    units[f"R{i}"] = make_unit(skip=(i % 2 == 0),
                               phase=rng.uniform(0, THETA))
    hemisphere[f"R{i}"] = "R"

# ---------------------------------------------------------------------------
# Per-unit ACG grid + skip indices (notebook cell 4's ACG figure)
# ---------------------------------------------------------------------------
acg_index_rows = []
fig, axs = plt.subplots(2, 4, figsize=(14, 5), sharex=True)
for ax, (name, spk) in zip(axs.ravel(), units.items()):
    tau, acg = compute_acg_counts(spk, bin_s=BIN_S, half_window_s=HALF_WIN)
    idx = theta_skipping_index(tau, acg, theta_period_s=THETA)
    acg_index_rows.append(
        {"unit": name, "hemisphere": hemisphere[name],
         "n_spikes": len(spk), "theta_skip_index": idx}
    )
    ax.bar(tau, acg, width=BIN_S, color="k")
    for k in (1, 2):
        ax.axvline(k * THETA, color="red", alpha=0.4, linestyle="--")
        ax.axvline(-k * THETA, color="red", alpha=0.4, linestyle="--")
    ax.set_title(f"{name}: skip={idx:+.2f}")
axs[1, 0].set_xlabel("lag (s)")
save_fig(fig, "acg_grid", fig_dir=FIG_DIR, fig_format="png", do_close=True)

acg_df = pd.DataFrame(acg_index_rows)
print(acg_df.to_string(index=False))
skippers = acg_df[acg_df.theta_skip_index > 0.1].unit.tolist()
print(f"units flagged as cycle-skipping: {skippers}")

# ---------------------------------------------------------------------------
# Pairwise CCG index TSV (the notebook's theta_skip_index.tsv contract:
# written by the sweep, read back by the plotting cells)
# ---------------------------------------------------------------------------
names = list(units)
pair_rows = []
for i, a in enumerate(names):
    for b in names[i + 1:]:
        tau, ccg = compute_ccg_counts(units[a], units[b], bin_s=BIN_S,
                                      half_window_s=HALF_WIN)
        pair_rows.append({
            "ref": a, "tgt": b,
            "ref_hemi": hemisphere[a], "tgt_hemi": hemisphere[b],
            "across_hemi": hemisphere[a] != hemisphere[b],
            "n_pairs": int(ccg.sum()),
            "theta_skip_index": theta_skipping_index(
                tau, ccg, theta_period_s=THETA
            ),
        })
tsv_path = os.path.join(OUT_DIR, "theta_skip_index.tsv")
pd.DataFrame(pair_rows).to_csv(tsv_path, sep="\t", index=False)
pairs_df = pd.read_csv(tsv_path, sep="\t")  # read back like the notebook
print(f"pair index TSV: {len(pairs_df)} pairs -> {tsv_path}")

# ---------------------------------------------------------------------------
# CCG panels for the top-|index| pairs (notebook cell 3's
# plot_ccgs_from_index_tsv with `which` selection)
# ---------------------------------------------------------------------------
top = pairs_df.reindex(
    pairs_df.theta_skip_index.abs().sort_values(ascending=False).index
).head(4)
fig, axs = plt.subplots(1, 4, figsize=(14, 3), sharey=False)
for ax, (_, row) in zip(axs, top.iterrows()):
    tau, ccg = compute_ccg_counts(units[row.ref], units[row.tgt],
                                  bin_s=BIN_S, half_window_s=HALF_WIN)
    ax.bar(tau, ccg, width=BIN_S, color="k")
    for k in (1, 2):
        ax.axvline(k * THETA, color="red", alpha=0.4, linestyle="--")
        ax.axvline(-k * THETA, color="red", alpha=0.4, linestyle="--")
    ax.set_title(f"{row.ref}->{row.tgt}\nskip={row.theta_skip_index:+.2f}"
                 f" ({'across' if row.across_hemi else 'within'})")
    ax.set_xlabel("lag (s)")
save_fig(fig, "ccg_top_pairs", fig_dir=FIG_DIR, fig_format="png",
         do_close=True)

# ---------------------------------------------------------------------------
# Within- vs across-hemisphere comparison (notebook cell 5)
# ---------------------------------------------------------------------------
fig, ax = plt.subplots(figsize=(4.5, 3.2))
groups = [
    pairs_df.loc[~pairs_df.across_hemi, "theta_skip_index"].dropna(),
    pairs_df.loc[pairs_df.across_hemi, "theta_skip_index"].dropna(),
]
ax.boxplot(groups, tick_labels=["within", "across"])
ax.axhline(0, color="gray", linewidth=0.8)
ax.set_ylabel("theta-skip index")
save_fig(fig, "within_vs_across", fig_dir=FIG_DIR, fig_format="png",
         do_close=True)
for label, g in zip(("within", "across"), groups):
    print(f"{label}-hemisphere pairs: median skip index {g.median():+.2f} "
          f"(n={len(g)})")
print(f"figures in {FIG_DIR}")
