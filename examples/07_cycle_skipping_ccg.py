"""Theta cycle-skipping correlograms (mirrors cycle_skipping_CCG.ipynb)."""
import numpy as np
from poor_man_gplvm_tpu.analysis import (compute_acg_counts,
                                         compute_ccg_counts,
                                         theta_skipping_index)

rng = np.random.default_rng(0)
theta = 0.125
skipper = np.arange(0, 120, 2 * theta) + rng.normal(0, 0.004, 480)
regular = np.arange(0, 120, theta) + rng.normal(0, 0.004, 960)

for name, spk in [("skipping", skipper), ("regular", regular)]:
    tau, acg = compute_acg_counts(np.sort(spk), bin_s=0.005, half_window_s=0.3)
    idx = theta_skipping_index(tau, acg, theta_period_s=theta)
    print(f"{name} cell: theta-skip index = {idx:+.2f}")

tau, ccg = compute_ccg_counts(np.sort(skipper), np.sort(regular),
                              bin_s=0.005, half_window_s=0.3)
print("CCG total pairs:", int(ccg.sum()))
