"""Trial-structure helpers (reference poor_man_gplvm/trial_analysis.py)."""

from __future__ import annotations

import pandas as pd

__all__ = ["get_event_phase_in_trial", "plot_event_range"]


def get_event_phase_in_trial(trials, event_key_l=(), span_key=("start", "end")):
    """Per-trial phase of each event within the [start, end] span
    (reference trial_analysis.py:8-17)."""
    out = {}
    for event_key in event_key_l:
        out[event_key] = (trials[event_key] - trials[span_key[0]]) / (
            trials[span_key[1]] - trials[span_key[0]]
        )
    return pd.DataFrame(out)


def plot_event_range(event_phase_df, xs=None, event_key_l=None, ax=None,
                     quantile_range=(0.25, 0.75), alpha=0.5, palette="Set1"):
    """Shaded spans for each event's quantile range
    (reference trial_analysis.py:19-34)."""
    import seaborn as sns

    if event_key_l is None:
        event_key_l = event_phase_df.columns.tolist()
    if xs is None:
        xs = (0, 1)
    colors = sns.color_palette(palette, len(event_key_l))
    for i, event_key in enumerate(event_key_l):
        left_ = event_phase_df[event_key].quantile(quantile_range[0])
        right_ = event_phase_df[event_key].quantile(quantile_range[1])
        left = (xs[-1] - xs[0]) * left_ + xs[0]
        right = (xs[-1] - xs[0]) * right_ + xs[0]
        ax.axvspan(left, right, color=colors[i], alpha=alpha)
    return ax
