"""Reference-compatible trial-analysis module (mirrors
``poor_man_gplvm.trial_analysis``)."""

from poor_man_gplvm_tpu.analysis.trial import (  # noqa: F401
    get_event_phase_in_trial,
    plot_event_range,
)
