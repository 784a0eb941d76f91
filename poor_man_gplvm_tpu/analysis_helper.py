"""Reference-compatible analysis module (mirrors
``poor_man_gplvm.analysis_helper``)."""

from poor_man_gplvm_tpu.analysis.posterior import (  # noqa: F401
    get_consecutive_pv_distance,
    get_peri_event_with_shuffle,
    get_posterior_weighted_average,
    get_sequence_occurence,
    get_state_interval,
    shift_timestamp,
)
from poor_man_gplvm_tpu.analysis.regression import (  # noqa: F401
    fit_time_prepost_interaction,
)
