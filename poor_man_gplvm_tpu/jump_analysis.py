"""Reference-compatible jump-analysis module (the reference's
``poor_man_gplvm.jump_analysis`` is an imports-only placeholder,
reference jump_analysis.py:1-12).  The actual jump analyses live in
:mod:`poor_man_gplvm_tpu.validation` (segmentation, contrast axes) and
:mod:`poor_man_gplvm_tpu.selection` (consensus metrics)."""

from poor_man_gplvm_tpu.selection import (  # noqa: F401
    get_jump_consensus,
    get_jump_consensus_shuffle,
)
from poor_man_gplvm_tpu.validation import (  # noqa: F401
    get_contrast_axis_and_proj,
    segment_trial_by_jump,
)
