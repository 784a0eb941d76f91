"""Reference-compatible jump-verification module (mirrors
``poor_man_gplvm.verify_latent_jump``)."""

from poor_man_gplvm_tpu.validation import (  # noqa: F401
    get_contrast_axis_and_proj,
    segment_trial_by_jump,
)
