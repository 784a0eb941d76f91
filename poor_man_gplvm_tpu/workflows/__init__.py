"""Dataset-specific post-fit workflows
(reference poor_man_gplvm/post_fit_workflow/)."""

from poor_man_gplvm_tpu.workflows import ach_dataset, tmaze_dataset

__all__ = ["ach_dataset", "tmaze_dataset"]
