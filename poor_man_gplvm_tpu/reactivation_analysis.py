"""Reference-compatible reactivation module (mirrors
``poor_man_gplvm.reactivation_analysis``)."""

from poor_man_gplvm_tpu.analysis.reactivation import *  # noqa: F401,F403
