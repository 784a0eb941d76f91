"""Reference-compatible model-selection module (mirrors
``poor_man_gplvm.model_selection_helper``)."""

from poor_man_gplvm_tpu.selection import *  # noqa: F401,F403
from poor_man_gplvm_tpu.selection import default_fit_kwargs, model_class_dict  # noqa: F401
