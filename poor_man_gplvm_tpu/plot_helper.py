"""Reference-compatible plotting module (mirrors
``poor_man_gplvm.plot_helper``; plotly helpers raise a clear ImportError
when plotly is absent)."""

from poor_man_gplvm_tpu.plotting import *  # noqa: F401,F403
