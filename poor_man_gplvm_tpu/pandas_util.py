"""Reference-compatible pandas utilities (mirrors
``poor_man_gplvm.pandas_util``)."""

from poor_man_gplvm_tpu.utils.pandas_util import filter_df_with_spec  # noqa: F401
