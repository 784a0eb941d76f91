"""Reference-compatible initializer module (mirrors
``poor_man_gplvm.initializer``)."""

from poor_man_gplvm_tpu.initializers import (  # noqa: F401
    init_with_label_1D,
    init_with_pca,
)
