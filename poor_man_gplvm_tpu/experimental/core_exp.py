"""Reference-compatible gain model module
(mirrors ``poor_man_gplvm.experimental.core_exp``)."""

from poor_man_gplvm_tpu.experimental.gain import (  # noqa: F401
    PoissonGPLVMGain1D_gain,
)

__all__ = ["PoissonGPLVMGain1D_gain"]
