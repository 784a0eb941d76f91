"""Reference-compatible core module: model classes + basis generation
(mirrors ``poor_man_gplvm.core``'s import surface)."""

from poor_man_gplvm_tpu.models.jump1d import (  # noqa: F401
    AbstractGPLVMJump1D,
    GaussianGPLVMJump1D,
    PoissonGPLVMJump1D,
)
from poor_man_gplvm_tpu.models.latent1d import (  # noqa: F401
    AbstractGPLVM1D,
    GaussianGPLVM1D,
    PoissonGPLVM1D,
)
from poor_man_gplvm_tpu.ops.basis import generate_basis  # noqa: F401

__all__ = [
    "AbstractGPLVM1D",
    "AbstractGPLVMJump1D",
    "GaussianGPLVM1D",
    "GaussianGPLVMJump1D",
    "PoissonGPLVM1D",
    "PoissonGPLVMJump1D",
    "generate_basis",
]
