"""poor_man_gplvm_tpu — TPU-native GPLVM/JumpLVM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``poor-man-GPLVM`` (GPLVM with a discretized 1-D latent and a 2-state
continuous-vs-jump dynamics HMM for binned neural spike counts), built
TPU-first: matmul-form emission likelihoods on the MXU, scaled
probability-space forward-backward scans, device-mesh sharding via
``shard_map``, and Pallas kernels for the hot ops.

Public model classes mirror the reference API
(reference poor_man_gplvm/__init__.py:6-12):
``PoissonGPLVMJump1D`` (flagship), ``GaussianGPLVMJump1D``,
``PoissonGPLVM1D``, ``GaussianGPLVM1D`` and the two abstract bases.
"""

from poor_man_gplvm_tpu.models.jump1d import (
    AbstractGPLVMJump1D,
    PoissonGPLVMJump1D,
    GaussianGPLVMJump1D,
)
from poor_man_gplvm_tpu.models.latent1d import (
    AbstractGPLVM1D,
    PoissonGPLVM1D,
    GaussianGPLVM1D,
)
from poor_man_gplvm_tpu.ops.basis import generate_basis

from poor_man_gplvm_tpu.config import (
    get_matmul_precision,
    set_matmul_precision,
    set_scan_precision,
)

# reference-compatible submodule surface (poor_man_gplvm/__init__.py:6-12)
from poor_man_gplvm_tpu import (  # noqa: F401
    analysis,
    analysis_helper,
    core,
    data,
    decoder,
    decoder_latentonly,
    distance_analysis,
    experimental,
    fit_tuning_helper,
    gp_kernel,
    initializer,
    jump_analysis,
    model_selection_helper,
    pandas_util,
    parallel,
    plot_helper,
    reactivation_analysis,
    selection,
    test,
    trial_analysis,
    utils,
    validation,
    verify_latent_jump,
    workflows,
)

__version__ = "0.1.0"

__all__ = [
    "AbstractGPLVM1D",
    "AbstractGPLVMJump1D",
    "PoissonGPLVM1D",
    "GaussianGPLVM1D",
    "PoissonGPLVMJump1D",
    "GaussianGPLVMJump1D",
    "generate_basis",
    "set_matmul_precision",
    "get_matmul_precision",
    "set_scan_precision",
]
