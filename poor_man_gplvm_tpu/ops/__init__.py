"""Functional numerics core: kernels, basis, emissions, HMM engines, M-step."""

from poor_man_gplvm_tpu.ops import basis, emissions, hmm, kernels, mstep

__all__ = ["basis", "emissions", "hmm", "kernels", "mstep"]
