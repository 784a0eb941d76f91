"""Reference-compatible kernel module (mirrors ``poor_man_gplvm.gp_kernel``)."""

from poor_man_gplvm_tpu.ops.kernels import (  # noqa: F401
    create_transition_prob_1d,
    create_transition_prob_latent_1d,
    discrete_transition_kernel,
    get_custom_kernel_rbf_plus_isolated,
    rbf_kernel,
    rbf_kernel_multi_d,
    uniform_kernel,
)
