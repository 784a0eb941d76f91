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


def get_log(val):
    """Log with the reference's -inf clamp (reference gp_kernel.py:8-12):
    exact zeros map to -10000 instead of -inf."""
    import jax.numpy as jnp

    log_val = jnp.log(val)
    return jnp.where(jnp.isneginf(log_val), -10000.0, log_val)
