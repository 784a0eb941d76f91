"""Reference-compatible gain M-step module
(mirrors ``poor_man_gplvm.experimental.fit_tuning_helper_exp``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from poor_man_gplvm_tpu.experimental.gain import (  # noqa: F401
    get_gain_mstep,
    get_gain_mstep_chunk,
    get_statistics_gain,
    poisson_m_step_objective_gain,
)
from poor_man_gplvm_tpu.ops.mstep import (  # noqa: F401
    PRECISION,
    gaussian_m_step_analytic,
    get_statistics,
    get_tuning_linear,
    get_tuning_softplus,
    make_adam_runner,
    poisson_m_step_objective,
    tree_l2_norm,
)

__all__ = [
    "get_tuning_linear",
    "get_tuning_softplus",
    "get_statistics",
    "get_statistics_gain",
    "gaussian_m_step_analytic",
    "get_gain_mstep",
    "get_gain_mstep_chunk",
    "get_gain_mstep_single_time",
    "poisson_m_step_objective",
    "poisson_m_step_objective_gain",
    "make_adam_runner",
    "tree_l2_norm",
]


@jax.jit
def get_gain_mstep_single_time(y_t, log_posterior_t, tuning):
    """Gain MLE at one timepoint: total spikes / total expected rate
    (reference experimental/fit_tuning_helper_exp.py:79-103)."""
    posterior_t = jnp.exp(log_posterior_t)
    expected_rate = jnp.sum(posterior_t[:, None] * tuning, axis=0)
    return jnp.sum(y_t) / (jnp.sum(expected_rate) + 1e-20)
