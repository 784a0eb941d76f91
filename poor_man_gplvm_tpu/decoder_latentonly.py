"""Reference-compatible latent-only decoder module.

Mirrors ``poor_man_gplvm.decoder_latentonly`` on the TPU-native engine.
"""

from __future__ import annotations

import jax.numpy as jnp

from poor_man_gplvm_tpu.ops.emissions import (  # noqa: F401
    get_loglikelihood_ma_all,
    get_loglikelihood_ma_all_changing_dt,
    get_naive_bayes_ma,
    get_naive_bayes_ma_chunk,
)
from poor_man_gplvm_tpu.ops.hmm import (  # noqa: F401
    LatentTransition,
    compute_transition_posterior_prob_latent,
    filter_combined,
    smooth_combined_chunked,
)

__all__ = [
    "filter_all_step_combined_ma_latent",
    "smooth_all_step_combined_ma_chunk_latent",
    "compute_transition_posterior_prob_latent",
]


def _latent(log_latent_transition_kernel):
    return LatentTransition(
        T=jnp.exp(log_latent_transition_kernel),
        logT=log_latent_transition_kernel,
    )


def filter_all_step_combined_ma_latent(
    y, tuning, hyperparam, log_latent_transition_kernel, ma_neuron, ma_latent,
    carry_init=None, likelihood_scale=1, observation_model="poisson",
    engine="prob",
):
    """Fused likelihood + causal filter, latent-only
    (reference decoder_latentonly.py:82-94)."""
    trans = _latent(log_latent_transition_kernel)
    ma_neuron = jnp.broadcast_to(jnp.asarray(ma_neuron), jnp.asarray(y).shape)
    return filter_combined(
        y, tuning, hyperparam, trans, ma_neuron, ma_latent,
        carry_init=carry_init, likelihood_scale=likelihood_scale,
        observation_model=observation_model, engine=engine,
    )


def smooth_all_step_combined_ma_chunk_latent(
    y, tuning, hyperparam, log_latent_transition_kernel, ma_neuron,
    ma_latent=None, likelihood_scale=1, n_time_per_chunk=10000,
    observation_model="poisson", engine="prob",
):
    """Chunked forward-backward smoother, latent-only
    (reference decoder_latentonly.py:156-224)."""
    trans = _latent(log_latent_transition_kernel)
    return smooth_combined_chunked(
        y, tuning, hyperparam, trans, ma_neuron, ma_latent,
        likelihood_scale=likelihood_scale, n_time_per_chunk=n_time_per_chunk,
        observation_model=observation_model, engine=engine,
    )
