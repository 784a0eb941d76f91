"""Reference-compatible decoder module (drop-in import surface).

Mirrors the reference's ``poor_man_gplvm.decoder`` function names and
signatures (reference decoder.py), implemented on the TPU-native engine:
likelihoods from :mod:`poor_man_gplvm_tpu.ops.emissions`, filtering/
smoothing from :mod:`poor_man_gplvm_tpu.ops.hmm`.
"""

from __future__ import annotations

import jax.numpy as jnp

from poor_man_gplvm_tpu.ops.emissions import (  # noqa: F401
    get_loglikelihood_ma_all,
    get_loglikelihood_ma_all_changing_dt,
    get_naive_bayes_ma,
    get_naive_bayes_ma_chunk,
    gaussian_loglik,
    poisson_loglik,
)
from poor_man_gplvm_tpu.ops.hmm import (  # noqa: F401
    JointTransition,
    compute_transition_posterior_prob,
    filter_combined,
    smooth_combined_chunked,
)

__all__ = [
    "get_loglikelihood_ma_all",
    "get_loglikelihood_ma_all_changing_dt",
    "get_naive_bayes_ma",
    "get_naive_bayes_ma_chunk",
    "filter_all_step_combined_ma",
    "smooth_all_step_combined_ma_chunk",
    "compute_transition_posterior_prob",
]


def _joint(log_latent_transition_kernel_l, log_dynamics_transition_kernel):
    return JointTransition(
        Tdyn=jnp.exp(log_dynamics_transition_kernel),
        Tlat=jnp.exp(log_latent_transition_kernel_l),
        logTdyn=log_dynamics_transition_kernel,
        logTlat=log_latent_transition_kernel_l,
    )


def filter_all_step_combined_ma(
    y, tuning, hyperparam, log_latent_transition_kernel_l,
    log_dynamics_transition_kernel, ma_neuron, ma_latent, carry_init=None,
    likelihood_scale=1, observation_model="poisson", engine="prob",
):
    """Fused likelihood + causal filter (reference decoder.py:189-198).

    Returns (log_posterior_all, log_marginal_final, log_prior_curr_all,
    log_one_step_predictive_marginals, log_likelihood_all)."""
    trans = _joint(
        log_latent_transition_kernel_l, log_dynamics_transition_kernel
    )
    ma_neuron = jnp.broadcast_to(jnp.asarray(ma_neuron), jnp.asarray(y).shape)
    return filter_combined(
        y, tuning, hyperparam, trans, ma_neuron, ma_latent,
        carry_init=carry_init, likelihood_scale=likelihood_scale,
        observation_model=observation_model, engine=engine,
    )


def smooth_all_step_combined_ma_chunk(
    y, tuning, hyperparam, log_latent_transition_kernel_l,
    log_dynamics_transition_kernel, ma_neuron, ma_latent=None,
    likelihood_scale=1, n_time_per_chunk=10000, observation_model="poisson",
    engine="prob",
):
    """Chunked forward-backward smoother (reference decoder.py:258-332).

    Returns the reference 6-tuple (log_acausal_posterior_all,
    log_marginal_final, log_causal_posterior_all,
    log_one_step_predictive_marginals, log_accumulated_joint,
    log_likelihood_all)."""
    trans = _joint(
        log_latent_transition_kernel_l, log_dynamics_transition_kernel
    )
    return smooth_combined_chunked(
        y, tuning, hyperparam, trans, ma_neuron, ma_latent,
        likelihood_scale=likelihood_scale, n_time_per_chunk=n_time_per_chunk,
        observation_model=observation_model, engine=engine,
    )
