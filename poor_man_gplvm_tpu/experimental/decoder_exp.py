"""Reference-compatible gain decoder module
(mirrors ``poor_man_gplvm.experimental.decoder_exp``).

The per-timestep population gain enters the Poisson/Gaussian emission as a
rate multiplier; on this engine it folds into the changing-dt likelihood path
(rate = tuning * (gain * dt)), so every function here is a thin wrapper over
:mod:`poor_man_gplvm_tpu.ops.emissions` / :mod:`poor_man_gplvm_tpu.ops.hmm`.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import logsumexp

from poor_man_gplvm_tpu.decoder import (  # noqa: F401
    filter_all_step,
    smooth_all_step,
    smooth_one_step,
    _joint,
)
from poor_man_gplvm_tpu.ops.emissions import (
    gaussian_loglik,
    get_loglikelihood_ma_all_changing_dt,
    poisson_loglik,
)
from poor_man_gplvm_tpu.ops.hmm import smooth_combined_chunked

__all__ = [
    "get_loglikelihood_ma_poisson_gain",
    "get_loglikelihood_ma_gaussian_gain",
    "get_loglikelihood_ma_all_gain",
    "get_loglikelihood_ma_all_changing_dt_gain",
    "get_naive_bayes_ma_gain",
    "get_naive_bayes_ma_chunk_gain",
    "filter_all_step_combined_ma_gain",
    "smooth_all_step_combined_ma_chunk_gain",
    "smooth_one_step",
    "smooth_all_step",
]


def get_loglikelihood_ma_poisson_gain(y, tuning, hyperparam, ma_neuron,
                                      ma_latent, dt=1.0, gain=1.0):
    """Single-timepoint gain-scaled Poisson LL
    (reference experimental/decoder_exp.py:85-99)."""
    return poisson_loglik(
        jnp.asarray(y)[None, :], tuning, jnp.asarray(ma_neuron)[None, :],
        ma_latent, dt=jnp.asarray(dt * gain)[None],
    )[0]


def get_loglikelihood_ma_gaussian_gain(y, tuning, hyperparam, ma_neuron,
                                       ma_latent, dt=1.0, gain=1.0):
    """Single-timepoint gain-scaled Gaussian LL
    (reference experimental/decoder_exp.py:101-109)."""
    return gaussian_loglik(
        jnp.asarray(y)[None, :], tuning, hyperparam["noise_std"],
        jnp.asarray(ma_neuron)[None, :], ma_latent,
        dt=jnp.asarray(dt * gain)[None],
    )[0]


def get_loglikelihood_ma_all_gain(y_l, tuning, hyperparam, ma_neuron,
                                  ma_latent, gain_l,
                                  observation_model="poisson"):
    """(T, L) gain-scaled LL, dt=1
    (reference experimental/decoder_exp.py:111-123)."""
    gain_l = jnp.broadcast_to(jnp.asarray(gain_l, dtype=jnp.float32),
                              (y_l.shape[0],))
    return get_loglikelihood_ma_all_changing_dt(
        y_l, tuning, hyperparam, ma_neuron, ma_latent, gain_l,
        observation_model=observation_model,
    )


def get_loglikelihood_ma_all_changing_dt_gain(
    y_l, tuning, hyperparam, ma_neuron, ma_latent, dt_l, gain_l,
    observation_model="poisson",
):
    """(T, L) LL with per-time dt AND gain
    (reference experimental/decoder_exp.py:125-135)."""
    T = y_l.shape[0]
    eff = (jnp.broadcast_to(jnp.asarray(dt_l, dtype=jnp.float32), (T,))
           * jnp.broadcast_to(jnp.asarray(gain_l, dtype=jnp.float32), (T,)))
    return get_loglikelihood_ma_all_changing_dt(
        y_l, tuning, hyperparam, ma_neuron, ma_latent, eff,
        observation_model=observation_model,
    )


def get_naive_bayes_ma_gain(y_l, tuning, hyperparam, ma_neuron, ma_latent,
                            dt_l=1, gain_l=1.0, observation_model="poisson"):
    """Naive-Bayes decode with gain
    (reference experimental/decoder_exp.py:138-148)."""
    ll = get_loglikelihood_ma_all_changing_dt_gain(
        y_l, tuning, hyperparam, ma_neuron, ma_latent, dt_l, gain_l,
        observation_model=observation_model,
    )
    log_marginal_l = logsumexp(ll, axis=-1, keepdims=True)
    log_post = ll - log_marginal_l
    # [:, 0] (not squeeze): squeeze would collapse a length-1 chunk to a
    # 0-d scalar and break the chunked concatenation (reference bug,
    # fixed like emissions.get_naive_bayes_ma)
    return log_post, log_marginal_l[:, 0], jnp.sum(log_marginal_l), ll


def get_naive_bayes_ma_chunk_gain(y, tuning, hyperparam, ma_neuron, ma_latent,
                                  dt_l=1, n_time_per_chunk=10000,
                                  observation_model="poisson", gain_l=1.0):
    """Chunked naive Bayes with gain
    (reference experimental/decoder_exp.py:150-184)."""
    T = y.shape[0]
    dt_l = jnp.broadcast_to(jnp.asarray(dt_l, dtype=jnp.float32), (T,))
    gain_l = jnp.broadcast_to(jnp.asarray(gain_l, dtype=jnp.float32), (T,))
    posts, lml_l, lls = [], [], []
    total = 0.0
    for a in range(0, T, n_time_per_chunk):
        sl = slice(a, a + n_time_per_chunk)
        ma_c = ma_neuron[sl] if jnp.asarray(ma_neuron).ndim == 2 else ma_neuron
        p, ml, m, ll = get_naive_bayes_ma_gain(
            y[sl], tuning, hyperparam, ma_c, ma_latent, dt_l[sl], gain_l[sl],
            observation_model=observation_model,
        )
        posts.append(p)
        lml_l.append(ml)
        lls.append(ll)
        total = total + m
    return (
        jnp.concatenate(posts, axis=0), jnp.concatenate(lml_l, axis=0),
        total, jnp.concatenate(lls, axis=0),
    )


def filter_all_step_combined_ma_gain(
    y, tuning, hyperparam, log_latent_transition_kernel_l,
    log_dynamics_transition_kernel, ma_neuron, ma_latent, carry_init=None,
    likelihood_scale=1, observation_model="poisson", gain_l=1.0,
):
    """Fused gain-scaled likelihood + causal filter
    (reference experimental/decoder_exp.py:186-195)."""
    ll = get_loglikelihood_ma_all_gain(
        y, tuning, hyperparam, jnp.broadcast_to(jnp.asarray(ma_neuron),
                                                jnp.asarray(y).shape),
        ma_latent, gain_l, observation_model=observation_model,
    )
    post, lml, prior, ratios = filter_all_step(
        ll, log_latent_transition_kernel_l, log_dynamics_transition_kernel,
        carry_init=carry_init, likelihood_scale=likelihood_scale,
    )
    return post, lml, prior, ratios, ll


def smooth_all_step_combined_ma_chunk_gain(
    y, tuning, hyperparam, log_latent_transition_kernel_l,
    log_dynamics_transition_kernel, ma_neuron, ma_latent=None,
    likelihood_scale=1, n_time_per_chunk=10000, observation_model="poisson",
    gain_l=1.0, engine="prob",
):
    """Chunked forward-backward smoother with gain
    (reference experimental/decoder_exp.py:198-259)."""
    trans = _joint(
        log_latent_transition_kernel_l, log_dynamics_transition_kernel
    )
    T = y.shape[0]
    gain_l = jnp.broadcast_to(jnp.asarray(gain_l, dtype=jnp.float32), (T,))
    return smooth_combined_chunked(
        y, tuning, hyperparam, trans, ma_neuron, ma_latent,
        likelihood_scale=likelihood_scale, n_time_per_chunk=n_time_per_chunk,
        observation_model=observation_model, engine=engine, dt_l=gain_l,
    )
