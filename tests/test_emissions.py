"""Emission LL: matmul form vs direct elementwise reference formula."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.special import gammaln
from scipy.stats import norm

from poor_man_gplvm_tpu.ops import emissions


def _direct_poisson(y, tuning, ma_neuron, ma_latent, dt=1.0):
    """Reference decoder.py:31-48 formula, elementwise in float64."""
    y = np.asarray(y, dtype=np.float64)
    tuning = np.asarray(tuning, dtype=np.float64)
    dt = np.broadcast_to(np.asarray(dt, dtype=np.float64), (y.shape[0],))
    ma = np.broadcast_to(np.asarray(ma_neuron, dtype=np.float64), y.shape)
    T, N = y.shape
    L = tuning.shape[0]
    out = np.zeros((T, L))
    for t in range(T):
        lam = tuning * dt[t] + 1e-20
        ll = (
            np.where(y[t] > 0, y[t] * np.log(lam), 0.0)
            - lam
            - np.asarray(gammaln(y[t] + 1.0))
        )
        out[t] = (ll * ma[t][None, :]).sum(axis=1)
    return np.where(np.asarray(ma_latent, dtype=bool)[None, :], out, -1e20)


def _direct_gaussian(y, tuning, noise_std, ma_neuron, ma_latent, dt=1.0):
    y = np.asarray(y, dtype=np.float64)
    tuning = np.asarray(tuning, dtype=np.float64)
    dt = np.broadcast_to(np.asarray(dt, dtype=np.float64), (y.shape[0],))
    ma = np.broadcast_to(np.asarray(ma_neuron, dtype=np.float64), y.shape)
    T = y.shape[0]
    L = tuning.shape[0]
    out = np.zeros((T, L))
    for t in range(T):
        mu = tuning * dt[t]
        ll = norm.logpdf(y[t][None, :], mu, noise_std)
        out[t] = (ll * ma[t][None, :]).sum(axis=1)
    return np.where(np.asarray(ma_latent, dtype=bool)[None, :], out, -1e20)


@pytest.fixture
def setup():
    rng = np.random.default_rng(0)
    T, N, L = 13, 7, 5
    y = rng.poisson(2.0, size=(T, N)).astype(np.float32)
    tuning = rng.gamma(2.0, 1.0, size=(L, N)).astype(np.float32)
    ma_neuron = np.ones(N, dtype=np.float32)
    ma_neuron[2] = 0.0
    ma_latent = np.ones(L, dtype=np.float32)
    ma_latent[3] = 0.0
    return y, tuning, ma_neuron, ma_latent


def test_poisson_matches_direct(setup):
    y, tuning, ma_neuron, ma_latent = setup
    got = emissions.poisson_loglik(y, tuning, ma_neuron, ma_latent)
    want = _direct_poisson(y, tuning, ma_neuron, ma_latent)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-4)


def test_poisson_spatiotemporal_mask(setup):
    y, tuning, _, ma_latent = setup
    rng = np.random.default_rng(1)
    ma2 = (rng.random(y.shape) > 0.3).astype(np.float32)
    got = emissions.poisson_loglik(y, tuning, ma2, ma_latent)
    want = _direct_poisson(y, tuning, ma2, ma_latent)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-4)


def test_poisson_changing_dt(setup):
    y, tuning, ma_neuron, ma_latent = setup
    dt_l = np.linspace(0.5, 2.0, y.shape[0]).astype(np.float32)
    got = emissions.poisson_loglik(y, tuning, ma_neuron, ma_latent, dt=dt_l)
    want = _direct_poisson(y, tuning, ma_neuron, ma_latent, dt=dt_l)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-4)


def test_gaussian_matches_direct(setup):
    y, tuning, ma_neuron, ma_latent = setup
    y = y + 0.3
    got = emissions.gaussian_loglik(y, tuning, 0.7, ma_neuron, ma_latent)
    want = _direct_gaussian(y, tuning, 0.7, ma_neuron, ma_latent)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-3)


def test_naive_bayes_normalization(setup):
    y, tuning, ma_neuron, ma_latent = setup
    log_post, lml_l, lml, ll = emissions.get_naive_bayes_ma(
        y, tuning, {}, np.broadcast_to(ma_neuron, y.shape), ma_latent
    )
    post = np.exp(np.asarray(log_post))
    np.testing.assert_allclose(post.sum(axis=1), 1.0, rtol=1e-5)
    assert np.allclose(float(lml), np.asarray(lml_l).sum(), rtol=1e-6)
    # masked latent gets ~zero posterior
    assert post[:, 3].max() < 1e-30


def test_naive_bayes_chunk_invariance(setup):
    y, tuning, ma_neuron, ma_latent = setup
    outs = {}
    for chunk in (4, 13, 1000):
        outs[chunk] = emissions.get_naive_bayes_ma_chunk(
            y, tuning, {}, ma_neuron, ma_latent, n_time_per_chunk=chunk
        )
    for chunk in (4, 1000):
        for a, b in zip(outs[chunk], outs[13]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-5
            )


def test_gaussian_vector_noise_std_matches_dense():
    """Per-neuron (N,) noise_std broadcasts like the reference's norm.logpdf
    (reference decoder.py:50-57)."""
    import jax.scipy.stats as jstats
    from poor_man_gplvm_tpu.ops.emissions import gaussian_loglik

    rng = np.random.default_rng(0)
    T, L, N = 7, 9, 5
    y = rng.normal(size=(T, N))
    tun = rng.random((L, N))
    sig = rng.uniform(0.5, 2.0, N)
    ma = (rng.random((T, N)) > 0.3).astype(float)
    dense = np.stack([
        (np.asarray(jstats.norm.logpdf(y[t], tun, sig)) * ma[t][None, :])
        .sum(axis=1)
        for t in range(T)
    ])
    ours = np.asarray(gaussian_loglik(y, tun, sig, ma, np.ones(L)))
    np.testing.assert_allclose(ours, dense, atol=1e-4, rtol=1e-5)
    # changing-dt path
    dts = rng.uniform(0.5, 1.5, T)
    dense2 = np.stack([
        (np.asarray(jstats.norm.logpdf(y[t], tun * dts[t], sig))
         * ma[t][None, :]).sum(axis=1)
        for t in range(T)
    ])
    ours2 = np.asarray(gaussian_loglik(y, tun, sig, ma, np.ones(L), dt=dts))
    np.testing.assert_allclose(ours2, dense2, atol=1e-4, rtol=1e-5)


def test_poisson_1d_fold_matches_2d_path(setup):
    """The folded 1-D-mask form equals the broadcast 2-D-mask form — same
    contraction, different operand placement (emissions.py poisson_loglik)."""
    y, tuning, ma_neuron, ma_latent = setup
    ma2d = np.broadcast_to(ma_neuron, y.shape).copy()
    got_1d = np.asarray(emissions.poisson_loglik(y, tuning, ma_neuron, ma_latent))
    got_2d = np.asarray(emissions.poisson_loglik(y, tuning, ma2d, ma_latent))
    np.testing.assert_allclose(got_1d, got_2d, rtol=2e-6, atol=1e-5)


def test_poisson_precomputed_lgamma_term(setup):
    """poisson_loglik(lgamma_term=precomputed) is identical to the default —
    the fused EM path feeds the loop-invariant term once per segment."""
    y, tuning, ma_neuron, ma_latent = setup
    lg = emissions.poisson_lgamma_term(y, ma_neuron)
    # matches the direct per-row reduction
    import scipy.special as sps
    want_lg = (np.broadcast_to(ma_neuron, y.shape)
               * sps.gammaln(y + 1.0)).sum(axis=1)
    np.testing.assert_allclose(np.asarray(lg), want_lg, rtol=1e-6, atol=1e-5)
    base = np.asarray(emissions.poisson_loglik(y, tuning, ma_neuron, ma_latent))
    fed = np.asarray(
        emissions.poisson_loglik(y, tuning, ma_neuron, ma_latent, lgamma_term=lg)
    )
    np.testing.assert_allclose(fed, base, rtol=1e-6, atol=1e-6)
    # and through the jitted public entry point
    fed2 = np.asarray(emissions.get_loglikelihood_ma_all(
        y, tuning, {}, ma_neuron, ma_latent, observation_model="poisson",
        lgamma_term=lg,
    ))
    np.testing.assert_allclose(fed2, base, rtol=1e-6, atol=1e-6)
