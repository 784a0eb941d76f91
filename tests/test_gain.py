"""Experimental gain model: gain recovery, EM improvement, shuffle test."""

import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from poor_man_gplvm_tpu.experimental import (
    PoissonGPLVMGain1D_gain,
    get_gain_mstep,
    get_statistics_gain,
    shuffle_and_decode_gain,
)

T, N, L = 200, 10, 12


@pytest.fixture(scope="module")
def gain_sim():
    model = PoissonGPLVMGain1D_gain(N, n_latent_bin=L, tuning_lengthscale=3.0)
    # time-varying gain: low first half, high second half
    gain_true = np.concatenate([np.full(T // 2, 0.5), np.full(T // 2, 2.0)])
    state_l, y = model.sample(T, key=jr.PRNGKey(0), gain=jnp.asarray(gain_true))
    return model, state_l, y, gain_true


def test_gain_mstep_recovers_scale(gain_sim):
    model, state_l, y, gain_true = gain_sim
    # with the TRUE tuning and a delta posterior at the true latent, the gain
    # MLE should track the applied gain profile
    post = np.full((T, L), 1e-10)
    post[np.arange(T), np.asarray(state_l[:, 1])] = 1.0
    post /= post.sum(axis=1, keepdims=True)
    gain_hat = np.asarray(
        get_gain_mstep(jnp.asarray(y, dtype=jnp.float32), jnp.log(post),
                       model.tuning)
    )
    assert gain_hat[: T // 2].mean() < gain_hat[T // 2 :].mean()
    assert gain_hat[T // 2 :].mean() / gain_hat[: T // 2].mean() > 2.0


def test_statistics_gain_shapes():
    rng = np.random.default_rng(0)
    post = rng.dirichlet(np.ones(L), size=T)
    y = rng.poisson(2.0, (T, N)).astype(np.float32)
    gain = rng.gamma(2.0, 0.5, T).astype(np.float32)
    y_w, t_w, g_w = get_statistics_gain(jnp.log(post), y, gain)
    assert y_w.shape == (L, N) and t_w.shape == (L,) and g_w.shape == (L,)
    # with uniform gain == 1, gain_weighted must be ~1
    _, _, g1 = get_statistics_gain(jnp.log(post), y, jnp.ones(T))
    np.testing.assert_allclose(np.asarray(g1), 1.0, rtol=1e-4)


def test_gain_fit_em(gain_sim):
    model, state_l, y, gain_true = gain_sim
    em = model.fit_em(y, n_iter=3, verboase=False)
    lml = [float(v) for v in em["log_marginal_l"]]
    assert lml[-1] > lml[0]
    assert em["gain"].shape == (T,)
    assert "gain_saved" in em
    # fitted gain tracks the true gain profile direction
    g = np.asarray(em["gain"])
    assert g[T // 2 :].mean() > g[: T // 2].mean()


def test_gain_naive_bayes_refit(gain_sim):
    model, _, y, _ = gain_sim
    model.fit_em(y, n_iter=2, verboase=False)
    res0 = model.decode_latent_naive_bayes(y, gain_refit_n_iter=0,
                                           gain=jnp.ones(T))
    res2 = model.decode_latent_naive_bayes(y, gain_refit_n_iter=2,
                                           gain=jnp.ones(T))
    # refitting the gain must improve the marginal likelihood
    assert res2["log_marginal"] > res0["log_marginal"]
    assert res2["gain"].shape == (T,)


def test_gain_shuffle(gain_sim):
    model, _, y, _ = gain_sim
    model.fit_em(y, n_iter=1, verboase=False)
    res = shuffle_and_decode_gain(model, np.asarray(y), n_shuffle=2,
                                  seed=0, verbose=False)
    assert res["log_marginal_l"].shape == (2, T)
