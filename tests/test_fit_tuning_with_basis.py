"""Legacy per-neuron LBFGS M-step path."""

import jax.numpy as jnp
import numpy as np

from poor_man_gplvm_tpu.ops import fit_tuning_with_basis as ftb


def _sim(seed=0, L=12, B=4, N=6, T=2000):
    rng = np.random.default_rng(seed)
    basis = jnp.asarray(rng.normal(size=(L, B)), dtype=jnp.float32)
    w_true = jnp.asarray(rng.normal(size=(B, N)), dtype=jnp.float32)
    b_true = jnp.asarray(rng.normal(size=(N,)) * 0.5, dtype=jnp.float32)
    tuning_true = ftb.glm_get_tuning((w_true, b_true), basis)
    # delta posterior at a random bin each timestep -> grouped stats are
    # exact per-bin spike sums and the grouped MLE matches the true tuning
    bins = rng.integers(0, L, size=T)
    post = np.zeros((T, L), dtype=np.float32)
    post[np.arange(T), bins] = 1.0
    spk = rng.poisson(np.asarray(tuning_true)[bins]).astype(np.float32)
    return basis, (w_true, b_true), tuning_true, jnp.asarray(post), jnp.asarray(spk)


def test_grouped_statistics():
    basis, _, tuning_true, post, spk = _sim()
    s_b, t_b = ftb.group_spk_occupancy_chunk_neuron(spk, post)
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(post).sum(0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_b), np.asarray(post).T @ np.asarray(spk), rtol=1e-4
    )
    # per-time dt scales occupancy
    _, t_b2 = ftb.group_spk_occupancy_chunk_neuron(spk, post, dt=2.0)
    np.testing.assert_allclose(np.asarray(t_b2), 2 * np.asarray(t_b), rtol=1e-5)


def test_lbfgs_recovers_tuning():
    basis, params_true, tuning_true, post, spk = _sim()
    B, N = params_true[0].shape
    params0 = (jnp.zeros((B, N)), jnp.zeros(N))
    params_fit, tuning_fit, err = ftb.m_step_get_tuning_all_neuron_grouped(
        params0, spk, basis, post, prior_hyper=100.0, maxiter=200
    )
    corr = np.corrcoef(
        np.asarray(tuning_fit).ravel(), np.asarray(tuning_true).ravel()
    )[0, 1]
    assert corr > 0.95
    # the optimizer must reach at least the truth's objective value
    s_b, t_b = ftb.group_spk_occupancy_chunk_neuron(spk, post)
    val_true = sum(
        float(
            ftb._neg_objective(
                (params_true[0][:, n], params_true[1][n]), s_b[:, n], basis,
                t_b, 100.0,
            )
        )
        for n in range(N)
    )
    assert float(err) <= val_true + 1e-3
