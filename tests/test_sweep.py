"""Batched grid sweep: equivalence with per-run logic, mesh sharding."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import poor_man_gplvm_tpu as pmg
from poor_man_gplvm_tpu.parallel import sweep

T, N, L = 120, 8, 10


@pytest.fixture(scope="module")
def y():
    model = pmg.PoissonGPLVMJump1D(N, n_latent_bin=L, tuning_lengthscale=3.0)
    _, spk = model.sample(T, key=jr.PRNGKey(0))
    return np.asarray(spk, dtype=np.float32)


def test_expand_grid():
    grid, cfg_idx, chain_idx = sweep.expand_grid(
        {"movement_variance": [0.5, 2.0], "p_move_to_jump": [0.01, 0.1]},
        n_repeat=3,
    )
    assert grid["movement_variance"].shape == (12,)
    np.testing.assert_array_equal(cfg_idx[:3], 0)
    np.testing.assert_array_equal(chain_idx[:3], [0, 1, 2])
    # defaults filled for unswept params
    np.testing.assert_allclose(np.asarray(grid["param_prior_std"]), 1.0)
    with pytest.raises(ValueError):
        sweep.expand_grid({"tuning_lengthscale": [1.0, 2.0]})


def test_sweep_runs_and_improves(y):
    res = sweep.sweep_fit_poisson_jump(
        y, {"movement_variance": [0.5, 2.0]}, n_repeat=2, n_iter=4,
        n_latent_bin=L, tuning_lengthscale=3.0, m_maxiter=30,
    )
    lml = np.asarray(res["log_marginal_l"])  # (B, n_iter)
    assert lml.shape == (4, 4)
    # EM improves for every run in the batch
    assert np.all(lml[:, -1] > lml[:, 0])
    assert res["tuning"].shape == (4, L, N)
    # different movement_variance -> different final lml
    assert not np.allclose(lml[0, -1], lml[2, -1])
    # same config, different chains -> different inits -> (almost surely)
    # different trajectories
    assert not np.allclose(lml[0, 0], lml[1, 0])


def test_sweep_sharded_matches_unsharded(y):
    from poor_man_gplvm_tpu.parallel import spmd

    mesh = spmd.make_mesh(8, batch=8)
    kwargs = dict(
        n_repeat=4, n_iter=2, n_latent_bin=L, tuning_lengthscale=3.0,
        m_maxiter=20, key=jr.PRNGKey(7),
    )
    res_local = sweep.sweep_fit_poisson_jump(
        y, {"movement_variance": [0.5, 2.0]}, **kwargs
    )
    res_sharded = sweep.sweep_fit_poisson_jump(
        y, {"movement_variance": [0.5, 2.0]}, mesh=mesh, **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(res_local["log_marginal_l"]),
        np.asarray(res_sharded["log_marginal_l"]),
        rtol=1e-4,
    )
