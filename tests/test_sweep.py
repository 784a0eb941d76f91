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
    # tuning_lengthscale is sweepable (bucketed by basis rank downstream)
    grid2, _, _ = sweep.expand_grid({"tuning_lengthscale": [1.0, 2.0]})
    assert grid2["tuning_lengthscale"].shape == (2,)
    with pytest.raises(ValueError):
        sweep.expand_grid({"not_a_param": [1.0]})


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


def test_sweep_sharded_nondivisible_bucket_matches(y):
    """A bucket whose size does not divide the device count is padded to a
    device multiple (not silently run unsharded) and still returns exactly
    the unsharded results."""
    from poor_man_gplvm_tpu.parallel import spmd

    mesh = spmd.make_mesh(8, batch=8)
    kwargs = dict(
        n_repeat=3, n_iter=2, n_latent_bin=L, tuning_lengthscale=3.0,
        m_maxiter=20, key=jr.PRNGKey(9),
    )  # 1 config x 3 chains = 3 runs on 8 devices
    res_local = sweep.sweep_fit_poisson_jump(
        y, {"movement_variance": [1.0]}, **kwargs
    )
    res_sharded = sweep.sweep_fit_poisson_jump(
        y, {"movement_variance": [1.0]}, mesh=mesh, **kwargs
    )
    assert np.asarray(res_sharded["log_marginal_l"]).shape == (3, 2)
    np.testing.assert_allclose(
        np.asarray(res_local["log_marginal_l"]),
        np.asarray(res_sharded["log_marginal_l"]),
        rtol=1e-4,
    )


def test_sweep_tuning_lengthscale_bucketed_matches_serial(y):
    """Sweeping tuning_lengthscale (shape-changing n_basis) via bucketed
    vmapped programs matches per-run serial fits (VERDICT round-1 item #6)."""
    from poor_man_gplvm_tpu.ops.basis import generate_basis
    from poor_man_gplvm_tpu.parallel.sweep import _single_run_em

    ls_values = [3.0, 5.0, 20.0]
    key = jr.PRNGKey(11)
    res = sweep.sweep_fit_poisson_jump(
        y, {"tuning_lengthscale": ls_values}, n_repeat=1, n_iter=3,
        n_latent_bin=L, m_maxiter=20, key=key,
    )
    lml = np.asarray(res["log_marginal_l"])
    assert lml.shape == (3, 3)
    assert np.all(np.isfinite(lml))

    # distinct ranks across lengthscales proves the bucketing is real
    ranks = {generate_basis(ls, L).shape[1] for ls in ls_values}
    assert len(ranks) > 1
    if isinstance(res["params"], list):
        got_ranks = {p.shape[0] for p in res["params"]}
        assert got_ranks == ranks

    # serial per-run references with the exact same per-run keys
    keys = jr.split(key, 3)
    for i, ls in enumerate(ls_values):
        basis = generate_basis(ls, L)
        ref = _single_run_em(
            jnp.asarray(y), basis,
            {k: v[i] for k, v in res["grid"].items()}, keys[i],
            n_iter=3, n_latent_bin=L, m_step_size=0.01, m_maxiter=20,
            m_tol=1e-6, likelihood_scale=1.0,
        )
        np.testing.assert_allclose(
            lml[i], np.asarray(ref["log_marginal_l"]), rtol=1e-5
        )
