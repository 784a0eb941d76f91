"""M-step layer: statistics, analytic Gaussian solve, Adam runner."""

import jax.numpy as jnp
import numpy as np

from poor_man_gplvm_tpu.ops import mstep as fth


def test_get_statistics():
    rng = np.random.default_rng(0)
    T, L, N = 11, 4, 3
    post = rng.dirichlet(np.ones(L), size=T)
    y = rng.poisson(2.0, size=(T, N)).astype(np.float64)
    y_w, t_w = fth.get_statistics(jnp.log(post), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(y_w), post.T @ y, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t_w), post.sum(0), rtol=1e-5)


def test_gaussian_analytic_matches_closed_form():
    rng = np.random.default_rng(1)
    L, B, N = 6, 3, 4
    basis = rng.normal(size=(L, B))
    y_w = rng.normal(size=(L, N))
    t_w = rng.gamma(2.0, size=(L,))
    hp = {"noise_std": 0.7, "param_prior_std": 1.3}
    w = np.asarray(
        fth.gaussian_m_step_analytic(
            hp, jnp.asarray(basis), jnp.asarray(y_w), jnp.asarray(t_w)
        )
    )
    H = basis.T @ np.diag(t_w) @ basis / 0.7**2 + np.eye(B) / 1.3**2
    want = np.linalg.solve(H, basis.T @ y_w / 0.7**2)
    np.testing.assert_allclose(w, want, rtol=1e-4, atol=1e-5)
    # ridge solution is the maximizer of the Gaussian expected log joint:
    # gradient of the objective at w should vanish
    resid = basis.T @ y_w / 0.7**2 - H @ w
    assert np.abs(resid).max() < 1e-3


def test_adam_runner_decreases_loss_and_stops():
    rng = np.random.default_rng(2)
    L, B, N = 8, 4, 5
    basis = jnp.asarray(rng.normal(size=(L, B)), dtype=jnp.float32)
    true_w = jnp.asarray(rng.normal(size=(B, N)), dtype=jnp.float32)
    tuning = fth.get_tuning_softplus(true_w, basis)
    t_w = jnp.ones(L) * 50.0
    y_w = tuning * t_w[:, None]
    hp = {"param_prior_std": 10.0}

    run, init = fth.make_adam_runner(
        fth.poisson_m_step_objective, step_size=0.05, maxiter=500, tol=1e-8
    )
    w0 = jnp.zeros((B, N))
    res = run(w0, init(w0), hp, basis, y_w, t_w)
    lh = np.asarray(res["loss_history"])[: int(res["n_iter"])]
    assert lh[-1] < lh[0]
    assert int(res["n_iter"]) >= 5  # warmup floor
    # fitted tuning approximates the generating tuning
    fit_tuning = np.asarray(fth.get_tuning_softplus(res["params"], basis))
    np.testing.assert_allclose(fit_tuning, np.asarray(tuning), rtol=0.3, atol=0.3)


def test_adam_opt_state_continuity():
    rng = np.random.default_rng(3)
    L, B, N = 6, 3, 4
    basis = jnp.asarray(rng.normal(size=(L, B)), dtype=jnp.float32)
    t_w = jnp.ones(L) * 10.0
    y_w = jnp.asarray(rng.gamma(2.0, size=(L, N)), dtype=jnp.float32)
    hp = {"param_prior_std": 1.0}
    run, init = fth.make_adam_runner(
        fth.poisson_m_step_objective, step_size=0.01, maxiter=50, tol=0.0
    )
    w0 = jnp.zeros((B, N))
    res1 = run(w0, init(w0), hp, basis, y_w, t_w)
    # threading the returned opt_state must be accepted and keep optimizing
    res2 = run(res1["params"], res1["opt_state"], hp, basis, y_w, t_w)
    assert float(res2["final_loss"]) <= float(res1["final_loss"]) + 1e-3


def test_smoothness_objective_penalizes_roughness():
    rng = np.random.default_rng(4)
    L, B, N = 10, 10, 2
    basis = jnp.eye(L)[:, :B]
    t_w = jnp.ones(L)
    y_w = jnp.ones((L, N))
    rough = jnp.asarray(rng.normal(size=(B, N)) * 3.0, dtype=jnp.float32)
    smooth = jnp.ones((B, N), dtype=jnp.float32)
    hp0 = {"param_prior_std": 1e6, "smoothness_penalty": 0.0}
    hp1 = {"param_prior_std": 1e6, "smoothness_penalty": 100.0}
    f = fth.poisson_m_step_objective_smoothness
    assert float(f(rough, hp1, basis, y_w, t_w)) > float(f(rough, hp0, basis, y_w, t_w))
    # smooth params incur ~no extra penalty
    np.testing.assert_allclose(
        float(f(smooth, hp1, basis, y_w, t_w)),
        float(f(smooth, hp0, basis, y_w, t_w)),
        rtol=1e-5,
    )


def test_tree_l2_norm():
    tree = {"a": jnp.array([3.0]), "b": jnp.array([4.0])}
    assert float(fth.tree_l2_norm(tree)) == 5.0
    assert float(fth.tree_l2_norm(tree, squared=True)) == 25.0
