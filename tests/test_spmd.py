"""Multi-chip SPMD layer vs the single-device engine, on an 8-device CPU
mesh.  The sharded EM step must be numerically equivalent (not just
'similar') to the reference-shaped single-device path, since the time
pipeline and neuron psum are exact."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from poor_man_gplvm_tpu.ops import emissions, hmm, kernels as gpk
from poor_man_gplvm_tpu.ops import mstep as fth
from poor_man_gplvm_tpu.parallel import spmd

B, T, N, L, RANK = 2, 48, 8, 6, 3
N_DYN = 2


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.poisson(1.2, size=(B, T, N)), dtype=jnp.float32)
    basis = jnp.asarray(rng.normal(size=(L, RANK)), dtype=jnp.float32)
    params = jnp.asarray(rng.normal(size=(B, RANK, N)) * 0.3, dtype=jnp.float32)
    post0 = rng.dirichlet(np.ones(L), size=(B, T)).astype(np.float32)
    log_post = jnp.log(jnp.asarray(post0))
    lat_l, log_lat_l, dyn, log_dyn = gpk.create_transition_prob_1d(
        jnp.arange(L), jnp.arange(N_DYN), movement_variance=1.0,
        p_move_to_jump=0.02, p_jump_to_move=0.03,
    )
    trans = hmm.JointTransition(dyn, lat_l, log_dyn, log_lat_l)
    return y, basis, params, log_post, trans


def _single_device_em_step(y_b, basis, params_b, log_post_b, trans,
                           m_maxiter=10):
    """Reference-shaped single-device EM iteration for comparison."""
    y_w, t_w = fth.get_statistics(log_post_b, y_b)
    run, init = fth.make_adam_runner(
        fth.poisson_m_step_objective, step_size=0.01, maxiter=m_maxiter,
        tol=1e-6,
    )
    res = run(params_b, init(params_b), {"param_prior_std": 1.0}, basis, y_w, t_w)
    params_new = res["params"]
    tuning = fth.get_tuning_softplus(params_new, basis)
    smooth, lml, filt, ratios, acc, ll = hmm.smooth_combined_chunked(
        y_b, tuning, {}, trans, jnp.ones(N), jnp.ones(L), engine="prob"
    )
    return params_new, smooth, float(lml), acc


def test_mesh_factorization():
    assert spmd.factorize_devices(8, batch=2) == (2, 2, 2)
    assert spmd.factorize_devices(4, batch=1) == (1, 2, 2)
    assert spmd.factorize_devices(2, batch=1) == (1, 2, 1)
    assert spmd.factorize_devices(1, batch=1) == (1, 1, 1)
    for n, b in [(8, 2), (4, 1), (2, 4), (1, 1)]:
        d, t, nn = spmd.factorize_devices(n, b)
        assert d * t * nn == n


def test_sharded_em_step_matches_single_device(setup):
    y, basis, params, log_post, trans = setup
    mesh = spmd.make_mesh(8, batch=2)
    assert dict(mesh.shape) == {"data": 2, "time": 2, "neuron": 2}

    opt_state = jax.vmap(optax.adam(0.01).init)(params)
    step = spmd.make_sharded_poisson_em_step(mesh, basis, trans, m_maxiter=10)
    params2, _, log_post2, lml, _ = step(params, opt_state, log_post, y)
    jax.block_until_ready(params2)

    for b in range(B):
        p_ref, smooth_ref, lml_ref, _ = _single_device_em_step(
            y[b], basis, params[b], log_post[b], trans
        )
        np.testing.assert_allclose(
            np.asarray(params2[b]), np.asarray(p_ref), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(float(lml[b]), lml_ref, rtol=1e-5)
        # sharded posterior is the latent marginal of the smoothed joint
        want = np.exp(
            np.asarray(
                jax.scipy.special.logsumexp(smooth_ref, axis=1)
            )
        )
        got = np.exp(np.asarray(log_post2[b]))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


def test_pipeline_matches_acc(setup):
    """The psum'd pairwise-joint accumulation equals the single-device one."""
    y, basis, params, log_post, trans = setup
    # run the pipeline pieces directly under shard_map on a time-only mesh
    from jax.sharding import Mesh, PartitionSpec as P

    devices = np.array(jax.devices()[:4]).reshape(1, 4, 1)
    mesh = Mesh(devices, ("data", "time", "neuron"))

    tuning = fth.get_tuning_softplus(params[0], basis)
    ll = emissions.poisson_loglik(y[0], tuning, jnp.ones(N), jnp.ones(L))

    def prog(ll_local):
        post, prior, ratios, final = spmd._pipeline_forward(
            ll_local, trans, 1.0, "time"
        )
        smooth, acc = spmd._pipeline_backward(post, prior, trans, "time")
        return post, smooth, acc, final[1]

    fn = jax.shard_map(
        prog, mesh=mesh,
        in_specs=(P("time", None),),
        out_specs=(P("time", None, None), P("time", None, None), P(), P()),
        check_vma=False,
    )
    post, smooth, acc, lml = jax.jit(fn)(ll)

    smooth_ref, lml_ref, filt_ref, _, acc_ref, _ = hmm.smooth_combined_chunked(
        y[0], tuning, {}, trans, jnp.ones(N), jnp.ones(L), engine="prob"
    )
    np.testing.assert_allclose(float(lml), float(lml_ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(post), np.exp(np.asarray(filt_ref)), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(smooth), np.exp(np.asarray(smooth_ref)), rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(acc), np.exp(np.asarray(acc_ref)), rtol=1e-3, atol=1e-6
    )


def test_graft_entry_single_chip():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "_graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out[0]))


def test_graft_entry_multichip():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "_graft_entry2", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
