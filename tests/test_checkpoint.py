"""Checkpoint/resume: durable EM state round-trip."""

import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import poor_man_gplvm_tpu as pmg
from poor_man_gplvm_tpu.utils.checkpoint import EMCheckpointer


def test_checkpointer_roundtrip(tmp_path):
    ck = EMCheckpointer(tmp_path / "ck")
    state = {"step": 3, "params": np.arange(6.0).reshape(2, 3),
             "opt_state": None, "log_posterior": np.ones((4, 5)),
             "rng": np.array([0, 1], dtype=np.uint32)}
    ck.save(3, state)
    ck.save(5, dict(state, step=5))
    assert ck.all_steps() == [3, 5]
    got = ck.restore()
    assert got["step"] == 5
    np.testing.assert_array_equal(got["params"], state["params"])
    got3 = ck.restore(3)
    assert got3["step"] == 3
    assert EMCheckpointer(tmp_path / "empty").restore() is None


def test_fit_em_checkpoint_resume(tmp_path):
    model = pmg.PoissonGPLVMJump1D(8, n_latent_bin=10, tuning_lengthscale=3.0)
    _, y = model.sample(150, key=jr.PRNGKey(0))
    ckdir = tmp_path / "em"

    # full run for ground truth
    ref = pmg.PoissonGPLVMJump1D(8, n_latent_bin=10, tuning_lengthscale=3.0)
    em_full = ref.fit_em(y, key=jr.PRNGKey(1), n_iter=4, verboase=False)

    # checkpointed run interrupted after 2 iters
    m1 = pmg.PoissonGPLVMJump1D(8, n_latent_bin=10, tuning_lengthscale=3.0)
    m1.fit_em(y, key=jr.PRNGKey(1), n_iter=2, verboase=False,
              checkpoint_dir=str(ckdir))
    ck = EMCheckpointer(ckdir)
    assert ck.all_steps() == [0, 1]

    # resume into a fresh instance and complete to 4 iters
    m2 = pmg.PoissonGPLVMJump1D(8, n_latent_bin=10, tuning_lengthscale=3.0)
    em_resumed = m2.fit_em(y, key=jr.PRNGKey(1), n_iter=4, verboase=False,
                           checkpoint_dir=str(ckdir), resume=True)
    # resumed run continues from step 2 and reaches a comparable solution
    assert len(em_resumed["log_marginal_l"]) == 2  # iterations 2, 3
    np.testing.assert_allclose(
        float(em_resumed["log_marginal"]), float(em_full["log_marginal"]),
        rtol=1e-3,
    )


def test_orbax_backend_roundtrip(tmp_path):
    """Orbax backend restores the exact pytree structure via template
    (optax opt_states come back usable)."""
    import optax

    ck = EMCheckpointer(str(tmp_path / "orbax"), use_orbax=True)
    if ck._ocp is None:
        pytest.skip("orbax not available")
    opt = optax.adam(0.01)
    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros(3)}
    state = {
        "step": 2, "params": params, "opt_state": opt.init(params),
        "log_posterior": jnp.ones((10, 5)),
        "rng": jnp.zeros(2, jnp.uint32),
    }
    ck.save(2, state)
    tmpl = {
        "step": 0, "params": params, "opt_state": opt.init(params),
        "log_posterior": jnp.zeros((10, 5)),
        "rng": jnp.zeros(2, jnp.uint32),
    }
    r = ck.restore(template=tmpl)
    g = {"w": jnp.ones((4, 3)), "b": jnp.ones(3)}
    opt.update(g, r["opt_state"], r["params"])  # structure must be valid
    np.testing.assert_allclose(
        np.asarray(r["log_posterior"]), np.ones((10, 5))
    )


def test_resume_with_filter_memory_mode(tmp_path):
    """checkpoint_dir + resume works combined with memory_mode='filter' and
    lean output: the resumed run continues the same trajectory."""
    rng = np.random.default_rng(0)
    y = rng.poisson(1.0, size=(600, 8)).astype(np.float32)

    def fresh():
        return pmg.PoissonGPLVMJump1D(8, n_latent_bin=10,
                                      tuning_lengthscale=3.0)

    kw = dict(verboase=False, n_time_per_chunk=150, memory_mode="filter",
              output_mode="lean", save_every=10**9)
    em_full = fresh().fit_em(y, key=jr.PRNGKey(0), n_iter=4, **kw)

    ckdir = str(tmp_path / "ck")
    m = fresh()
    m.fit_em(y, key=jr.PRNGKey(0), n_iter=2, checkpoint_dir=ckdir,
             checkpoint_every=1, **kw)
    m2 = fresh()
    em_res = m2.fit_em(y, key=jr.PRNGKey(0), n_iter=4, checkpoint_dir=ckdir,
                       resume=True, **kw)
    np.testing.assert_allclose(
        float(em_res["log_marginal"]), float(em_full["log_marginal"]),
        rtol=1e-4,
    )
