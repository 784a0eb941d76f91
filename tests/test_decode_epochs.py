"""decode_latent_epochs: one vmapped program over padded epoch stacks must
equal per-epoch standalone smoother decodes EXACTLY (padding rows carry an
all-zero neuron mask -> constant emission likelihood -> they cancel from
both the log-marginal and the smoothed posterior over real rows).

Reference workload being batched: reactivation_analysis.py:21-55 (host
loop over epochs)."""

import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import poor_man_gplvm_tpu as pmg
from poor_man_gplvm_tpu.analysis import reactivation

T, N, L = 600, 12, 15


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(3)
    y = rng.poisson(1.0, size=(T, N)).astype(np.float32)
    model = pmg.PoissonGPLVMJump1D(
        N, n_latent_bin=L, movement_variance=1.0, tuning_lengthscale=4.0
    )
    model.fit_em(jnp.asarray(y), key=jr.PRNGKey(0), n_iter=2,
                 verboase=False)
    return model, y


def _random_intervals(rng, n_epochs, min_len=3, max_len=40):
    starts = rng.integers(0, T - max_len, size=n_epochs)
    lens = rng.integers(min_len, max_len, size=n_epochs)
    return np.stack([starts, starts + lens], axis=1).astype(np.int64)


def test_matches_per_epoch_decode(fitted):
    model, y = fitted
    rng = np.random.default_rng(7)
    intervals = _random_intervals(rng, 9)
    res = model.decode_latent_epochs(y, intervals)

    assert res["posterior_latent_marg"].shape[0] == 9
    for e, (a, b) in enumerate(intervals):
        solo = model.decode_latent(jnp.asarray(y[a:b]))
        post_solo = np.asarray(solo["posterior_latent_marg"])
        post_batch = res["posterior_latent_marg"][e, : b - a]
        np.testing.assert_allclose(post_batch, post_solo,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            res["log_marginal_per_epoch"][e],
            float(solo["log_marginal_final"]), rtol=1e-5,
        )
        # padded tail is NaN-marked
        assert np.all(np.isnan(res["posterior_latent_marg"][e, b - a:]))
        # posterior_mean matches the masked mean
        np.testing.assert_allclose(
            res["posterior_mean"][e], post_solo.mean(axis=0),
            rtol=1e-4, atol=1e-6,
        )


def test_batch_size_chunks_equal_single_dispatch(fitted):
    model, y = fitted
    rng = np.random.default_rng(11)
    intervals = _random_intervals(rng, 7)
    full = model.decode_latent_epochs(y, intervals)
    parts = model.decode_latent_epochs(y, intervals, batch_size=3)
    np.testing.assert_allclose(
        parts["log_marginal_per_epoch"], full["log_marginal_per_epoch"],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.nan_to_num(parts["posterior_latent_marg"]),
        np.nan_to_num(full["posterior_latent_marg"]), rtol=1e-5, atol=1e-7,
    )


def test_time_valued_intervals(fitted):
    model, y = fitted
    t_l = 10.0 + 0.01 * np.arange(T)
    iv_idx = np.array([[50, 90], [200, 230]])
    iv_time = np.stack(
        [t_l[iv_idx[:, 0]] - 1e-4, t_l[iv_idx[:, 1] - 1] + 1e-4], axis=1
    )
    a = model.decode_latent_epochs(y, iv_idx)
    b = model.decode_latent_epochs(y, iv_time, t_l=t_l)
    np.testing.assert_allclose(
        b["log_marginal_per_epoch"], a["log_marginal_per_epoch"], rtol=1e-6
    )


def test_latent_only_model(fitted):
    _, y = fitted
    model = pmg.PoissonGPLVM1D(
        N, n_latent_bin=L, movement_variance=1.0, tuning_lengthscale=4.0
    )
    model.fit_em(jnp.asarray(y), key=jr.PRNGKey(1), n_iter=2,
                 verboase=False)
    intervals = np.array([[10, 60], [100, 117]])
    res = model.decode_latent_epochs(y, intervals)
    for e, (a, b) in enumerate(intervals):
        solo = model.decode_latent(jnp.asarray(y[a:b]))
        # latent-only decode_res has no separate latent marginal:
        # posterior_all IS (T, L) (reference decoder_latentonly.py:242-247)
        np.testing.assert_allclose(
            res["posterior_latent_marg"][e, : b - a],
            np.asarray(solo["posterior_all"]),
            rtol=1e-4, atol=1e-5,
        )


def test_reactivation_wrapper(fitted):
    model, y = fitted
    intervals = np.array([[5, 45], [60, 100], [300, 320]])
    out = reactivation.decode_ripple_epochs(model, y, intervals)
    assert out["posterior_mean_df"].shape == (3, L)
    assert len(out["log_marginal_per_epoch"]) == 3
    np.testing.assert_allclose(
        out["posterior_mean_df"].sum(axis=1), 1.0, rtol=1e-4
    )


def test_input_validation(fitted):
    model, y = fitted
    with pytest.raises(ValueError):
        model.decode_latent_epochs(y, np.array([[5, 5]]))  # empty epoch
    with pytest.raises(ValueError):
        model.decode_latent_epochs(y, np.array([1, 2, 3]))  # not (E, 2)
    with pytest.raises(ValueError):
        # float intervals without t_l
        model.decode_latent_epochs(y, np.array([[0.5, 1.5]]))
