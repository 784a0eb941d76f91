"""Validation layer: shuffles, significance, entropy, jump segmentation,
initializers, sorting, internal timeseries containers."""

import jax.random as jr
import numpy as np
import pytest

import poor_man_gplvm_tpu as pmg
from poor_man_gplvm_tpu import initializers, validation
from poor_man_gplvm_tpu.utils import compat, sorting
from poor_man_gplvm_tpu.utils.timeseries import IntervalSet, Ts, Tsd, TsdFrame


def test_circular_shuffle_preserves_counts():
    rng = np.random.default_rng(0)
    y = rng.poisson(2.0, size=(50, 4)).astype(float)
    shuffles = list(validation.circular_shuffle_data(y, n_shuffle=3, seed=1))
    assert len(shuffles) == 3
    for s in shuffles:
        s = np.asarray(s)
        # circular shift preserves each neuron's count multiset
        for j in range(4):
            np.testing.assert_array_equal(
                np.sort(s[:, j]), np.sort(y[:, j])
            )
    assert not np.allclose(np.asarray(shuffles[0]), np.asarray(shuffles[1]))


def test_shuffle_and_decode_and_significance():
    model = pmg.PoissonGPLVMJump1D(8, n_latent_bin=10, tuning_lengthscale=3.0)
    _, y = model.sample(60, key=jr.PRNGKey(0))
    model.fit_em(y, n_iter=2, verboase=False)
    res = validation.shuffle_and_decode(
        model, np.asarray(y), n_shuffle=3, verbose=False
    )
    assert res["log_marginal_l"].shape == (3, 60)

    y_tsd = compat.tsdframe(d=np.asarray(y), t=np.arange(60) * 0.1)
    test_res = validation.test_one_model(
        y_tsd, model, n_shuffle=5, decoder_type="naive_bayes", seed=0
    )
    assert len(np.asarray(test_res["is_sig_tsd"].d)) == 60
    assert test_res["log_marg_thresh"].shape == (60,)


def test_compute_entropy():
    p = np.full((5, 4), 0.25)
    ent = validation.compute_entropy(np.log(p), axis=-1)
    np.testing.assert_allclose(ent, np.log(4), rtol=1e-6)


def test_contrast_axis():
    rng = np.random.default_rng(0)
    tuning = rng.gamma(2, 1, size=(20, 6))
    x = rng.normal(size=(30, 6))
    proj, axis = validation.get_contrast_axis_and_proj(x, tuning, 5, 15)
    np.testing.assert_allclose(np.linalg.norm(axis), 1.0, rtol=1e-6)
    assert proj.shape == (30,)


def test_segment_trial_by_jump():
    t = np.arange(40) * 0.1
    jump_p = np.zeros(40)
    jump_p[18:22] = 0.9  # one jump epoch in the middle
    post_map = np.concatenate([np.full(20, 3.0), np.full(20, 12.0)])
    res = validation.segment_trial_by_jump(
        Tsd(d=jump_p, t=t), Tsd(d=post_map, t=t),
        jump_p_merge_threshold_time=0.15,
    )
    assert len(res["jump_epoch"]) == 1
    assert len(res["continuous_epoch"]) == 2
    medians = sorted(res["post_map_median_per_epoch"].values())
    assert medians[0] == 3.0 and medians[1] == 12.0


def test_init_with_pca():
    rng = np.random.default_rng(0)
    y = rng.poisson(2.0, size=(100, 30)).astype(float)
    logp = initializers.init_with_pca(y, n_latent_bin=10)
    assert logp.shape == (100, 10)
    np.testing.assert_allclose(
        np.exp(np.asarray(logp)).sum(axis=1), 1.0, rtol=1e-5
    )
    with pytest.raises(AssertionError):
        initializers.init_with_pca(y, n_latent_bin=50)


def test_init_with_label():
    t = np.arange(100) * 0.1
    label = np.linspace(0, 1, 100)
    logp = initializers.init_with_label_1D(Tsd(d=label, t=t), n_latent_bin=10)
    post = np.exp(logp)
    np.testing.assert_allclose(post.sum(axis=1), 1.0, rtol=1e-5)
    # label ramps up -> peak bin index should ramp up
    peaks = post.argmax(axis=1)
    assert peaks[0] == 0 and peaks[-1] == 9

    # with a wider t_l than label support
    t_l = np.arange(-20, 120) * 0.1
    logp2 = initializers.init_with_label_1D(
        Tsd(d=label, t=t), n_latent_bin=10, t_l=t_l
    )
    post2 = np.exp(logp2)
    np.testing.assert_allclose(post2.sum(axis=1), 1.0, rtol=1e-5)
    # outside label support: near-uniform
    assert post2[0].max() < 0.3


def test_post_fit_sort_neuron():
    rng = np.random.default_rng(0)
    tuning = np.zeros((10, 5))
    peaks = [7, 2, 9, 0, 4]
    for n, p in enumerate(peaks):
        tuning[p, n] = 1.0
    out = sorting.post_fit_sort_neuron({"tuning": tuning})
    np.testing.assert_array_equal(out["argsort"], np.argsort(peaks))
    spk = rng.poisson(2, size=(20, 5)).astype(float)
    out2 = sorting.post_fit_sort_neuron({"tuning": tuning}, spk=spk)
    assert out2["spk_to_plot"].shape == (20, 5)
    assert out2["spk_to_plot"].max() <= 1.0
    # plural alias (README spelling)
    assert sorting.post_fit_sort_neurons is sorting.post_fit_sort_neuron


def test_interval_set_algebra():
    a = IntervalSet(np.array([0.0, 5.0]), np.array([2.0, 8.0]))
    b = IntervalSet(np.array([1.0]), np.array([6.0]))
    diff = a.set_diff(b)
    assert len(diff) == 2
    np.testing.assert_allclose(diff.start, [0.0, 6.0])
    np.testing.assert_allclose(diff.end, [1.0, 8.0])
    merged = IntervalSet(
        np.array([0.0, 2.5, 10.0]), np.array([2.0, 4.0, 12.0])
    ).merge_close_intervals(1.0)
    assert len(merged) == 2
    uni = a.union(b)
    assert len(uni) == 1
    np.testing.assert_allclose([uni.start[0], uni.end[0]], [0.0, 8.0])


def test_threshold_respects_support_gaps():
    """Chained thresholds: runs may not merge across gaps in the parent's
    time support (pynapple semantics; a second .threshold on an already-
    filtered Tsd sees gap-straddling samples as index-adjacent)."""
    t = np.arange(12, dtype=float)
    d = np.array([0, 5, 5, 0, 0, 5, 5, 0, 5, 5, 0, 0], dtype=float)
    hi = Tsd(d=d, t=t).threshold(4, method="aboveequal")
    assert len(hi.time_support) == 3
    # all kept samples satisfy the second condition -> one index run,
    # which must still split into the three support intervals
    both = hi.threshold(6, method="belowequal")
    assert len(both.time_support) == 3
    np.testing.assert_allclose(both.time_support.start, [1.0, 5.0, 8.0])
    np.testing.assert_allclose(both.time_support.end, [2.0, 6.0, 9.0])


def test_ts_value_from():
    src = Tsd(d=np.arange(10, dtype=float), t=np.arange(10, dtype=float))
    ts = Ts(np.array([0.1, 4.9, 7.2]))
    got = ts.value_from(src)
    np.testing.assert_array_equal(np.asarray(got.d), [0.0, 5.0, 7.0])


def test_tsdframe_indexing():
    tf = TsdFrame(d=np.arange(12).reshape(6, 2).astype(float), t=np.arange(6.0))
    col = tf[:, 1]
    assert isinstance(col, Tsd)
    np.testing.assert_array_equal(col.d, [1, 3, 5, 7, 9, 11])
    sub = tf.restrict(IntervalSet(np.array([1.0]), np.array([3.0])))
    assert sub.shape == (3, 2)


def test_tsdframe_bool_mask_keeps_time_support():
    """Boolean indexing must preserve the parent's restricted time_support
    instead of rebuilding a [t_first, t_last] span across epoch gaps."""
    t = np.arange(10.0)
    tf = TsdFrame(d=np.arange(20).reshape(10, 2).astype(float), t=t)
    ep = IntervalSet(np.array([0.0, 7.0]), np.array([2.0, 9.0]))
    sub = tf.restrict(ep)[np.ones(6, dtype=bool)]
    assert len(sub.time_support) == 2
    np.testing.assert_allclose(sub.time_support.start, [0.0, 7.0])
    np.testing.assert_allclose(sub.time_support.end, [2.0, 9.0])


def test_lowpass_filter_keeps_columns():
    from poor_man_gplvm_tpu.utils.timeseries import apply_lowpass_filter

    t = np.arange(0, 10, 0.01)
    tf = TsdFrame(
        d=np.column_stack([np.sin(t), np.cos(t)]), t=t, columns=["x", "y"]
    )
    f = apply_lowpass_filter(tf, 5.0)
    assert list(f.columns) == ["x", "y"]
    assert isinstance(f["x"], Tsd)


@pytest.mark.parametrize("decoder_type", ["naive_bayes", "dynamics"])
def test_shuffle_and_decode_batched_equals_serial(decoder_type):
    """The vmapped shuffle fan-out returns the same stacked dict (same
    shuffle stream, same values) as the per-shuffle loop
    (VERDICT round-2 next #7)."""
    model = pmg.PoissonGPLVMJump1D(6, n_latent_bin=8, tuning_lengthscale=2.0)
    _, y = model.sample(60, key=jr.PRNGKey(0))
    kw = dict(n_shuffle=5, seed=3, verbose=False, decoder_type=decoder_type)
    res_s = validation.shuffle_and_decode(
        model, np.asarray(y), batched=False, **kw
    )
    res_b = validation.shuffle_and_decode(
        model, np.asarray(y), batched=True, shuffle_batch_size=2, **kw
    )
    assert set(res_s) == set(res_b)
    for k in res_s:
        a, b = np.asarray(res_s[k]), np.asarray(res_b[k])
        assert a.shape == b.shape, k
        mask = np.isfinite(a)
        np.testing.assert_allclose(
            b[mask], a[mask], rtol=2e-4, atol=1e-5, err_msg=k
        )
        assert (np.isfinite(b) == mask).all(), k


def test_shuffle_and_decode_batched_nonfull_memory_mode():
    """Regression: at large T*L the smoother auto-selects checkpoint/filter
    memory modes whose log_likelihood_all is None; the batched path must
    return the key as None (like decode_latent) instead of crashing in
    np.concatenate."""
    model = pmg.PoissonGPLVMJump1D(6, n_latent_bin=8, tuning_lengthscale=2.0)
    _, y = model.sample(60, key=jr.PRNGKey(0))
    res = validation.shuffle_and_decode(
        model, np.asarray(y), n_shuffle=3, seed=3, verbose=False,
        decoder_type="dynamics", batched=True, shuffle_batch_size=2,
        memory_mode="checkpoint",
    )
    assert res["log_likelihood_all"] is None
    full = validation.shuffle_and_decode(
        model, np.asarray(y), n_shuffle=3, seed=3, verbose=False,
        decoder_type="dynamics", batched=True, shuffle_batch_size=2,
    )
    np.testing.assert_allclose(
        res["log_marginal_final"], full["log_marginal_final"], rtol=1e-5
    )
