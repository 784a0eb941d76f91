"""Analysis layer: posterior-weighted averages, distances, regressions,
reactivation shuffles, spec-tree filtering, OLS utilities."""

import numpy as np
import pandas as pd
import pytest

from poor_man_gplvm_tpu import analysis
from poor_man_gplvm_tpu.utils import stats as pstats
from poor_man_gplvm_tpu.utils.pandas_util import filter_df_with_spec
from poor_man_gplvm_tpu.utils.timeseries import IntervalSet, Ts, Tsd, TsdFrame, TsGroup


# ---------------------------------------------------------------------------
# posterior analyses
# ---------------------------------------------------------------------------


def test_posterior_weighted_average():
    T, L = 100, 4
    t = np.arange(T) * 0.1
    post = np.zeros((T, L))
    post[:50, 0] = 1.0
    post[50:, 1] = 1.0
    feature = Tsd(d=np.concatenate([np.zeros(50), np.ones(50) * 10]), t=t)
    pwa = analysis.get_posterior_weighted_average(
        feature, TsdFrame(d=post, t=t)
    )
    assert pwa[0] == pytest.approx(0.0)
    assert pwa[1] == pytest.approx(10.0)

    feat2 = TsdFrame(d=np.column_stack([feature.d, 2 * np.asarray(feature.d)]), t=t)
    pwa2 = analysis.get_posterior_weighted_average(feat2, TsdFrame(d=post, t=t))
    assert pwa2.shape == (4, 2)
    assert pwa2.iloc[1, 1] == pytest.approx(20.0)


def test_get_state_interval():
    t = np.arange(200) * 0.1
    p = np.zeros(200)
    p[20:60] = 0.95   # long interval (4 s)
    p[100:105] = 0.95  # short interval (0.4 s) -> dropped by duration
    intv = analysis.get_state_interval(
        Tsd(d=p, t=t), p_thresh=0.8, merge_thresh=0.3, duration_thresh=2
    )
    assert len(intv) == 1
    assert intv.start[0] == pytest.approx(2.0)


def test_peri_event_with_shuffle():
    t = np.arange(1000) * 0.01
    x = np.zeros(1000)
    events = np.array([2.0, 5.0, 8.0])
    for ev in events:
        idx = int(ev / 0.01)
        x[idx - 5 : idx + 5] = 1.0  # bump at each event
    peri, peri_sh = analysis.get_peri_event_with_shuffle(
        Tsd(d=x, t=t), Ts(events), n_shuffle=3, minmax=0.5, do_zscore=False,
        verbose=False, rng=0,
    )
    assert peri.shape[0] == 3  # n_event rows
    # bump visible at center
    center = peri.shape[1] // 2
    assert np.asarray(peri)[:, center].mean() == pytest.approx(1.0)
    assert peri_sh.shape[0] == 3  # n_shuffle mean rows


def test_consecutive_pv_distance():
    X = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 0.0]])
    d_cos = analysis.get_consecutive_pv_distance(X, metric="cosine")
    np.testing.assert_allclose(d_cos, [0.0, 1.0, 2.0])  # same, orth, one-zero
    d_euc = analysis.get_consecutive_pv_distance(X, metric="euclidean")
    np.testing.assert_allclose(d_euc, [0.0, np.sqrt(2), 1.0])


def test_sequence_occurrence():
    path = np.array([0, 1, 2, 3, 9, 0, 1, 2, 3, 5])
    _, idx = analysis.get_sequence_occurence([1, 2, 3], path,
                                             latent_distance_thresh=0)
    np.testing.assert_array_equal(idx, [1, 6])
    _, idx2 = analysis.get_sequence_occurence([1, 2, 4], path,
                                              latent_distance_thresh=1)
    np.testing.assert_array_equal(idx2, [1, 6, 7])


# ---------------------------------------------------------------------------
# OLS + prepost regression
# ---------------------------------------------------------------------------


def test_ols_matches_closed_form():
    rng = np.random.default_rng(0)
    x = rng.normal(size=200)
    y = 2.0 + 3.0 * x + rng.normal(0, 0.5, size=200)
    X = pstats.add_constant(x)
    res = pstats.ols_fit(X, y)
    np.testing.assert_allclose(res.params, [2.0, 3.0], atol=0.15)
    assert res.rsquared > 0.9
    assert res.pvalues[1] < 1e-10
    tt = res.t_test([0, 1])
    assert tt["pvalue"] < 1e-10
    assert tt["ci_low"] < 3.0 < tt["ci_high"]


def test_ols_cluster_robust_inflates_se():
    rng = np.random.default_rng(1)
    n_groups, per = 10, 30
    groups = np.repeat(np.arange(n_groups), per)
    group_effect = rng.normal(0, 2.0, size=n_groups)[groups]
    x = rng.normal(size=n_groups * per)
    y = 1.0 + 0.5 * x + group_effect + rng.normal(0, 0.1, size=n_groups * per)
    X = pstats.add_constant(x)
    res_plain = pstats.ols_fit(X, y)
    res_cluster = pstats.ols_fit(X, y, cov_type="cluster", groups=groups)
    # clustered SE of the intercept must be much larger under group effects
    assert res_cluster.bse[0] > 2 * res_plain.bse[0]
    assert res_cluster.df_resid == n_groups - 1


def test_fit_time_prepost_interaction():
    rng = np.random.default_rng(2)
    times = np.linspace(-2, 2, 21)
    n_rep = 15
    # pre: flat at 0; post: slope up from 1
    resp = np.where(times[None, :] >= 0, 1.0 + 2.0 * times[None, :], 0.0)
    resp = resp + rng.normal(0, 0.1, size=(n_rep, len(times)))
    df = pd.DataFrame(resp)
    res = analysis.fit_time_prepost_interaction(df, time=times, cov="cluster")
    sd = res["summary_df"]
    assert set(sd.index) == {
        "slope_pre", "slope_post", "slope_diff",
        "intercept_pre", "intercept_post", "intercept_diff",
    }
    assert res["p_interaction"] < 0.01       # slopes genuinely differ
    assert res["p_intercept_diff"] < 0.01    # intercepts differ
    assert abs(res["coef_pre"]["slope"]) < 0.2
    assert res["coef_post"]["slope"] > 0.5
    with pytest.raises(ValueError):
        analysis.fit_time_prepost_interaction(df, time=times + 10)


# ---------------------------------------------------------------------------
# distance analyses
# ---------------------------------------------------------------------------


def test_compute_distance_lag():
    X = np.arange(10, dtype=float)[:, None]  # distance == index lag
    res = analysis.compute_distance_lag(X)
    by = res["by_index_lag"]
    np.testing.assert_allclose(by["mean"], by["index_lag"])
    res2 = analysis.compute_distance_lag(
        X, label_d=np.arange(10) * 2.0, max_index_lag=3
    )
    assert res2["pairs_df"]["index_lag"].max() == 3
    assert res2["by_label_lag"] is not None


def test_w1_cdf_distance_matrix():
    P = np.array([[1.0, 0, 0], [0, 0, 1.0], [0, 1.0, 0]])
    D, C = analysis.w1_cdf_distance_matrix(P)
    # W1 between point masses at bins i and j = |i - j|
    np.testing.assert_allclose(D[0, 1], 2.0)
    np.testing.assert_allclose(D[0, 2], 1.0)
    np.testing.assert_allclose(np.diag(D), 0.0)


def test_distance_vs_label_regression_and_shuffle():
    rng = np.random.default_rng(3)
    n = 40
    labels = rng.uniform(0, 10, size=n)
    # distance proportional to |dlabel| + noise
    D = np.abs(labels[:, None] - labels[None, :]) + rng.normal(
        0, 0.1, size=(n, n)
    )
    D = (D + D.T) / 2
    np.fill_diagonal(D, 0)
    res = analysis.distance_vs_label_regression(D, labels, nbins=10)
    assert res["summary"]["slope"] == pytest.approx(1.0, abs=0.05)
    assert res["summary"]["r2"] > 0.9
    assert len(res["pairs_df"]) == n * (n - 1) // 2

    sh = analysis.shuffle_test_distance_vs_label(
        D, labels, n_shuffles=50, rng=0, nbins=10
    )
    assert sh["p_slope_two_sided"] < 0.05
    assert sh["slopes_shuf"].shape == (50,)

    # NaN labels dropped
    labels_nan = labels.copy()
    labels_nan[:5] = np.nan
    res2 = analysis.distance_vs_label_regression(D, labels_nan)
    assert len(res2["kept_idx"]) == n - 5


def test_interpolate_stacks_and_dist():
    mats = [
        np.linspace(0, 1, n)[:, None] * np.ones((1, 3)) for n in (11, 23, 37)
    ]
    out = analysis.interpolate_stacks(mats, n_point=5)
    assert out["stack"].shape == (3, 5, 3)
    np.testing.assert_allclose(out["std"], 0.0, atol=1e-7)
    np.testing.assert_allclose(out["mean"][:, 0], np.linspace(0, 1, 5), atol=1e-7)
    dd = analysis.interpolate_compute_dist_mat(mats, n_point=5)
    assert dd["D_mean"].shape == (5, 5)


def test_labels_to_transition_matrix():
    labels = np.array([0, 0, 1, 1, 0, 2])
    P, states = analysis.labels_to_transition_matrix(labels)
    assert states == [0, 1, 2]
    np.testing.assert_allclose(P.sum(axis=1), [1, 1, 0], atol=1e-12)
    np.testing.assert_allclose(P[0], [1 / 3, 1 / 3, 1 / 3])
    P_seg, _ = analysis.labels_to_transition_matrix(labels, mode="segment")
    np.testing.assert_allclose(P_seg[0], [0, 0.5, 0.5])
    P_ex, states_ex = analysis.labels_to_transition_matrix(
        labels, exclude={2}
    )
    assert states_ex == [0, 1]

    res = analysis.get_transmat_and_shuffle(labels, n_shuffle=20, rng=0)
    assert res["trans_mat_sh_l"].shape == (20, 3, 3)
    assert res["is_sig"].shape == (3, 3)


# ---------------------------------------------------------------------------
# reactivation
# ---------------------------------------------------------------------------


def test_reactivation_shuffles():
    rng = np.random.default_rng(0)
    post_d = {"pre": rng.dirichlet(np.ones(6), 30),
              "post": rng.dirichlet(np.ones(6), 40)}
    sh = analysis.random_reassign_prepost_latent_difference(
        post_d, n_shuffle=5, verbose=False, rng=0
    )
    assert sh.shape == (5 * 6, 3)
    m = analysis.circular_shuffle_column_independently(
        rng.poisson(2, (50, 4)).astype(float), rng=0
    )
    assert m.shape == (50, 4)


@pytest.mark.parametrize("decoder_type", ["naive_bayes", "dynamics"])
def test_reactivation_shuffle_decode_batched_equals_serial(decoder_type):
    """The vmapped within-epoch shuffle-decode fan-out must match the
    serial reference loop (same RNG stream, same mean posteriors)."""
    import jax.random as jr

    import poor_man_gplvm_tpu as pmg

    model = pmg.PoissonGPLVMJump1D(5, n_latent_bin=6, tuning_lengthscale=2.0)
    _, y = model.sample(80, key=jr.PRNGKey(0))
    t = np.arange(80) * 0.1
    spk = TsdFrame(d=np.asarray(y), t=t)
    eps = {"pre": IntervalSet(np.array([0.0]), np.array([3.95])),
           "post": IntervalSet(np.array([4.0]), np.array([7.95]))}
    kw = dict(n_shuffle=4, verbose=False, decoder_type=decoder_type)
    res_s = analysis.circular_shuffle_spikes_within_epoch_and_decode(
        model, spk, eps, rng=7, batched=False, **kw
    )
    res_b = analysis.circular_shuffle_spikes_within_epoch_and_decode(
        model, spk, eps, rng=7, batched=True, shuffle_batch_size=3, **kw
    )
    assert res_s.shape == res_b.shape
    np.testing.assert_allclose(
        res_b.to_numpy(), res_s.to_numpy(), rtol=2e-4, atol=1e-6
    )


def test_homogeneous_poisson_surrogates():
    g = TsGroup({0: np.sort(np.random.default_rng(0).uniform(0, 10, 100)),
                 1: np.sort(np.random.default_rng(1).uniform(0, 10, 50))})
    intv = {"pre": IntervalSet(np.array([0.0]), np.array([5.0])),
            "post": IntervalSet(np.array([5.0]), np.array([10.0]))}
    surr, rates, nbins, t_l = analysis.generate_homogeneous_poisson_surrogate_data(
        g, intv, count_bin=0.1, n_repeat=3, verbose=False, rng=0
    )
    assert len(surr) == 3
    assert surr[0].shape == (nbins["pre"] + nbins["post"], 2)
    assert rates["pre"][0] == pytest.approx(10.0, rel=0.5)


def test_aggregate_within_ripple():
    t = np.arange(100) * 0.01
    post = np.random.default_rng(0).dirichlet(np.ones(5), 100)
    ripples = IntervalSet(np.array([0.1, 0.5]), np.array([0.2, 0.6]))
    out = analysis.aggregate_within_ripple_per_epoch(
        TsdFrame(d=post, t=t), {"pre": ripples}
    )
    assert out["pre"].shape == (5,)


# ---------------------------------------------------------------------------
# pandas spec filter
# ---------------------------------------------------------------------------


def test_filter_df_with_spec():
    df = pd.DataFrame(
        {
            "region": ["CA1", "CA1", "DG", "MEC"],
            "rate": [1.0, 5.0, 2.0, 8.0],
            "name": ["unit a", "unit b", "cell c", "cell d"],
        }
    )
    out = filter_df_with_spec(df, ["rate", ">", 1.5])
    assert len(out["df"]) == 3
    # verify the generated query string reproduces the mask
    assert df.query(out["query"], local_dict=out["env"]).equals(out["df"])

    out2 = filter_df_with_spec(
        df, {"all": [["region", "in", ["CA1", "DG"]], ["rate", "<", 3]]}
    )
    assert list(out2["df"].index) == [0, 2]
    assert df.query(out2["query"], local_dict=out2["env"]).equals(out2["df"])

    out3 = filter_df_with_spec(df, ["any", ["rate", ">", 7], ["region", "==", "DG"]])
    assert list(out3["df"].index) == [2, 3]

    out4 = filter_df_with_spec(df, {"not": ["region", "==", "CA1"]})
    assert list(out4["df"].index) == [2, 3]

    out5 = filter_df_with_spec(df, ["name", "startswith", "unit"])
    assert list(out5["df"].index) == [0, 1]

    out6 = filter_df_with_spec(df, ["rate", "between", (1.5, 5.0)])
    assert list(out6["df"].index) == [1, 2]

    # implicit-AND (bare list of leaves): the query string must stay
    # balanced and round-trip (a paren-stripping bug used to emit
    # 'a > @v0) and (b < @v1')
    out7 = filter_df_with_spec(df, [["rate", ">", 1.5], ["region", "==", "DG"]])
    assert list(out7["df"].index) == [2]
    assert df.query(out7["query"], local_dict=out7["env"]).equals(out7["df"])

    # implicit AND list
    out7 = filter_df_with_spec(df, [["rate", ">", 1.5], ["region", "==", "DG"]])
    assert list(out7["df"].index) == [2]

    with pytest.raises(KeyError):
        filter_df_with_spec(df, ["nope", ">", 1])


def test_acg_zero_lag_correction_targets_right_bin():
    """Zero-lag self-pairs must be removed from the bin whose LEFT edge is
    0 (where np.histogram puts them) — not argmin(|tau|), which tie-breaks
    to the bin centered at -bin_s/2 and left negative counts plus phantom
    pairs."""
    spk = np.array([1.0, 2.0, 3.0])
    tau, counts = analysis.compute_acg_counts(
        spk, bin_s=0.001, half_window_s=0.25
    )
    assert (counts >= 0).all()
    # the three self-pairs are gone from the zero-containing bin
    zero_bin = np.searchsorted(
        -0.25 + np.arange(len(tau) + 1) * 0.001, 0.0, side="right"
    ) - 1
    assert counts[zero_bin] == 0
    # spikes 1 s apart: no other pairs inside the 0.25 s window
    assert counts.sum() == 0
    # with exclusion off, the self-pairs are present exactly there
    _, counts_keep = analysis.compute_acg_counts(
        spk, bin_s=0.001, half_window_s=0.25, exclude_zero=False
    )
    assert counts_keep[zero_bin] == 3
