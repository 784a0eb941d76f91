"""Data layer: binning conventions vs brute force, baseline decoders,
CV splits, burst detection, presence ratio, behavior alignment."""

import numpy as np
import pandas as pd
import pytest

from poor_man_gplvm_tpu import data as pdata


# ---------------------------------------------------------------------------
# binning
# ---------------------------------------------------------------------------


def _brute_force_overlapping(spike_times, spike_clusters, window, step):
    t0, t1 = spike_times.min(), spike_times.max()
    n_win = 1 + int(np.floor(((t1 - t0) - window) / step))
    bins = t0 + np.arange(n_win) * step
    units = np.unique(spike_clusters)
    mat = np.zeros((len(units), n_win))
    for i, u in enumerate(units):
        st = spike_times[spike_clusters == u]
        for k in range(n_win):
            mat[i, k] = np.sum((st >= bins[k]) & (st < bins[k] + window))
    return mat, bins, units


def test_compute_spike_counts_overlapping_matches_brute_force():
    rng = np.random.default_rng(0)
    spike_times = np.sort(rng.uniform(3.0, 40.0, size=400))
    spike_clusters = rng.integers(0, 5, size=400)
    mat, bins, units = pdata.compute_spike_counts(
        spike_times, spike_clusters, window_size=1.0, step_size=0.25
    )
    want, want_bins, want_units = _brute_force_overlapping(
        spike_times, spike_clusters, 1.0, 0.25
    )
    np.testing.assert_array_equal(units, want_units)
    np.testing.assert_allclose(bins, want_bins)
    # interior windows must match exactly; boundary windows can differ by the
    # half-open vs clip convention at the extremes — compare all but verify
    # total counts are close
    np.testing.assert_allclose(mat[:, 1:-1], want[:, 1:-1])


def test_bin_spikes_sliding_each_spike_once():
    # non-overlapping windows: every spike inside a full window counted once
    spike_times = np.array([0.1, 0.5, 1.2, 2.7, 3.3, 3.9])
    spike_clusters = np.array([0, 0, 1, 0, 1, 1])
    mat, bins, units = pdata.bin_spikes_sliding(
        spike_times, spike_clusters, window_size=1.0, step_size=1.0
    )
    np.testing.assert_array_equal(units, [0, 1])
    assert mat.shape == (2, 3)  # duration 3.9 -> 3 full windows
    np.testing.assert_array_equal(mat[0], [2, 0, 1])
    np.testing.assert_array_equal(mat[1], [0, 1, 0])


def test_smooth_and_zscore():
    x = np.vstack([np.ones(50), np.arange(50.0)])
    out = pdata.smooth_and_zscore(x, sigma=0, zscore=True)
    np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-10)
    # constant row: std 0 guarded to 1
    np.testing.assert_allclose(out[0], 0.0)


# ---------------------------------------------------------------------------
# baseline decoders
# ---------------------------------------------------------------------------


def _make_classification_data(kind, K=5, N=8, T=2000, seed=0):
    rng = np.random.default_rng(seed)
    Y = rng.integers(0, K, size=T)
    rates = rng.gamma(2.0, 2.0, size=(N, K))
    if kind == "poisson":
        X = rng.poisson(rates[:, Y])
    else:
        X = rates[:, Y] + rng.normal(0, 0.5, size=(N, T))
    return X.astype(float), Y, rates


def test_poisson_bayes_decoder_recovers_rates_and_decodes():
    X, Y, rates = _make_classification_data("poisson")
    dec = pdata.PoissonBayesDecoder(n_bins=5).fit(X, Y)
    np.testing.assert_allclose(dec.rate_, np.maximum(
        np.stack([X[:, Y == k].mean(axis=1) for k in range(5)], axis=1), 1e-4
    ), rtol=1e-6)
    lp = dec.predict_log_probabilities(X)
    assert lp.shape == (5, X.shape[1])
    np.testing.assert_allclose(lp.max(axis=0), 0.0, atol=1e-10)
    acc = (dec.predict(X) == Y).mean()
    assert acc > 0.8


def test_poisson_bayes_matches_reference_formula():
    """Vectorized predict == the reference's per-class loop formula
    (reference root core.py:1811-1829)."""
    X, Y, _ = _make_classification_data("poisson", T=300)
    dec = pdata.PoissonBayesDecoder(n_bins=5).fit(X, Y)
    K, (N, T) = 5, X.shape
    want = np.zeros((K, T))
    for k in range(K):
        want[k] = (X * dec.log_rate_[:, [k]] - dec.rate_[:, [k]]).sum(axis=0)
        want[k] += dec.log_prior_[k]
    want -= want.max(axis=0, keepdims=True)
    np.testing.assert_allclose(dec.predict_log_probabilities(X), want, rtol=1e-8)


def test_gaussian_bayes_decoder():
    X, Y, _ = _make_classification_data("gaussian")
    dec = pdata.GaussianBayesDecoder(n_bins=5).fit(X, Y)
    acc = (dec.predict(X) == Y).mean()
    assert acc > 0.8
    # per-class mean/var match direct computation
    for k in range(5):
        np.testing.assert_allclose(
            dec.mu_[:, k], X[:, Y == k].mean(axis=1), rtol=1e-6
        )
        np.testing.assert_allclose(
            dec.var_[:, k],
            np.maximum(X[:, Y == k].var(axis=1), 1e-4),
            rtol=1e-5,
        )
    with pytest.raises(ValueError):
        pdata.GaussianBayesDecoder(n_bins=5).fit(X[:, :10], Y)


def test_uniform_vs_laplace_prior():
    X, Y, _ = _make_classification_data("poisson", T=500)
    d1 = pdata.PoissonBayesDecoder(n_bins=5, uniform_prior=True).fit(X, Y)
    np.testing.assert_allclose(d1.log_prior_, -np.log(5))
    d2 = pdata.PoissonBayesDecoder(n_bins=5).fit(X, Y)
    counts = np.bincount(Y, minlength=5)
    np.testing.assert_allclose(
        np.exp(d2.log_prior_), (counts + 1) / (counts.sum() + 5), rtol=1e-8
    )


# ---------------------------------------------------------------------------
# cv split
# ---------------------------------------------------------------------------


def test_cv_split_partitions():
    data = np.arange(1000)
    all_test = []
    for k in range(10):
        train, test, tr_sw, te_sw = pdata.cv_split(data, k, k_CV=10, n_blocks=10)
        assert len(train) + len(test) == 1000
        assert len(np.intersect1d(train, test)) == 0
        assert te_sw[0] == 0
        all_test.append(test)
    # folds cover (nearly) the whole dataset; exact partition is not
    # guaranteed by the reference's float-truncating fold formula
    # (reference root core.py:1552-1555)
    covered = np.unique(np.concatenate(all_test))
    assert len(covered) >= 0.99 * len(data)


def test_decoder_dataset_split():
    X = np.arange(40, dtype=float).reshape(2, 20)
    Y = np.arange(20) % 4
    ds = pdata.DecoderDataset(X, Y)
    (X_tr, Y_tr), (X_te, Y_te), _, _ = ds.split(0, k_CV=5, n_blocks=4)
    assert X_tr.shape[0] == 2 and X_te.shape[0] == 2
    assert X_tr.shape[1] == len(Y_tr)
    assert X_te.shape[1] == len(Y_te)
    with pytest.raises(ValueError):
        pdata.DecoderDataset(X, Y[:-1])


# ---------------------------------------------------------------------------
# bursts
# ---------------------------------------------------------------------------


def test_detect_population_bursts():
    z = np.zeros(200)
    z[50:60] = 5.0   # burst 1
    z[48:50] = 1.0   # boundary-expansion shoulder (above 0)
    z[100:102] = 5.0  # too short after duration filter? 2 bins * 0.01 = 0.02 < 0.05
    z[150:160] = 5.0  # burst 2
    bounds = pdata.detect_population_bursts(
        z, BURST_THRESHOLD=3, BURST_BOUNDARY_THRESHOLD=0,
        MIN_BURST_DURATION=0.05, MIN_INTERBURST_INTERVAL=0.25, STEP_SIZE=0.01,
    )
    assert len(bounds) == 2
    # burst 1 expands left into the shoulder
    assert bounds[0][0] == 48
    assert bounds[1][0] == 150


def test_merge_overlapping_bursts_two_probes():
    tb = np.arange(100) * 0.1
    data = {
        "A": {"time_bins": tb, "burst_boundaries": [(10, 20), (50, 55)]},
        "B": {"time_bins": tb, "burst_boundaries": [(15, 25), (80, 85)]},
    }
    mA, mB, groups = pdata.merge_overlapping_bursts_two_probes(data, "A", "B")
    # group 1: A(10-20) overlaps B(15-25); group 2: A(50-55) alone; group 3: B(80-85)
    assert len(groups) == 3
    assert groups[0]["A_orig_indices"] == [0]
    assert groups[0]["B_orig_indices"] == [0]
    assert groups[1]["B_orig_indices"] == [] or groups[1]["A_orig_indices"] == []
    assert mA[0] == (10, 20)
    assert mB[0] == (15, 25)


# ---------------------------------------------------------------------------
# presence ratio + grouping + behavior
# ---------------------------------------------------------------------------


def test_presence_ratio():
    counts = np.zeros((2, 100))
    counts[0, :] = 1.0            # always present
    counts[1, :10] = 1.0          # present only in the first tenth
    tb = np.arange(100) * 0.5
    pr = pdata.get_presence_ratio(counts, tb, n_coarse_bins=10)
    assert pr[0] == 1.0
    assert pr[1] == 0.1


def test_sort_units_modes():
    rng = np.random.default_rng(0)
    m = rng.random((6, 30))
    for mode in ["mean", "peak", "corr"]:
        out = pdata.sort_units(m, mode=mode)
        assert out.shape == m.shape
        # same rows, permuted
        assert sorted(map(tuple, out)) == sorted(map(tuple, m))
    assert pdata.sort_units(None) is None
    flat = np.vstack([np.ones(30), rng.random((2, 30))])
    out = pdata.sort_units(flat, mode="corr")
    np.testing.assert_allclose(out[-1], 1.0)  # flat unit pushed to the end


def test_align_brain_and_behavior():
    T = 50
    events = pd.DataFrame(
        {
            "timestamp_ms": np.arange(0, 5000, 100),  # 50 samples at 10 Hz
            "position_x": np.linspace(0, 100, 50),
            "position_y": np.zeros(50),
            "velocity_x": np.ones(50),
            "velocity_y": np.zeros(50),
            "speed": np.ones(50),
            "reward_state": ([0] * 10 + [1] * 5 + [0] * 35),
        }
    )
    spike_rates = np.random.default_rng(0).poisson(2, size=(3, 40)).astype(float)
    time_bins = np.arange(40) * 0.1
    df = pdata.align_brain_and_behavior(
        events, spike_rates, np.array([0, 1, 2]), time_bins, window_size=0.1
    )
    assert len(df) == 40
    assert {"Unit 0", "Unit 1", "Unit 2", "x", "y", "speed", "trial_id",
            "click"}.issubset(df.columns)
    # one reward offset -> exactly one click, trial_id steps 0 -> 1
    assert df["click"].sum() == 1
    assert df["trial_id"].iloc[-1] == 1
    # position in cm (divided by 5.1)
    assert df["x"].max() < 100


def test_native_binning_matches_numpy():
    """C++ binning kernels produce bit-identical counts to the numpy path."""
    from poor_man_gplvm_tpu.data import native

    if not native.available():
        pytest.skip("no native compiler available")
    rng = np.random.default_rng(0)
    st = np.sort(rng.uniform(0, 50, 5000))
    cl = rng.integers(0, 9, 5000)
    for fn, kw in [
        (pdata.bin_spikes_sliding, dict(window_size=0.5, step_size=0.25)),
        (pdata.compute_spike_counts, dict(window_size=1.0, step_size=0.25)),
    ]:
        m_np, tb_np, u_np = fn(st, cl, use_native=False, **kw)
        m_nat, tb_nat, u_nat = fn(st, cl, use_native=True, **kw)
        np.testing.assert_array_equal(u_np, u_nat)
        np.testing.assert_allclose(tb_np, tb_nat)
        np.testing.assert_array_equal(m_np, m_nat)
