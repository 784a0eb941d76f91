"""Post-fit workflows: ACh and T-maze dataset analyses on synthetic data."""

import numpy as np
import pandas as pd
import pytest

from poor_man_gplvm_tpu.workflows import ach_dataset as ach
from poor_man_gplvm_tpu.workflows import tmaze_dataset as tmz
from poor_man_gplvm_tpu.utils.timeseries import IntervalSet, Ts, Tsd, TsdFrame


# ---------------------------------------------------------------------------
# ACh workflow
# ---------------------------------------------------------------------------


def test_find_ach_ramp_onset():
    t = np.arange(2000) * 0.01
    # two clear ramps at t=5 and t=12
    ach_sig = np.zeros_like(t)
    ach_sig += 1.0 / (1 + np.exp(-(t - 5) * 4))
    ach_sig += 1.0 / (1 + np.exp(-(t - 12) * 4))
    res = ach.find_ach_ramp_onset(
        Tsd(d=ach_sig, t=t), smooth_win=0.2, finite_diff_window_s=0.5,
        height=0.1,
    )
    onsets = np.asarray(res["ach_ramp_onset"].t)
    assert len(onsets) == 2
    assert abs(onsets[0] - 5) < 1.5 and abs(onsets[1] - 12) < 1.5


def test_event_triggered_analysis_detects_step():
    rng = np.random.default_rng(0)
    t = np.arange(5000) * 0.01
    events = np.array([10.0, 20.0, 30.0, 40.0])
    feat = rng.normal(0, 0.1, len(t))
    for ev in events:
        feat[t >= ev] += 1.0  # step up at each event
    res = ach.event_triggered_analysis(
        Tsd(d=feat, t=t), Ts(events), n_shuffle=5, minmax=2, test_win=1,
    )
    assert res["diff_median"] > 0.5
    assert res["wc_res"].pvalue < 0.2  # only 4 events; weak but positive
    assert res["reg_res"]["p_intercept_diff"] < 0.05


def test_sleep_state_and_segregation():
    t = np.arange(100) * 1.0
    state = np.zeros(100)
    state[20:40] = 2  # NREM
    state[60:70] = 4  # REM
    intv_d = ach.turn_sleep_state_tsd_to_interval(Tsd(d=state, t=t))
    assert len(intv_d["NREM"]) == 1
    assert len(intv_d["REM"]) == 1
    events = {"ev": Ts(np.array([25.0, 65.0, 90.0]))}
    seg = ach.segregate_event_ts_by_sleep_state(events, intv_d)
    assert len(seg["ev_NREM"].t) == 1
    assert len(seg["ev_REM"].t) == 1


def test_pre_post_diff_and_shuffle_test():
    cols = np.linspace(-2, 2, 21)
    df = pd.DataFrame(
        np.where(cols[None, :] > 0, 1.0, 0.0) + np.zeros((10, 21)),
        columns=cols,
    )
    dres = ach.get_post_pre_diff(df)
    assert dres["diff_median"] == pytest.approx(1.0)
    df_sh = pd.DataFrame(np.random.default_rng(0).normal(0, 0.1, (50, 21)),
                         columns=cols)
    test = ach.test_pre_post_against_shuffle(df, df_sh)
    assert test["p"] > 0.95  # observed diff exceeds all shuffles


def test_mean_feature_and_distance_matrix():
    t = np.arange(100) * 0.1
    post = np.zeros((100, 4))
    post[:50, 0] = 1.0
    post[50:, 3] = 1.0
    feature_d = {"p_latent": TsdFrame(d=post, t=t)}
    interval_d = {
        "bouts": IntervalSet(np.array([0.0, 6.0]), np.array([2.0, 8.0]))
    }
    mf = ach.get_mean_feature_in_interval(feature_d, interval_d)
    assert mf["p_latent", "bouts"].shape == (2, 4)
    dist = ach.get_distance_matrix(mf)
    D = dist["p_latent", "bouts"]
    assert D.shape == (2, 2)
    assert D[0, 1] > 0.5  # disjoint distributions are far apart


def test_cluster_peri_event():
    rng = np.random.default_rng(0)
    up = np.linspace(0, 1, 20) + rng.normal(0, 0.05, (15, 20))
    down = np.linspace(1, 0, 20) + rng.normal(0, 0.05, (15, 20))
    peri = pd.DataFrame(np.vstack([up, down]))
    res = ach.cluster_peri_event(peri, n_cluster=2)
    labels = res["kmeans"].labels_
    assert (labels[:15] == labels[0]).all()
    assert (labels[15:] == labels[15]).all()
    assert labels[0] != labels[15]

    res2 = ach.manual_cluster_peri_event(
        pd.DataFrame(np.vstack([up, down]),
                     columns=np.linspace(-2, 2, 20)),
        time_window=(-2, 0), n_cluster=2,
    )
    assert len(res2["peri_event_per_cluster_d"]) == 2


def test_latent_cluster_vs_timing_regression():
    rng = np.random.default_rng(0)
    nrem = IntervalSet(np.arange(5) * 100.0, np.arange(5) * 100.0 + 80.0)
    events_per_intv = 8
    t, labels = [], []
    for i in range(5):
        tt = np.sort(rng.uniform(i * 100, i * 100 + 80, events_per_intv))
        t.append(tt)
        # label depends on interval index -> predictable from intv phase
        labels.append(np.full(events_per_intv, i % 2))
    res = ach.latent_cluster_vs_timing_regression(
        np.concatenate(labels), Ts(np.concatenate(t)), nrem,
        n_shuffle=10, rng=0,
    )
    assert 0 <= res["score"] <= 1
    assert "shuffle_res_d" in res


# ---------------------------------------------------------------------------
# T-maze workflow
# ---------------------------------------------------------------------------


@pytest.fixture
def tmaze_sim():
    rng = np.random.default_rng(0)
    T = 400
    t = np.arange(T) * 0.1
    # latent 0: spatial at (0,0); latent 1: spatial at (10,10);
    # latent 2: immobility; latent 3: off-maze at (50,50)
    map_latent = rng.integers(0, 4, T)
    speed = np.where(map_latent == 2, 1.0, 10.0)
    xy = np.zeros((T, 2))
    xy[map_latent == 1] = [10, 10]
    xy[map_latent == 3] = [50, 50]
    xy += rng.normal(0, 0.3, (T, 2))
    maze_xy = np.stack(
        [np.linspace(0, 15, 50), np.linspace(0, 15, 50)], axis=1
    )
    return (
        Tsd(d=map_latent.astype(float), t=t),
        TsdFrame(d=xy, t=t),
        Tsd(d=speed, t=t),
        maze_xy,
    )


def test_classify_latent(tmaze_sim):
    map_latent, pos, speed, maze_xy = tmaze_sim
    res = tmz.classify_latent(
        map_latent, pos, speed, maze_xy, speed_thresh=5,
        dist_to_maze_thresh=5, min_run_time=10, min_off_maze_time=10, eps=3,
    )
    assert res["is_spatial_all_latent"][0.0]
    assert res["is_spatial_all_latent"][1.0]
    assert res["is_immobility_all_latent"][2.0]
    assert res["is_off_maze_all_latent"][3.0]
    assert 0.0 in res["cluster_label_per_time_all_latent"]


def test_latent_field_properties(tmaze_sim):
    map_latent, pos, speed, maze_xy = tmaze_sim
    res = tmz.classify_latent(map_latent, pos, speed, maze_xy)
    lin = Tsd(d=np.asarray(pos.d)[:, 0], t=pos.t)
    props = tmz.get_latent_field_properties(
        res["latent_occurance_index_per_speed_level"],
        res["cluster_label_per_time_all_latent"], lin,
    )
    assert "mean" in props.columns
    # latent 1's field mean should be near x=10
    lat1 = props.loc[props.index.get_level_values(0) == 1.0]
    assert abs(lat1["mean"].iloc[0] - 10) < 2


def test_circular_stats():
    vals = np.array([350.0, 355.0, 5.0, 10.0])  # wraps around 0/360
    m = tmz._circular_mean(vals, 0.0, 360.0)
    assert m < 20 or m > 340  # near the wrap point, not ~180
    s = tmz._circular_std(vals, 0.0, 360.0)
    assert s < 30
    d = tmz._circular_diff(5.0, 355.0, 0.0, 360.0)
    assert d == pytest.approx(10.0)


def test_latent_pair_and_transition_times():
    t = np.arange(20) * 0.5
    path = np.array([0, 0, 5, 5, 0, 0, 5, 5, 0, 0] * 2, dtype=float)
    ind_l, ts_l = tmz.find_all_index_per_latent_pair(
        [(0, 5)], Tsd(d=path, t=t), merge_latent_threshold=0
    )
    np.testing.assert_array_equal(ind_l[0], [2, 6, 12, 16])

    lin = Tsd(d=np.tile(np.linspace(100, 130, 10), 2), t=t)
    beh = {"lin": lin}
    trials = pd.DataFrame({"start": [0.0, 5.0], "end": [4.5, 9.5]})
    trans_ts = tmz.find_transition_times(beh, trials, lin_pt=115,
                                         tolerance=10)
    assert len(trans_ts.t) == 2


def test_reward_latent_selection():
    rng = np.random.default_rng(0)
    T = 300
    t = np.arange(T) * 0.1
    map_latent = rng.integers(0, 3, T).astype(float)
    lin = np.where(map_latent == 1, 111.0, 50.0) + rng.normal(0, 0.5, T)
    speed = np.full(T, 1.0)
    occ = tmz.get_latent_occurance_index_per_speed_level(
        Tsd(d=map_latent, t=t), Tsd(d=speed, t=t), [5]
    )
    trials = pd.DataFrame(
        {
            "start": [0.0, 15.0], "end": [14.9, 29.9],
            "choice": [1, 1], "visitedArm": [0, 1],
        }
    )
    occ_range = tmz.get_latent_in_position_range(
        occ, Tsd(d=lin, t=t), trials, reward_lin_range=(109, 113),
        speed_level=0,
    )
    both = tmz.get_both_reward_latent(occ_range, frac_thresh=0.7,
                                      total_thresh=10)
    assert both == [1.0]
    single = tmz.get_single_reward_latent(occ_range, frac_thresh=0.7,
                                          total_thresh=10)
    assert 1.0 not in single


def test_peri_transition_consensus():
    t = np.arange(500) * 0.1
    jump = np.zeros(500)
    trans_times = np.array([10.0, 20.0, 30.0])
    for tt in trans_times:
        jump[int(tt / 0.1)] = 1.0  # consensus exactly at transitions
    res_frac = tmz.compute_consensus_fractions_by_window(
        np.ones((11, 3)), max_window_size=3
    )
    assert (res_frac == 1.0).all()

    sh = tmz.compute_shuffle_consensus_fractions(
        Tsd(d=jump, t=t), Ts(trans_times), win=1, win_size_int=2,
        n_shuffle=5, rng=0,
    )
    assert len(sh) == 5


def test_find_ach_ramp_onset_old():
    t = np.arange(2000) * 0.01
    ach_sig = 1.0 / (1 + np.exp(-(t - 5) * 4)) + 1.0 / (
        1 + np.exp(-(t - 12) * 4)
    )
    res = ach.find_ach_ramp_onset_old(
        Tsd(d=ach_sig, t=t), smooth_win=0.2, height=0.1, shift=-0.5
    )
    onsets = np.asarray(res["ach_ramp_onset"].t)
    assert len(onsets) == 2
    # slope peaks at the sigmoid midpoints, shifted back by 0.5 s
    assert abs(onsets[0] - 4.5) < 1.0 and abs(onsets[1] - 11.5) < 1.0
    assert {"slope", "ach_data_smth", "ach_data", "peak_heights"} <= set(res)


def test_get_time_of_arrival_based_one_position():
    t = np.arange(100) * 0.1
    # two passes through lin in [109, 113]
    lin = np.concatenate([
        np.linspace(100, 120, 40), np.linspace(120, 100, 40),
        np.full(20, 100.0),
    ])
    pos = TsdFrame(d=lin[:, None], t=t, columns=["lin"])
    arrivals = tmz.get_time_of_arrival_based_one_position(
        pos, lin_range=(109, 113)
    )
    assert len(arrivals.t) == 2
    assert np.all(109 <= np.interp(arrivals.t, t, lin))
    assert np.all(np.interp(arrivals.t, t, lin) <= 113.5)

    # regression: two visits separated by a dip BELOW the band.  The first
    # chained threshold drops the dip samples, leaving the two visits
    # index-adjacent; the second threshold must still report two epochs
    # (the runs must respect the gap in the restricted time support).
    lin2 = np.concatenate([
        np.full(10, 100.0), np.full(10, 111.0),  # visit 1
        np.full(10, 100.0),                      # dip below the band
        np.full(10, 111.0), np.full(10, 100.0),  # visit 2
    ])
    t2 = np.arange(len(lin2)) * 0.1
    pos2 = TsdFrame(d=lin2[:, None], t=t2, columns=["lin"])
    arrivals2 = tmz.get_time_of_arrival_based_one_position(
        pos2, lin_range=(109, 113)
    )
    assert len(arrivals2.t) == 2
    np.testing.assert_allclose(arrivals2.t, [1.0, 3.0])


def test_plot_latent_helpers(tmaze_sim):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    map_latent, pos, speed, maze_xy = tmaze_sim
    t = np.asarray(pos.t)
    beh = TsdFrame(
        d=np.column_stack([np.asarray(pos.d), np.asarray(speed.d)]),
        t=t, columns=["x", "y", "speed_gauss"],
    )
    # multi-latent, color by latent index
    out = tmz.plot_latent_list_vs_position(
        [0, 1], np.asarray(map_latent.d), beh, color=None, color_time=False,
        seperate_colorbar=False,
    )
    assert len(out) == 2
    # single latent colored by time + separate colorbar
    out = tmz.plot_latent_list_vs_position(
        [1], np.asarray(map_latent.d), beh, seperate_colorbar=True,
    )
    assert len(out) == 4
    fig, axs = tmz.plot_multiple_latent_spatial_map(
        [0, 1], Tsd(d=np.asarray(map_latent.d, dtype=float), t=t), beh,
        position_tsdf=beh[["x", "y"]],
    )
    assert np.ravel(axs).size >= 2
    post = np.random.default_rng(0).dirichlet(np.ones(3), 50)
    fig, axs = tmz.plot_multiple_latent_posterior_in_time(post)
    assert np.ravel(axs).size >= 3
    plt.close("all")
