"""Plotting layer: smoke tests on the Agg backend + file outputs."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

from poor_man_gplvm_tpu import plotting
from poor_man_gplvm_tpu.utils.timeseries import IntervalSet, Tsd, TsdFrame


@pytest.fixture(autouse=True)
def _close_figs():
    yield
    plt.close("all")


def test_save_fig(tmp_path):
    fig, ax = plt.subplots()
    ax.plot([0, 1], [0, 1])
    paths = plotting.save_fig(fig, "t", fig_dir=str(tmp_path),
                              fig_format=["png"])
    assert all((tmp_path / "t.png").exists() for _ in paths)


def test_mean_error_and_shuffle_dist():
    rng = np.random.default_rng(0)
    fig, ax = plotting.plot_mean_error_plot(rng.normal(size=(20, 30)))
    assert len(ax.lines) == 1
    fig2, ax2 = plotting.plot_shuffle_data_dist_with_thresh(
        rng.normal(size=200), 2.5
    )
    assert len(ax2.lines) >= 2  # data line + threshold


def test_subplots_wrapper():
    fig, axs = plotting.subplots_wrapper(5)
    assert axs.size >= 5


def test_pynapple_dashboard():
    t = np.arange(100) * 0.1
    data = {
        "trace": Tsd(d=np.sin(t), t=t),
        "heat": TsdFrame(d=np.random.default_rng(0).random((100, 8)), t=t),
        "raster": (t[::5], np.arange(20) % 4, np.arange(20)),
    }
    fig, axs, common = plotting.plot_pynapple_data_mpl(
        data, add_scatter_to_heatmap=True
    )
    assert len(axs) == 3
    assert float(common.start[0]) == 0.0


def test_shades_and_scalebar():
    fig, ax = plt.subplots()
    ax.plot(np.arange(10))
    plotting.shade_intervals(ax, IntervalSet(np.array([1.0]), np.array([3.0])))
    plotting.add_vertical_shades_mpl(fig, [(5.0, 6.0)])
    plotting.add_scalebar(ax, 0.1, 0.1, 0.2, label="1 s")
    assert len(ax.patches) >= 2


def test_data_shuffle_time_series_and_cdf():
    rng = np.random.default_rng(0)
    fig, ax = plotting.plot_data_shuffle_time_series(
        rng.normal(size=21) + 3, rng.normal(size=(50, 21))
    )
    assert len(ax.lines) == 1
    fig2, ax2, ks = plotting.plot_cdf_and_ks_test(
        rng.normal(size=100), rng.normal(size=100) + 1
    )
    assert ks["p"] < 0.01


def test_brain_state_and_prepost():
    intervals = {
        "REM": IntervalSet(np.array([0.0, 5.0]), np.array([1.0, 6.0])),
        "NREM": IntervalSet(np.array([2.0]), np.array([4.0])),
    }
    fig, ax = plotting.plot_brain_state_intervals(intervals)
    assert len(ax.get_yticklabels()) == 2

    t = np.arange(100) * 0.1
    tsd = Tsd(d=np.sin(t), t=t)
    fig2, ax2 = plotting.pre_post_1d_timeseries_plot(
        tsd, IntervalSet(np.array([0.0]), np.array([4.0])),
        IntervalSet(np.array([5.0]), np.array([9.9])),
    )
    assert len(ax2.lines) == 2


def test_tick_helpers():
    fig, ax = plt.subplots()
    ax.plot([0, 10], [-3.7, 7.2])
    plotting.set_two_ticks(ax)
    assert len(ax.get_yticks()) == 2
    plotting.set_symmetric_ticks(ax)
    ticks = ax.get_yticks()
    assert len(ticks) == 3 and ticks[1] == 0 and ticks[0] == -ticks[2]


def test_maze_and_paired():
    rng = np.random.default_rng(0)
    df = pd.DataFrame({"x": rng.random(100), "y": rng.random(100)})
    fig, ax = plotting.plot_maze_background(df)
    assert len(ax.lines) == 1
    fig2, ax2 = plotting.plot_paired_line_median(rng.random((10, 5)))
    assert len(ax2.lines) == 11
    fig3, ax3 = plotting.plot_trajectories_on_maze_mark_events(
        None, rng.random((3, 20)), rng.random((3, 20))
    )
    assert len(ax3.collections) >= 3


def test_plotly_gated():
    with pytest.raises(ImportError, match="plotly"):
        plotting.plot_pynapple_data_plotly({})


def test_extras():
    from poor_man_gplvm_tpu.plotting import (
        animate_3d_scatter, diverging_heatmap, mean_bootstraperror_lineplot,
        p_to_star, plot_pca3d, plot_rasterplot, turn_off_spines,
    )

    # reference tiers: inclusive upper bounds, '****' at p <= 1e-4
    assert p_to_star(0.0001) == "****"
    assert p_to_star(0.0005) == "***"
    assert p_to_star(0.001) == "***"
    assert p_to_star(0.05) == "*"
    assert p_to_star(0.2) == "n.s."
    rng = np.random.default_rng(0)
    fig, ax = plot_rasterplot(event_l=[rng.uniform(0, 10, 20) for _ in range(5)])
    assert len(ax.collections) == 5
    fig2, ax2 = plot_rasterplot(binary_mat=rng.random((30, 4)) > 0.8)
    turn_off_spines(ax2)
    assert not ax2.spines["top"].get_visible()
    fig3, ax3, im = diverging_heatmap(rng.normal(size=(10, 10)))
    lo, hi = im.get_clim()
    assert lo == -hi
    fig4, ax4 = mean_bootstraperror_lineplot(rng.normal(size=(20, 15)),
                                             n_boot=50, rng=0)
    assert len(ax4.lines) == 1
    fig5, ax5, ani = animate_3d_scatter(rng.normal(size=(20, 3)))
    assert ani is not None
    # render one frame so Animation.__del__ doesn't warn that the animation
    # was deleted without ever being drawn
    ani._init_draw()
    ani._draw_frame(0)
    fig6, ax6, proj = plot_pca3d(rng.normal(size=(50, 8)))
    assert proj.shape == (50, 3)


def test_multipage_wrapper(tmp_path):
    from poor_man_gplvm_tpu.plotting import plot_multipage_wrapper

    def plot_one(x, fig=None, ax=None):
        ax.plot(x)

    paths = plot_multipage_wrapper(
        plot_one, [np.arange(5)] * 7, nplots_per_page=4,
        fig_save_dir=str(tmp_path),
    )
    assert len(paths) == 2


def test_plotly_private_helpers():
    """The reference's per-key style machinery (reference
    plot_helper.py:88-113): deep style merge, scalar-or-dict option
    resolution, and int-or-list tick requests."""
    from poor_man_gplvm_tpu.plotting.plotly_helpers import (
        _compute_tickvals,
        _deep_update,
        _per_key,
    )

    base = {"marker": {"size": 3, "color": "red"}, "mode": "lines"}
    _deep_update(base, {"marker": {"size": 7}})
    assert base == {"marker": {"size": 7, "color": "red"}, "mode": "lines"}

    assert _per_key({"a": 5}, "a") == 5
    assert _per_key({"a": 5}, "b") is None
    assert _per_key(42, "anything") == 42

    assert _compute_tickvals(3, 0.0, 1.0) == [0.0, 0.5, 1.0]
    assert _compute_tickvals([1.5, 2.5], 0, 1) == [1.5, 2.5]
    assert _compute_tickvals(None, 0, 1) is None
    assert _compute_tickvals(4, 2.0, 2.0) == [2.0]
    assert _compute_tickvals(4, np.nan, 1.0) is None
