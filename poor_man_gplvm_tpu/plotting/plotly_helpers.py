"""Plotly plotting utilities (gated: plotly is an optional dependency).

TPU-native equivalent of the plotly half of reference
poor_man_gplvm/plot_helper.py (save_fig_plotly, plot_pynapple_data_plotly,
add_vertical_shades, set_plotly_fonts).  Importing this module succeeds
without plotly; calling any function raises a clear ImportError.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = [
    "save_fig_plotly",
    "plot_pynapple_data_plotly",
    "add_vertical_shades",
    "set_plotly_fonts",
]


def _require_plotly():
    try:
        import plotly.graph_objects as go
        from plotly.subplots import make_subplots

        return go, make_subplots
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "plotly is required for the interactive plotting helpers; "
            "install plotly or use poor_man_gplvm_tpu.plotting.core (mpl)"
        ) from e


def save_fig_plotly(fig, fig_name, fig_dir="./figs", fig_format=("png", "svg"),
                    scale_png=10, scale_svg=0.15):
    """Save a plotly figure in each requested format
    (reference plot_helper.py:41-56)."""
    _require_plotly()
    os.makedirs(fig_dir, exist_ok=True)
    paths = []
    for fmt in fig_format:
        path = os.path.join(fig_dir, f"{fig_name}.{fmt}")
        scale = scale_png if fmt == "png" else scale_svg
        if fmt == "html":
            fig.write_html(path)
        else:
            fig.write_image(path, scale=scale)
        paths.append(path)
    return paths


def plot_pynapple_data_plotly(data_dict, height_per_plot=250, width=900,
                              row_heights=None, shared_xaxes=True,
                              heatmap_zquantiles=(0.01, 0.99), **kwargs):
    """Stacked time-aligned dashboard of Tsd/TsdFrame panels (lines for 1-D,
    heatmaps for 2-D, scatter rasters for (t, unit, color) tuples) — the
    interactive counterpart of plot_pynapple_data_mpl
    (reference plot_helper.py:115-356).

    Returns the plotly Figure."""
    go, make_subplots = _require_plotly()
    n_plots = len(data_dict)
    fig = make_subplots(
        rows=n_plots, cols=1, shared_xaxes=shared_xaxes,
        row_heights=row_heights, vertical_spacing=0.02,
        subplot_titles=list(data_dict.keys()),
    )
    for i, (key, arr) in enumerate(data_dict.items(), start=1):
        if isinstance(arr, tuple):
            tind, uind, c_l = arr
            fig.add_trace(
                go.Scattergl(
                    x=np.asarray(tind), y=np.asarray(uind), mode="markers",
                    marker=dict(size=3, color=np.asarray(c_l),
                                colorscale="Spectral_r"),
                    name=key,
                ),
                row=i, col=1,
            )
            continue
        t = np.asarray(arr.t)
        d = np.asarray(arr.d)
        if d.ndim == 1:
            fig.add_trace(go.Scattergl(x=t, y=d, name=key), row=i, col=1)
        elif d.ndim == 2:
            zmin = float(np.nanquantile(d, heatmap_zquantiles[0]))
            zmax = float(np.nanquantile(d, heatmap_zquantiles[1]))
            fig.add_trace(
                go.Heatmap(x=t, z=d.T, zmin=zmin, zmax=zmax, name=key,
                           showscale=False),
                row=i, col=1,
            )
    fig.update_layout(height=height_per_plot * n_plots, width=width, **kwargs)
    return fig


def add_vertical_shades(fig, intvl_l, ep=None, *, exclude=None,
                        fillcolor="red", opacity=0.25, line_width=0,
                        line_dash=None, layer="above", **vrect_kwargs):
    """Shade interval spans across all subplots of a plotly figure
    (reference plot_helper.py:358-408)."""
    _require_plotly()
    if hasattr(intvl_l, "start"):
        pairs = list(zip(np.asarray(intvl_l.start), np.asarray(intvl_l.end)))
    else:
        pairs = [tuple(p) for p in np.atleast_2d(np.asarray(intvl_l))]
    if ep is not None:
        lo, hi = float(ep.start[0]), float(ep.end[0])
        pairs = [(max(s, lo), min(e, hi)) for s, e in pairs
                 if e > lo and s < hi]
    if exclude is not None:
        pairs = [p for i, p in enumerate(pairs) if i not in set(exclude)]
    line = dict(width=line_width)
    if line_dash is not None:
        line["dash"] = line_dash
    for s, e in pairs:
        fig.add_vrect(x0=s, x1=e, fillcolor=fillcolor, opacity=opacity,
                      line=line, layer=layer, **vrect_kwargs)
    return fig


def set_plotly_fonts(fig, family="Arial", size=12, title_size=None,
                     tick_size=None, legend_size=None):
    """Uniform font styling across a plotly figure
    (reference plot_helper.py:494-544)."""
    _require_plotly()
    fig.update_layout(font=dict(family=family, size=size))
    if title_size is not None:
        fig.update_layout(title_font_size=title_size)
    if tick_size is not None:
        fig.update_xaxes(tickfont_size=tick_size)
        fig.update_yaxes(tickfont_size=tick_size)
    if legend_size is not None:
        fig.update_layout(legend_font_size=legend_size)
    return fig
