"""Spike rasters + posterior dashboard (mirrors spike_raster_plots.ipynb)."""
import matplotlib
matplotlib.use("Agg")
import numpy as np
import jax.random as jr
import poor_man_gplvm_tpu as pmg
from poor_man_gplvm_tpu.plotting import plot_pynapple_data_mpl, save_fig
from poor_man_gplvm_tpu.utils.timeseries import Tsd, TsdFrame
from poor_man_gplvm_tpu.utils import post_fit_sort_neuron

model = pmg.PoissonGPLVMJump1D(20, n_latent_bin=15, tuning_lengthscale=3.0)
_, spk = model.sample(800, key=jr.PRNGKey(0))
em = model.fit_em(spk, n_iter=3, verboase=False)
dec = model.decode_latent(spk)

spk = np.asarray(spk)
t = np.arange(800) * 0.01
order = post_fit_sort_neuron(em)["argsort"]
tt, uu = np.nonzero(spk[:, order])
fig, axs, _ = plot_pynapple_data_mpl(
    {
        "posterior": TsdFrame(d=np.asarray(dec["posterior_latent_marg"]), t=t),
        "jump p": Tsd(d=np.asarray(dec["posterior_dynamics_marg"])[:, 1], t=t),
        "raster": (t[tt], uu, uu),
    },
    add_scatter_to_heatmap={"posterior": True},
)
paths = save_fig(fig, "raster_dashboard", fig_dir="/tmp/pmg_examples",
                 fig_format=["png"])
print("saved", paths)
