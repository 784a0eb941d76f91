"""Full bilateral analysis pipeline on synthetic data.

End-to-end port of the reference's richest notebook
(``analysis_example.ipynb``, 28 cells: load bilateral spike counts ->
supervised position init -> fit L/R models -> monitor EM -> tuning curves
-> decode -> jump probabilities -> npz/mat export -> posterior figures),
extended with the post-fit analyses the notebook's downstream consumers
run (jump intervals, peri-event ACh-style shuffle test, pre/post
reactivation) so the whole workflow is exercised in one script.

Synthetic stand-in for the notebook's Kilosort/OptiTrack session: one
shared 1-D latent trajectory drives TWO hemisphere populations, exactly
the structure the notebook builds from probes 0-3.

Reference flow: analysis_example.ipynb cells 12 (position binning),
17-19 (supervised init + fit), 20 (EM monitor), 22 (tuning curves),
23 (decode + jump probs), 24-25 (npz + mat export), 26-27 (posterior
figures); post-fit analyses per post_fit_ach_dataset.py:362-391 and
reactivation_analysis.py:21-55.
"""

import os
import tempfile

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import jax.numpy as jnp
import jax.random as jr
from scipy.io import savemat

import poor_man_gplvm_tpu as pmg
from poor_man_gplvm_tpu.analysis.posterior import (
    get_peri_event_with_shuffle,
    get_state_interval,
)
from poor_man_gplvm_tpu.analysis.reactivation import (
    circular_shuffle_spikes_within_epoch_and_decode,
    decode_pre_post,
)
from poor_man_gplvm_tpu.initializers import init_with_label_1D
from poor_man_gplvm_tpu.plotting import (
    plot_mean_error_plot,
    plot_shuffle_data_dist_with_thresh,
    save_fig,
)
from poor_man_gplvm_tpu.utils import post_fit_sort_neuron
from poor_man_gplvm_tpu.utils import timeseries as nap

OUT_DIR = os.environ.get("PMG_EXAMPLE_OUT", tempfile.mkdtemp(prefix="pmg09_"))
FIG_DIR = os.path.join(OUT_DIR, "figures")
os.makedirs(FIG_DIR, exist_ok=True)

# ---------------------------------------------------------------------------
# "Session": one latent trajectory, two hemisphere populations
# ---------------------------------------------------------------------------
T, N_PER_HEMI, L = 1200, 12, 20
DT = 0.01  # notebook WINDOW_SIZE/STEP_SIZE (10 ms bins)
gen = pmg.PoissonGPLVMJump1D(
    2 * N_PER_HEMI, n_latent_bin=L, movement_variance=1.0,
    tuning_lengthscale=3.0,
)
state_l, spk = gen.sample(T, key=jr.PRNGKey(0))
# sample() returns (T, 2) [dynamics, latent]; the latent path plays the
# role of the notebook's binned position
pos_bins = np.asarray(state_l)[:, 1].astype(float)
spk = np.asarray(spk)
spk_l, spk_r = spk[:, :N_PER_HEMI], spk[:, N_PER_HEMI:]
times = np.arange(T) * DT
print(f"session: T={T} bins x {2 * N_PER_HEMI} units, {L} position bins")

# ---------------------------------------------------------------------------
# Supervised init from the binned position (notebook cell 17's
# log_posterior_init; reference initializer.py:40-86)
# ---------------------------------------------------------------------------
log_posterior_init = jnp.asarray(
    init_with_label_1D(pos_bins, n_latent_bin=L)
)

# ---------------------------------------------------------------------------
# Fit one model per hemisphere (notebook cell 19) and monitor EM (cell 20)
# ---------------------------------------------------------------------------
models, em_res = {}, {}
for hemi, counts in [("L", spk_l), ("R", spk_r)]:
    m = pmg.PoissonGPLVMJump1D(
        N_PER_HEMI, n_latent_bin=L, movement_variance=0.5,
        tuning_lengthscale=7.0,
    )
    em_res[hemi] = m.fit_em(
        counts, key=jr.PRNGKey(3), n_iter=8,
        log_posterior_init=log_posterior_init, verboase=False,
    )
    models[hemi] = m
    lml = np.asarray(em_res[hemi]["log_marginal_l"])
    assert lml[-1] > lml[0], "EM must improve the log marginal"
    print(f"hemisphere {hemi}: lml {lml[0]:.0f} -> {lml[-1]:.0f}")

fig, axs = plt.subplots(1, 2, figsize=(10, 3))
for ax, hemi in zip(axs, "LR"):
    ax.plot(np.asarray(em_res[hemi]["log_marginal_l"]), lw=2)
    ax.set(xlabel="EM iteration", ylabel="log marginal",
           title=f"EM convergence ({hemi})")
save_fig(fig, "em_convergence", fig_dir=FIG_DIR, fig_format=("png",))

# ---------------------------------------------------------------------------
# Tuning curves, neurons ordered by peak (notebook cell 22)
# ---------------------------------------------------------------------------
order = post_fit_sort_neuron(em_res["R"])["argsort"]
fig, ax = plt.subplots(figsize=(6, 4))
tuning_r = np.asarray(models["R"].tuning)
for rank, n in enumerate(order[:6]):
    ax.plot(tuning_r[:, n], label=f"unit {n}")
ax.set(xlabel="latent bin", ylabel="rate / bin", title="tuning curves (R)")
ax.legend(fontsize=6)
save_fig(fig, "tuning_curves", fig_dir=FIG_DIR, fig_format=("png",))

# ---------------------------------------------------------------------------
# Decode both hemispheres (notebook cell 23): latent posterior + jump /
# continuous dynamics probabilities
# ---------------------------------------------------------------------------
dec = {h: models[h].decode_latent(c)
       for h, c in [("L", spk_l), ("R", spk_r)]}
latent_post = {h: np.asarray(d["posterior_latent_marg"])
               for h, d in dec.items()}
jump_prob = {h: np.asarray(d["posterior_dynamics_marg"])[:, 1]
             for h, d in dec.items()}
map_latent = {h: latent_post[h].argmax(axis=1) for h in "LR"}
decode_r = float(np.corrcoef(map_latent["R"], pos_bins)[0, 1])
print(f"decode MAP vs true position: r={decode_r:.2f} (R hemisphere)")

# posterior heatmaps with the true position overlaid (notebook cells 26-27)
fig, axs = plt.subplots(2, 1, figsize=(10, 5), sharex=True)
for ax, hemi in zip(axs, "RL"):
    ax.imshow(latent_post[hemi].T, aspect="auto", origin="lower",
              cmap="viridis", extent=[times[0], times[-1], 0, L])
    ax.plot(times, pos_bins, color="w", lw=1, alpha=0.6)
    ax.set(ylabel="latent bin", title=f"posterior ({hemi})")
axs[-1].set_xlabel("time (s)")
save_fig(fig, "latent_posteriors", fig_dir=FIG_DIR, fig_format=("png",))

# ---------------------------------------------------------------------------
# npz + mat export (notebook cells 24-25's exact persistence contract)
# ---------------------------------------------------------------------------
npz_path = os.path.join(OUT_DIR, "gplvm_posteriors.npz")
np.savez_compressed(
    npz_path,
    latent_posteriors_r=latent_post["R"], jump_prob_r=jump_prob["R"],
    latent_posteriors_l=latent_post["L"], jump_prob_l=jump_prob["L"],
    time_array=times, pos_bins=pos_bins,
)
data = np.load(npz_path)
savemat(npz_path.replace(".npz", ".mat"),
        {k: data[k] for k in data.files})
print(f"exported posteriors -> {npz_path} (+ .mat)")

# ---------------------------------------------------------------------------
# Jump intervals: threshold -> merge -> duration filter
# (reference analysis_helper.py:32-50)
# ---------------------------------------------------------------------------
jump_tsd = nap.Tsd(t=times, d=jump_prob["R"])
jump_intv = get_state_interval(
    jump_tsd, p_thresh=0.5, merge_thresh=3 * DT, duration_thresh=0.0
)
print(f"jump intervals (R): {len(jump_intv)} "
      f"(total {jump_intv.tot_length():.2f}s)")

# ---------------------------------------------------------------------------
# Peri-event analysis around jump onsets with a circular-shift null
# (reference analysis_helper.py:66-112): does the POPULATION RATE deflect
# around detected jumps more than chance?
# ---------------------------------------------------------------------------
if len(jump_intv) >= 2:
    pop_rate = nap.Tsd(t=times, d=spk_r.sum(axis=1).astype(float))
    jump_onsets = nap.Ts(np.asarray(jump_intv.start))
    peri, peri_sh = get_peri_event_with_shuffle(
        pop_rate, jump_onsets, n_shuffle=20, minmax=0.2, verbose=False,
        rng=0,
    )
    fig, ax = plt.subplots(figsize=(5, 3))
    plot_mean_error_plot(np.asarray(peri), ax=ax, color="C0",
                         label="around jumps")
    plot_mean_error_plot(np.asarray(peri_sh), ax=ax, color="C7",
                         label="shifted null")
    ax.set(xlabel="peri-event bin", ylabel="z pop rate")
    ax.legend(fontsize=7)
    save_fig(fig, "peri_jump_rate", fig_dir=FIG_DIR, fig_format=("png",))
    print(f"peri-event matrix: {np.asarray(peri).shape} events x bins")

# ---------------------------------------------------------------------------
# Pre/post reactivation (reference reactivation_analysis.py:21-55): mean
# decoded posterior in the 'pre' vs 'post' half + a within-epoch circular
# shuffle null on the posterior difference
# ---------------------------------------------------------------------------
half = T // 2
react = decode_pre_post(
    models["R"], {"pre": spk_r[:half], "post": spk_r[half:]},
    decoder_type="dynamics",
)
diff_obs = react["post_latent_mean_d"]["diff"].to_numpy()

n_shuffle = 8
spk_tsdf = nap.TsdFrame(t=times, d=spk_r)
pre_post_epoch_d = {
    "pre": nap.IntervalSet([times[0]], [times[half]]),
    "post": nap.IntervalSet([times[half]], [times[-1]]),
}
sh = circular_shuffle_spikes_within_epoch_and_decode(
    models["R"], spk_tsdf, pre_post_epoch_d, decoder_type="dynamics",
    n_shuffle=n_shuffle, verbose=False, rng=0,
)
# sh: (shuffle, latent_bin) MultiIndex rows x [pre, post, diff] columns
diff_sh = np.stack(
    [sh.loc[i]["diff"].to_numpy() for i in range(n_shuffle)]
)
stat_obs = float(np.abs(diff_obs).max())
stat_sh = np.abs(diff_sh).max(axis=1)
fig, ax = plt.subplots(figsize=(4, 3))
plot_shuffle_data_dist_with_thresh(stat_sh, stat_obs, ax=ax)
ax.set(xlabel="max |post - pre| posterior diff", title="reactivation")
save_fig(fig, "reactivation", fig_dir=FIG_DIR, fig_format=("png",))
p_val = float((stat_sh >= stat_obs).mean())
print(f"reactivation: observed {stat_obs:.3f}, shuffle p={p_val:.2f}")

print(f"figures -> {FIG_DIR}: {sorted(os.listdir(FIG_DIR))}")
