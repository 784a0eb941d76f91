"""Quickstart: simulate -> fit -> decode (mirrors the reference README and
analysis_example.ipynb)."""
import numpy as np
import jax.random as jr
import poor_man_gplvm_tpu as pmg

model = pmg.PoissonGPLVMJump1D(30, n_latent_bin=100, movement_variance=1,
                               tuning_lengthscale=10.0)
state_l, spk = model.sample(1000)
em_res = model.fit_em(spk, key=jr.PRNGKey(3), n_iter=20, verboase=False)
print("log marginal trajectory:",
      [f"{float(v):.1f}" for v in em_res["log_marginal_l"][::5]])

decode_res = model.decode_latent(spk)
print("posterior_latent_marg:", decode_res["posterior_latent_marg"].shape)
print("jump prob mean:",
      float(np.asarray(decode_res["posterior_dynamics_marg"])[:, 1].mean()))
print("transition matrix rows sum to",
      float(np.asarray(decode_res["p_transition_latent"]).sum(axis=1).mean()))

nb = model.decode_latent_naive_bayes(spk)
print("NB log marginal:", nb["log_marginal_total"])

# order neurons by tuning peak for rasters
from poor_man_gplvm_tpu.utils import post_fit_sort_neuron
order = post_fit_sort_neuron(em_res)["argsort"]
print("neuron order by tuning peak:", order[:10], "...")
