"""Burst-restricted fitting (mirrors ripple-type-GPLVM-tunings.ipynb):
detect population bursts from z-scored MUA, fit the model only on burst
bins via a spatio-temporal neuron mask."""
import numpy as np
import jax.numpy as jnp
import jax.random as jr
import poor_man_gplvm_tpu as pmg
from poor_man_gplvm_tpu.data import detect_population_bursts

gen = pmg.PoissonGPLVMJump1D(20, n_latent_bin=15, tuning_lengthscale=3.0)
_, spk = gen.sample(800, key=jr.PRNGKey(0))
spk = np.asarray(spk)

mua = spk.sum(axis=1)
z = (mua - mua.mean()) / mua.std()
bursts = detect_population_bursts(z, BURST_THRESHOLD=1.0, STEP_SIZE=0.01,
                                  MIN_BURST_DURATION=0.0)
print(f"detected {len(bursts)} bursts")

# spatio-temporal mask: only burst bins contribute to the likelihood
ma = np.zeros_like(spk, dtype=np.float32)
for s, e in bursts:
    ma[s : e + 1] = 1.0
model = pmg.PoissonGPLVMJump1D(20, n_latent_bin=15, tuning_lengthscale=3.0)
em = model.fit_em(spk, n_iter=3, ma_neuron=jnp.asarray(ma), verboase=False)
print("burst-restricted lml:", [f"{float(v):.0f}" for v in em["log_marginal_l"]])
