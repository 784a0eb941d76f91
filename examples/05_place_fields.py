"""Post-fit place fields (mirrors post-fit-GPLVM-place-fields.ipynb):
posterior-weighted average of position per latent bin + tuning sorting."""
import numpy as np
import jax.random as jr
import poor_man_gplvm_tpu as pmg
from poor_man_gplvm_tpu import analysis
from poor_man_gplvm_tpu.utils.timeseries import Tsd, TsdFrame

model = pmg.PoissonGPLVMJump1D(20, n_latent_bin=15, tuning_lengthscale=4.0)
state_l, spk = model.sample(800, key=jr.PRNGKey(0))
model.fit_em(spk, n_iter=3, verboase=False)
dec = model.decode_latent(spk)

t = np.arange(800) * 0.1
position = np.asarray(state_l[:, 1], dtype=float)  # proxy behavior variable
pwa = analysis.get_posterior_weighted_average(
    Tsd(d=position, t=t),
    TsdFrame(d=np.asarray(dec["posterior_latent_marg"]), t=t),
)
rho = np.corrcoef(np.arange(15), np.asarray(pwa))[0, 1]
print(f"latent-bin vs position-field correlation: {abs(rho):.2f} "
      "(identifiable up to mirror flip)")
