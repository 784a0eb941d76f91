"""Supervised baseline decoders + blocked cross-validation (mirrors
bayessian_decoding.ipynb on synthetic data)."""
import numpy as np
from poor_man_gplvm_tpu.data import (DecoderDataset, GaussianBayesDecoder,
                                     PoissonBayesDecoder)

rng = np.random.default_rng(0)
K, N, T = 8, 12, 4000
Y = rng.integers(0, K, T)
rates = rng.gamma(2.0, 2.0, size=(N, K))
X = rng.poisson(rates[:, Y]).astype(float)

ds = DecoderDataset(X, Y)
accs = []
for k in range(5):
    (X_tr, Y_tr), (X_te, Y_te), _, _ = ds.split(k, k_CV=5, n_blocks=10)
    dec = PoissonBayesDecoder(n_bins=K).fit(X_tr, Y_tr)
    accs.append((dec.predict(X_te) == Y_te).mean())
print(f"Poisson Bayes 5-fold accuracy: {np.mean(accs):.2f}")

gdec = GaussianBayesDecoder(n_bins=K).fit(X, Y)
print(f"Gaussian Bayes train accuracy: {(gdec.predict(X) == Y).mean():.2f}")
