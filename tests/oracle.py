"""Brute-force float64 numpy HMM forward-backward oracle.

Mirrors the reference smoother's exact semantics (uniform init pushed through
the transition at t=0, per-step normalized pairwise joints accumulated over
t) on a generic dense S-state chain, for validating both the probability-
space and log-space engines on tiny problems.
"""

import numpy as np


def dense_forward_backward(ll, M, pi, likelihood_scale=1.0):
    """ll: (T, S) log-likelihoods; M: (S, S) row-stochastic transition;
    pi: (S,) initial state distribution (pre-push, i.e. the filter carry at
    t=-1, matching the reference's uniform init decoder.py:181).

    Returns dict with filtered/smoothed posteriors, priors, per-step log
    marginal ratios, total log marginal, and the accumulated pairwise joint
    (sum over t of the per-step normalized joint)."""
    ll = np.asarray(ll, dtype=np.float64)
    M = np.asarray(M, dtype=np.float64)
    T, S = ll.shape

    alpha = np.asarray(pi, dtype=np.float64).copy()
    filt = np.zeros((T, S))
    prior = np.zeros((T, S))
    ratios = np.zeros(T)
    logZ = 0.0
    for t in range(T):
        p = alpha @ M
        prior[t] = p
        m = ll[t].max()
        u = p * np.exp(likelihood_scale * (ll[t] - m))
        s = u.sum()
        alpha = u / s
        filt[t] = alpha
        ratios[t] = np.log(s) + likelihood_scale * m
        logZ += ratios[t]

    # scaled backward pass
    beta = np.ones(S)
    smooth = np.zeros((T, S))
    smooth[-1] = filt[-1]
    acc = np.zeros((S, S))
    for t in range(T - 2, -1, -1):
        m = ll[t + 1].max()
        e_next = np.exp(likelihood_scale * (ll[t + 1] - m))
        c_next = np.exp(ratios[t + 1] - likelihood_scale * m)  # scaled normalizer
        w = e_next * beta / c_next
        xi = filt[t][:, None] * M * w[None, :]
        # per-step normalized pairwise joint (sums to 1 by construction)
        acc += xi
        beta = M @ w
        smooth[t] = filt[t] * beta
        smooth[t] /= smooth[t].sum()

    return {
        "filtered": filt,
        "smoothed": smooth,
        "prior": prior,
        "log_marginal_ratios": ratios,
        "log_marginal": logZ,
        "acc_joint": acc,
    }


def joint_to_dense(Tdyn, Tlat):
    """Flatten the (dyn, latent) structured transition into a dense
    (2L, 2L) matrix M[(d,i),(e,j)] = Tdyn[d,e] * Tlat[e,i,j]."""
    Tdyn = np.asarray(Tdyn, dtype=np.float64)
    Tlat = np.asarray(Tlat, dtype=np.float64)
    n_dyn, L, _ = Tlat.shape
    M = np.zeros((n_dyn * L, n_dyn * L))
    for d in range(n_dyn):
        for e in range(n_dyn):
            M[d * L : (d + 1) * L, e * L : (e + 1) * L] = Tdyn[d, e] * Tlat[e]
    return M


def dense_acc_to_joint(acc, n_dyn, L):
    """Reshape a dense (2L, 2L) accumulated joint back to (d, e, i, j)."""
    acc = np.asarray(acc)
    out = np.zeros((n_dyn, n_dyn, L, L))
    for d in range(n_dyn):
        for e in range(n_dyn):
            out[d, e] = acc[d * L : (d + 1) * L, e * L : (e + 1) * L]
    return out
