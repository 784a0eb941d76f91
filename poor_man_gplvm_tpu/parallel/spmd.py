"""Multi-chip SPMD EM over a ('data', 'time', 'neuron') device mesh.

The reference is single-process, single-device (SURVEY.md §2.5); this module
is the TPU-native scaling layer built on ``jax.shard_map`` + XLA collectives
over ICI:

* **data** (DP): independent chains/configs/sessions — the reference's main
  fan-out surface (model_selection_helper.py's serial loops become one SPMD
  program).
* **neuron** (TP): the emission log-likelihood is a sum over neurons
  (reference decoder.py:43), so each shard computes its neurons' partial
  (T, L) term and a ``psum`` over 'neuron' completes it.  The M-step
  decouples over neurons entirely (objective and prior are per-neuron sums),
  so params/opt-state shard over the neuron axis with NO communication.
* **time** (SP): the forward/backward scans are inherently sequential, so
  time sharding uses a staged ppermute pipeline: at stage ``s`` device ``s``
  holds the true boundary carry, runs its local chunk scan, and hands the
  carry to device ``s+1``.  Exact — same semantics as the reference's host
  chunk loop (decoder.py:283-324) with the carry riding ICI instead of HBM.
  Wall-clock for one sequence stays O(T) (the recursion is the critical
  path) but per-device memory drops to O(T / n_time) and all matmul work
  (emissions, sufficient statistics, pairwise-joint accumulation)
  parallelizes.

Pipeline parallelism (PP) and expert parallelism (EP) have no counterpart in
this model family (no layer stack, no MoE — SURVEY.md §2.5); sequence
parallelism here plays the role the reference's time chunking played.

Why a ppermute pipeline and not an associative scan: the filter recursion
is linear in the unnormalized state (u_t = diag(w_t) M^T u_{t-1}), so a
time-parallel prefix scan over (S, S) transition operators (S = n_dyn * L)
is mathematically available.  But composing operators costs O(S^3) per
combine versus O(S^2) per sequential matvec step: each shard's local
operator product multiplies total FLOPs by S (~200-1000 here).  The
associative formulation only wins beyond ~S chips; at realistic slice
sizes the exact carry hand-off pipeline (plus full parallelism of all the
matmul-shaped work) dominates, so that is what this module implements.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.scipy.special import gammaln
from jax.sharding import Mesh, PartitionSpec as P

from poor_man_gplvm_tpu.ops.emissions import PRECISION, RATE_FLOOR
from poor_man_gplvm_tpu.ops.hmm import (
    _backward_scan_prob,
    _forward_scan_prob,
    prob_to_log,
)
from poor_man_gplvm_tpu.ops import mstep as fth

__all__ = ["factorize_devices", "make_mesh", "make_sharded_poisson_em_step"]


def factorize_devices(n, batch=1):
    """Split n devices into (data, time, neuron) axis sizes.

    Puts min(batch, n) on data, then splits the rest between time and
    neuron (time-heavy, since sequence length is the dominant scale)."""
    data = 1
    while data * 2 <= n and data * 2 <= batch and n % (data * 2) == 0:
        data *= 2
    rest = n // data
    neuron = 1
    if rest % 2 == 0 and rest > 2:
        neuron = 2
    time = rest // neuron
    return data, time, neuron


def make_mesh(n_devices=None, batch=1, devices=None):
    """Build a ('data', 'time', 'neuron') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    shape = factorize_devices(n_devices, batch)
    arr = np.array(devices[:n_devices]).reshape(shape)
    return Mesh(arr, ("data", "time", "neuron"))


# ---------------------------------------------------------------------------
# building blocks used inside shard_map
# ---------------------------------------------------------------------------


def _poisson_ll_partial(y, tuning):
    """Per-neuron-shard partial Poisson LL: psum over 'neuron' completes it.
    No latent mask here (applied post-psum if needed)."""
    lam = tuning + RATE_FLOOR  # (L, N_local)
    ll = (
        jnp.matmul(y, jnp.log(lam).T, precision=PRECISION)
        - lam.sum(axis=1)[None, :]
        - gammaln(y + 1.0).sum(axis=1)[:, None]
    )
    return ll  # (T_local, L)


def _pipeline_forward(ll, trans, likelihood_scale, axis_name):
    """Exact staged-pipeline causal filter over a time-sharded sequence.

    Every device runs its local scan at every stage; only the stage owner's
    outputs are committed, and its final carry is ppermute'd to the next
    shard.  Returns (post, prior, ratios) committed locally plus the global
    (final_posterior, log_marginal)."""
    nt = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    state_shape = trans.uniform_log_init().shape

    carry = (jnp.exp(trans.uniform_log_init()), jnp.array(0.0, dtype=ll.dtype))
    post = jnp.zeros(ll.shape[:1] + state_shape, dtype=ll.dtype)
    prior = jnp.zeros_like(post)
    ratios = jnp.zeros(ll.shape[0], dtype=ll.dtype)
    final_carry = carry

    perm = [(i, i + 1) for i in range(nt - 1)]

    def stage(s, val):
        carry, post, prior, ratios, final_carry = val
        p_out, pr_out, ra_out, carry_out = _forward_scan_prob(
            ll, trans, carry, likelihood_scale
        )
        mine = idx == s
        post = jnp.where(mine, p_out, post)
        prior = jnp.where(mine, pr_out, prior)
        ratios = jnp.where(mine, ra_out, ratios)
        is_global_last = jnp.logical_and(mine, s == nt - 1)
        final_carry = jax.tree.map(
            lambda new, old: jnp.where(is_global_last, new, old),
            carry_out,
            final_carry,
        )
        carry_next = jax.tree.map(
            lambda x: lax.ppermute(x, axis_name, perm), carry_out
        )
        # keep our own carry until our stage arrives; adopt the received one
        # afterwards (it is only meaningful right before our stage anyway)
        carry = jax.tree.map(
            lambda rcv, cur: jnp.where(idx > s, rcv, cur), carry_next, carry
        )
        return carry, post, prior, ratios, final_carry

    carry, post, prior, ratios, final_carry = lax.fori_loop(
        0, nt, stage, (carry, post, prior, ratios, final_carry)
    )
    # broadcast the last shard's final carry to everyone
    final_carry = jax.tree.map(
        lambda x: lax.psum(jnp.where(idx == nt - 1, x, jnp.zeros_like(x)),
                           axis_name),
        final_carry,
    )
    return post, prior, ratios, final_carry


def _pipeline_backward(filt, prior, trans, axis_name):
    """Exact staged-pipeline smoother (reverse order) over time shards.

    Uniform-shape trick: every device scans all T_local rows; the globally
    last row is made a no-op by feeding a ones carry/prior (ratio == 1, so
    smooth == filt there, matching reference decoder.py:236-254), and its
    spurious pairwise-joint contribution is masked out of the accumulation.
    """
    nt = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    t_local = filt.shape[0]
    is_last = idx == nt - 1

    # next shard's first prior (device i receives from i+1)
    perm_bwd = [(i + 1, i) for i in range(nt - 1)]
    recv_first_prior = lax.ppermute(prior[0], axis_name, perm_bwd)
    ones_state = jnp.ones_like(prior[0])
    next_first_prior = jnp.where(is_last, ones_state, recv_first_prior)
    prior_shifted = jnp.concatenate([prior[1:], next_first_prior[None]], axis=0)

    smooth = jnp.zeros_like(filt)
    ratios_r = jnp.zeros_like(filt)
    carry = ones_state  # meaningful only for the last shard at its stage

    def stage(k, val):
        s = nt - 1 - k
        carry, smooth, ratios_r = val
        sm_out, r_out = _backward_scan_with_ratios(
            filt, prior_shifted, trans, carry
        )
        mine = idx == s
        smooth = jnp.where(mine, sm_out, smooth)
        ratios_r = jnp.where(mine, r_out, ratios_r)
        carry_next = lax.ppermute(sm_out[0], axis_name, perm_bwd)
        carry = jnp.where(idx < s, carry_next, carry)
        return carry, smooth, ratios_r

    carry, smooth, ratios_r = lax.fori_loop(
        0, nt, stage, (carry, smooth, ratios_r)
    )

    # pairwise-joint accumulation: mask the global-last no-op row, psum parts
    t_idx = jnp.arange(t_local)
    keep = jnp.where(
        jnp.logical_and(is_last, t_idx == t_local - 1), 0.0, 1.0
    ).astype(filt.dtype)
    ratios_masked = ratios_r * keep.reshape((-1,) + (1,) * (filt.ndim - 1))
    acc = trans.outer_acc(filt, ratios_masked)
    acc = lax.psum(acc, axis_name)
    return smooth, acc


def _backward_scan_with_ratios(filt_xs, prior_xs, trans, smooth_init):
    """_backward_scan_prob variant that returns the per-step ratio outputs
    (the accumulation happens at the pipeline level after masking)."""

    def step(p_smooth_next, x):
        p_filt_t, p_prior_next = x
        safe_prior = jnp.where(p_prior_next > 0, p_prior_next, 1.0)
        r = jnp.where(p_prior_next > 0, p_smooth_next / safe_prior, 0.0)
        p_smooth = p_filt_t * trans.pull(r)
        p_smooth = p_smooth / jnp.maximum(
            jnp.sum(p_smooth), jnp.finfo(p_smooth.dtype).tiny
        )
        return p_smooth, (p_smooth, r)

    _, (smooth, ratios) = lax.scan(
        step, smooth_init, (filt_xs, prior_xs), reverse=True
    )
    return smooth, ratios


# ---------------------------------------------------------------------------
# the full sharded EM step
# ---------------------------------------------------------------------------


def make_sharded_poisson_em_step(
    mesh,
    basis,
    trans,
    param_prior_std=1.0,
    likelihood_scale=1.0,
    m_step_size=0.01,
    m_maxiter=100,
    m_tol=1e-6,
):
    """Build a jitted multi-chip EM step for the Poisson jump/latent model.

    Returns ``step(params, opt_state, log_post_latent, y) -> (params',
    opt_state', log_post_latent', log_marginal)`` where

    - ``y``: (B, T, N) counts, sharded P('data', 'time', 'neuron')
    - ``params``: (B, n_basis, N), sharded P('data', None, 'neuron')
    - ``log_post_latent``: (B, T, L), sharded P('data', 'time', None)
    - ``log_marginal``: (B,), sharded P('data')

    One call = reference EM iteration i (M-step on the current posterior,
    then E-step with the new tuning; reference core.py:650-669), entirely
    on-device across the mesh.
    """
    opt = optax.adam(m_step_size)
    hyperparam = {"param_prior_std": param_prior_std}

    def local_em_step(params_b, opt_state_b, log_post_b, y_b):
        # ---- M-step (neuron-sharded params; stats psum'd over time) ----
        post = jnp.exp(log_post_b)  # (T_l, L)
        y_w = lax.psum(
            jnp.matmul(post.T, y_b, precision=PRECISION), "time"
        )  # (L, N_l)
        t_w = lax.psum(post.sum(axis=0), "time")  # (L,)

        def objective(p):
            return fth.poisson_m_step_objective(p, hyperparam, basis, y_w, t_w)

        def cond_fun(c):
            i, _, _, loss, loss_prev = c
            rel = jnp.abs(loss - loss_prev) / jnp.maximum(jnp.abs(loss), 1e-8)
            return (i < (m_maxiter - 1)) & ((i < 5) | (rel > m_tol))

        def body_fun(c):
            i, p, s, loss, _ = c
            new_loss, grads = jax.value_and_grad(objective)(p)
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (i + 1, p, s, new_loss, loss)

        loss0 = objective(params_b)
        _, params_new, opt_state_new, final_loss, _ = lax.while_loop(
            cond_fun, body_fun, (0, params_b, opt_state_b, loss0, loss0)
        )

        # ---- E-step ----
        tuning_local = fth.get_tuning_softplus(params_new, basis)  # (L, N_l)
        ll = lax.psum(_poisson_ll_partial(y_b, tuning_local), "neuron")
        post_f, prior_f, ratios, final_carry = _pipeline_forward(
            ll, trans, likelihood_scale, "time"
        )
        log_marginal = final_carry[1]
        smooth, _acc = _pipeline_backward(post_f, prior_f, trans, "time")
        # latent marginal for the next M-step (reference core.py:668)
        if smooth.ndim == 3:  # joint model: (T_l, n_dyn, L)
            post_latent = smooth.sum(axis=1)
        else:
            post_latent = smooth
        return params_new, opt_state_new, prob_to_log(post_latent), log_marginal, final_loss

    def sharded_step(params, opt_state, log_post, y):
        # vmap over the local batch slice (chains on this data shard)
        return jax.vmap(local_em_step)(params, opt_state, log_post, y)

    def _opt_spec(leaf):
        if leaf.ndim >= 3:
            return P("data", None, "neuron")
        return P("data")

    def build(params, opt_state, log_post, y):
        opt_specs = jax.tree.map(_opt_spec, opt_state)
        fn = jax.shard_map(
            sharded_step,
            mesh=mesh,
            in_specs=(
                P("data", None, "neuron"),
                opt_specs,
                P("data", "time", None),
                P("data", "time", "neuron"),
            ),
            out_specs=(
                P("data", None, "neuron"),
                opt_specs,
                P("data", "time", None),
                P("data"),
                P("data"),
            ),
                    check_vma=False,
        )
        return jax.jit(fn)(params, opt_state, log_post, y)

    return build
