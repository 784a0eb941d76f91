"""Batched hyperparameter sweeps: one compiled program for the whole grid.

The reference's model selection runs a serial Python loop over configs and
chains (reference model_selection_helper.py:199-227, :54-60) — the main TPU
fan-out surface (SURVEY.md §2.5, §3.5).  Here the entire (config x chain)
batch runs as ONE vmapped device program: batched transition matrices,
batched while-loop Adam M-steps, batched forward/backward scans.  Batching
across the grid also amortizes the per-step scan overhead that dominates the
single-sequence path.

Swept hyperparameters must preserve static shapes; the transition-level
parameters (movement_variance, p_move_to_jump, p_jump_to_move) and the
M-step prior (param_prior_std) qualify directly.  tuning_lengthscale
changes ``n_basis`` (data-dependent SVD rank, reference core.py:54), so it
is swept by BUCKETING: one vmapped program per distinct basis rank with a
batched basis input (see ``sweep_fit_poisson_jump``).

With a mesh, the batch axis shards over ALL mesh devices (pure data
parallelism — each (config, chain) is independent).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from poor_man_gplvm_tpu.ops import kernels as gpk
from poor_man_gplvm_tpu.ops import mstep as fth
from poor_man_gplvm_tpu.ops.emissions import get_loglikelihood_ma_all
from poor_man_gplvm_tpu.ops.hmm import (
    JointTransition,
    _backward_scan_prob,
    _forward_scan_prob,
    prob_to_log,
)

__all__ = ["expand_grid", "sweep_fit_poisson_jump"]


def expand_grid(hyperparam_ranges, n_repeat=1, defaults=None):
    """Cartesian grid -> flat per-run arrays (each config repeated
    ``n_repeat`` times for independent chains).

    Returns (dict of (B,) arrays over swept+default params, config_index
    (B,), chain_index (B,))."""
    import itertools

    defaults = {
        "movement_variance": 1.0,
        "p_move_to_jump": 0.01,
        "p_jump_to_move": 0.01,
        "param_prior_std": 1.0,
        "tuning_lengthscale": 1.0,
        **(defaults or {}),
    }
    keys = list(hyperparam_ranges.keys())
    unsupported = set(keys) - set(defaults)
    if unsupported:
        raise ValueError(
            f"sweep_fit_poisson_jump cannot sweep {sorted(unsupported)}"
        )
    combos = list(itertools.product(*[hyperparam_ranges[k] for k in keys]))
    n_cfg = len(combos)
    B = n_cfg * n_repeat

    out = {}
    for name, default in defaults.items():
        if name in keys:
            col = np.array(
                [combo[keys.index(name)] for combo in combos], dtype=np.float32
            )
        else:
            col = np.full(n_cfg, default, dtype=np.float32)
        out[name] = jnp.asarray(np.repeat(col, n_repeat))
    config_index = np.repeat(np.arange(n_cfg), n_repeat)
    chain_index = np.tile(np.arange(n_repeat), n_cfg)
    return out, config_index, chain_index


def _single_run_em(
    y, basis, hp_scalars, key, n_iter, n_latent_bin, m_step_size, m_maxiter,
    m_tol, likelihood_scale,
):
    """Full EM for one (config, chain): transition build, random posterior
    init, n_iter x (Adam M-step -> forward/backward smooth)."""
    _, log_lat_l, _, log_dyn = gpk.create_transition_prob_1d(
        jnp.arange(n_latent_bin), jnp.arange(2),
        hp_scalars["movement_variance"], hp_scalars["p_move_to_jump"],
        hp_scalars["p_jump_to_move"],
    )
    trans = JointTransition(
        jnp.exp(log_dyn), jnp.exp(log_lat_l), log_dyn, log_lat_l
    )
    T = y.shape[0]

    # random posterior init (jump-family convention, reference core.py:571-583)
    key, k_init, k_params = jr.split(key, 3)
    posterior = jr.uniform(k_init, (T, n_latent_bin)) * 0.1
    posterior = posterior / posterior.sum(axis=1, keepdims=True)
    log_post = jnp.log(posterior)

    n_basis = basis.shape[1]
    params = jr.normal(k_params, (n_basis, y.shape[1]))

    opt = optax.adam(m_step_size)
    opt_state = opt.init(params)
    hyperparam = {"param_prior_std": hp_scalars["param_prior_std"]}

    def adam_mstep(params, opt_state, y_w, t_w):
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
            return (i + 1, optax.apply_updates(p, updates), s, new_loss, loss)

        loss0 = objective(params)
        _, params, opt_state, final_loss, _ = lax.while_loop(
            cond_fun, body_fun, (0, params, opt_state, loss0, loss0)
        )
        return params, opt_state, final_loss

    def em_iter(carry, _):
        params, opt_state, log_post = carry
        y_w, t_w = fth.get_statistics(log_post, y)
        params, opt_state, final_loss = adam_mstep(params, opt_state, y_w, t_w)
        tuning = fth.get_tuning_softplus(params, basis)

        ll = get_loglikelihood_ma_all(
            y, tuning, {}, jnp.ones_like(y), jnp.ones(n_latent_bin),
            observation_model="poisson",
        )
        carry0 = (
            jnp.exp(trans.uniform_log_init()), jnp.array(0.0, dtype=jnp.float32)
        )
        post_f, prior_f, ratios, (p_last, lml) = _forward_scan_prob(
            ll, trans, carry0, likelihood_scale
        )
        smooth, _acc = _backward_scan_prob(
            post_f[:-1], prior_f[1:], trans, post_f[-1]
        )
        smooth_full = jnp.concatenate([smooth, post_f[-1][None]], axis=0)
        log_post_new = prob_to_log(smooth_full.sum(axis=1))
        return (params, opt_state, log_post_new), (lml, final_loss)

    (params, _, log_post), (lml_l, loss_l) = lax.scan(
        em_iter, (params, opt_state, log_post), None, length=n_iter
    )
    tuning = fth.get_tuning_softplus(params, basis)
    return {
        "params": params,
        "tuning": tuning,
        "log_posterior_latent": log_post,
        "log_marginal_l": lml_l,
        "m_step_final_loss_l": loss_l,
    }


@lru_cache(maxsize=32)
def _batched_em_program(hp_keys, n_iter, n_latent_bin, m_step_size,
                        m_maxiter, m_tol, likelihood_scale):
    """Jitted batched-EM program, cached on the static config so repeated
    sweep calls (and the bench's timed second call) hit the jit trace cache
    instead of re-tracing the whole EM scan."""
    run = partial(
        _single_run_em,
        n_iter=n_iter, n_latent_bin=n_latent_bin, m_step_size=m_step_size,
        m_maxiter=m_maxiter, m_tol=m_tol, likelihood_scale=likelihood_scale,
    )

    def one(y, basis, hp_tuple, key):
        return run(y, basis, dict(zip(hp_keys, hp_tuple)), key)

    return jax.jit(
        jax.vmap(one, in_axes=(None, 0, 0, 0))
    )


def sweep_fit_poisson_jump(
    y,
    hyperparam_ranges,
    n_repeat=1,
    n_iter=10,
    n_latent_bin=100,
    tuning_lengthscale=1.0,
    key=None,
    mesh=None,
    m_step_size=0.01,
    m_maxiter=100,
    m_tol=1e-6,
    likelihood_scale=1.0,
):
    """Fit the whole (config x chain) grid of PoissonGPLVMJump1D models in
    compiled vmapped programs (optionally sharded over a mesh).

    ``tuning_lengthscale`` — the reference's most-swept hyperparameter
    (reference model_selection_helper.py:18-33) — is shape-changing (the
    basis rank ``n_basis`` is an SVD threshold, reference core.py:54), so
    sweeping it is handled by **bucketing**: configs are grouped by their
    computed ``n_basis`` and each bucket runs as ONE vmapped program with a
    batched (runs, L, n_basis) basis input.  One compile per distinct rank
    instead of one serial fit per config.

    Returns dict with batched results (leading axis = runs, original grid
    order), plus ``config_index``/``chain_index`` mapping runs back to the
    grid and ``grid`` (the per-run hyperparameter arrays).  When buckets
    have heterogeneous ``n_basis``, ``params`` is a list of per-run arrays
    (their shapes differ); everything else stacks."""
    key = jr.PRNGKey(0) if key is None else key
    y = jnp.asarray(y, dtype=jnp.float32)
    grid, config_index, chain_index = expand_grid(
        hyperparam_ranges, n_repeat=n_repeat,
        defaults={"tuning_lengthscale": tuning_lengthscale},
    )
    B = len(config_index)
    keys = jr.split(key, B)

    from poor_man_gplvm_tpu.ops.basis import generate_basis

    # host-side static basis per distinct lengthscale (n_basis is
    # data-dependent; computed once here so device shapes stay static)
    ls_arr = np.asarray(grid["tuning_lengthscale"], dtype=np.float64)
    bases = {
        float(ls): generate_basis(float(ls), n_latent_bin)
        for ls in np.unique(ls_arr)
    }
    # bucket runs by basis rank
    buckets = {}
    for i in range(B):
        nb = bases[float(ls_arr[i])].shape[1]
        buckets.setdefault(nb, []).append(i)

    sharding = None
    if mesh is not None:
        # pure DP: shard the run axis over every device in the mesh
        flat_mesh = Mesh(np.asarray(mesh.devices).reshape(-1), ("runs",))
        sharding = NamedSharding(flat_mesh, P("runs"))

    per_run = [None] * B
    for nb, idxs in sorted(buckets.items()):
        idx_arr = np.asarray(idxs)
        basis_stack = jnp.stack(
            [bases[float(ls_arr[i])] for i in idxs]
        )  # (Bb, L, nb)
        hp_bucket = {k: v[idx_arr] for k, v in grid.items()}
        keys_bucket = keys[idx_arr]
        if sharding is not None and len(idxs) % mesh.devices.size == 0:
            hp_bucket = jax.device_put(hp_bucket, sharding)
            keys_bucket = jax.device_put(keys_bucket, sharding)
            basis_stack = jax.device_put(basis_stack, sharding)
        hp_keys = tuple(sorted(hp_bucket.keys()))
        batched = _batched_em_program(
            hp_keys, n_iter, n_latent_bin, m_step_size, m_maxiter, m_tol,
            likelihood_scale,
        )
        res = batched(
            y, basis_stack, tuple(hp_bucket[k] for k in hp_keys),
            keys_bucket,
        )
        if len(idxs) == B:  # single bucket: keep batched arrays as-is
            results = dict(res)
            results["config_index"] = config_index
            results["chain_index"] = chain_index
            results["grid"] = grid
            return results
        for j, i in enumerate(idxs):
            per_run[i] = {k: v[j] for k, v in res.items()}

    result_keys = per_run[0].keys()
    results = {}
    for k in result_keys:
        vals = [per_run[i][k] for i in range(B)]
        if len({v.shape for v in vals}) == 1:
            results[k] = jnp.stack(vals)
        else:  # heterogeneous n_basis (params)
            results[k] = vals
    results["config_index"] = config_index
    results["chain_index"] = chain_index
    results["grid"] = grid
    return results
