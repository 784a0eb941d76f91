"""Measure north-star fit_em under different scan-matmul precisions.

Usage: python scripts/bench_scan_precision.py {highest|bf16x3|bf16} [T L N]

Times the canonical north-star configuration (T=1e6 x L=500 x N=500, lean,
filter_bf16, 12-iter fused fits) with the parallel-scan kernels' matmul
precision swapped, and prints s/iter + the final log-marginal so the
accuracy cost is visible next to the speed.  Run each mode in a FRESH
process: the precision is baked into traced programs.

Evidence script for the VERDICT r3 #5 MFU investigation.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "all"
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 500
    modes = ["highest", "bf16x3", "bf16"] if arg == "all" else [arg]

    import gc

    import jax.numpy as jnp
    import jax.random as jr

    import poor_man_gplvm_tpu as pmg
    from poor_man_gplvm_tpu.ops.pallas import parallel_scan as ps

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.poisson(0.5, size=(T, N)).astype(np.float32))

    kw = dict(n_iter=12, n_time_per_chunk=100_000, verboase=False,
              save_every=10**9, output_mode="lean", memory_mode="filter_bf16")
    # all modes in ONE process: a dead process's device buffers linger for
    # minutes through the remote tunnel, so a fresh-process-per-mode ladder
    # RESOURCE_EXHAUSTs every mode after the first (measured 2026-08-20).
    # The model-layer fused caches key on scan_mode_key(), so flipping the
    # precision retraces correctly; clear_caches between modes keeps only
    # one compiled program set resident.
    for mode in modes:
        ps.set_scan_precision(mode)
        jax.clear_caches()
        gc.collect()
        model = pmg.PoissonGPLVMJump1D(
            N, n_latent_bin=L, movement_variance=1, tuning_lengthscale=10.0)
        t0 = time.time()
        res = model.fit_em(y, key=jr.PRNGKey(3), **kw)
        print(f"[{mode}] warmup (compile) {time.time()-t0:.1f}s",
              file=sys.stderr)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            res = model.fit_em(y, key=jr.PRNGKey(3), **kw)
            best = min(best, (time.time() - t0) / kw["n_iter"])
        lml = float(np.asarray(res["log_marginal"]))
        passes = getattr(model, "_scan_passes_mid", None)
        if passes is not None:
            passes = float(
                np.asarray(passes, dtype=np.float64).sum(axis=1).mean()
            ) + 2.0
        print(f"{mode}: {best:.3f} s/iter, final lml {lml:.6f}, "
              f"passes/iter {passes}", flush=True)
        model = res = None
    ps.set_scan_precision("highest")


if __name__ == "__main__":
    main()
