"""Measure the reference implementation on CPU to create BASELINE_MEASURED.json.

The reference hard-imports pynapple and jaxopt, which are absent here; both
are stubbed (pynapple is only used for isinstance checks / TsdFrame wrapping
on paths we don't exercise, jaxopt only by the legacy LBFGS module).

Run:  python scripts/measure_reference_baseline.py [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _reference_stubs import install_reference_stubs  # noqa: E402

install_reference_stubs()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.random as jr  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="README scale only")
    ap.add_argument("--T", type=int, default=100_000)
    ap.add_argument("--L", type=int, default=100)
    ap.add_argument("--N", type=int, default=100)
    args = ap.parse_args()

    import poor_man_gplvm as pmg

    results = {"platform": "cpu", "impl": "reference"}

    # --- README-scale config (BASELINE.json config 1) ---
    model = pmg.PoissonGPLVMJump1D(
        30, n_latent_bin=100, movement_variance=1, tuning_lengthscale=10.0
    )
    _, spk = model.sample(1000)
    t0 = time.time()
    model.fit_em(spk, key=jr.PRNGKey(3), n_iter=1, verboase=False)  # warmup/compile
    t1 = time.time()
    em = model.fit_em(spk, key=jr.PRNGKey(3), n_iter=5, verboase=False)
    t2 = time.time()
    results["readme_T1000_sec_per_iter"] = (t2 - t1) / 5
    results["readme_compile_s"] = t1 - t0
    print("README config:", results["readme_T1000_sec_per_iter"], "s/iter")

    # decode throughput at T=10k (BASELINE.json config 2)
    _, spk10k = model.sample(10_000)
    model.decode_latent(spk10k)  # warmup
    t0 = time.time()
    model.decode_latent(spk10k)
    dt = time.time() - t0
    results["decode_T10k_timesteps_per_sec"] = 10_000 / dt
    print("decode:", results["decode_T10k_timesteps_per_sec"], "steps/s")

    if not args.quick:
        # --- headline config: T=100k x L=100 (BASELINE.json metric) ---
        T, L, N = args.T, args.L, args.N
        model_big = pmg.PoissonGPLVMJump1D(
            N, n_latent_bin=L, movement_variance=1, tuning_lengthscale=10.0
        )
        rng = np.random.default_rng(0)
        y_big = rng.poisson(1.0, size=(T, N)).astype(np.float32)
        t0 = time.time()
        model_big.fit_em(y_big, key=jr.PRNGKey(3), n_iter=1, verboase=False)
        t1 = time.time()
        model_big.fit_em(y_big, key=jr.PRNGKey(3), n_iter=2, verboase=False)
        t2 = time.time()
        results[f"fit_em_T{T}_L{L}_N{N}_sec_per_iter"] = (t2 - t1) / 2
        results["bigfit_first_call_s"] = t1 - t0
        print("headline:", results[f"fit_em_T{T}_L{L}_N{N}_sec_per_iter"], "s/iter")

        model_big.decode_latent(y_big[:10_000])
        t0 = time.time()
        model_big.decode_latent(y_big[:10_000])
        dt = time.time() - t0
        results[f"decode_T10k_L{L}_N{N}_timesteps_per_sec"] = 10_000 / dt
        print("decode L100:", results[f"decode_T10k_L{L}_N{N}_timesteps_per_sec"])

    with open("/root/repo/BASELINE_MEASURED.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
