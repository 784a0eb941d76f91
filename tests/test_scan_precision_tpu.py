"""Real-TPU numerical check of the scan-precision ladder (ADVICE r4 #3).

The default suite pins JAX_PLATFORMS=cpu (conftest.py), where the
parallel-scan engine runs its pure-JAX f32 reference passes regardless of
``set_scan_precision`` — so the bf16x3/bf16 ``_scan_dot`` code inside the
Mosaic kernels is never compiled or numerically exercised there.  This
test runs the parallel engine ON THE REAL TPU under all three modes and
checks the bf16x3/bf16 solutions against ``highest`` within the
documented tolerances (ops/pallas/parallel_scan.set_scan_precision):

- bf16x3: ~5e-7 element error on the recursion dots; per-step
  normalization keeps it from accumulating -> log-marginal must match to
  1e-5 relative, posteriors to 1e-4 absolute.
- bf16:   ~1e-3 posterior error (the filter_bf16 memory mode's accepted
  order) -> log-marginal to 1e-3 relative, posteriors to 1e-2 absolute.

Opt-in via ``PMG_TPU_TESTS=1`` (compiles three north-star-structured
programs on the shared chip):

    PMG_TPU_TESTS=1 python -m pytest tests/test_scan_precision_tpu.py -x -q
"""

import os
import subprocess
import sys

import pytest

_CHILD = r"""
import sys
import numpy as np
import jax, jax.numpy as jnp

assert jax.devices()[0].platform != "cpu", (
    "scan-precision TPU test needs a real accelerator; got "
    + repr(jax.devices())
)

from poor_man_gplvm_tpu.ops import hmm, kernels as gpk
from poor_man_gplvm_tpu.ops.pallas import parallel_scan as ps

T, L, N = 50_000, 128, 64
rng = np.random.default_rng(11)
y = jnp.asarray(rng.poisson(1.2, size=(T, N)).astype(np.float32))
tuning = jnp.asarray(rng.gamma(2.0, 1.0, size=(L, N)).astype(np.float32))
lat_l, log_lat_l, dyn, log_dyn = gpk.create_transition_prob_1d(
    jnp.arange(L), jnp.arange(2), movement_variance=1.3,
    p_move_to_jump=0.05, p_jump_to_move=0.08,
)
trans = hmm.JointTransition(dyn, lat_l, log_dyn, log_lat_l)
assert ps.choose_parallel_config(T, L, 2) is not None, "problem too small"
ma_n = np.ones(N, np.float32)
ma_l = np.ones(L, np.float32)

def run(mode):
    ps.set_scan_precision(mode)
    try:
        out = hmm.smooth_combined_chunked(
            y, tuning, {}, trans, ma_n, ma_l, engine="pallas_parallel",
        )
        post = np.exp(np.asarray(out[0], dtype=np.float64))
        lml = float(out[1])
        return post, lml
    finally:
        ps.set_scan_precision("highest")

post_hi, lml_hi = run("highest")
for mode, tol_lml, tol_post in (("bf16x3", 1e-5, 1e-4),
                                ("bf16", 1e-3, 1e-2)):
    post_m, lml_m = run(mode)
    rel = abs(lml_m - lml_hi) / abs(lml_hi)
    dmax = float(np.max(np.abs(post_m - post_hi)))
    print(f"{mode}: lml rel {rel:.2e} (tol {tol_lml}), "
          f"post max-abs {dmax:.2e} (tol {tol_post})", flush=True)
    assert rel <= tol_lml, (mode, rel, tol_lml)
    assert dmax <= tol_post, (mode, dmax, tol_post)
print("scan-precision ladder OK", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("PMG_TPU_TESTS") != "1",
    reason="real-TPU scan-precision test; set PMG_TPU_TESTS=1 (compiles "
    "three parallel-engine programs on the shared chip)",
)
def test_scan_precision_ladder_on_tpu():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD],
        env=env, capture_output=True, text=True, timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    )
    assert "scan-precision ladder OK" in proc.stdout
