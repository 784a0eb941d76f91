"""Runtime configuration knobs.

The reference has no config system beyond ctor kwargs and per-call
``hyperparam`` dicts (SURVEY §5); those are preserved on the model
classes.  This module adds TPU-deployment knobs that have no reference
counterpart.
"""

from __future__ import annotations

import importlib

import jax

__all__ = [
    "set_matmul_precision", "get_matmul_precision", "set_scan_precision",
]

#: Modules whose ``PRECISION`` global controls the emission / M-step
#: statistics matmuls (the large (T, L) x (L, N) contractions).  The HMM
#: scan-step matvecs (ops/hmm.py, ops/pallas/*) are deliberately NOT on
#: this list: bf16 variants of the sequential recursion were measured at
#: only ~1.2x for 3e-3 accuracy loss and rejected (PERFORMANCE.md), and
#: they carry the <=1e-5 reference-parity guarantee.
_PRECISION_MODULES = (
    "poor_man_gplvm_tpu.ops.emissions",
    "poor_man_gplvm_tpu.ops.mstep",
    "poor_man_gplvm_tpu.ops.fit_tuning_with_basis",
    "poor_man_gplvm_tpu.experimental.fit_tuning_helper_exp",
    "poor_man_gplvm_tpu.experimental.gain",
)

_LEVELS = {
    "highest": jax.lax.Precision.HIGHEST,
    "float32": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "bfloat16_3x": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
    "bfloat16": jax.lax.Precision.DEFAULT,
}


def set_matmul_precision(level):
    """Set the MXU precision of the emission / M-step statistics matmuls.

    Measured ladder at north-star shapes ((1e6, 500) x (500, 500), one
    v5e chip — PERFORMANCE.md):

    ==========  ===========  =========================
    level       TFLOP/s      max relative element error
    ==========  ===========  =========================
    'highest'   9.5          0 (f32 exact; the default)
    'high'      14.3         1.3e-6 (bf16x3 passes)
    'default'   17.6         4e-4 (single bf16 pass)
    ==========  ===========  =========================

    'high' saves ~8-9% of a north-star EM iteration while staying inside
    the 1e-5 reference-parity envelope for typical problem sizes;
    'default' is for throughput-over-parity deployments.  The scan-step
    recursions stay f32-HIGHEST regardless (see ``_PRECISION_MODULES``).

    Call before building models/fitting.  Already-compiled programs are
    dropped (``jax.clear_caches``); per-model fused-program caches are
    keyed only by static config, so rebuild models created earlier.
    """
    level_l = str(level).lower()
    if level_l not in _LEVELS:
        raise ValueError(
            f"unknown precision {level!r}; one of {sorted(_LEVELS)}"
        )
    p = _LEVELS[level_l]
    for name in _PRECISION_MODULES:
        mod = importlib.import_module(name)
        mod.PRECISION = p
    jax.clear_caches()
    return p


def get_matmul_precision():
    """The currently-active emission/M-step matmul precision."""
    from poor_man_gplvm_tpu.ops import emissions

    return emissions.PRECISION


def set_scan_precision(mode):
    """Set the matmul precision of the parallel-in-time scan recursions
    ('highest' | 'bf16x3' | 'bf16') — the complementary knob to
    :func:`set_matmul_precision`, which covers the emission/M-step
    statistics matmuls.  See
    :func:`poor_man_gplvm_tpu.ops.pallas.parallel_scan.set_scan_precision`
    for the accuracy/speed ladder; model fused-program caches key on it,
    so flipping it retraces automatically (standalone jitted programs
    need ``jax.clear_caches()``)."""
    from poor_man_gplvm_tpu.ops.pallas import parallel_scan

    parallel_scan.set_scan_precision(mode)
    jax.clear_caches()
