"""Test configuration: force CPU with 8 virtual devices so sharding tests
run without TPU hardware (the standard fake-backend trick).

The session environment may register a TPU platform plugin via
sitecustomize that appends itself to jax_platforms regardless of
JAX_PLATFORMS, so we must override the *config* after importing jax (before
any backend is initialized), not just the env var.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent XLA compilation cache for the whole suite: repeat runs (the
# common iteration loop on this 1-core machine) skip every recompile, and
# within one run per-instance jax.jit wrappers with identical HLO hit the
# disk cache instead of recompiling (VERDICT r2 next #8)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
