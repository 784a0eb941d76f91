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
