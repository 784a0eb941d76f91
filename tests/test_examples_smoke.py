"""Smoke tests: every example and synthetic-capable driver script must run
to completion (VERDICT round-1 item #7 — the reference's de-facto
integration tests were its notebooks/scripts, and its PMGPLVM_moser_run.py
shows how unexercised drivers rot; reference PMGPLVM_moser_run.py:55,202).

Each target runs in a subprocess on CPU (matplotlib Agg, no display) with a
hard timeout.  Marker: examples.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")
SCRIPTS = os.path.join(REPO, "scripts")

pytestmark = pytest.mark.examples


def _run(path, extra_args=(), timeout=900, tmp_path=None):
    # generous timeout: these are rot detectors, not perf tests, and the
    # suite may share the machine with TPU benchmark jobs
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["MPLBACKEND"] = "Agg"
    env.setdefault(
        "XLA_FLAGS",
        "--xla_force_host_platform_device_count=8",
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # shared persistent compilation cache across all smoke subprocesses:
    # without it each subprocess recompiles the full program set from
    # scratch and the smoke pass alone runs >20 min (VERDICT r2 next #8)
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(REPO, ".jax_cache_examples"),
    )
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")
    proc = subprocess.run(
        [sys.executable, path, *extra_args],
        env=env,
        cwd=str(tmp_path) if tmp_path else REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{os.path.basename(path)} failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-3000:]}\n"
        f"--- stderr ---\n{proc.stderr[-3000:]}"
    )
    return proc


EXAMPLE_FILES = sorted(
    f for f in os.listdir(EXAMPLES) if f.endswith(".py")
)


@pytest.mark.parametrize("name", EXAMPLE_FILES)
def test_example_runs(name, tmp_path):
    _run(os.path.join(EXAMPLES, name), tmp_path=tmp_path)


def test_pipeline_session_synthetic(tmp_path):
    _run(
        os.path.join(SCRIPTS, "pipeline_session.py"),
        extra_args=[
            "--synthetic", "--synthetic-T", "500", "--synthetic-N", "15",
            "--n-iter", "2", "--out-dir", str(tmp_path),
        ],
        tmp_path=tmp_path,
    )
    assert any(tmp_path.iterdir()), "pipeline produced no outputs"


def test_bilat_run_synthetic(tmp_path):
    _run(
        os.path.join(SCRIPTS, "bilat_run.py"),
        extra_args=[
            "--synthetic", "--synthetic-T", "400", "--synthetic-N", "12",
            "--n-iter", "2", "--out-dir", str(tmp_path),
        ],
        tmp_path=tmp_path,
    )
