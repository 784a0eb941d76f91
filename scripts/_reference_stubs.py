"""Make the reference package at /root/reference importable in this env.

The reference hard-imports pynapple and jaxopt (absent here) plus a few
plotting/stats libraries its model modules pull transitively; stub them
with inert placeholders so `import poor_man_gplvm` works.  Shared by
scripts/measure_reference_baseline.py, scripts/parity_vs_reference.py and
tests/test_reference_parity.py.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_DIR = os.environ.get("PMG_REFERENCE_DIR", "/root/reference")


class _NeverInstance:
    """Placeholder class: isinstance(x, _NeverInstance) is False for real
    data, so the reference's nap.TsdFrame branches are never taken."""


class _AnyAttrModule(types.ModuleType):
    def __getattr__(self, name):
        sub = _AnyAttrModule(f"{self.__name__}.{name}")
        sys.modules[f"{self.__name__}.{name}"] = sub
        return sub


def reference_available():
    """True if the reference checkout exists (no side effects)."""
    return os.path.isdir(os.path.join(REFERENCE_DIR, "poor_man_gplvm"))


def install_reference_stubs():
    """Install dependency stubs and put the reference dir on sys.path.

    Stub modules are tagged ``__pmg_reference_stub__`` so
    :func:`uninstall_reference_stubs` can remove exactly what was added
    (other tests rely on e.g. plotly being genuinely absent).

    Returns True if the reference package directory exists."""
    pynapple_stub = types.ModuleType("pynapple")
    try:
        # functional stand-in: the repo's pynapple-compatible timeseries
        # layer.  isinstance(numpy_input, Tsd) stays False (the reference's
        # nap branches are still skipped for array inputs), but reference
        # code that CONSTRUCTS nap objects (e.g. analysis_helper.py:385-387
        # returning nap.Ts) now runs — which also cross-validates the
        # compat layer against real reference call sites.
        from poor_man_gplvm_tpu.utils import timeseries as _ts

        pynapple_stub.TsdFrame = _ts.TsdFrame
        pynapple_stub.Tsd = _ts.Tsd
        pynapple_stub.Ts = _ts.Ts
        pynapple_stub.IntervalSet = _ts.IntervalSet
    except Exception:  # repo package unavailable: inert placeholders
        pynapple_stub.TsdFrame = _NeverInstance
        pynapple_stub.Tsd = _NeverInstance
        pynapple_stub.Ts = _NeverInstance
        pynapple_stub.IntervalSet = _NeverInstance
    pynapple_stub.__pmg_reference_stub__ = True
    sys.modules.setdefault("pynapple", pynapple_stub)

    jaxopt_stub = types.ModuleType("jaxopt")
    jaxopt_stub.LBFGS = None
    jaxopt_stub.__pmg_reference_stub__ = True
    sys.modules.setdefault("jaxopt", jaxopt_stub)

    for _name in [
        "plotly", "plotly.graph_objects", "plotly.subplots",
        "plotly.express", "plotly.io", "statsmodels", "statsmodels.api",
        "statsmodels.formula", "statsmodels.formula.api",
        "statsmodels.stats", "statsmodels.stats.sandwich_covariance",
        "xarray",
    ]:
        if _name not in sys.modules:
            _m = _AnyAttrModule(_name)
            _m.__path__ = []
            _m.__pmg_reference_stub__ = True
            sys.modules[_name] = _m

    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    return reference_available()


def uninstall_reference_stubs():
    """Remove every stub module installed by install_reference_stubs (the
    already-imported reference modules keep their references)."""
    for name in list(sys.modules):
        mod = sys.modules[name]
        if getattr(mod, "__pmg_reference_stub__", False):
            del sys.modules[name]
