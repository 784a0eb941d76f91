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


def install_reference_stubs():
    """Install dependency stubs and put the reference dir on sys.path.

    Returns True if the reference package directory exists."""
    if "pynapple" not in sys.modules or not isinstance(
        sys.modules["pynapple"], types.ModuleType
    ):
        pass
    pynapple_stub = types.ModuleType("pynapple")
    pynapple_stub.TsdFrame = _NeverInstance
    pynapple_stub.Tsd = _NeverInstance
    pynapple_stub.Ts = _NeverInstance
    pynapple_stub.IntervalSet = _NeverInstance
    sys.modules.setdefault("pynapple", pynapple_stub)

    jaxopt_stub = types.ModuleType("jaxopt")
    jaxopt_stub.LBFGS = None
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
            sys.modules[_name] = _m

    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    return os.path.isdir(os.path.join(REFERENCE_DIR, "poor_man_gplvm"))
