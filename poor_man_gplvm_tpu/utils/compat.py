"""Optional-dependency shims.

pynapple is a hard import in the reference (reference core.py:22); here it is
optional: when absent we fall back to the internal minimal time-series
containers in :mod:`poor_man_gplvm_tpu.utils.timeseries`, which implement the
subset of the pynapple API the framework uses (Tsd/TsdFrame/Ts/IntervalSet).
"""

from __future__ import annotations

try:  # pragma: no cover - environment dependent
    import pynapple as nap

    HAS_PYNAPPLE = True
except ImportError:  # pragma: no cover
    from poor_man_gplvm_tpu.utils import timeseries as nap

    HAS_PYNAPPLE = False


def is_tsdframe(y):
    return isinstance(y, nap.TsdFrame)


def is_tsd_like(y):
    return isinstance(y, (nap.Tsd, nap.TsdFrame))


def tsdframe(d, t):
    return nap.TsdFrame(d=d, t=t)


def tsd(d, t):
    return nap.Tsd(d=d, t=t)
