"""Minimal time-series containers (pynapple-compatible subset).

The reference hard-depends on `pynapple` for time-indexed results and
interval algebra (reference core.py:22, analysis_helper.py, test.py).  This
module provides a small, numpy-native implementation of the subset of that
API the framework uses, so the TPU framework runs without pynapple.  When
pynapple IS installed, :mod:`poor_man_gplvm_tpu.utils.compat` prefers it.

Implemented: ``Ts``, ``Tsd``, ``TsdFrame``, ``IntervalSet`` with
``restrict``, ``threshold``, ``time_support``, ``value_from``, ``get_slice``,
``merge_close_intervals``, ``set_diff``, ``intersect``, ``union``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Ts", "Tsd", "TsdFrame", "IntervalSet"]


class IntervalSet:
    """A set of [start, end] intervals (pynapple-compatible subset)."""

    def __init__(self, start, end=None):
        if end is None:
            start = np.atleast_2d(np.asarray(start, dtype=float))
            self.start = start[:, 0].copy()
            self.end = start[:, 1].copy()
        else:
            self.start = np.atleast_1d(np.asarray(start, dtype=float)).copy()
            self.end = np.atleast_1d(np.asarray(end, dtype=float)).copy()
        order = np.argsort(self.start)
        self.start, self.end = self.start[order], self.end[order]

    def __len__(self):
        return len(self.start)

    def __iter__(self):
        for s, e in zip(self.start, self.end):
            yield IntervalSet(np.array([s]), np.array([e]))

    def __getitem__(self, i):
        return IntervalSet(np.atleast_1d(self.start[i]), np.atleast_1d(self.end[i]))

    def __repr__(self):
        return f"IntervalSet(n={len(self)}, start={self.start}, end={self.end})"

    @property
    def values(self):
        return np.stack([self.start, self.end], axis=1)

    def tot_length(self):
        return float(np.sum(self.end - self.start))

    def merge_close_intervals(self, threshold):
        """Merge intervals whose gap is <= threshold."""
        if len(self) == 0:
            return IntervalSet(np.empty(0), np.empty(0))
        starts, ends = [self.start[0]], [self.end[0]]
        for s, e in zip(self.start[1:], self.end[1:]):
            if s - ends[-1] <= threshold:
                ends[-1] = max(ends[-1], e)
            else:
                starts.append(s)
                ends.append(e)
        return IntervalSet(np.array(starts), np.array(ends))

    def union(self, other):
        allint = np.concatenate(
            [self.values, other.values], axis=0
        ) if len(other) else self.values
        if len(allint) == 0:
            return IntervalSet(np.empty(0), np.empty(0))
        order = np.argsort(allint[:, 0])
        allint = allint[order]
        starts, ends = [allint[0, 0]], [allint[0, 1]]
        for s, e in allint[1:]:
            if s <= ends[-1]:
                ends[-1] = max(ends[-1], e)
            else:
                starts.append(s)
                ends.append(e)
        return IntervalSet(np.array(starts), np.array(ends))

    def intersect(self, other):
        starts, ends = [], []
        for s1, e1 in zip(self.start, self.end):
            for s2, e2 in zip(other.start, other.end):
                s, e = max(s1, s2), min(e1, e2)
                if s <= e:
                    starts.append(s)
                    ends.append(e)
        return IntervalSet(np.array(starts), np.array(ends))

    def set_diff(self, other):
        """Intervals of self not covered by other."""
        starts, ends = [], []
        for s1, e1 in zip(self.start, self.end):
            pieces = [(s1, e1)]
            for s2, e2 in zip(other.start, other.end):
                new_pieces = []
                for ps, pe in pieces:
                    if e2 <= ps or s2 >= pe:
                        new_pieces.append((ps, pe))
                        continue
                    if s2 > ps:
                        new_pieces.append((ps, s2))
                    if e2 < pe:
                        new_pieces.append((e2, pe))
                pieces = new_pieces
            for ps, pe in pieces:
                if pe > ps:
                    starts.append(ps)
                    ends.append(pe)
        return IntervalSet(np.array(starts), np.array(ends))

    def in_interval(self, t):
        """Boolean mask of timestamps t falling inside any interval."""
        t = np.asarray(t)
        mask = np.zeros(t.shape, dtype=bool)
        for s, e in zip(self.start, self.end):
            mask |= (t >= s) & (t <= e)
        return mask


class _TimeIndexed:
    """Shared base for Ts/Tsd/TsdFrame."""

    def __init__(self, t, time_support=None):
        self.t = np.asarray(t, dtype=float)
        if time_support is None and len(self.t):
            time_support = IntervalSet(
                np.array([self.t[0]]), np.array([self.t[-1]])
            )
        elif time_support is None:
            time_support = IntervalSet(np.empty(0), np.empty(0))
        self.time_support = time_support

    def __len__(self):
        return len(self.t)

    @property
    def index(self):
        return self.t

    def get_slice(self, start, end):
        """Positional slice of timestamps within [start, end]
        (pynapple Ts.get_slice subset)."""
        i0 = int(np.searchsorted(self.t, start, side="left"))
        i1 = int(np.searchsorted(self.t, end, side="right"))
        return slice(i0, i1)


class Ts(_TimeIndexed):
    def __init__(self, t, time_support=None):
        super().__init__(t, time_support)

    def value_from(self, tsd):
        """Nearest-timestamp value lookup (pynapple Ts.value_from subset):
        for each of self's timestamps inside tsd's time support, take the
        value of tsd at the closest timestamp."""
        mask = tsd.time_support.in_interval(self.t)
        t_sel = self.t[mask]
        idx = np.searchsorted(tsd.t, t_sel)
        idx = np.clip(idx, 1, len(tsd.t) - 1)
        left = tsd.t[idx - 1]
        right = tsd.t[idx]
        idx = np.where(np.abs(t_sel - left) <= np.abs(t_sel - right), idx - 1, idx)
        d = np.asarray(tsd.d)[idx]
        cls = TsdFrame if d.ndim == 2 else Tsd
        return cls(d=d, t=t_sel)

    def restrict(self, ep):
        return Ts(self.t[ep.in_interval(self.t)], time_support=ep)


class Tsd(_TimeIndexed):
    """1-D time series."""

    def __init__(self, d=None, t=None, time_support=None):
        super().__init__(t, time_support)
        self.d = np.asarray(d)

    @property
    def values(self):
        return self.d

    def __array__(self, dtype=None):
        return np.asarray(self.d, dtype=dtype)

    def __getitem__(self, key):
        out = self.d[key]
        if np.ndim(out) == 1 and isinstance(key, slice):
            return Tsd(d=out, t=self.t[key])
        return out

    def __setitem__(self, key, value):
        self.d[key] = value

    def copy(self):
        return Tsd(d=self.d.copy(), t=self.t.copy(), time_support=self.time_support)

    def restrict(self, ep):
        mask = ep.in_interval(self.t)
        return Tsd(d=self.d[mask], t=self.t[mask], time_support=ep)

    def threshold(self, th, method="above"):
        """Samples above (or below) threshold; time_support becomes the
        contiguous runs where the condition holds."""
        cond = self.d > th if method == "above" else self.d < th
        runs = _contiguous_runs(cond)
        starts = np.array([self.t[a] for a, b in runs])
        ends = np.array([self.t[b - 1] for a, b in runs])
        support = IntervalSet(starts, ends)
        return Tsd(d=self.d[cond], t=self.t[cond], time_support=support)

    def value_from(self, tsd):
        return Ts(self.t).value_from(tsd)

    def to_numpy(self):
        return np.asarray(self.d)


class TsdFrame(_TimeIndexed):
    """2-D time series (time x columns)."""

    def __init__(self, d=None, t=None, columns=None, time_support=None):
        super().__init__(t, time_support)
        self.d = np.asarray(d)
        if columns is None:
            columns = np.arange(self.d.shape[1]) if self.d.ndim == 2 else None
        self.columns = columns

    @property
    def values(self):
        return self.d

    @property
    def shape(self):
        return self.d.shape

    def __array__(self, dtype=None):
        return np.asarray(self.d, dtype=dtype)

    def __getitem__(self, key):
        if isinstance(key, tuple):
            rows, cols = key
            out = self.d[rows, cols]
            if np.ndim(out) == 1 and isinstance(rows, slice):
                return Tsd(d=out, t=self.t[rows])
            if np.ndim(out) == 2:
                return TsdFrame(d=out, t=self.t[rows])
            return out
        out = self.d[key]
        if isinstance(key, slice):
            if np.ndim(out) == 2:
                return TsdFrame(d=out, t=self.t[key])
            return Tsd(d=out, t=self.t[key])
        return out

    def __setitem__(self, key, value):
        self.d[key] = value

    def copy(self):
        return TsdFrame(
            d=self.d.copy(), t=self.t.copy(), time_support=self.time_support
        )

    def restrict(self, ep):
        mask = ep.in_interval(self.t)
        return TsdFrame(d=self.d[mask], t=self.t[mask], time_support=ep)

    def to_numpy(self):
        return np.asarray(self.d)


def _contiguous_runs(cond):
    """Return [(start, stop), ...) index pairs for runs of True in cond."""
    cond = np.asarray(cond, dtype=bool)
    if not cond.any():
        return []
    padded = np.concatenate([[False], cond, [False]])
    diff = np.diff(padded.astype(int))
    starts = np.nonzero(diff == 1)[0]
    stops = np.nonzero(diff == -1)[0]
    return list(zip(starts, stops))
