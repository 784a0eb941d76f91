"""Declarative DataFrame filtering: spec-tree -> (mask, pandas query string).

TPU-native equivalent of reference poor_man_gplvm/pandas_util.py: logic nodes
(``all``/``any``/``not`` as dicts or tagged lists), leaf conditions
``[col, op, value?, opts?]`` with comparator / membership / between / null /
string operators, and an implicit-AND list form.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple, Union

import numpy as np
import pandas as pd

Spec = Union[List[Any], Tuple[Any, ...], Dict[str, Any]]

__all__ = ["filter_df_with_spec"]

_COMPARATORS = {"==": "eq", "!=": "ne", "<": "lt", ">": "gt", "<=": "le",
                ">=": "ge"}
_LOGIC_TAGS = {"all", "any", "not"}


def _btick(col):
    return f"`{col}`" if re.search(r"\W", col) else col


def _new_var(env, var_id, v):
    name = f"v{var_id[0]}"
    var_id[0] += 1
    env[name] = v
    return name


def _ensure_listlike(x):
    if isinstance(x, (list, tuple, set, pd.Index, np.ndarray)):
        return list(x)
    return [x]


def _is_logic_list(node):
    return (
        isinstance(node, (list, tuple)) and node and isinstance(node[0], str)
        and node[0].lower() in _LOGIC_TAGS
    )


def _is_logic_dict(node):
    return isinstance(node, dict) and any(k in node for k in _LOGIC_TAGS)


def _is_leaf_list(node):
    return (
        isinstance(node, (list, tuple)) and len(node) >= 2
        and isinstance(node[0], str) and node[0].lower() not in _LOGIC_TAGS
    )


def _compile_leaf(df, leaf, env, var_id):
    col = leaf[0]
    op = str(leaf[1]).lower()
    val = leaf[2] if len(leaf) >= 3 else None
    opts = leaf[3] if len(leaf) >= 4 and isinstance(leaf[3], dict) else {}
    if col not in df.columns:
        raise KeyError(f"Column '{col}' not in DataFrame.")
    s = df[col]
    col_bt = _btick(col)

    if op in _COMPARATORS:
        var = _new_var(env, var_id, val)
        return getattr(s, _COMPARATORS[op])(env[var]), f"{col_bt} {op} @{var}"

    if op in {"in", "not in"}:
        var = _new_var(env, var_id, _ensure_listlike(val))
        mask = s.isin(env[var])
        if op == "not in":
            return ~mask, f"{col_bt} not in @{var}"
        return mask, f"{col_bt} in @{var}"

    if op == "between":
        if not (isinstance(val, (list, tuple)) and len(val) == 2):
            raise ValueError("between expects value=(low, high).")
        low, high = val
        inclusive = opts.get("inclusive", "both")
        mask = s.between(low, high, inclusive=inclusive)
        vL, vH = _new_var(env, var_id, low), _new_var(env, var_id, high)
        ops = {
            "both": ("<=", "<="), True: ("<=", "<="),
            "neither": ("<", "<"), False: ("<", "<"),
            "left": ("<=", "<"), "right": ("<", "<="),
        }.get(inclusive, ("<=", "<="))
        q = f"(@{vL} {ops[0]} {col_bt}) and ({col_bt} {ops[1]} @{vH})"
        return mask, q

    if op in {"isna", "isnull"}:
        return s.isna(), f"{col_bt}.isnull()"
    if op in {"notna", "notnull"}:
        return s.notna(), f"{col_bt}.notnull()"

    if op in {"contains", "startswith", "endswith", "regex"}:
        case = bool(opts.get("case", True))
        na = opts.get("na", False)
        strobj = s.astype("string")
        pat = str(val)
        var = _new_var(env, var_id, pat)
        if op in {"contains", "regex"}:
            regex = True if op == "regex" else bool(opts.get("regex", True))
            mask = strobj.str.contains(pat, case=case, na=na, regex=regex)
            return mask, (
                f"{col_bt}.str.contains(@{var}, case={case}, na={na}, "
                f"regex={regex})"
            )
        if op == "startswith":
            return strobj.str.startswith(pat, na=na), (
                f"{col_bt}.str.startswith(@{var}, na={na})"
            )
        return strobj.str.endswith(pat, na=na), (
            f"{col_bt}.str.endswith(@{var}, na={na})"
        )

    raise ValueError(f"Unsupported op: {op}")


def _combine(df, parts, how):
    if how == "all":
        mask = pd.Series(True, index=df.index)
        joiner = " and "
    else:
        mask = pd.Series(False, index=df.index)
        joiner = " or "
    qs = []
    for m, q in parts:
        mask = mask & m if how == "all" else mask | m
        qs.append(f"({q})")
    return mask, ("(" + joiner.join(qs) + ")" if qs else "")


def _compile_spec(df, spec, env, var_id):
    if _is_logic_dict(spec):
        if "not" in spec:
            m, q = _compile_spec(df, spec["not"], env, var_id)
            return ~m, f"not ({q})"
        tag = "all" if "all" in spec else "any"
        items = spec[tag]
        if not isinstance(items, (list, tuple)):
            items = [items]
        parts = [_compile_spec(df, it, env, var_id) for it in items]
        return _combine(df, parts, tag)

    if _is_logic_list(spec):
        tag = spec[0].lower()
        if tag == "not":
            if len(spec) != 2:
                raise ValueError("['not', spec] expects exactly one child.")
            m, q = _compile_spec(df, spec[1], env, var_id)
            return ~m, f"not ({q})"
        parts = [_compile_spec(df, s, env, var_id) for s in spec[1:]]
        return _combine(df, parts, tag)

    if _is_leaf_list(spec):
        return _compile_leaf(df, spec, env, var_id)

    if isinstance(spec, (list, tuple)):  # implicit AND
        if not spec:
            raise ValueError("Empty spec list.")
        parts = [_compile_spec(df, node, env, var_id) for node in spec]
        # NOTE: do not strip the outer parens — q.strip("()") removes ALL
        # leading/trailing paren characters and produced unbalanced query
        # strings like 'a > @v0) and (b < @v1'
        return _combine(df, parts, "all")

    raise ValueError("Invalid spec structure.")


def filter_df_with_spec(df, spec, *, return_query=True):
    """Filter a DataFrame with a spec tree.

    Returns {'df': filtered, 'mask': boolean Series} plus, when
    ``return_query``, the equivalent pandas query string and its @-variable
    environment."""
    env: Dict[str, Any] = {}
    var_id = [0]
    mask, q = _compile_spec(df, spec, env, var_id)
    out = {"df": df[mask], "mask": mask}
    if return_query:
        out["query"] = q
        out["env"] = env
    return out
