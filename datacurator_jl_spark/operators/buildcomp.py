"""Column-predicate builder with the reference's ``buildcomp`` semantics
(src/DataCurator.jl:2270-2293 scalar ops, :2205-2215 negation,
:2218-2229 multi-value).

Semantics pinned here (SURVEY.md §7.4 determinism):
- ``between [lo, hi]`` is STRICT on both sides (lo < x < hi) — unlike SQL
  BETWEEN (reference src/DataCurator.jl:2224).
- ``isnan`` is IEEE NaN, distinct from null; ``ismissing``/``isnothing``
  are null tests (reference :2286-2290; docs/src/conditions.md NaN note).
- ``["not", op]`` negates (reference :2205-2215). NOTE: in SQL,
  NOT(x < v) is null when x is null — matching Julia's missing
  propagation.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALAR_OPS = {
    "less": lambda c, v: c < v,
    "<": lambda c, v: c < v,
    "leq": lambda c, v: c <= v,
    "<=": lambda c, v: c <= v,
    "more": lambda c, v: c > v,
    ">": lambda c, v: c > v,
    "geq": lambda c, v: c >= v,
    ">=": lambda c, v: c >= v,
    "equals": lambda c, v: c == v,
    "is": lambda c, v: c == v,
    "==": lambda c, v: c == v,
    "=": lambda c, v: c == v,
}

_UNARY_OPS = {
    "iszero": lambda c: c == 0,
    "isnan": lambda c: F.isnan(c),
    "isnothing": lambda c: c.isNull(),
    "ismissing": lambda c: c.isNull(),
}


def buildcomp(col: Column, op: Any, val: Any = None) -> Column:
    """One column predicate. ``op`` may be a scalar op name/symbol, a unary
    op name, ``"between"``/``"in"``, or ``["not", op]``."""
    if isinstance(op, (list, tuple)):
        if len(op) == 2 and op[0] == "not":
            return ~buildcomp(col, op[1], val)
        raise ValueError(f"bad operator spec {op!r}")
    if op in _UNARY_OPS:
        return _UNARY_OPS[op](col)
    if op == "between":
        lo, hi = val
        return (F.lit(lo) < col) & (col < F.lit(hi))  # strict, both sides
    if op == "in":
        return col.isin(list(val))
    if op in _SCALAR_OPS:
        return _SCALAR_OPS[op](col, F.lit(val))
    raise ValueError(f"unknown comparison operator {op!r}")


def buildcomp_mask(df_cols: list[tuple[str, Any, Any]], combine: str = "and") -> Column:
    """AND (``extract``) or OR (``extract_any``) of per-column predicates
    (reference execute_dataframe_function, src/DataCurator.jl:2026-2057)."""
    from functools import reduce

    preds = [buildcomp(F.col(c), op, v) for c, op, v in df_cols]
    if combine == "and":
        return reduce(lambda a, b: a & b, preds)
    if combine == "or":
        return reduce(lambda a, b: a | b, preds)
    raise ValueError(combine)
