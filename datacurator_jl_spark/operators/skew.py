"""Skew handling: salted repartition for domain-skewed corpora.

The north rule calls out "explicit salted-repartition handling of
domain-skewed partitions": a handful of mega-domains (FIXTURES.md §1:
Zipf head) would otherwise make per-domain partitions wildly unbalanced
wherever work is keyed by domain (per-domain dedup, per-domain rollups,
partitioned writes).

Two tools:
- ``salted_repartition``: spread each hot key over S salted shards
  (key, hash(url) % S) so no single task owns a mega-domain.
- ``two_phase_agg``: aggregate-by-(key, salt) first (parallel partial),
  then re-aggregate by key — the classic skew-safe rollup; correct for
  decomposable aggregates (count/sum/min/max).

AQE (enabled in session.py) additionally splits skewed JOIN partitions
at runtime; these helpers cover the groupBy/write paths AQE does not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def domain_of(url: Column) -> Column:
    """Host part of a URL (scheme-agnostic, port stripped)."""
    return F.regexp_extract(url, r"^[a-z]+://([^/:]+)", 1)


def salt_col(url: Column, salt: int) -> Column:
    return F.pmod(F.hash(url), F.lit(salt))


def salted_repartition(
    df: DataFrame, key: Column, salt: int = 16, num_partitions: int | None = None
) -> DataFrame:
    """Repartition on (key, hash%salt): a mega-key spreads over `salt`
    tasks instead of one straggler."""
    cols = [key, salt_col(key, salt)]
    return df.repartition(num_partitions, *cols) if num_partitions else df.repartition(*cols)


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Skew-safe aggregate: ``aggs`` maps output name -> (fn, col) with
    fn in {count,sum,min,max}. Phase 1 aggregates by (key, salt) —
    partial results are balanced; phase 2 merges partials by key.
    """
    fn1 = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
    merge = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    for name, (fn, _col) in aggs.items():
        if fn not in fn1:
            raise ValueError(f"{fn} is not decomposable; use a plain groupBy")
    p1 = (
        df.withColumn("_salt", salt_col(F.col(key), salt))
        .groupBy(key, "_salt")
        .agg(*[fn1[fn](F.col(c)).alias(n) for n, (fn, c) in aggs.items()])
    )
    return p1.groupBy(key).agg(
        *[merge[fn](F.col(n)).alias(n) for n, (fn, _c) in aggs.items()]
    )
