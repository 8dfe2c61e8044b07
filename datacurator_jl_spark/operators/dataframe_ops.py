"""Relational ops with the reference's dataframe-function semantics
(``execute_dataframe_function`` src/DataCurator.jl:2026-2057,
``extract_columns`` :1780-1788, ``groupbycolumn`` :941-965).

All pure DataFrame built-ins: filter/select/groupBy compile to
Catalyst-optimized plans (pushdown + partial aggregation); nothing here
ever leaves the JVM.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datacurator_jl_spark.operators.buildcomp import buildcomp_mask

# aggregate-function names the reference resolves via `lookup` into Julia
# Base functions (sum/maximum/minimum/mean/...; src/DataCurator.jl:944)
AGG_FNS = {
    "sum": F.sum,
    "maximum": F.max,
    "max": F.max,
    "minimum": F.min,
    "min": F.min,
    "mean": F.avg,
    "avg": F.avg,
    "median": lambda c: F.median(c),
    "std": F.stddev_samp,
    "count": F.count,
    "length": F.count,
    "first": F.first,
    "last": F.last,
}


def validate_unique_ids(df: DataFrame, id_col: str, op: str) -> None:
    """Raise when ``id_col`` is not unique OR contains NULLs — shared
    guard for every operator whose groupBy-reassembly or left-join keys
    on the id (dedup_paragraphs, remove_boilerplate_lines,
    remove_duplicated_spans, decontaminate, dup_ngram_stats). Duplicate
    ids silently merge/multiply rows; a NULL id never matches the
    reassembly join, so that row's text would come back NULL — silent
    data destruction either way.

    Cost (ADVICE r4): "cheap" means id-column-only, but it is still one
    eager full-corpus shuffle per probe — material at 100-TB scale when
    several default-on operators chain over the same frame. The engine
    pre-pass shares ONE probe per pipeline (``ids_validated``); for
    library users this function memoizes per DataFrame OBJECT, so
    chained calls over the same frame probe once, and derived frames
    (where uniqueness could genuinely change) probe again. Pass
    ``validate_ids=False`` at the call sites when uniqueness is
    guaranteed upstream.

    Immutable-source assumption (ADVICE r5): the memo is only sound for
    sources whose contents do not change between Spark actions. A
    DataFrame over a mutable location (a parquet directory or JDBC table
    being appended to concurrently) re-reads on every action, so a later
    call on the same object could skip the probe and miss duplicates
    that arrived after the first validation. Batch curation inputs are
    immutable snapshots by contract (the engine reads a fixed input
    path); for genuinely mutable sources, checkpoint/persist the frame
    first or re-create the DataFrame object per batch (the streaming
    path does the latter implicitly — each micro-batch is a new frame)."""
    seen: set[str] = df.__dict__.setdefault("_dc_ids_validated", set())
    if id_col in seen:
        return
    bad = (
        df.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter((F.col("_n") > 1) | F.col(id_col).isNull())
        .limit(1)
        .collect()
    )
    if not bad:
        seen.add(id_col)
    if bad:
        what = (
            "contains NULL ids"
            if bad[0][0] is None
            else f"is not unique (e.g. {bad[0][0]!r})"
        )
        raise ValueError(
            f"{op}: id_col {id_col!r} {what} — fix the ids first, or "
            "pass validate_ids=False only when uniqueness and "
            "non-nullness are guaranteed upstream"
        )


def _known(df: DataFrame, cols: list[str]) -> list[str]:
    """Reference warns + no-ops on unknown columns (src/DataCurator.jl:2035-2040)."""
    known = [c for c in cols if c in df.columns]
    if len(known) != len(cols):
        import warnings

        warnings.warn(f"unknown columns ignored: {set(cols) - set(known)}")
    return known


def extract(
    df: DataFrame,
    specs: list[tuple[str, Any, Any]],
    selectcols: list[str] | None = None,
) -> DataFrame:
    """Keep rows matching ALL predicates, then project (AND semantics)."""
    out = df.filter(buildcomp_mask(specs, "and"))
    if selectcols:
        out = out.select(*_known(df, selectcols))
    return out


def extract_any(
    df: DataFrame,
    specs: list[tuple[str, Any, Any]],
    selectcols: list[str] | None = None,
) -> DataFrame:
    """Keep rows matching ANY predicate (OR semantics)."""
    out = df.filter(buildcomp_mask(specs, "or"))
    if selectcols:
        out = out.select(*_known(df, selectcols))
    return out


def delete_rows(df: DataFrame, specs: list[tuple[str, Any, Any]]) -> DataFrame:
    """Drop rows matching ALL predicates.

    Null semantics pinned: the reference's delete removes rows where the
    mask is TRUE; rows with null mask (null operands) are KEPT — hence
    the explicit null-safe complement below, not ``~mask`` alone (SQL
    ``NOT null`` is null and would silently drop those rows from the
    output of a plain filter).
    """
    mask = buildcomp_mask(specs, "and")
    return df.filter(~F.coalesce(mask, F.lit(False)))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "dc"
) -> DataFrame:
    """Deterministic, reproducible sampling: keep rows whose portable
    32-bit key hash falls in the first ``fraction`` of the hash space.

    Unlike ``df.sample()`` (rand(), partition-order dependent, not
    restart-stable), this is a pure function of the KEY: the same row is
    in or out across retries, resumed checkpoints, and engines — which
    is what a 100 TB curation pipeline needs for reproducible subcorpora.
    Hash = md5-derived (`_h32` contract), so the DuckDB oracle reproduces
    the exact row set. Pushdown-friendly: a plain filter, no shuffle.
    """
    from datacurator_jl_spark.operators.dedup import _h32

    bucket = F.pmod(_h32(F.col(key_col).cast("string"), f"#{salt}"), F.lit(10_000))
    return df.filter(bucket < int(round(fraction * 10_000)))


def blocklist_filter(
    df: DataFrame, col: str, listed, keep_listed: bool = False
) -> DataFrame:
    """Remove (default) or keep-only rows whose ``col`` value appears in
    ``listed`` — the domain/URL blocklist (or allowlist) filter.

    ``listed`` is either a one-column DataFrame (the corpus-scale path:
    a broadcast anti/semi join — a UDF-free plan that AQE can also
    demote to shuffle join if the list outgrows the broadcast
    threshold) or a Python iterable of values (plan-embedded ``isin``,
    right for small inline lists). Null values never match a list, so
    they are kept under blocklist semantics and dropped under allowlist
    semantics — SQL IN null handling.
    """
    if isinstance(listed, DataFrame):
        if len(listed.columns) != 1:
            raise ValueError(
                f"blocklist DataFrame must have exactly one column, "
                f"got {listed.columns}"
            )
        key = listed.columns[0]
        how = "left_semi" if keep_listed else "left_anti"
        return df.join(
            F.broadcast(listed), df[col] == listed[key], how
        )
    vals = list(dict.fromkeys(listed))  # dedup, keep caller order + types
    hit = F.col(col).isin(vals)
    # null-keep spelled as IsNull OR Not(In): both translate to parquet
    # scan filters (PushedFilters, pinned in test_plans) — a
    # NOT coalesce(...) wrapper would evaluate post-scan instead
    keep = hit if keep_listed else (F.col(col).isNull() | ~hit)
    return df.filter(keep)


def extract_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Projection (reference rewrites the CSV; we just select)."""
    return df.select(*_known(df, columns))


def latest_version(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Keep the single LATEST row per key — the 'latest crawl per URL'
    ingest op (north-rule analogue: one row per url at max warc_ts; the
    reference's keep-newest file disposition re-expressed relationally).

    Winner = max ``(ts IS NOT NULL, ts, tiebreak)``: a NULL timestamp
    never beats a real one (it wins only when the whole group is
    NULL-ts), and ``tiebreak_col`` (MUST be unique per group for full
    determinism — e.g. the event/crawl id) settles equal timestamps. If
    the tiebreak is NOT unique, ``max_by`` picks an arbitrary winner
    among the tied rows (round-6 change, ADVICE r5: previously the
    payload values silently decided — neither behavior is a pinned
    rule, so keep the tiebreak unique).

    Scale shape: ONE map-side-combinable ``max_by`` aggregate — partial
    max per partition, then a shuffle of one struct per (partition,
    key), never a per-key window sort over all versions (`row_number`
    would buffer and sort every version of a hot URL in one task; the
    aggregate reduces them locally first). ``max_by`` orders ONLY by
    the ``(_nn, _ts, _tb)`` key struct (ADVICE r5), so non-orderable
    payload types (maps) ride along untouched — with the old
    ``max(struct(..., payload))`` a map-typed metadata column failed at
    analysis, which broke ``[global] keep_latest`` (payload defaults to
    every remaining column). Output: key cols + ts + tiebreak +
    ``payload_cols`` (default: all remaining columns).
    """
    if payload_cols is None:
        taken = set(key_cols) | {ts_col, tiebreak_col}
        payload_cols = [c for c in df.columns if c not in taken]
    ordk = F.struct(
        F.col(ts_col).isNotNull().alias("_nn"),
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
    )
    val = F.struct(
        F.col(ts_col).alias("__dc_ts"),
        F.col(tiebreak_col).alias("__dc_tb"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    agg = df.groupBy(*key_cols).agg(F.max_by(val, ordk).alias("_w"))
    return agg.select(
        *key_cols,
        F.col("_w.__dc_ts").alias(ts_col),
        F.col("_w.__dc_tb").alias(tiebreak_col),
        *[F.col(f"_w.{c}").alias(c) for c in payload_cols],
    )


def groupbycolumn(
    df: DataFrame,
    groupcols: list[str],
    targets: list[str],
    functions: list[str],
    names: list[str] | None = None,
) -> DataFrame:
    """Group-by + named aggregations (reference src/DataCurator.jl:941-947:
    ``groupbycolumn(df, cols, targets, fns, names)``).

    Scale: a single hash aggregate; Catalyst inserts a map-side partial
    aggregation before the shuffle, so this holds at 100 TB as long as
    group cardinality per partition stays bounded.
    """
    if names is None:
        names = [f"{t}_{f}" for t, f in zip(targets, functions)]
    aggs = []
    for t, f, n in zip(targets, functions, names):
        if f not in AGG_FNS:
            raise ValueError(f"unknown aggregate fn {f!r}")
        aggs.append(AGG_FNS[f](F.col(t)).alias(n))
    return df.groupBy(*groupcols).agg(*aggs)


def describe_column_exact(df: DataFrame, col: str, dp: int = 4) -> DataFrame:
    """8-moment describe with EXACT percentiles and raw-moment kurtosis,
    rounded to ``dp`` — the cross-engine-deterministic variant used by
    oracle-checked queries and aggregator chains. percentile() is exact
    with linear interpolation in both Spark and DuckDB (quantile_cont);
    kurtosis (population excess) comes from raw moments with the same
    expansion on both sides (library kurtosis fns differ in bias
    correction across engines)."""
    # double throughout: DuckDB round() yields DOUBLE even for ints, so
    # integer min/max would hash-mismatch ("553" vs "553.0")
    c = F.col(col).cast("double")
    q = F.percentile(c, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    mu = F.avg(c)
    m2r, m3r, m4r = (F.avg(F.pow(c, k)) for k in (2, 3, 4))
    kurt = (m4r - 4 * mu * m3r + 6 * mu * mu * m2r - 3 * F.pow(mu, 4)) / F.pow(
        m2r - mu * mu, 2
    ) - 3.0
    return df.agg(
        F.round(F.min(c), dp).alias("minimum"),
        F.round(q.getItem(0), dp).alias("q1"),
        F.round(mu, dp).alias("mean"),
        F.round(q.getItem(1), dp).alias("median"),
        F.round(q.getItem(2), dp).alias("q3"),
        F.round(F.max(c), dp).alias("maximum"),
        F.round(F.stddev_samp(c), dp).alias("std"),
        F.round(kurt, dp).alias("kurtosis"),
    )


def describe_column(df: DataFrame, col: str) -> DataFrame:
    """8-moment describe of one numeric column — the graft analogue of the
    reference's ``describe_image`` intensity stats
    (src/DataCurator.jl:902-916: min, Q1, mean, median, Q3, max, std,
    kurtosis)."""
    c = F.col(col)
    q = F.percentile_approx(c, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(10000))
    return df.agg(
        F.min(c).alias("minimum"),
        q.getItem(0).alias("Q1"),
        F.avg(c).alias("mean"),
        q.getItem(1).alias("median"),
        q.getItem(2).alias("Q3"),
        F.max(c).alias("maximum"),
        F.stddev_samp(c).alias("std"),
        F.kurtosis(c).alias("kurtosis"),
    )
