"""Cross-document boilerplate line removal (RefinedWeb-style).

Web corpora repeat exact lines across documents — navigation chrome,
cookie banners, copyright footers. This operator removes every line
that occurs in at least ``min_docs`` DISTINCT documents, corpus-wide.
It is the cross-document complement of the per-document repetition
stats (functions/rep_stats.py) and of the reference's per-file content
transforms (transform_wrapper content branch, src/DataCurator.jl:
1350-1420): here the decision needs global corpus state, so it is a
distributed aggregation rather than a per-row expression.

PINNED SEMANTICS:
- line = element of ``text.split('\\n')`` (raw string, case-sensitive,
  no trimming); EMPTY lines are never boilerplate and are preserved.
- a line is boilerplate iff it is non-empty and appears in >= min_docs
  distinct documents (by exact string equality).
- output text = surviving lines joined by '\\n' in original order.
- null text -> null output; a document whose every line was removed ->
  null output (no surviving rows to reassemble; distinguishable from
  the empty string).

Scale shape (the 100-TB plan): one shuffle — the line-frequency
partial+final hash aggregate (map-side combine collapses each
partition's duplicate lines before the exchange). The boilerplate set
is broadcast (lines crossing a min_docs threshold are the heavy tail's
head — small by construction; raise min_docs at larger corpus sizes,
it is a *rate*, not a count), so the per-line filter is a broadcast
anti-join with no second scan-side shuffle. Reassembly is one
groupBy(id) aggregate. Nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# internal column names, underscore-prefixed to avoid user collisions
_ID, _POS, _LINE = "_bp_id", "_bp_pos", "_bp_line"


def boilerplate_lines(
    df: DataFrame, id_col: str, text_col: str, min_docs: int = 3
) -> DataFrame:
    """The boilerplate set itself: (line, n_docs) for every non-empty
    line appearing in >= min_docs distinct documents."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    lines = df.select(
        F.col(id_col).alias(_ID),
        F.explode(F.split(F.col(text_col), "\n")).alias(_LINE),
    )
    return (
        lines.filter(F.col(_LINE) != "")
        .groupBy(_LINE)
        .agg(F.countDistinct(_ID).alias("n_docs"))
        .filter(F.col("n_docs") >= int(min_docs))
        .select(F.col(_LINE).alias("line"), "n_docs")
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 3,
    out_col: str | None = None,
    count_col: str = "n_removed",
    validate_ids: bool = True,
) -> DataFrame:
    """All original columns, plus ``out_col`` (default: text_col
    replaced in place) with boilerplate lines removed and ``count_col``
    = number of removed lines (null for null text).

    ``id_col`` must be unique: reassembly groups by it, so duplicate ids
    would silently merge distinct rows' lines into one interleaved text
    attached to every copy (with a negative removed-count as the only
    tell). ``validate_ids`` (default on) spends one cheap id-only probe
    to raise instead — the same guard as dedup_paragraphs."""
    out_col = out_col or text_col
    if count_col == out_col:
        raise ValueError(
            "remove_boilerplate_lines: count_col and out_col must differ "
            f"(both {count_col!r})"
        )
    if count_col in df.columns:
        raise ValueError(
            f"remove_boilerplate_lines: count column {count_col!r} "
            "already exists in the input — pass count_col= to rename"
        )
    if validate_ids:
        from datacurator_jl_spark.operators.dataframe_ops import (
            validate_unique_ids,
        )

        validate_unique_ids(df, id_col, "remove_boilerplate_lines")
    boiler = boilerplate_lines(df, id_col, text_col, min_docs).select(
        F.col("line").alias(_LINE)
    )
    lines = df.select(
        F.col(id_col).alias(_ID),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(_POS, _LINE),
    )
    kept = lines.join(F.broadcast(boiler), _LINE, "left_anti")
    reassembled = kept.groupBy(_ID).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(_POS, _LINE))),
                lambda s: s.getField(_LINE),
            ),
            "\n",
        ).alias("_bp_clean"),
        F.count(F.lit(1)).alias("_bp_nkept"),
    )
    n_lines = F.size(F.split(F.col(text_col), "\n"))
    out = df.join(reassembled, df[id_col] == reassembled[_ID], "left").drop(_ID)
    return out.select(
        *[c for c in df.columns if c != out_col],
        F.col("_bp_clean").alias(out_col),
        F.when(
            F.col(text_col).isNotNull(),
            (n_lines - F.coalesce(F.col("_bp_nkept"), F.lit(0))).cast("int"),
        ).alias(count_col),
    )
