"""Corpus analysis reports — the dashboard queries a curation run is
steered by.

Both are single-aggregate plans (map-side partial combine, no row
explosion beyond the token unnest in ``top_terms``), exactly
SQL-expressible so the DuckDB oracles gate them bit-for-bit. The
reference's `describe`/groupby surface (src/DataCurator.jl:2520-2560)
covers generic column stats; these are the corpus-shaped composites a
web-text pipeline actually looks at.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datacurator_jl_spark.functions.text import words


def corpus_report(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """Per-group curation dashboard: doc counts, null-text count, char
    and token totals, mean tokens/doc, and the exact-dup rate
    (1 - distinct texts / non-null texts). One hash aggregate.

    Tokens = the pinned ASCII ``\\S+`` list; token/char sums are null-safe
    (null text contributes 0); ratios are 6dp-rounded doubles so both
    engines emit identical decimals.
    """
    nw = F.size(words(F.col(text_col)))
    return (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(text_col).isNull().cast("long")).alias("n_null_text"),
            F.sum(F.coalesce(F.length(text_col), F.lit(0))).alias("total_chars"),
            F.sum(F.coalesce(nw, F.lit(0))).alias("total_tokens"),
            F.count(text_col).alias("_nt"),
            F.countDistinct(text_col).alias("_nd"),
        )
        .select(
            group_col,
            "n_docs",
            "n_null_text",
            "total_chars",
            "total_tokens",
            F.round(
                F.col("total_tokens") / F.greatest(F.col("_nt"), F.lit(1)), 6
            ).alias("mean_tokens"),
            F.round(
                1.0 - F.col("_nd") / F.greatest(F.col("_nt"), F.lit(1)), 6
            ).alias("dup_rate"),
        )
    )


def top_terms(
    df: DataFrame, text_col: str, k: int, group_col: str | None = None
) -> DataFrame:
    """The k most frequent tokens (pinned ``\\S+`` over ``lower(text)``,
    multiplicity counted), globally or per group; ties broken by the
    term itself so ranks are deterministic and engine-stable.

    Scale shape: token unnest -> ONE partial-combinable count aggregate
    (a Zipf-head token collapses per input partition before the
    exchange) -> per-group top-k window over the aggregated (small)
    term table, never over raw tokens. For a global top-k over a true
    web vocabulary the window's single partition holds one row per
    DISTINCT term post-aggregation; cap the term table first
    (HAVING count >= m) if the vocabulary itself is the bottleneck.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = df.select(
        *( [F.col(group_col)] if group_col else [] ),
        F.explode(words(F.lower(F.col(text_col)))).alias("term"),
    )
    keys = [group_col] if group_col else []
    counts = toks.groupBy(*keys, "term").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(*keys).orderBy(F.col("n").desc(), F.col("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(*keys, "term", "n", "rank")
    )
