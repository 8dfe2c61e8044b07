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
    df: DataFrame, group_col: str, text_col: str, approx: bool = False
) -> DataFrame:
    """Per-group curation dashboard: doc counts, null-text count, char
    and token totals, mean tokens/doc, and the exact-dup rate
    (1 - distinct texts / non-null texts). One hash aggregate.

    Tokens = the pinned ASCII ``\\S+`` list; token/char sums are null-safe
    (null text contributes 0); ratios are 6dp-rounded doubles so both
    engines emit identical decimals.

    The distinct count runs over ``md5(text)``, not the text itself —
    the distinct-aggregate's shuffle ships 32 hex chars per doc instead
    of whole documents (at 100 TB that is the difference between a
    metadata-sized exchange and re-shuffling the corpus). Exactness
    caveat: two distinct texts sharing an md5 would undercount by one —
    cryptographically negligible, and the same fingerprint the d01/d05
    dedup tier already equates on. ``approx=True`` swaps in
    ``approx_count_distinct`` (HyperLogLog++, ~2% rsd): no distinct
    shuffle at all — the dashboard answer for a quick look at a
    petabyte; approximate, so keep it off anything oracle-compared.
    """
    nw = F.size(words(F.col(text_col)))
    nd = (
        F.approx_count_distinct(text_col)
        if approx
        else F.countDistinct(F.md5(F.col(text_col)))
    )
    return (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(text_col).isNull().cast("long")).alias("n_null_text"),
            F.sum(F.coalesce(F.length(text_col), F.lit(0))).alias("total_chars"),
            F.sum(F.coalesce(nw, F.lit(0))).alias("total_tokens"),
            F.count(text_col).alias("_nt"),
            nd.alias("_nd"),
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


def decision_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    keep_col: str = "keep",
    rule_col: str = "rule_id",
) -> DataFrame:
    """Recipe A/B diff: the (rule_from, rule_to) transition flows between
    two curation runs over the same corpus — "what changed when I edited
    the recipe", per deciding rule, before anything ships.

    Input: two frames of per-doc decisions (id, keep bool, rule_id) —
    the engine's output shape (dc_kept/dc_rule_id aliased, or d04-style
    query output). Output: one row per (rule_from, rule_to) pair with

    - ``flow``: 'keep->keep' | 'keep->drop' | 'drop->keep' |
      'drop->drop' | 'absent->…' | '…->absent' (a doc present in only
      one run — row-set drift — is surfaced, never silently dropped:
      full outer join);
    - ``n_docs``: documents taking that transition.

    Scale shape: one full-outer equi-join on the id (both sides hash
    partition on the same key — single co-partitioned shuffle each) +
    one partial-combinable aggregate over ≤ |rules_a| × |rules_b| group
    keys. No window, no collect; output is rule-pair-bounded, not
    corpus-bounded. Reference analogue: the validate/report dual modes
    (src/DataCurator.jl:2483-2523) — this is their cross-run composite.
    """
    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            F.col(keep_col).alias(f"keep_{tag}"),
            F.col(rule_col).alias(f"rule_{tag}"),
        )

    j = side(old, "a").join(side(new, "b"), "id", "full_outer")
    lab = lambda keep, rule: F.when(  # noqa: E731 - local label expr
        rule.isNull(), F.lit("absent")
    ).otherwise(F.when(keep, F.lit("keep")).otherwise(F.lit("drop")))
    return (
        j.groupBy(
            F.coalesce(F.col("rule_a"), F.lit("absent")).alias("rule_from"),
            F.coalesce(F.col("rule_b"), F.lit("absent")).alias("rule_to"),
            F.concat(
                lab(F.col("keep_a"), F.col("rule_a")),
                F.lit("->"),
                lab(F.col("keep_b"), F.col("rule_b")),
            ).alias("flow"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
