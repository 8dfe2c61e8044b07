"""Duplicated-span removal (ExactSubstr-style, fixed token window).

Lee et al. 2022 (*Deduplicating Training Data Makes Language Models
Better*) removes every substring of >= 50 tokens that occurs more than
once in the corpus, using a suffix array — an inherently single-machine
index. This operator is the distributed fixed-window approximation the
paper's public implementations fall back to at cluster scale: every
token covered by ANY duplicated n-token window is removed. With window n
it removes exactly the duplicated substrings of length >= n (a repeated
span of m >= n tokens is covered by its m - n + 1 duplicated windows),
at the cost of fuzzier boundaries than the suffix-array method (up to
n - 1 extra tokens at each end of a repeat can be kept or cut depending
on neighboring windows — the standard trade; production uses n ~ 50).

PINNED SEMANTICS:
- token = ``[^ \\t\\n\\x0b\\f\\r]+`` match over the RAW text (the
  repo-wide explicit whitespace class — never ``\\S``, whose RE2
  meaning differs); window KEY = the n tokens of ``lower(text)`` joined
  by one space (the same lowercased-gram pin as decontaminate/d42 —
  lowercasing never changes token boundaries, so raw tokens and key
  windows align by index).
- a window is duplicated iff its key occurs >= 2 times corpus-wide,
  counting every occurrence (within-doc repeats count — a doc that
  repeats its own span is self-duplication, per the paper).
- removed token indices = union of [s, s+n) over every duplicated
  window start s; output text = surviving RAW tokens joined by a single
  space, in order (the output is token-normalized — runs of whitespace
  in the input collapse; pinned and documented, as reassembling exact
  inter-token whitespace would require carrying it per token).
- null text -> null output; token-less text (empty/whitespace-only) ->
  empty string; a doc whose EVERY token was removed -> null output
  (distinguishable from the empty string, same pin as
  remove_boilerplate_lines); ``count_col`` = removed token count (null
  for null text).

Scale shape: one Arrow pass builds the window keys (positions are the
array indices — no per-window struct), one window-frequency hash
aggregate (map-side combine collapses a viral window to one row per
partition before the exchange), one shuffle equi-join of window
occurrences against the duplicated-key set (AQE skew-split applies;
nothing must be broadcastable), a bounded explode of covered indices
(<= n rows per duplicated occurrence) collapsed to one index SET per
affected doc, and a projection-only reassembly (native array filter —
round 7; only docs with a duplicated window shuffle at all). Per-doc
state is bounded by doc length; a window duplicated 10^9 times
contributes rows linear in its occurrence count, never a pair join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datacurator_jl_spark.operators.decontam import word_ngrams_arrow

# the repo-wide explicit whitespace complement (CLAUDE.md: never \S)
_TOKEN_CLASS = "[^ \\t\\n\\x0b\\f\\r]+"

_ID, _IDX = "_sd_id", "_sd_idx"


def duplicated_windows(
    df: DataFrame, id_col: str, text_col: str, n: int = 20
) -> DataFrame:
    """The duplicated-window set: (window, n_occurrences) for every
    n-token key occurring >= 2 times corpus-wide."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    occ = df.select(
        F.col(id_col).alias(_ID),
        F.explode(word_ngrams_arrow(F.col(text_col), n)).alias("window"),
    )
    return (
        occ.groupBy("window")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= 2)
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 20,
    out_col: str | None = None,
    count_col: str = "n_removed",
    materialize: str = "local",
    validate_ids: bool = True,
) -> DataFrame:
    """All original columns, plus ``out_col`` (default: text_col replaced
    in place) with every token covered by a duplicated n-token window
    removed, and ``count_col`` = number of removed tokens.

    ``id_col`` must be unique and non-null (groupBy reassembly — same
    guard as dedup_paragraphs/remove_boilerplate_lines). ``materialize``
    picks the durability of the window-occurrence intermediate (policy
    as dedup's ``_materialize``: local | reliable | directory path)."""
    out_col = out_col or text_col
    if count_col == out_col:
        raise ValueError(
            "remove_duplicated_spans: count_col and out_col must differ "
            f"(both {count_col!r})"
        )
    if count_col in df.columns:
        raise ValueError(
            f"remove_duplicated_spans: count column {count_col!r} already "
            "exists in the input — pass count_col= to rename"
        )
    if validate_ids:
        from datacurator_jl_spark.operators.dataframe_ops import (
            validate_unique_ids,
        )

        validate_unique_ids(df, id_col, "remove_duplicated_spans")

    # (id, start, window-key) occurrences; start = array index of the
    # gram (word_ngrams_arrow preserves order when distinct=False).
    # Materialized ONCE: both the frequency aggregate and the coverage
    # join read it — without this the Arrow gram UDF would run over the
    # whole corpus twice.
    from datacurator_jl_spark.operators.dedup import _materialize

    occ = _materialize(
        df.select(
            F.col(id_col).alias(_ID),
            F.posexplode(word_ngrams_arrow(F.col(text_col), n)).alias(
                "s", "window"
            ),
        ),
        materialize,
    )
    dup = (
        occ.groupBy("window")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("window")
    )
    # round-7 reassembly (guide §2.3/§2.4): aggregate the covered token
    # INDEX SET per doc (collect_set dedupes, replacing the separate
    # distinct shuffle) and rebuild the text with a native array filter
    # in one projection — the old shape posexploded every RAW token of
    # the corpus, anti-joined it against the covered set, and re-sorted
    # a collect_list per doc: three shuffles of the full token stream to
    # move information the doc's own row already had. Only docs with a
    # duplicated window carry a covered set; everything else streams
    # through the left join untouched. Values unchanged (pinned
    # semantics above, incl. the null/empty/all-removed distinctions).
    covered = (
        occ.join(dup, "window")
        .select(_ID, F.explode(F.sequence(F.col("s"), F.col("s") + (n - 1))).alias(_IDX))
        .groupBy(_ID)
        .agg(F.collect_set(F.col(_IDX)).alias("_sd_cov"))
    )
    out = df.join(covered, df[id_col] == covered[_ID], "left").drop(_ID)
    tok_arr = F.regexp_extract_all(F.col(text_col), F.lit(_TOKEN_CLASS), 0)
    n_toks = F.size(tok_arr)
    kept_arr = F.when(
        F.col("_sd_cov").isNotNull(),
        F.filter(
            tok_arr,
            lambda x, i: ~F.array_contains(F.col("_sd_cov"), i),
        ),
    ).otherwise(tok_arr)
    # project the filtered array ONCE (multi-referenced non-cheap alias
    # is not inlined), then derive the pinned outputs from it
    out = out.withColumn("_sd_kept", kept_arr)
    clean = (
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .when(n_toks == 0, F.lit(""))  # token-less input -> empty, not null
        .when(F.size("_sd_kept") == 0, F.lit(None).cast("string"))
        .otherwise(F.array_join(F.col("_sd_kept"), " "))
    )
    return out.select(
        *[c for c in df.columns if c != out_col],
        clean.alias(out_col),
        F.when(
            F.col(text_col).isNotNull(),
            F.coalesce(F.size(F.col("_sd_cov")), F.lit(0)).cast("int"),
        ).alias(count_col),
    )
