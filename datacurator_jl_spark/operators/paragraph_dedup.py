"""C4-style paragraph-level exact deduplication.

Web corpora repeat exact paragraphs across (and within) documents —
license blurbs, product descriptions, syndicated ledes. C4 removed
duplicate three-sentence spans corpus-wide keeping one occurrence; this
operator is the paragraph-granular version: every exact duplicate
paragraph occurrence is removed EXCEPT the globally first one, and the
documents are reassembled. It complements exact doc-level dedup
(operators/dedup.py: whole text equal) and boilerplate removal
(operators/boilerplate.py: frequency-threshold lines removed from ALL
docs incl. the first) — here exactly one copy always survives.

PINNED SEMANTICS:
- paragraph = element of ``text.split(sep)`` where ``sep`` is a LITERAL
  separator string (default ``"\\n\\n"``; escaped before the regex
  split so both engines split on the literal). No trimming, case
  sensitive.
- EMPTY paragraphs are never deduplicated and are always preserved
  (they encode run-of-separator spacing, not content).
- the surviving occurrence of a duplicated paragraph is the first by
  ``(id, position)`` lexicographic order — stable across partitioning,
  restarts, and engines.
- output text = surviving paragraphs joined by ``sep`` in original
  order; null text -> null output; a document whose every paragraph was
  removed -> null output (distinguishable from the empty string);
  ``count_col`` = number of removed occurrences (null for null text).

Scale shape (the 100-TB plan): winner selection is a
``groupBy(paragraph).agg(min(struct(id, pos)))`` — a hash aggregate
whose map-side partial combine collapses a paragraph duplicated 10^9
times to ONE row per input partition before the exchange, so a viral
paragraph cannot create a hot reduce key (this is why it is an
aggregate and not a per-paragraph ``row_number`` window, which would
drag every copy through one task). The occurrence<->winner join is a
shuffle equi-join on the paragraph; AQE skew-split applies. Reassembly
is one groupBy(id) aggregate. Nothing is collected to the driver.

Reference parity: the reference curates files, not corpora — its
content transforms are per-file (transform_wrapper content branch,
src/DataCurator.jl:1350-1420); corpus-global paragraph dedup is part of
this repo's beyond-reference LLM-pipeline surface (SURVEY §2 extension
list), same family as boilerplate removal and decontamination.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ID, _POS, _PARA = "_pd_id", "_pd_pos", "_pd_para"


def _paragraphs(df: DataFrame, id_col: str, text_col: str, sep: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(_ID),
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias(_POS, _PARA),
    )


def duplicated_paragraphs(
    df: DataFrame, id_col: str, text_col: str, sep: str = "\n\n"
) -> DataFrame:
    """The duplicate set: (paragraph, n_occurrences, first_id, first_pos)
    for every non-empty paragraph occurring more than once corpus-wide
    (within-document repeats count)."""
    paras = _paragraphs(df, id_col, text_col, sep).filter(F.col(_PARA) != "")
    return (
        paras.groupBy(_PARA)
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(F.struct(F.col(_ID), F.col(_POS))).alias("_w"),
        )
        .filter(F.col("n_occurrences") > 1)
        .select(
            F.col(_PARA).alias("paragraph"),
            "n_occurrences",
            F.col("_w")[_ID].alias("first_id"),
            F.col("_w")[_POS].alias("first_pos"),
        )
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n\n",
    out_col: str | None = None,
    count_col: str = "n_removed",
    validate_ids: bool = True,
) -> DataFrame:
    """All original columns, plus ``out_col`` (default: text_col replaced
    in place) with duplicate paragraph occurrences removed — the globally
    first occurrence survives — and ``count_col`` = removed count.

    ``id_col`` must be unique and non-null: reassembly groups by it, so
    duplicate ids would silently merge distinct rows' paragraphs into
    one interleaved franken-text attached to every copy, and a NULL id
    never matches the reassembly join (text silently nulled).
    ``validate_ids`` (default on) spends one cheap id-only aggregate to
    raise instead — disable only when uniqueness/non-nullness is
    guaranteed upstream (e.g. right after a key-dedup pass).
    """
    out_col = out_col or text_col
    if count_col == out_col:
        raise ValueError(
            "dedup_paragraphs: count_col and out_col must differ "
            f"(both {count_col!r})"
        )
    if count_col in df.columns:
        raise ValueError(
            f"dedup_paragraphs: count column {count_col!r} already "
            "exists in the input — pass count_col= to rename"
        )
    if validate_ids:
        from datacurator_jl_spark.operators.dataframe_ops import (
            validate_unique_ids,
        )

        validate_unique_ids(df, id_col, "dedup_paragraphs")
    paras = _paragraphs(df, id_col, text_col, sep)
    winners = (
        paras.filter(F.col(_PARA) != "")
        .groupBy(_PARA)
        .agg(F.min(F.struct(F.col(_ID), F.col(_POS))).alias("_w"))
        .select(
            F.col(_PARA),
            F.col("_w")[_ID].alias("_wid"),
            F.col("_w")[_POS].alias("_wpos"),
        )
    )
    kept = paras.join(winners, _PARA, "left").filter(
        (F.col(_PARA) == "")
        | ((F.col(_ID) == F.col("_wid")) & (F.col(_POS) == F.col("_wpos")))
    )
    reassembled = kept.groupBy(_ID).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(_POS, _PARA))),
                lambda s: s.getField(_PARA),
            ),
            sep,
        ).alias("_pd_clean"),
        F.count(F.lit(1)).alias("_pd_nkept"),
    )
    n_paras = F.size(F.split(F.col(text_col), re.escape(sep)))
    out = df.join(reassembled, df[id_col] == reassembled[_ID], "left").drop(_ID)
    return out.select(
        *[c for c in df.columns if c != out_col],
        F.col("_pd_clean").alias(out_col),
        F.when(
            F.col(text_col).isNotNull(),
            (n_paras - F.coalesce(F.col("_pd_nkept"), F.lit(0))).cast("int"),
        ).alias(count_col),
    )
