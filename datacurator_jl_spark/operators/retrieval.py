"""BM25 keyword retrieval over the corpus — the classic "find the docs
about X" query a curation run uses to spot-check a filter's effect (and
the exact-scoring baseline for benchmark-decontamination triage when the
n-gram tier (operators/decontam.py) flags too much).

Okapi BM25 with the Lucene-style smoothed idf
``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always positive, so a term in
>50% of docs still contributes instead of flipping negative).

Scale shape: tokenize -> filter to the query's terms BEFORE any shuffle
(the explode is a narrow generate; non-query tokens never leave the
map side) -> one partial-combinable (doc, term) count -> tiny per-term
df aggregate + one corpus-stats row, both broadcast back -> top-k via
orderBy+limit (TakeOrderedAndProject: per-partition heaps, k rows cross
the wire — never a global sort of the corpus). No window, no UDF.

Determinism (three-engine contract, same posture as operators/dsir.py):
every input to the float math is an exact integer (tf, dl, N, df) or a
ratio of exact integers (avgdl), per-term contributions combine in ONE
fixed expression-tree order (a generated ``c0 + c1 + ...`` sum over the
caller's term order, never a float SUM aggregate whose partial-combine
order varies), and the final score is rounded to 6dp. Reference
analogue: the reference's aggregator+condition surface has no ranker;
this is a beyond-reference training-data op (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datacurator_jl_spark.functions.text import words


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` docs by BM25 score for the (lowercased) query ``terms``.

    Output: (id_col, score) — score 6dp, ordered by (score desc, id asc);
    ties at the k-boundary break toward the lower id. Only docs matching
    >= 1 query term can appear (BM25 gives non-matching docs score 0; a
    rank over them would be an id sort, not retrieval). Null-text docs
    are out of the corpus entirely (they have no length): N and avgdl
    count non-null-text docs only.

    ``terms`` are matched as whole tokens of the pinned ASCII ``\\S+``
    tokenization, lowercased; pass them pre-lowercased.
    """
    if not terms:
        raise ValueError("bm25_topk needs >= 1 query term")
    if len(set(terms)) != len(terms):
        raise ValueError("bm25_topk terms must be distinct (duplicate "
                         "terms would double-count their contribution)")
    import re as _re

    for t in terms:
        if t != t.lower() or _re.search(r"\s", t) or not t:
            raise ValueError(
                f"bm25_topk term {t!r} can never match a token: terms "
                "must be non-empty, lowercase, and whitespace-free "
                "(the corpus side is lowercased \\S+ tokens)"
            )
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc"),
        words(F.lower(F.col(text_col))).alias("toks"),
    )
    lens = base.select("doc", F.size("toks").alias("dl"))
    # corpus stats: one row (N, avgdl). Exact bigint sums -> the double
    # division is a pure function of exact inputs (identical across
    # engines and across retries).
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        base.select("doc", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(list(terms)))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    avgdl = F.col("sum_dl") / F.col("n_docs")
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    )
    contrib = idf * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )
    scored = (
        tf.join(lens, "doc")
        .join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc", "term", contrib.alias("contrib"))
    )
    # fixed-order combine: one conditional agg per term (each sums exactly
    # one non-null row, so it is exact), then a literal expression-tree
    # sum in the caller's term order — never SUM(contrib) over the group,
    # whose partial-aggregation order is engine/run-dependent.
    per_term = scored.groupBy("doc").agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("contrib"))).alias(f"_c{i}")
            for i, t in enumerate(terms)
        ]
    )
    score = F.coalesce(F.col("_c0"), F.lit(0.0))
    for i in range(1, len(terms)):
        score = score + F.coalesce(F.col(f"_c{i}"), F.lit(0.0))
    return (
        per_term.select("doc", F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc"))
        .limit(k)
        .select(F.col("doc").alias(id_col), "score")
    )


def bm25_topk_sql(
    terms: list[str],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk`, GENERATED so the term list and
    constants can never drift from the Spark call (same pattern as
    ``extract_html_text_sql`` / ``dsir_score_sql``). Whitespace class
    spelled explicitly (RE2 ``\\s`` excludes vertical tab)."""
    ws = r"[^ \t\n\x0b\f\r]+"

    def q(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    quoted = ", ".join(q(t) for t in terms)
    cases = ",\n        ".join(
        f"sum(CASE WHEN term = {q(t)} THEN contrib END) AS _c{i}"
        for i, t in enumerate(terms)
    )
    add = " + ".join(f"coalesce(_c{i}, 0.0)" for i in range(len(terms)))
    return f"""
    WITH base AS (
      SELECT {id_col} AS doc,
             regexp_extract_all(lower({text_col}), '{ws}') AS toks
      FROM {table} WHERE {text_col} IS NOT NULL
    ),
    lens AS (SELECT doc, len(toks) AS dl FROM base),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM lens),
    tf AS (
      SELECT doc, term, count(*) AS tf
      FROM (SELECT doc, unnest(toks) AS term FROM base)
      WHERE term IN ({quoted})
      GROUP BY doc, term
    ),
    dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc, tf.term,
             ln(1.0 + (stats.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5))
             * (tf.tf * ({k1} + 1.0)
                / (tf.tf + {k1} * (1.0 - {b}
                   + {b} * lens.dl / (stats.sum_dl / CAST(stats.n_docs AS DOUBLE)))))
             AS contrib
      FROM tf JOIN lens USING (doc) JOIN dft USING (term) CROSS JOIN stats
    ),
    per_term AS (
      SELECT doc,
        {cases}
      FROM scored GROUP BY doc
    )
    SELECT doc AS {id_col}, round({add}, 6) AS score
    FROM per_term
    ORDER BY score DESC, doc ASC
    LIMIT {k}
    """
