"""DSIR hashed-bigram importance weights (operators/dsir.py): pinned
semantics vs an independent per-row Python mirror, NULL contract,
target-shift sanity, and model/score factoring."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from datacurator_jl_spark.operators.dsir import (
    dsir_feature_table,
    dsir_model,
    dsir_scores,
)

_TOK = re.compile(r"\S+", re.ASCII)


def _bucket(gram: str, salt: str, B: int) -> int:
    return (
        int.from_bytes(
            hashlib.md5((gram + "#" + salt).encode("utf-8")).digest()[:4], "big"
        )
        % B
    )


def _round_half_up(x: float) -> int:
    return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _dsir_reference(rows, target_ids, B, salt="dsir_v1"):
    """Independent mirror: rows = [(id, text)]; returns id -> score."""
    feats = {}
    for rid, text in rows:
        c = Counter()
        if isinstance(text, str):
            t = _TOK.findall(text.lower())
            for i in range(len(t) - 1):
                c[_bucket(t[i] + " " + t[i + 1], salt, B)] += 1
        feats[rid] = c
    ct, cr = Counter(), Counter()
    for rid, c in feats.items():
        for b, n in c.items():
            cr[b] += n
            if rid in target_ids:
                ct[b] += n
    T, R = sum(ct.values()), sum(cr.values())
    w = {
        b: _round_half_up(
            1e6 * (math.log((ct[b] + 1) / (T + B)) - math.log((cr[b] + 1) / (R + B)))
        )
        for b in cr
    }
    return {
        rid: (sum(n * w[b] for b, n in c.items()) / 1e6 if c else None)
        for rid, c in feats.items()
    }


_ROWS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox sleeps all day long today"),
    (2, "lorem ipsum dolor sit amet consectetur adipiscing elit"),
    (3, "lorem ipsum dolor sit amet sed do eiusmod"),
    (4, "the lazy dog naps under the quick brown fox"),
    (5, "completely unrelated words appear exactly once here now"),
    (6, "solo"),  # 1 token -> no bigrams -> NULL
    (7, None),  # null text -> NULL
    (8, ""),  # empty -> NULL
]
_TARGET = {0, 1, 4}  # the "quick brown fox" dialect is the target slice


def _df(spark):
    return spark.createDataFrame(_ROWS, "id bigint, text string")


def test_dsir_scores_match_python_mirror(spark):
    got = {
        r["id"]: r["dsir_score"]
        for r in dsir_scores(
            _df(spark), "id", "text", F.col("id").isin(list(_TARGET)), n_buckets=256
        ).collect()
    }
    want = _dsir_reference(_ROWS, _TARGET, 256)
    assert set(got) == set(want)
    for rid in want:
        if want[rid] is None:
            assert got[rid] is None, rid
        else:
            # both sides are micro-nat bigints / 1e6 -> exact equality
            assert got[rid] == want[rid], (rid, got[rid], want[rid])


def test_dsir_target_slice_scores_higher(spark):
    got = {
        r["id"]: r["dsir_score"]
        for r in dsir_scores(
            _df(spark), "id", "text", F.col("id").isin(list(_TARGET)), n_buckets=4096
        ).collect()
    }
    # every target-dialect doc outranks every raw-only doc
    assert min(got[i] for i in (0, 1, 4)) > max(got[i] for i in (2, 3, 5))


def test_dsir_null_flag_counts_as_nontarget(spark):
    rows = [(0, "aa bb cc", "en"), (1, "aa bb cc", None), (2, "dd ee ff", "fr")]
    df = spark.createDataFrame(rows, "id bigint, text string, lang string")
    got = {
        r["id"]: r["dsir_score"]
        for r in dsir_scores(
            df, "id", "text", F.col("lang") == "en", n_buckets=64
        ).collect()
    }
    want = _dsir_reference([(i, t) for i, t, _ in rows], {0}, 64)
    assert got == want


def test_dsir_feature_table_and_model_factoring(spark):
    """The convenience path equals explicit feature-table + model + join
    (the persisted-model workflow for scoring new corpora)."""
    df = _df(spark)
    feats = dsir_feature_table(df, "id", "text", n_buckets=256)
    flags = df.select(
        F.col("id").alias("doc"),
        F.coalesce(F.col("id").isin(list(_TARGET)), F.lit(False)).alias("tgt"),
    )
    model = dsir_model(feats, flags, 256)
    sc = (
        feats.join(F.broadcast(model), "b")
        .groupBy("doc")
        .agg((F.sum(F.col("c") * F.col("w")) / 1e6).alias("s"))
    )
    got = {r["doc"]: r["s"] for r in sc.collect()}
    want = {k: v for k, v in _dsir_reference(_ROWS, _TARGET, 256).items() if v is not None}
    assert got == want


def test_dsir_feature_counts_are_collapsed_per_doc(spark):
    df = spark.createDataFrame([(0, "x y x y x y")], "id bigint, text string")
    rows = dsir_feature_table(df, "id", "text", n_buckets=1024).collect()
    # grams: "x y" x3, "y x" x2 -> exactly two (b, c) rows
    assert sorted(r["c"] for r in rows) == [2, 3]


# ---------------------------------------------------------------------------
# gumbel_topk resampling
# ---------------------------------------------------------------------------

import pytest

from datacurator_jl_spark.operators.dsir import gumbel_topk


def _scored_df(spark, n=200):
    rows = [(i, float(i % 10)) for i in range(n)] + [(n, None)]
    return spark.createDataFrame(rows, "id bigint, s double")


def test_gumbel_topk_deterministic_and_partition_stable(spark):
    df = _scored_df(spark)
    a = {r["id"] for r in gumbel_topk(df, "s", 50, "id").collect()}
    b = {r["id"] for r in gumbel_topk(df.repartition(7), "s", 50, "id").collect()}
    assert a == b and len(a) == 50
    c = {r["id"] for r in gumbel_topk(df, "s", 50, "id", salt="v2").collect()}
    assert a != c  # a different salt draws an independent sample


def test_gumbel_topk_excludes_null_scores_and_bounds_k(spark):
    df = _scored_df(spark, n=30)
    out = gumbel_topk(df, "s", 1000, "id").collect()
    assert len(out) == 30 and all(r["id"] != 30 for r in out)


def test_gumbel_low_temperature_degenerates_to_topk(spark):
    # score gaps (>=1) dwarf the Gumbel noise range (~25 nats) once
    # divided by temperature=1e-3 -> selection == plain top-k by score
    rows = [(i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, s double")
    got = {
        r["id"] for r in gumbel_topk(df, "s", 10, "id", temperature=1e-3).collect()
    }
    assert got == set(range(90, 100))


def test_gumbel_equal_scores_sample_is_not_an_id_prefix(spark):
    rows = [(i, 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id bigint, s double")
    got = {r["id"] for r in gumbel_topk(df, "s", 20, "id").collect()}
    assert got != set(range(20))  # hash noise, not id order, decides


def test_gumbel_validation(spark):
    df = _scored_df(spark, n=5)
    with pytest.raises(ValueError, match="k must"):
        gumbel_topk(df, "s", 0, "id")
    with pytest.raises(ValueError, match="temperature"):
        gumbel_topk(df, "s", 3, "id", temperature=0.0)
