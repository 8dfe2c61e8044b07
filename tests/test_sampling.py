"""Deterministic selection ops (operators/sampling.py): exact stratified
per-group sampling and token-budget prefix selection — pinned semantics,
python-reference identity, determinism, plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datacurator_jl_spark.operators.sampling import (
    stratified_hash_sample,
    token_budget_sample,
)


@pytest.fixture()
def grouped_df(spark):
    rows = [(f"d{i:03d}", f"g{i % 3}") for i in range(100)]
    return spark.createDataFrame(rows, "id string, grp string")


def test_stratified_exact_counts(grouped_df):
    # groups: g0 34 rows, g1/g2 33 rows
    out = stratified_hash_sample(grouped_df, "grp", "id", 0.2)
    got = {r["grp"]: r["cnt"] for r in out.groupBy("grp").agg(F.count("*").alias("cnt")).collect()}
    assert got == {"g0": math.ceil(0.2 * 34), "g1": 7, "g2": 7}


def test_stratified_deterministic_and_restart_stable(grouped_df):
    a = {r["id"] for r in stratified_hash_sample(grouped_df, "grp", "id", 0.3).collect()}
    b = {
        r["id"]
        for r in stratified_hash_sample(
            grouped_df.repartition(7), "grp", "id", 0.3
        ).collect()
    }
    assert a == b and len(a) > 0
    # a different salt selects a different subcorpus
    c = {r["id"] for r in stratified_hash_sample(grouped_df, "grp", "id", 0.3, salt="v2").collect()}
    assert a != c


def test_stratified_edges(grouped_df):
    assert stratified_hash_sample(grouped_df, "grp", "id", 0.0).count() == 0
    assert stratified_hash_sample(grouped_df, "grp", "id", 1.0).count() == 100
    with pytest.raises(ValueError, match="fraction"):
        stratified_hash_sample(grouped_df, "grp", "id", 1.5)


def _budget_reference(rows, budget):
    """Sequential greedy reference: rows = [(id, score, weight)]."""
    order = sorted(rows, key=lambda r: (-(r[1] if r[1] is not None else float("-inf")), r[0]))
    # nulls last under desc: sort key above puts None at the end
    out, cum = [], 0
    for rid, _s, wgt in order:
        cum += wgt or 0
        if cum <= budget:
            out.append(rid)
    return set(out)


def test_token_budget_matches_sequential_reference(spark):
    rows = [
        ("a", 10, 5), ("b", 10, 5), ("c", 9, 100), ("d", 8, 3),
        ("e", None, 1), ("f", 7, None), ("g", 7, 2),
    ]
    df = spark.createDataFrame(rows, "id string, score int, w int")
    for budget in (0, 5, 10, 13, 113, 1000):
        got = {
            r["id"]
            for r in token_budget_sample(
                df, "w", budget, order_by="score", id_col="id"
            ).collect()
        }
        assert got == _budget_reference(rows, budget), f"budget={budget}"


def test_token_budget_boundary_inclusive(spark):
    df = spark.createDataFrame(
        [("a", 3, 10), ("b", 2, 10), ("c", 1, 10)], "id string, score int, w int"
    )
    got = {
        r["id"]
        for r in token_budget_sample(df, "w", 20, "score", "id").collect()
    }
    assert got == {"a", "b"}  # cum of b is exactly 20 -> admitted


def test_token_budget_stable_under_input_partitioning(spark):
    rows = [(f"d{i:03d}", (i * 37) % 50, (i % 7) + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "id string, score int, w int")
    a = {r["id"] for r in token_budget_sample(df, "w", 200, "score", "id").collect()}
    b = {
        r["id"]
        for r in token_budget_sample(
            df.repartition(11), "w", 200, "score", "id"
        ).collect()
    }
    assert a == b == _budget_reference(rows, 200)


def test_token_budget_reliable_materialize(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    df = spark.createDataFrame(
        [("a", 2, 5), ("b", 1, 5)], "id string, score int, w int"
    )
    got = {
        r["id"]
        for r in token_budget_sample(
            df, "w", 5, "score", "id", materialize="reliable"
        ).collect()
    }
    assert got == {"a"}


def test_token_budget_rejects_parquet_materialize(spark):
    df = spark.createDataFrame([("a", 1, 1)], "id string, score int, w int")
    with pytest.raises(ValueError, match="materialize"):
        token_budget_sample(df, "w", 10, "score", "id", materialize="/tmp/x")


def test_token_budget_plan_never_single_partition(spark):
    """The global order comes from a distributed range exchange before the
    checkpoint (which truncates the visible lineage to ExistingRDD); what
    the FINAL plan must show is that no stage collapses to one partition
    and the running-sum window is partitioned by the pinned partition id."""
    df = spark.createDataFrame(
        [(f"d{i}", i, 1) for i in range(50)], "id string, score int, w int"
    )
    out = token_budget_sample(df, "w", 10, "score", "id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "Window" in plan and "[_pid" in plan
    # and the pre-checkpoint exchange really is a range partitioning
    pre = (
        df.repartitionByRange(8, F.col("score").desc_nulls_last(), F.col("id"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" in pre.lower()

# ---- group_cap_sample (per-domain cap / concave rebalancing) ----

from datacurator_jl_spark.operators.sampling import group_cap_sample  # noqa: E402


def test_group_cap_constant(grouped_df):
    out = group_cap_sample(grouped_df, "grp", "id", cap=5)
    got = {r["grp"]: r["c"] for r in out.groupBy("grp").agg(F.count("*").alias("c")).collect()}
    assert got == {"g0": 5, "g1": 5, "g2": 5}
    # cap above the group size keeps everything
    assert group_cap_sample(grouped_df, "grp", "id", cap=1000).count() == 100
    assert group_cap_sample(grouped_df, "grp", "id", cap=0).count() == 0


def test_group_cap_concave(spark):
    # group sizes 4, 100 -> targets ceil(2*sqrt(n)) = 4, 20:
    # the tail group is kept whole, the head compressed 5x
    rows = [(f"a{i}", "tail") for i in range(4)] + [
        (f"b{i}", "head") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "id string, grp string")
    out = group_cap_sample(df, "grp", "id", alpha=0.5, scale=2.0)
    got = {r["grp"]: r["c"] for r in out.groupBy("grp").agg(F.count("*").alias("c")).collect()}
    assert got == {"tail": 4, "head": 20}


def test_group_cap_deterministic(grouped_df):
    a = {r["id"] for r in group_cap_sample(grouped_df, "grp", "id", cap=7).collect()}
    b = {
        r["id"]
        for r in group_cap_sample(
            grouped_df.repartition(9), "grp", "id", cap=7
        ).collect()
    }
    assert a == b and len(a) == 21
    # the capped set is a PREFIX of the stratified hash order: the same
    # salt selects nested subcorpora as the cap grows
    c = {r["id"] for r in group_cap_sample(grouped_df, "grp", "id", cap=3).collect()}
    assert c < a


def test_group_cap_validation(grouped_df):
    with pytest.raises(ValueError, match="exactly one"):
        group_cap_sample(grouped_df, "grp", "id")
    with pytest.raises(ValueError, match="exactly one"):
        group_cap_sample(grouped_df, "grp", "id", cap=3, alpha=0.5)
    with pytest.raises(ValueError, match="cap"):
        group_cap_sample(grouped_df, "grp", "id", cap=-1)
    with pytest.raises(ValueError, match="alpha"):
        group_cap_sample(grouped_df, "grp", "id", alpha=1.5)


# ---- top_fraction (exact global top-k by fraction) ----

from datacurator_jl_spark.operators.sampling import top_fraction  # noqa: E402


def test_top_fraction_exact_count_and_members(spark):
    rows = [(f"d{i:03d}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "id string, score int")
    got = {r["id"] for r in top_fraction(df, "score", 0.25, "id").collect()}
    assert got == {f"d{i:03d}" for i in range(75, 100)}  # top 25 scores
    asc = {
        r["id"]
        for r in top_fraction(df, "score", 0.1, "id", descending=False).collect()
    }
    assert asc == {f"d{i:03d}" for i in range(10)}


def test_top_fraction_edges(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "id string, score int")
    assert top_fraction(df, "score", 0.0, "id").count() == 0
    assert top_fraction(df, "score", 1.0, "id").count() == 2
    # ceil: 0.01 of 2 rows -> 1 row (the max score)
    one = top_fraction(df, "score", 0.01, "id").collect()
    assert [r["id"] for r in one] == ["b"]
    with pytest.raises(ValueError, match="fraction"):
        top_fraction(df, "score", -0.5, "id")


def test_top_fraction_tie_break_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", 5), ("b", 5), ("c", None), ("d", 1)], "id string, score int"
    )
    # ceil(0.5*4)=2: both fives, tie broken by id; null scores last
    got = {r["id"] for r in top_fraction(df, "score", 0.5, "id").collect()}
    assert got == {"a", "b"}


def test_null_group_rows_survive(spark):
    """NULL is a group like any other: fraction=1.0 / a generous cap
    must return EVERY row, including null-group ones (regression: the
    count equi-join silently dropped them)."""
    rows = [("a", "g1"), ("b", None), ("c", None), ("d", "g1")]
    df = spark.createDataFrame(rows, "id string, grp string")
    assert stratified_hash_sample(df, "grp", "id", 1.0).count() == 4
    assert group_cap_sample(df, "grp", "id", cap=10).count() == 4
    # and the null group is CAPPED like any other
    got = {r["id"] for r in group_cap_sample(df, "grp", "id", cap=1).collect()}
    assert len(got) == 2  # one per group (g1, NULL)
    half = stratified_hash_sample(df, "grp", "id", 0.5)
    assert half.count() == 2  # ceil(0.5*2) from each of the two groups


# -- quantile_buckets (CCNet head/middle/tail) -------------------------------


def test_quantile_buckets_exact_semantics(spark):
    """Hand-computed thirds within one group: 6 scores 1..6 -> p33
    interpolates to 2.6667ish, p66 to 4.3333ish; strict-< buckets give
    {1,2}=head, {3,4}=middle, {5,6}=tail. NULL score, NULL group, and a
    group with no scored rows all yield NULL buckets."""
    from datacurator_jl_spark.operators.sampling import quantile_buckets

    rows = [(i, "en", float(i)) for i in range(1, 7)] + [
        (7, "en", None),        # null score -> null bucket
        (8, None, 3.0),         # null group -> null bucket
        (9, "xx", None),        # group with zero scored rows -> null
        (10, "de", 1.0),        # singleton group: thresholds = 1.0,
    ]                           # score < 1.0 false twice -> tail
    df = spark.createDataFrame(rows, "doc_id int, lang string, score double")
    out = {
        r["doc_id"]: r["bucket"]
        for r in quantile_buckets(df, "score", "lang", exact=True).collect()
    }
    assert out == {
        1: "head", 2: "head", 3: "middle", 4: "middle", 5: "tail", 6: "tail",
        7: None, 8: None, 9: None, 10: "tail",
    }


def test_quantile_buckets_validation_and_approx(spark):
    from datacurator_jl_spark.operators.sampling import quantile_buckets

    df = spark.createDataFrame(
        [(i, "en", float(i)) for i in range(20)],
        "doc_id int, lang string, score double",
    )
    with pytest.raises(ValueError, match="labels"):
        quantile_buckets(df, "score", "lang", qs=(0.5,), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="ascending"):
        quantile_buckets(df, "score", "lang", qs=(0.9, 0.1))
    # the scale path: approx thresholds are DATA values (t-digest), so
    # buckets may differ at the boundary but must still partition the
    # group monotonically: every head score < every middle < every tail
    out = quantile_buckets(df, "score", "lang", exact=False).collect()
    by = {"head": [], "middle": [], "tail": []}
    for r in out:
        by[r["bucket"]].append(r["score"])
    assert by["head"] and by["middle"] and by["tail"]
    assert max(by["head"]) < min(by["middle"]) <= max(by["middle"]) < min(by["tail"])


def test_quantile_buckets_plan_is_broadcast_no_window(spark):
    """The plan contract: one aggregate + broadcast join-back — no
    Window node, no sort of the corpus, threshold side broadcast."""
    from datacurator_jl_spark.operators.sampling import quantile_buckets

    df = spark.createDataFrame(
        [(i, "en", float(i)) for i in range(10)],
        "doc_id int, lang string, score double",
    )
    plan = (
        quantile_buckets(df, "score", "lang", exact=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan


# ---------------------------------------------------------------------------
# sequence_pack (round 6)
# ---------------------------------------------------------------------------

import hashlib

from datacurator_jl_spark.operators.sampling import sequence_pack


def _pack_reference(rows, L, salt="corpus_v1"):
    """Sequential mirror: rows = [(id, w)] -> id -> (start, b0, b1)."""

    def h(i):
        return int(
            hashlib.md5((str(i) + "#" + salt).encode()).hexdigest()[:8], 16
        )

    out, cum = {}, 0
    for rid, wgt in sorted(rows, key=lambda r: (h(r[0]), r[0])):
        wgt = wgt or 0
        start = cum
        cum += wgt
        out[rid] = (start, start // L, max(cum - 1, start) // L)
    return out


_PACK_ROWS = [(i, [5, 130, 0, None, 17, 64][i % 6]) for i in range(100)]


def test_sequence_pack_matches_sequential_reference(spark):
    df = spark.createDataFrame(_PACK_ROWS, "id bigint, w int")
    got = {
        r["id"]: (r["start_off"], r["bin_start"], r["bin_end"])
        for r in sequence_pack(df, "w", 128, "id").collect()
    }
    assert got == _pack_reference(_PACK_ROWS, 128)


def test_sequence_pack_stable_under_partitioning(spark):
    df = spark.createDataFrame(_PACK_ROWS, "id bigint, w int")
    base = {
        tuple(r) for r in sequence_pack(df, "w", 64, "id").select(
            "id", "start_off", "bin_start", "bin_end").collect()
    }
    repart = {
        tuple(r) for r in sequence_pack(df.repartition(13), "w", 64, "id").select(
            "id", "start_off", "bin_start", "bin_end").collect()
    }
    assert base == repart
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        few = {
            tuple(r) for r in sequence_pack(df, "w", 64, "id").select(
                "id", "start_off", "bin_start", "bin_end").collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == few


def test_sequence_pack_zero_and_null_weights(spark):
    df = spark.createDataFrame([(1, 0), (2, None), (3, 10)], "id bigint, w int")
    rows = {r["id"]: r for r in sequence_pack(df, "w", 4, "id").collect()}
    for rid in (1, 2):  # zero-extent docs occupy a single (start) bin
        assert rows[rid]["bin_end"] == rows[rid]["bin_start"]
    r3 = rows[3]
    assert r3["bin_end"] == (r3["start_off"] + 10 - 1) // 4


def test_sequence_pack_validation(spark):
    df = spark.createDataFrame([(1, 1)], "id bigint, w int")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="seq_len"):
        sequence_pack(df, "w", 0, "id")
    with _pytest.raises(ValueError, match="materialize"):
        sequence_pack(df, "w", 8, "id", materialize="parquet")


# -- mixture_sample (d61) -------------------------------------------------------


def test_mixture_sample_quotas_and_shortfall(spark):
    from datacurator_jl_spark.operators.sampling import mixture_sample

    rows = (
        [(f"a{i}", "A") for i in range(30)]
        + [(f"b{i}", "B") for i in range(30)]
        + [(f"c{i}", "C") for i in range(4)]  # smaller than its quota
        + [(f"x{i}", "X") for i in range(10)]  # unweighted -> excluded
        + [(f"n{i}", None) for i in range(5)]  # NULL group -> excluded
    )
    df = spark.createDataFrame(rows, "key string, grp string")
    out = mixture_sample(
        df, "grp", "key", {"A": 2.0, "B": 1.0, "C": 1.0}, 20
    )
    shares = {
        r.grp: r.n for r in out.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    # quotas: A 10, B 5, C 5 -> C has only 4 (shortfall reported, not
    # refilled); X and NULL never appear
    assert shares == {"A": 10, "B": 5, "C": 4}
    # deterministic + salt_parts-invariant row set
    k1 = {r.key for r in out.collect()}
    k2 = {
        r.key
        for r in mixture_sample(
            df.repartition(7), "grp", "key",
            {"A": 2.0, "B": 1.0, "C": 1.0}, 20, salt_parts=4,
        ).collect()
    }
    assert k1 == k2


def test_mixture_sample_validation(spark):
    import pytest as _pytest

    from datacurator_jl_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame([("k", "A")], "key string, grp string")
    with _pytest.raises(ValueError, match=">= 1 weighted group"):
        mixture_sample(df, "grp", "key", {}, 10)
    with _pytest.raises(ValueError, match="non-negative"):
        mixture_sample(df, "grp", "key", {"A": -1.0}, 10)
    with _pytest.raises(ValueError, match="sum to > 0"):
        mixture_sample(df, "grp", "key", {"A": 0.0}, 10)
    with _pytest.raises(ValueError, match="n_total"):
        mixture_sample(df, "grp", "key", {"A": 1.0}, -1)
    # all-zero quotas (n_total=0) -> empty frame, no error
    assert mixture_sample(df, "grp", "key", {"A": 1.0}, 0).count() == 0


def test_mixture_token_sample_matches_sequential_reference(spark):
    from datacurator_jl_spark.operators.dedup import _round_away
    from datacurator_jl_spark.operators.sampling import mixture_token_sample

    import hashlib

    def h(k, salt="mix_v1"):
        return int(hashlib.md5(f"{k}#{salt}".encode()).hexdigest()[:8], 16)

    rows = (
        [(f"a{i}", "A", 7 + i % 5) for i in range(40)]
        + [(f"b{i}", "B", 3 + i % 9) for i in range(40)]
        + [(f"x{i}", "X", 10) for i in range(10)]  # unweighted
        + [("anull", "A", None)]  # null weight counts 0
    )
    df = spark.createDataFrame(rows, "key string, grp string, w int")
    weights, total = {"A": 3.0, "B": 1.0}, 200
    out = {
        r.key
        for r in mixture_token_sample(
            df, "grp", "key", "w", weights, total
        ).collect()
    }
    # sequential per-group greedy prefix in (hash, key) order
    budgets = {
        g: _round_away(wt / 4.0 * total) for g, wt in weights.items()
    }
    ref = set()
    for g in weights:
        cum = 0
        for k, _g, w in sorted(
            (r for r in rows if r[1] == g), key=lambda r: (h(r[0]), r[0])
        ):
            cum += w or 0
            if cum <= budgets[g]:
                ref.add(k)
            else:
                break
    assert out == ref
    # partitioning / shuffle-partitions must not change the row set
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        out7 = {
            r.key
            for r in mixture_token_sample(
                df.repartition(5), "grp", "key", "w", weights, total
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert out7 == out
