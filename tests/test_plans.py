"""Plan-shape regression tests: the physical plans the engine is DESIGNED
to produce (SURVEY.md §4). These fail if a future change silently
introduces a shuffle into the rule pass, un-prunes a scan, or drops a
broadcast."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacurator_jl_spark.engine import Pipeline
from datacurator_jl_spark.queries import QUERIES


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_pipeline_is_shuffle_free(docs_df, flagship_spec):
    plan = _phys(Pipeline(flagship_spec).apply(docs_df).df)
    assert "Exchange" not in plan  # pure narrow projection
    assert "ArrowEvalPython" in plan  # the vectorized stats stage


def test_flagship_projections_are_codegen(docs_df, flagship_spec):
    plan = _phys(Pipeline(flagship_spec).apply(docs_df).df)
    # '*(n)' prefixes mark whole-stage-codegen'd operators; the decision
    # projection (the hot path) must be compiled, not interpreted
    assert "*(1) Project" in plan


def test_projection_prunes_scan(spark):
    plan = _phys(QUERIES["q05_extract_columns"](spark, "/root/testdata/sf0.001"))
    read = plan[plan.index("ReadSchema"):][:200]
    assert "p_partkey" in read and "p_name" not in read


def test_filter_pushdown_reaches_scan(spark):
    plan = _phys(QUERIES["q02_between_strict"](spark, "/root/testdata/sf0.001"))
    assert "PushedFilters: [" in plan
    assert "GreaterThan(l_quantity,10.0)" in plan


def test_star_join_broadcasts_dims(spark):
    plan = _phys(QUERIES["q13_star_join"](spark, "/root/testdata/sf0.001"))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_lineage_is_single_aggregate(docs_df, flagship_spec):
    plan = _phys(Pipeline(flagship_spec).apply(docs_df).lineage())
    # one partial + one final hash aggregate around a single exchange
    assert plan.count("Exchange") == 1
    assert "HashAggregate" in plan


def test_minhash_arrow_udf_evaluated_once(spark):
    """The k minhash lanes fan out from ONE pre-projected struct: exactly
    one ArrowEvalPython node in the plan (CollapseProject must not inline
    the non-cheap UDF alias k times)."""
    from datacurator_jl_spark.operators.dedup import minhash_signature

    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    plan = (
        minhash_signature(df, "text", k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1


def test_bucketed_join_has_no_shuffle(spark, docs_df, tmp_path):
    """Two tables bucketed on the join key join with ZERO Exchange —
    the co-location contract write_bucketed exists for."""
    from datacurator_jl_spark.sources.tables import write_bucketed

    left = docs_df.select("url", "text")
    right = docs_df.select("url", F.length("text").alias("n"))
    write_bucketed(left, "t_bleft", "url", num_buckets=8)
    write_bucketed(right, "t_bright", "url", num_buckets=8)
    # disable broadcast so the planner exercises the big-big (SMJ) path —
    # the regime bucketing exists for; tiny test tables would otherwise
    # broadcast and bypass bucket co-location entirely
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_bleft").join(spark.table("t_bright"), "url")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == docs_df.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_classifier_is_single_arrow_stage_no_shuffle(spark):
    """One scoring projection = one ArrowEvalPython, no shuffle. (A
    filter referencing the UDF output would re-extract the UDF into a
    second stage — which is why the ENGINE pre-projects `_dc_cls`; see
    the companion test.)"""
    from datacurator_jl_spark.functions.classifier import linear_score_arrow

    df = spark.createDataFrame([("a b c",)], "text string")
    out = df.select(linear_score_arrow(F.col("text")).alias("s"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan


def test_engine_classifier_rules_share_one_arrow_stage(spark):
    """TWO classifier rules read the single struct-wrapped pre-projected
    `_dc_cls` column: exactly one ArrowEvalPython in the decision-frame
    plan, and `_dc_cls` is not in the output. (Filtering res.df on
    dc_kept re-extracts the UDF into the pushed-down filter — which is
    why write_outputs persists res.df ONCE and filters from disk.)"""
    from datacurator_jl_spark.engine import Pipeline
    from datacurator_jl_spark.recipe import parse_recipe

    spec = parse_recipe(
        {
            "global": {"act_on_success": True},
            "any": {
                "conditions": [
                    ["classifier_score_below", -0.5],
                    ["classifier_score_above", -0.5],
                ],
                "actions": ["drop", "keep"],
            },
        }
    )
    df = spark.createDataFrame([("u1", "some words here")], "url string, text string")
    out = Pipeline(spec).apply(df).df
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "_dc_cls" not in out.columns


def test_blocklist_isin_pushes_to_scan(spark, tmp_path):
    """The inline blocklist compiles to a scan-pushable In/Not filter —
    blocked domains are skipped at the parquet reader, not post-scan."""
    from datacurator_jl_spark.operators.dataframe_ops import blocklist_filter

    p = str(tmp_path / "d.parquet")
    spark.createDataFrame(
        [("a.com", 1), ("b.com", 2)], "domain string, v int"
    ).write.parquet(p)
    out = blocklist_filter(spark.read.parquet(p), "domain", ["a.com", "c.com"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Or(IsNull(domain),Not(In(domain" in plan, plan


def test_html_extract_is_one_projection_no_shuffle(spark):
    """d46's extraction chain (script/style/tag strip + numeric+named
    entity unescape + whitespace collapse) must stay ONE projection with
    no Exchange and no Python/Arrow stage. Since round 6 the general
    numeric-reference pass uses one transform() HOF (CodegenFallback),
    so the full chain is an interpreted Project — acceptable for a
    content-LOADING stage; `numeric_entities=False` must still compile
    to the round-5 pure whole-stage-codegen plan (pinned below so the
    fast path stays available)."""
    from pyspark.sql import functions as F

    from datacurator_jl_spark.multimodal.binary import extract_html_text
    from datacurator_jl_spark.queries import QUERIES

    plan = _phys(QUERIES["d46_html_extract"](spark, "/root/testdata/sf0.001"))
    # round-7: the loader's small-scan spread adds ONE round-robin
    # exchange below the projection (deliberate scan parallelization,
    # not an operator shuffle — sources/tables._spread_small_scan);
    # the operator itself must still induce no hash/range exchange
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "EvalPython" not in plan, plan  # neither Batch- nor ArrowEval
    assert "Project" in plan, plan

    df = spark.createDataFrame([("<p>x</p>",)], "html string")
    fast = _phys(df.select(extract_html_text(F.col("html"), numeric_entities=False)))
    assert "*(1) Project" in fast, fast


def test_token_count_seam_default_adds_no_python_stage(spark, monkeypatch):
    """DC_TOKENIZER unset -> token_count_column IS the native expression:
    the d45 plan has no Python stage. Configured -> exactly one
    ArrowEvalPython appears (the worker-cached tokenizer UDF)."""
    import json

    from datacurator_jl_spark.functions.tokenizer import token_count_column

    df = spark.createDataFrame([("a", "x y z")], "doc_id string, text string")
    monkeypatch.delenv("DC_TOKENIZER", raising=False)
    native = _phys(df.select(token_count_column(F.col("text")).alias("t")))
    assert "EvalPython" not in native, native

    vocab = "/tmp/dc_plan_vocab.json"
    with open(vocab, "w") as fh:
        json.dump({"vocab": ["x"]}, fh)
    monkeypatch.setenv("DC_TOKENIZER", vocab)
    seamed = _phys(df.select(token_count_column(F.col("text")).alias("t")))
    assert seamed.count("ArrowEvalPython") == 1, seamed


def test_drop_exact_dupes_is_agg_semijoin_no_window(spark):
    """The [global] dedup="exact" hot path (d11, d38, d39) must compile
    to a payload-free partial+final hash aggregate (winners) plus a
    LEFT SEMI join on the per-row-unique (hash, id) key — 10⁹ copies of
    one page reduce map-side and the payload shuffle stays uniform —
    never a per-content-hash Window sort (round-6 fix, VERDICT r5
    "wrong #1")."""
    from datacurator_jl_spark.operators.dedup import drop_exact_dupes

    df = spark.createDataFrame(
        [(1, "a", "x")], "doc_id int, text string, meta string"
    )
    plan = _phys(drop_exact_dupes(df, "doc_id", "text"))
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan  # map-side combine of winners
    assert "LeftSemi" in plan, plan


def test_latest_version_is_single_aggregate_no_window(spark):
    """d47's argmax must compile to one partial+final hash aggregate
    (versions of a hot key reduce map-side), never a per-key Window sort."""
    from datacurator_jl_spark.operators.dataframe_ops import latest_version

    df = spark.createDataFrame(
        [("u", "t", None, 1, 1.0)],
        "user_id string, event_type string, ts timestamp, event_id int, value double",
    )
    plan = _phys(latest_version(df, ["user_id", "event_type"], "ts", "event_id"))
    assert "Window" not in plan, plan
    assert plan.count("Exchange") == 1, plan
    assert plan.count("HashAggregate") == 2 or plan.count("SortAggregate") == 2, plan


def test_winnow_extraction_single_arrow_no_shuffle(spark):
    """d51 plan contract: fingerprint extraction is ONE ArrowEvalPython
    stage and no Exchange (projection + generate only — the corpus
    never shuffles to get fingerprinted)."""
    plan = _phys(QUERIES["d51_winnow_fingerprints"](spark, "/root/testdata/sf0.001"))
    assert plan.count("ArrowEvalPython") == 1, plan
    # round-7: the loader's small-scan spread adds one round-robin
    # exchange below the Arrow stage (scan parallelization, not an
    # operator shuffle); the operator itself must add no hash/range one
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_winnow_pairs_no_cartesian_no_window(spark):
    """d52 plan contract: the pair join is an fp equi-join (hash or
    sort-merge), never a cartesian product, and the over-cap guard is
    the groupBy+semi-join shape (no Window node)."""
    plan = _phys(QUERIES["d52_winnow_shared_passages"](spark, "/root/testdata/sf0.001"))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert "Window" not in plan, plan


def test_dsir_plan_broadcast_model_no_window(spark):
    """d53 plan contract: the model rides as a broadcast (hash join on
    the bucket key), the per-doc sum is an aggregate — no window
    function, no corpus self-join."""
    plan = _phys(QUERIES["d53_dsir_weights"](spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_sequence_pack_window_is_partition_bounded(spark):
    """d54 plan contract: the running sum is partitioned by the pinned
    range-exchange partition id — never a single global window (the
    TeraSort shape, as token_budget_sample)."""
    plan = _phys(QUERIES["d54_sequence_pack"](spark, "/root/testdata/sf0.001"))
    assert "windowspecdefinition(_pid" in plan, plan


def test_incremental_exact_no_window_and_semi_anti_joins(spark):
    """d55 plan contract: winners agg + semi join on the id, base side
    pruned then anti-joined — no Window, no cartesian."""
    plan = _phys(QUERIES["d55_incremental_exact"](spark, "/root/testdata/sf0.001"))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert "LeftAnti" in plan, plan


def test_gumbel_resample_is_take_ordered(spark):
    """d56 plan contract: the top-k is TakeOrderedAndProject
    (per-partition heaps), never a global Sort + Limit."""
    plan = _phys(QUERIES["d56_gumbel_resample"](spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in plan, plan


def test_semdedup_no_window_broadcast_centroids(spark):
    """e08 plan contract: centroid join is a broadcast, the pair join is
    a cluster equi-join, losers anti-join by id — no window."""
    plan = _phys(QUERIES["e08_semdedup_survivors"](spark, "/root/testdata/sf0.001"))
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bm25_is_take_ordered_no_window(spark):
    """d57 plan contract: top-k is TakeOrderedAndProject (per-partition
    heaps, k rows cross the wire), df/stats sides broadcast, and no
    window / cartesian anywhere (the 1-row stats crossJoin is a
    broadcast nested loop, which is the cheap intended shape)."""
    plan = _phys(QUERIES["d57_bm25_topk"](spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kmeans_assign_no_corpus_window_broadcast_centroids(spark):
    """e09 plan contract: assignment is a broadcast (k-row centroid
    side) + min(struct) argmax — the corpus side never windows or
    cartesian-joins. (kmeans_fit's k-row init window is materialized
    away inside fit; the assign lineage must stay window-free.)"""
    from datacurator_jl_spark.operators.similarity import (
        kmeans_assign, kmeans_fit,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = kmeans_fit(emb, k=4, iters=1)
    plan = _phys(kmeans_assign(emb, cents))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Broadcast" in plan, plan


def test_lr_scores_broadcast_weights_no_window(spark):
    """d58 plan contract: scoring joins the (≤ n_buckets)-row weight
    table as a broadcast and aggregates per doc — no window, no
    cartesian anywhere in the served-score plan."""
    plan = _phys(
        QUERIES["d58_distill_classifier"](spark, "/root/testdata/sf0.001")
    )
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_lm_xent_broadcast_model_no_window(spark):
    """d60 plan contract: both count tables join as broadcasts; one
    partial-combinable per-doc aggregate; no window, no cartesian."""
    plan = _phys(QUERIES["d60_lm_xent"](spark, "/root/testdata/sf0.001"))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_mixture_plans_no_cartesian_broadcast_offsets(spark):
    """d61/d62 plan contract: no cartesian anywhere; d62's offsets join
    is a broadcast and its windows are (partition, group)-bounded —
    never a plain per-group window over the raw corpus."""
    p61 = _phys(QUERIES["d61_mixture_sample"](spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in p61, p61
    p62 = _phys(QUERIES["d62_mixture_tokens"](spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in p62, p62
    assert "BroadcastHashJoin" in p62, p62
    assert "_pid" in p62, p62  # windows keyed on the pinned partition id


def test_constant_cap_skips_group_count_join(spark):
    """round-7 (VERDICT r6 #1) plan contract: the constant-cap path of
    the salted rank cap never builds the per-group count table — no
    count aggregate, no join, no broadcast of ~|groups| rows (at web
    scale the group is the URL host, so that broadcast is an OOM). The
    plan is two windows + filters over the corpus, nothing else. The
    alpha/fraction paths still need ``_n`` (d27 pins that separately
    below)."""
    from datacurator_jl_spark.operators.sampling import group_cap_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], "doc_id long, source string"
    )
    plan = _phys(group_cap_sample(df, "source", "doc_id", cap=5))
    assert "Join" not in plan, plan
    assert "count(1)" not in plan, plan
    # the variable-target path keeps the count join (it references _n)
    alpha_plan = _phys(
        QUERIES["d27_domain_cap"](spark, "/root/testdata/sf0.001")
    )
    assert "count(1)" in alpha_plan, alpha_plan


def test_mixture_sample_skips_group_count_join(spark):
    """d61's per-group quota is a CASE over the group value — no _n
    reference, so the group-count aggregate + join must be absent."""
    plan = _phys(QUERIES["d61_mixture_sample"](spark, "/root/testdata/sf0.001"))
    assert "Join" not in plan, plan
    assert "count(1)" not in plan, plan
