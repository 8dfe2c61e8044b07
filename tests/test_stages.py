"""Model-stage plumbing tests (plans/stages.py): lazy per-worker init,
Arrow batching, cheap-first ordering, prefilter pushdown."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacurator_jl_spark.plans.stages import (
    StagePlanner,
    langid_stage,
    perplexity_stage,
)


def test_stage_planner_appends_model_columns(spark, docs_df):
    planner = StagePlanner().add(perplexity_stage()).add(langid_stage())
    out = planner.apply(docs_df.select("url", "text").limit(50))
    assert set(out.columns) == {"url", "text", "lang_pred", "lang_conf", "ppl"}
    rows = out.collect()
    assert len(rows) == 50
    assert all(r.ppl is not None for r in rows)
    assert all(r.lang_pred in ("en", "de", "fr", "es", "it", "und") for r in rows)


def test_stages_apply_cheap_first(spark, docs_df):
    planner = StagePlanner().add(perplexity_stage(cost=5.0)).add(langid_stage(cost=1.0))
    out = planner.apply(docs_df.select("url", "text").limit(5))
    # langid (cheaper) runs first, so its columns appear before ppl
    cols = out.columns
    assert cols.index("lang_pred") < cols.index("ppl")


def test_prefilter_drops_rows_before_model(spark, docs_df):
    stage = langid_stage()
    stage.prefilter = F.length("text") > 100
    out = StagePlanner().add(stage).apply(docs_df.select("url", "text"))
    n_expected = docs_df.filter(F.length("text") > 100).count()
    assert out.count() == n_expected


def test_fake_models_deterministic(spark, docs_df):
    planner = StagePlanner().add(perplexity_stage())
    df = docs_df.select("url", "text").limit(20)
    a = {r.url: r.ppl for r in planner.apply(df).collect()}
    b = {r.url: r.ppl for r in planner.apply(df).collect()}
    assert a == b


def test_python_bridge_condition(spark, docs_df, tmp_path):
    """Reference lookup/decode_python parity: ['python', 'mod.fn', args]
    resolves eagerly and runs as an Arrow-batched predicate."""
    import sys

    mod = tmp_path / "user_preds.py"
    mod.write_text(
        "def has_marker(texts, marker='XYZ'):\n"
        "    return texts.fillna('').str.contains(marker, regex=False)\n"
    )
    sys.path.insert(0, str(tmp_path))
    # ship the user module to python workers (prod: spark-submit --py-files)
    spark.sparkContext.addPyFile(str(mod))
    from datacurator_jl_spark.engine import Pipeline
    from datacurator_jl_spark.recipe import RecipeError, parse_recipe
    import pytest as _pytest

    spec = parse_recipe(
        {
            "global": {"act_on_success": True},
            "any": {
                "conditions": [["python", "user_preds.has_marker", "fox"]],
                "actions": ["keep"],
                "counter_actions": ["drop"],
            },
        }
    )
    res = Pipeline(spec).apply(docs_df.select("url", "text").limit(100))
    kept = res.df.filter("dc_kept").count()
    exp = docs_df.limit(100).filter(F.col("text").contains("fox")).count()
    assert kept == exp

    with _pytest.raises(RecipeError, match="cannot resolve python condition"):
        parse_recipe(
            {"any": {"conditions": [["python", "no.such_fn"]], "actions": ["keep"]}}
        )
