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


def test_langid_model_path_contract(spark, docs_df, tmp_path, monkeypatch):
    """The path-configured loader seam (round-3): DC_LANGID_MODEL (or an
    explicit model_path) activates a file-backed model; unset falls back
    to the deterministic stand-in. The fixture model votes for a language
    that does NOT exist in the stand-in's marker table, proving the file
    was actually loaded on the worker."""
    import json

    from datacurator_jl_spark.plans.stages import (
        FakeLangModel,
        JsonMarkerLangModel,
        load_langid_model,
    )

    model = tmp_path / "markers.json"
    model.write_text(json.dumps({"xx": ["zorp"], "en": ["the"]}))

    # loader resolution: stand-in without a path, fixture with one
    assert isinstance(load_langid_model(None), FakeLangModel)
    assert isinstance(load_langid_model(str(model)), JsonMarkerLangModel)
    monkeypatch.setenv("DC_LANGID_MODEL", str(model))
    assert isinstance(load_langid_model(None), JsonMarkerLangModel)

    df = spark.createDataFrame(
        [("u1", "zorp zorp zorp"), ("u2", "the cat sat")], "url string, text string"
    )
    out = {
        r.url: r.lang_pred
        for r in StagePlanner().add(langid_stage()).apply(df).collect()
    }
    assert out == {"u1": "xx", "u2": "en"}

    monkeypatch.delenv("DC_LANGID_MODEL")
    out_standin = {
        r.url: r.lang_pred
        for r in StagePlanner().add(langid_stage()).apply(df).collect()
    }
    assert out_standin["u1"] != "xx"  # stand-in has no 'zorp' marker


def test_perplexity_model_path_contract(spark, monkeypatch, tmp_path):
    import json

    import pytest

    from datacurator_jl_spark.plans.stages import load_langid_model

    model = tmp_path / "unigram.json"
    model.write_text(json.dumps({"words": {"foo": 1.0, "bar": 3.0}, "unk": 100.0}))
    monkeypatch.setenv("DC_KENLM_MODEL", str(model))
    df = spark.createDataFrame(
        [("u1", "foo bar"), ("u2", "foo nope"), ("u3", "")], "url string, text string"
    )
    out = {
        r.url: r.ppl for r in StagePlanner().add(perplexity_stage()).apply(df).collect()
    }
    assert out == {"u1": 2.0, "u2": 50.5, "u3": 1e6}
    # a non-.json path without the real lib is an explicit, early error
    with pytest.raises(RuntimeError, match="fasttext"):
        load_langid_model("/nonexistent/lid.176.bin")


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
