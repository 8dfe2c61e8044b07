"""Round-2 coverage: numeric extraction recipe surface, dict-form
transforms + write modes, table-shape assertions, general aggregator
chains, and the two §2.6 transforms added this round (mirroring the
reference tests/examples cited in each case)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from datacurator_jl_spark.engine import Pipeline
from datacurator_jl_spark.recipe import RecipeError, parse_recipe


# --- numeric extraction (reference src/DataCurator.jl:2341-2402,
#     3290-3302; input_output_lists.toml pattern) ----------------------------


def test_extract_action_and_read_conditions(spark):
    rows = [("img_001.png", "a"), ("img_12.png", "b"), ("noint.txt", "c")]
    df = spark.createDataFrame(rows, "url string, text string")
    spec = parse_recipe(
        {
            "global": {"act_on_success": True},
            "any": {
                "conditions": [["read_postfix_int", ">", 5], "read_int", "always"],
                "actions": [
                    ["extract", "read_postfix_int", "num"],
                    ["extract", "read_int"],
                    "keep",
                ],
            },
        }
    )
    out = {r.url: (r.num, r.read_int) for r in Pipeline(spec).apply(df).df.collect()}
    assert out["img_12.png"] == (12, 12)
    assert out["img_001.png"] == (None, 1)  # postfix 001 -> 1, not > 5
    assert out["noint.txt"] == (None, None)


def test_extract_validates_names():
    with pytest.raises(RecipeError):
        parse_recipe(
            {"any": {"conditions": ["always"], "actions": [["extract", "bogus"]]}}
        )


# --- dict-form transform + write modes (reference decode_function Dict,
#     src/DataCurator.jl:1893-1909; content_and_naming.toml; transform
#     wrapper modes :1328-1348) ----------------------------------------------


def _dict_spec(mode: str):
    return parse_recipe(
        {
            "global": {"act_on_success": True},
            "any": {
                "conditions": ["has_text"],
                "actions": [
                    {
                        "name_transform": ["tolowercase"],
                        "content_transform": ["normalize_whitespace"],
                        "mode": mode,
                    }
                ],
                "counter_actions": ["drop"],
            },
        }
    )


def test_dict_transform_applies_name_and_content(spark):
    df = spark.createDataFrame(
        [("HTTP://A/B.TXT", "x   y\t z"), ("u2", None)], "url string, text string"
    )
    spec = _dict_spec("copy")
    assert spec.write_mode == "copy"
    res = Pipeline(spec).apply(df)
    rows = {r.url: r for r in res.df.collect()}
    assert rows["HTTP://A/B.TXT"].url_out == "http://a/b.txt"
    assert rows["HTTP://A/B.TXT"].scrubbed_text == "x y z"
    assert rows["u2"].dc_kept is False  # null text -> counteraction drop


def test_conflicting_write_modes_rejected():
    with pytest.raises(RecipeError):
        parse_recipe(
            {
                "global": {"act_on_success": True},
                "any": {
                    "conditions": ["has_text", "always"],
                    "actions": [
                        {"content_transform": ["tolowercase"], "mode": "move"},
                        {"content_transform": ["touppercase"], "mode": "inplace"},
                    ],
                },
            }
        )


def test_write_mode_move_rewrites_source(spark, tmp_path):
    from datacurator_jl_spark.sinks import write_outputs

    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [("a", "keep me please"), ("b", None)], "url string, text string"
    ).write.parquet(src)
    spec = _dict_spec("move")
    res = Pipeline(spec).apply(spark.read.parquet(src))
    paths = write_outputs(res, str(tmp_path / "out"), input_path=src)
    remaining = spark.read.parquet(paths["source_remaining"]).collect()
    assert [r.url for r in remaining] == ["b"]  # kept rows moved out
    assert spark.read.parquet(src).count() == 2  # source untouched on disk


def test_write_mode_inplace_replaces_source(spark, tmp_path):
    from datacurator_jl_spark.sinks import write_outputs

    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [("A", "X   Y"), ("b", None)], "url string, text string"
    ).write.parquet(src)
    spec = _dict_spec("inplace")
    res = Pipeline(spec).apply(spark.read.parquet(src))
    write_outputs(res, str(tmp_path / "out"), input_path=src)
    new = {r.url: r.text for r in spark.read.parquet(src).collect()}
    assert new == {"a": "X Y"}  # curated: name lowered, ws normalized, drop gone
    assert not os.path.exists(src + ".dc_inplace_tmp")
    assert not os.path.exists(src + ".dc_inplace_old")


# --- table-shape assertions (reference src/DataCurator.jl:619-631,
#     162-196; test/runtests.jl sqlite_queries testsets) ---------------------


def test_schema_and_rowcount_conditions(spark):
    df = spark.createDataFrame([("u", "t")] * 7, "url string, text string")
    spec = parse_recipe(
        {
            "global": {"act_on_success": True},
            "any": {
                "conditions": [
                    ["all", ["has_n_columns", 2], ["has_columns_named", ["url"]],
                     ["column_names", ["url", "text"]], ["has_n_rows", 7],
                     ["less_than_n_rows", 10], ["more_than_n_rows", 5]],
                ],
                "actions": ["keep"],
                "counter_actions": ["drop"],
            },
        }
    )
    res = Pipeline(spec).apply(df)
    assert res.df.filter(F.col("dc_kept")).count() == 7


def test_rowcount_gate_wires_to_quit(spark):
    df = spark.createDataFrame([("u", "t")] * 3, "url string, text string")
    spec = parse_recipe(
        {
            "global": {"act_on_success": True},
            "any": {
                "conditions": [["less_than_n_rows", 5], "always"],
                "actions": ["quit", "keep"],
            },
        }
    )
    res = Pipeline(spec).apply(df)
    assert res.quit_requested() is True


# --- new §2.6 transforms ------------------------------------------------------


def test_remove_from_to_extension_exclusive(spark):
    from datacurator_jl_spark.functions.transforms import (
        remove_from_to_extension_exclusive,
        remove_from_to_extension_inclusive,
    )

    df = spark.createDataFrame([("a/b_mask_v2.tif",)], "url string")
    got = df.select(
        remove_from_to_extension_inclusive(F.col("url"), "_mask").alias("inc"),
        remove_from_to_extension_exclusive(F.col("url"), "_mask").alias("exc"),
    ).collect()[0]
    assert got.inc == "a/b.tif"  # pattern removed too
    assert got.exc == "a/b_mask.tif"  # pattern kept (ref inclusive_first=false)


def test_apply_to_last_path_component(spark):
    spec = parse_recipe(
        {
            "global": {"act_on_success": True},
            "any": {
                "conditions": ["always"],
                "actions": [["transform_name", ["apply_to", "touppercase"]]],
            },
        }
    )
    df = spark.createDataFrame([("dir/sub/file.txt", "t")], "url string, text string")
    row = Pipeline(spec).apply(df).df.collect()[0]
    assert row.url_out == "dir/sub/FILE.TXT"  # dirs untouched (ref :3311-3319)


# --- general aggregator chains (reference decode_aggregator,
#     src/DataCurator.jl:1687-1740; demo.toml) --------------------------------


def test_aggregator_chain_groupby_stage(spark):
    from datacurator_jl_spark.sinks import run_aggregator_chain

    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 5)], "k string, v int"
    )
    out, sink = run_aggregator_chain(
        df,
        [["groupbycolumn", ["k"], ["v"], ["sum"], ["total"]], ["sort", "k"], "concat_to_table"],
    )
    assert sink == "concat_to_table"
    assert [(r.k, r.total) for r in out.collect()] == [("a", 4), ("b", 5)]


def test_aggregator_chain_validated_at_parse_time():
    with pytest.raises(RecipeError):
        parse_recipe(
            {
                "global": {
                    "file_lists": [{"name": "x", "aggregator": [["no_such_stage"]]}]
                },
                "any": {"conditions": ["always"], "actions": [["->", "x"]]},
            }
        )


# --- recipe-level dedup pre-pass ---------------------------------------------


def test_recipe_dedup_exact_prepass(spark):
    spec = parse_recipe(
        {
            "global": {"act_on_success": True, "dedup": "exact"},
            "any": {"conditions": ["has_text"], "actions": ["keep"],
                    "counter_actions": ["drop"]},
        }
    )
    rows = [("u1", "same text here"), ("u2", "same text here"), ("u3", "other")]
    df = spark.createDataFrame(rows, "url string, text string")
    out = Pipeline(spec).apply(df)
    kept = {r.url for r in out.kept().collect()}
    assert kept == {"u1", "u3"}  # u2 removed by dedup before rules


def test_recipe_dedup_validates():
    with pytest.raises(RecipeError):
        parse_recipe(
            {
                "global": {"dedup": "bogus"},
                "any": {"conditions": ["always"], "actions": ["keep"]},
            }
        )
