"""Every recipe shipped in recipes/ parses, compiles, and runs — the
reference's own doctrine ("All the examples are tested automatically",
docs/src/index.md:36)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from datacurator_jl_spark.engine import Pipeline
from datacurator_jl_spark.recipe import load_recipe, parse_recipe

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECIPES = sorted(glob.glob(os.path.join(REPO, "recipes", "*.toml")))


def test_recipes_exist():
    assert len(RECIPES) >= 3


@pytest.mark.parametrize("path", RECIPES, ids=[os.path.basename(p) for p in RECIPES])
def test_recipe_parses_and_runs(spark, docs_df, path):
    spec = load_recipe(path)
    df = docs_df
    if spec.hierarchical:
        df = df.withColumn("level", (F.xxhash64("url") % 3 + 1).cast("int"))
    res = Pipeline(spec).apply(df)
    total = res.df.count()
    kept = res.df.filter("dc_kept").count()
    if spec.dedup or spec.mixture is not None:
        # dedup / mixture pre-passes remove rows
        assert 0 < total <= docs_df.count()
    else:
        assert total == docs_df.count()
    assert 0 <= kept <= total


def test_counter_with_size_increment(spark, docs_df):
    """Counter increment fn `size_of_file` (reference counters-with-fn,
    src/DataCurator.jl:3146-3156): counts bytes of the html payload."""
    spec = parse_recipe(
        {
            "global": {"act_on_success": True, "counters": [["bytes_seen", "size_of_file"]]},
            "any": {
                "conditions": ["always"],
                "actions": [["all_actions", ["count", "bytes_seen"], "keep"]],
            },
        }
    )
    res = Pipeline(spec).apply(docs_df)
    got = {r["name"]: r["count"] for r in res.counters().collect()}
    exp = docs_df.select(
        F.sum(F.coalesce(F.length("html"), F.octet_length("text"), F.lit(0)))
    ).collect()[0][0]
    assert got["bytes_seen"] == exp
