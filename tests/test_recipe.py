"""Recipe parser + eager validation tests (reference validate_top_config /
lookup-throws semantics, src/DataCurator.jl:2911-2948, :3559)."""

import pytest

from datacurator_jl_spark.recipe import RecipeError, parse_recipe


def _base(any_section=None, glob=None):
    cfg = {"global": glob or {}, "any": any_section or {"conditions": ["always"], "actions": ["keep"]}}
    return cfg


def test_minimal_recipe_parses():
    spec = parse_recipe(_base())
    assert len(spec.rules) == 1
    assert spec.rules[0].rule_id == "any:0:always"
    assert spec.act_on_success is False


def test_unknown_global_key_rejected():
    with pytest.raises(RecipeError, match="unknown .global. keys"):
        parse_recipe(_base(glob={"bogus_key": 1}))


def test_unknown_condition_rejected_eagerly():
    with pytest.raises(RecipeError, match="unknown condition"):
        parse_recipe(_base({"conditions": ["no_such_rule"], "actions": ["keep"]}))


def test_unknown_action_rejected_eagerly():
    with pytest.raises(RecipeError, match="unknown action"):
        parse_recipe(_base({"conditions": ["always"], "actions": ["no_such_action"]}))


def test_arity_mismatch_rejected():
    with pytest.raises(RecipeError, match="takes"):
        parse_recipe(_base({"conditions": [["min_length"]], "actions": ["keep"]}))


def test_condition_action_count_mismatch():
    with pytest.raises(RecipeError, match="must match"):
        parse_recipe(_base({"conditions": ["always", "never"], "actions": ["keep"]}))


def test_all_fusion_single_rule():
    spec = parse_recipe(
        _base(
            {
                "all": True,
                "conditions": ["has_text", ["min_length", 5]],
                "actions": ["keep", ["count", "c"]],
            }
        )
    )
    assert len(spec.rules) == 1
    assert spec.rules[0].condition[0] == "all"


def test_hierarchical_sections():
    cfg = {
        "global": {"hierarchical": True},
        "any": {"conditions": ["always"], "actions": ["keep"]},
        "level_2": {"conditions": ["never"], "actions": ["drop"]},
    }
    spec = parse_recipe(cfg)
    assert set(spec.levels) == {-1, 2}


def test_hierarchical_rejected_when_flat():
    cfg = {
        "any": {"conditions": ["always"], "actions": ["keep"]},
        "level_2": {"conditions": ["never"], "actions": ["drop"]},
    }
    with pytest.raises(RecipeError, match="hierarchical"):
        parse_recipe(cfg)


def test_common_conditions_resolve():
    cfg = {
        "global": {"common_conditions": {"short": ["max_length", 10]}},
        "any": {"conditions": ["short"], "actions": ["drop"]},
    }
    spec = parse_recipe(cfg)
    assert spec.rules[0].condition == "short"


def test_counters_and_file_lists_decode():
    cfg = {
        "global": {
            "counters": ["seen", ["bytes", "size_of_file"]],
            "file_lists": ["kept", ["lst2", "out.txt"], {"name": "agg", "aggregator": "concat_to_table"}],
        },
        "any": {"conditions": ["always"], "actions": ["keep"]},
    }
    spec = parse_recipe(cfg)
    assert spec.counters == {"seen": None, "bytes": "size_of_file"}
    assert set(spec.file_lists) == {"kept", "lst2", "agg"}
    assert spec.file_lists["lst2"]["path"] == "out.txt"
    assert spec.file_lists["agg"]["aggregator"] == "concat_to_table"


def test_descriptive_size():
    from datacurator_jl_spark.functions.predicates import descriptive_size

    assert descriptive_size("10KB") == 10 * 1024
    assert descriptive_size("2MB") == 2 * 2**20  # intended semantics, not the reference's MB bug
    assert descriptive_size("1.5GB") == int(1.5 * 2**30)
    assert descriptive_size(123) == 123
    with pytest.raises(ValueError):
        descriptive_size("ten gigs")
