"""Gopher repetition statistics (functions/rep_stats.py): pinned-value
edge cases, Arrow-UDF == per-doc reference identity, recipe-condition
integration (engine labels == per-row Python oracle), plan shape (ONE
shared ``_dc_rep`` Arrow pass), and eager validation."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datacurator_jl_spark.engine import Pipeline
from datacurator_jl_spark.functions.rep_stats import (
    REP_FIELDS,
    rep_stats_arrow,
    rep_stats_doc,
)
from datacurator_jl_spark.recipe import RecipeError, parse_recipe
from datacurator_jl_spark.testing.oracle import _rep_stats, oracle_labels


def _asdict(vals):
    return dict(zip(REP_FIELDS, vals))


# ---------------------------------------------------------------------------
# Pinned edge-case values
# ---------------------------------------------------------------------------


def test_null_and_empty_are_zero_structs():
    assert rep_stats_doc(None) == [0.0] * len(REP_FIELDS)
    assert rep_stats_doc("") == [0.0] * len(REP_FIELDS)
    assert rep_stats_doc("   \t\n  ") == [0.0] * len(REP_FIELDS)


def test_repeated_word_doc():
    # "a a a a a a a": 7 tokens, len 13. top2: gram ('a','a') x6, charlen 3
    # -> 18/13 capped at 1.0. dup5: ('a',)*5 x3 -> (3-1)*9=18 -> capped 1.0.
    d = _asdict(rep_stats_doc("a a a a a a a"))
    assert d["top2"] == 1.0 and d["top3"] == 1.0 and d["top4"] == 1.0
    assert d["dup5"] == 1.0  # ('a',)*5 x3 -> (3-1)*9 = 18/13, capped
    assert d["dup6"] == pytest.approx(11 / 13)  # x2 -> (2-1)*11
    assert d["dup7"] == 0.0  # only one 7-gram occurrence — nothing repeats
    assert d["dup_line_frac"] == 0.0


def test_no_repetition_doc():
    assert rep_stats_doc("one two three four five") == [0.0] * len(REP_FIELDS)


def test_top2_uncapped_value():
    # "ab cd ab cd": gram ('ab','cd') x2 (positions 0,2), charlen 5 ->
    # 2*5/11. ('cd','ab') occurs once. top3/top4 nothing repeats.
    d = _asdict(rep_stats_doc("ab cd ab cd"))
    assert d["top2"] == pytest.approx(10 / 11)
    assert d["top3"] == 0.0


def test_vertical_tab_is_a_token_break():
    # \x0b separates tokens under ASCII \S+ (the repo-wide pin):
    # tokens are x y x y, so ('x','y') repeats (positions 0 and 2)
    d = _asdict(rep_stats_doc("x\x0by x\x0by"))
    assert d["top2"] == pytest.approx(6 / 7)  # 2 * charlen 3 / len 7


def test_line_and_para_fields():
    t = "dup\ndup\nuniq"  # 3 non-empty lines, 'dup' twice, len 12
    d = _asdict(rep_stats_doc(t))
    assert d["dup_line_frac"] == pytest.approx(1 / 3)
    assert d["dup_line_char_frac"] == pytest.approx(3 / 12)
    assert d["dup_para_frac"] == 0.0  # no \n\n -> one paragraph
    t2 = "p\n\np\n\nq"
    d2 = _asdict(rep_stats_doc(t2))
    assert d2["dup_para_frac"] == pytest.approx(1 / 3)
    assert d2["dup_para_char_frac"] == pytest.approx(1 / 7)
    # empty lines never count as duplicates
    d3 = _asdict(rep_stats_doc("a\n\n\n\na"))
    assert d3["dup_line_frac"] == pytest.approx(1 / 2)


def test_case_pins():
    # grams are over lower(text); lines are over RAW text (case kept)
    d = _asdict(rep_stats_doc("Foo foo"))
    assert d["top2"] == 0.0  # only one 2-gram occurrence
    d2 = _asdict(rep_stats_doc("Foo foo Foo foo"))
    assert d2["top2"] == 1.0  # ('foo','foo') x3, charlen 7 -> 21/15 cap
    d3 = _asdict(rep_stats_doc("Line\nline"))
    assert d3["dup_line_frac"] == 0.0  # raw-case lines differ


# ---------------------------------------------------------------------------
# Cross-implementation identity
# ---------------------------------------------------------------------------

_ALPHABET = st.sampled_from(
    list("ab XY09.'\t\n\x0b" "the and 漢")
)
_TEXT = st.one_of(st.text(_ALPHABET, max_size=120), st.none())


@settings(max_examples=40, deadline=None)
@given(t=_TEXT)
def test_python_oracle_twin_matches_reference(t):
    got = _rep_stats(t) if t is not None else None
    exp = _asdict(rep_stats_doc(t))
    if t is None:
        assert exp == _asdict([0.0] * len(REP_FIELDS))
    else:
        assert got == pytest.approx(exp)


def test_arrow_udf_matches_reference(spark):
    texts = [
        None, "", "   ", "a a a a a a a", "ab cd ab cd",
        "dup\ndup\nuniq", "p\n\np\n\nq", "Foo foo Foo foo",
        "w " * 30, "x\x0by x\x0by", "one two three",
    ]
    pdf = pd.DataFrame({"id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf.astype({"text": "object"}), "id long, text string")
    got = (
        df.withColumn("r", rep_stats_arrow(df["text"]))
        .select("id", "r.*")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(texts):
        exp = rep_stats_doc(t)
        row = [float(got.loc[i, f]) for f in REP_FIELDS]
        assert row == pytest.approx(exp), f"row {i}: {t!r}"


# ---------------------------------------------------------------------------
# Recipe integration
# ---------------------------------------------------------------------------

_REP_RECIPE = {
    "global": {"act_on_success": False},
    "any": {
        "conditions": [
            ["top_ngram_char_frac_below", 2, 0.2],
            ["dup_ngram_char_frac_below", 5, 0.2],
            ["dup_line_frac_below", 0.3],
            ["dup_para_char_frac_below", 0.3],
        ],
        "actions": ["drop", "drop", "drop", "drop"],
    },
}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_TEXT, min_size=1, max_size=12))
def test_repetition_recipe_labels_match_oracle(spark, texts):
    spec = parse_recipe(_REP_RECIPE)
    pdf = pd.DataFrame({"url": [f"u{i}" for i in range(len(texts))], "text": texts})
    df = spark.createDataFrame(pdf.astype({"text": "object"}), "url string, text string")
    got = (
        Pipeline(spec)
        .apply(df)
        .df.select("url", "dc_kept", "dc_rule_id")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    exp = oracle_labels(pdf, spec).sort_values("url").reset_index(drop=True)
    assert list(got["dc_kept"]) == list(exp["keep"])
    assert list(got["dc_rule_id"]) == list(exp["rule_id"])


def test_rep_struct_projected_once(spark):
    """All repetition rules share ONE _dc_rep Arrow pass: the pandas UDF
    appears exactly once in the analyzed plan."""
    spec = parse_recipe(_REP_RECIPE)
    df = spark.createDataFrame(
        [("u1", "a a a a a a"), ("u2", "x y z")], "url string, text string"
    )
    out = Pipeline(spec).apply(df).df
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("_rep_stats_batch") == 1, plan


def test_bad_ngram_n_raises(spark):
    from datacurator_jl_spark.registry import RuleContext, compile_condition

    ctx = RuleContext(name_col="url", text_col="text", html_col=None)
    with pytest.raises(RecipeError, match="n must be one of"):
        compile_condition(["top_ngram_char_frac_below", 7, 0.2], ctx)
    with pytest.raises(RecipeError, match="n must be one of"):
        compile_condition(["dup_ngram_char_frac_below", 2, 0.2], ctx)
