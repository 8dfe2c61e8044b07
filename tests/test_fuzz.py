"""Seeded property/fuzz tests — the analogue of the reference's fuzz
testsets (test/runtests.jl:1663-1729, Random.seed!(42), 100/500 runs):
randomized inputs, exact agreement between the vectorized Spark plan and
the independent per-row Python oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datacurator_jl_spark.engine import Pipeline
from datacurator_jl_spark.recipe import RecipeError, parse_recipe
from datacurator_jl_spark.testing.oracle import oracle_labels

# printable-ish corpus alphabet: ASCII + some unicode punct/letters + CJK
_ALPHABET = st.sampled_from(
    list(
        "abcdefghij XYZ0189.,!?#$%()-'\"\t\n"
        "the and of to is was çüé漢字汉因 ’“”…"
    )
)
_TEXTS = st.lists(
    st.one_of(st.text(_ALPHABET, max_size=400), st.none()),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=_TEXTS)
def test_fuzz_labels_match_oracle(spark, flagship_spec, texts):
    import pandas as pd

    pdf = pd.DataFrame(
        {"url": [f"u{i}" for i in range(len(texts))], "text": texts}
    )
    df = spark.createDataFrame(pdf.astype({"text": "object"}), "url string, text string")
    got = (
        Pipeline(flagship_spec)
        .apply(df)
        .df.select("url", "dc_kept", "dc_rule_id", "scrubbed_text")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    exp = oracle_labels(pdf, flagship_spec).sort_values("url").reset_index(drop=True)
    assert list(got["dc_kept"]) == list(exp["keep"])
    assert list(got["dc_rule_id"]) == list(exp["rule_id"])
    for g, e in zip(got["scrubbed_text"], exp["scrubbed_text"]):
        assert (g is None and e is None) or g == e


@settings(max_examples=50, deadline=None)
@given(
    cond=st.sampled_from(
        [
            "always", "never", "has_text", "nonsense", 42,
            ["min_length"], ["min_length", 5],
            "read_int", ["read_postfix_int", ">", 3], ["read_int", ">"],
            ["has_n_columns", 2], ["has_n_rows"], ["column_names", ["url"]],
        ]
    ),
    action=st.sampled_from(
        [
            "keep", "drop", "bogus_action", ["count", "c"], ["->", "l"],
            ["extract", "read_int"], ["extract", "nope"],
            {"name_transform": ["tolowercase"], "mode": "copy"},
            {"content_transform": ["normalize_whitespace"], "mode": "bogus"},
            {"mode": "move"},
            ["transform_name", ["apply_to", "touppercase"]],
            ["transform_name", ["apply_to"]],
        ]
    ),
)
def test_fuzz_recipe_validation_never_crashes_unexpectedly(cond, action):
    cfg = {
        "global": {"counters": ["c"], "file_lists": ["l"]},
        "any": {"conditions": [cond], "actions": [action]},
    }
    try:
        parse_recipe(cfg)
    except RecipeError:
        pass  # clean, typed compile-time rejection is the contract


# round-3 surfaces: classifier + name-list conditions through the same
# engine-vs-oracle exact-agreement harness
_R3_SPEC = parse_recipe(
    {
        "global": {"act_on_success": True},
        "any": {
            "conditions": [
                ["name_in_list", ["u1", "u4", "u9"]],
                ["classifier_score_above", 0.02],
                ["classifier_score_below", -0.3],
            ],
            "actions": ["drop", "keep", "drop"],
        },
    }
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=_TEXTS)
def test_fuzz_classifier_and_listing_conditions(spark, texts):
    import pandas as pd

    pdf = pd.DataFrame(
        {"url": [f"u{i}" for i in range(len(texts))], "text": texts}
    )
    df = spark.createDataFrame(
        pdf.astype({"text": "object"}), "url string, text string"
    )
    got = (
        Pipeline(_R3_SPEC)
        .apply(df)
        .df.select("url", "dc_kept", "dc_rule_id")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    exp = oracle_labels(pdf, _R3_SPEC).sort_values("url").reset_index(drop=True)
    assert list(got["dc_kept"]) == list(exp["keep"])
    assert list(got["dc_rule_id"]) == list(exp["rule_id"])


@settings(max_examples=60, deadline=None)
@given(
    key=st.sampled_from(
        [
            "dedup", "dedup_materialize", "remove_boilerplate",
            "blocklist", "paragraph_dedup", "domain_cap", "domain_cap_col",
        ]
    ),
    val=st.one_of(
        st.none(), st.booleans(), st.integers(-5, 5), st.floats(allow_nan=False),
        st.text(max_size=5), st.lists(st.text(max_size=3), max_size=3),
        st.dictionaries(st.text(max_size=3), st.integers(), max_size=2),
    ),
)
def test_fuzz_global_prepass_keys_never_crash_unexpectedly(key, val):
    """Junk values for every [global] pre-pass key either parse or get a
    typed RecipeError — never an unhandled crash."""
    cfg = {
        "global": {key: val},
        "any": {"conditions": ["always"], "actions": ["keep"]},
    }
    try:
        spec = parse_recipe(cfg)
    except RecipeError:
        return
    # a parse that SUCCEEDS must have produced a sane spec — silent
    # coercion of junk into nonsense values defers failure to runtime
    assert isinstance(spec.domain_cap_col, str)
    assert spec.domain_cap is None or (
        isinstance(spec.domain_cap, int) and spec.domain_cap >= 1
    )
    assert isinstance(spec.blocklist, list)
    assert isinstance(spec.paragraph_dedup, bool)
    assert spec.dedup in (None, "exact", "near")



@settings(deadline=None, max_examples=15, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.one_of(
            st.text(max_size=120),  # full unicode incl. combining marks
            st.none(),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_nfc_normalize_matches_python(spark, texts):
    """Round-4 invariant: the Arrow NFC stage is value-identical to
    CPython's unicodedata.normalize for arbitrary unicode, incl. nulls,
    surrogate-free astral chars, and decomposed sequences."""
    import unicodedata

    from datacurator_jl_spark.functions.transforms import nfc_normalize

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r.id: r.n
        for r in df.select("id", nfc_normalize(F.col("text")).alias("n")).collect()
    }
    for i, t in rows:
        exp = unicodedata.normalize("NFC", t) if isinstance(t, str) else None
        assert got[i] == exp, (i, repr(t))


def _span_dedup_py(corpus, n):
    """Pure-Python reference for remove_duplicated_spans' pinned
    semantics (tokens: explicit whitespace-class; keys: lowercased;
    within-doc repeats count; output token-normalized)."""
    import re as _re
    from collections import Counter

    tok_re = _re.compile(r"\S+", _re.ASCII)
    toks = {i: tok_re.findall(t) if isinstance(t, str) else None
            for i, t in corpus}
    keys = {i: [" ".join(w.lower() for w in ts[s:s + n])
                for s in range(len(ts) - n + 1)] if ts else []
            for i, ts in toks.items()}
    counts = Counter(k for ks in keys.values() for k in ks)
    out = {}
    for i, t in corpus:
        ts = toks[i]
        if ts is None:
            out[i] = (None, None)
            continue
        cov = set()
        for s, k in enumerate(keys[i]):
            if counts[k] >= 2:
                cov.update(range(s, s + n))
        kept = [w for j, w in enumerate(ts) if j not in cov]
        if not ts:
            out[i] = ("", 0)
        elif not kept:
            out[i] = (None, len(ts))
        else:
            out[i] = (" ".join(kept), len(ts) - len(kept))
    return out


@settings(deadline=None, max_examples=10, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.one_of(
            st.text(st.sampled_from("ab X \t\n"), max_size=40),
            st.none(),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_remove_duplicated_spans_matches_python(spark, texts):
    """Property pin: the distributed span removal equals the per-corpus
    Python reference on adversarial tiny-vocab corpora (maximal window
    collisions, blanks, nulls, case-folding)."""
    from datacurator_jl_spark.operators.span_dedup import (
        remove_duplicated_spans,
    )

    corpus = list(enumerate(texts))
    df = spark.createDataFrame(corpus, "id long, text string")
    got = {
        r.id: (r.clean, r.n_removed)
        for r in remove_duplicated_spans(
            df, "id", "text", n=2, out_col="clean"
        ).collect()
    }
    assert got == _span_dedup_py(corpus, 2)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2", "u3", None]),            # key (null = a group)
            st.one_of(st.none(), st.integers(0, 5)),              # ts bucket
            st.integers(0, 10_000),                               # tiebreak
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[2],  # unique tiebreak (the documented contract)
    )
)
def test_fuzz_latest_version_matches_python_reference(spark, rows):
    """latest_version == the per-group max of (ts IS NOT NULL, ts,
    tiebreak) computed row-at-a-time in Python, incl. NULL keys and
    NULL-ts-only groups."""
    import datetime as dt

    from datacurator_jl_spark.operators.dataframe_ops import latest_version

    to_ts = lambda b: None if b is None else dt.datetime(2024, 1, 1 + b)
    data = [(k, to_ts(t), tb, f"p{tb}") for k, t, tb in rows]
    df = spark.createDataFrame(
        data, "url string, warc_ts timestamp, crawl_id int, payload string"
    )
    got = {
        r.url: (r.warc_ts, r.crawl_id, r.payload)
        for r in latest_version(df, ["url"], "warc_ts", "crawl_id").collect()
    }
    exp: dict = {}
    for k, t, tb, p in data:
        cand = (t is not None, t or dt.datetime.min, tb)
        if k not in exp or cand > exp[k][0]:
            exp[k] = (cand, (t, tb, p))
    assert got == {k: v for k, (_, v) in exp.items()}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10_000),                       # unique id (contract)
            st.one_of(st.none(), st.sampled_from(["a", "b", "c", "dd", ""])),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[0],
    )
)
def test_fuzz_drop_exact_dupes_matches_python_reference(spark, rows):
    """Round-6 winners+semi-join exact dedup == the row-at-a-time min-id
    per distinct text (null text = one group of its own), under the
    unique-non-null-id contract the engine validates."""
    from datacurator_jl_spark.operators.dedup import drop_exact_dupes

    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id for r in drop_exact_dupes(df, "doc_id", "text").collect()}
    exp: dict = {}
    for i, t in rows:
        if t not in exp or i < exp[t]:
            exp[t] = i
    assert got == set(exp.values())


def _entity_token_strategy():
    from datacurator_jl_spark.multimodal.binary import _NAMED_ENTITIES

    words = st.text(alphabet="abcxyz019.,_-", min_size=1, max_size=8)
    named = st.sampled_from([e for e, _ in _NAMED_ENTITIES] + ["&amp;"])
    # valid, non-C1 code points (C1 128-159 is the documented deviation:
    # browsers/html.unescape remap to cp1252, we decode literally), no
    # surrogates, and — since the fuzzer caught &#65534; — none of the
    # HTML5 error set html.unescape silently DROPS (DEL + the 66
    # noncharacters; this chain keeps those refs VERBATIM instead,
    # pinned in test_multimodal): includes supplementary planes
    code = st.one_of(
        st.integers(32, 126), st.integers(160, 55295),
        st.integers(57344, 1_114_111),
    ).filter(
        lambda n: not (0xFDD0 <= n <= 0xFDEF or (n % 0x10000) >= 0xFFFE)
    )
    numeric = st.builds(
        lambda c, hx, up: (
            f"&#{'X' if up else 'x'}{c:x};" if hx else f"&#{c};"
        ),
        code, st.booleans(), st.booleans(),
    )
    return st.one_of(words, named, numeric)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(tokens=st.lists(_entity_token_strategy(), min_size=1, max_size=12))
def test_fuzz_entity_unescape_matches_html_spec_subset(spark, tokens):
    """On the declared-supported subset (named table + valid non-C1
    numeric refs, space-separated so no cross-token entity synthesis),
    extract_html_text == Python's html.unescape composed with the pinned
    NBSP->space normalization and ASCII whitespace collapse — i.e. the
    chain implements real HTML semantics, not merely a self-consistent
    triple."""
    import html as html_mod
    import re as re_mod

    from pyspark.sql import functions as F

    from datacurator_jl_spark.multimodal.binary import extract_html_text

    soup = " ".join(tokens)
    got = (
        spark.createDataFrame([(f"<p>{soup}</p>",)], "html string")
        .select(extract_html_text(F.col("html")).alias("t"))
        .collect()[0]
        .t
    )
    ref = html_mod.unescape(soup).replace("\xa0", " ")
    ref = re_mod.sub(r"[ \t\n\x0b\f\r]+", " ", ref).strip(" ")
    assert got == ref, (soup, got, ref)
