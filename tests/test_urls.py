"""URL canonicalization (functions/urls.py): pinned pass semantics and
Spark<->Python twin identity (the DuckDB twin is oracle-gated by d33)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datacurator_jl_spark.functions.urls import canonical_url, canonical_url_py

CASES = [
    ("HTTP://WWW.Site.COM:80/A/b/?utm_source=x&id=3#frag",
     "http://www.site.com/A/b/?id=3"),
    ("https://Site.com:443/", "https://site.com"),
    ("https://site.com:8443/x", "https://site.com:8443/x"),  # non-default port
    ("http://a.com:443/x", "http://a.com:443/x"),  # 443 is not http's default
    ("http://a.com/?utm_a=1&utm_b=2&utm_c=3&keep=4",
     "http://a.com/?keep=4"),  # three consecutive leading tracking params
    ("http://a.com/?utm_a=1", "http://a.com"),  # only param -> query gone
    ("http://a.com/p?x=1&gclid=zz&y=2", "http://a.com/p?x=1&y=2"),
    ("http://a.com/p?x=1&fbclid=zz", "http://a.com/p?x=1"),
    ("http://a.com/path&literal?msclkid=1", "http://a.com/path&literal"),
    ("  http://a.com/x  ", "http://a.com/x"),          # trim
    ("http://a.com/x///", "http://a.com/x"),            # slash runs
    ("http://a.com/x\n#frag", "http://a.com/x"),        # exposed newline
    ("not a url at all", "not a url at all"),
    ("ftp://Mixed.Case/Path", "ftp://mixed.case/Path"),  # any scheme lowers
    ("", ""),
]


def test_canonical_url_pinned_cases_python():
    for raw, want in CASES:
        assert canonical_url_py(raw) == want, raw
    assert canonical_url_py(None) is None


def test_canonical_url_spark_matches_python(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)] + [(999, None)],
        "i long, u string",
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url(F.col("u")).alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want == canonical_url_py(raw), raw
    assert got[999] is None


def test_canonical_dedup_composition(spark):
    """The point of the op: URL-keyed exact dedup over canonical forms."""
    from datacurator_jl_spark.operators.dedup import drop_exact_dupes

    df = spark.createDataFrame(
        [
            (1, "HTTP://A.com/x?utm_s=1"),
            (2, "http://a.com/x"),
            (3, "http://a.com/y"),
        ],
        "id long, url string",
    )
    out = drop_exact_dupes(
        df.withColumn("url", canonical_url(F.col("url"))), "id", "url"
    )
    assert {r["id"] for r in out.collect()} == {1, 3}


HOST_CASES = [
    ("https://www.Site.COM/p/1", "site.com"),
    ("HTTP://EXAMPLE.ORG:80/x?q=1", "example.org"),
    ("https://crawler:pw@site.com:8443/", "site.com"),
    ("https://user@Www.Host.io", "host.io"),
    ("https://site.com:", "site.com"),          # empty port strips
    ("https://wwwx.site.com/", "wwwx.site.com"),  # only 'www.' strips
    ("  https://site.com/x  ", "site.com"),     # trim
    ("no scheme here", None),
    ("", None),
    ("https:///path", None),                    # empty authority
]


def test_url_host_pinned_cases_three_way(spark):
    """url_host: Spark == Python twin == DuckDB twin on the pinned
    adversarial spellings (the d48 oracle gates the SQL twin corpus-wide;
    this pins the falsifying micro-cases on all three engines)."""
    import duckdb

    from datacurator_jl_spark.functions.urls import (
        url_host,
        url_host_py,
        url_host_sql,
    )

    for raw, want in HOST_CASES:
        assert url_host_py(raw) == want, raw
    assert url_host_py(None) is None

    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(HOST_CASES)] + [(999, None)],
        "i int, url string",
    )
    got = {r.i: r.h for r in df.select("i", url_host(F.col("url")).alias("h")).collect()}
    con = duckdb.connect()
    for i, (raw, want) in enumerate(HOST_CASES):
        assert got[i] == want, (raw, got[i], want)
        (duck,) = con.execute(f"SELECT {url_host_sql('?')}", [raw]).fetchone()
        assert duck == want, (raw, duck, want)
    assert got[999] is None
