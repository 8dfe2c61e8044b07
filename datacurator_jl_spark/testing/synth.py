"""Deterministic synthetic Common-Crawl-style documents table.

Matches BASELINE.json input_hint exactly:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)
and FIXTURES.md §1's generator notes: Zipf-skewed domains (exercises the
salted-repartition path), urls with digits/uppercase, html with empty/
truncated/non-UTF8 cases, text mixing clean English, short boilerplate,
high-symbol junk, repeated-line spam, other-language text, and planted
PII (emails, phones, SSNs).

Seeded + order-stable: row i is a pure function of (seed, i), so labels
and scrubbed text are reproducible at any scale. Generation builds a
fixed pool of distinct documents and tiles it with unique url suffixes —
O(pool) Python work then vectorized numpy tiling, so 10^7 rows stay fast.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

_EN_COMMON = (
    "the quick brown fox jumps over a lazy dog and then it was running to "
    "market with some other animals that were not in any hurry for this "
    "journey because they had all seen it before when the weather was warm"
).split()

_FR = (
    "le renard brun saute par dessus le chien et il est dans la maison "
    "avec les autres animaux qui ne sont pas pour vous dans une ville"
).split()

_DE = (
    "der braune fuchs springt und das ist nicht ein hund mit von sich "
    "auch die katze und der vogel sind in dem haus mit eine maus"
).split()

_DOMAINS_HEAD = ["bigsite.com", "hugeportal.org", "megablog.net"]  # Zipf head
_DOMAINS_TAIL = [f"site{i:04d}.example" for i in range(200)]

_PII_SNIPPETS = [
    "contact me at john.doe@example.com for details",
    "call +1-555-0100 during business hours",
    "my ssn is 123-45-6789 please keep it safe",
    "server at 192.168.10.25 was rebooted",
    "email admin@test.org or sales.team@corp.co.uk now",
]


def _rng_words(rng: np.random.RandomState, pool: list[str], n: int) -> str:
    return " ".join(pool[i] for i in rng.randint(0, len(pool), n))


def _make_pool(seed: int, pool_size: int) -> list[tuple[str, str]]:
    """Return [(category, text)] — the distinct-document pool."""
    rng = np.random.RandomState(seed)
    pool: list[tuple[str, str]] = []
    for i in range(pool_size):
        kind = i % 7
        if kind in (0, 1):  # clean English, multi-sentence
            n_sent = 4 + int(rng.randint(0, 6))
            sents = []
            for _ in range(n_sent):
                sents.append(_rng_words(rng, _EN_COMMON, 10 + int(rng.randint(0, 15))).capitalize() + ".")
            pool.append(("clean_en", "\n".join(sents)))
        elif kind == 2:  # short boilerplate
            pool.append(("boilerplate", "click here to continue"))
        elif kind == 3:  # high-symbol junk
            junk = "".join(rng.choice(list("#$%^&*{}[]|\\<>~`@=+_"), 150)) + " some words " + "".join(
                rng.choice(list("#$%^&*"), 80)
            )
            pool.append(("symbol_junk", junk))
        elif kind == 4:  # repeated-line spam
            line = _rng_words(rng, _EN_COMMON, 8)
            pool.append(("line_spam", "\n".join([line] * 20)))
        elif kind == 5:  # other language
            pool.append(
                (
                    "non_en",
                    (_rng_words(rng, _FR, 60) if i % 2 else _rng_words(rng, _DE, 60))
                    + ".",
                )
            )
        else:  # clean English with planted PII
            base = _rng_words(rng, _EN_COMMON, 50).capitalize()
            pii = _PII_SNIPPETS[int(rng.randint(0, len(_PII_SNIPPETS)))]
            more = _rng_words(rng, _EN_COMMON, 40)
            pool.append(("pii_en", f"{base}. {pii}. {more}."))
    return pool


def synth_documents_pandas(n_rows: int, seed: int = 42, pool_size: int = 700) -> pd.DataFrame:
    pool = _make_pool(seed, pool_size)
    rng = np.random.RandomState(seed + 1)
    idx = np.arange(n_rows) % len(pool)
    cats = np.array([pool[i][0] for i in idx])
    texts = np.array([pool[i][1] for i in idx], dtype=object)

    # Zipf-skewed domains: 60% of traffic on 3 mega-domains.
    head = rng.rand(n_rows) < 0.6
    dom_head = np.array(_DOMAINS_HEAD)[rng.randint(0, len(_DOMAINS_HEAD), n_rows)]
    dom_tail = np.array(_DOMAINS_TAIL)[rng.randint(0, len(_DOMAINS_TAIL), n_rows)]
    domains = np.where(head, dom_head, dom_tail)

    row_id = np.arange(n_rows)
    case_mod = row_id % 17
    page = np.where(
        case_mod == 0,
        [f"Page_{i}" for i in row_id],  # uppercase
        np.where(case_mod == 1, [f"item%20{i}" for i in row_id], [f"page-{i}" for i in row_id]),
    )
    ext = np.where(row_id % 5 == 0, ".html", np.where(row_id % 5 == 1, "", ".htm"))
    urls = np.array(
        [f"https://{d}/a/{p}{e}" for d, p, e in zip(domains, page, ext)], dtype=object
    )

    base_ts = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
    ts = [base_ts + dt.timedelta(minutes=int(m)) for m in rng.randint(0, 30 * 24 * 60, n_rows)]

    html = []
    for i in range(n_rows):
        m = i % 11
        if m == 0:
            html.append(b"")  # empty
        elif m == 1:
            html.append(b"<html><body>trunc")  # truncated
        elif m == 2:
            html.append(b"\xff\xfe\x00bad")  # non-UTF8
        else:
            t = str(texts[i])[:80]
            html.append(b"<html><body>" + t.encode("utf-8", "replace") + b"</body></html>")

    lang_claim = np.where(
        row_id % 13 == 0, None, np.where(cats == "non_en", "fr", "en")
    )

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(ts, dtype="datetime64[us, UTC]"),
            "html": html,
            "text": texts,
            "lang": lang_claim,
            "category": cats,  # generator-side truth tag (tests only)
        }
    )


def synth_documents(spark, n_rows: int, seed: int = 42, partitions: int | None = None):
    """Spark DataFrame with the input_hint schema (+ category tag)."""
    pdf = synth_documents_pandas(n_rows, seed)
    df = spark.createDataFrame(pdf)
    if partitions:
        df = df.repartition(partitions)
    return df
