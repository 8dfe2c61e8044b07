"""Arrow-vectorized twin of ``text.token_stats``.

Why this exists: the native higher-order-function fold is CodegenFallback
— interpreted row-at-a-time — and measurably ANTI-scales on a shared JVM
heap (10.3s on 8 cores -> 33.7s on 32 cores for 1M docs: allocation
contention). The Arrow path runs in per-core Python worker PROCESSES
(no shared heap) with C-backed pandas ops: 8x faster single-threaded and
process-parallel. This is the north-star's sanctioned pattern (batched
pandas/Arrow stages), not per-row Python.

Semantics are PINNED IDENTICAL to text.token_stats / the DuckDB oracle:
token = whitespace(ASCII \\s)-split word, lowercased, PUNCT_STRIP chars
deleted, exact set membership. tests/test_operators.py asserts
arrow == native on the synthetic corpus.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datacurator_jl_spark.functions.arrow_hash import _CACHE_CAP, _lru_evict
from datacurator_jl_spark.functions.text import (
    LANG_MARKERS,
    PUNCT_STRIP,
    STAT_SETS,
    STATS_FIELDS,
)

_STATS_TYPE = T.StructType(
    [T.StructField(name, T.IntegerType()) for name in STATS_FIELDS]
)

_SETS = {name: frozenset(ws) for name, ws in STAT_SETS.items()}
_SET_LIST = list(_SETS.items())  # fixed order = STAT_SETS order
_TBL = str.maketrans("", "", PUNCT_STRIP)
# ASCII flag: match Java regex \s semantics exactly
_TOKEN_RE = re.compile(r"\S+", re.ASCII)

#: token -> bitmask of set memberships (bit j = membership of the
#: normalized token in _SET_LIST[j]); Zipfian web text makes this
#: cache the dominant path, so per-token work collapses to one dict
#: hit (the arrow_hash word-cache pattern, same cap + LRU eviction)
_MEMBER_CACHE: dict[str, int] = {}


def _token_stats_batch(texts: pd.Series) -> pd.DataFrame:
    """Round-7 shape (guide §4.2): ONE factorize over the batch's
    tokens, per-UNIQUE-token normalization + set membership (cached
    across batches), and C-speed ``bincount`` aggregations — replacing
    a ``groupby.nunique`` plus one ``str.isin`` pass per stat set over
    every token occurrence (measured: the flagship's stats stage
    dropped ~2.4x). Values are pinned identical: nw = token count,
    nd = distinct RAW (lowercased) tokens, set counts = occurrences
    whose PUNCT_STRIP-normalized form is a member."""
    n = len(texts)
    toks = texts.fillna("").str.lower().str.findall(_TOKEN_RE)
    out = pd.DataFrame(index=texts.index, columns=list(STATS_FIELDS), data=0)
    out["nw"] = toks.map(len).to_numpy()
    ex = toks.explode().dropna()
    if ex.empty:
        return out.astype("int32")
    rows = texts.index.get_indexer(ex.index)
    codes, uniques = pd.factorize(ex.to_numpy())
    nuniq = len(uniques)
    # nd: distinct raw tokens per row = distinct (row, token-code) pairs
    pairkey = rows.astype(np.int64) * nuniq + codes
    up = np.unique(pairkey)
    out["nd"] = np.bincount(up // nuniq, minlength=n)
    _lru_evict(_MEMBER_CACHE)
    masks = np.empty(nuniq, dtype=np.int64)
    for i, u in enumerate(uniques):
        m = _MEMBER_CACHE.get(u)
        if m is None:
            nu = u.translate(_TBL)
            m = 0
            for j, (_, s) in enumerate(_SET_LIST):
                if nu in s:
                    m |= 1 << j
            if len(_MEMBER_CACHE) < _CACHE_CAP:
                _MEMBER_CACHE[u] = m
        masks[i] = m
    tok_masks = masks[codes]
    for j, (name, _) in enumerate(_SET_LIST):
        hit_rows = rows[(tok_masks >> j) & 1 == 1]
        if hit_rows.size:
            out[name] = np.bincount(hit_rows, minlength=n)
    return out.astype("int32")


def token_stats_arrow(text: Column) -> Column:
    """struct(sw, en, de, fr, es, it) via a scalar pandas UDF.

    Built lazily (pandas_udf needs an active session to resolve types).
    """
    udf = F.pandas_udf(_token_stats_batch, returnType=_STATS_TYPE)
    return udf(text)
