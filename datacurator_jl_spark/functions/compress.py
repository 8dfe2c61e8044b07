"""Compression-ratio quality signal.

``zlib(text) / len(text)`` is the classic cheap repetition/entropy
proxy (used alongside the Gopher stats): boilerplate-heavy or
template-generated pages compress far below prose (~0.3), while
high-entropy junk (hex dumps, minified blobs) sits near or above 1.0.
Quality pipelines band-pass it.

PINNED SEMANTICS:
- ratio = len(zlib.compress(utf8(text), level=6)) / len(utf8(text)),
  rounded to 6dp; bytes, not characters.
- empty or null text -> null (no signal).
- zlib output is pinned by the DEFLATE spec for a given level and
  input, and both the Arrow stage and the per-row Python twin run the
  SAME interpreter's zlib, so they are bit-identical (tested). There is
  NO DuckDB twin — SQL has no DEFLATE — so the d36 query is registered
  WITHOUT an oracle_sql entry and the driver records the weaker
  rows-only check; this is the honest classification for a
  non-SQL-expressible op.

Scale shape: one Arrow-batched narrow projection (zlib releases the
GIL; per-core python workers compress in parallel), no shuffle.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

LEVEL = 6


def compression_ratio_py(text: str | None) -> float | None:
    """Per-row Python twin (the pinned reference)."""
    if not text:
        return None
    raw = text.encode("utf-8")
    return round(len(zlib.compress(raw, LEVEL)) / len(raw), 6)


def compression_ratio_arrow(col: Column) -> Column:
    """Arrow-batched compression ratio (the hot path)."""

    @F.pandas_udf(T.DoubleType())
    def _ratio(texts: pd.Series) -> pd.Series:
        def one(t):
            if not t:
                return None
            raw = t.encode("utf-8")
            return round(len(zlib.compress(raw, LEVEL)) / len(raw), 6)

        return texts.map(one, na_action="ignore")

    return _ratio(col)
