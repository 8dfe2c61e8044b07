"""Hashed linear quality classifier — the FineWeb-Edu-style learned
filter, as Spark plumbing with a deterministic stand-in.

Production web pipelines filter on a LEARNED score (fastText supervised
/ linear probe over hashed bag-of-words), not only on heuristics. The
real artifact here is the plumbing: hashed-bucket lookup, Arrow-batched
scoring, a broadcastable weight array, and a path-configured model seam
(``DC_QUALITY_MODEL``) — the same contract as the langid/perplexity
stages (plans/stages.py:190-230).

PINNED SEMANTICS (stand-in path, oracle-exact):
- tokens = ASCII ``\\S+`` over ``lower(text)``, WITH multiplicity
  (fastText averages token vectors; repeats count).
- bucket(tok) = ``_h32(tok + '#<salt>') % n_buckets``.
- stand-in weight ``w[b] = _h32('w' + str(b) + '#<salt>') % 2001 - 1000``
  — an INTEGER in [-1000, 1000]. Integer weights are the cross-engine
  trick: the per-doc sum is exact and summation-order-free in int64,
  and the score is ONE final double division
  ``sum / (1000.0 * n_tokens)`` — so Spark (native and Arrow), DuckDB,
  and the per-row Python oracle agree BIT-EXACTLY, with no float-sum
  ordering hazard.
- zero tokens or null text -> null score (condition fails, engine
  null-semantics).

Model path (``weights=`` / ``DC_QUALITY_MODEL``): a real learned model
is ``{"n_buckets": B, "weights": [float x B], "bias": f}`` JSON; score
= ``bias + mean(w[bucket(tok)])`` in float64. Float weights forfeit the
bit-exact oracle (sum order), so the json path is pytest-covered, not
oracle-checked. The weight array rides the UDF closure (fine to a few
MB; at fastText scale ship it with ``SparkContext.broadcast`` or a
per-worker file load as in plans/stages._get_model).

Scale shape: a narrow per-row projection — no shuffle, no collect. The
Arrow path is one vectorized pandas stage per batch with a per-worker
token->weight LRU (Zipfian hit rate, same valve as arrow_hash); the
native HOF twin is CodegenFallback and exists to pin values, not to run
hot (functions/arrow_stats.py:3-9 measured pattern).
"""

from __future__ import annotations

import hashlib
import json
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datacurator_jl_spark.functions.arrow_hash import _lru_evict, _lru_get
from datacurator_jl_spark.functions.text import words

_TOKEN_RE = re.compile(r"\S+", re.ASCII)  # pinned: text.words semantics

# (n_buckets, salt) -> {token: int weight}, LRU-bounded like arrow_hash
_W_CACHES: dict[tuple[int, str], dict[str, int]] = {}


def _h32_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def standin_weight(token: str, n_buckets: int, salt: str) -> int:
    """The pinned stand-in weight of one token (python reference)."""
    b = _h32_py(f"{token}#{salt}") % n_buckets
    return _h32_py(f"w{b}#{salt}") % 2001 - 1000


def classifier_score_py(
    text: str | None, n_buckets: int = 65536, salt: str = "qw1"
) -> float | None:
    """Per-row Python oracle twin of the stand-in score."""
    if text is None:
        return None
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return None
    s = sum(standin_weight(t, n_buckets, salt) for t in toks)
    return s / (1000.0 * len(toks))


def linear_score_arrow(
    col: Column,
    n_buckets: int = 65536,
    salt: str = "qw1",
    weights: np.ndarray | None = None,
    bias: float = 0.0,
) -> Column:
    """Arrow-batched classifier score (the hot path). Without
    ``weights``: the integer stand-in (oracle-exact). With ``weights``
    (float64 array of length n_buckets): ``bias + mean(w[bucket])``."""
    if weights is not None:
        weights = np.asarray(weights, dtype=np.float64)
        if len(weights) != n_buckets:
            raise ValueError(
                f"weights has {len(weights)} entries, n_buckets={n_buckets}"
            )

    @F.pandas_udf(T.DoubleType())
    def _score(texts: pd.Series) -> pd.Series:
        cache = _W_CACHES.setdefault((n_buckets, salt), {})
        toks = texts.fillna("").str.lower().str.findall(_TOKEN_RE)
        n = toks.str.len()
        out = pd.Series(np.nan, index=texts.index, dtype="float64")
        ex = toks.explode().dropna()
        if ex.empty:
            return out
        codes, uniques = pd.factorize(ex)
        if weights is None:
            uw = np.empty(len(uniques), dtype=np.int64)
            for ui, t in enumerate(uniques):
                v = _lru_get(cache, t)
                if v is None:
                    v = standin_weight(t, n_buckets, salt)
                    cache[t] = v
                uw[ui] = v
            _lru_evict(cache)
            sums = (
                pd.Series(uw[codes], index=ex.index).groupby(level=0).sum()
            )
            out[sums.index] = sums / (1000.0 * n[sums.index])
        else:
            buckets = np.fromiter(
                (_h32_py(f"{t}#{salt}") % n_buckets for t in uniques),
                dtype=np.int64,
                count=len(uniques),
            )
            sums = (
                pd.Series(weights[buckets][codes], index=ex.index)
                .groupby(level=0)
                .sum()
            )
            out[sums.index] = bias + sums / n[sums.index]
        # docs with zero tokens stay NaN -> null
        return out

    return _score(col)


def linear_score_native(
    col: Column, n_buckets: int = 65536, salt: str = "qw1"
) -> Column:
    """Pure-JVM twin of the stand-in score (pinned value-identical to
    the Arrow path; CodegenFallback HOFs — for pinning, not the hot
    path)."""
    from datacurator_jl_spark.operators.dedup import _h32

    ws = words(F.lower(col))
    wt = F.transform(
        ws,
        lambda t: _h32(
            F.concat(
                F.lit("w"),
                F.pmod(_h32(t, f"#{salt}"), F.lit(n_buckets)).cast("string"),
            ),
            f"#{salt}",
        )
        % 2001
        - 1000,
    )
    s = F.aggregate(wt, F.lit(0).cast("bigint"), lambda a, x: a + x)
    n = F.size(ws)
    return F.when(n > 0, s.cast("double") / (F.lit(1000.0) * n))


def load_linear_model(path: str) -> tuple[int, np.ndarray, float]:
    """Load a ``{"n_buckets": B, "weights": [...], "bias": f}`` JSON
    model (the ``DC_QUALITY_MODEL`` seam). Returns (B, weights, bias)."""
    with open(path) as fh:
        spec = json.load(fh)
    n_buckets = int(spec["n_buckets"])
    weights = np.asarray(spec["weights"], dtype=np.float64)
    if len(weights) != n_buckets:
        raise ValueError(
            f"{path}: weights has {len(weights)} entries, "
            f"n_buckets={n_buckets}"
        )
    return n_buckets, weights, float(spec.get("bias", 0.0))


def linear_score(
    col: Column, n_buckets: int = 65536, salt: str = "qw1",
    model_path: str | None = None,
) -> Column:
    """The model seam: explicit path > ``DC_QUALITY_MODEL`` env > the
    deterministic stand-in — same contract as plans/stages.py:190."""
    import os

    path = model_path or os.environ.get("DC_QUALITY_MODEL")
    if path:
        n_buckets, weights, bias = load_linear_model(path)
        return linear_score_arrow(col, n_buckets, salt, weights, bias)
    return linear_score_arrow(col, n_buckets, salt)
