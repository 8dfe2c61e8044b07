"""Mode band-pass filter — the reference's ``handle_mode`` /
``univariate_mode`` (src/DataCurator.jl:2231-2246): estimate the mode m
of a column, keep rows with m + k*sigma < x < m + j*sigma (their
focal-plane filter; here: a quality-score band-pass around the corpus
mode).

Two-phase plan (SURVEY.md §7.3 'custom two-pass stage'): a distributed
aggregate computes (mode, sigma) — tiny result collected to the driver —
then one broadcast-scalar filter pass. The reference estimates the mode
with a KDE; we pin a deterministic discrete estimator: the value with
the highest count, smallest value winning ties (documented tie-break,
SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_mode(df: DataFrame, col: str) -> float:
    """Discrete mode with deterministic smallest-value tie-break."""
    row = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(col))
        .limit(1)
        .collect()
    )
    if not row:
        raise ValueError(f"column {col} has no non-null values")
    return row[0][0]


def mode_bandpass(df: DataFrame, col: str, k: float, j: float) -> DataFrame:
    """Keep rows with mode + k*sigma < col < mode + j*sigma (strict,
    like the reference's between). sigma = sample stddev."""
    m = column_mode(df, col)
    sd = df.agg(F.stddev_samp(col)).collect()[0][0]
    lo = m + k * sd
    hi = m + j * sd
    return df.filter((F.col(col) > F.lit(lo)) & (F.col(col) < F.lit(hi)))
