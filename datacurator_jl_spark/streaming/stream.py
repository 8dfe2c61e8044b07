"""Structured Streaming wrappers.

The reference is single-shot batch (SURVEY.md §2.8: no streaming), but a
web-scale ingest pipeline needs an incremental path: the SAME compiled
rule expressions run over ``readStream`` — the quality filter is a pure
narrow projection, so it applies to a stream unchanged; windowed rollups
add a watermark for late data.

Batch/stream parity is by construction: ``Pipeline.apply`` produces
deterministic per-row expressions, so a document gets the identical
keep/drop label in either mode (tested in tests/test_streaming.py via
the file source against the batch result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datacurator_jl_spark.engine import Pipeline
from datacurator_jl_spark.recipe import RecipeSpec

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

DOCS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_events_stream(
    spark: SparkSession, path: str, schema: str = EVENTS_SCHEMA
) -> DataFrame:
    """File-source stream over a directory of parquet drops."""
    return spark.readStream.schema(schema).parquet(path)


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of queries.v01_hourly_rollup: tumbling 1h windows
    with a watermark so late events are folded in until the window
    finalizes; state is bounded by the watermark horizon."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def quality_filter_stream(
    spark: SparkSession, path: str, spec: RecipeSpec, schema: str = DOCS_SCHEMA
) -> DataFrame:
    """The flagship quality filter over a document stream: identical
    compiled expressions as the batch path (pure projection — no state,
    no watermark needed). Sink pattern:

        result.writeStream.format("parquet")
              .option("checkpointLocation", ckpt).start(out)

    The checkpoint gives exactly-once file output and resume-on-restart
    (the streaming counterpart of the batch snapshot-resume story).
    """
    stream = spark.readStream.schema(schema).parquet(path)
    return Pipeline(spec).apply(stream).df
