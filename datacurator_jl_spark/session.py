"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[N]``; the same settings scale to a real
cluster (AQE, adaptive coalescing, Arrow). Scale posture: shuffle
partitions sized to parallelism, AQE enabled for runtime re-planning and
skew-join splitting, Arrow enabled so any pandas-UDF stage is vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "datacurator_jl_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` -> ``local[*]``. ``shuffle_partitions`` defaults to the
    core count: on local mode there is no network shuffle, so partitions
    should match parallelism, not the 200 default (which creates tiny
    tasks and scheduler overhead). On a real cluster the caller passes
    executors*cores (or relies on AQE coalescing from a higher number).
    """
    master = f"local[{cores}]" if cores else "local[*]"
    n = cores or (os.cpu_count() or 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # optional JDBC driver jar (round-3, VERDICT #8): point
    # SPARK_GRAFT_JDBC_JAR at a driver (e.g. sqlite-jdbc) and the
    # load_jdbc / jdbc-sink codepaths become live; unset, they stay
    # dormant (no jar ships in this container)
    jdbc_jar = os.environ.get("SPARK_GRAFT_JDBC_JAR")
    if jdbc_jar:
        builder = builder.config("spark.jars", jdbc_jar)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
