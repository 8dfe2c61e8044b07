"""Source scans.

The reference expands a filesystem graph (``expand_filesystem``,
reference src/DataCurator.jl:4029-4031) and loads CSVs with a provenance
column ``dc_filename`` (``load_table``, src/DataCurator.jl:2525-2538).
Here the scan is a parquet/Iceberg read; the provenance idea is kept as a
``dc_source`` lineage column via ``input_file_name()``.

Scale posture: plain ``spark.read.parquet`` keeps Catalyst's predicate
pushdown / column pruning / partition pruning intact — downstream
operators always ``select`` only what they need so ``ReadSchema`` in the
physical plan stays narrow.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, with_lineage: bool = False
) -> DataFrame:
    """Read one parquet table from an sf directory.

    ``with_lineage=True`` appends ``dc_source`` (the reference's
    ``dc_filename`` provenance column, src/DataCurator.jl:2534-2536).
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if with_lineage:
        df = df.withColumn("dc_source", F.input_file_name())
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() entry points."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
