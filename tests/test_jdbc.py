"""JDBC source/sink integration — skipped unless a driver jar is supplied.

The container ships no JDBC driver on the default classpath, so these
tests are dormant by default (the codepaths were otherwise permanently
untested — round-2 VERDICT). To run them:

    SPARK_GRAFT_JDBC_JAR=/path/to/<driver>.jar python -m pytest tests/test_jdbc.py

The jar is injected at session build (session.get_spark reads the env),
so the shared test session picks it up automatically.

Driver notes: both sqlite-jdbc and duckdb_jdbc exercise source AND sink.
duckdb_jdbc's prepareStatement raises for missing tables, which escapes
Spark's JdbcUtils.tableExists probe and breaks any direct DataFrameWriter
mode — the sink works around it by pre-creating the table through a raw
driver connection and APPENDing (sinks._jdbc_precreate, round-4).
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_JDBC_JAR"),
    reason="set SPARK_GRAFT_JDBC_JAR=<driver jar path> to run the JDBC round-trip",
)


def _driver_class() -> str:
    jar = os.path.basename(os.environ.get("SPARK_GRAFT_JDBC_JAR", ""))
    return "org.duckdb.DuckDBDriver" if "duckdb" in jar else "org.sqlite.JDBC"


def _url(tmp_path, name: str) -> str:
    scheme = "duckdb" if "duckdb" in _driver_class().lower() else "sqlite"
    return f"jdbc:{scheme}:{tmp_path / name}"


def _seed(spark, url: str, ddl: list[str]) -> None:
    """Create/populate tables through a raw JVM driver connection
    (shared helper — also the sink's pre-create path)."""
    from datacurator_jl_spark.sinks import jdbc_execute

    jdbc_execute(spark, _driver_class(), url, ddl)


def test_jdbc_source_read(spark, tmp_path):
    from datacurator_jl_spark.sources.tables import load_jdbc

    url = _url(tmp_path, "src.db")
    _seed(
        spark,
        url,
        [
            "CREATE TABLE docs (id INTEGER, s VARCHAR)",
            "INSERT INTO docs VALUES (1, 'alpha'), (2, 'beta'), (3, 'gamma')",
        ],
    )
    back = load_jdbc(spark, url, "docs", driver=_driver_class())
    assert sorted((r.id, r.s) for r in back.collect()) == [
        (1, "alpha"),
        (2, "beta"),
        (3, "gamma"),
    ]
    # subquery pushdown form
    sub = load_jdbc(
        spark, url, "(select s from docs where id < 3) t", driver=_driver_class()
    )
    assert sub.count() == 2


def test_jdbc_partitioned_read(spark, tmp_path):
    from datacurator_jl_spark.sources.tables import load_jdbc

    url = _url(tmp_path, "part.db")
    values = ", ".join(f"({i}, {i * 2})" for i in range(100))
    _seed(
        spark,
        url,
        ["CREATE TABLE nums (id INTEGER, v INTEGER)", f"INSERT INTO nums VALUES {values}"],
    )
    part = load_jdbc(
        spark,
        url,
        "nums",
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=100,
        driver=_driver_class(),
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 100


def test_jdbc_sink_round_trip(spark, tmp_path):
    from datacurator_jl_spark.sinks import save_content
    from datacurator_jl_spark.sources.tables import load_jdbc

    url = _url(tmp_path, "rt.db")
    df = spark.createDataFrame(
        [(1, "alpha", b"\x00\x01"), (2, "beta", None)],
        "id int, s string, payload binary",
    )
    save_content(df, "docs", fmt="jdbc", url=url, driver=_driver_class())
    # read the BLOB back as hex through a pushdown subquery: duckdb_jdbc
    # 1.0.0 does not implement ResultSet.getBytes, so Spark cannot fetch
    # raw BLOBs from this driver — the WRITE path (setBytes) works
    back = load_jdbc(
        spark,
        url,
        "(select id, s, hex(payload) AS payload_hex from docs) t",
        driver=_driver_class(),
    )
    assert sorted((r.id, r.s, r.payload_hex) for r in back.collect()) == [
        (1, "alpha", "0001"),
        (2, "beta", None),
    ]
    # overwrite semantics: a second save replaces, never appends blindly
    df2 = spark.createDataFrame([(3, "gamma")], "id int, s string")
    save_content(df2, "docs", fmt="jdbc", url=url, driver=_driver_class())
    back2 = load_jdbc(spark, url, "docs", driver=_driver_class())
    assert sorted((r.id, r.s) for r in back2.collect()) == [(3, "gamma")]
    # complex dtypes fail eagerly with guidance, not as a mistyped table
    bad = spark.createDataFrame([(1, ["a"])], "id int, tags array<string>")
    with pytest.raises(ValueError, match="cannot map"):
        save_content(bad, "docs2", fmt="jdbc", url=url, driver=_driver_class())
