"""JDBC source/sink integration — skipped unless a driver jar is supplied.

The container ships no JDBC driver on the default classpath, so these
tests are dormant by default (the codepaths were otherwise permanently
untested — round-2 VERDICT). To run them:

    SPARK_GRAFT_JDBC_JAR=/path/to/<driver>.jar python -m pytest tests/test_jdbc.py

The jar is injected at session build (session.get_spark reads the env),
so the shared test session picks it up automatically.

Driver notes: sqlite-jdbc exercises both source and sink. duckdb_jdbc
exercises the SOURCE path only — its prepareStatement raises for missing
tables, which escapes Spark's JdbcUtils.tableExists probe and breaks any
DataFrameWriter mode (a driver quirk, not an engine codepath gap), so the
sink test skips itself under that driver.
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
    """Create/populate tables through a raw JVM driver connection —
    DriverManager cannot discover drivers loaded via spark.jars'
    classloader, so the driver class is instantiated directly."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    loader = jvm.org.apache.spark.util.Utils.getContextOrSparkClassLoader()
    cls = jvm.java.lang.Class.forName(_driver_class(), True, loader)
    # py4j cannot call the no-arg varargs overloads directly — pass
    # explicit empty arrays
    ctor = cls.getDeclaredConstructor(gw.new_array(jvm.java.lang.Class, 0))
    drv = ctor.newInstance(gw.new_array(jvm.java.lang.Object, 0))
    conn = drv.connect(url, jvm.java.util.Properties())
    try:
        st = conn.createStatement()
        for sql in ddl:
            st.execute(sql)
        st.close()
    finally:
        conn.close()


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

    if "duckdb" in _driver_class().lower():
        pytest.skip(
            "duckdb_jdbc raises at prepareStatement for missing tables, "
            "breaking Spark's tableExists probe; use sqlite-jdbc for the "
            "sink path"
        )
    url = _url(tmp_path, "rt.db")
    df = spark.createDataFrame([(1, "alpha"), (2, "beta")], "id int, s string")
    save_content(df, "docs", fmt="jdbc", url=url, driver=_driver_class())
    back = load_jdbc(spark, url, "docs", driver=_driver_class())
    assert sorted((r.id, r.s) for r in back.collect()) == [(1, "alpha"), (2, "beta")]
