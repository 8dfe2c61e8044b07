"""Local replica of the driver's correctness gate: run every
__spark_entry__ query on Spark AND its oracle SQL on DuckDB at sf0.01,
compare row count, column set, and order-insensitive values.

Usage: python tests/oracle_check.py [query_name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(names: list[str]) -> int:
    import __spark_entry__ as entrymod
    from datacurator_jl_spark.session import get_spark

    qs = entrymod.queries()
    oq = entrymod.oracle_sql()
    if names:
        qs = {k: v for k, v in qs.items() if k in names}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    spark = get_spark("oracle-check", cores=8)

    failures = 0
    for name, fn in sorted(qs.items()):
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oq:
            print(f"rows  {name}: {len(got)} rows (no oracle — rows-only check)")
            continue
        try:
            exp = con.execute(oq[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle sql error: {e}")
            failures += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL  {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL  {name}: rows {len(got)} vs {len(exp)}")
            failures += 1
            continue
        g, e = norm(got), norm(exp)
        if not g.equals(e):
            diff = (g != e).any(axis=1)
            print(f"FAIL  {name}: {int(diff.sum())}/{len(g)} rows differ; first:")
            idx = diff.idxmax()
            print("  spark:", g.loc[idx].to_dict())
            print("  duck :", e.loc[idx].to_dict())
            failures += 1
            continue
        print(f"OK    {name}: {len(got)} rows match")
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
