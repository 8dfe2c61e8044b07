#!/usr/bin/env python
"""Round-7 measurement harness (guide §1) — bench.py is FROZEN for the
driver, so the noop-sink isolation, per-query job counts, and
.explain("formatted") captures live here.

Usage:
  python bench_extra.py                      # time every HEADLINE query
  python bench_extra.py --queries e10_semantic_pipeline d08_ngram_jaccard
  python bench_extra.py --plans plans/r07 --suffix before
  python bench_extra.py --runs 3

Prints one JSON line per query: name, min/all timings, #jobs in the
first (cold) run, and (optionally) writes plans/<name>_<suffix>.txt.
Same env contract as bench.py ($SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--plans", default=None, help="dir to write explain output")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from bench import HEADLINE, calibrate

    from datacurator_jl_spark.queries import QUERIES
    from datacurator_jl_spark.session import get_spark

    names = args.queries or HEADLINE
    spark = get_spark("bench-extra", cores=CPUS, shuffle_partitions=CPUS)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    print(json.dumps({"calib_start_sec": calibrate()}))

    results = {}
    for name in names:
        fn = QUERIES[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, SF_DIR).explain("formatted")
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
        runs = []
        jobs0 = None
        for i in range(args.runs):
            group = f"{name}:{i}"
            sc.setJobGroup(group, name)
            sc.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            if i == 0:
                jobs0 = len(tracker.getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
        rec = {"name": name, "min": min(runs), "runs": runs, "jobs": jobs0}
        results[name] = rec
        print(json.dumps(rec), flush=True)
    print(json.dumps({"calib_end_sec": calibrate()}))
    print(
        json.dumps(
            {
                "total_min": round(sum(r["min"] for r in results.values()), 3),
                "n": len(results),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
