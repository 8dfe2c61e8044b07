#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule's two-cluster-size
criterion: run the IDENTICAL flagship job on the IDENTICAL input at two
local parallelism levels (default 8 and 32 cores — N and 4N) in separate
JVMs, report throughput at each and the scaling efficiency
(T_N / T_4N) / (cores ratio). Target >= 0.8 (BASELINE.json).

Usage: python scripts/bench_scaling.py [--low 8] [--high 32] [--docs 1000000]
Writes BENCH.md at the repo root and prints a JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, docs: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_DOCS=str(docs),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--only", "flagship"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--docs", type=int, default=1_000_000)
    args = ap.parse_args()

    lo = run_level(args.low, args.docs)
    hi = run_level(args.high, args.docs)
    t_lo = lo["queries"]["flagship_quality_pipeline"]
    t_hi = hi["queries"]["flagship_quality_pipeline"]
    ratio = args.high / args.low
    eff = (t_lo / t_hi) / ratio
    summary = {
        "docs": args.docs,
        "low_cores": args.low,
        "high_cores": args.high,
        "low_sec": t_lo,
        "high_sec": t_hi,
        "low_docs_per_sec": lo["flagship_docs_per_sec"],
        "high_docs_per_sec": hi["flagship_docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(
            f"""# BENCH — scaling-efficiency evidence (north rule, sandbox protocol)

Identical flagship job (recipes/webtext_quality.toml: full quality filter
+ PII scrub + counters/lineage over the seeded synthetic Common-Crawl-style
corpus, {args.docs:,} documents) on the identical parquet input at two
local parallelism levels, separate JVMs per level (BASELINE.md §3 protocol).

| cores | wall (s) | docs/sec |
|---|---|---|
| {args.low} (N) | {t_lo} | {lo['flagship_docs_per_sec']:,} |
| {args.high} (4N) | {t_hi} | {hi['flagship_docs_per_sec']:,} |

**Scaling efficiency** = (T_N / T_4N) / (cores ratio)
= ({t_lo} / {t_hi}) / {ratio:.0f} = **{eff:.3f}** (target >= 0.8 → {"PASS" if eff >= 0.8 else "FAIL"})

Reproduce: `python scripts/bench_scaling.py --low {args.low} --high {args.high} --docs {args.docs}`
"""
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
