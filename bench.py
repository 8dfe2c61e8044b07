#!/usr/bin/env python
"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": seconds, "unit": "sec",
"queries": {name: sec}, "sf": ...} plus flagship docs/sec extras.

Every query is materialized through the noop datasource writer so column
pruning cannot skip the computed columns (a .count() would let Catalyst
drop e.g. the scrub expression entirely).

The flagship entry times the full recipe pipeline (quality filter +
scrub + decision columns) over a generated synthetic Common-Crawl-style
corpus (cached parquet in /tmp, seeded) — the docs/sec number the north
rule asks for. ``--only flagship`` + $SPARK_GRAFT_CPUS is used by
scripts/bench_scaling.py to evidence N->4N scaling efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32)))
# The flagship is measured at the VM's measured saturation knee (~8-16
# busy cores for string-heavy work on this shared box, BENCH.md): beyond
# it, extra local threads only add memory-subsystem contention. This
# matches production executor sizing (4-8 cores/executor) — the cluster
# scales by executor count, each in this regime.
FLAGSHIP_CPUS = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_CPUS", str(min(CPUS, 16))))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "1000000"))
CACHE_DIR = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/spark_graft_bench")

HEADLINE = [
    "q01_pricing_summary",
    "q02_between_strict",
    "q06_groupbycolumn",
    "q09_mode_bandpass",
    "d01_exact_dedup",
    "d02_text_stats",
    "d03_langid",
    "d04_quality_filter",
    "d06_minhash_signature",
    "d07_simhash",
    "d08_ngram_jaccard",
    "d09_scrub",
    "d10_quality_score",
    "e01_cosine_topk",
    "e02_ivf_topk",
    "v01_hourly_rollup",
    "v02_user_sessions",
    # round-2 ops
    "d14_near_dup_components",
    "d16_hash_sample",
    "e05_srp_near_dup_pairs",
    "v05_domain_quota",
    # round-3 ops
    "d21_repetition_stats",
    "d22_boilerplate_lines",
    "d23_decontaminate",
    "d24_stratified_sample",
    "d25_token_budget",
    "d26_paragraph_dedup",
    "d27_domain_cap",
    "d28_incremental_dedup",
    "d29_blocklist",
    "d30_classifier_score",
    "d31_ngram_containment",
    "d32_top_fraction",
    "d33_canonical_url",
    "d34_corpus_report",
    "d35_top_terms",
    "d36_compression_ratio",
    "d37_estimated_jaccard",
    "d38_normalized_dedup",
    "d39_url_dedup",
    "d40_contained_survivors",
    # round-4 ops
    "d41_nfc_normalize",
    "d42_dup_ngram_fraction",
    "d43_span_dedup",
    "e06_srp_capped_pairs",
    "e07_srp_survivors",
    # round-5 ops
    "d44_blocked_containment",
    "d45_token_stats",
    "d46_html_extract",
    "d47_latest_version",
    "d48_url_host",
    # round-6-touched plans (exact-dedup semi-join, broadcast join-back)
    "d11_drop_exact_dupes",
    "q12_group_counts",
    # round-6 ops
    "d49_quantile_buckets",
    "d50_encoding_noise",
    "d51_winnow_fingerprints",
    "d52_winnow_shared_passages",
    "d53_dsir_weights",
    "d54_sequence_pack",
    "d55_incremental_exact",
    "d56_gumbel_resample",
    "e08_semdedup_survivors",
    "d57_bm25_topk",
    "e09_kmeans_clusters",
    "d58_distill_classifier",
    "d59_decision_diff",
    "d60_lm_xent",
    "d61_mixture_sample",
    "d62_mixture_tokens",
    "e10_semantic_pipeline",
]


def calibrate() -> float:
    """Fixed single-thread CPU burn (~1 s when the host is quiet) — the
    shared-VM noise probe from scripts/bench_scaling.py, emitted in the
    bench JSON since round 6 (VERDICT r5 Next #3) so every recorded
    BENCH_r{N} carries its own contention context: if `calib_*` here is
    materially above the quietest values recorded in BENCH.md, the
    timings in the same JSON line were taken under neighbor load and
    must not be read as a code regression (round 5's driver run inflated
    ~1.6-4x on unchanged code exactly this way)."""
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i * i
    return round(time.perf_counter() - t0, 3)


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def ensure_bench_docs(spark, n_rows: int, seed: int = 42) -> str:
    """Generate (once, cached) the synthetic documents corpus parquet."""
    path = os.path.join(CACHE_DIR, f"docs_n{n_rows}_s{seed}.parquet")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from datacurator_jl_spark.testing.synth import synth_documents

        df = synth_documents(spark, n_rows, seed=seed, partitions=max(CPUS * 2, 16))
        df.write.mode("overwrite").parquet(path)
    return path


def flagship_pipeline(spark, docs_path: str):
    """The north-rule job: full quality filter + scrub over the corpus."""
    from datacurator_jl_spark.engine import Pipeline
    from datacurator_jl_spark.recipe import load_recipe

    spec = load_recipe(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "recipes", "webtext_quality.toml")
    )
    df = spark.read.parquet(docs_path)
    return Pipeline(spec).apply(df).df


_FLAGSHIP_WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from datacurator_jl_spark.session import get_spark
from bench import flagship_pipeline, ensure_bench_docs, calibrate
s = get_spark("bench-flagship", cores={cores}, shuffle_partitions={cores})
path = ensure_bench_docs(s, {docs})
df = flagship_pipeline(s, path)
# warm the PIPELINE on a small slice: python-worker spin-up +
# whole-stage-codegen JIT happen here, so the timed runs measure
# steady-state throughput, not startup
df.limit(5000).write.format("noop").mode("overwrite").save()
runs, calibs = [], [calibrate()]
for _ in range(3):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    runs.append(round(time.perf_counter() - t0, 3))
    calibs.append(calibrate())
print("FLAGSHIP " + json.dumps({{"cold": runs[0], "warm": min(runs[1:]), "runs": runs, "calibs": calibs}}))
s.stop()
"""


def _measure_flagship_fresh_jvm() -> dict:
    """Measure the flagship in a FRESH JVM subprocess (round-3 fix): the
    in-session number the driver records used to inherit whatever heap/GC
    state the 21-query suite left behind (28.4 s in-session vs 13.6 s
    quiet-window in round 2). A dedicated JVM at the knee parallelism
    reproduces the scripts/bench_scaling.py protocol inside bench.py.
    Reports cold (first timed run after the pipeline warmup) AND warm
    (min of the remaining runs); the headline uses warm."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            _FLAGSHIP_WORKER.format(repo=repo, cores=FLAGSHIP_CPUS, docs=BENCH_DOCS),
        ],
        capture_output=True,
        text=True,
        cwd=repo,
    )
    for line in out.stdout.splitlines():
        if line.startswith("FLAGSHIP "):
            return json.loads(line[len("FLAGSHIP "):])
    raise RuntimeError(f"flagship worker failed:\n{out.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["flagship", "suite", "all"], default="all")
    args = ap.parse_args()

    from datacurator_jl_spark.queries import QUERIES
    from datacurator_jl_spark.session import get_spark

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=CPUS)
    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf") or "0.1")
    except ValueError:
        sf = 0.1

    timings: dict[str, float] = {}
    extras: dict[str, object] = {"calib_start_sec": calibrate()}

    if args.only in ("suite", "all"):
        # min of 2 runs per query: this VM has bursty neighbor load
        # (BENCH.md), and min-of-2 is a far better point estimate of the
        # uncontended time than a single draw. Run 1 also serves as the
        # first-touch scan warmup for run 2.
        for name in HEADLINE:
            fn = QUERIES[name]
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                _noop_write(fn(spark, SF_DIR))
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        extras["calib_after_suite_sec"] = calibrate()

    if args.only in ("flagship", "all"):
        # ensure the corpus exists before the subprocess measures (the
        # generation cost must never land inside a timed window)
        ensure_bench_docs(spark, BENCH_DOCS)
        # stop the suite session BEFORE measuring: a resident multi-GB
        # local[32] JVM competing for memory/page cache would partially
        # reintroduce the same-JVM contamination this protocol removes
        spark.stop()
        fm = _measure_flagship_fresh_jvm()
        timings["flagship_quality_pipeline"] = fm["warm"]
        extras["flagship_cold_sec"] = fm["cold"]
        extras["flagship_docs"] = BENCH_DOCS
        extras["flagship_docs_per_sec"] = round(BENCH_DOCS / fm["warm"], 1)
        extras["flagship_cpus"] = FLAGSHIP_CPUS
        extras["flagship_calibs_sec"] = fm.get("calibs", [])
        extras["cpus"] = CPUS
        # contention self-evidence: quiet-host burn is ~0.95-1.1 s on
        # this VM (BENCH.md ladder); materially higher burns mean the
        # timings above were taken under neighbor load
        extras["calib_quiet_ref_sec"] = 1.0

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                **extras,
            }
        )
    )
    if args.only == "suite":  # flagship path already stopped the session
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
