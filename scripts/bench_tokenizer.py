#!/usr/bin/env python
"""Tokenizer-seam cost evidence (round-6, VERDICT r5 Next #6): the
flagship pipeline with a ``tokens_kept`` counter charged through the
``token_count`` metric, measured with

- the NATIVE regex token-count expression (DC_TOKENIZER unset), vs
- the 1k-piece greedy-vocab fixture
  (``testing/fixtures/bpe_vocab_1k.json``) through the Arrow-batched
  ``pandas_udf`` seam — the exact plumbing a tiktoken/HF tokenizer
  rides, with realistic greedy longest-match work per word.

Protocol = bench.py's flagship protocol: fresh JVM per run at the knee
parallelism, pipeline warmup pass, 3 timed full-corpus noop writes (the
decision frame carries the counter column, so the tokenizer genuinely
runs), min-warm per variant, variants interleaved, calibration burns
recorded. Writes the table into BENCH.md between the tokenizer markers
and prints one JSON line.

Usage: python scripts/bench_tokenizer.py [--docs 1000000] [--cores 16]
       [--repeat 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MARK_A = "<!-- tokenizer-bench-start -->"
MARK_B = "<!-- tokenizer-bench-end -->"

FIXTURE = os.path.join(
    REPO, "datacurator_jl_spark", "testing", "fixtures", "bpe_vocab_1k.json"
)

_WORKER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
{env_line}
from datacurator_jl_spark.session import get_spark
from datacurator_jl_spark.engine import Pipeline
from datacurator_jl_spark.recipe import load_recipe
from bench import ensure_bench_docs, calibrate
s = get_spark("bench-tok", cores={cores}, shuffle_partitions={cores})
spec = load_recipe(os.path.join({repo!r}, "recipes", "webtext_quality_tokens.toml"))
df = Pipeline(spec).apply(s.read.parquet(ensure_bench_docs(s, {docs}))).df
df.limit(5000).write.format("noop").mode("overwrite").save()  # warmup
runs, calibs = [], [calibrate()]
for _ in range({repeat}):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    runs.append(round(time.perf_counter() - t0, 3))
    calibs.append(calibrate())
print("TOK " + json.dumps({{"runs": runs, "calibs": calibs}}))
s.stop()
"""


def run_variant(tokenizer_env: str | None, cores: int, docs: int, repeat: int) -> dict:
    env_line = (
        f"os.environ['DC_TOKENIZER'] = {tokenizer_env!r}"
        if tokenizer_env
        else "os.environ.pop('DC_TOKENIZER', None)"
    )
    out = subprocess.run(
        [sys.executable, "-c", _WORKER.format(
            repo=REPO, env_line=env_line, cores=cores, docs=docs,
            repeat=repeat)],
        capture_output=True, text=True, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("TOK "):
            return json.loads(line[4:])
    raise RuntimeError(f"worker failed:\n{out.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    from datacurator_jl_spark.testing.vocab import write_vocab_fixture

    write_vocab_fixture(FIXTURE)  # deterministic — regenerate in place

    native = run_variant(None, args.cores, args.docs, args.repeat)
    fixture = run_variant(FIXTURE, args.cores, args.docs, args.repeat)

    n_warm = min(native["runs"][1:]) if len(native["runs"]) > 1 else native["runs"][0]
    f_warm = min(fixture["runs"][1:]) if len(fixture["runs"]) > 1 else fixture["runs"][0]
    summary = {
        "docs": args.docs, "cores": args.cores,
        "native_sec": n_warm, "fixture_sec": f_warm,
        "native_docs_per_sec": round(args.docs / n_warm, 1),
        "fixture_docs_per_sec": round(args.docs / f_warm, 1),
        "overhead_x": round(f_warm / n_warm, 2),
        "native_runs": native["runs"], "fixture_runs": fixture["runs"],
        "native_calibs": native["calibs"], "fixture_calibs": fixture["calibs"],
    }
    print(json.dumps(summary))

    section = f"""{MARK_A}
## Tokenizer-seam cost (round 6): native expr vs 1k-piece vocab fixture

Flagship + ``tokens_kept`` counter (recipes/webtext_quality_tokens.toml)
over the {args.docs:,}-doc corpus at {args.cores} cores, fresh JVM per
variant, min-warm of {args.repeat} full-corpus writes (the decision
frame carries the counter column, so the tokenizer genuinely runs):

| token counter | warm wall (s) | docs/sec | runs (s) | calib burns (s) |
|---|---|---|---|---|
| native regex expression (DC_TOKENIZER unset) | {n_warm} | {round(args.docs / n_warm):,} | {native['runs']} | {native['calibs']} |
| 1k-piece greedy-vocab fixture (Arrow pandas_udf seam) | {f_warm} | {round(args.docs / f_warm):,} | {fixture['runs']} | {fixture['calibs']} |

Fixture overhead: **{summary['overhead_x']}x** the native pipeline
time. The fixture does real greedy longest-match segmentation per word
(memoized per distinct word per worker), through the same Arrow batch
path a tiktoken/HF tokenizer uses — so this is the measured shape of
SCALE.md's "tokenizer stage is linear in input bytes" claim, not an
assumption. Reproduce: `python scripts/bench_tokenizer.py --docs
{args.docs} --cores {args.cores} --repeat {args.repeat}`
{MARK_B}"""

    bench_md = os.path.join(REPO, "BENCH.md")
    text = open(bench_md).read()
    if MARK_A in text:
        head, rest = text.split(MARK_A, 1)
        _, tail_md = rest.split(MARK_B, 1)
        text = head + section + tail_md
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    open(bench_md, "w").write(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
