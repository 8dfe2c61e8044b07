"""Checkpoint-based resume: a killed run restarts at the last committed
batch.

North-rule requirement ("resumable from checkpoint ... restarts at the
last committed Iceberg snapshot"). In production this is an Iceberg
table: each batch append is an atomic snapshot commit and resume = "scan
which batches are already committed". This container has no Iceberg
runtime jar, so the same semantics are implemented over plain parquet
with an explicit manifest:

- the input is split into ``n_batches`` deterministic hash buckets of the
  document key (stable across restarts: bucket = pmod(xxhash64(url), n));
- each batch writes to its own output subdirectory
  (``kept/batch=<i>/``), then the manifest (JSON, written
  tmp-file + atomic rename — the reference's own parallel-safe commit
  dance, src/DataCurator.jl:1350-1380 tmpcopy/mode_move) records it as
  committed;
- on restart, committed batches are skipped; a batch that was mid-write
  when the run died is simply overwritten (idempotent: output is a pure
  function of the batch's input rows).

Scale note: batches bound re-done work after a crash to 1/n of the job
and bound each write's task count; they do NOT add a shuffle (the batch
filter is a predicate on a hash of the key, evaluated at scan time).
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datacurator_jl_spark.engine import Pipeline
from datacurator_jl_spark.recipe import RecipeSpec

MANIFEST = "_dc_manifest.json"


def _batch_col(name_col: str, n_batches: int):
    return F.pmod(F.xxhash64(F.col(name_col)), F.lit(n_batches))


def _load_manifest(output_dir: str) -> dict:
    path = os.path.join(output_dir, MANIFEST)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"n_batches": None, "committed": []}


def _commit_manifest(output_dir: str, manifest: dict) -> None:
    """Atomic write: tmp file + rename (POSIX rename is atomic)."""
    fd, tmp = tempfile.mkstemp(dir=output_dir, prefix=".manifest-")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(output_dir, MANIFEST))


class CheckpointedRun:
    """Run a recipe over an input in resumable hash batches."""

    def __init__(
        self,
        spark: SparkSession,
        spec: RecipeSpec,
        input_path: str,
        output_dir: str,
        n_batches: int = 16,
    ):
        self.spark = spark
        self.spec = spec
        self.input_path = input_path
        self.output_dir = output_dir
        self.n_batches = n_batches
        os.makedirs(output_dir, exist_ok=True)

    def pending_batches(self) -> list[int]:
        m = _load_manifest(self.output_dir)
        if m["n_batches"] not in (None, self.n_batches):
            raise ValueError(
                f"resume with n_batches={self.n_batches} but manifest has "
                f"{m['n_batches']} — batch split must not change mid-run"
            )
        done = set(m["committed"])
        return [b for b in range(self.n_batches) if b not in done]

    def _process_batch(self, df: DataFrame, b: int) -> dict:
        result = Pipeline(self.spec).apply(
            df.filter(_batch_col(self.spec.name_col, self.n_batches) == b)
        )
        kept_path = os.path.join(self.output_dir, "kept", f"batch={b}")
        drop_path = os.path.join(self.output_dir, "drop_log", f"batch={b}")
        result.kept().write.mode("overwrite").parquet(kept_path)
        result.dropped().write.mode("overwrite").parquet(drop_path)
        lineage = result.lineage().withColumn("batch", F.lit(b))
        lineage.write.mode("overwrite").parquet(
            os.path.join(self.output_dir, "lineage", f"batch={b}")
        )
        return {"batch": b, "ts": time.time()}

    def run(self, max_batches: int | None = None) -> list[int]:
        """Process pending batches (optionally capped, for tests that
        simulate a kill); returns the batches completed THIS call."""
        df = self.spark.read.parquet(self.input_path)
        done_now: list[int] = []
        pending = self.pending_batches()
        if max_batches is not None:
            pending = pending[:max_batches]
        for b in pending:
            info = self._process_batch(df, b)
            m = _load_manifest(self.output_dir)
            m["n_batches"] = self.n_batches
            m["committed"] = sorted(set(m["committed"]) | {b})
            m.setdefault("log", []).append(info)
            _commit_manifest(self.output_dir, m)
            done_now.append(b)
        return done_now

    def is_complete(self) -> bool:
        return not self.pending_batches()

    def kept(self) -> DataFrame:
        """Snapshot of the COMMITTED output only.

        Reads the manifest and lists the committed batch subdirectories
        explicitly (with basePath so the ``batch`` partition column
        survives) — a batch that was mid-write when the run died is NOT
        in the manifest and must not leak into results, exactly like an
        uncommitted Iceberg snapshot."""
        committed = _load_manifest(self.output_dir)["committed"]
        if not committed:
            raise RuntimeError(
                "no committed batches yet — nothing to read (run() first)"
            )
        base = os.path.join(self.output_dir, "kept")
        paths = [os.path.join(base, f"batch={b}") for b in sorted(committed)]
        return self.spark.read.option("basePath", base).parquet(*paths)
