"""Checkpoint-resume tests: a killed run restarts at the last committed
batch with no duplicates and no loss (north-rule resume requirement)."""

from __future__ import annotations

import os

import pytest

from datacurator_jl_spark.engine import Pipeline
from datacurator_jl_spark.resume import CheckpointedRun, _load_manifest


@pytest.fixture()
def docs_path(spark, docs_df, tmp_path):
    p = str(tmp_path / "docs")
    docs_df.write.mode("overwrite").parquet(p)
    return p


def test_kill_and_resume_completes_exactly(spark, docs_path, flagship_spec, tmp_path):
    out = str(tmp_path / "out")
    run1 = CheckpointedRun(spark, flagship_spec, docs_path, out, n_batches=4)
    done1 = run1.run(max_batches=2)  # simulate a kill after 2 batches
    assert len(done1) == 2 and not run1.is_complete()
    assert set(_load_manifest(out)["committed"]) == set(done1)

    # fresh object = fresh process; resumes the remaining batches only
    run2 = CheckpointedRun(spark, flagship_spec, docs_path, out, n_batches=4)
    done2 = run2.run()
    assert sorted(done1 + done2) == [0, 1, 2, 3]
    assert run2.is_complete()

    # final output identical to a single-shot run: same kept urls, once each
    kept = run2.kept()
    single = Pipeline(flagship_spec).apply(spark.read.parquet(docs_path)).kept()
    got = sorted(r.url for r in kept.select("url").collect())
    exp = sorted(r.url for r in single.select("url").collect())
    assert got == exp  # no duplicates, no loss


def test_rerun_after_complete_is_noop(spark, docs_path, flagship_spec, tmp_path):
    out = str(tmp_path / "out2")
    run = CheckpointedRun(spark, flagship_spec, docs_path, out, n_batches=2)
    run.run()
    assert run.run() == []  # nothing pending


def test_batch_count_change_rejected(spark, docs_path, flagship_spec, tmp_path):
    out = str(tmp_path / "out3")
    CheckpointedRun(spark, flagship_spec, docs_path, out, n_batches=2).run(max_batches=1)
    with pytest.raises(ValueError, match="must not change"):
        CheckpointedRun(spark, flagship_spec, docs_path, out, n_batches=8).pending_batches()


def test_interrupted_batch_overwritten_idempotently(
    spark, docs_path, flagship_spec, tmp_path
):
    out = str(tmp_path / "out4")
    run = CheckpointedRun(spark, flagship_spec, docs_path, out, n_batches=2)
    run.run(max_batches=1)
    # simulate a crash mid-batch-1: partial uncommitted files exist
    part = os.path.join(out, "kept", "batch=1")
    os.makedirs(part, exist_ok=True)
    with open(os.path.join(part, "garbage.parquet"), "w") as f:
        f.write("partial write from killed run")
    run2 = CheckpointedRun(spark, flagship_spec, docs_path, out, n_batches=2)
    run2.run()
    assert run2.is_complete()
    assert not os.path.exists(os.path.join(part, "garbage.parquet"))  # overwritten
