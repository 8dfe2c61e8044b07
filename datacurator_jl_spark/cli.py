"""CLI driver — the Spark analogue of the reference's ``scripts/curator.jl``
(args at scripts/curator.jl:29-54; delegate + counters flush at :115-145).

    python -m datacurator_jl_spark.cli --recipe recipe.toml \
        --input /path/docs.parquet --output /path/outdir [--cores 8]

Runs the compiled recipe as one Spark job and writes:
    outdir/kept/        kept documents (parquet, incl. scrubbed_text)
    outdir/drop_log/    (url, rule_id) for every dropped document
    outdir/counters.csv recipe counters (name,count) — matches the
                        reference CLI's counters.csv shape
    outdir/lineage/     per-partition (partition_id, rule_id, kept,
                        dropped, bytes) metrics

Exit code 0 = :proceed, 2 = :quit (a rule requested global early exit —
reference src/DataCurator.jl:2515-2519), 1 = error.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="datacurator-spark", description=__doc__)
    ap.add_argument("--recipe", "-r", help="TOML recipe file")
    ap.add_argument("--input", "-i", help="input parquet path (overrides recipe inputdirectory)")
    ap.add_argument("--output", "-o", help="output directory (overrides recipe outputdirectory)")
    ap.add_argument("--cores", type=int, default=None, help="local[N] cores (default: all)")
    ap.add_argument(
        "--input-format",
        choices=["parquet", "csv", "json", "text", "iceberg"],
        help="input format (default: inferred from the path extension; "
        "csv/json small corpora are schema-inferred — pin a schema via "
        "a parquet convert for anything big; iceberg falls back to "
        "parquet with a warning when no runtime jar is present)",
    )
    ap.add_argument(
        "--compact-signatures",
        nargs=2,
        metavar=("SIG_DIR", "OUT_DIR"),
        help="maintenance mode (no recipe needed): rewrite the "
        "incremental-dedup signature table's per-epoch _batch_id "
        "partitions into one base partition at OUT_DIR (copy-then-swap; "
        "refuses to overwrite), then exit",
    )
    ap.add_argument(
        "--report",
        metavar="GROUP_COL",
        help="also write outdir/report_input/ and report_kept/ — the "
        "per-GROUP_COL corpus dashboard (docs, tokens, dup rate) before "
        "and after curation — and print both",
    )
    ap.add_argument(
        "--distill-model",
        metavar="PATH",
        help="after the rule pass, fit the hashed linear classifier on "
        "this run's own keep/drop labels (in-engine logistic regression, "
        "operators/distill.py) and write the DC_QUALITY_MODEL JSON to "
        "PATH — point DC_QUALITY_MODEL at it to serve the distilled "
        "filter corpus-wide through the Arrow scorer",
    )
    ap.add_argument(
        "--distill-buckets",
        type=int,
        default=65536,
        metavar="N",
        help="hashed feature buckets for --distill-model (default 65536, "
        "the scorer default)",
    )
    ap.add_argument(
        "--check",
        action="store_true",
        help="validate the recipe (parse + eager compile-time checks) "
        "and exit without starting Spark — the reference's "
        "validate-only mode",
    )
    ap.add_argument("--verbose", "-v", action="store_true")
    args = ap.parse_args(argv)

    if args.compact_signatures:
        from datacurator_jl_spark.session import get_spark
        from datacurator_jl_spark.streaming.stream import (
            compact_signature_table,
        )

        sig_dir, out_dir = args.compact_signatures
        spark = get_spark("datacurator-compact", cores=args.cores)
        try:
            n = compact_signature_table(spark, sig_dir, out_dir)
        except Exception as e:
            print(f"compact error: {e}", file=sys.stderr)
            return 1
        finally:
            spark.stop()
        print(f"compacted {n} signatures into {out_dir}")
        return 0

    if not args.recipe:
        print("need --recipe (or --compact-signatures)", file=sys.stderr)
        return 1

    from datacurator_jl_spark.recipe import RecipeError, load_recipe

    try:
        spec = load_recipe(args.recipe)
    except (RecipeError, OSError) as e:
        print(f"recipe error: {e}", file=sys.stderr)
        return 1
    if args.check:
        nrules = sum(len(rs) for rs in spec.levels.values())
        print(f"recipe ok: {nrules} rule(s), {len(spec.levels)} level(s)")
        return 0

    input_path = args.input or spec.inputdirectory
    output_dir = args.output or spec.outputdirectory
    if not input_path or not output_dir:
        print("need --input and --output (or recipe inputdirectory/outputdirectory)", file=sys.stderr)
        return 1

    from datacurator_jl_spark.engine import Pipeline
    from datacurator_jl_spark.session import get_spark

    spark = get_spark("datacurator-cli", cores=args.cores)
    try:
        from datacurator_jl_spark.sources.tables import load_corpus

        df = load_corpus(
            spark, input_path, fmt=args.input_format, with_lineage=False
        )
        if args.report and args.report not in df.columns:
            # fail BEFORE the (possibly hours-long) pipeline runs — a
            # typo'd report column must not waste the whole job
            print(
                f"report error: column {args.report!r} not in input "
                f"(have {df.columns})",
                file=sys.stderr,
            )
            return 1
        result = Pipeline(spec).apply(df)
        if args.verbose:
            result.df.explain("formatted")

        from datacurator_jl_spark.sinks import write_outputs

        # evaluate anything that re-executes the plan BEFORE write_outputs:
        # write_mode=inplace atomically replaces the input directory, so a
        # later re-execution would scan deleted files
        quit_requested = result.quit_requested()
        if args.verbose:
            print(result.counters().toPandas().to_string(index=False))
        if args.distill_model:
            # BEFORE write_outputs for the same inplace-safety reason as
            # quit_requested: training re-executes the decision plan
            import json

            from pyspark.sql import functions as F

            from datacurator_jl_spark.operators.distill import (
                lr_fit, to_quality_model, unigram_feature_table,
            )

            labels = result.df.select(
                F.col(spec.name_col).alias("doc"),
                F.when(F.col("dc_kept"), 1.0).otherwise(0.0).alias("y"),
            )
            feats = unigram_feature_table(
                df, spec.name_col, spec.text_col,
                n_buckets=args.distill_buckets,
            )
            w, bias_u = lr_fit(feats, labels)
            model = to_quality_model(w, bias_u, args.distill_buckets)
            with open(args.distill_model, "w") as fh:
                json.dump(model, fh)
            print(
                f"distilled model -> {args.distill_model} "
                f"({args.distill_buckets} buckets, "
                f"bias {model['bias']:.6f})"
            )
        write_outputs(result, output_dir, input_path=input_path)
        if args.report:
            from datacurator_jl_spark.operators.report import corpus_report

            for label, frame in (
                ("input", df),
                ("kept", spark.read.parquet(os.path.join(output_dir, "kept"))),
            ):
                rep = corpus_report(frame, args.report, spec.text_col)
                rep.write.mode("overwrite").parquet(
                    os.path.join(output_dir, f"report_{label}")
                )
                print(f"-- corpus report ({label}) by {args.report} --")
                print(rep.orderBy(args.report).toPandas().to_string(index=False))
        print(f"done: output at {output_dir} ({'quit' if quit_requested else 'proceed'})")
        return 2 if quit_requested else 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
