#!/usr/bin/env bash
# spark-submit packaging (north rule: "delivered as a spark-submit
# --py-files package"). Zips the library and submits the CLI driver.
#
# Usage: scripts/submit.sh <recipe.toml> <input.parquet> <output_dir> [master]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
RECIPE="${1:?recipe}"; INPUT="${2:?input}"; OUTPUT="${3:?output}"
MASTER="${4:-local[*]}"

PKG_ZIP="$(mktemp -d)/datacurator_jl_spark.zip"
(cd "$REPO" && zip -qr "$PKG_ZIP" datacurator_jl_spark -x '*__pycache__*')

exec spark-submit \
  --master "$MASTER" \
  --py-files "$PKG_ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$REPO/datacurator_jl_spark/cli.py" \
  --recipe "$RECIPE" --input "$INPUT" --output "$OUTPUT"
