#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north rule deployment path).
#   ./scripts/make_pyfiles.sh  →  dist/kgx_spark.zip
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/kgx_spark.zip
python -m zipfile -c dist/kgx_spark.zip kgx_spark
echo "dist/kgx_spark.zip ready:"
echo "  spark-submit --py-files dist/kgx_spark.zip scripts/run_pipeline.py \\"
echo "      --sf-dir <input> --workdir <snapshots>"
