#!/usr/bin/env bash
# Cluster submission: package the library and run the extraction pipeline
# via spark-submit --py-files (north rule submission path).
#
#   tools/submit.sh <pages_table> <output_dir> [run_id]
#
# On a real cluster, add --master yarn/k8s and executor sizing; the job code
# is identical — local[N] vs cluster is pure config.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
INPUT="${1:?pages table path}"
OUTPUT="${2:?output dir}"
RUN_ID="${3:-submit-$(date +%s)}"

ZIP="$(mktemp -d)/docling_japanese_books_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" docling_japanese_books_spark -x '*__pycache__*')

spark-submit \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  "$REPO/tools/submit_job.py" "$INPUT" "$OUTPUT" "$RUN_ID"
