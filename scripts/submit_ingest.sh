#!/usr/bin/env bash
# Production-shaped submission (north rule: spark-submit --py-files).
# Usage: scripts/submit_ingest.sh <events.parquet> <out_root> [error_bound]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
EVENTS="${1:?events parquet path}"
OUT="${2:?output root}"
BOUND="${3:-0.0}"
ZIP="$(mktemp -d)/modelardb_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" modelardb_spark)
exec spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-32}" \
  --py-files "$ZIP" \
  "$REPO/modelardb_spark/jobs/ingest.py" \
  --events "$EVENTS" --out "$OUT" --error-bound "$BOUND"
