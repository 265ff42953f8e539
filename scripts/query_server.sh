#!/usr/bin/env bash
# Query endpoint (the reference's QueryInterface entry,
# remote/QueryInterface.scala:35-106): REPL by default, or pass
# --sql / --file / --socket-port after the source argument.
# Usage: scripts/query_server.sh --events <events.parquet> [mode args...]
#        scripts/query_server.sh --segments-dir <ingest_out> [mode args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/modelardb_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" modelardb_spark)
exec spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-32}" \
  --py-files "$ZIP" \
  "$REPO/modelardb_spark/jobs/query_server.py" \
  "$@"
