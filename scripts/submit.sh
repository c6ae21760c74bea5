#!/usr/bin/env bash
# Cluster deployment shape required by the north rule: the same job,
# spark-submit --py-files, run at two cluster sizes (N and 4N executors).
# In this sandbox there is no real cluster; scripts/bench_scaling.py is the
# documented local[N]-vs-local[4N] proxy. On a real cluster:
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

zip -qr /tmp/binlogsub_spark.zip binlogsub_spark

EXECUTORS="${EXECUTORS:-4}"   # run once with N, once with 4N
spark-submit \
  --master "${MASTER:-yarn}" \
  --deploy-mode client \
  --num-executors "$EXECUTORS" \
  --executor-cores "${EXECUTOR_CORES:-4}" \
  --executor-memory "${EXECUTOR_MEM:-8g}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions=$((EXECUTORS * 8)) \
  --py-files /tmp/binlogsub_spark.zip \
  binlogsub_spark/run.py \
  --source "${SOURCE:?set SOURCE}" \
  --table "${TABLE:?set TABLE}" \
  --checkpoint "${CHECKPOINT:?set CHECKPOINT}" \
  --buckets "${BUCKETS:-1024}" \
  "$@"
