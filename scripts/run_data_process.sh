#!/usr/bin/env bash
# Submit the offline preprocessing job (reference scripts/run_data_process.sh
# analog). Local mode by default; spark mode submits to YARN with the
# reference's executor sizing.
set -euo pipefail
# Hadoop client env: `source conf/hdfs.env` first on unconfigured hosts.
[ -z "${HADOOP_HOME:-}" ] && [ -f "$(dirname "$0")/../conf/hdfs.env" ] && . "$(dirname "$0")/../conf/hdfs.env" || true
cd "$(dirname "$0")/.."

ENGINE=${1:-local}

if [ "$ENGINE" = "spark" ]; then
  exec spark-submit \
    --master yarn \
    --deploy-mode client \
    --num-executors 100 \
    --executor-cores 8 \
    --executor-memory 20g \
    --py-files wide_deep_tpu \
    wide_deep_tpu/offline/spark_job.py
else
  exec python tools/data_process.py --engine local "${@:2}"
fi
