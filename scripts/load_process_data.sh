#!/usr/bin/env bash
# Pull processed (post-preprocessing) shards from HDFS into data/train
# (reference scripts/load_process_data.sh analog).
# usage: load_process_data.sh <hdfs_output_dir> <date> [local_dir]
set -euo pipefail
# Hadoop client env: `source conf/hdfs.env` first on unconfigured hosts.
[ -z "${HADOOP_HOME:-}" ] && [ -f "$(dirname "$0")/../conf/hdfs.env" ] && . "$(dirname "$0")/../conf/hdfs.env" || true
HDFS_DIR=${1:?usage: load_process_data.sh <hdfs_output_dir> <date> [local_dir]}
DATE=${2:?need a YYYYMMDD date}
LOCAL_DIR=${3:-data/train}
mkdir -p "$LOCAL_DIR"
hadoop fs -getmerge "$HDFS_DIR/$DATE" "$LOCAL_DIR/$DATE"
echo "merged $HDFS_DIR/$DATE -> $LOCAL_DIR/$DATE"
