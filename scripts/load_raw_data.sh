#!/usr/bin/env bash
# Pull raw CTR logs from HDFS to the local data directory (reference
# scripts/load_raw_data.sh analog).
# usage: load_raw_data.sh <hdfs_dir> [local_dir]
set -euo pipefail
# Hadoop client env: `source conf/hdfs.env` first on unconfigured hosts.
[ -z "${HADOOP_HOME:-}" ] && [ -f "$(dirname "$0")/../conf/hdfs.env" ] && . "$(dirname "$0")/../conf/hdfs.env" || true
HDFS_DIR=${1:?usage: load_raw_data.sh <hdfs_dir> [local_dir]}
LOCAL_DIR=${2:-data/raw}
mkdir -p "$LOCAL_DIR"
hadoop fs -getmerge "$HDFS_DIR" "$LOCAL_DIR/$(basename "$HDFS_DIR")"
echo "merged $HDFS_DIR -> $LOCAL_DIR/$(basename "$HDFS_DIR")"
