#!/usr/bin/env bash
# Pull processed (post-preprocessing) shards from HDFS into data/train
# (reference scripts/load_process_data.sh analog).
# usage: load_process_data.sh <hdfs_output_dir> <date> [local_dir]
set -euo pipefail
HDFS_DIR=${1:?usage: load_process_data.sh <hdfs_output_dir> <date> [local_dir]}
DATE=${2:?need a YYYYMMDD date}
LOCAL_DIR=${3:-data/train}
mkdir -p "$LOCAL_DIR"
hadoop fs -getmerge "$HDFS_DIR/$DATE" "$LOCAL_DIR/$DATE"
echo "merged $HDFS_DIR/$DATE -> $LOCAL_DIR/$DATE"
