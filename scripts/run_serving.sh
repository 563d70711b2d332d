#!/usr/bin/env bash
# Export the latest checkpoint as a serving bundle, then start the scoring
# server (reference scripts/run_serving.sh analog; same getopt surface).
#
# usage: run_serving.sh [-d export_dir] [-t model_type] [-v version]
#                       [-p port] [-n model_name]
set -euo pipefail
cd "$(dirname "$0")/.."

EXPORT_DIR=SavedModel
MODEL_TYPE=wide_deep
VERSION=1
PORT=8500
MODEL_NAME=wide_deep

while getopts "d:t:v:p:n:h" opt; do
  case $opt in
    d) EXPORT_DIR=$OPTARG ;;
    t) MODEL_TYPE=$OPTARG ;;
    v) VERSION=$OPTARG ;;
    p) PORT=$OPTARG ;;
    n) MODEL_NAME=$OPTARG ;;
    h)
      echo "usage: $0 [-d export_dir] [-t model_type] [-v version] [-p port] [-n model_name]"
      exit 0 ;;
    *) exit 2 ;;
  esac
done

python tools/export.py --export_dir "$EXPORT_DIR" --model_type "$MODEL_TYPE" \
  --model_version "$VERSION"
exec python tools/serve.py --model_base_path "$EXPORT_DIR" \
  --model_version "$VERSION" --port "$PORT" --model_name "$MODEL_NAME"
