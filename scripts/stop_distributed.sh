#!/usr/bin/env bash
# Stop distributed training cleanly on every host (replaces the reference's
# kill -9 pkill, scripts/kill_ps.sh): reads the pid files written by
# tools/train.py and signals only those processes.
#
# usage: stop_distributed.sh hosts.txt
set -euo pipefail
cd "$(dirname "$0")/.."

HOSTS_FILE=$1
mapfile -t HOSTS < "$HOSTS_FILE"
REPO_DIR=$(pwd)

for host in "${HOSTS[@]}"; do
  ssh -o StrictHostKeyChecking=no "$host" \
    "cd $REPO_DIR && if [ -f logs/train.pid ]; then kill \$(cat logs/train.pid) 2>/dev/null || true; rm -f logs/train.pid; fi"
done
