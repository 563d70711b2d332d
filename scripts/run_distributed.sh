#!/usr/bin/env bash
# Multi-host SPMD launcher (replaces the reference's parameter-server
# SSH fan-out, scripts/run_ps.sh): starts the SAME training program on every
# host; JAX forms one global device mesh via the coordinator.
#
# hosts file: one "user@host" per line; process 0 (the coordinator) is the
# first line. COORD must be reachable from all hosts.
#
# usage: run_distributed.sh hosts.txt <coordinator_ip:port> [train.py flags...]
set -euo pipefail
cd "$(dirname "$0")/.."

HOSTS_FILE=$1
COORD=$2
shift 2

mapfile -t HOSTS < "$HOSTS_FILE"
N=${#HOSTS[@]}
REPO_DIR=$(pwd)

i=0
for host in "${HOSTS[@]}"; do
  echo "launching process $i/$N on $host"
  ssh -o StrictHostKeyChecking=no "$host" \
    "cd $REPO_DIR && WDT_COORDINATOR=$COORD WDT_NUM_PROCESSES=$N WDT_PROCESS_INDEX=$i \
     nohup python tools/train.py --distributed 1 $* > logs/train_p$i.log 2>&1 &" &
  i=$((i + 1))
done
wait
echo "all $N processes launched; logs on each host under logs/train_p<i>.log"
