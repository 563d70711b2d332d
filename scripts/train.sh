#!/usr/bin/env bash
# Launch training for one or all model types (reference scripts/train.sh
# analog): logs to logs/<type>.log, runs detached via nohup.
#
# usage: train.sh [wide|deep|wide_deep|all] [extra train.py flags...]
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs

TYPE=${1:-wide_deep}
shift || true

run_one() {
  local t=$1; shift
  echo "training model_type=$t (log: logs/$t.log)"
  nohup python tools/train.py --model_type "$t" "$@" > "logs/$t.log" 2>&1 &
  echo "pid $!"
}

if [ "$TYPE" = "all" ]; then
  for t in wide deep wide_deep; do
    run_one "$t" "$@"
  done
else
  run_one "$TYPE" "$@"
fi
