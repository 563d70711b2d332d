#!/usr/bin/env bash
# Evaluate trained models on test data (reference scripts/test.sh analog —
# which invoked a nonexistent test.py; ours runs the real eval CLI).
#
# usage: test.sh [wide|deep|wide_deep|all] [extra eval.py flags...]
set -euo pipefail
cd "$(dirname "$0")/.."

TYPE=${1:-wide_deep}
shift || true

if [ "$TYPE" = "all" ]; then
  for t in wide deep wide_deep; do
    echo "== eval model_type=$t =="
    python tools/eval.py --model_type "$t" "$@"
  done
else
  python tools/eval.py --model_type "$TYPE" "$@"
fi
