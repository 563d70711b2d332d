#!/usr/bin/env bash
# Perf gate: run the benchmark with a profiler capture, then fail if any
# per-op bucket regressed vs the committed perf_budget.json
# (tools/perf_regression.py; tolerance 8% + 0.2 ms jitter floor).
#
#   scripts/bench_check.sh                  # check against the budget
#   scripts/bench_check.sh --tolerance 0.2  # looser gate
#
# Re-baseline after an ACCEPTED perf change:
#   python tools/perf_regression.py capture --profile_dir <dir> --steps 3
set -euo pipefail
cd "$(dirname "$0")/.."
prof=$(mktemp -d /tmp/wdt_prof.XXXXXX)
trap 'rm -rf "$prof"' EXIT
BENCH_PROFILE="$prof" BENCH_E2E=0 python bench.py
python tools/perf_regression.py check --profile_dir "$prof" --steps 3 \
    --budget perf_budget.json "$@"
