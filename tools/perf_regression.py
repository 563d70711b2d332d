#!/usr/bin/env python
"""Per-op device-time regression tracking over profiler captures.

The per-step op-time profile is the early-warning signal for performance
regressions that the end-to-end examples/s number can hide (a 2 ms op
regression is 6% of the step but inside run-to-run noise of a short bench).
This tool turns a jax.profiler capture into a stable per-BUCKET ms/step
profile and compares it against a committed budget:

    # 1. capture a 3-step trace with the bench harness (real TPU)
    BENCH_PROFILE=/tmp/prof python bench.py
    # 2. record the budget (first time / after an accepted change)
    python tools/perf_regression.py capture --profile_dir /tmp/prof \
        --steps 3 --out perf_budget.json
    # 3. in CI / before shipping a perf-sensitive change
    python tools/perf_regression.py check --profile_dir /tmp/prof \
        --steps 3 --budget perf_budget.json --tolerance 0.08

``check`` exits non-zero when any bucket (or the total) exceeds budget by
more than the tolerance, printing one JSON verdict line.  Buckets rather
than raw HLO instruction names: instruction names carry compile-specific
suffixes (fusion.1234) that churn across XLA versions; the bucket profile
is stable and still localizes a regression to scatter/gather/collective/
kernel/matmul territory.

Reference anchor: the reference shipped no profiling surface at all
(SURVEY.md §5.1); this extends tools/parse_xplane.py (the op-time walker)
into tracked regression state.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parse_xplane import op_totals  # noqa: E402

# (bucket, substring triggers) — first match wins; matched against the
# lowercased HLO instruction name.  Order: the most specific first.
BUCKET_RULES = [
    ("collective", ("all-reduce", "all-gather", "reduce-scatter",
                    "collective-permute", "all-to-all")),
    ("kernel", ("custom-call", "tpu_custom_call", "pallas")),
    ("conv", ("convolution", "conv2d")),  # NOT bare "conv": "convert" ops
                                          # are data movement
    ("matmul", ("dot", "einsum")),
    ("scatter", ("scatter",)),
    ("gather", ("gather",)),
    ("update-slice", ("dynamic-update-slice",)),
    ("slice", ("dynamic-slice", "slice")),
    ("data-movement", ("copy", "transpose", "convert", "bitcast",
                       "reshape", "concatenate", "broadcast", "pad")),
    ("fusion", ("fusion",)),
]


def bucket_of(op_name: str) -> str:
    name = op_name.lower()
    for bucket, needles in BUCKET_RULES:
        if any(n in name for n in needles):
            return bucket
    return "other"


def profile_buckets(totals_ps, steps: int):
    """{op name: total ps} -> {bucket: ms/step} (+ "total").

    XEvent durations are PICOseconds (profiler convention; the 1e9
    divisor in tools/parse_xplane.py's ms print pins it).  Buckets sum
    every matching device event, so overlapping async spans (copy-start/
    copy-done DMAs, prefetch slices) legitimately push the total past the
    wall-clock step time — the tracked signal is capture-to-capture
    consistency, not a wall-clock decomposition."""
    out = {}
    for name, ps in totals_ps.items():
        b = bucket_of(name)
        out[b] = out.get(b, 0.0) + ps / 1e9 / max(steps, 1)
    out["total"] = sum(out.values())
    return {k: round(v, 3) for k, v in out.items()}


def compare(budget, current, tolerance: float):
    """-> (ok, findings).  A bucket regresses when it exceeds budget by
    more than ``tolerance`` (relative) AND by an absolute floor of 0.2
    ms/step (tiny buckets jitter).  New buckets above the floor are
    reported as regressions against an implicit 0 budget; buckets that
    shrank or disappeared are reported as improvements (informational)."""
    findings = []
    ok = True
    names = sorted(set(budget) | set(current))
    for name in names:
        b = float(budget.get(name, 0.0))
        c = float(current.get(name, 0.0))
        delta = c - b
        if delta > max(tolerance * b, 0.2):
            findings.append({"bucket": name, "budget_ms": b,
                             "current_ms": c, "delta_ms": round(delta, 3),
                             "kind": "regression"})
            ok = False
        elif delta < -max(tolerance * b, 0.2):
            findings.append({"bucket": name, "budget_ms": b,
                             "current_ms": c, "delta_ms": round(delta, 3),
                             "kind": "improvement"})
    return ok, findings


def main():
    p = argparse.ArgumentParser(
        description="per-op device-time regression tracking")
    p.add_argument("mode", choices=["capture", "check"])
    p.add_argument("--profile_dir", required=True,
                   help="jax.profiler trace dir (BENCH_PROFILE=dir bench.py)")
    p.add_argument("--steps", type=int, default=3,
                   help="steps the capture covered (bench.py records 3)")
    p.add_argument("--out", default="perf_budget.json",
                   help="capture: budget file to write")
    p.add_argument("--budget", default="perf_budget.json",
                   help="check: committed budget to compare against")
    p.add_argument("--tolerance", type=float, default=0.08,
                   help="relative regression tolerance per bucket")
    p.add_argument("--line_filter", default="XLA Ops",
                   help="XLine name filter (the op-level device line); "
                        "empty = all lines")
    args = p.parse_args()

    totals = op_totals(args.profile_dir, args.line_filter or None)
    if not totals and args.line_filter:
        # older captures name the op line differently — fall back
        totals = op_totals(args.profile_dir, None)
    if not totals:
        print(json.dumps({"error": f"no device events under "
                                   f"{args.profile_dir}"}))
        sys.exit(2)
    current = profile_buckets(totals, args.steps)
    # the async-DMA line overlaps compute and would double-count if merged
    # into the op buckets; track its volume as its own bucket (the rowdma
    # write-back and prefetch staging live there)
    async_ps = sum(op_totals(args.profile_dir, "Async XLA Ops").values())
    if async_ps:
        current["async-dma"] = round(async_ps / 1e9 / max(args.steps, 1), 3)

    if args.mode == "capture":
        meta = {"steps": args.steps, "line_filter": args.line_filter,
                "buckets_ms_per_step": current}
        with open(args.out, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
            f.write("\n")
        print(json.dumps({"written": args.out, **current}))
        return

    with open(args.budget) as f:
        budget = json.load(f)["buckets_ms_per_step"]
    ok, findings = compare(budget, current, args.tolerance)
    print(json.dumps({"ok": ok, "tolerance": args.tolerance,
                      "total_ms": current.get("total"),
                      "budget_total_ms": budget.get("total"),
                      "findings": findings}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
