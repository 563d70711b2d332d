#!/usr/bin/env python
"""Host data-loader throughput benchmark: rows/s for the native C++ path and
the Python reference path (ops visibility; the device-side benchmark is
bench.py)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="loader throughput benchmark")
    p.add_argument("--data_file", default="data/train/train1")
    p.add_argument("--batch_size", type=int, default=4096)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--threads", type=int, default=0)
    p.add_argument("--python", action="store_true",
                   help="also time the (slow) pure-Python path")
    args = p.parse_args()

    from wide_deep_tpu.config import Config
    from wide_deep_tpu.features.plan import FeaturePlan
    plan = FeaturePlan(Config(), pallas_scatter=os.environ.get("LOADER_SCATTER", "1") == "1")
    with open(args.data_file, "rb") as f:
        text = f.read()
    n_rows = text.count(b"\n")
    B = min(args.batch_size, n_rows)

    from wide_deep_tpu.features.native import NativeTransformer
    if NativeTransformer.available():
        nt = NativeTransformer(plan, n_threads=args.threads)
        nt.transform_text(text, n_rows, B)  # warm
        t0 = time.time()
        for _ in range(args.iters):
            nt.transform_text(text, n_rows, B)
        dt = time.time() - t0
        print(f"native: {args.iters * B / dt:,.0f} rows/s "
              f"({nt.n_threads} threads, batch {B})")
    else:
        print("native library not built (make -C cpp)")

    if args.python:
        from wide_deep_tpu.features.pipeline import FeatureTransformer
        rows = [line.split("\t") for line in
                text.decode().rstrip("\n").split("\n")][:B]
        pt = FeatureTransformer(plan)
        t0 = time.time()
        pt.transform(rows, B)
        print(f"python: {B / (time.time() - t0):,.0f} rows/s (batch {B})")


if __name__ == "__main__":
    main()
