#!/usr/bin/env python
"""Serving SLO capture + regression gate.

Measures p50/p99 latency and sustained rows/s for BOTH serving transports
(gRPC-framed PredictorClient and the raw framed-TCP TcpPredictorClient —
the C++ client's protocol) at single-row and micro-batched-64 request
shapes, against the production bundle on the current accelerator.

    python tools/serving_slo.py capture     # writes serving_slo.json
    python tools/serving_slo.py check       # fails on regression

The committed serving_slo.json is the serving analog of perf_budget.json
(anchor: the reference's only serving quantitation was its client load
harness, reference python/tensorflow_serving/client.py:40-137, which
printed a rate and was never recorded).  `check` re-measures and fails if
p99 regresses beyond --tolerance (default 30% — network + micro-batching
jitter is real) or throughput drops below (1 - tolerance) x budget.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "serving_slo.json")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure(bundle_dir=None, num_requests=200, concurrency=8,
            port=18640):
    from wide_deep_tpu.cache import enable_compilation_cache
    enable_compilation_cache()
    from wide_deep_tpu.config import Config
    from wide_deep_tpu.serving.client import (PredictorClient,
                                              TcpPredictorClient,
                                              do_inference)
    from wide_deep_tpu.serving.export import export_savedmodel
    from wide_deep_tpu.serving.server import PredictorServer, ServingModel
    from wide_deep_tpu.training.loop import Trainer

    config = Config()
    if not bundle_dir:
        work = tempfile.mkdtemp(prefix="wdt_serving_slo_")
        log(f"initializing production bundle under {work}")
        tr = Trainer(config, model_type="wide_deep",
                     model_dir=os.path.join(work, "model"))
        tr.ensure_initialized(restore=False)
        tr.save()
        bundle_dir = export_savedmodel(
            config, os.path.join(work, "export"), model_type="wide_deep",
            model_dir=os.path.join(work, "model"), model_version=1)
        # free the Trainer's device state before serving loads its own
        # copy (round-3 gotcha: two resident copies OOM the chip)
        del tr
        import gc
        gc.collect()

    model = ServingModel(bundle_dir, max_batch_size=1024,
                         batch_timeout_micros=2000)
    t0 = time.time()
    model.warmup()
    log(f"serving warmup {time.time() - t0:.1f}s")
    server = PredictorServer(model, port=port, tcp_port=port + 1)
    server.start()

    data = os.path.join(os.path.dirname(BUDGET), "data", "pred", "pred1")
    with open(data) as f:
        rows = [line.rstrip("\n") for line in f if line.strip()][:2048]

    results = []
    try:
        for transport, mk in (("grpc", lambda: PredictorClient(port=port)),
                              ("tcp", lambda: TcpPredictorClient(
                                  port=port + 1))):
            client = mk()
            client.predict(rows[:1])  # connect + route warm
            for rpr in (1, 64):
                stats = do_inference(client, rows, num_requests,
                                     concurrency, rows_per_request=rpr)
                entry = {
                    "transport": transport, "rows_per_request": rpr,
                    "concurrency": concurrency,
                    "requests_per_s": round(
                        stats["rows_per_s"] / rpr, 1),
                    "rows_per_s": round(stats["rows_per_s"], 1),
                    "p50_ms": round(stats["p50_ms"], 2),
                    "p99_ms": round(stats["p99_ms"], 2),
                    "errors": stats["errors"],
                }
                assert entry["errors"] == 0, entry
                log(f"{transport} rows/req={rpr}: "
                    f"{entry['rows_per_s']:,.0f} rows/s "
                    f"p50={entry['p50_ms']}ms p99={entry['p99_ms']}ms")
                results.append(entry)
            client.close()
    finally:
        server.stop()
        model.close()
    return results


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["capture", "check"])
    p.add_argument("--budget", default=BUDGET)
    p.add_argument("--tolerance", type=float, default=0.30)
    p.add_argument("--bundle_dir", default=None)
    p.add_argument("--num_requests", type=int, default=200)
    p.add_argument("--port", type=int, default=18640)
    args = p.parse_args()

    results = measure(args.bundle_dir, args.num_requests, port=args.port)
    if args.mode == "capture":
        import jax
        with open(args.budget, "w") as f:
            json.dump({"device": str(jax.devices()[0]),
                       "num_requests": args.num_requests,
                       "results": results}, f, indent=1)
        print(f"captured -> {args.budget}")
        return

    with open(args.budget) as f:
        budget = json.load(f)
    by_key = {(r["transport"], r["rows_per_request"]): r
              for r in budget["results"]}
    failures = []
    for r in results:
        b = by_key.get((r["transport"], r["rows_per_request"]))
        if b is None:
            continue
        if r["p99_ms"] > b["p99_ms"] * (1 + args.tolerance) + 1.0:
            failures.append(f"{r['transport']}/rows{r['rows_per_request']}"
                            f": p99 {r['p99_ms']}ms > budget "
                            f"{b['p99_ms']}ms (+{args.tolerance:.0%})")
        if r["rows_per_s"] < b["rows_per_s"] * (1 - args.tolerance):
            failures.append(f"{r['transport']}/rows{r['rows_per_request']}"
                            f": {r['rows_per_s']:,.0f} rows/s < budget "
                            f"{b['rows_per_s']:,.0f} "
                            f"(-{args.tolerance:.0%})")
    if failures:
        print("SERVING SLO REGRESSION:\n  " + "\n  ".join(failures))
        sys.exit(1)
    print("serving SLO check passed "
          f"({len(results)} cells within {args.tolerance:.0%})")


if __name__ == "__main__":
    main()
