#!/usr/bin/env python
"""Serving throughput benchmark on the production config.

Exports a bundle (random-init weights — serving cost is weight-independent),
starts the in-process PredictorServer (gRPC + TCP), and drives the
concurrency load harness (serving/client.py, the reference's client.py:40-137
analog) at several concurrency levels.  The server micro-batches concurrent
requests into one device call (MicroBatcher; tensorflow_model_server
--enable_batching parity, reference scripts/run_serving.sh:60-70).

Prints one JSON line per concurrency level:
  {"concurrency": C, "rows_per_request": R, "rows_per_s": N, "p50_ms": ...}
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from wide_deep_tpu.cache import enable_compilation_cache
    enable_compilation_cache()

    from wide_deep_tpu.config import Config
    from wide_deep_tpu.serving.client import PredictorClient, do_inference
    from wide_deep_tpu.serving.export import export_savedmodel
    from wide_deep_tpu.serving.server import PredictorServer, ServingModel
    from wide_deep_tpu.training.loop import Trainer

    p = argparse.ArgumentParser()
    p.add_argument("--bundle_dir", default=None,
                   help="reuse an existing bundle version dir")
    p.add_argument("--data_file", default="data/pred/pred1")
    p.add_argument("--num_requests", type=int, default=400)
    p.add_argument("--rows_per_request", type=int, default=1)
    p.add_argument("--max_batch_size", type=int, default=1024)
    p.add_argument("--batch_timeout_micros", type=int, default=2000)
    p.add_argument("--concurrency", default="1,8,64")
    p.add_argument("--open_loop_rate", default=None,
                   help="comma list of offered requests/s; runs the "
                        "multi-process open-loop harness instead of the "
                        "closed-loop threads (GIL-free, fixed offered load)")
    p.add_argument("--duration_s", type=float, default=10.0)
    p.add_argument("--processes", type=int, default=4)
    p.add_argument("--port", type=int, default=18600)
    args = p.parse_args()

    config = Config()
    if args.bundle_dir:
        version_dir = args.bundle_dir
    else:
        work = tempfile.mkdtemp(prefix="wdt_bench_serving_")
        log(f"initializing production model -> checkpoint -> bundle ({work})")
        tr = Trainer(config, model_type="wide_deep",
                     model_dir=os.path.join(work, "model"))
        tr.ensure_initialized(restore=False)
        tr.save()
        t0 = time.time()
        version_dir = export_savedmodel(
            config, os.path.join(work, "export"), model_type="wide_deep",
            model_dir=os.path.join(work, "model"), model_version=1)
        log(f"exported bundle in {time.time() - t0:.1f}s: {version_dir}")

    model = ServingModel(version_dir, args.max_batch_size,
                         batch_timeout_micros=args.batch_timeout_micros)
    t0 = time.time()
    model.warmup()
    log(f"warmup (compile {len(model.batch_buckets)} buckets) "
        f"{time.time() - t0:.1f}s")
    server = PredictorServer(model, port=args.port, tcp_port=args.port + 1)
    server.start()

    with open(args.data_file) as f:
        rows = [line.rstrip("\n") for line in f if line.strip()][:2048]

    client = PredictorClient(port=args.port)
    client.predict(rows[:1])  # connection warm
    if args.open_loop_rate:
        from wide_deep_tpu.serving.client import open_loop_inference
        for rate in [float(r) for r in args.open_loop_rate.split(",")]:
            stats = open_loop_inference(
                rows, rate, args.duration_s,
                rows_per_request=args.rows_per_request,
                processes=args.processes, port=args.port)
            stats = {k: (round(v, 2) if isinstance(v, float) else v)
                     for k, v in stats.items()}
            stats["rows_per_request"] = args.rows_per_request
            stats["device_calls"] = model.batcher.device_calls
            print(json.dumps(stats), flush=True)
    else:
        for conc in [int(c) for c in args.concurrency.split(",")]:
            stats = do_inference(client, rows, args.num_requests, conc,
                                 rows_per_request=args.rows_per_request)
            out = {"concurrency": conc,
                   "rows_per_request": args.rows_per_request,
                   "rows_per_s": round(stats["rows_per_s"], 1),
                   "p50_ms": round(stats["p50_ms"], 2),
                   "p99_ms": round(stats["p99_ms"], 2),
                   "errors": stats["errors"],
                   "device_calls": model.batcher.device_calls}
            print(json.dumps(out), flush=True)
    client.close()
    server.stop()
    model.close()


if __name__ == "__main__":
    main()
