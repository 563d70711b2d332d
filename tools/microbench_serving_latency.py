#!/usr/bin/env python
"""On-chip serving latency: the DEVICE portion of one scoring call, per
batch bucket, measured with chained iterations (each call's input depends
on the previous output — unchained timings through the axon tunnel read
~1000x too fast, see ARCHITECTURE.md).

The end-to-end numbers in tools/bench_serving.py include the ~55 ms
remote-execution tunnel RTT of this environment; this bench isolates what
a LOCAL chip would pay per device call (plus host transform, reported
separately)."""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from wide_deep_tpu.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from wide_deep_tpu.config import Config
    from wide_deep_tpu.serving.export import export_savedmodel
    from wide_deep_tpu.serving.server import ServingModel
    from wide_deep_tpu.training.loop import Trainer

    p = argparse.ArgumentParser()
    p.add_argument("--bundle_dir", default=None)
    p.add_argument("--data_file", default="data/pred/pred1")
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    config = Config()
    if args.bundle_dir:
        version_dir = args.bundle_dir
    else:
        work = tempfile.mkdtemp(prefix="wdt_serve_lat_")
        tr = Trainer(config, model_type="wide_deep",
                     model_dir=os.path.join(work, "model"))
        tr.ensure_initialized(restore=False)
        tr.save()
        version_dir = export_savedmodel(
            config, os.path.join(work, "export"), model_type="wide_deep",
            model_dir=os.path.join(work, "model"), model_version=1)
        # free the training state (the fused 5 GB d32 table) before the
        # serving model loads its own copy of the bundle
        del tr
        import gc
        gc.collect()

    model = ServingModel(version_dir, 1024)
    with open(args.data_file) as f:
        lines = [l.rstrip("\n") for l in f if l.strip()]

    for bucket in (1, 16, 128, 1024):
        rows = (lines * (bucket // len(lines) + 1))[:bucket]
        text = "\n".join(rows).encode()
        t0 = time.time()
        batch = model.transformer.transform_text(text, bucket, bucket,
                                                 mode="pred")
        host_ms = (time.time() - t0) * 1e3
        dbatch = {k: jnp.asarray(v) for k, v in batch.items()}

        def body(p, carry, _):
            preds = model.model.predict(p, model.mstate, carry)
            probs = preds["probabilities"]
            # fold the output back into an input so the next call depends
            # on this one (chained timing)
            carry = dict(carry)
            carry["wide_wts"] = carry["wide_wts"] + probs[:, :1] * 1e-9
            return carry, ()

        # params as an ARGUMENT: a closure capture would constant-fold the
        # multi-GB tables into the HLO (the remote compile rejects it)
        run = jax.jit(lambda p, b: jax.lax.scan(
            lambda c, x: body(p, c, x), b, None, length=args.iters)[0])
        out = run(model.params, dbatch)
        jax.block_until_ready(out)          # compile + warm
        t0 = time.perf_counter()
        out = run(model.params, dbatch)
        jax.block_until_ready(out)
        dev_ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"bucket {bucket:5d}: device {dev_ms:7.3f} ms/call"
              f"  ({dev_ms / bucket * 1e3:8.1f} us/row)"
              f"  host transform {host_ms:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
