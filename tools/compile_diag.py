#!/usr/bin/env python
"""Diagnose train-step compile cost (VERDICT r3 weak #3: 710 s cold compile).

Reproduces bench.py's exact program (production config, batch 25600, fused
sparse optimizer) but only LOWERS it — abstract ShapeDtypeStruct inputs, no
5 GB allocations — then times XLA compilation on the local backend and
reports HLO size stats so the expensive construct can be located.

NOTE: the canonical, maintained production-step builder is
tools/collective_budget.py:lower_production_step (shardings attached,
parameterized n_devices) — this file and tools/compile_bisect.py keep
their own inline copies only to preserve the exact programs behind the
round-4 measurements they document.

Usage:
  env WDT_TEST_REEXEC=1 PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python tools/compile_diag.py [--batch_size 25600] [--sparse 1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=25600)
    ap.add_argument("--sparse", type=int, default=1)
    ap.add_argument("--compile", type=int, default=1,
                    help="0 = lower only (HLO stats, no backend compile)")
    args = ap.parse_args()

    import jax
    import numpy as np

    os.environ.setdefault("BENCH_BATCH_SIZE", str(args.batch_size))
    if not args.sparse:
        os.environ["BENCH_SPARSE"] = "0"
    import bench

    from wide_deep_tpu.config import Config
    from wide_deep_tpu.models.joint import build_model
    from wide_deep_tpu.optim import build_joint_optimizer
    from wide_deep_tpu.optim.sparse import plan_sparse_tables
    from wide_deep_tpu.parallel import mesh as mesh_lib
    from wide_deep_tpu.training.loop import build_training_plan
    from wide_deep_tpu.training.step import (init_opt_state, make_train_step)

    B = args.batch_size
    n_chips = jax.device_count()
    mesh = mesh_lib.make_mesh(n_chips, 1)
    config = Config()
    train_conf = dict(config.train)
    train_conf["batch_size"] = B
    train_conf["pack_budget"] = None
    if not args.sparse:
        train_conf["sparse_optimizer"] = False
    plan, explicit_lookup, _ = build_training_plan(
        config, train_conf, "wide_deep", n_dev=n_chips, n_procs=1)
    model = build_model(config, plan=plan, model_type="wide_deep")
    if explicit_lookup:
        from wide_deep_tpu.parallel.exchange import enable_explicit_lookup
        enable_explicit_lookup(model, mesh,
                               size_threshold=train_conf.get(
                                   "shard_threshold"))
    print(plan.describe(), file=sys.stderr)

    rng = np.random.default_rng(0)
    batch = bench.synthetic_batch(plan, B, rng)
    decay_steps = max(float(config.train["num_examples"]) / B, 1.0)
    sparse_tables, sparse_paths = plan_sparse_tables(
        plan, config.model, decay_steps, B, enabled=plan.sparse_opt)
    print(f"sparse tables: {sorted(sparse_tables)}", file=sys.stderr)
    tx = build_joint_optimizer(config.model, decay_steps,
                               {"linear": True, "dnn": True},
                               sparse_paths=sparse_paths)

    batch1 = {k: v[:1] for k, v in batch.items()}

    def init_all(r):
        params, mstate = model.init(r, batch1)
        from wide_deep_tpu.optim.sparse import init_fused_params
        params = init_fused_params(params, sparse_tables)
        return params, mstate, init_opt_state(tx, params, sparse_tables)

    rng0 = jax.random.PRNGKey(0)
    p_struct, m_struct, opt_struct = jax.eval_shape(init_all, rng0)

    step = make_train_step(model, tx, sparse_tables=sparse_tables, mesh=mesh)
    abstract_batch = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                      for k, v in batch.items()}
    key_struct = jax.ShapeDtypeStruct((2,), np.uint32)

    t0 = time.time()
    lowered = jax.jit(step).lower(p_struct, m_struct, opt_struct,
                                  abstract_batch, key_struct, 0)
    t_lower = time.time() - t0
    hlo = lowered.as_text()
    n_lines = hlo.count("\n")
    import collections
    ops = collections.Counter()
    for line in hlo.splitlines():
        line = line.strip()
        if "=" in line and not line.startswith(("//", "module", "func", "}")):
            rhs = line.split("=", 1)[1].strip()
            op = rhs.split("(")[0].split("<")[0].strip().strip('"')
            if op:
                ops[op.split()[0]] += 1
    print(f"lowered in {t_lower:.1f}s; stablehlo {n_lines} lines, "
          f"{len(hlo)/1e6:.1f} MB text", file=sys.stderr)
    for op, n in ops.most_common(25):
        print(f"  {n:6d}  {op}", file=sys.stderr)

    if args.compile:
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        print(f"compiled in {t_compile:.1f}s on "
              f"{jax.devices()[0].platform}", file=sys.stderr)
        try:
            mem = compiled.memory_analysis()
            print(f"memory: {mem}", file=sys.stderr)
        except Exception:
            pass
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            print({k: v for k, v in sorted(cost.items())
                   if k in ("flops", "bytes accessed")}, file=sys.stderr)
        except Exception:
            pass


if __name__ == "__main__":
    main()
