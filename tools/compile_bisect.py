#!/usr/bin/env python
"""Bisect the 710 s cold TPU compile (VERDICT r3 weak #3).

AOT-lowers and compiles pieces of the production train step on the real
TPU, timing each, to locate which construct costs the minutes.  Abstract
args only — nothing is allocated or transferred.

  timeout 1700 python tools/compile_bisect.py --pieces kernels,sparse,full
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_compile(name, lowered):
    t0 = time.time()
    lowered.compile()
    print(f"[{name}] compiled in {time.time()-t0:.1f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pieces", default="kernels,sparse,full")
    ap.add_argument("--batch_size", type=int, default=25600)
    args = ap.parse_args()
    pieces = set(args.pieces.split(","))

    import jax
    import jax.numpy as jnp
    import numpy as np
    print("devices:", jax.devices(), flush=True)

    B = args.batch_size
    ROWS = 10000128
    D = 32
    FUSED = 128
    N = B  # one id per example for the d32 slot (pool=1)

    f32 = jnp.float32
    i32 = jnp.int32

    if "kernels" in pieces:
        from wide_deep_tpu.ops.rowdma import rowdma_scatter_rows
        from wide_deep_tpu.ops.scatter import make_compact_plan, n_tiles_for

        # shapes of the plan arrays at production size
        plan = make_compact_plan(np.zeros(N, np.int64), ROWS)
        shapes = {k: (v.shape, v.dtype) for k, v in plan.items()}
        print("compact plan shapes:", {k: s for k, (s, _) in shapes.items()},
              flush=True)

        def just_rowdma(fused, uids, rows):
            return rowdma_scatter_rows(fused, uids, rows)

        low = jax.jit(just_rowdma).lower(
            jax.ShapeDtypeStruct((ROWS, FUSED), f32),
            jax.ShapeDtypeStruct(plan["uids"].shape, i32),
            jax.ShapeDtypeStruct((plan["uids"].shape[0], FUSED), f32))
        timed_compile("rowdma", low)

        from wide_deep_tpu.ops.scatter import range_scatter_add
        t = plan["tiles"]

        def just_range(ids, g, t0_, t1, t2, t3):
            return range_scatter_add(ids, g, t0_, t1, t2, t3, N,
                                     out_dtype=f32)

        low = jax.jit(just_range).lower(
            jax.ShapeDtypeStruct(plan["ids"].shape, i32),
            jax.ShapeDtypeStruct((N, D), f32),
            *[jax.ShapeDtypeStruct(t[i].shape, t.dtype) for i in range(4)])
        timed_compile("range_scatter_add", low)

    if "sparse" in pieces:
        from wide_deep_tpu.config import Config
        from wide_deep_tpu.optim.sparse import (SparseTable,
                                                apply_fused_update,
                                                fused_layout)
        from wide_deep_tpu.ops.scatter import make_compact_plan
        config = Config()
        spec = config.model["dnn_optimizer"]
        table = SparseTable(name="dnn.embed.d32",
                            path=("dnn", "embed", "d32"),
                            ids_key="emb_ids_d32", spec=spec, lr=0.01,
                            dim=D, fused=True, sink_dtype=f32)
        plan = make_compact_plan(np.zeros(N, np.int64), ROWS)

        def upd(fused, row_grads, pa, count):
            return apply_fused_update(table, fused, row_grads, pa,
                                      {"count": count})

        pa_abs = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                  for k, v in plan.items()}
        low = jax.jit(upd).lower(
            jax.ShapeDtypeStruct((ROWS, FUSED), f32),
            jax.ShapeDtypeStruct((N, D), f32),
            pa_abs, jax.ShapeDtypeStruct((), i32))
        timed_compile("apply_fused_update", low)

    if "full" in pieces or "full_nosparse" in pieces:
        import bench
        from wide_deep_tpu.config import Config
        from wide_deep_tpu.models.joint import build_model
        from wide_deep_tpu.optim import build_joint_optimizer
        from wide_deep_tpu.optim.sparse import plan_sparse_tables
        from wide_deep_tpu.parallel import mesh as mesh_lib
        from wide_deep_tpu.training.loop import build_training_plan
        from wide_deep_tpu.training.step import (init_opt_state,
                                                 make_train_step)
        for tag, sparse_on in (("full", True), ("full_nosparse", False)):
            if tag not in pieces:
                continue
            config = Config()
            train_conf = dict(config.train)
            train_conf["batch_size"] = B
            train_conf["pack_budget"] = None
            if not sparse_on:
                train_conf["sparse_optimizer"] = False
            plan, explicit_lookup, _ = build_training_plan(
                config, train_conf, "wide_deep", n_dev=1, n_procs=1)
            model = build_model(config, plan=plan, model_type="wide_deep")
            mesh = mesh_lib.make_mesh(1, 1)
            rng = np.random.default_rng(0)
            batch = bench.synthetic_batch(plan, B, rng)
            decay = max(float(config.train["num_examples"]) / B, 1.0)
            st, sp = plan_sparse_tables(plan, config.model, decay, B,
                                        enabled=plan.sparse_opt)
            tx = build_joint_optimizer(config.model, decay,
                                       {"linear": True, "dnn": True},
                                       sparse_paths=sp)
            batch1 = {k: v[:1] for k, v in batch.items()}

            def init_all(r):
                params, mstate = model.init(r, batch1)
                from wide_deep_tpu.optim.sparse import init_fused_params
                params = init_fused_params(params, st)
                return params, mstate, init_opt_state(tx, params, st)

            p_s, m_s, o_s = jax.eval_shape(init_all, jax.random.PRNGKey(0))
            step = make_train_step(model, tx, sparse_tables=st, mesh=mesh)
            ab = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                  for k, v in batch.items()}
            low = jax.jit(step).lower(p_s, m_s, o_s, ab,
                                      jax.ShapeDtypeStruct((2,), np.uint32),
                                      0)
            timed_compile(tag, low)


if __name__ == "__main__":
    main()
