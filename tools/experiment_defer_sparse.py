#!/usr/bin/env python
"""Step-time experiment: defer the fused d32 optimizer chain one step.

The round-4 profile attributes ~3 ms of the 31.7 ms step to the fused
sparse-optimizer chain (compact-grad kernel + row gather + formulas +
row-DMA write-back) sitting AFTER backward on the critical path.  With
``make_train_step(defer_sparse=True)`` the chain runs at the START of the
next step, where its only dependency is the d32 table — XLA can overlap
its DMA with the d8/d4 forward gathers.  This tool measures both variants
on the same program and prints the delta; result feeds either a bench.py
integration or a dead-end entry in ARCHITECTURE.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wide_deep_tpu.cache import enable_compilation_cache
    enable_compilation_cache()
    import bench
    from wide_deep_tpu.training.step import make_train_step

    prog = bench.make_program()
    mesh_lib, mesh = prog.mesh_lib, prog.mesh
    dbatch = {k: jax.device_put(v, mesh_lib.batch_key_sharding(
                  mesh, k, v, plan_sharded=prog.plan.scatter_shards > 1))
              for k, v in prog.batch.items()}
    key = jax.random.PRNGKey(0)

    order = os.environ.get("DEFER_ORDER", "defer,baseline").split(",")
    results = {}
    for tag in order:
        defer = tag == "defer"
        # fresh init per variant: donation consumes the state buffers, and
        # the chip cannot hold two live copies of the 5 GB fused table
        t0 = time.time()
        params, mstate, opt_state = jax.jit(
            prog.init_all, out_shardings=(prog.shardings,
                                          mesh_lib.replicated(mesh),
                                          prog.opt_sh))(prog.rng0)
        print(f"{tag}: init {time.time()-t0:.1f}s", flush=True)
        step = make_train_step(prog.model, prog.tx,
                               sparse_tables=prog.sparse_tables,
                               mesh=mesh, defer_sparse=defer)
        st = {"dense": opt_state["dense"], "sparse": opt_state["sparse"]}
        if defer:
            # the zero-grad seed apply ticks the lr count; start at -1 so
            # step k's grads always apply at count k (matches immediate)
            st["sparse"] = {
                name: dict(s, count=jnp.asarray(-1, jnp.int32))
                for name, s in st["sparse"].items()}
            # seed pending with the real batch's plan and ZERO grads (a
            # mathematical no-op apply on the first deferred step).
            # COPIES, not dbatch references: the step donates opt_state,
            # so aliasing the (undonated, reused) batch arrays into it
            # would delete them out from under the next call.
            st["sparse_pending"] = {
                name: {"rg": jnp.zeros(
                           (np.asarray(prog.batch[table.ids_key]).size,
                            table.dim), table.sink_dtype),
                       **{k: jnp.copy(dbatch[f"sopt_{k}_{table.path[-1]}"])
                          for k in ("uids", "ids", "perm", "tiles")}}
                for name, table in prog.sparse_tables.items()}
        p, ms = params, mstate
        t0 = time.time()
        for i in range(3):
            p, ms, st, loss = step(p, ms, st, dbatch, key, i)
        jax.block_until_ready(loss)
        print(f"{tag}: warmup {time.time()-t0:.1f}s loss={float(loss):.4f}",
              flush=True)
        t0 = time.time()
        N = 20
        for i in range(N):
            p, ms, st, loss = step(p, ms, st, dbatch, key, 3 + i)
        jax.block_until_ready(loss)
        dt = time.time() - t0
        results[tag] = dt / N * 1e3
        print(f"{tag}: {N} steps in {dt:.2f}s -> {dt/N*1e3:.2f} ms/step",
              flush=True)
        del p, ms, st, params, mstate, opt_state, step
        import gc
        gc.collect()

    print(f"RESULT baseline={results.get('baseline', 0):.2f} ms "
          f"defer={results.get('defer', 0):.2f} ms "
          f"delta={results.get('baseline', 0)-results.get('defer', 0):+.2f}")


if __name__ == "__main__":
    main()
