#!/usr/bin/env python
"""Profile WHERE the production train step's jit lowering time goes.

Round-4 finding (BENCH_PHASE_TIMERS): warmup = trace 0.6 s + lower ~89 s +
compile-or-cache-load ~58 s + execute 0.1 s on this 2-core host — the
persistent compilation cache cannot help with the first two.  This tool
cProfiles the lower() call and sizes the emitted module so the cost has a
name (giant inlined constants vs MLIR emission vs sharding propagation).

  timeout 900 python tools/lower_profile.py
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("BENCH_BATCH_SIZE", "25600")
    import jax
    import numpy as np

    from wide_deep_tpu.cache import enable_compilation_cache
    enable_compilation_cache()
    from wide_deep_tpu.config import Config
    from wide_deep_tpu.models.joint import build_model
    from wide_deep_tpu.optim import build_joint_optimizer
    from wide_deep_tpu.optim.sparse import plan_sparse_tables
    from wide_deep_tpu.parallel import mesh as mesh_lib
    from wide_deep_tpu.training.loop import build_training_plan
    from wide_deep_tpu.training.step import init_opt_state, make_train_step
    import bench

    B = bench.BATCH_SIZE
    config = Config()
    train_conf = dict(config.train)
    train_conf["batch_size"] = B
    train_conf["pack_budget"] = None
    mesh = mesh_lib.make_mesh(jax.device_count(), 1)
    plan, explicit_lookup, _ = build_training_plan(
        config, train_conf, "wide_deep", n_dev=jax.device_count(), n_procs=1)
    model = build_model(config, plan=plan, model_type="wide_deep")
    rng = np.random.default_rng(0)
    batch = bench.synthetic_batch(plan, B, rng)
    decay = float(config.train["num_examples"]) / B
    sparse_tables, sparse_paths = plan_sparse_tables(
        plan, config.model, max(decay, 1.0), B, enabled=plan.sparse_opt)
    tx = build_joint_optimizer(config.model, max(decay, 1.0),
                               {"linear": True, "dnn": True},
                               sparse_paths=sparse_paths)

    def init_all(r):
        params, mstate = model.init(r, {k: v[:1] for k, v in batch.items()})
        from wide_deep_tpu.optim.sparse import init_fused_params
        params = init_fused_params(params, sparse_tables)
        return params, mstate, init_opt_state(tx, params, sparse_tables)

    rng0 = jax.random.PRNGKey(0)
    p_struct, ms_struct, opt_struct = jax.eval_shape(init_all, rng0)
    step = make_train_step(model, tx, sparse_tables=sparse_tables, mesh=mesh)

    # abstract args — no device memory needed for trace/lower
    t0 = time.time()
    traced = step.trace(p_struct, ms_struct, opt_struct, batch,
                        jax.ShapeDtypeStruct((2,), np.uint32), 0)
    print(f"trace {time.time()-t0:.1f}s", flush=True)
    print(f"jaxpr eqns: {len(traced.jaxpr.eqns)}", flush=True)

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    lowered = traced.lower()
    prof.disable()
    print(f"lower {time.time()-t0:.1f}s", flush=True)
    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())

    t0 = time.time()
    blob = lowered.compiler_ir("stablehlo").operation.get_asm(
        binary=True, enable_debug_info=False)
    print(f"stablehlo bytes: {len(blob)/1e6:.1f} MB "
          f"(serialize {time.time()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
