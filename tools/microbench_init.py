#!/usr/bin/env python
"""Instrument bench.py's init path: trace / compile / execute split for the
model-init and opt-init programs, with and without merging them into one
jitted program.  Drives VERDICT round-2 item 8 (init 53.8 s -> target <20 s).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from wide_deep_tpu.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from wide_deep_tpu.config import Config
    from wide_deep_tpu.features.plan import FeaturePlan
    from wide_deep_tpu.models.joint import build_model
    from wide_deep_tpu.optim import build_joint_optimizer
    from wide_deep_tpu.optim.sparse import plan_sparse_tables
    from wide_deep_tpu.parallel import mesh as mesh_lib
    from wide_deep_tpu.training.step import init_opt_state
    from bench import synthetic_batch, BATCH_SIZE

    cache = jax.config.jax_compilation_cache_dir
    n_entries = len(os.listdir(cache)) if cache and os.path.isdir(cache) else 0
    print(f"cache dir: {cache} ({n_entries} entries)")

    mesh = mesh_lib.make_mesh(1, 1, jax.devices()[:1])
    config = Config()
    plan = FeaturePlan(config, pallas_scatter=True, sparse_opt=True)
    model = build_model(config, plan=plan, model_type="wide_deep")
    rng = np.random.default_rng(0)
    batch = synthetic_batch(plan, BATCH_SIZE, rng)
    batch1 = {k: v[:1] for k, v in batch.items()}

    decay_steps = float(config.train["num_examples"]) / BATCH_SIZE
    sparse_tables, sparse_paths = plan_sparse_tables(
        plan, config.model, max(decay_steps, 1.0), BATCH_SIZE, enabled=True)
    tx = build_joint_optimizer(config.model, max(decay_steps, 1.0),
                               {"linear": True, "dnn": True},
                               sparse_paths=sparse_paths)
    rng0 = jax.random.PRNGKey(0)

    def timed(tag, fn):
        t0 = time.time()
        out = fn()
        print(f"{tag}: {time.time()-t0:.1f}s", flush=True)
        return out

    # ------- merged single-program init (everything in one compile)
    def init_all(r):
        params, mstate = model.init(r, batch1)
        return params, mstate, init_opt_state(tx, params, sparse_tables)

    p_struct, _, opt_struct = timed(
        "eval_shape(all)", lambda: jax.eval_shape(init_all, rng0))
    shardings = mesh_lib.param_shardings(mesh, p_struct)
    opt_sh = mesh_lib.opt_state_shardings(mesh, p_struct, shardings,
                                          opt_struct)
    jit_all = jax.jit(init_all, out_shardings=(
        shardings, mesh_lib.replicated(mesh), opt_sh))
    lowered = timed("lower(all)", lambda: jit_all.lower(rng0))
    compiled = timed("compile(all)", lambda: lowered.compile())
    out = timed("execute(all)", lambda: jax.block_until_ready(compiled(rng0)))
    del out


if __name__ == "__main__":
    main()
