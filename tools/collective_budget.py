#!/usr/bin/env python
"""Multi-chip collective budget: capture + check (VERDICT r3 weak #5).

Compiles the PRODUCTION train step (full config, fused sparse optimizer,
explicit sharded-embedding exchange) for an 8-device mesh on the virtual
CPU backend, sums the collective byte volume XLA actually emits, models
the expected per-step collective time on a v5e-8 ring
(wide_deep_tpu/parallel/hlo_stats.py), and writes collective_budget.json.

  capture:  env WDT_TEST_REEXEC=1 PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
              XLA_FLAGS=--xla_force_host_platform_device_count=8 \
              python tools/collective_budget.py capture
  check:    same env, `... check` — fails (exit 1) if any op kind's byte
            volume exceeds the committed budget by >15% or a new op kind
            appears.  Run by tests/test_collective_budget.py on every
            suite run, so a collective-volume regression that stays
            functionally correct still fails CI.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "collective_budget.json")

N_DEVICES = 8
BATCH_SIZE = 25600
TOLERANCE = 1.15


def lower_production_step(n_devices: int = N_DEVICES,
                          batch_size: int = BATCH_SIZE):
    """Lower the production train step for an n-device mesh with the real
    shardings (abstract args only — nothing allocated).  Returns the
    optimized HLO text."""
    import jax
    import numpy as np

    from wide_deep_tpu.config import Config
    from wide_deep_tpu.models.joint import build_model
    from wide_deep_tpu.optim import build_joint_optimizer
    from wide_deep_tpu.optim.sparse import (init_fused_params,
                                            plan_sparse_tables)
    from wide_deep_tpu.parallel import mesh as mesh_lib
    from wide_deep_tpu.training.loop import build_training_plan
    from wide_deep_tpu.training.step import init_opt_state, make_train_step

    model_ax = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
    mesh = mesh_lib.make_mesh(n_devices // model_ax, model_ax,
                              jax.devices()[:n_devices])
    config = Config()
    train_conf = dict(config.train)
    train_conf["batch_size"] = batch_size
    train_conf["pack_budget"] = None
    plan, explicit_lookup, _ = build_training_plan(
        config, train_conf, "wide_deep", n_dev=n_devices, n_procs=1)
    model = build_model(config, plan=plan, model_type="wide_deep")
    if explicit_lookup:
        from wide_deep_tpu.parallel.exchange import enable_explicit_lookup
        enable_explicit_lookup(model, mesh,
                               size_threshold=train_conf.get(
                                   "shard_threshold"))

    spec = plan.batch_spec(batch_size)
    abstract_batch = {
        k: jax.ShapeDtypeStruct(
            shape, dt, sharding=mesh_lib.batch_key_sharding(
                mesh, k, np.zeros(shape, dt),
                plan_sharded=plan.scatter_shards > 1))
        for k, (shape, dt) in spec.items()}

    decay = max(float(config.train["num_examples"]) / batch_size, 1.0)
    sparse_tables, sparse_paths = plan_sparse_tables(
        plan, config.model, decay, batch_size, enabled=plan.sparse_opt)
    tx = build_joint_optimizer(config.model, decay,
                               {"linear": True, "dnn": True},
                               sparse_paths=sparse_paths)

    batch1 = {k: np.zeros((1,) + v.shape[1:], v.dtype)
              for k, v in abstract_batch.items()}

    def init_all(r):
        params, mstate = model.init(r, batch1)
        params = init_fused_params(params, sparse_tables)
        return params, mstate, init_opt_state(tx, params, sparse_tables)

    p_s, m_s, o_s = jax.eval_shape(init_all, jax.random.PRNGKey(0))
    shardings = mesh_lib.param_shardings(mesh, p_s)
    opt_sh = mesh_lib.opt_state_shardings(mesh, p_s, shardings, o_s)

    def attach(structs, shs):
        return jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            structs, shs)

    repl = mesh_lib.replicated(mesh)
    p_s = attach(p_s, shardings)
    m_s = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl), m_s)
    o_s = attach(o_s, opt_sh)

    step = make_train_step(model, tx, sparse_tables=sparse_tables, mesh=mesh)
    lowered = jax.jit(step).lower(
        p_s, m_s, o_s, abstract_batch,
        jax.ShapeDtypeStruct((2,), np.uint32), 0)
    return lowered.compile().as_text(), plan, sparse_tables


def capture(path: str = BUDGET_PATH) -> dict:
    from wide_deep_tpu.parallel.hlo_stats import (
        V5E_ICI_ONEWAY_BYTES_PER_S, collective_summary,
        expected_collective_ms)
    hlo, plan, sparse_tables = lower_production_step()
    summary = collective_summary(hlo)
    ms = expected_collective_ms(summary, N_DEVICES)
    budget = {
        "n_devices": N_DEVICES,
        "batch_size": BATCH_SIZE,
        "mesh": f"{N_DEVICES // 2}x2 (data x model)",
        "sparse_tables": sorted(sparse_tables),
        "per_op": summary,
        "total_bytes": sum(e["total_bytes"] for e in summary.values()),
        "expected_collective_ms_v5e8": round(ms, 3),
        "assumptions": {
            "link_model": "ring; all-reduce 2B(n-1)/n, all-gather B(n-1)/n,"
                          " reduce-scatter (per-shard result)*(n-1),"
                          " permute B, +1us/collective",
            "ici_oneway_bytes_per_s": V5E_ICI_ONEWAY_BYTES_PER_S,
            "hardware": "v5e-8 (2x4 ICI ring), public scaling-book figure",
        },
        "tolerance": TOLERANCE,
    }
    with open(path, "w") as f:
        json.dump(budget, f, indent=2, sort_keys=True)
        f.write("\n")
    return budget


def check(path: str = BUDGET_PATH) -> list:
    """-> list of violation strings (empty = within budget)."""
    from wide_deep_tpu.parallel.hlo_stats import collective_summary
    with open(path) as f:
        budget = json.load(f)
    hlo, _, _ = lower_production_step(budget["n_devices"],
                                      budget["batch_size"])
    summary = collective_summary(hlo)
    tol = budget.get("tolerance", TOLERANCE)
    problems = []
    for op, e in summary.items():
        allowed = budget["per_op"].get(op)
        if allowed is None:
            problems.append(f"new collective kind {op}: "
                            f"{e['total_bytes']}B x{e['count']}")
            continue
        if e["total_bytes"] > allowed["total_bytes"] * tol:
            problems.append(
                f"{op}: {e['total_bytes']}B exceeds budget "
                f"{allowed['total_bytes']}B x{tol}")
        # a count explosion at constant bytes is pure launch latency
        # (the modeled +1us/collective term) — gate it too
        if e["count"] > allowed["count"] * 2:
            problems.append(
                f"{op}: count {e['count']} exceeds 2x budget "
                f"{allowed['count']}")
    # a budgeted kind VANISHING is parser/backend drift, not a win —
    # without this, an emission-form change (e.g. async '-start' names)
    # could empty the summary and make the gate vacuous
    for op in budget["per_op"]:
        if op not in summary:
            problems.append(
                f"budgeted collective kind {op} missing from the compiled "
                f"program — backend/parser drift; re-capture the budget "
                f"after verifying hlo_stats.COLLECTIVES still matches")
    total = sum(e["total_bytes"] for e in summary.values())
    if total > budget["total_bytes"] * tol:
        problems.append(f"total {total}B exceeds budget "
                        f"{budget['total_bytes']}B x{tol}")
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["capture", "check"])
    ap.add_argument("--path", default=BUDGET_PATH)
    args = ap.parse_args()
    if args.mode == "capture":
        budget = capture(args.path)
        print(json.dumps(budget, indent=2, sort_keys=True))
        return 0
    problems = check(args.path)
    for p in problems:
        print(f"VIOLATION: {p}")
    if not problems:
        print("collective volume within budget")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
