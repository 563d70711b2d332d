"""Compiled SPMD train / eval / predict steps.

The reference ran a TF1 MonitoredSession loop over a graph built once
(/root/reference/python/lib/joint.py:81-269); here each step is a single
jit'd pure function over (params, state, opt_state, batch) with donated
inputs, traced once per shape and compiled by XLA for the mesh.  Gradients,
the per-arm optimizer updates and the BN state advance all happen inside the
one compiled step — on a mesh this includes the all-reduces (dense params)
and collective scatter-adds (row-sharded tables) XLA derives from the
sharding annotations.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from wide_deep_tpu import metrics as metrics_lib
from wide_deep_tpu.models.joint import WideDeep


def make_train_step(model: WideDeep, tx: optax.GradientTransformation,
                    donate: bool = True, with_summaries: bool = False,
                    sparse_tables: Optional[Dict[str, Any]] = None,
                    mesh=None, defer_sparse: bool = False):
    """Returns jit'd step: (params, mstate, opt_state, batch, rng, step)
    -> (params, mstate, opt_state, loss[, stats]).

    ``with_summaries`` adds a dict of per-layer activation scalars
    (zero-fraction/mean/std — the reference's add_layer_summary stats) to the
    outputs; they are collected at trace time through models.deep's summary
    sink, so the overhead is a handful of fused reductions.

    ``sparse_tables`` ({name: optim.sparse.SparseTable}) routes those params
    around the dense optax transforms: the step updates only the rows named
    by the batch ids (reference SparseApplyAdagrad/Ftrl semantics,
    joint.py:224-262).  The opt_state then has the shape
    ``{"dense": <optax state>, "sparse": {name: slots}}`` (init with
    ``init_opt_state``).

    ``defer_sparse``: pipeline the fused sparse-table update one step —
    the step applies the PREVIOUS call's pending (row grads + compact
    plan), stored under opt_state["sparse_pending"], at its start (where
    the update's gather/kernel/row-DMA chain overlaps the other tables'
    independent forward gathers instead of serializing after backward)
    and stashes this call's instead of applying it.  Identical math one
    step late; callers must FLUSH the pending before eval/checkpoint
    (``make_flush_step``).  Only the single-shard fused compact path
    supports it."""
    sparse_tables = sparse_tables or {}

    def step(params, mstate, opt_state, batch, rng, step_idx):
        rng = jax.random.fold_in(rng, step_idx)
        if defer_sparse:
            # apply LAST step's pending fused updates first: the chain
            # depends only on (pending, its table), so its DMA overlaps
            # the other tables' forward gathers issued right after
            from wide_deep_tpu.optim import sparse as sparse_lib
            sp_state = dict(opt_state["sparse"])
            pending = opt_state["sparse_pending"]
            interpret = jax.default_backend() == "cpu"
            for name, table in sparse_tables.items():
                assert table.fused, (
                    f"{name}: defer_sparse supports fused tables only")
                p = pending[name]
                param = sparse_lib.tree_get(params, table.path)
                param, sp_state[name] = sparse_lib.apply_fused_update(
                    table, param, p["rg"],
                    {k: p[k] for k in ("uids", "ids", "perm", "tiles")},
                    sp_state[name], interpret=interpret)
                params = sparse_lib.tree_set(params, table.path, param)
            opt_state = dict(opt_state, sparse=sp_state)
        # compact sparse tables: tables whose batch carries a dedup plan
        # (sopt_*, ops/scatter.make_compact_plan).  A zeros '_sparse_rows'
        # sink rides the param tree so value_and_grad yields the COMPACT
        # per-entry cotangent (models/deep.py adds it to the stop-gradded
        # gather) — the dense [rows, D] table gradient never exists.
        compact = {name: t for name, t in sparse_tables.items()
                   if f"sopt_uids_{t.path[-1]}" in batch}
        if compact:
            from wide_deep_tpu.optim.sparse import tree_get
            sinks = {}
            for t in compact.values():
                tbl = tree_get(params, t.path)
                ids = batch[t.ids_key]
                # fused tables carry optimizer slots in extra columns; the
                # sink (and so the compact cotangent) covers only the
                # embedding dim, in the model's embedding dtype
                dim = t.dim if t.fused else tbl.shape[1]
                dt = t.sink_dtype if t.fused else tbl.dtype
                sinks[t.path[-1]] = jnp.zeros(ids.shape + (dim,), dt)
            params_g = dict(params, dnn=dict(params["dnn"],
                                             _sparse_rows=sinks))
        else:
            params_g = params
        grad_fn = jax.value_and_grad(model.loss_fn, has_aux=True)
        if with_summaries:
            (loss, (new_mstate, _, _, stats)), grads = grad_fn(
                params_g, mstate, batch, True, rng, True)
        else:
            (loss, (new_mstate, _, _)), grads = grad_fn(
                params_g, mstate, batch, True, rng)
        sink_grads = {}
        if compact:
            sink_grads = grads["dnn"]["_sparse_rows"]
            grads = dict(grads, dnn={k: v for k, v in grads["dnn"].items()
                                     if k != "_sparse_rows"})
        if defer_sparse:
            # stash this step's compact grads + plan as the NEXT call's
            # pending instead of applying them now
            from wide_deep_tpu.optim import sparse as sparse_lib
            updates, dense_state = tx.update(grads, opt_state["dense"],
                                             params)
            params = optax.apply_updates(params, updates)
            new_pending = {}
            for name, table in sparse_tables.items():
                assert name in compact, (
                    f"{name}: defer_sparse requires the compact plan "
                    f"(sopt_*) in every batch")
                dim_key = table.path[-1]
                assert f"sopt_ok_{dim_key}" not in batch, (
                    f"{name}: defer_sparse does not support per-shard "
                    f"plans")
                rg = sink_grads[dim_key]
                # copies, not batch aliases: the stash is donated on the
                # NEXT call, and an output aliased to an undonated input
                # would delete the caller's (possibly reused) batch array
                new_pending[name] = {
                    "rg": rg.reshape(-1, rg.shape[-1]),
                    **{k: jnp.copy(batch[f"sopt_{k}_{dim_key}"])
                       for k in ("uids", "ids", "perm", "tiles")}}
            opt_state = {"dense": dense_state,
                         "sparse": opt_state["sparse"],
                         "sparse_pending": new_pending}
        elif sparse_tables:
            from wide_deep_tpu.optim import sparse as sparse_lib
            updates, dense_state = tx.update(grads, opt_state["dense"],
                                             params)
            params = optax.apply_updates(params, updates)
            sp_state = dict(opt_state["sparse"])
            interpret = jax.default_backend() == "cpu"
            for name, table in sparse_tables.items():
                param = sparse_lib.tree_get(params, table.path)
                if name in compact:
                    dim_key = table.path[-1]
                    rg = sink_grads[dim_key]
                    if f"sopt_ok_{dim_key}" in batch:
                        # per-table-shard plans: row shards update inside
                        # shard_map (multi-device meshes)
                        assert table.fused and mesh is not None, (
                            f"{name}: sharded compact plans need a fused "
                            f"table and the mesh (make_train_step(mesh=))")
                        plan_arrays = {
                            k: batch[f"sopt_{k}_{dim_key}"]
                            for k in ("uids", "ids", "perm", "tiles", "ok",
                                      "live")
                            if f"sopt_{k}_{dim_key}" in batch}
                        param, sp_state[name] = (
                            sparse_lib.apply_fused_sharded_update(
                                table, param,
                                rg.reshape(-1, rg.shape[-1]),
                                batch[table.ids_key], plan_arrays,
                                sp_state[name], mesh,
                                interpret=interpret))
                    else:
                        plan_arrays = {
                            k: batch[f"sopt_{k}_{dim_key}"]
                            for k in ("uids", "ids", "perm", "tiles")}
                        apply = (sparse_lib.apply_fused_update
                                 if table.fused
                                 else sparse_lib.apply_compact_update)
                        param, sp_state[name] = apply(
                            table, param, rg.reshape(-1, rg.shape[-1]),
                            plan_arrays, sp_state[name],
                            interpret=interpret)
                else:
                    assert not table.fused, (
                        f"{name}: fused table but the batch carries no "
                        f"sopt_* compact plan — fused layouts require the "
                        f"compact path (features/pipeline.py train batches)")
                    grad = sparse_lib.tree_get(grads, table.path)
                    param, sp_state[name] = sparse_lib.apply_sparse_update(
                        table, param, grad, batch[table.ids_key],
                        sp_state[name])
                params = sparse_lib.tree_set(params, table.path, param)
            opt_state = {"dense": dense_state, "sparse": sp_state}
        else:
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        if with_summaries:
            return params, new_mstate, opt_state, loss, stats
        return params, new_mstate, opt_state, loss

    kwargs = {"donate_argnums": (0, 1, 2)} if donate else {}
    return jax.jit(step, **kwargs)


def init_opt_state(tx: optax.GradientTransformation, params,
                   sparse_tables: Optional[Dict[str, Any]] = None):
    """Optimizer-state init matching make_train_step's expectations."""
    if not sparse_tables:
        return tx.init(params)
    from wide_deep_tpu.optim import sparse as sparse_lib
    return {
        "dense": tx.init(params),
        "sparse": {
            name: sparse_lib.init_table_state(
                t, sparse_lib.tree_get(params, t.path))
            for name, t in sparse_tables.items()},
    }


def make_flush_step(sparse_tables: Dict[str, Any]):
    """Companion to ``make_train_step(defer_sparse=True)``: applies the
    stashed pending fused update so ``params`` reflects every trained
    step — call before eval / checkpoint / export.  Returns jit'd
    ``(params, opt_state) -> (params, opt_state)``; the flushed pending
    keeps its plan with ZERO grads, so a later step's apply of it is a
    weight no-op (the extra lr-count tick is the documented cost of a
    flush)."""

    def flush(params, opt_state):
        from wide_deep_tpu.optim import sparse as sparse_lib
        sp_state = dict(opt_state["sparse"])
        pending = dict(opt_state["sparse_pending"])
        interpret = jax.default_backend() == "cpu"
        for name, table in sparse_tables.items():
            p = pending[name]
            param = sparse_lib.tree_get(params, table.path)
            param, sp_state[name] = sparse_lib.apply_fused_update(
                table, param, p["rg"],
                {k: p[k] for k in ("uids", "ids", "perm", "tiles")},
                sp_state[name], interpret=interpret)
            params = sparse_lib.tree_set(params, table.path, param)
            pending[name] = dict(p, rg=jnp.zeros_like(p["rg"]))
        return params, dict(opt_state, sparse=sp_state,
                            sparse_pending=pending)

    return jax.jit(flush, donate_argnums=(0, 1))


def make_eval_step(model: WideDeep):
    """Returns jit'd step folding one batch into the metric accumulators."""

    def step(params, mstate, batch, acc):
        loss, (_, per_ex, preds) = model.loss_fn(
            params, mstate, batch, training=False)
        if model.n_classes == 2:
            probs = preds["logistic"]
            correct = None  # default (p >= 0.5) == label
        else:
            # multiclass: accuracy from argmax(probabilities) == label; the
            # probs vector only feeds the (dropped) threshold metrics
            probs = jnp.max(preds["probabilities"], axis=-1)
            correct = (preds["class_ids"]
                       == batch["label"].astype(jnp.int32))
        w = batch["weight"] * batch["mask"]
        acc = metrics_lib.update_metrics(acc, probs, batch["label"], w, per_ex,
                                         correct=correct)
        return acc

    return jax.jit(step, donate_argnums=(3,))


def make_predict_step(model: WideDeep):
    def step(params, mstate, batch):
        return model.predict(params, mstate, batch)
    return jax.jit(step)
