"""Sparse touched-rows optimizer updates for large embedding tables.

The reference's optimizers run as ``SparseApplyFtrl`` / ``SparseApplyAdagrad``
/ ``SparseApplyProximalAdagrad`` over the ``IndexedSlices`` gradients of
embedding lookups (tf optimizer.minimize on joint.py:224-262): only rows
touched by the batch are read or written.  Round 1 swept every table row
densely each step — ~3-7 ms/step of pure HBM traffic for the 10M-row dim-32
table at batch 25600, for updates that are zero almost everywhere.

Here eligible tables are excluded from the dense optax transforms
(optim.build_joint_optimizer labels them ``optax.set_to_zero``) and the
train step applies the update to touched rows only:

    g_rows = dense_grad[ids]          # XLA's backward scatter already
                                      # deduplicated (summed) per-row grads
    state_rows = state[ids]
    new_w, new_state = formula(g_rows, state_rows, w[ids], lr(count))
    state = state.at[ids].set(new_state)   # duplicate ids write identical
    w = w.at[ids].set(new_w)               # values -> deterministic

Exactness: for Adagrad/FTRL/SGD a zero-gradient row is a fixed point of the
dense update, so sparse == dense everywhere.  For ProximalAdagrad the dense
sweep shrinks *untouched* rows (l1/l2 proximal step every step); the sparse
form shrinks only touched rows — which is exactly the reference's
SparseApplyProximalAdagrad behavior, so the divergence is a deliberate
reference-parity fix, asserted in tests/test_sparse_optim.py.

**Two generations of this path (v5e, batch 25600, production config):**

1. Dense-grad sparse (apply_sparse_update): reads the dense XLA backward
   gradient, gathers/updates/scatters touched rows.  Measured 3.7 ms
   SLOWER than the dense sweep (102.5 -> 106.2 ms, round 2) because the
   dense [rows, D] gradient still exists; kept as the fallback when no
   compact plan is available (multi-device meshes, hand-built steps).
2. **Compact sparse (apply_compact_update, round 3, the default path)**:
   gradients flow to the GATHERED ROWS only (models/deep.py
   '_sparse_rows' sink + stop_gradient on the table), the batch's dedup
   plan + the Pallas range kernel sum duplicate entries, and one gather +
   formula + sorted-unique scatter-add updates exactly the touched rows.
   The dense gradient and the full-table optimizer sweep never exist:
   45.8 -> 44.3 ms end-to-end; the residual cost is the XLA serial
   scatter write-back (~2 ns/byte — ARCHITECTURE.md round-3 log).

Both give exact reference SparseApply* semantics — notably
SparseApplyProximalAdagrad, whose dense form shrinks untouched rows every
step while the sparse form (and the reference) does not.  Enabled by
train.yaml ``sparse_optimizer`` (default true; single-process meshes).

Eligibility (plan_sparse_tables, when enabled): unfolded embed dim-group
tables with rows >= SPARSE_MIN_ROWS whose fused layout fits FUSED_WIDTH
(plan.sparse_opt_group — DELIBERATELY batch-size independent, because the
decision also fixes the PARAM LAYOUT and init/train/eval/pred must agree).
On the production config this selects exactly the unfolded 10M-row dim-32
table.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from wide_deep_tpu.optim import ScalarOrSchedule, _lr_at, exponential_decay

SPARSE_MIN_ROWS = 1 << 22      # tables smaller than this sweep faster densely

SPARSE_CAPABLE = ("Adagrad", "ProximalAdagrad", "Ftrl", "SGD")


@dataclasses.dataclass(frozen=True)
class SparseTable:
    """One sparsely-updated table: param location + batch id source."""

    name: str                      # state key, e.g. "dnn.embed.d32"
    path: Tuple[Any, ...]          # param tree path ("dnn", "embed", "d32")
    ids_key: str                   # batch key holding [B, P] ids
    spec: Dict[str, Any]           # optimizer spec (config.parse_optimizer_spec)
    lr: ScalarOrSchedule
    dim: int = 0                   # embedding dim (param columns)
    fused: bool = False            # param stored as f32 [rows, FUSED_WIDTH]
                                   # with slots fused (ops/rowdma.py)
    sink_dtype: Any = None         # dtype of the '_sparse_rows' grad sink


def tree_get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def tree_set(tree, path, value):
    """Functional set on nested dicts (copies along the path only)."""
    if not path:
        return value
    out = dict(tree)
    out[path[0]] = tree_set(tree[path[0]], path[1:], value)
    return out


def _n_slots(spec: Dict[str, Any]) -> int:
    return {"SGD": 0, "Adagrad": 1, "ProximalAdagrad": 1, "Ftrl": 2}[
        spec["name"]]


def fused_layout(spec: Dict[str, Any], dim: int) -> Dict[str, int]:
    """Column offsets of the optimizer slots inside a fused [rows, 128]
    table (param occupies cols [0, dim)); see ops/rowdma.py for why the
    row must be exactly one 128-lane f32 tile."""
    names = _SLOT_KEYS[:_n_slots(spec)]
    return {k: (i + 1) * dim for i, k in enumerate(names)}


def plan_sparse_tables(plan, model_conf, decay_steps: float, batch_size: int,
                       enabled: bool = True
                       ) -> Tuple[Dict[str, SparseTable], frozenset]:
    """Pick tables worth sparse updates -> ({name: SparseTable}, paths).

    The table set derives from ``plan.sparse_opt_group`` — the SAME
    predicate models/deep.py uses to pick the fused param layout — so the
    step's routing and the param shapes cannot drift."""
    spec = model_conf["dnn_optimizer"]
    if not enabled or spec["name"] not in SPARSE_CAPABLE:
        return {}, frozenset()
    from wide_deep_tpu.ops.rowdma import FUSED_WIDTH
    lr0 = spec.get("learning_rate",
                   model_conf["dnn_initial_learning_rate"])
    schedule = exponential_decay(
        lr0, model_conf.get("dnn_decay_rate", 1.0), decay_steps)
    sink_dtype = (jnp.bfloat16
                  if model_conf.get("embedding_dtype") == "bfloat16"
                  else jnp.float32)
    out: Dict[str, SparseTable] = {}
    for g in plan.groups:
        if plan.sparse_opt_group(g, batch_size):
            name = f"dnn.embed.d{g.dim}"
            assert (1 + _n_slots(spec)) * g.dim <= FUSED_WIDTH, (
                "sparse_opt_group admitted a group whose fused layout "
                "doesn't fit — predicate drift vs features/plan.py")
            out[name] = SparseTable(
                name=name, path=("dnn", "embed", f"d{g.dim}"),
                ids_key=f"emb_ids_d{g.dim}", spec=spec, lr=schedule,
                dim=g.dim, fused=True, sink_dtype=sink_dtype)
    return out, frozenset(t.path for t in out.values())


# ------------------------------------------------------------- row formulas
def init_table_state(table: SparseTable, param: jnp.ndarray) -> Dict[str, Any]:
    """Per-table optimizer slots; mirrors the dense transforms' init exactly
    (optim/__init__.py) so sparse == dense is testable bit-for-bit.

    Fused tables keep their slots INSIDE the param matrix (initialized by
    init_fused_params), so their state is just the step count."""
    spec = table.spec
    name = spec["name"]
    st: Dict[str, Any] = {"count": jnp.zeros([], jnp.int32)}
    if table.fused:
        return st
    if name in ("Adagrad", "ProximalAdagrad"):
        init_acc = spec.get("initial_accumulator_value", 0.1)
        st["accum"] = jnp.full_like(param, init_acc)
    elif name == "Ftrl":
        init_acc = spec.get("initial_accumulator_value", 0.1)
        st["accum"] = jnp.full_like(param, init_acc)
        st["linear"] = jnp.zeros_like(param)
    return st


def _slot_init_value(spec: Dict[str, Any], key: str) -> float:
    return (spec.get("initial_accumulator_value", 0.1)
            if key == "accum" else 0.0)


def init_fused_params(params, sparse_tables: Dict[str, SparseTable]):
    """Set the optimizer-slot column blocks of fused tables to their init
    values (models/deep.py creates them zeroed).  Call once inside the
    jitted init program, right after model.init."""
    for t in (sparse_tables or {}).values():
        if not t.fused:
            continue
        p = tree_get(params, t.path)
        for key, off in fused_layout(t.spec, t.dim).items():
            val = _slot_init_value(t.spec, key)
            if val:
                p = p.at[:, off:off + t.dim].set(val)
        params = tree_set(params, t.path, p)
    return params


def fused_param_view(param: jnp.ndarray, dim: int) -> jnp.ndarray:
    """The embedding columns of a fused [rows, FUSED_WIDTH] table."""
    return param[:, :dim]


def fused_live_width(spec: Dict[str, Any], dim: int) -> int:
    """Columns of a fused [rows, FUSED_WIDTH] table that carry data
    (param + optimizer slots); columns past this are zero padding forced
    by the row-DMA 128-lane constraint (ops/rowdma.py)."""
    return (1 + _n_slots(spec)) * dim


def compact_fused_ckpt(params, sparse_tables: Dict[str, SparseTable]):
    """Checkpoint view of ``params``: fused tables sliced to their live
    column block.

    The padding columns are zero by construction — init creates them zero
    and every write-back path preserves them (apply_fused_update keeps
    ``full[:, used:]``; the sharded XLA fallback reuses the gathered rows)
    — so dropping them halves the d32 table's checkpoint bytes (5.12 →
    2.56 GB at production shapes for Adagrad) with exact resume.  The
    reference's SparseApplyAdagrad checkpoints likewise held param + slot
    only (/root/reference/python/lib/joint.py:224-262 via tf.Saver)."""
    for t in (sparse_tables or {}).values():
        if not t.fused:
            continue
        p = tree_get(params, t.path)
        used = fused_live_width(t.spec, t.dim)
        if p.shape[1] > used:
            params = tree_set(params, t.path, p[:, :used])
    return params


def expand_fused_ckpt(params, sparse_tables: Dict[str, SparseTable], like):
    """Inverse of compact_fused_ckpt: zero-pad restored fused tables back
    to the live layout (shape, dtype AND sharding of the matching leaf in
    ``like``).  A table already at full width (a legacy full-width
    checkpoint) passes through unchanged."""
    import jax

    for t in (sparse_tables or {}).values():
        if not t.fused:
            continue
        target = tree_get(like, t.path)
        p = tree_get(params, t.path)
        if p.shape == target.shape:
            continue
        used = p.shape[1]
        pad = jax.jit(
            lambda s: jnp.zeros(target.shape,
                                target.dtype).at[:, :used].set(s),
            out_shardings=getattr(target, "sharding", None))(p)
        params = tree_set(params, t.path, pad)
    return params


def _row_update(spec: Dict[str, Any], lr, w: jnp.ndarray, g: jnp.ndarray,
                slots: Dict[str, jnp.ndarray]
                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One optimizer step on a row slice: (w, g, slot rows) -> (w', slot'
    rows).  All float32; mirrors the dense transforms (optim/__init__.py)
    exactly so sparse == dense is testable bit-for-bit."""
    name = spec["name"]
    new_slots: Dict[str, jnp.ndarray] = {}
    if name == "SGD":
        w_new = w - lr * g
    elif name == "Adagrad":
        # optax.adagrad: scale_by_rss(initial_accumulator_value, eps=1e-7):
        #   sos += g^2; update = g * rsqrt(sos + eps); w -= lr * update
        n2 = slots["accum"] + g * g
        w_new = w - lr * g * jax.lax.rsqrt(n2 + 1e-7)
        new_slots["accum"] = n2
    elif name == "ProximalAdagrad":
        l1 = spec.get("l1_regularization_strength", 0.0)
        l2 = spec.get("l2_regularization_strength", 0.0)
        n2 = slots["accum"] + g * g
        adj = lr * jax.lax.rsqrt(n2)
        prox = w - adj * g
        w_new = (jnp.sign(prox) * jnp.maximum(jnp.abs(prox) - adj * l1, 0.0)
                 / (1.0 + adj * l2))
        # exact-zero-grad rows stay untouched: compact plans include the
        # packed-pool PADDING id (row 0, weight 0 -> g exactly 0), and
        # unlike Adagrad/FTRL/SGD the proximal shrink is NOT a zero-grad
        # fixed point — without this mask row 0 would shrink every batch
        # it is never actually referenced in, diverging from the
        # reference's SparseApplyProximalAdagrad (whose sparse indices
        # never contained padding).  A real row whose true gradient is
        # exactly 0.0 in every lane also skips its shrink — a
        # measure-zero event accepted for the padding correctness.
        w_new = jnp.where(jnp.all(g == 0.0, axis=-1, keepdims=True),
                          w, w_new)
        new_slots["accum"] = n2
    elif name == "Ftrl":
        l1 = spec.get("l1_regularization_strength", 0.0)
        l2 = spec.get("l2_regularization_strength", 0.0)
        n = slots["accum"]
        n2 = n + g * g
        z2 = slots["linear"] + g - (jnp.sqrt(n2) - jnp.sqrt(n)) / lr * w
        w_new = jnp.where(jnp.abs(z2) <= l1, jnp.zeros_like(w),
                          (jnp.sign(z2) * l1 - z2) / (jnp.sqrt(n2) / lr
                                                      + 2 * l2))
        new_slots["accum"] = n2
        new_slots["linear"] = z2
    else:  # pragma: no cover — plan_sparse_tables filters
        raise ValueError(f"no sparse formula for {name}")
    return w_new, new_slots


_SLOT_KEYS = ("accum", "linear")


def apply_sparse_update(table: SparseTable, param: jnp.ndarray,
                        grad: jnp.ndarray, ids: jnp.ndarray,
                        state: Dict[str, Any]
                        ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Touched-rows update.  ``grad`` is the dense (already per-row-summed)
    gradient from XLA's backward scatter; ``ids`` is the flat [N] id vector
    (duplicates allowed — every duplicate computes identical new values, so
    the scatter-assign is deterministic)."""
    count = state["count"]
    lr = _lr_at(table.lr, count)
    ids = ids.reshape(-1)
    g = jnp.take(grad, ids, axis=0).astype(jnp.float32)   # [N, D]
    w = jnp.take(param, ids, axis=0).astype(jnp.float32)
    slots = {k: jnp.take(state[k], ids, axis=0).astype(jnp.float32)
             for k in _SLOT_KEYS if k in state}
    w_new, new_rows = _row_update(table.spec, lr, w, g, slots)
    new_state = dict(state, count=count + 1)
    for k, rows in new_rows.items():
        new_state[k] = state[k].at[ids].set(rows.astype(state[k].dtype))
    param = param.at[ids].set(w_new.astype(param.dtype))
    return param, new_state


def apply_compact_update(table: SparseTable, param: jnp.ndarray,
                         row_grads: jnp.ndarray, plan_arrays: Dict[str, Any],
                         state: Dict[str, Any], interpret: bool = False
                         ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Fused touched-rows update from COMPACT per-entry gradients.

    ``row_grads`` [N, D] is the cotangent of the gathered rows (the
    '_sparse_rows' sink, models/deep.py) — the dense [rows, D] gradient is
    never materialized and the optimizer never sweeps untouched rows.
    ``plan_arrays`` is the batch's sopt_* dedup plan
    (ops/scatter.make_compact_plan): the Pallas range kernel sums duplicate
    entries into one row per unique id, then one gather + formula + one
    sorted-unique scatter-assign per slot updates exactly the touched rows.

    Exactness: identical to apply_sparse_update (asserted in
    tests/test_sparse_optim.py) — the compact grad sum runs in float32,
    which if anything beats the dense path's bf16 scatter accumulation.
    """
    count = state["count"]
    lr = _lr_at(table.lr, count)
    n, d = row_grads.shape
    from wide_deep_tpu.ops.scatter import range_scatter_add
    g_sorted = jnp.take(row_grads.reshape(n, d).astype(jnp.float32),
                        plan_arrays["perm"], axis=0)
    t = plan_arrays["tiles"]
    g_unique = range_scatter_add(plan_arrays["ids"], g_sorted,
                                 t[0], t[1], t[2], t[3], n,
                                 out_dtype=jnp.float32,
                                 interpret=interpret)     # [N, D] compact
    uids = plan_arrays["uids"]                            # sentinel-padded
    rows = param.shape[0]
    safe = jnp.clip(uids, 0, rows - 1)
    w = jnp.take(param, safe, axis=0).astype(jnp.float32)
    slots = {k: jnp.take(state[k], safe, axis=0).astype(jnp.float32)
             for k in _SLOT_KEYS if k in state}
    w_new, new_rows = _row_update(table.spec, lr, w, g_unique, slots)
    new_state = dict(state, count=count + 1)
    # write back as scatter-ADDs of deltas, not scatter-sets: a set whose
    # update values are gathered from the same buffer makes XLA materialize
    # a full-table copy (~3 ms per slot on the 10M-row d32 table, profiled),
    # while the add — the same pattern as the dense backward — updates the
    # donated buffer in place.  Deltas of untouched/sentinel rows are zero.
    scatter_kw = dict(mode="drop", unique_indices=True,
                      indices_are_sorted=True)
    for k, vals in new_rows.items():
        delta = (vals - slots[k]).astype(state[k].dtype)
        new_state[k] = state[k].at[uids].add(delta, **scatter_kw)
    d_w = (w_new - w).astype(param.dtype)
    param = param.at[uids].add(d_w, **scatter_kw)
    return param, new_state


def apply_fused_update(table: SparseTable, fused: jnp.ndarray,
                       row_grads: jnp.ndarray, plan_arrays: Dict[str, Any],
                       state: Dict[str, Any], interpret: bool = False
                       ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Fused-LAYOUT touched-rows update: param + slots live side by side in
    one f32 [rows, FUSED_WIDTH] matrix, so the whole update is ONE gather,
    the row formulas, and ONE per-row-DMA write-back (ops/rowdma.py,
    ~81 ns/row vs XLA's ~117 ns/row serial scatter PER buffer — the
    param and accumulator buffers previously cost two serial loops,
    ~6.2 ms/step at production shapes).

    Semantics identical to apply_compact_update / the reference's
    SparseApplyAdagrad row updates (joint.py:224-262); equality asserted in
    tests/test_sparse_optim.py."""
    count = state["count"]
    lr = _lr_at(table.lr, count)
    n, d = row_grads.shape
    from wide_deep_tpu.ops.rowdma import rowdma_scatter_rows
    from wide_deep_tpu.ops.scatter import range_scatter_add
    g_sorted = jnp.take(row_grads.reshape(n, d).astype(jnp.float32),
                        plan_arrays["perm"], axis=0)
    t = plan_arrays["tiles"]
    g_unique = range_scatter_add(plan_arrays["ids"], g_sorted,
                                 t[0], t[1], t[2], t[3], n,
                                 out_dtype=jnp.float32,
                                 interpret=interpret)     # [N, D] compact
    uids = plan_arrays["uids"]                            # sentinel-padded
    rows = fused.shape[0]
    safe = jnp.clip(uids, 0, rows - 1)
    full = jnp.take(fused, safe, axis=0)                  # [N, 128] f32
    layout = fused_layout(table.spec, d)
    w = full[:, :d]
    slots = {k: full[:, off:off + d] for k, off in layout.items()}
    w_new, new_rows = _row_update(table.spec, lr, w, g_unique, slots)
    used = (1 + len(layout)) * d
    new_full = jnp.concatenate(
        [w_new] + [new_rows[k] for k in _SLOT_KEYS if k in new_rows]
        + [full[:, used:]], axis=1)                       # padding preserved
    fused = rowdma_scatter_rows(fused, uids, new_full, interpret=interpret)
    return fused, dict(state, count=count + 1)


def _fused_rows_formula(spec, lr, full: jnp.ndarray, g: jnp.ndarray,
                        d: int) -> jnp.ndarray:
    """[*, FUSED_WIDTH] rows + per-row grads -> updated rows (layout
    preserved, padding columns untouched)."""
    layout = fused_layout(spec, d)
    w = full[:, :d]
    slots = {k: full[:, off:off + d] for k, off in layout.items()}
    w_new, new_rows = _row_update(spec, lr, w, g, slots)
    used = (1 + len(layout)) * d
    return jnp.concatenate(
        [w_new] + [new_rows[k] for k in _SLOT_KEYS if k in new_rows]
        + [full[:, used:]], axis=1)


def apply_fused_sharded_update(table: SparseTable, fused: jnp.ndarray,
                               row_grads: jnp.ndarray, ids: jnp.ndarray,
                               plan_arrays: Dict[str, Any],
                               state: Dict[str, Any], mesh,
                               interpret: bool = False
                               ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Multi-device fused update: each ROW SHARD of the fused table updates
    its touched rows inside shard_map.

    ``fused`` is row-sharded over the whole mesh; ``row_grads`` [N, D] is
    the data-sharded compact cotangent (the '_sparse_rows' sink);
    ``plan_arrays`` is the batch's SHARDED compact plan
    (ops/scatter.make_sharded_compact_plan: per-shard unique local rows +
    dedup-sum range tiles + global-stream perms).  Per shard: one
    all-gather of the [N, D] cotangent (d32: 3.3 MB), the range kernel
    sums duplicates, one gather + row formulas + one per-row-DMA
    write-back into the LOCAL shard.  A shard whose stream overflowed the
    static cap (ok=0) falls back to an exact serial-scatter update driven
    by the raw batch ids.

    When the plan carries per-shard ``live`` counts, a shard whose entry
    count fits the static shard_live_cap runs the whole update on the
    compacted stream prefix — perm gather, kernel stream, unique-row
    gather AND the row-DMA write-back all shrink from the 2x-slack cap to
    ~1.25x the even split (unique counts <= entry counts, so the slice is
    always sound); over-cap shards take the full-width branch.
    """
    from jax.sharding import PartitionSpec as P

    from wide_deep_tpu.ops.rowdma import rowdma_scatter_rows
    from wide_deep_tpu.ops.scatter import (n_tiles_for, range_scatter_add,
                                           shard_live_cap)

    count = state["count"]
    lr = _lr_at(table.lr, count)
    d = row_grads.shape[-1]
    rows = fused.shape[0]
    n_total = mesh.devices.size
    model_size = mesh.shape["model"]
    shard_rows = rows // n_total
    sall = ("data", "model")
    spec = table.spec
    plan_live = plan_arrays.get("live")
    cap = plan_arrays["ids"].shape[-1]
    small = shard_live_cap(ids.size, n_total)
    with_live = plan_live is not None and small < cap

    in_specs = [P(sall, None), P("data", None), P("data", None),
                P(sall, None), P(sall, None), P(sall, None),
                P(sall, None, None), P(sall)]
    args = [fused, row_grads, ids.reshape(ids.shape[0], -1),
            plan_arrays["uids"], plan_arrays["ids"], plan_arrays["perm"],
            plan_arrays["tiles"], plan_arrays["ok"]]
    if with_live:
        in_specs.append(P(sall))
        args.append(plan_live)

    from wide_deep_tpu.parallel.mesh import shard_map_nocheck

    @shard_map_nocheck(mesh, tuple(in_specs), P(sall, None))
    def upd(fused_l, g_local, ids_local, suids, sids, sperm, stiles, sok,
            *slive):
        shard = (jax.lax.axis_index("data") * model_size
                 + jax.lax.axis_index("model"))
        # collectives hoisted out of the cond (branch divergence across
        # shards would deadlock otherwise) — same O(N x D) volume as the
        # forward's lookup exchange
        g_all = jax.lax.all_gather(g_local, "data", axis=0,
                                   tiled=True).reshape(-1, d)
        g_all = g_all.astype(jnp.float32)
        ids_all = jax.lax.all_gather(ids_local, "data", axis=0,
                                     tiled=True).reshape(-1)
        local_all = ids_all - shard * shard_rows

        def run(uids_s, ids_s, perm_s, tiles_s):
            gs = jnp.take(g_all, perm_s, axis=0)
            # rows=cap in BOTH branches: tile row_los were built against
            # the full compact space (build_scatter_tiles clamps slabs to
            # rows_pad(cap)); the live prefix is sliced from the output
            g_unique = range_scatter_add(
                ids_s, gs, tiles_s[0], tiles_s[1], tiles_s[2], tiles_s[3],
                cap, out_dtype=jnp.float32,
                interpret=interpret)[:uids_s.shape[0]]
            safe = jnp.clip(uids_s, 0, shard_rows - 1)
            full = jnp.take(fused_l, safe, axis=0)
            new_full = _fused_rows_formula(spec, lr, full, g_unique, d)
            return rowdma_scatter_rows(fused_l, uids_s, new_full,
                                       interpret=interpret)

        def kernel_path(_):
            t = stiles[0]
            if not with_live:
                return run(suids[0], sids[0], sperm[0], t)
            nt_small = n_tiles_for(small, cap)
            return jax.lax.cond(
                slive[0][0] <= small,
                lambda _: run(suids[0][:small], sids[0][:small],
                              sperm[0][:small], t[:, :nt_small]),
                lambda _: run(suids[0], sids[0], sperm[0], t), 0)

        def xla_path(_):
            # exact fallback (duplicates compute identical rows from the
            # per-row-summed dense grad, so the scatter-set is
            # deterministic; out-of-shard entries drop)
            mask = (local_all >= 0) & (local_all < shard_rows)
            safe = jnp.clip(local_all, 0, shard_rows - 1)
            gm = jnp.where(mask[:, None], g_all, jnp.zeros((), jnp.float32))
            g_dense = (jnp.zeros((shard_rows, d), jnp.float32)
                       .at[safe].add(gm, mode="drop"))
            full = jnp.take(fused_l, safe, axis=0)
            new_full = _fused_rows_formula(spec, lr, full,
                                           jnp.take(g_dense, safe, axis=0),
                                           d)
            write = jnp.where(mask, local_all, shard_rows)
            return fused_l.at[write].set(new_full, mode="drop")

        return jax.lax.cond(sok[0] > 0, kernel_path, xla_path, 0)

    fused = upd(*args)
    return fused, dict(state, count=count + 1)
