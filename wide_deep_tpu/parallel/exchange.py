"""Deliberate sharded-embedding exchange: explicit collectives via shard_map.

Round 1 let GSPMD derive the collectives for gathers into row-sharded tables
(parallel/mesh.py row_sharded).  tests/test_hlo_collectives.py proves the
generated program is id-scaled (no table-sized collective), but the pattern
is the compiler's choice.  This module is the blueprint's deliberate design
(SURVEY.md §2.16 row 2 — the TPU analog of the reference's PS sharding,
/root/reference/python/lib/joint.py:140-143): every step of the exchange is
an explicit XLA collective, so the communication volume is a *contract*:

    ids:   all_gather over 'data'          B/d x P  ->  B x P      (int32)
    rows:  local masked gather             (no communication)
           psum over 'model'               B x P x D               (partial
                                           rows; exactly one shard owns any
                                           row, rest contribute zeros)
           psum_scatter over 'data'        B x P x D  ->  B/d x P x D

Total bytes per device ~ O(ids x D) — independent of table rows, the
property that keeps 10M-row tables shardable at pod scale.  A dedup +
all-to-all variant (exchange only the unique ids destined per shard) moves
less when duplication is high, but its ragged->padded worst case is the
same B x P ids; at CTR batch shapes the padding eats the savings, so the
simple dense exchange is the default.  Gradients flow through the standard
transposes (psum_scatter^T = all_gather, gather^T = scatter-add), each
applied to the device-local shard only.

Used by models/deep.py when train.yaml sets
``distribution.sharded_lookup: explicit`` (default: gspmd).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.4.35 moved shard_map out of experimental
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from wide_deep_tpu.parallel import mesh as mesh_lib


def explicit_sharded_gather(table: jnp.ndarray, ids: jnp.ndarray,
                            mesh: Mesh) -> jnp.ndarray:
    """[rows, D] table (row-sharded over the whole mesh) x [B, P] ids
    (batch-sharded over 'data') -> [B, P, D] rows (batch-sharded).

    Semantically identical to ``jnp.take(table, ids, axis=0)`` (asserted in
    tests/test_exchange.py, values and grads) with the collective schedule
    fixed as documented above.  Out-of-range ids read row 0 of their shard
    with a zero mask — callers guarantee in-range ids (the FeaturePlan id
    spaces are closed).
    """
    n_total = mesh.devices.size
    rows = table.shape[0]
    if rows % n_total:
        raise ValueError(f"table rows {rows} % mesh size {n_total} != 0 "
                         "(FeaturePlan aligns rows to 256)")
    shard_rows = rows // n_total
    model_size = mesh.shape["model"]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(("data", "model"), None), P("data", None)),
             out_specs=P("data", None, None))
    def lookup(tbl, ids_local):
        shard = (jax.lax.axis_index("data") * model_size
                 + jax.lax.axis_index("model"))
        ids_all = jax.lax.all_gather(ids_local, "data", axis=0, tiled=True)
        local = ids_all - shard * shard_rows
        mask = (local >= 0) & (local < shard_rows)
        rows_local = jnp.take(tbl, jnp.clip(local, 0, shard_rows - 1),
                              axis=0)
        part = jnp.where(mask[..., None], rows_local,
                         jnp.zeros((), tbl.dtype))
        part = jax.lax.psum(part, "model")
        return jax.lax.psum_scatter(part, "data", scatter_dimension=0,
                                    tiled=True)

    return lookup(table, ids)


# -------------------------------------------------- planned sharded gather
# The explicit exchange above leaves the backward to autodiff: each device
# scatter-adds the all-gathered cotangent into its table shard with XLA's
# serial scatter (~45 ns/id over the FULL global id stream, per device).
# planned_sharded_gather replaces that backward with the Pallas range-scatter
# kernel (ops/scatter.py) driven by host-built PER-SHARD plans
# (ops/scatter.make_sharded_scatter_plan): the loader sorts the global id
# stream once, splits it at the static shard row boundaries, and each device
# runs the kernel on just its shard's localized stream.  A shard whose id
# count overflowed the static plan cap (ok=0, hot-key skew) falls back to
# the XLA scatter for that batch — per shard, per batch, never wrong.
#
# Requires a single-process mesh: the plans cover the GLOBAL batch id
# stream, which one host only knows when it loads the whole batch.  The
# multi-host analog is the dedup all-to-all exchange (ROADMAP).


def planned_sharded_gather(table: jnp.ndarray, ids: jnp.ndarray,
                           plan_ids: jnp.ndarray, plan_perm: jnp.ndarray,
                           plan_tiles: jnp.ndarray, plan_ok: jnp.ndarray,
                           mesh: Mesh, interpret: bool = False,
                           plan_live: Optional[jnp.ndarray] = None
                           ) -> jnp.ndarray:
    """explicit_sharded_gather with a Pallas range-scatter backward.

    Forward collective schedule and semantics are identical to
    explicit_sharded_gather (values AND grads asserted equal in
    tests/test_exchange.py); only the backward's table-gradient scatter
    changes schedule.  Plan arrays have leading dim n_devices, laid out in
    row-shard order (data-major, then model — matching P(('data','model'))).

    ``plan_live`` ([n_devices] non-padding id counts, emitted by
    make_sharded_scatter_plan/make_sharded_window_plan): enables the
    per-shard live-cap compaction — a shard whose live count fits the
    static shard_live_cap gathers and streams only the compacted prefix
    (the 2x-slack cap means roughly half the perm-gather row crossings);
    over-cap shards take the full-width branch, bit-identically.
    """
    return _planned_gather((mesh, interpret), table, ids, plan_ids,
                           plan_perm, plan_tiles, plan_ok, plan_live)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _planned_gather(ctx, table, ids, plan_ids, plan_perm, plan_tiles,
                    plan_ok, plan_live):
    mesh, _ = ctx
    return explicit_sharded_gather(table, ids, mesh)


def _planned_gather_fwd(ctx, table, ids, plan_ids, plan_perm, plan_tiles,
                        plan_ok, plan_live):
    out = _planned_gather(ctx, table, ids, plan_ids, plan_perm, plan_tiles,
                          plan_ok, plan_live)
    # `table` rides the residuals for shape/dtype only — the backward never
    # reads its values, so XLA keeps no extra copy live (same pattern as
    # models/deep.py fused_gather_split)
    res = (ids, plan_ids, plan_perm, plan_tiles, plan_ok, plan_live, table)
    return out, res


def _planned_gather_bwd(ctx, res, ct):
    mesh, interpret = ctx
    ids, plan_ids, plan_perm, plan_tiles, plan_ok, plan_live, table = res
    rows, d = table.shape
    tdtype = table.dtype
    n_total = mesh.devices.size
    model_size = mesh.shape["model"]
    shard_rows = rows // n_total
    sall = ("data", "model")

    from wide_deep_tpu.ops.scatter import (n_tiles_for, range_scatter_add,
                                           shard_live_cap, window_cap,
                                           window_scatter_add)
    cap = plan_ids.shape[-1]
    # static compacted stream length (host parity: the plan emitters size
    # caps from the same (n_ids, n_shards)); live-cap only engages when a
    # per-shard live count was emitted AND the compact cap actually shrinks
    small = shard_live_cap(ids.size, n_total)
    with_live = plan_live is not None and small < cap

    in_specs = [P("data", None, None), P("data", None), P(sall, None),
                P(sall, None), P(sall, None, None), P(sall)]
    args = [ct, ids, plan_ids, plan_perm, plan_tiles, plan_ok]
    if with_live:
        in_specs.append(P(sall))
        args.append(plan_live)

    # replication check off (mesh_lib.shard_map_nocheck): pallas_call's
    # out ShapeDtypeStruct carries no varying mesh-axes annotation, which
    # the checker rejects otherwise
    @mesh_lib.shard_map_nocheck(mesh, tuple(in_specs), P(sall, None))
    def bwd(ct_local, ids_local, sids, sperm, stiles, sok, *slive):
        shard = (jax.lax.axis_index("data") * model_size
                 + jax.lax.axis_index("model"))
        # dense-exchange contract: the full cotangent is gathered once
        # (O(B x P x D), the same volume the forward's psum_scatter moved)
        ct_all = jax.lax.all_gather(ct_local, "data", axis=0, tiled=True)
        g = ct_all.reshape(-1, ct_all.shape[-1])
        # hoisted out of the cond: collectives inside per-device branches
        # would deadlock when shards disagree on ok
        ids_all = jax.lax.all_gather(ids_local, "data", axis=0, tiled=True)
        local_all = ids_all.reshape(-1) - shard * shard_rows
        t = stiles[0]
        window_mode = t.shape[0] == 3
        # window mode: the static window cap derives from the FULL shard
        # stream cap exactly like the host side (make_sharded_window_plan),
        # independent of live-cap slicing
        wcap = window_cap(cap, shard_rows) if window_mode else 0

        def run(ids_s, perm_s, tiles_s):
            gs = jnp.take(g, perm_s, axis=0).astype(tdtype)
            if window_mode:
                # window-mode per-shard plan (sparse streams, e.g. d16):
                # tiles are [3, n_windows] — fixed output windows, so the
                # tiling never shrinks with the stream
                return window_scatter_add(
                    ids_s, gs, tiles_s[0], tiles_s[1], tiles_s[2],
                    shard_rows, wcap, out_dtype=tdtype, interpret=interpret)
            return range_scatter_add(
                ids_s, gs, tiles_s[0], tiles_s[1], tiles_s[2], tiles_s[3],
                shard_rows, out_dtype=tdtype, interpret=interpret)

        def kernel_path(_):
            if not with_live:
                return run(sids[0], sperm[0], t)
            # live-cap compaction: tiles cover only the live prefix, so a
            # live count within the compact cap means every tile (and every
            # window's entries) references positions < small — the stream
            # and the perm gather can run on the sliced prefix
            nt_small = (t.shape[1] if window_mode
                        else n_tiles_for(small, shard_rows))
            return jax.lax.cond(
                slive[0][0] <= small,
                lambda _: run(sids[0][:small], sperm[0][:small],
                              t if window_mode else t[:, :nt_small]),
                lambda _: run(sids[0], sperm[0], t), 0)

        def xla_path(_):
            mask = (local_all >= 0) & (local_all < shard_rows)
            gm = jnp.where(mask[:, None], g, jnp.zeros((), g.dtype))
            return (jnp.zeros((shard_rows, g.shape[-1]), tdtype)
                    .at[jnp.clip(local_all, 0, shard_rows - 1)]
                    .add(gm.astype(tdtype), mode="drop"))

        return jax.lax.cond(sok[0] > 0, kernel_path, xla_path, 0)

    d_table = bwd(*args)
    return d_table, None, None, None, None, None, None


_planned_gather.defvjp(_planned_gather_fwd, _planned_gather_bwd)


# ---------------------------------------------------------- dedup exchange
# Host-assisted all-to-all variant (train.yaml sharded_lookup: dedup): the
# loader precomputes each table shard's UNIQUE batch ids and every entry's
# flat slot (ops/scatter.make_dedup_plan), so the devices exchange only the
# unique rows:
#
#     rows:  local gather of the shard's unique ids   (no communication)
#            all_gather over the WHOLE mesh           S x cap x D
#            per-entry select by host slot            (no communication)
#
# Per-device volume ~ O(unique x D) vs the dense exchange's O(B x P x D) —
# the win grows with id duplication (hot keys, pod-scale tables).  No id
# collective at all: the host already routed every entry.  Gradients run
# the exact transposes: slot scatter-add (local) -> psum_scatter (the
# all_gather transpose) -> unique-id scatter-add into the shard.
# Single-process meshes (the host sees the global batch), like the
# planned kernel path; the contract is pinned by
# tests/test_hlo_collectives.py (volume) + tests/test_exchange.py (math).


def dedup_sharded_gather(table: jnp.ndarray, slots: jnp.ndarray,
                         uids: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """[rows, D] row-sharded table x host dedup plan -> [B, P, D] rows.

    Semantically ``jnp.take(table, ids, axis=0)`` for the ids the plan was
    built from (asserted in tests/test_exchange.py, values and grads)."""
    return _dedup_gather(mesh, table, slots, uids)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dedup_gather(mesh, table, slots, uids):
    n_total = mesh.devices.size
    shard_rows = table.shape[0] // n_total
    sall = ("data", "model")

    # replication check off: the all_gather over both axes makes the rows
    # block replicated over 'model', which the static checker cannot infer
    @mesh_lib.shard_map_nocheck(
        mesh, (P(sall, None), P("data", None), P(sall, None)),
        P("data", None, None))
    def fwd(tbl, slots_local, uids_local):
        u = uids_local[0]
        valid = u < shard_rows  # sentinel-padded tail
        mine = jnp.take(tbl, jnp.clip(u, 0, shard_rows - 1), axis=0)
        mine = jnp.where(valid[:, None], mine, jnp.zeros((), tbl.dtype))
        # the one communication: every device receives every shard's
        # unique rows — S x cap x D, independent of batch duplication
        r_all = jax.lax.all_gather(mine, sall, axis=0, tiled=True)
        out = jnp.take(r_all, slots_local.reshape(-1), axis=0)
        return out.reshape(*slots_local.shape, r_all.shape[-1])

    return fwd(table, slots, uids)


def _dedup_gather_fwd(mesh, table, slots, uids):
    return _dedup_gather(mesh, table, slots, uids), (slots, uids, table)


def _dedup_gather_bwd(mesh, res, ct):
    slots, uids, table = res
    n_total = mesh.devices.size
    shard_rows = table.shape[0] // n_total
    cap = uids.shape[1]
    d = table.shape[1]
    sall = ("data", "model")

    @mesh_lib.shard_map_nocheck(
        mesh, (P("data", None, None), P("data", None), P(sall, None)),
        P(sall, None))
    def bwd(ct_local, slots_local, uids_local):
        g_flat = ct_local.reshape(-1, d).astype(jnp.float32)
        # every model rank holds the same data slice of ct — only rank 0
        # contributes, or the psum_scatter would multiply grads by
        # mesh.shape['model']
        g_flat = jnp.where(jax.lax.axis_index("model") == 0, g_flat,
                           jnp.zeros((), g_flat.dtype))
        # local partial sums into the [S*cap] unique-row space
        g_all = (jnp.zeros((n_total * cap, d), jnp.float32)
                 .at[slots_local.reshape(-1)].add(g_flat))
        # all_gather transpose: sum partials, keep my shard's cap rows
        g_mine = jax.lax.psum_scatter(g_all, sall, scatter_dimension=0,
                                      tiled=True)
        u = uids_local[0]
        return (jnp.zeros((shard_rows, d), table.dtype)
                .at[u].add(g_mine.astype(table.dtype), mode="drop"))

    d_table = bwd(ct, slots, uids)
    return d_table, None, None


_dedup_gather.defvjp(_dedup_gather_fwd, _dedup_gather_bwd)


def lookup_mesh_for(model) -> Optional[Mesh]:
    """The mesh a model's explicit-lookup path should use (None = GSPMD)."""
    return getattr(model, "_lookup_mesh", None)


def enable_explicit_lookup(model, mesh: Mesh,
                           size_threshold: Optional[int] = None) -> None:
    """Route the model's big-table gathers through explicit_sharded_gather.

    Set by the Trainer when ``distribution.sharded_lookup: explicit``; the
    model object stays mesh-agnostic otherwise.  ``size_threshold`` (elements
    per device) overrides parallel.mesh._SHARD_THRESHOLD — tests and the
    driver dry run lower it so tiny tables exercise the exchange.
    """
    model._lookup_mesh = mesh
    model._lookup_threshold = size_threshold
