"""Deep arm: fused embedding input layer + multi-tower DAG-connected MLPs.

TPU-native re-design of the reference deep arm
(/root/reference/python/lib/dnn.py:43-275):

* The input layer is built from the FeaturePlan's packed batch: one gather
  per embedding dim-group (fused tables) + a static segment-matrix matmul for
  per-feature mean combining (MXU work instead of sparse segment ops), a
  scatter-add multi-hot indicator block, and the continuous block.
* The five named connectivity modes (`simple`, `first_dense`, `last_dense`,
  `dense`, `resnet`) plus arbitrary `i-j` connection lists reproduce the
  reference semantics, including concat-style "residuals".
* Multi-tower: each tower has its own hidden_units/connected_mode; tower
  logits are summed (dnn.py:260-275).

Deliberate fixes over the reference (SURVEY.md §7 "known bugs"):
* batch_normalization here is *real* train-mode BN with moving-stat state
  (the reference called ``tf.layers.batch_normalization`` without
  ``training=True`` — inference mode forever, stats never updated).
* arbitrary-connection parsing supports multiple sources per target layer
  (the reference's ``connected_mapping[j].append(i)`` assigned None,
  dnn.py:203) and missing targets default to no extra connections.
* L1/L2 kernel regularization is actually applied to the loss
  (models/joint.py); the reference created regularizers but never collected
  them.

Parameter layout (a plain pytree; 'dnn' arm for the per-arm optimizer):
  {'embed': {'d<dim>': [rows, dim] ...},
   'towers': [{'hidden': [{'kernel','bias'}...], 'bn': [{'scale','bias'}...],
               'logits': {'kernel','bias'}}, ...]}
BN running stats live in a separate state tree with the same tower structure.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from wide_deep_tpu.features.plan import FeaturePlan
from wide_deep_tpu.models.activations import activation_fn

BN_MOMENTUM = 0.99
BN_EPS = 1e-3

# Trace-time summary sink: when a dict is installed here during tracing,
# tower_forward records per-layer activation stats into it (the functional
# analog of add_layer_summary, model_util.py:15-17).  The step factory
# installs it and returns the collected scalars as step outputs.
# Thread-local so concurrent traces in one process (e.g. a serving
# hot-reload warmup racing a training trace) cannot cross-contaminate.
import threading as _threading

_SINK_TLS = _threading.local()


def _current_sink() -> Optional[Dict[str, Any]]:
    return getattr(_SINK_TLS, "sink", None)


class summary_scope:
    """Context manager installing a summary sink during tracing (per
    thread)."""

    def __init__(self, sink: Dict[str, Any]):
        self.sink = sink

    def __enter__(self):
        self._prev = _current_sink()
        _SINK_TLS.sink = self.sink
        return self.sink

    def __exit__(self, *exc):
        _SINK_TLS.sink = self._prev
        return False


@dataclasses.dataclass(frozen=True)
class TowerSpec:
    hidden_units: Tuple[int, ...]
    connected_mode: Union[str, Tuple[Tuple[int, int], ...]]


@dataclasses.dataclass(frozen=True)
class DeepSpec:
    towers: Tuple[TowerSpec, ...]
    activation: str = "relu"
    dropout: float = 0.0
    batch_norm: bool = False
    l1: float = 0.0
    l2: float = 0.0
    dtype: Any = jnp.float32
    embedding_dtype: Any = jnp.float32

    @staticmethod
    def from_model_conf(model_conf: Dict[str, Any],
                        dtype=jnp.float32) -> "DeepSpec":
        """Build from Config().model (hidden units may be 1-D or nested)."""
        hidden = model_conf["dnn_hidden_units"]
        if hidden and isinstance(hidden[0], list):
            towers_hidden = [tuple(h) for h in hidden]
        else:
            towers_hidden = [tuple(hidden)]
        mode = model_conf.get("dnn_connected_mode", "simple")
        if isinstance(mode, list) and mode and all(
                isinstance(m, str) and "-" in m for m in mode):
            modes = [parse_connected_mode(mode)] * len(towers_hidden)
        elif isinstance(mode, list):
            modes = [parse_connected_mode(m) for m in mode]
            if len(modes) == 1:
                modes = modes * len(towers_hidden)
        else:
            modes = [parse_connected_mode(mode)] * len(towers_hidden)
        if len(modes) != len(towers_hidden):
            raise ValueError(
                f"{len(towers_hidden)} towers but {len(modes)} connected modes")
        towers = tuple(TowerSpec(h, m) for h, m in zip(towers_hidden, modes))
        emb_dtype = (jnp.bfloat16
                     if model_conf.get("embedding_dtype") == "bfloat16"
                     else jnp.float32)
        return DeepSpec(
            towers=towers,
            activation=model_conf.get("dnn_activation_function", "relu"),
            dropout=float(model_conf.get("dnn_dropout") or 0.0),
            batch_norm=bool(model_conf.get("dnn_batch_normalization")),
            l1=float(model_conf.get("dnn_l1") or 0.0),
            l2=float(model_conf.get("dnn_l2") or 0.0),
            dtype=dtype,
            embedding_dtype=emb_dtype)


NAMED_MODES = ("simple", "first_dense", "last_dense", "dense", "resnet")


def parse_connected_mode(mode) -> Union[str, Tuple[Tuple[int, int], ...]]:
    """Validate a mode name or parse an `i-j` connection list."""
    if isinstance(mode, str):
        if mode not in NAMED_MODES:
            raise ValueError(
                f"invalid connected_mode `{mode}`; expected one of "
                f"{NAMED_MODES} or a connection list like ['0-1','1-2']")
        return mode
    pairs = []
    for item in mode:
        i, j = (int(p) for p in str(item).split("-"))
        if i >= j:
            raise ValueError(f"connection `{item}`: source must precede target")
        pairs.append((i, j))
    return tuple(pairs)


def _connection_map(pairs: Sequence[Tuple[int, int]]) -> Dict[int, List[int]]:
    out: Dict[int, List[int]] = {}
    for i, j in pairs:
        out.setdefault(j, []).append(i)
    return out


# --------------------------------------------------------------- param store
class ParamStore:
    """Read-or-create view over a params pytree.

    In init mode (``create=True``) missing leaves are created with the given
    initializer; in apply mode leaves are fetched.  This keeps the forward
    pass as the single source of truth for parameter shapes — essential for
    the DAG connectivity modes and width-changing activations (crelu).
    """

    def __init__(self, tree: Dict[str, Any], create: bool = False,
                 rng: Optional[jax.Array] = None):
        self.tree = tree
        self.create = create
        self.rng = rng
        self._counter = 0

    def _next_rng(self):
        self._counter += 1
        return jax.random.fold_in(self.rng, self._counter)

    def get(self, path: Sequence[Union[str, int]], shape, init):
        node = self.tree
        for pos, key in enumerate(path[:-1]):
            next_is_int = isinstance(path[pos + 1], int)
            if isinstance(key, int):
                while self.create and len(node) <= key:
                    node.append([] if next_is_int else {})
                node = node[key]
            else:
                if self.create and key not in node:
                    node[key] = [] if next_is_int else {}
                node = node[key]
        leaf = path[-1]
        if self.create and leaf not in node:
            node[leaf] = init(self._next_rng(), shape)
        return node[leaf]


def glorot_uniform(rng, shape):
    fan_in, fan_out = shape[0], shape[1]
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(rng, shape, jnp.float32, -limit, limit)


def zeros_init(_, shape):
    return jnp.zeros(shape, jnp.float32)


def ones_init(_, shape):
    return jnp.ones(shape, jnp.float32)


def embedding_init(rng, shape):
    """Embedding tables ~ N(0, 1/sqrt(dim)) (tf embedding_column default
    uses 1/sqrt(dim) truncated normal)."""
    return (jax.random.truncated_normal(rng, -2.0, 2.0, shape, jnp.float32)
            / np.sqrt(shape[1]))


# ----------------------------------------------------- fused fold gather
@jax.custom_vjp
def fused_gather_split(table: jnp.ndarray, fcol: jnp.ndarray,
                       ids: jnp.ndarray, scat=None):
    """One gather serves both arms, two scatters serve both optimizers.

    Forward: gather rows of ``concat([table, fcol], 1)`` -> (embedding part
    [B,P,D], wide part [B,P,n]).  Backward: two *independent* scatter-adds,
    one per param — NOT the slice of a fused [rows, D+n] grad buffer that
    plain autodiff produces.  Measured on v5e (batch 25600): the fused-grad
    slice blocks XLA's scatter+optimizer+donation fusion and forces
    [rows, 1] f32 layout copies, costing ~50 ms/step on the dim-8 group;
    with split scatters each chain fuses like the unfolded path.

    ``scat`` (optional): a host-built scatter plan
    ({"ids", "perm", "tiles"} — features/pipeline.py) that routes the
    backward through the Pallas range-scatter kernel (ops/scatter.py)
    instead of XLA's serial scatter — measured 5.6x faster at the
    production dim-8 shapes.  One kernel call produces the [rows, D+n]
    grad, then sliced (slicing a *materialized* buffer is a cheap copy and
    cannot block fusions the way slicing a scatter fusion did).
    """
    fused = jnp.concatenate([table, fcol.astype(table.dtype)], axis=1)
    full = jnp.take(fused, ids, axis=0)
    D = table.shape[1]
    return full[..., :D], full[..., D:].astype(fcol.dtype)


def _fused_gather_split_fwd(table, fcol, ids, scat=None):
    # residuals hold the param refs for shape/dtype only — the backward
    # reads neither value (zeros_like), so no extra memory is held
    return fused_gather_split(table, fcol, ids, scat), (ids, table, fcol,
                                                        scat)


def _fused_gather_split_bwd(res, cts):
    ct_emb, ct_wide = cts
    ids, table, fcol, scat = res
    if scat is not None:
        from wide_deep_tpu.ops.scatter import (apply_scatter_plan,
                                               apply_window_plan)
        D = table.shape[1]
        n = fcol.shape[1]
        # DELIBERATE precision divergence from the unplanned path: with a
        # bf16 table the kernel accumulates the folded WIDE columns'
        # duplicate-id sums in bf16 (table dtype), while the unplanned
        # XLA path sums d_fcol in f32.  Accumulating in f32 here was
        # measured at +1.5 ms/step (33.6-33.7 vs 32.0 ms, round 5 — the
        # f32 grad stream doubles the kernel's slab bytes), and the bf16
        # behavior has held every quality bar since round 2 (PARITY.md
        # on-chip AUC/logloss runs all trained through this path).
        g = jnp.concatenate(
            [ct_emb.reshape(-1, D).astype(table.dtype),
             ct_wide.reshape(-1, n).astype(table.dtype)], axis=1)
        apply = apply_window_plan if "ok" in scat else apply_scatter_plan
        dense = apply(scat, g, table.shape[0],
                      interpret=jax.default_backend() == "cpu")
        return (dense[:, :D], dense[:, D:].astype(fcol.dtype), None, None)
    d_table = jnp.zeros_like(table).at[ids].add(
        ct_emb.astype(table.dtype), mode="drop")
    d_fcol = jnp.zeros_like(fcol).at[ids].add(
        ct_wide.astype(fcol.dtype), mode="drop")
    return d_table, d_fcol, None, None


fused_gather_split.defvjp(_fused_gather_split_fwd, _fused_gather_split_bwd)


@jax.custom_vjp
def gather_with_plan(table: jnp.ndarray, ids: jnp.ndarray, scat=None):
    """Plain table gather whose backward uses the Pallas range-scatter when
    a host plan is provided (unfolded big groups, e.g. deep-only models)."""
    return jnp.take(table, ids, axis=0)


def _gather_with_plan_fwd(table, ids, scat=None):
    return gather_with_plan(table, ids, scat), (ids, table, scat)


def _gather_with_plan_bwd(res, ct):
    ids, table, scat = res
    if scat is not None:
        from wide_deep_tpu.ops.scatter import (apply_scatter_plan,
                                               apply_window_plan)
        apply = apply_window_plan if "ok" in scat else apply_scatter_plan
        dense = apply(
            scat, ct.reshape(-1, table.shape[1]).astype(table.dtype),
            table.shape[0], interpret=jax.default_backend() == "cpu")
        return dense, None, None
    d_table = jnp.zeros_like(table).at[ids].add(
        ct.astype(table.dtype), mode="drop")
    return d_table, None, None


gather_with_plan.defvjp(_gather_with_plan_fwd, _gather_with_plan_bwd)


# ------------------------------------------------------------- input layer
class PlanConstants:
    """Static metadata derived from the plan for the input layer."""

    def __init__(self, plan: FeaturePlan):
        self.indicator_dim = plan.indicator_dim
        self.n_continuous = len(plan.continuous_slots)
        self.group_dims = [g.dim for g in plan.groups]
        self.deep_input_dim = plan.deep_input_dim
        # static indicator-column -> wide-row map for the dense wide path.
        # HOST numpy, deliberately: an eager jnp.asarray here lives on the
        # DEVICE, and jit lowering then fetches it back host-side to emit
        # the MLIR constant — measured 300+ s for these 1.5 KB through the
        # axon remote tunnel (tools/lower_profile.py, round 4).  A numpy
        # constant lowers from host bytes in microseconds.
        self.indicator_wide_rows = np.asarray(plan.indicator_wide_rows,
                                              np.int32)


def indicator_block(batch: Dict[str, jnp.ndarray], indicator_dim: int,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Multi-hot [B, indicator_dim] block from packed indicator ids/wts.
    Shared by the deep input layer and the wide arm's vocab/identity path.

    Built as a fused compare-and-reduce over the (short, static) id list —
    ids[:, :, None] == iota — rather than a scatter-add: TPU XLA lowers
    scatter to a serial per-update loop (~45 ns/id; ~4 ms/step at batch
    25600 x 20 ids), while the comparison reduction is a few hundred
    microseconds of VPU work fused into one loop."""
    ids = batch["ind_ids"]                       # [B, L]
    wts = batch["ind_wts"].astype(dtype)         # [B, L]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, indicator_dim), 2)
    hits = (ids[:, :, None] == cols)             # [B, L, Di], fused
    return jnp.sum(jnp.where(hits, wts[:, :, None], jnp.zeros((), dtype)),
                   axis=1)


def deep_input_layer(store: ParamStore, plan: FeaturePlan,
                     consts: PlanConstants, batch: Dict[str, jnp.ndarray],
                     dtype=jnp.float32,
                     embedding_dtype=jnp.float32,
                     fold_params: Optional[Dict[str, jnp.ndarray]] = None,
                     lookup_mesh=None):
    """Packed batch -> ([B, deep_input_dim] dense input, fold_wide | None).

    One fused-table gather per dim group, then per-feature mean combining as
    an einsum against the static segment matrix (a [B,L,D]x[L,F] contraction
    the MXU eats), indicator scatter-add, continuous concat.

    **Wide fold**: for folded dim groups the wide arm's weights for the
    group's slots ride the same gather as trailing column(s) — the table is
    concatenated with ``fold_params['d<dim>']`` ([rows, n_logits], owned by
    the 'linear' optimizer partition) and the per-slot wide sum (tf
    ``sparse_combiner='sum'`` semantics, linear.py:33) is an einsum against
    the entry-presence mask.  Returns that [B, n_logits] wide contribution
    as ``fold_wide`` for models/joint.py to add to the linear logits.
    """
    parts = []
    B = batch["wide_ids"].shape[0] if "wide_ids" in batch else (
        next(iter(batch.values())).shape[0])
    emb_init = (embedding_init if embedding_dtype == jnp.float32
                else (lambda rng, shape:
                      embedding_init(rng, shape).astype(embedding_dtype)))
    fold_wide = None

    def table_gather(tbl, ids, sscat=None, dscat=None):
        # explicit sharded exchange (parallel/exchange.py) when enabled and
        # the table is big enough to be row-sharded; GSPMD otherwise.
        # ``sscat``: host-built per-shard scatter plans — routes the
        # exchange backward through the Pallas range-scatter kernel
        # (planned_sharded_gather), XLA scatter otherwise.
        # ``dscat``: host-built unique-id + slot plan — the dedup exchange
        # (dedup_sharded_gather, O(unique x D) row payload).
        if lookup_mesh is not None:
            mesh, threshold = lookup_mesh
            from wide_deep_tpu.parallel.exchange import (
                dedup_sharded_gather, explicit_sharded_gather,
                planned_sharded_gather)
            from wide_deep_tpu.parallel.mesh import _SHARD_THRESHOLD
            threshold = _SHARD_THRESHOLD if threshold is None else threshold
            n_dev = mesh.devices.size
            if (tbl.size >= threshold * n_dev
                    and tbl.shape[0] % n_dev == 0
                    and ids.shape[0] % mesh.shape["data"] == 0):
                if dscat is not None and dscat["uids"].shape[0] == n_dev:
                    return dedup_sharded_gather(
                        tbl, dscat["slots"], dscat["uids"], mesh)
                if sscat is not None and sscat["ok"].shape[0] == n_dev:
                    return planned_sharded_gather(
                        tbl, ids, sscat["ids"], sscat["perm"],
                        sscat["tiles"], sscat["ok"], mesh=mesh,
                        interpret=jax.default_backend() == "cpu",
                        plan_live=sscat.get("live"))
                return explicit_sharded_gather(tbl, ids, mesh)
        return jnp.take(tbl, ids, axis=0)

    for g in plan.groups:
        if plan.sparse_opt_group(g, B):
            # fused param+optimizer-slot layout (optim/sparse.py +
            # ops/rowdma.py): f32 [rows, 128], embedding in cols [0, dim),
            # slots initialized by optim.sparse.init_fused_params.  The
            # param block is drawn with the ORIGINAL (rows, dim) shape so
            # initial weights match the unfused layout exactly.
            from wide_deep_tpu.ops.rowdma import FUSED_WIDTH

            def fused_init(rng, shape, _d=g.dim):
                block = embedding_init(rng, (shape[0], _d))
                pad = jnp.zeros((shape[0], shape[1] - _d), jnp.float32)
                return jnp.concatenate([block, pad], axis=1)

            table = store.get(("embed", f"d{g.dim}"),
                              (g.rows, FUSED_WIDTH), fused_init)
        else:
            table = store.get(("embed", f"d{g.dim}"), (g.rows, g.dim),
                              emb_init)
        ids = batch[f"emb_ids_d{g.dim}"]            # [B, P] packed pool
        wts = batch[f"emb_wts_d{g.dim}"]            # [B, P]
        seg = batch[f"emb_seg_d{g.dim}"]            # [B, P] slot index
        # host-built Pallas scatter plan for the backward, when present
        # (train batches of big groups; features/pipeline.py): single-stream
        # form for single-device meshes, per-table-shard form (leading
        # n_devices axis + ok flags) for the explicit exchange
        scat = sscat = None
        if f"scat_ids_d{g.dim}" in batch:
            if lookup_mesh is None and f"scat_ok_d{g.dim}" not in batch:
                scat = {"ids": batch[f"scat_ids_d{g.dim}"],
                        "perm": batch[f"scat_perm_d{g.dim}"],
                        "tiles": batch[f"scat_tiles_d{g.dim}"]}
                if f"scat_live_d{g.dim}" in batch:  # live-cap compaction
                    scat["live"] = batch[f"scat_live_d{g.dim}"]
            elif lookup_mesh is not None and f"scat_ok_d{g.dim}" in batch:
                sscat = {"ids": batch[f"scat_ids_d{g.dim}"],
                         "perm": batch[f"scat_perm_d{g.dim}"],
                         "tiles": batch[f"scat_tiles_d{g.dim}"],
                         "ok": batch[f"scat_ok_d{g.dim}"]}
                if f"scat_live_d{g.dim}" in batch:  # per-shard live-cap
                    sscat["live"] = batch[f"scat_live_d{g.dim}"]
        elif f"wscat_ids_d{g.dim}" in batch:
            if lookup_mesh is None:
                # window-mode plan for sparse streams (the 'ok' key routes
                # the custom VJPs to apply_window_plan; ok=0 batches fall
                # back to the XLA scatter inside it)
                scat = {"ids": batch[f"wscat_ids_d{g.dim}"],
                        "perm": batch[f"wscat_perm_d{g.dim}"],
                        "tiles": batch[f"wscat_tiles_d{g.dim}"],
                        "ok": batch[f"wscat_ok_d{g.dim}"]}
            elif batch[f"wscat_tiles_d{g.dim}"].ndim == 3:
                # per-table-shard window plan ([S, 3, n_windows] tiles —
                # the exchange backward dispatches window vs range mode on
                # the tiles' second axis)
                sscat = {"ids": batch[f"wscat_ids_d{g.dim}"],
                         "perm": batch[f"wscat_perm_d{g.dim}"],
                         "tiles": batch[f"wscat_tiles_d{g.dim}"],
                         "ok": batch[f"wscat_ok_d{g.dim}"]}
                if f"wscat_live_d{g.dim}" in batch:  # per-shard live-cap
                    sscat["live"] = batch[f"wscat_live_d{g.dim}"]
        dscat = None
        if f"dscat_uids_d{g.dim}" in batch and lookup_mesh is not None:
            dscat = {"uids": batch[f"dscat_uids_d{g.dim}"],
                     "slots": batch[f"dscat_slots_d{g.dim}"]}
        # fused sparse-optimizer sink (training/step.py injects
        # params['dnn']['_sparse_rows'][f'd{dim}'] = zeros [B, P, dim]):
        # gradients flow to the COMPACT per-entry rows instead of a dense
        # [rows, dim] table cotangent — the step consumes them through the
        # batch's sopt_* dedup plan (optim/sparse.apply_compact_update)
        sinks = (store.tree.get("_sparse_rows")
                 if isinstance(store.tree, dict) else None)
        sink = sinks.get(f"d{g.dim}") if sinks else None
        if sink is not None:
            assert not (fold_params is not None and g.folded), (
                "sparse-opt groups must be unfolded (plan.sparse_opt_group)")
            full = jnp.take(jax.lax.stop_gradient(table), ids, axis=0)
            # fused layout: embedding block only, in the sink's dtype (the
            # optimizer slots in the remaining columns never enter the
            # forward); grads flow to the sink
            gathered = full[..., :g.dim].astype(sink.dtype) + sink
        elif fold_params is not None and g.folded:
            fcol = fold_params[f"d{g.dim}"]
            if lookup_mesh is not None:
                # explicit-exchange path: plain concat (autodiff handles the
                # shard_map transposes)
                fused = jnp.concatenate([table, fcol.astype(table.dtype)],
                                        axis=1)
                full = table_gather(fused, ids, sscat,
                                    dscat)  # [B,P,dim+n_logits]
                gathered = full[..., :g.dim]
                wide_rows = full[..., g.dim:].astype(jnp.float32)
            else:
                # single-chip/GSPMD path: split-scatter backward so each
                # param's scatter fuses with its optimizer (see
                # fused_gather_split); Pallas range-scatter when planned
                gathered, wide_rows = fused_gather_split(table, fcol, ids,
                                                         scat)
                wide_rows = wide_rows.astype(jnp.float32)
            # wide sum: weight 1 per present entry (padding has wts == 0)
            presence = (wts > 0).astype(jnp.float32)
            fw = jnp.einsum("bpn,bp->bn", wide_rows, presence,
                            preferred_element_type=jnp.float32)
            fold_wide = fw if fold_wide is None else fold_wide + fw
        elif scat is not None:
            gathered = gather_with_plan(table, ids, scat)  # [B, P, dim]
        else:
            gathered = table_gather(table, ids, sscat, dscat)  # [B, P, dim]
        if gathered.shape[-1] != g.dim:
            # fused table outside the sink path (eval/pred, or a train step
            # built without sparse_tables): embedding block, model dtype;
            # slot-column grads under plain autodiff are zero, so a dense
            # optimizer fallback stays correct
            gathered = gathered[..., :g.dim].astype(embedding_dtype)
        weighted = (gathered * wts[..., None]).astype(jnp.float32)
        # Per-feature mean combine over the packed pool: a per-row one-hot
        # segment matmul (MXU).  Gather/scatter cost is linear in P (measured
        # on v5e: 70 -> 20 pool columns cuts the step 3.3x), which is why
        # the pool is densely packed instead of per-slot padded.  Padding
        # entries carry weight 0, so their seg index is irrelevant.
        onehot = jax.nn.one_hot(seg, len(g.slots), dtype=weighted.dtype)
        combined = jnp.einsum("blf,bld->bfd", onehot, weighted,
                              preferred_element_type=jnp.float32)
        parts.append(combined.reshape(B, -1).astype(dtype))
    if consts.indicator_dim:
        ind = batch.get("_ind_block")
        if ind is None:
            ind = indicator_block(batch, consts.indicator_dim, dtype)
        parts.append(ind.astype(dtype))
    if consts.n_continuous:
        parts.append(batch["cont"].astype(dtype))
    return jnp.concatenate(parts, axis=-1), fold_wide


# ------------------------------------------------------------------- towers
def _dense(store: ParamStore, path, x, units, dtype):
    kernel = store.get(tuple(path) + ("kernel",), (x.shape[-1], units),
                       glorot_uniform)
    bias = store.get(tuple(path) + ("bias",), (units,), zeros_init)
    return (jnp.dot(x.astype(dtype), kernel.astype(dtype),
                    preferred_element_type=jnp.float32)
            + bias).astype(dtype)


def _batch_norm(store: ParamStore, state: Optional[Dict], new_state: Dict,
                path_key: str, tower_idx: int, layer_idx: int, x,
                training: bool, mask: Optional[jnp.ndarray] = None):
    scale = store.get(("towers", tower_idx, "bn", layer_idx, "scale"),
                      (x.shape[-1],), ones_init)
    bias = store.get(("towers", tower_idx, "bn", layer_idx, "bias"),
                     (x.shape[-1],), zeros_init)
    skey = f"t{tower_idx}_l{layer_idx}_{path_key}"
    xf = x.astype(jnp.float32)
    if training or state is None or skey not in state:
        # masked moments: batches are zero-padded to a fixed size, so plain
        # jnp.mean/var over axis 0 would bias both the normalization of real
        # rows and the moving statistics on partial final batches
        if mask is not None:
            m = mask.astype(jnp.float32)[:, None]
            denom = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(xf * m, axis=0) / denom
            var = jnp.sum(m * (xf - mean) ** 2, axis=0) / denom
        else:
            mean = jnp.mean(xf, axis=0)
            var = jnp.var(xf, axis=0)
    else:
        mean, var = state[skey]["mean"], state[skey]["var"]
    if training:
        if state is not None and skey in state:
            old_mean, old_var = state[skey]["mean"], state[skey]["var"]
        else:
            old_mean = jnp.zeros_like(mean)
            old_var = jnp.ones_like(var)
        new_state[skey] = {
            "mean": BN_MOMENTUM * old_mean + (1 - BN_MOMENTUM) * mean,
            "var": BN_MOMENTUM * old_var + (1 - BN_MOMENTUM) * var,
        }
    elif state is not None and skey in state:
        new_state[skey] = state[skey]
    inv = jax.lax.rsqrt(var + BN_EPS)
    return ((xf - mean) * inv * scale + bias).astype(x.dtype)


def tower_forward(store: ParamStore, spec: DeepSpec, tower_idx: int,
                  x: jnp.ndarray, n_logits: int, training: bool,
                  rng: Optional[jax.Array],
                  bn_state: Optional[Dict], new_bn_state: Dict,
                  mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """One tower: DAG-connected hidden stack -> logits [B, n_logits]."""
    tower = spec.towers[tower_idx]
    act = activation_fn(spec.activation)
    mode = tower.connected_mode
    conn = _connection_map(mode) if not isinstance(mode, str) else None
    net = x
    collections = [x]

    for layer_id, units in enumerate(tower.hidden_units):
        h = _dense(store, ("towers", tower_idx, "hidden", layer_id), net,
                   units, spec.dtype)
        h = act(h)
        if spec.dropout and training:
            key = jax.random.fold_in(rng, tower_idx * 1000 + layer_id)
            keep = 1.0 - spec.dropout
            drop_mask = jax.random.bernoulli(key, keep, h.shape)
            h = jnp.where(drop_mask, h / keep, 0.0).astype(h.dtype)
        if spec.batch_norm:
            h = _batch_norm(store, bn_state, new_bn_state, "bn", tower_idx,
                            layer_id, h, training, mask)
        if isinstance(mode, str):
            if mode == "simple":
                net = h
            elif mode == "first_dense":
                net = jnp.concatenate([h, x], axis=1)
            elif mode == "last_dense":
                net = h
                collections.append(h)
            elif mode == "dense":
                collections.append(h)
                net = jnp.concatenate(collections, axis=1)
            else:  # resnet: concat with this layer's input
                net = jnp.concatenate([h, collections[layer_id]], axis=1)
                collections.append(net)
        else:  # arbitrary connections
            sources = [collections[i] for i in conn.get(layer_id + 1, [])]
            net = jnp.concatenate(sources + [h], axis=1) if sources else h
            collections.append(net)

        sink = _current_sink()
        if sink is not None:
            scope = f"dnn_{tower_idx}/hiddenlayer_{layer_id}"
            netf = net.astype(jnp.float32)
            sink[f"{scope}/zero_fraction"] = jnp.mean(
                (netf == 0).astype(jnp.float32))
            sink[f"{scope}/activation_mean"] = jnp.mean(netf)
            sink[f"{scope}/activation_std"] = jnp.std(netf)

    if isinstance(mode, str) and mode == "last_dense":
        net = jnp.concatenate(collections, axis=1)
    return _dense(store, ("towers", tower_idx, "logits"), net, n_logits,
                  spec.dtype).astype(jnp.float32)


def deep_logits(store: ParamStore, plan: FeaturePlan, consts: PlanConstants,
                spec: DeepSpec, batch: Dict[str, jnp.ndarray], n_logits: int,
                training: bool, rng: Optional[jax.Array],
                bn_state: Optional[Dict],
                fold_params: Optional[Dict[str, jnp.ndarray]] = None,
                lookup_mesh=None
                ) -> Tuple[jnp.ndarray, Dict, Optional[jnp.ndarray]]:
    """Full deep arm: input layer + summed tower logits.

    Returns (logits [B, n_logits], new_bn_state, fold_wide | None) where
    fold_wide is the wide arm's contribution carried by the fused gathers
    (see deep_input_layer).
    """
    x, fold_wide = deep_input_layer(store, plan, consts, batch, spec.dtype,
                                    spec.embedding_dtype, fold_params,
                                    lookup_mesh)
    new_bn_state: Dict = {}
    logits = None
    mask = batch.get("mask")
    for t in range(len(spec.towers)):
        lt = tower_forward(store, spec, t, x, n_logits, training, rng,
                           bn_state, new_bn_state, mask)
        logits = lt if logits is None else logits + lt
    return logits, new_bn_state, fold_wide


def init_deep_params(rng: jax.Array, plan: FeaturePlan, consts: PlanConstants,
                     spec: DeepSpec, n_logits: int,
                     sample_batch: Dict[str, jnp.ndarray]):
    """Create the deep arm's params + BN state by tracing the forward once."""
    params: Dict[str, Any] = {}
    store = ParamStore(params, create=True, rng=rng)
    bn_state: Dict = {}
    deep_logits(store, plan, consts, spec, sample_batch, n_logits,
                training=True, rng=jax.random.PRNGKey(0), bn_state=bn_state)
    # run once more in training mode to materialize moving-stat slots
    _, new_state, _ = deep_logits(ParamStore(params), plan, consts, spec,
                                  sample_batch, n_logits, training=True,
                                  rng=jax.random.PRNGKey(0), bn_state=None)
    init_state = jax.tree.map(
        lambda x: jnp.zeros_like(x), new_state)
    for k in init_state:
        init_state[k]["var"] = jnp.ones_like(init_state[k]["var"])
    return params, init_state


def l2_l1_penalty(params: Dict[str, Any], spec: DeepSpec) -> jnp.ndarray:
    """Sum of L1/L2 kernel penalties over all tower dense kernels."""
    total = jnp.zeros((), jnp.float32)
    if not (spec.l1 or spec.l2):
        return total
    for tower in params.get("towers", []):
        kernels = [layer["kernel"] for layer in tower.get("hidden", [])]
        if "logits" in tower:
            kernels.append(tower["logits"]["kernel"])
        for k in kernels:
            kf = k.astype(jnp.float32)
            if spec.l1:
                total = total + spec.l1 * jnp.sum(jnp.abs(kf))
            if spec.l2:
                total = total + spec.l2 * 0.5 * jnp.sum(kf * kf)
    return total
