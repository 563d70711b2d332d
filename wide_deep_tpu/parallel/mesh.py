"""Device mesh + sharding rules — the framework's SPMD backbone.

Replaces the reference's parameter-server distribution
(/root/reference/python/train.py:202-243, build_estimator.py:172-198,
joint.py:140-143) with GSPMD over a jax.sharding.Mesh:

* axis ``data``  — batch parallelism (the reference's between-graph worker
  replication + ``dataset.shard``, dataset.py:173-174).
* axis ``model`` — embedding-table row sharding (the reference's
  ``min_max_variable_partitioner`` over PS tasks, joint.py:140-143).

Large embedding tables (fused dim-group tables and the unified wide table)
are row-sharded over *all* devices (both axes): XLA turns the gathers into
collective lookups and the gradient scatters into reduce-scatters over ICI —
no hand-written transport, matching the design brief in SURVEY.md §2.16.
Dense MLP params are replicated (data-parallel with all-reduce grads).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# params larger than this many elements get row-sharded
_SHARD_THRESHOLD = 1 << 16


def shard_map_nocheck(mesh: Mesh, in_specs, out_specs):
    """``shard_map`` decorator with the replication check OFF, portable
    across jax versions (the kwarg is ``check_vma`` on jax >= 0.7,
    ``check_rep`` before).  The check rejects pallas_call outputs and
    multi-axis gathers whose variance the tracer cannot express — every
    kernel-inside-shard_map consumer (parallel/exchange.py,
    optim/sparse.py) needs it off."""
    import functools
    import inspect
    try:  # jax>=0.4.35 moved shard_map out of experimental
        from jax import shard_map  # type: ignore[attr-defined]
    except ImportError:  # pragma: no cover — older jax
        from jax.experimental.shard_map import shard_map
    kw = ("check_vma"
          if "check_vma" in inspect.signature(shard_map).parameters
          else "check_rep")
    return functools.partial(shard_map, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, **{kw: False})


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Build a 2-axis ('data','model') mesh; -1 = all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1 and model == -1:
        raise ValueError("only one mesh axis may be -1")
    if model == -1:
        model = n // max(data, 1)
    if data == -1:
        data = n // max(model, 1)
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def mesh_from_config(config) -> Mesh:
    dist = config.distribution
    mesh_conf = dist.get("mesh") or {"data": -1, "model": 1}
    return make_mesh(mesh_conf.get("data", -1), mesh_conf.get("model", 1))


def _single_device(mesh: Mesh):
    """SingleDeviceSharding for 1-device meshes.

    A NamedSharding — even over one device — flips jit into SPMD
    lowering, and the partitioner pass is pathologically slow on the
    production step (measured: 48.5 s plain vs 292-711 s with 1-device
    NamedShardings attached, tools/compile_bisect.py round 4).  Every
    sharding helper therefore degrades to SingleDeviceSharding when the
    mesh has one device; multi-device meshes are unaffected."""
    from jax.sharding import SingleDeviceSharding
    return SingleDeviceSharding(mesh.devices.flat[0])


def batch_sharding(mesh: Mesh):
    """Batches: leading (batch) dim split over the data axis."""
    if mesh.devices.size == 1:
        return _single_device(mesh)
    return NamedSharding(mesh, P("data"))


# batch keys whose arrays lead with the n_shards axis when the plan is
# compiled per table shard (ops/scatter.py sharded plan layouts); every
# other key (incl. dscat_slots) leads with the batch axis
_SHARD_PLAN_PREFIXES = ("scat_", "wscat_", "sopt_", "dscat_uids_")


def batch_key_sharding(mesh: Mesh, key: str, value,
                       plan_sharded: Optional[bool] = None) -> NamedSharding:
    """Sharding for one batch entry.

    Regular feature tensors split their leading (batch) dim over 'data'.
    Per-table-shard plan arrays (leading n_devices axis,
    ops/scatter.make_sharded_*_plan) instead place one plan row on each
    device — the same data-major device order as row-sharded tables, so
    each device holds the plan for ITS table shard.

    ``plan_sharded``: multi-process callers pass whether the FeaturePlan
    was compiled per table shard — there the process-LOCAL array's leading
    dim is n_shards/n_procs, so the shape==n heuristic cannot apply.
    """
    n = mesh.devices.size
    if n > 1 and key.startswith(_SHARD_PLAN_PREFIXES):
        if plan_sharded or (plan_sharded is None
                            and getattr(value, "shape", ())
                            and value.shape[0] == n):
            return NamedSharding(mesh, P(("data", "model")))
    return batch_sharding(mesh)


def replicated(mesh: Mesh):
    if mesh.devices.size == 1:
        return _single_device(mesh)
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh):
    """Row-shard a [rows, d] table over every device in the mesh."""
    if mesh.devices.size == 1:
        return _single_device(mesh)
    return NamedSharding(mesh, P(("data", "model"), None))


def param_shardings(mesh: Mesh, params: Any,
                    size_threshold: int = _SHARD_THRESHOLD) -> Any:
    """Sharding tree for a model param tree.

    Embedding tables ('embed' group tables, linear 'w') above the size
    threshold are row-sharded; everything else is replicated.  Row counts are
    padded virtually by GSPMD when not divisible — no layout work needed here.
    """
    n_dev = mesh.devices.size

    def rule(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        big = leaf.ndim >= 1 and leaf.size >= size_threshold * max(n_dev, 1)
        if big and leaf.ndim == 2 and ("embed" in keys or "w" in keys
                                       or "fold" in keys):
            return row_sharded(mesh)
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(rule, params)


def opt_state_shardings(mesh: Mesh, params: Any, param_shards: Any,
                        opt_state_struct: Any) -> Any:
    """Sharding tree for an optimizer state.

    Optimizer slots mirror parameter shapes (Adagrad/FTRL accumulators), so a
    slot whose shape matches a row-sharded table's shape is row-sharded the
    same way; everything else (scalars, counts, dense-param slots) is
    replicated.
    """
    sharded_shapes = set()
    replicated_shapes = set()
    for p_leaf, s_leaf in zip(jax.tree.leaves(params),
                              jax.tree.leaves(param_shards)):
        spec = getattr(s_leaf, "spec", None)  # SingleDeviceSharding has none
        if spec and spec != (None,) and any(ax is not None for ax in spec):
            sharded_shapes.add(p_leaf.shape)
        else:
            replicated_shapes.add(p_leaf.shape)
    # shape matching is a heuristic (optax state trees don't expose which
    # param a slot mirrors): a shape used by BOTH a row-sharded table and
    # a replicated param is AMBIGUOUS — shard it and the replicated
    # param's slot gets a layout its param doesn't have (permanent
    # reshard traffic every step).  Replication is always correct, so
    # ambiguity resolves to replicated, at the cost of that one table's
    # slot memory.
    ambiguous = sharded_shapes & replicated_shapes
    if ambiguous:
        import logging
        logging.getLogger("wide_deep_tpu.mesh").warning(
            "optimizer-slot sharding: shapes %s are used by both sharded "
            "and replicated params; their slots stay replicated",
            sorted(ambiguous))
    effective = sharded_shapes - ambiguous

    def rule(leaf):
        if getattr(leaf, "shape", None) in effective:
            return row_sharded(mesh)
        return replicated(mesh)

    return jax.tree.map(rule, opt_state_struct)


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, Any]:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
