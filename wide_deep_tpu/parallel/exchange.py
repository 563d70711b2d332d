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
