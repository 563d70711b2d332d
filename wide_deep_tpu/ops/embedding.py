"""Fused embedding lookup with a TPU-fast backward pass.

``fused_lookup(table, ids, wts, seg)`` computes the deep arm's per-feature
mean-combined embeddings (gather -> weight -> segment-matrix matmul) exactly
like the naive einsum path, but its custom VJP replaces XLA's general
scatter-add — which must assume colliding indices and serializes on TPU —
with sort + segment-sum of duplicate ids + a scatter marked
``unique_indices``.  The reference's analog is the TF parameter-server
``embedding_column`` machinery (build_estimator.py:83-92); here the whole
lookup+combine is one XLA-fused region feeding the MXU.

``wide_lookup(w, ids, wts)`` is the 1-or-few-logit wide-arm variant
(linear.py semantics) with the same backward trick.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _rowsum_dedup(flat_ids: jnp.ndarray, flat_g: jnp.ndarray,
                  num_rows: int) -> jnp.ndarray:
    """Sum duplicate-id gradient rows, scatter into a dense [num_rows, D]
    table gradient using a unique-indices scatter.

    flat_ids: [N] int32; flat_g: [N, D].
    """
    N = flat_ids.shape[0]
    order = jnp.argsort(flat_ids)
    sids = flat_ids[order]
    sg = flat_g[order]
    # segment boundaries of equal ids
    first = jnp.concatenate([jnp.ones((1,), jnp.int32),
                             (sids[1:] != sids[:-1]).astype(jnp.int32)])
    seg_idx = jnp.cumsum(first) - 1                     # [N] in [0, n_unique)
    summed = jax.ops.segment_sum(sg, seg_idx, num_segments=N)  # [N, D] padded
    # representative id per segment: scatter sorted ids at segment starts;
    # padding segments keep id 0 with zero grads -> harmless .add
    rep_ids = jnp.zeros((N,), sids.dtype).at[seg_idx].max(sids)
    grad = jnp.zeros((num_rows, flat_g.shape[1]), flat_g.dtype)
    return grad.at[rep_ids].add(summed, unique_indices=True,
                                mode="drop")


@partial(jax.custom_vjp, nondiff_argnums=())
def fused_lookup(table: jnp.ndarray, ids: jnp.ndarray, wts: jnp.ndarray,
                 seg: jnp.ndarray) -> jnp.ndarray:
    """[rows, D] table, [B, L] ids/wts, [L, F] segment matrix ->
    [B, F, D] combined embeddings."""
    gathered = jnp.take(table, ids, axis=0)             # [B, L, D]
    weighted = gathered * wts[..., None]
    return jnp.einsum("bld,lf->bfd", weighted, seg,
                      preferred_element_type=jnp.float32).astype(table.dtype)


def _fused_fwd(table, ids, wts, seg):
    return fused_lookup(table, ids, wts, seg), (table, ids, wts, seg)


def _fused_bwd(res, g):
    table, ids, wts, seg = res
    B, L = ids.shape
    # d(weighted)[b,l,d] = sum_f g[b,f,d] * seg[l,f]
    g_weighted = jnp.einsum("bfd,lf->bld", g.astype(jnp.float32), seg)
    g_gathered = (g_weighted * wts[..., None]).astype(table.dtype)  # [B,L,D]
    flat_ids = ids.reshape(-1)
    flat_g = g_gathered.reshape(B * L, -1)
    g_table = _rowsum_dedup(flat_ids, flat_g, table.shape[0])
    return g_table, None, None, None


fused_lookup.defvjp(_fused_fwd, _fused_bwd)


@partial(jax.custom_vjp, nondiff_argnums=())
def wide_lookup(w: jnp.ndarray, ids: jnp.ndarray,
                wts: jnp.ndarray) -> jnp.ndarray:
    """[rows, n] wide table, [B, L] ids/wts -> [B, n] summed logits."""
    gathered = jnp.take(w, ids, axis=0)                 # [B, L, n]
    return jnp.einsum("bln,bl->bn", gathered, wts,
                      preferred_element_type=jnp.float32)


def _wide_fwd(w, ids, wts):
    return wide_lookup(w, ids, wts), (w, ids, wts)


def _wide_bwd(res, g):
    w, ids, wts = res
    B, L = ids.shape
    g_gathered = (g[:, None, :] * wts[..., None]).astype(w.dtype)  # [B, L, n]
    g_w = _rowsum_dedup(ids.reshape(-1), g_gathered.reshape(B * L, -1),
                        w.shape[0])
    return g_w, None, None


wide_lookup.defvjp(_wide_fwd, _wide_bwd)
