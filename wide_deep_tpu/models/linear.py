"""Wide (linear) arm: one fused sparse-linear layer over the unified wide space.

Replaces the reference's ``tf.feature_column.linear_model`` with
``sparse_combiner='sum'`` (/root/reference/python/lib/linear.py:11-38).
Because the FeaturePlan packs every wide column into one id space, the whole
arm is a single [wide_dim, n_logits] table: logit = sum_j w[id_j] * wt_j + b.
Weights start at zero (tf linear_model default), which FTRL's sparsity-seeking
update relies on.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from wide_deep_tpu.features.plan import FeaturePlan


def init_linear_params(plan: FeaturePlan, n_logits: int) -> Dict[str, Any]:
    return {
        "w": jnp.zeros((plan.wide_dim, n_logits), jnp.float32),
        "b": jnp.zeros((n_logits,), jnp.float32),
    }


def linear_logits(params: Dict[str, Any], batch: Dict[str, jnp.ndarray],
                  consts=None) -> jnp.ndarray:
    """[B, n_logits] wide logits.

    Two paths summed: (a) gather + weighted sum over the packed id pool
    (hash/cross/bucketized slots); (b) vocab/identity slots ride the shared
    multi-hot indicator block as a dense matmul against a static small-row
    gather — no per-id traffic on the 12.7M-row table for them."""
    w = params["w"]
    gathered = jnp.take(w, batch["wide_ids"], axis=0)  # [B, Pw, n_logits]
    out = jnp.einsum("bln,bl->bn", gathered, batch["wide_wts"],
                     preferred_element_type=jnp.float32)
    if consts is not None and consts.indicator_dim:
        from wide_deep_tpu.models.deep import indicator_block
        ind = batch.get("_ind_block")
        if ind is None:
            ind = indicator_block(batch, consts.indicator_dim)
        w_ind = jnp.take(w, consts.indicator_wide_rows, axis=0)  # [Di, n]
        out = out + jnp.dot(ind.astype(jnp.float32), w_ind,
                            preferred_element_type=jnp.float32)
    return out + params["b"]
