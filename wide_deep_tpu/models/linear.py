"""Wide (linear) arm: one fused sparse-linear layer over the unified wide space.

Replaces the reference's ``tf.feature_column.linear_model`` with
``sparse_combiner='sum'`` (/root/reference/python/lib/linear.py:11-38).
Because the FeaturePlan packs every wide column into one id space, the whole
arm is a single [wide_dim, n_logits] table: logit = sum_j w[id_j] * wt_j + b.
Weights start at zero (tf linear_model default), which FTRL's sparsity-seeking
update relies on.

Optional **FM second-order term** (the reference's open TODO, linear.py:7):
``linear_fm_factors: k`` in model.yaml adds a [wide_dim, k] factor table and
the classic 0.5 * sum_d((sum_i x_i v_id)^2 - sum_i x_i^2 v_id^2) pairwise
interaction over the active wide features (Rendle 2010), trained by the
linear arm's optimizer.  For multiclass heads the scalar FM term shifts all
logits equally (softmax-invariant), so it effectively applies to the binary
head only.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from wide_deep_tpu.features.plan import FeaturePlan


def init_linear_params(plan: FeaturePlan, n_logits: int,
                       fm_factors: int = 0,
                       rng=None, with_fold: bool = False) -> Dict[str, Any]:
    params = {
        "w": jnp.zeros((plan.wide_dim, n_logits), jnp.float32),
        "b": jnp.zeros((n_logits,), jnp.float32),
    }
    if with_fold and plan.fold:
        # folded wide weights: trailing column(s) of each folded dim group's
        # fused embedding table (plan.py "wide fold").  f32 master copies
        # under the 'linear' partition so FTRL + its decay schedule own them;
        # zeros init matches tf linear_model / FTRL sparsity semantics.
        fold = {f"d{g.dim}": jnp.zeros((g.rows, n_logits), jnp.float32)
                for g in plan.groups if g.folded}
        if fold:
            params["fold"] = fold
    if fm_factors > 0:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        params["v"] = 0.01 * jax.random.normal(
            rng, (plan.wide_dim, fm_factors), jnp.float32)
    return params


def _fm_term(v: jnp.ndarray, batch: Dict[str, jnp.ndarray],
             consts) -> jnp.ndarray:
    """[B] pairwise-interaction term over active wide features."""
    gathered = jnp.take(v, batch["wide_ids"], axis=0)      # [B, Pw, k]
    wts = batch["wide_wts"][..., None]
    s1 = jnp.sum(gathered * wts, axis=1)                    # [B, k]
    s2 = jnp.sum((gathered ** 2) * (wts ** 2), axis=1)      # [B, k]
    if consts is not None and consts.indicator_dim:
        from wide_deep_tpu.models.deep import indicator_block
        ind = batch.get("_ind_block")
        if ind is None:
            ind = indicator_block(batch, consts.indicator_dim)
        ind = ind.astype(jnp.float32)
        v_ind = jnp.take(v, consts.indicator_wide_rows, axis=0)  # [Di, k]
        s1 = s1 + ind @ v_ind
        s2 = s2 + (ind ** 2) @ (v_ind ** 2)
    return 0.5 * jnp.sum(s1 ** 2 - s2, axis=-1)


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
    if "v" in params:
        out = out + _fm_term(params["v"], batch, consts)[:, None]
    return out + params["b"]
