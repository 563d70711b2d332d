"""Joint Wide & Deep (& CNN) model — the functional heart of the framework.

TPU-native re-design of the reference's
``_wide_deep_combined_model_fn``/``WideAndDeepClassifier``
(/root/reference/python/lib/joint.py:81-433): instead of an Estimator with
variable scopes, the model is a pure function over an explicit parameter
pytree whose top-level keys (``linear`` / ``dnn`` / ``cnn``) double as the
per-arm optimizer partition labels (joint.py:224-262 semantics — one step,
three param groups — implemented in optim/ as an optax partition).

``logits = linear + dnn (+ cnn)`` (joint.py:216-222), head per n_classes
(joint.py:402-412).  BN runs in real train mode with explicit state (the
reference's UPDATE_OPS dance is unnecessary in functional form), and the
configured L1/L2 penalties actually reach the loss (deliberate fix; the
reference collected neither).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from wide_deep_tpu.features.plan import FeaturePlan
from wide_deep_tpu.models import heads
from wide_deep_tpu.models.deep import (DeepSpec, ParamStore, PlanConstants,
                                       deep_logits, init_deep_params,
                                       l2_l1_penalty)
from wide_deep_tpu.models.linear import init_linear_params, linear_logits

MODEL_TYPES = ("wide", "deep", "wide_deep")


@dataclasses.dataclass
class WideDeep:
    """Model definition object (static); params/state live outside."""

    plan: FeaturePlan
    deep_spec: Optional[DeepSpec] = None
    model_type: str = "wide_deep"
    n_classes: int = 2
    cnn_spec: Optional[Any] = None  # models/cnn CnnSpec when with_cnn
    fm_factors: int = 0             # >0 adds the FM pairwise term (wide arm)

    def __post_init__(self):
        if self.model_type not in MODEL_TYPES:
            raise ValueError(
                f"model_type must be one of {MODEL_TYPES}, got "
                f"{self.model_type!r}")
        if self.model_type != "wide" and self.deep_spec is None:
            raise ValueError(f"model_type {self.model_type} needs a DeepSpec")
        if self.plan.fold and self.model_type == "wide":
            raise ValueError(
                "a folded FeaturePlan carries wide weights in the embedding "
                "tables — model_type 'wide' has none; build the plan with "
                "fold=False (plan.fold_enabled(config, model_type))")
        if self.plan.fold and self.fm_factors:
            raise ValueError(
                "linear_fm_factors needs every wide slot in the id pool; "
                "build the plan with fold=False")
        self.consts = PlanConstants(self.plan)
        self.n_logits = heads.n_logits_for(self.n_classes)

    @property
    def has_wide(self) -> bool:
        return self.model_type in ("wide", "wide_deep")

    @property
    def has_deep(self) -> bool:
        return self.model_type in ("deep", "wide_deep")

    @property
    def has_cnn(self) -> bool:
        return self.cnn_spec is not None

    # ------------------------------------------------------------------ init
    def init(self, rng: jax.Array,
             sample_batch: Dict[str, jnp.ndarray]) -> Tuple[Dict, Dict]:
        """Create (params, state). state = {'bn': ..., 'cnn_bn': ...}.

        Parameter shapes are batch-size independent, so init traces its
        forwards on a single-row slice of the sample batch (full-batch eager
        forwards at init cost ~90 s through a remote-device tunnel)."""
        sample_batch = {k: v[:1] for k, v in sample_batch.items()}
        params: Dict[str, Any] = {}
        state: Dict[str, Any] = {}
        if self.has_wide:
            params["linear"] = init_linear_params(
                self.plan, self.n_logits, self.fm_factors,
                jax.random.fold_in(rng, 3), with_fold=self.has_deep)
        if self.has_deep:
            r_deep = jax.random.fold_in(rng, 1)
            params["dnn"], state["bn"] = init_deep_params(
                r_deep, self.plan, self.consts, self.deep_spec, self.n_logits,
                sample_batch)
        if self.has_cnn:
            from wide_deep_tpu.models.cnn import init_cnn_params
            r_cnn = jax.random.fold_in(rng, 2)
            params["cnn"], state["cnn_bn"] = init_cnn_params(
                r_cnn, self.cnn_spec, self.n_logits, sample_batch["image"])
        return params, state

    # ----------------------------------------------------------------- apply
    def apply(self, params: Dict, state: Dict, batch: Dict[str, jnp.ndarray],
              training: bool = False,
              rng: Optional[jax.Array] = None) -> Tuple[jnp.ndarray, Dict]:
        """Forward pass -> (logits [B, n_logits], new_state)."""
        logits = None
        new_state: Dict[str, Any] = {}

        def add(x):
            nonlocal logits
            logits = x if logits is None else logits + x

        if self.consts.indicator_dim and "ind_ids" in batch:
            from wide_deep_tpu.models.deep import indicator_block
            batch = dict(batch)
            batch["_ind_block"] = indicator_block(
                batch, self.consts.indicator_dim)
        if self.has_deep:
            store = ParamStore(params["dnn"])
            # folded wide columns ride the deep arm's fused gathers (one
            # gather serves both arms); their logits join the linear sum
            fold_params = (params.get("linear", {}).get("fold")
                           if self.has_wide else None)
            mesh = getattr(self, "_lookup_mesh", None)
            lookup = ((mesh, getattr(self, "_lookup_threshold", None))
                      if mesh is not None else None)
            dl, new_bn, fold_wide = deep_logits(
                store, self.plan, self.consts, self.deep_spec, batch,
                self.n_logits, training, rng, state.get("bn"), fold_params,
                lookup_mesh=lookup)
            new_state["bn"] = new_bn
            add(dl)
            if fold_wide is not None:
                add(fold_wide)
        if self.has_wide:
            add(linear_logits(params["linear"], batch, self.consts))
        if self.has_cnn:
            from wide_deep_tpu.models.cnn import cnn_logits
            cl, new_cnn_bn = cnn_logits(params["cnn"], self.cnn_spec,
                                        batch["image"], self.n_logits,
                                        training, state.get("cnn_bn"))
            new_state["cnn_bn"] = new_cnn_bn
            add(cl)
        return logits, new_state

    # ------------------------------------------------------------------ loss
    def loss_fn(self, params: Dict, state: Dict, batch: Dict[str, jnp.ndarray],
                training: bool, rng: Optional[jax.Array] = None,
                collect_summaries: bool = False):
        """(loss, (aux)) for jax.value_and_grad(..., has_aux=True).

        aux = (new_state, per-example loss, predictions dict) — plus a
        per-layer summary-stats dict when ``collect_summaries`` (collected
        inside this traced function so tracers never escape the grad scope).
        """
        if collect_summaries:
            from wide_deep_tpu.models import deep as deep_mod
            stats: Dict[str, jnp.ndarray] = {}
            with deep_mod.summary_scope(stats):
                logits, new_state = self.apply(params, state, batch,
                                               training, rng)
        else:
            stats = {}
            logits, new_state = self.apply(params, state, batch, training, rng)
        weights = batch["weight"] * batch["mask"]
        loss, per_ex = heads.head_loss(logits, batch["label"], weights,
                                       self.n_classes)
        if self.has_deep and (self.deep_spec.l1 or self.deep_spec.l2):
            loss = loss + l2_l1_penalty(params["dnn"], self.deep_spec)
        preds = heads.head_predictions(logits, self.n_classes)
        if collect_summaries:
            return loss, (new_state, per_ex, preds, stats)
        return loss, (new_state, per_ex, preds)

    def predict(self, params: Dict, state: Dict,
                batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        logits, _ = self.apply(params, state, batch, training=False)
        return heads.head_predictions(logits, self.n_classes)


def build_model(config, plan: Optional[FeaturePlan] = None,
                model_type: Optional[str] = None, n_classes: int = 2,
                dtype=None) -> WideDeep:
    """Config -> WideDeep (build_estimator.py:264-294 analog).

    ``dtype`` overrides the dense compute dtype; default comes from
    model.yaml dense_dtype."""
    model_conf = config.model
    model_type = model_type or config.train["model_type"]
    if plan is None:
        from wide_deep_tpu.features.plan import fold_enabled
        plan = FeaturePlan(config, fold=fold_enabled(config, model_type))
    if dtype is None:
        dtype = (jnp.bfloat16 if model_conf.get("dense_dtype") == "bfloat16"
                 else jnp.float32)
    deep_spec = None
    if model_type != "wide":
        deep_spec = DeepSpec.from_model_conf(model_conf, dtype=dtype)
    cnn_spec = None
    if model_conf.get("cnn_use_flag"):
        from wide_deep_tpu.models.cnn import CnnSpec
        cnn_spec = CnnSpec.from_model_conf(model_conf)
    return WideDeep(plan=plan, deep_spec=deep_spec, model_type=model_type,
                    n_classes=n_classes, cnn_spec=cnn_spec,
                    fm_factors=int(model_conf.get("linear_fm_factors") or 0))
