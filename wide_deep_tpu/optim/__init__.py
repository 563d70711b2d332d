"""Optimizers: registry, FTRL/ProximalAdagrad, per-arm partition, LR decay.

Mirrors the reference optimizer surface
(/root/reference/python/lib/utils/model_util.py:62-118 and
joint.py:144-154,224-262) the optax way:

* ``get_optimizer(spec, lr)`` — registry of {Adagrad, Adam, Ftrl, RMSProp,
  SGD, Momentum, ProximalAdagrad} with TF-matching defaults.  FTRL and
  ProximalAdagrad are implemented here (sparsity-seeking proximal updates the
  wide arm depends on; optax has neither).
* ``exponential_decay`` — lr(step) = lr0 * rate^(step/decay_steps), driven by
  the *real* global step (the reference fed a never-incremented Variable,
  joint.py:145-154 — decay was inert; deliberately fixed).
* ``build_joint_optimizer`` — one optax transform that partitions the param
  tree by its top-level arm key ('linear'/'dnn'/'cnn'), reproducing the
  reference's one-step three-optimizer semantics (joint.py:224-262).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, NamedTuple, Optional, Union

import chex
import jax
import jax.numpy as jnp
import optax

Schedule = Callable[[jnp.ndarray], jnp.ndarray]
ScalarOrSchedule = Union[float, Schedule]


def exponential_decay(lr0: float, decay_rate: float,
                      decay_steps: float) -> Schedule:
    """TF-style continuous exponential decay (not staircased)."""
    if decay_rate == 1.0 or decay_steps <= 0:
        return lambda step: jnp.asarray(lr0, jnp.float32)
    return lambda step: jnp.asarray(
        lr0 * decay_rate ** (step / decay_steps), jnp.float32)


def _lr_at(lr: ScalarOrSchedule, count: jnp.ndarray) -> jnp.ndarray:
    return lr(count) if callable(lr) else jnp.asarray(lr, jnp.float32)


class FtrlState(NamedTuple):
    count: jnp.ndarray
    accum: chex.ArrayTree  # n: sum of squared gradients
    linear: chex.ArrayTree  # z


def ftrl(learning_rate: ScalarOrSchedule,
         l1_regularization_strength: float = 0.0,
         l2_regularization_strength: float = 0.0,
         initial_accumulator_value: float = 0.1) -> optax.GradientTransformation:
    """FTRL-Proximal (McMahan et al. 2013), TF ApplyFtrl semantics:

        n' = n + g^2
        sigma = (sqrt(n') - sqrt(n)) / lr
        z' = z + g - sigma * w
        w' = 0                                  if |z'| <= l1
             (sign(z')*l1 - z') / (sqrt(n')/lr + 2*l2)  otherwise

    Returned updates are deltas ``w' - w`` for optax.apply_updates.
    """
    l1 = l1_regularization_strength
    l2 = l2_regularization_strength

    def init_fn(params):
        return FtrlState(
            count=jnp.zeros([], jnp.int32),
            accum=jax.tree.map(
                lambda p: jnp.full_like(p, initial_accumulator_value), params),
            linear=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("ftrl requires params in update()")
        lr = _lr_at(learning_rate, state.count)
        n_new = jax.tree.map(
            lambda g, n: n + g.astype(jnp.float32) ** 2, updates, state.accum)
        z_new = jax.tree.map(
            lambda g, n2, n, z, w: (z + g.astype(jnp.float32)
                                    - (jnp.sqrt(n2) - jnp.sqrt(n)) / lr * w),
            updates, n_new, state.accum, state.linear, params)
        deltas = jax.tree.map(
            lambda z2, n2, w: (jnp.where(
                jnp.abs(z2) <= l1,
                jnp.zeros_like(w),
                (jnp.sign(z2) * l1 - z2) / (jnp.sqrt(n2) / lr + 2 * l2))
                - w).astype(w.dtype),
            z_new, n_new, params)
        return deltas, FtrlState(state.count + 1, n_new, z_new)

    return optax.GradientTransformation(init_fn, update_fn)


class ProximalAdagradState(NamedTuple):
    count: jnp.ndarray
    accum: chex.ArrayTree


def proximal_adagrad(learning_rate: ScalarOrSchedule,
                     l1_regularization_strength: float = 0.0,
                     l2_regularization_strength: float = 0.0,
                     initial_accumulator_value: float = 0.1
                     ) -> optax.GradientTransformation:
    """Proximal Adagrad (TF ApplyProximalAdagrad):

        n' = n + g^2;  adj = lr / sqrt(n')
        prox = w - adj * g
        w' = sign(prox) * max(|prox| - adj*l1, 0) / (1 + adj*l2)
    """
    l1 = l1_regularization_strength
    l2 = l2_regularization_strength

    def init_fn(params):
        return ProximalAdagradState(
            count=jnp.zeros([], jnp.int32),
            accum=jax.tree.map(
                lambda p: jnp.full_like(p, initial_accumulator_value), params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("proximal_adagrad requires params in update()")
        lr = _lr_at(learning_rate, state.count)
        n_new = jax.tree.map(
            lambda g, n: n + g.astype(jnp.float32) ** 2, updates, state.accum)

        def delta(g, n2, w):
            adj = lr * jax.lax.rsqrt(n2)
            prox = w - adj * g.astype(jnp.float32)
            w_new = (jnp.sign(prox)
                     * jnp.maximum(jnp.abs(prox) - adj * l1, 0.0)
                     / (1.0 + adj * l2))
            return (w_new - w).astype(w.dtype)

        deltas = jax.tree.map(delta, updates, n_new, params)
        return deltas, ProximalAdagradState(state.count + 1, n_new)

    return optax.GradientTransformation(init_fn, update_fn)


def get_optimizer(spec: Dict[str, Any],
                  learning_rate: Optional[ScalarOrSchedule] = None
                  ) -> optax.GradientTransformation:
    """Optimizer spec dict (config.parse_optimizer_spec) -> optax transform.

    TF-matching defaults: Adagrad/ProximalAdagrad initial accumulator 0.1,
    Adam eps 1e-8, RMSProp decay 0.9 / eps 1e-10.
    """
    name = spec["name"]
    lr = learning_rate if learning_rate is not None else spec["learning_rate"]
    if name == "Ftrl":
        return ftrl(
            lr,
            l1_regularization_strength=spec.get(
                "l1_regularization_strength", 0.0),
            l2_regularization_strength=spec.get(
                "l2_regularization_strength", 0.0),
            initial_accumulator_value=spec.get(
                "initial_accumulator_value", 0.1))
    if name == "ProximalAdagrad":
        return proximal_adagrad(
            lr,
            l1_regularization_strength=spec.get(
                "l1_regularization_strength", 0.0),
            l2_regularization_strength=spec.get(
                "l2_regularization_strength", 0.0),
            initial_accumulator_value=spec.get(
                "initial_accumulator_value", 0.1))
    if name == "Adagrad":
        return optax.adagrad(
            lr, initial_accumulator_value=spec.get(
                "initial_accumulator_value", 0.1))
    if name == "Adam":
        return optax.adam(lr, b1=spec.get("beta1", 0.9),
                          b2=spec.get("beta2", 0.999),
                          eps=spec.get("epsilon", 1e-8))
    if name == "RMSProp":
        return optax.rmsprop(lr, decay=spec.get("decay", 0.9),
                             eps=spec.get("epsilon", 1e-10),
                             momentum=spec.get("momentum", 0.0))
    if name == "SGD":
        return optax.sgd(lr)
    if name == "Momentum":
        return optax.sgd(lr, momentum=spec.get("momentum", 0.9))
    raise ValueError(f"unknown optimizer `{name}`")


def linear_learning_rate(num_wide_columns: int) -> float:
    """Canned-wide LR heuristic min(0.005, 1/sqrt(n)) (model_util.py:108-118)."""
    return min(0.005, 1.0 / math.sqrt(max(num_wide_columns, 1)))


def build_joint_optimizer(model_conf: Dict[str, Any], decay_steps: float,
                          arms: Dict[str, bool],
                          sparse_paths: frozenset = frozenset()
                          ) -> optax.GradientTransformation:
    """Per-arm optimizers over one loss, partitioned by top-level param key.

    ``arms``: {'linear': bool, 'dnn': bool, 'cnn': bool} — which arms exist in
    the param tree.  Each arm gets its configured optimizer wrapped with its
    exponential-decay schedule (driven by the transform's own step count).

    ``sparse_paths``: param tree paths (tuples of keys) handled by the
    touched-rows sparse updater (optim/sparse.py) instead — those leaves are
    labeled ``optax.set_to_zero`` so the dense transforms neither sweep nor
    hold state for them; the train step applies their updates in place.
    """
    transforms = {}
    for arm, conf_key in (("linear", "linear"), ("dnn", "dnn"), ("cnn", "cnn")):
        if not arms.get(arm):
            continue
        spec = model_conf[f"{conf_key}_optimizer"]
        lr0 = spec.get("learning_rate",
                       model_conf[f"{conf_key}_initial_learning_rate"])
        schedule = exponential_decay(
            lr0, model_conf.get(f"{conf_key}_decay_rate", 1.0), decay_steps)
        transforms[arm] = get_optimizer(spec, schedule)

    if not sparse_paths:
        def labeler(params):
            return {k: jax.tree.map(lambda _: k, v) for k, v in params.items()}
        return optax.multi_transform(transforms, labeler)

    transforms["_sparse"] = optax.set_to_zero()

    def labeler(params):
        def label(path, _):
            keys = tuple(getattr(p, "key", getattr(p, "idx", None))
                         for p in path)
            if keys in sparse_paths:
                return "_sparse"
            return keys[0]
        return jax.tree_util.tree_map_with_path(label, params)

    return optax.multi_transform(transforms, labeler)
