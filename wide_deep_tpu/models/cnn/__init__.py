"""CNN image arm: VGG16/19 and ResNet variants behind one interface.

The joint model (models/joint.py) calls ``init_cnn_params`` / ``cnn_logits``;
logits are summed into the wide+deep total exactly like the reference's CNN
integration (/root/reference/python/lib/joint.py:197-222: Vgg16().build ->
dense to logits_dimension -> add_n).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from wide_deep_tpu.models.deep import ParamStore, glorot_uniform, zeros_init
from wide_deep_tpu.models.cnn import resnet as resnet_lib
from wide_deep_tpu.models.cnn import vgg as vgg_lib

CNN_MODELS = ("vgg16", "vgg19", "resnet", "resnet_cifar",
              "resnet_cifar_v1")


@dataclasses.dataclass(frozen=True)
class CnnSpec:
    model: str = "vgg16"
    resnet_size: int = 50
    height: int = 224
    width: int = 224
    channels: int = 3
    dtype: Any = jnp.float32

    @staticmethod
    def from_model_conf(model_conf: Dict[str, Any],
                        dtype=jnp.float32) -> "CnnSpec":
        model = model_conf.get("cnn_model", "vgg16")
        if model not in CNN_MODELS:
            raise ValueError(f"cnn_model must be one of {CNN_MODELS}")
        return CnnSpec(model=model,
                       resnet_size=int(model_conf.get("cnn_resnet_size", 50)),
                       height=int(model_conf.get("cnn_height", 224)),
                       width=int(model_conf.get("cnn_width", 224)),
                       channels=int(model_conf.get("cnn_num_channels", 3)),
                       dtype=dtype)


def _features(store: ParamStore, spec: CnnSpec, images: jnp.ndarray,
              training: bool, state: Optional[Dict],
              new_state: Dict) -> jnp.ndarray:
    if spec.model == "vgg16":
        return vgg_lib.vgg_features(store, images, 16, spec.dtype)
    if spec.model == "vgg19":
        return vgg_lib.vgg_features(store, images, 19, spec.dtype)
    if spec.model == "resnet":
        return resnet_lib.imagenet_resnet_v2(
            store, images, spec.resnet_size, training, state, new_state,
            spec.dtype)
    if spec.model == "resnet_cifar_v1":
        return resnet_lib.cifar10_resnet_v1(
            store, images, spec.resnet_size, training, state, new_state,
            spec.dtype)
    return resnet_lib.cifar10_resnet_v2(
        store, images, spec.resnet_size, training, state, new_state,
        spec.dtype)


def cnn_logits(params: Dict[str, Any], spec: CnnSpec, images: jnp.ndarray,
               n_logits: int, training: bool,
               state: Optional[Dict]) -> Tuple[jnp.ndarray, Dict]:
    store = ParamStore(params)
    new_state: Dict = {}
    feats = _features(store, spec, images, training, state, new_state)
    kernel = store.get(("head", "kernel"), (feats.shape[-1], n_logits),
                       glorot_uniform)
    bias = store.get(("head", "bias"), (n_logits,), zeros_init)
    return (feats @ kernel + bias).astype(jnp.float32), new_state


def init_cnn_params(rng: jax.Array, spec: CnnSpec, n_logits: int,
                    sample_images: jnp.ndarray) -> Tuple[Dict, Dict]:
    params: Dict[str, Any] = {}
    store = ParamStore(params, create=True, rng=rng)
    new_state: Dict = {}
    feats = _features(store, spec, jnp.asarray(sample_images), True, None,
                      new_state)
    store.get(("head", "kernel"), (feats.shape[-1], n_logits), glorot_uniform)
    store.get(("head", "bias"), (n_logits,), zeros_init)
    init_state = jax.tree.map(jnp.zeros_like, new_state)
    for k in init_state:
        init_state[k]["var"] = jnp.ones_like(init_state[k]["var"])
    return params, init_state
