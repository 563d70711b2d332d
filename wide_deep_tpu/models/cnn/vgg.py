"""Functional VGG16/VGG19 for the image arm.

TPU-native rebuild of the reference's npy-weight VGG
(/root/reference/python/lib/cnn/vgg.py:16-248): NHWC layout (TPU-friendly),
``lax.conv_general_dilated`` on the MXU, ParamStore lazy init like the deep
arm, plus load/save of the reference's npy weight-dict format
({layer_name: [kernel, bias]}, vgg.py:16-30,96-101) for pretrained weights.

``build`` returns the fc8 feature vector (1000-d), mirroring vgg.py:109-175;
the joint model (models/cnn/__init__.py) adds the final dense to
logits_dimension exactly as the reference did at joint.py:208-214.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wide_deep_tpu.models.deep import ParamStore, glorot_uniform, zeros_init

VGG16_LAYERS = {
    "conv": [("conv1_1", 64), ("conv1_2", 64), ("pool",),
             ("conv2_1", 128), ("conv2_2", 128), ("pool",),
             ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("pool",),
             ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("pool",),
             ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("pool",)],
}
VGG19_LAYERS = {
    "conv": [("conv1_1", 64), ("conv1_2", 64), ("pool",),
             ("conv2_1", 128), ("conv2_2", 128), ("pool",),
             ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256),
             ("conv3_4", 256), ("pool",),
             ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512),
             ("conv4_4", 512), ("pool",),
             ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512),
             ("conv5_4", 512), ("pool",)],
}
FC_LAYERS = [("fc6", 4096), ("fc7", 4096), ("fc8", 1000)]


def _conv(store: ParamStore, name: str, x: jnp.ndarray, out_ch: int,
          dtype) -> jnp.ndarray:
    kernel = store.get(("vgg", name, "kernel"), (3, 3, x.shape[-1], out_ch),
                       _conv_glorot)
    bias = store.get(("vgg", name, "bias"), (out_ch,), zeros_init)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), window_strides=(1, 1),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(dtype)
    return jax.nn.relu(y + bias)


def _conv_glorot(rng, shape):
    fan_in = shape[0] * shape[1] * shape[2]
    fan_out = shape[0] * shape[1] * shape[3]
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(rng, shape, jnp.float32, -limit, limit)


def _max_pool(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME")


def vgg_features(store: ParamStore, images: jnp.ndarray, depth: int = 16,
                 dtype=jnp.float32) -> jnp.ndarray:
    """[B, 224, 224, 3] -> fc8 [B, 1000] (vgg.py Vgg16.build parity)."""
    assert images.shape[1] == 224 and images.shape[2] == 224, (
        "VGG expects 224x224 input")
    layers = VGG16_LAYERS if depth == 16 else VGG19_LAYERS
    x = images.astype(dtype)
    for layer in layers["conv"]:
        if layer[0] == "pool":
            x = _max_pool(x)
        else:
            x = _conv(store, layer[0], x, layer[1], dtype)
    B = x.shape[0]
    x = x.reshape(B, -1)
    for name, units in FC_LAYERS:
        kernel = store.get(("vgg", name, "kernel"), (x.shape[-1], units),
                           glorot_uniform)
        bias = store.get(("vgg", name, "bias"), (units,), zeros_init)
        x = (jnp.dot(x.astype(dtype), kernel.astype(dtype),
                     preferred_element_type=jnp.float32) + bias)
        if name != "fc8":
            x = jax.nn.relu(x)
        x = x.astype(dtype)
    return x.astype(jnp.float32)


# --------------------------------------------------------- npy weight bridge
def load_npy_weights(params: Dict[str, Any], npy_path: str) -> Dict[str, Any]:
    """Merge a reference-format npy weight dict ({name: [kernel, bias]})
    into a params tree created by vgg_features init."""
    data = np.load(npy_path, encoding="latin1", allow_pickle=True).item()
    vgg = params.get("vgg", {})
    for name, (kernel, bias) in data.items():
        if name in vgg:
            vgg[name]["kernel"] = jnp.asarray(kernel)
            vgg[name]["bias"] = jnp.asarray(bias)
    return params


def save_npy_weights(params: Dict[str, Any], npy_path: str) -> None:
    """Export the vgg arm back to the reference npy dict format
    (vgg.py save_npy parity)."""
    out = {name: [np.asarray(p["kernel"]), np.asarray(p["bias"])]
           for name, p in params.get("vgg", {}).items()}
    np.save(npy_path, out)


def var_count(params: Dict[str, Any]) -> int:
    """Total parameter count (vgg.py get_var_count parity)."""
    return sum(int(np.prod(p.shape))
               for p in jax.tree.leaves(params.get("vgg", {})))
