"""Functional pre-activation ResNet v2 (+ v1 variant) for the image arm.

Rebuild of the reference's two ResNet files
(/root/reference/python/lib/cnn/resnet.py:31-328 — functional v2 with
cifar10/imagenet generators and the {18,34,50,101,152,200} size table — and
resnet_2.py:19-247 — v1/v2 class variants).  NHWC, MXU convs, explicit BN
state like the deep arm.  Residuals here are true additive shortcuts
(standard ResNet), with projection shortcuts on shape change.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wide_deep_tpu.models.deep import BN_EPS, BN_MOMENTUM, ParamStore, ones_init, zeros_init

# imagenet size table (resnet.py:243-321)
IMAGENET_SIZES = {
    18: ("building", [2, 2, 2, 2]),
    34: ("building", [3, 4, 6, 3]),
    50: ("bottleneck", [3, 4, 6, 3]),
    101: ("bottleneck", [3, 4, 23, 3]),
    152: ("bottleneck", [3, 8, 36, 3]),
    200: ("bottleneck", [3, 24, 36, 3]),
}


def _he_normal(rng, shape):
    fan_in = shape[0] * shape[1] * shape[2]
    return jax.random.normal(rng, shape, jnp.float32) * np.sqrt(2.0 / fan_in)


def _conv(store: ParamStore, name: str, x, out_ch: int, ksize: int,
          strides: int, dtype) -> jnp.ndarray:
    """conv2d with fixed padding (resnet.py:31-78 semantics)."""
    kernel = store.get(("resnet", name, "kernel"),
                       (ksize, ksize, x.shape[-1], out_ch), _he_normal)
    if strides > 1:
        pad_total = ksize - 1
        pad_beg = pad_total // 2
        pad_end = pad_total - pad_beg
        x = jnp.pad(x, ((0, 0), (pad_beg, pad_end), (pad_beg, pad_end),
                        (0, 0)))
        padding = "VALID"
    else:
        padding = "SAME"
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (strides, strides), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(dtype)


def _bn_relu(store: ParamStore, state: Optional[Dict], new_state: Dict,
             name: str, x, training: bool, relu: bool = True):
    scale = store.get(("resnet", name, "scale"), (x.shape[-1],), ones_init)
    bias = store.get(("resnet", name, "bias"), (x.shape[-1],), zeros_init)
    xf = x.astype(jnp.float32)
    if training or state is None or name not in state:
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
    else:
        mean, var = state[name]["mean"], state[name]["var"]
    if training:
        old = state.get(name) if state else None
        om = old["mean"] if old else jnp.zeros_like(mean)
        ov = old["var"] if old else jnp.ones_like(var)
        new_state[name] = {
            "mean": BN_MOMENTUM * om + (1 - BN_MOMENTUM) * mean,
            "var": BN_MOMENTUM * ov + (1 - BN_MOMENTUM) * var}
    elif state is not None and name in state:
        new_state[name] = state[name]
    y = (xf - mean) * jax.lax.rsqrt(var + BN_EPS) * scale + bias
    if relu:
        y = jax.nn.relu(y)
    return y.astype(x.dtype)


def _building_block_v2(store, state, new_state, name, x, filters, strides,
                       training, dtype):
    """Pre-activation basic block (resnet.py:81-112)."""
    pre = _bn_relu(store, state, new_state, f"{name}_bn1", x, training)
    if strides > 1 or x.shape[-1] != filters:
        shortcut = _conv(store, f"{name}_proj", pre, filters, 1, strides, dtype)
    else:
        shortcut = x
    y = _conv(store, f"{name}_conv1", pre, filters, 3, strides, dtype)
    y = _bn_relu(store, state, new_state, f"{name}_bn2", y, training)
    y = _conv(store, f"{name}_conv2", y, filters, 3, 1, dtype)
    return y + shortcut


def _bottleneck_block_v2(store, state, new_state, name, x, filters, strides,
                         training, dtype):
    """Pre-activation bottleneck block (resnet.py:115-149); output channels
    are 4*filters."""
    pre = _bn_relu(store, state, new_state, f"{name}_bn1", x, training)
    out_ch = 4 * filters
    if strides > 1 or x.shape[-1] != out_ch:
        shortcut = _conv(store, f"{name}_proj", pre, out_ch, 1, strides, dtype)
    else:
        shortcut = x
    y = _conv(store, f"{name}_conv1", pre, filters, 1, 1, dtype)
    y = _bn_relu(store, state, new_state, f"{name}_bn2", y, training)
    y = _conv(store, f"{name}_conv2", y, filters, 3, strides, dtype)
    y = _bn_relu(store, state, new_state, f"{name}_bn3", y, training)
    y = _conv(store, f"{name}_conv3", y, out_ch, 1, 1, dtype)
    return y + shortcut


def _block_layer(store, state, new_state, name, x, block_fn, filters, blocks,
                 strides, training, dtype):
    x = block_fn(store, state, new_state, f"{name}_0", x, filters, strides,
                 training, dtype)
    for i in range(1, blocks):
        x = block_fn(store, state, new_state, f"{name}_{i}", x, filters, 1,
                     training, dtype)
    return x


def imagenet_resnet_v2(store: ParamStore, images: jnp.ndarray,
                       resnet_size: int, training: bool,
                       state: Optional[Dict], new_state: Dict,
                       dtype=jnp.float32) -> jnp.ndarray:
    """ImageNet-style ResNet v2 feature extractor -> [B, features]
    (resnet.py:243-321)."""
    if resnet_size not in IMAGENET_SIZES:
        raise ValueError(
            f"resnet_size must be one of {sorted(IMAGENET_SIZES)}")
    kind, layers = IMAGENET_SIZES[resnet_size]
    block_fn = (_building_block_v2 if kind == "building"
                else _bottleneck_block_v2)
    x = _conv(store, "init", images, 64, 7, 2, dtype)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-np.inf)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
    for i, (filters, blocks, strides) in enumerate(
            zip([64, 128, 256, 512], layers, [1, 2, 2, 2])):
        x = _block_layer(store, state, new_state, f"layer{i}", x, block_fn,
                         filters, blocks, strides, training, dtype)
    x = _bn_relu(store, state, new_state, "final_bn", x, training)
    x = jnp.mean(x, axis=(1, 2))  # global average pool
    return x.astype(jnp.float32)


def _residual_v1(store, state, new_state, name, x, filters, strides,
                 training, dtype):
    """Post-activation residual block (reference resnet_2.py:_residual_v1):
    conv-bn-relu, conv-bn, add shortcut, relu."""
    if strides > 1 or x.shape[-1] != filters:
        shortcut = _conv(store, f"{name}_proj", x, filters, 1, strides, dtype)
        shortcut = _bn_relu(store, state, new_state, f"{name}_proj_bn",
                            shortcut, training, relu=False)
    else:
        shortcut = x
    y = _conv(store, f"{name}_conv1", x, filters, 3, strides, dtype)
    y = _bn_relu(store, state, new_state, f"{name}_bn1", y, training)
    y = _conv(store, f"{name}_conv2", y, filters, 3, 1, dtype)
    y = _bn_relu(store, state, new_state, f"{name}_bn2", y, training,
                 relu=False)
    return jax.nn.relu(y + shortcut)


def cifar10_resnet_v1(store: ParamStore, images: jnp.ndarray,
                      resnet_size: int, training: bool,
                      state: Optional[Dict], new_state: Dict,
                      dtype=jnp.float32) -> jnp.ndarray:
    """CIFAR-style ResNet v1 (reference resnet_2.py ResNetCifar10 with
    version='v1')."""
    if resnet_size % 6 != 2:
        raise ValueError("cifar resnet_size must be 6n+2")
    n = (resnet_size - 2) // 6
    x = _conv(store, "init", images, 16, 3, 1, dtype)
    x = _bn_relu(store, state, new_state, "init_bn", x, training)
    for i, (filters, strides) in enumerate(zip([16, 32, 64], [1, 2, 2])):
        for b in range(n):
            x = _residual_v1(store, state, new_state, f"layer{i}_{b}", x,
                             filters, strides if b == 0 else 1, training,
                             dtype)
    x = jnp.mean(x, axis=(1, 2))
    return x.astype(jnp.float32)


def cifar10_resnet_v2(store: ParamStore, images: jnp.ndarray,
                      resnet_size: int, training: bool,
                      state: Optional[Dict], new_state: Dict,
                      dtype=jnp.float32) -> jnp.ndarray:
    """CIFAR-style 6n+2 ResNet v2 (resnet.py:186-240)."""
    if resnet_size % 6 != 2:
        raise ValueError("cifar resnet_size must be 6n+2")
    n = (resnet_size - 2) // 6
    x = _conv(store, "init", images, 16, 3, 1, dtype)
    for i, (filters, strides) in enumerate(zip([16, 32, 64], [1, 2, 2])):
        x = _block_layer(store, state, new_state, f"layer{i}", x,
                         _building_block_v2, filters, n, strides, training,
                         dtype)
    x = _bn_relu(store, state, new_state, "final_bn", x, training)
    x = jnp.mean(x, axis=(1, 2))
    return x.astype(jnp.float32)
