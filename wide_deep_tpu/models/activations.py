"""Activation registry — the reference's 10-name table (model_util.py:28-59)."""

import jax
import jax.numpy as jnp


def _crelu(x):
    """Concatenated ReLU — doubles the feature dimension."""
    return jnp.concatenate([jax.nn.relu(x), jax.nn.relu(-x)], axis=-1)


ACTIVATIONS = {
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "leaky_relu": jax.nn.leaky_relu,
    "crelu": _crelu,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "softplus": jax.nn.softplus,
    "softsign": jax.nn.soft_sign,
}


def activation_fn(name: str):
    try:
        return ACTIVATIONS[name.lower()]
    except KeyError:
        raise ValueError(
            f"unsupported activation `{name}`; expected one of "
            f"{sorted(ACTIVATIONS)}") from None
