"""wide_deep_tpu — a TPU-native Wide & Deep CTR framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Lapis-Hong/wide_deep reference (TF1 estimator + parameter servers): a
YAML-driven feature pipeline compiled to fixed-shape device batches, a
functional wide+deep(+cnn) model with per-arm optimizers under one jit'd
SPMD train step, sharded embedding tables over a jax.sharding.Mesh, and a
gRPC scoring service with Python and C++ clients.
"""

__version__ = "0.1.0"

from wide_deep_tpu.config import Config, ConfigError  # noqa: F401
