"""Classification heads: loss + predictions.

Functional analogs of the reference's canned estimator heads
(/root/reference/python/lib/joint.py:402-412):
``_binary_logistic_head_with_sigmoid_cross_entropy_loss`` (n_classes == 2,
1 logit) and ``_multi_class_head_with_softmax_cross_entropy_loss``.

Loss is the weighted mean of per-example cross-entropy — weights combine the
config's pos/neg sample weights with the batch padding mask, so one compiled
step handles uneven final batches.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def n_logits_for(n_classes: int) -> int:
    if n_classes < 2:
        raise ValueError("n_classes must be >= 2")
    return 1 if n_classes == 2 else n_classes


def head_loss(logits: jnp.ndarray, labels: jnp.ndarray, weights: jnp.ndarray,
              n_classes: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(weighted mean loss, per-example loss)."""
    if n_classes == 2:
        z = logits[:, 0]
        y = labels.astype(jnp.float32)
        # numerically stable sigmoid cross entropy; softplus form keeps the
        # gradient well-defined at z == 0 (where zero-init arms start)
        per_ex = jax.nn.softplus(-z) + z * (1.0 - y)
    else:
        y = labels.astype(jnp.int32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per_ex = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
    w = weights.astype(jnp.float32)
    total_w = jnp.maximum(jnp.sum(w), 1e-12)
    return jnp.sum(per_ex * w) / total_w, per_ex


def head_predictions(logits: jnp.ndarray, n_classes: int) -> Dict[str, jnp.ndarray]:
    """logits -> {logits, probabilities, class_ids, classes} (head parity)."""
    if n_classes == 2:
        p = jax.nn.sigmoid(logits[:, 0])
        probs = jnp.stack([1.0 - p, p], axis=1)
        class_ids = (p >= 0.5).astype(jnp.int32)
        return {"logits": logits, "logistic": p, "probabilities": probs,
                "class_ids": class_ids}
    probs = jax.nn.softmax(logits, axis=-1)
    return {"logits": logits, "probabilities": probs,
            "class_ids": jnp.argmax(logits, axis=-1).astype(jnp.int32)}
