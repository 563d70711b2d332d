"""Pallas embedding kernel: interpreter-mode correctness on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wide_deep_tpu.ops.pallas_embedding import pallas_gather_weight


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    R, D, B, L = 256, 8, 16, 10
    table = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, R, (B, L)).astype(np.int32))
    wts = jnp.asarray(rng.random((B, L)).astype(np.float32))
    return table, ids, wts


class TestPallasGather:
    def test_matches_reference(self, case):
        table, ids, wts = case
        out = pallas_gather_weight(table, ids, wts, interpret=True)
        ref = jnp.take(table, ids, axis=0) * wts[..., None]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6)

    def test_duplicate_and_zero_ids(self, case):
        table, ids, wts = case
        ids = ids.at[:, 0].set(0).at[:, 1].set(0)
        out = pallas_gather_weight(table, ids, wts, interpret=True)
        ref = jnp.take(table, ids, axis=0) * wts[..., None]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6)

    def test_bad_block_rejected(self, case):
        table, ids, wts = case
        with pytest.raises(ValueError, match="not divisible"):
            pallas_gather_weight(table, ids, wts, block_b=7, interpret=True)
