"""ops/embedding custom-VJP correctness: values and gradients must match the
naive autodiff path, including duplicate ids and padded (zero-weight) slots."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wide_deep_tpu.ops.embedding import fused_lookup, wide_lookup


def _naive_fused(table, ids, wts, seg):
    gathered = jnp.take(table, ids, axis=0)
    return jnp.einsum("bld,lf->bfd", gathered * wts[..., None], seg,
                      preferred_element_type=jnp.float32).astype(table.dtype)


def _naive_wide(w, ids, wts):
    return jnp.einsum("bln,bl->bn", jnp.take(w, ids, axis=0), wts,
                      preferred_element_type=jnp.float32)


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(0)
    rows, D, B, L, F = 64, 8, 16, 10, 3
    table = jnp.asarray(rng.normal(size=(rows, D)).astype(np.float32))
    # deliberately include duplicates and id 0 (pad)
    ids = jnp.asarray(rng.integers(0, rows, (B, L)).astype(np.int32))
    ids = ids.at[:, 0].set(5)  # heavy duplication of row 5
    wts = jnp.asarray((rng.random((B, L)) > 0.3).astype(np.float32) / 3)
    seg = np.zeros((L, F), np.float32)
    seg[0:4, 0] = 1; seg[4:7, 1] = 1; seg[7:10, 2] = 1
    return table, ids, wts, jnp.asarray(seg)


class TestFusedLookup:
    def test_forward_matches(self, case):
        table, ids, wts, seg = case
        np.testing.assert_allclose(
            np.asarray(fused_lookup(table, ids, wts, seg)),
            np.asarray(_naive_fused(table, ids, wts, seg)), rtol=1e-6)

    def test_grad_matches(self, case):
        table, ids, wts, seg = case
        g1 = jax.grad(lambda t: jnp.sum(fused_lookup(t, ids, wts, seg) ** 2))(
            table)
        g2 = jax.grad(lambda t: jnp.sum(_naive_fused(t, ids, wts, seg) ** 2))(
            table)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                                   atol=1e-6)

    def test_grad_under_jit(self, case):
        table, ids, wts, seg = case
        f = jax.jit(jax.grad(
            lambda t: jnp.sum(fused_lookup(t, ids, wts, seg))))
        g = f(table)
        assert np.isfinite(np.asarray(g)).all()

    def test_all_ids_same_row(self, case):
        table, _, _, seg = case
        ids = jnp.zeros((16, 10), jnp.int32)
        wts = jnp.ones((16, 10), jnp.float32)
        g1 = jax.grad(lambda t: jnp.sum(fused_lookup(t, ids, wts, seg)))(table)
        g2 = jax.grad(lambda t: jnp.sum(_naive_fused(t, ids, wts, seg)))(table)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)


class TestWideLookup:
    def test_forward_and_grad(self, case):
        table, ids, wts, _ = case
        w = table[:, :1]
        np.testing.assert_allclose(
            np.asarray(wide_lookup(w, ids, wts)),
            np.asarray(_naive_wide(w, ids, wts)), rtol=1e-6)
        g1 = jax.grad(lambda t: jnp.sum(wide_lookup(t, ids, wts) ** 2))(w)
        g2 = jax.grad(lambda t: jnp.sum(_naive_wide(t, ids, wts) ** 2))(w)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                                   atol=1e-6)
