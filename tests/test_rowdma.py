"""ops/rowdma: scatter-assign semantics (sentinel dropping, unique sorted
uids, fused-width contract).  CPU exercises the XLA reference path; the
Pallas kernel itself is validated on hardware by tools/validate_rowdma.py
and indirectly by the fused-optimizer equivalence in test_sparse_optim.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from wide_deep_tpu.ops.rowdma import FUSED_WIDTH, rowdma_scatter_rows


class TestRowDmaSemantics:
    def test_set_with_sentinels(self):
        rng = np.random.default_rng(0)
        r, n = 4096, 300
        uids = np.sort(rng.choice(r, n, replace=False)).astype(np.int32)
        uids[-60:] = r  # sentinel padding tail (make_compact_plan layout)
        rows = rng.standard_normal((n, FUSED_WIDTH)).astype(np.float32)
        table = rng.standard_normal((r, FUSED_WIDTH)).astype(np.float32)
        out = np.asarray(rowdma_scatter_rows(
            jnp.asarray(table), jnp.asarray(uids), jnp.asarray(rows),
            interpret=True))
        live = uids[uids < r]
        np.testing.assert_array_equal(out[live], rows[:len(live)])
        untouched = np.setdiff1d(np.arange(r), live)
        np.testing.assert_array_equal(out[untouched], table[untouched])

    def test_width_contract(self):
        table = jnp.zeros((64, 32), jnp.float32)
        rows = jnp.zeros((8, 32), jnp.float32)
        with pytest.raises(AssertionError, match="128-lane"):
            rowdma_scatter_rows(table, jnp.zeros(8, jnp.int32), rows,
                                interpret=True)


class TestFusedLayout:
    def test_layout_offsets(self):
        from wide_deep_tpu.optim.sparse import fused_layout
        assert fused_layout({"name": "Adagrad"}, 32) == {"accum": 32}
        assert fused_layout({"name": "Ftrl"}, 32) == {"accum": 32,
                                                      "linear": 64}
        assert fused_layout({"name": "SGD"}, 32) == {}

    def test_init_fused_params(self):
        from wide_deep_tpu.optim.sparse import (SparseTable,
                                                init_fused_params)
        t = SparseTable(name="dnn.embed.d8", path=("dnn", "embed", "d8"),
                        ids_key="emb_ids_d8",
                        spec={"name": "Adagrad",
                              "initial_accumulator_value": 0.5},
                        lr=0.1, dim=8, fused=True)
        params = {"dnn": {"embed": {"d8": jnp.zeros((16, FUSED_WIDTH))}}}
        out = init_fused_params(params, {t.name: t})
        tab = np.asarray(out["dnn"]["embed"]["d8"])
        np.testing.assert_array_equal(tab[:, :8], 0.0)        # param block
        np.testing.assert_array_equal(tab[:, 8:16], 0.5)      # accum block
        np.testing.assert_array_equal(tab[:, 16:], 0.0)       # padding
