"""Native (C++) loader parity: must be bit-identical to the Python pipeline."""

import os

import numpy as np
import pytest

from wide_deep_tpu.features.pipeline import CsvDataset, FeatureTransformer
from paths import UNIT_FIXTURE
from paths import TRAIN1
from paths import PRED1

native = pytest.importorskip("wide_deep_tpu.features.native")

needs_lib = pytest.mark.skipif(
    not native.NativeTransformer.available(),
    reason="libwdtfastdata.so not built (make -C cpp)")


@needs_lib
class TestNativeParity:
    @pytest.fixture(scope="class")
    def both(self, plan):
        return (FeatureTransformer(plan), native.NativeTransformer(plan))

    def _assert_equal(self, py_batch, nat_batch):
        assert set(py_batch) == set(nat_batch)
        for k in py_batch:
            np.testing.assert_array_equal(py_batch[k], nat_batch[k], err_msg=k)

    def test_fixture_bit_identical(self, both, fixture_rows):
        py, nat = both
        self._assert_equal(py.transform(fixture_rows, 16),
                           nat.transform(fixture_rows, 16))

    def test_train_sample_bit_identical(self, both):
        py, nat = both
        with open(TRAIN1) as f:
            rows = [l.rstrip("\n").split("\t") for l in f][:500]
        self._assert_equal(py.transform(rows, 512), nat.transform(rows, 512))

    def test_pred_mode(self, both):
        py, nat = both
        with open(PRED1) as f:
            lines = [l.rstrip("\n") for l in f][:64]
        # python path: label column prepended when absent
        rows = [[""] + l.split("\t") for l in lines]
        py_b = py.transform(rows, 64, mode="pred")
        py_b.pop("label", None); py_b.pop("weight", None)
        nat_b = nat.transform_text("\n".join(lines).encode(), 64, 64,
                                   mode="pred")
        self._assert_equal(py_b, nat_b)

    def test_weighted(self, plan, fixture_rows):
        py = FeatureTransformer(plan, pos_weight=0.9, neg_weight=0.1)
        nat = native.NativeTransformer(plan, pos_weight=0.9, neg_weight=0.1)
        self._assert_equal(py.transform(fixture_rows, 16),
                           nat.transform(fixture_rows, 16))

    def test_edge_values(self, plan, fixture_rows, both):
        py, nat = both
        row = list(fixture_rows[0])
        col = plan.column_index
        row[col["age"]] = "-"
        row[col["os"]] = "notavocab"
        row[col["idea_type"]] = "-7"
        row[col["ucomp"]] = "A,B,C,D,E,F,G,H,I,J,K"  # beyond max_len
        row[col["adplan_id"]] = ""
        self._assert_equal(py.transform([row], 4), nat.transform([row], 4))

    def test_malformed_rows_skipped(self, plan, both):
        _, nat = both
        text = b"only\tthree\tcells\n"
        batch = nat.transform_text(text, 1, 4)
        assert batch["mask"].sum() == 0

    def test_dataset_native_path(self, plan):
        ds = CsvDataset(plan, UNIT_FIXTURE, "eval", 8)
        assert ds._native == native.NativeTransformer.available()
        total = sum(int(b["mask"].sum()) for b in ds)
        assert total == 10
