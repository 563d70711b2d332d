"""OPTIONAL parity checks against the reference's real bundled data.

The suite proper is self-contained (vendored fixtures, tests/paths.py);
these tests additionally exercise the pipeline on the reference's actual
production log samples (/root/reference/data) WHEN the mount is present —
real value distributions, real missing markers, real multivalue cells —
and skip cleanly when it is not.  Reference anchor: wide_deep_test.py:18
ran the reference's unit suite over data/test/test2.
"""

import numpy as np
import pytest

from paths import ref_data

REF_FIXTURE = ref_data("test", "test2")
REF_TRAIN = ref_data("train", "train1")

pytestmark = pytest.mark.skipif(
    REF_FIXTURE is None or REF_TRAIN is None,
    reason="reference mount not present (optional parity checks)")


def _rows(path, limit=None):
    with open(path) as f:
        rows = [l.rstrip("\n").split("\t") for l in f if l.strip()]
    return rows[:limit] if limit else rows


class TestReferenceData:
    def test_unit_fixture_full_batch(self, plan):
        """All 10 reference fixture rows parse into one valid batch."""
        from wide_deep_tpu.features.pipeline import FeatureTransformer
        batch = FeatureTransformer(plan).transform(_rows(REF_FIXTURE), 16)
        assert batch["mask"].sum() == 10
        assert set(batch["label"][:10]) <= {0.0, 1.0}

    def test_native_matches_python_on_reference_rows(self, plan):
        """C++ loader bit-identical to the Python path on REAL log rows
        (the vendored-fixture parity lives in test_native.py)."""
        from wide_deep_tpu.features import native
        from wide_deep_tpu.features.pipeline import FeatureTransformer
        if not native.NativeTransformer.available():
            pytest.skip("native lib not built")
        rows = _rows(REF_TRAIN, limit=300)
        py = FeatureTransformer(plan).transform(rows, 512)
        nat = native.NativeTransformer(plan).transform(rows, 512)
        assert set(py) == set(nat)
        for k in py:
            np.testing.assert_array_equal(py[k], nat[k], err_msg=k)

    def test_dataset_counts_reference_fixture(self, plan):
        from wide_deep_tpu.features.pipeline import CsvDataset
        ds = CsvDataset(plan, REF_FIXTURE, "eval", 8)
        assert sum(int(b["mask"].sum()) for b in ds) == 10
