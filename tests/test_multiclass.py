"""Multiclass head end-to-end (reference joint.py:402-412 multi_class path)."""

import numpy as np
import pytest

from paths import UNIT_FIXTURE as FIXTURE


@pytest.fixture(scope="module")
def mc_data(tmp_path_factory):
    """Fixture rows with synthetic 3-class labels."""
    rows = [line.rstrip("\n").split("\t")
            for line in open(FIXTURE) if line.strip()]
    for i, row in enumerate(rows):
        row[0] = str(i % 3)
    path = tmp_path_factory.mktemp("mc") / "data"
    path.write_text("\n".join("\t".join(r) for r in rows) + "\n")
    return str(path)


class TestMulticlass:
    def test_label_parsing(self, small_plan, mc_data):
        from wide_deep_tpu.features.pipeline import CsvDataset
        ds = CsvDataset(small_plan, mc_data, "eval", 16, n_classes=3)
        batch = next(iter(ds))
        labels = batch["label"][batch["mask"] > 0]
        assert set(np.unique(labels)) == {0.0, 1.0, 2.0}

    def test_native_label_parsing(self, small_plan, mc_data):
        from wide_deep_tpu.features.native import NativeTransformer
        if not NativeTransformer.available():
            pytest.skip("native lib not built")
        nat = NativeTransformer(small_plan, n_classes=3)
        text = open(mc_data, "rb").read()
        batch = nat.transform_text(text, 10, 16)
        assert set(np.unique(batch["label"][:10])) == {0.0, 1.0, 2.0}

    def test_trains_and_improves_3way(self, small_config, tmp_path, mc_data):
        from wide_deep_tpu.training.loop import Trainer
        tr = Trainer(small_config, model_type="wide_deep",
                     model_dir=str(tmp_path), n_classes=3,
                     overrides=dict(train_data=mc_data, eval_data=mc_data,
                                    test_data=mc_data, keep_train=True,
                                    batch_size=16))
        tr.ensure_initialized(restore=False)
        assert tr.model.n_logits == 3
        tr.train_file(mc_data)
        first = tr.evaluate(mc_data)
        for _ in range(15):
            tr.train_file(mc_data)
        final = tr.evaluate(mc_data)
        assert final["loss"] < first["loss"]
        preds = list(tr.predict(mc_data))
        assert len(preds) == 10
        for p in preds:
            assert p["probabilities"].shape == (3,)
            assert 0 <= int(p["class_ids"]) <= 2
