"""Data-driven pack_budget (features/analyze.py) — `pack_budget: auto`."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN = os.path.join(REPO, "data", "train")
from paths import UNIT_FIXTURE as FIXTURE


class TestOccupancy:
    def test_occupancy_counts(self, small_plan_nofold):
        from wide_deep_tpu.features.analyze import multivalue_occupancy
        occ = multivalue_occupancy(small_plan_nofold, TRAIN, max_rows=500)
        assert occ, "sample data has multivalue features"
        for name, arr in occ.items():
            ml = small_plan_nofold.feature_conf[name]["max_len"]
            assert arr.min() >= 1
            # raw comma counts may exceed the static cap; the plan truncates
            assert arr.max() <= 64
            assert ml > 1

    def test_suggestion_in_range(self, small_plan_nofold):
        from wide_deep_tpu.features.analyze import suggest_pack_budget
        s = suggest_pack_budget(small_plan_nofold, TRAIN, max_rows=2000)
        max_len = max(c.get("max_len", 1)
                      for c in small_plan_nofold.feature_conf.values())
        assert 1 <= s <= max_len

    def test_resolve_auto_and_int(self, small_config, tmp_path):
        import shutil

        from wide_deep_tpu.config import Config
        from wide_deep_tpu.features.analyze import resolve_pack_budget

        conf2 = tmp_path / "conf"
        shutil.copytree(small_config.conf_dir, conf2)
        text = (conf2 / "train.yaml").read_text()
        (conf2 / "train.yaml").write_text(
            text.replace("pack_budget: 3", "pack_budget: auto"))
        cfg = Config(str(conf2))
        assert cfg.train["pack_budget"] == "auto"
        budget = resolve_pack_budget(cfg, TRAIN)
        assert isinstance(budget, int) and budget >= 1
        # int passthrough
        assert resolve_pack_budget(small_config, TRAIN) == 3
        # unreadable data falls back to the default with a warning
        assert resolve_pack_budget(cfg, str(tmp_path / "nope")) == 3

    def test_trainer_auto_budget(self, small_config, tmp_path):
        """Trainer resolves auto against its (overridden) train_data and the
        resulting pools drive a real training step."""
        import shutil

        from wide_deep_tpu.config import Config
        from wide_deep_tpu.features.analyze import suggest_pack_budget
        from wide_deep_tpu.features.plan import FeaturePlan
        from wide_deep_tpu.training.loop import Trainer

        conf2 = tmp_path / "conf"
        shutil.copytree(small_config.conf_dir, conf2)
        text = (conf2 / "train.yaml").read_text()
        (conf2 / "train.yaml").write_text(
            text.replace("pack_budget: 3", "pack_budget: auto"))
        cfg = Config(str(conf2))
        tr = Trainer(cfg, model_type="wide_deep",
                     model_dir=str(tmp_path / "m"),
                     overrides=dict(train_data=FIXTURE, eval_data=FIXTURE,
                                    test_data=FIXTURE, keep_train=True,
                                    batch_size=8))
        expect = suggest_pack_budget(
            FeaturePlan(cfg, fold=False, pack_budget=3), FIXTURE)
        assert tr.plan.pack_budget == expect
        tr.ensure_initialized(restore=False)
        loss = tr.train_file(FIXTURE)
        assert np.isfinite(loss)
