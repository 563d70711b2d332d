"""Estimator facade tests (reference wide_deep_test.py style)."""

import numpy as np
import pytest

from paths import UNIT_FIXTURE as FIXTURE


class TestWideAndDeepClassifier:
    def test_train_eval_predict(self, small_config, tmp_path):
        from wide_deep_tpu.estimator import WideAndDeepClassifier
        est = WideAndDeepClassifier(
            str(tmp_path), "wide_deep", config=small_config,
            overrides=dict(train_data=FIXTURE, eval_data=FIXTURE,
                           test_data=FIXTURE, keep_train=True, batch_size=16))
        est.train(FIXTURE)
        first = est.evaluate(FIXTURE)
        est.train(FIXTURE, epochs=10)
        final = est.evaluate(FIXTURE)
        assert final["loss"] < first["loss"]
        assert est.global_step > 0
        preds = list(est.predict(FIXTURE))
        assert len(preds) == 10

    def test_export(self, small_config, tmp_path):
        import os
        from wide_deep_tpu.estimator import WideAndDeepClassifier
        est = WideAndDeepClassifier(
            str(tmp_path / "m"), "wide", config=small_config,
            overrides=dict(train_data=FIXTURE, eval_data=FIXTURE,
                           test_data=FIXTURE, keep_train=True, batch_size=16))
        est.train(FIXTURE)
        out = est.export_savedmodel(str(tmp_path / "export"))
        assert os.path.exists(os.path.join(out, "bundle.json"))


class TestMultiDNNClassifier:
    def test_three_towers(self, small_config, tmp_path):
        from wide_deep_tpu.estimator import MultiDNNClassifier
        est = MultiDNNClassifier(
            str(tmp_path), hidden_units_list=[[16, 8], [8], [16]],
            connected_mode_list=["simple", "resnet", "dense"],
            config=small_config,
            overrides=dict(train_data=FIXTURE, eval_data=FIXTURE,
                           test_data=FIXTURE, keep_train=True, batch_size=16))
        trainer = est._trainer
        assert len(trainer.model.deep_spec.towers) == 3
        est.train(FIXTURE)
        res = est.evaluate(FIXTURE)
        assert np.isfinite(res["loss"])


class TestCannedBuilder:
    def test_canned_defaults(self, small_config, tmp_path):
        from wide_deep_tpu.estimator import build_estimator
        est = build_estimator(str(tmp_path), "wide_deep", config=small_config)
        model_conf = est._trainer.config.model
        assert model_conf["linear_optimizer"]["name"] == "Ftrl"
        assert model_conf["linear_optimizer"]["learning_rate"] <= 0.005
        assert model_conf["dnn_optimizer"]["name"] == "ProximalAdagrad"

    def test_custom_builder(self, small_config, tmp_path):
        from wide_deep_tpu.estimator import build_custom_estimator
        est = build_custom_estimator(str(tmp_path), "deep",
                                     config=small_config)
        assert est._trainer.model_type == "deep"
