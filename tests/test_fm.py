"""FM second-order wide-arm tests (the reference's linear.py:7 TODO,
implemented)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paths import UNIT_FIXTURE as FIXTURE


@pytest.fixture(scope="module")
def fm_model(small_plan_nofold):
    from wide_deep_tpu.models.joint import WideDeep
    return WideDeep(plan=small_plan_nofold, model_type="wide", fm_factors=4)


@pytest.fixture(scope="module")
def batch(small_plan_nofold, fixture_rows):
    from wide_deep_tpu.features.pipeline import FeatureTransformer
    tr = FeatureTransformer(small_plan_nofold)
    return {k: jnp.asarray(v)
            for k, v in tr.transform(fixture_rows, 16).items()}


class TestFm:
    def test_params_include_factors(self, fm_model, batch, small_plan_nofold):
        params, state = fm_model.init(jax.random.PRNGKey(0), dict(batch))
        assert params["linear"]["v"].shape == (small_plan_nofold.wide_dim, 4)

    def test_fm_changes_logits(self, fm_model, batch, small_plan_nofold):
        params, state = fm_model.init(jax.random.PRNGKey(0), dict(batch))
        with_fm, _ = fm_model.apply(params, state, batch)
        no_v = {"linear": {k: v for k, v in params["linear"].items()
                           if k != "v"}}
        without_fm, _ = fm_model.apply(no_v, state, batch)
        assert not np.allclose(np.asarray(with_fm), np.asarray(without_fm))

    def test_fm_term_matches_manual(self, small_plan_nofold):
        """0.5 * sum((sum x_i v_i)^2 - sum x_i^2 v_i^2) on a toy case."""
        from wide_deep_tpu.models.linear import _fm_term
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
        ids = jnp.asarray([[2, 7, 7, 0]], dtype=jnp.int32)
        wts = jnp.asarray([[1.0, 1.0, 0.5, 0.0]], dtype=jnp.float32)
        got = float(_fm_term(v, {"wide_ids": ids, "wide_wts": wts}, None)[0])
        vv = np.asarray(v)
        active = [(2, 1.0), (7, 1.0), (7, 0.5)]
        s1 = sum(w * vv[i] for i, w in active)
        s2 = sum((w ** 2) * vv[i] ** 2 for i, w in active)
        expect = 0.5 * float(np.sum(s1 ** 2 - s2))
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_fm_trains_and_improves(self, small_config, tmp_path):
        """wide+FM must still pass the trains-and-improves bar."""
        import os
        import shutil
        conf2 = tmp_path / "conf"
        shutil.copytree(small_config.conf_dir, conf2)
        text = (conf2 / "model.yaml").read_text()
        (conf2 / "model.yaml").write_text(
            text.replace("linear_fm_factors: 0", "linear_fm_factors: 4"))
        from wide_deep_tpu.config import Config
        from wide_deep_tpu.training.loop import Trainer
        tr = Trainer(Config(str(conf2)), model_type="wide",
                     model_dir=str(tmp_path / "m"),
                     overrides=dict(train_data=FIXTURE, eval_data=FIXTURE,
                                    test_data=FIXTURE, keep_train=True,
                                    batch_size=16))
        tr.ensure_initialized(restore=False)
        assert "v" in tr.params["linear"]
        tr.train_file(FIXTURE)
        first = tr.evaluate(FIXTURE)
        for _ in range(10):
            tr.train_file(FIXTURE)
        final = tr.evaluate(FIXTURE)
        assert final["loss"] < first["loss"]
