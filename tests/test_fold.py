"""Wide-fold tests: folded wide weights (trailing embedding-table columns)
must be exactly equivalent to the legacy wide-pool layout.

The fold (features/plan.py "wide fold") exploits that a hash feature / deep
cross uses the same bucket ids for its wide weight and its embedding row
(reference semantics: categorical_column_with_hash_bucket feeds both arms,
build_estimator.py:79-136), so one gather serves both arms.  These tests pin:

* layout: folded slots leave the wide pool/table; ids/weights agree between
  the Python and C++ loaders on a folded plan
* math: folded logits == legacy logits when the folded columns hold the same
  values as the legacy wide rows
* training: loss trajectories agree between fold on/off (same FTRL math on
  the same gradients)
"""

import os
import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paths import UNIT_FIXTURE as FIXTURE


@pytest.fixture(scope="module")
def rows(fixture_rows):
    return fixture_rows


def _batches(plan, rows, B=16):
    from wide_deep_tpu.features.pipeline import FeatureTransformer
    tr = FeatureTransformer(plan)
    return {k: jnp.asarray(v) for k, v in tr.transform(rows, B).items()}


class TestFoldLayout:
    def test_folded_slots_absent_from_pool(self, small_plan,
                                           small_plan_nofold, rows):
        assert small_plan.fold and small_plan.folded_names
        assert not small_plan_nofold.fold
        # the folded pool is strictly narrower and its ids never land in
        # folded slots' (nonexistent) wide ranges
        assert small_plan.wide_packed_len < small_plan_nofold.wide_packed_len
        assert small_plan.wide_dim < small_plan_nofold.wide_dim
        b = _batches(small_plan, rows)
        assert int(jnp.max(b["wide_ids"])) < small_plan.wide_dim
        # embed pools are identical across fold settings (fold only moves
        # the wide side)
        b0 = _batches(small_plan_nofold, rows)
        for g in small_plan.groups:
            for k in (f"emb_ids_d{g.dim}", f"emb_wts_d{g.dim}",
                      f"emb_seg_d{g.dim}"):
                np.testing.assert_array_equal(np.asarray(b[k]),
                                              np.asarray(b0[k]))

    def test_native_loader_parity_folded(self, small_plan, rows):
        from wide_deep_tpu.features.native import NativeTransformer
        from wide_deep_tpu.features.pipeline import FeatureTransformer
        if not NativeTransformer.available():
            pytest.skip("native lib not built")
        py = FeatureTransformer(small_plan).transform(rows, 16)
        cc = NativeTransformer(small_plan).transform(rows, 16)
        assert set(py) == set(cc)
        for k in py:
            np.testing.assert_array_equal(py[k], cc[k], err_msg=k)


class TestFoldMath:
    def _models(self, small_config, small_plan, small_plan_nofold):
        from wide_deep_tpu.models.joint import build_model
        folded = build_model(small_config, plan=small_plan,
                             model_type="wide_deep")
        legacy = build_model(small_config, plan=small_plan_nofold,
                             model_type="wide_deep")
        return folded, legacy

    def test_logits_equal_with_matched_params(self, small_config, small_plan,
                                              small_plan_nofold, rows):
        """Copy random folded columns into the legacy wide rows; forward
        passes must agree exactly (same weights, same ids)."""
        folded, legacy = self._models(small_config, small_plan,
                                      small_plan_nofold)
        bf = _batches(small_plan, rows)
        bl = _batches(small_plan_nofold, rows)
        pf, sf = folded.init(jax.random.PRNGKey(0), dict(bf))
        pl_, sl = legacy.init(jax.random.PRNGKey(0), dict(bl))
        # same dnn params (identical shapes: the fold does not change the
        # embedding tables), same bias
        pl_["dnn"] = pf["dnn"]
        rng = np.random.default_rng(0)
        w = np.zeros(pl_["linear"]["w"].shape, np.float32)
        for name in small_plan.folded_names:
            g, es = small_plan.embed_slot_by_name[name]
            ws_legacy = small_plan_nofold.wide_slot_by_name[name]
            col = rng.normal(size=(es.vocab_size, w.shape[1])).astype(
                np.float32)
            fold = np.asarray(pf["linear"]["fold"][f"d{g.dim}"]).copy()
            fold[es.row_offset:es.row_offset + es.vocab_size] = col
            pf["linear"]["fold"][f"d{g.dim}"] = jnp.asarray(fold)
            w[ws_legacy.offset:ws_legacy.offset + ws_legacy.size] = col
        # unfolded slots get matching weights through the shared wide table
        for s in small_plan.wide_slots:
            if s.folded:
                continue
            sl_legacy = small_plan_nofold.wide_slot_by_name[s.name]
            col = rng.normal(size=(s.size, w.shape[1])).astype(np.float32)
            w[sl_legacy.offset:sl_legacy.offset + sl_legacy.size] = col
            wf = np.asarray(pf["linear"]["w"]).copy()
            wf[s.offset:s.offset + s.size] = col
            pf["linear"]["w"] = jnp.asarray(wf)
        pl_["linear"]["w"] = jnp.asarray(w)
        lf, _ = folded.apply(pf, sf, bf)
        ll, _ = legacy.apply(pl_, sl, bl)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(ll),
                                   rtol=2e-5, atol=2e-5)

    def test_fold_columns_receive_ftrl_updates(self, small_config, tmp_path,
                                               rows):
        from wide_deep_tpu.training.loop import Trainer
        tr = Trainer(small_config, model_type="wide_deep",
                     model_dir=str(tmp_path / "m"),
                     overrides=dict(train_data=FIXTURE, eval_data=FIXTURE,
                                    test_data=FIXTURE, keep_train=True,
                                    batch_size=8))
        tr.ensure_initialized(restore=False)
        assert "fold" in tr.params["linear"], "fold expected on by default"
        # two epochs: FTRL's lazy-l1 threshold keeps a coordinate at
        # exactly 0 until |z| > l1 (0.5); one pass over a 10-row fixture
        # with mostly-unique ids accumulates |z| ~= 0.5 per id, which is
        # legitimately below threshold — the property under test is that
        # accumulated gradients DO reach the folded columns
        tr.train_file(FIXTURE)
        tr.train_file(FIXTURE)
        moved = sum(float(jnp.sum(jnp.abs(v)))
                    for v in tr.params["linear"]["fold"].values())
        assert moved > 0.0, "FTRL never touched the folded wide columns"


class TestFoldTraining:
    def test_loss_trajectory_matches_legacy(self, small_config, tmp_path):
        """Fold on/off must train identically (same grads, same FTRL math);
        only float summation order differs."""
        from wide_deep_tpu.config import Config
        from wide_deep_tpu.training.loop import Trainer

        conf2 = tmp_path / "conf_nofold"
        shutil.copytree(small_config.conf_dir, conf2)
        with open(conf2 / "model.yaml", "a") as f:
            f.write("\nwide_fold: false\n")

        losses = {}
        for tag, cfg in (("fold", small_config),
                         ("nofold", Config(str(conf2)))):
            tr = Trainer(cfg, model_type="wide_deep",
                         model_dir=str(tmp_path / tag),
                         overrides=dict(train_data=FIXTURE, eval_data=FIXTURE,
                                        test_data=FIXTURE, keep_train=True,
                                        batch_size=8))
            assert tr.plan.fold == (tag == "fold")
            tr.ensure_initialized(restore=False)
            traj = [tr.train_file(FIXTURE) for _ in range(5)]
            traj.append(tr.evaluate(FIXTURE)["loss"])
            losses[tag] = traj
        np.testing.assert_allclose(losses["fold"], losses["nofold"],
                                   rtol=5e-4)


class TestDropoutBnMaskRegression:
    def test_dropout_plus_bn_uses_batch_mask(self, small_plan, rows):
        """Regression: the dropout mask must not shadow the padding mask fed
        to masked BN (models/deep.py tower_forward)."""
        from wide_deep_tpu.models.deep import (DeepSpec, ParamStore,
                                               PlanConstants, TowerSpec,
                                               deep_logits, init_deep_params)
        spec = DeepSpec(towers=(TowerSpec((8, 8), "simple"),),
                        dropout=0.5, batch_norm=True)
        consts = PlanConstants(small_plan)
        batch = {k: np.array(v) for k, v in _batches(small_plan, rows).items()}
        batch["mask"][8:] = 0.0  # half the batch is padding
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        params, bn = init_deep_params(jax.random.PRNGKey(0), small_plan,
                                      consts, spec, 1, batch)
        logits, new_bn, _ = deep_logits(ParamStore(params), small_plan,
                                        consts, spec, batch, 1, True,
                                        jax.random.PRNGKey(1), bn)
        assert np.isfinite(np.asarray(logits)).all()
        for leaf in jax.tree.leaves(new_bn):
            assert np.isfinite(np.asarray(leaf)).all()


class TestFoldBf16:
    def test_bf16_tables_metric_parity(self, small_config, tmp_path):
        """With bfloat16 tables (the production default) the folded wide
        weights are read at bf16 precision — training must stay metric-
        equivalent to the unfolded f32-wide-arm layout on the sample data."""
        import os

        from wide_deep_tpu.config import Config
        from wide_deep_tpu.training.loop import Trainer

        REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        TRAIN = os.path.join(REPO, "data", "train")
        EVAL = os.path.join(REPO, "data", "eval", "eval1")
        results = {}
        for tag in ("fold", "nofold"):
            conf2 = tmp_path / f"conf_{tag}"
            shutil.copytree(small_config.conf_dir, conf2)
            text = (conf2 / "model.yaml").read_text()
            text = text.replace("embedding_dtype: float32",
                                "embedding_dtype: bfloat16")
            if tag == "nofold":
                text += "\nwide_fold: false\n"
            (conf2 / "model.yaml").write_text(text)
            tr = Trainer(Config(str(conf2)), model_type="wide_deep",
                         model_dir=str(tmp_path / tag),
                         overrides=dict(train_data=TRAIN, eval_data=EVAL,
                                        test_data=EVAL, keep_train=True,
                                        batch_size=64, num_examples=4000))
            assert tr.plan.fold == (tag == "fold")
            tr.ensure_initialized(restore=False)
            for epoch in range(3):
                for f in sorted(os.listdir(TRAIN)):
                    tr.train_file(os.path.join(TRAIN, f), epoch_seed=epoch)
            results[tag] = tr.evaluate(EVAL)
        assert abs(results["fold"]["auc"] - results["nofold"]["auc"]) < 0.02, \
            results
        assert abs(results["fold"]["average_loss"]
                   - results["nofold"]["average_loss"]) < 0.02, results
