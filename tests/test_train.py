"""End-to-end training tests — the reference's correctness bar
(wide_deep_test.py:56-85: train briefly, then longer; loss must fall and
accuracy/auc/auc_precision_recall must rise) plus checkpoint resume and
prediction streaming."""

import os

import numpy as np
import pytest

from paths import UNIT_FIXTURE as FIXTURE


def _trainer(small_config, tmp_path, model_type, **over):
    from wide_deep_tpu.training.loop import Trainer
    overrides = dict(train_data=FIXTURE, eval_data=FIXTURE, test_data=FIXTURE,
                     keep_train=True, batch_size=16)
    overrides.update(over)
    return Trainer(small_config, model_type=model_type,
                   model_dir=str(tmp_path), overrides=overrides)


class TestTrainsAndImproves:
    @pytest.mark.parametrize("model_type", ["wide", "deep", "wide_deep"])
    def test_improves(self, small_config, tmp_path, model_type):
        tr = _trainer(small_config, tmp_path / model_type, model_type)
        tr.ensure_initialized(restore=False)
        tr.train_file(FIXTURE)
        first = tr.evaluate(FIXTURE)
        for _ in range(15):
            tr.train_file(FIXTURE)
        final = tr.evaluate(FIXTURE)
        assert final["loss"] < first["loss"], (first, final)
        assert final["accuracy"] >= first["accuracy"], (first, final)
        assert final["auc"] >= first["auc"], (first, final)
        assert final["auc_precision_recall"] >= first["auc_precision_recall"]

    def test_weighted_loss_mode(self, small_config, tmp_path):
        tr = _trainer(small_config, tmp_path, "wide_deep",
                      pos_sample_loss_weight=0.9,
                      neg_sample_loss_weight=0.1)
        tr.ensure_initialized(restore=False)
        loss = tr.train_file(FIXTURE)
        assert np.isfinite(loss)


class TestCheckpointing:
    def test_save_restore_roundtrip(self, small_config, tmp_path):
        import jax
        tr = _trainer(small_config, tmp_path, "wide_deep")
        tr.ensure_initialized(restore=False)
        tr.train_file(FIXTURE)
        tr.save()
        step, params = tr.global_step, tr.params

        tr2 = _trainer(small_config, tmp_path, "wide_deep")
        tr2.ensure_initialized(restore=True)
        assert tr2.global_step == step
        for (p1, p2) in zip(jax.tree.leaves(params),
                            jax.tree.leaves(tr2.params)):
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def test_resume_continues_training(self, small_config, tmp_path):
        tr = _trainer(small_config, tmp_path, "deep")
        tr.ensure_initialized(restore=False)
        tr.train_file(FIXTURE)
        tr.save()
        tr2 = _trainer(small_config, tmp_path, "deep")
        tr2.ensure_initialized()
        before = tr2.global_step
        tr2.train_file(FIXTURE)
        assert tr2.global_step > before

    def test_inspect_checkpoint(self, small_config, tmp_path, capsys):
        from wide_deep_tpu.training.checkpoint import inspect_checkpoint
        tr = _trainer(small_config, tmp_path, "wide")
        tr.ensure_initialized(restore=False)
        tr.train_file(FIXTURE)
        tr.save()
        tensors = inspect_checkpoint(tr.model_dir)
        assert any("linear" in k and k.endswith("w") for k in tensors)


class TestFusedCompactCheckpoint:
    """Fused sparse tables ([rows, 128] f32 with in-param optimizer slots,
    ops/rowdma.py) checkpoint as their LIVE column block only — the row-DMA
    padding is provably zero and would double the d32 table's checkpoint
    bytes at production shapes (optim/sparse.compact_fused_ckpt)."""

    def _fused_trainer(self, small_config, model_dir):
        import jax
        from wide_deep_tpu.parallel import mesh as mesh_lib
        from wide_deep_tpu.training.loop import Trainer
        return Trainer(
            small_config, model_type="deep", model_dir=str(model_dir),
            mesh=mesh_lib.make_mesh(1, 1, devices=jax.devices()[:1]),
            overrides=dict(train_data=FIXTURE, eval_data=FIXTURE,
                           test_data=FIXTURE, keep_train=True,
                           batch_size=16, sparse_optimizer=True))

    @pytest.fixture()
    def force_fused(self, monkeypatch):
        import wide_deep_tpu.optim.sparse as sparse_lib
        monkeypatch.setattr(sparse_lib, "SPARSE_MIN_ROWS", 1)

    def test_compact_roundtrip(self, small_config, tmp_path, force_fused):
        import jax
        from wide_deep_tpu.optim.sparse import fused_live_width
        from wide_deep_tpu.ops.rowdma import FUSED_WIDTH
        from wide_deep_tpu.training.checkpoint import inspect_checkpoint

        tr = self._fused_trainer(small_config, tmp_path)
        tr.ensure_initialized(restore=False)
        assert tr.sparse_tables, "premise: small conf must yield fused tables"
        tr.train_file(FIXTURE)
        tr.save()

        # on disk: live columns only (param + Adagrad accum), not 128
        tensors = inspect_checkpoint(tr.model_dir)
        for t in tr.sparse_tables.values():
            leaf = tensors["params/" + "/".join(t.path)]
            assert leaf.shape[1] == fused_live_width(t.spec, t.dim)
            assert leaf.shape[1] < FUSED_WIDTH
            # live table padding is zero, so the slice loses nothing
            live = np.asarray(_leaf(tr.params, t.path))
            np.testing.assert_array_equal(live[:, leaf.shape[1]:], 0.0)

        # restore: full-width live layout, bit-identical, training continues
        tr2 = self._fused_trainer(small_config, tmp_path)
        tr2.ensure_initialized(restore=True)
        assert tr2.global_step == tr.global_step
        for p1, p2 in zip(jax.tree.leaves(tr.params),
                          jax.tree.leaves(tr2.params)):
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
        for s1, s2 in zip(jax.tree.leaves(tr.opt_state),
                          jax.tree.leaves(tr2.opt_state)):
            np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        tr2.train_file(FIXTURE)
        assert tr2.global_step > tr.global_step

    def test_legacy_full_width_restores(self, small_config, tmp_path,
                                        force_fused, monkeypatch):
        """Checkpoints written before the compact form (full [rows, 128]
        leaves) still restore through the fallback path."""
        import jax
        import wide_deep_tpu.optim.sparse as sparse_lib

        tr = self._fused_trainer(small_config, tmp_path)
        tr.ensure_initialized(restore=False)
        tr.train_file(FIXTURE)
        with monkeypatch.context() as m:
            m.setattr(sparse_lib, "compact_fused_ckpt", lambda p, t: p)
            tr.save()

        tr2 = self._fused_trainer(small_config, tmp_path)
        tr2.ensure_initialized(restore=True)
        assert tr2.global_step == tr.global_step
        for p1, p2 in zip(jax.tree.leaves(tr.params),
                          jax.tree.leaves(tr2.params)):
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def _leaf(tree, path):
    for k in path:
        tree = tree[k]
    return tree


class TestPredict:
    def test_streaming_predictions(self, small_config, tmp_path):
        tr = _trainer(small_config, tmp_path, "wide_deep")
        tr.ensure_initialized(restore=False)
        tr.train_file(FIXTURE)
        preds = list(tr.predict(FIXTURE))
        assert len(preds) == 10  # one per fixture row, padding dropped
        for p in preds:
            assert p["class_ids"] in (0, 1)
            assert 0.0 <= float(p["logistic"]) <= 1.0
            np.testing.assert_allclose(p["probabilities"].sum(), 1.0,
                                       rtol=1e-5)


class TestMetricsAgainstNumpy:
    def test_auc_matches_exact(self, small_config, tmp_path):
        """Streaming bucketed AUC must track the exact pairwise AUC."""
        import jax.numpy as jnp
        from wide_deep_tpu import metrics as m
        rng = np.random.default_rng(0)
        n = 2000
        y = rng.integers(0, 2, n).astype(np.float32)
        # informative but noisy scores
        p = np.clip(0.3 * y + 0.35 + 0.25 * rng.random(n), 0, 1).astype(
            np.float32)
        acc = m.init_metrics()
        per_ex = np.zeros(n, np.float32)
        for i in range(0, n, 500):
            sl = slice(i, i + 500)
            acc = m.update_metrics(acc, jnp.asarray(p[sl]), jnp.asarray(y[sl]),
                                   jnp.ones(500), jnp.asarray(per_ex[sl]))
        res = m.finalize_metrics(acc)
        # exact AUC via rank statistic
        order = np.argsort(p)
        ranks = np.empty(n); ranks[order] = np.arange(1, n + 1)
        n_pos, n_neg = y.sum(), n - y.sum()
        exact = (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
        assert abs(res["auc"] - exact) < 0.01, (res["auc"], exact)
        assert abs(res["label/mean"] - y.mean()) < 1e-5
        assert abs(res["prediction/mean"] - p.mean()) < 1e-5


class TestCadencedEval:
    def test_eval_every_n_steps(self, small_config, tmp_path):
        """Step-cadenced interleaved eval (eval_every_n_steps): fires at
        the step cadence, logs + writes eval/ summaries — the working
        analog of the reference's broken train_and_eval_api mode
        (reference python/train.py:151-170)."""
        tr = _trainer(small_config, tmp_path, "wide_deep",
                      batch_size=8, eval_every_n_steps=2)
        assert tr.eval_every_n_steps == 2
        tr.ensure_initialized(restore=False)
        calls = []
        orig = tr.evaluate

        def spy(path=None, **kw):
            calls.append(tr.global_step)
            return orig(path, **kw)

        tr.evaluate = spy
        tr.train_file(FIXTURE)  # 10 rows / batch 8 -> 2 steps
        assert calls == [2], calls
        # eval summaries written under the eval/ prefix
        from wide_deep_tpu.features.tfrecord import read_records
        sdir = os.path.join(tr.model_dir, "summaries")
        blob = b"".join(
            rec for f in os.listdir(sdir)
            for rec in read_records(os.path.join(sdir, f), verify=True))
        assert b"eval/auc" in blob and b"eval/loss" in blob

    def test_off_by_default(self, small_config, tmp_path):
        tr = _trainer(small_config, tmp_path, "wide_deep")
        assert tr.eval_every_n_steps == 0
