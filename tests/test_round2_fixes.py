"""Round-2 correctness fixes: multiclass metrics, checkpoint pinning,
export-without-checkpoint, masked BN moments.

Covers the advisor findings (ADVICE.md round 1) and the reference's
exact-checkpoint semantics (/root/reference/python/eval.py:74-78,
pred.py:47-49, export_savedmodel.py:34-35).
"""

import os

import numpy as np
import pytest

from paths import UNIT_FIXTURE as FIXTURE


class TestMulticlassMetrics:
    def test_accuracy_from_argmax(self):
        """Classes >= 2 must be able to count correct (they never could when
        correctness was computed as (p >= 0.5) == label)."""
        import jax.numpy as jnp
        from wide_deep_tpu import metrics as m

        # 4 examples, 3 classes; predictions argmax = [2, 1, 0, 2], labels
        # [2, 1, 1, 0] -> accuracy 0.5
        class_ids = jnp.asarray([2, 1, 0, 2])
        labels = jnp.asarray([2.0, 1.0, 1.0, 0.0])
        probs = jnp.asarray([0.9, 0.8, 0.7, 0.6])  # max-prob, unused
        w = jnp.ones(4)
        acc = m.init_metrics()
        correct = class_ids == labels.astype(jnp.int32)
        acc = m.update_metrics(acc, probs, labels, w, jnp.zeros(4),
                               correct=correct)
        res = m.finalize_metrics(acc, binary=False)
        assert res["accuracy"] == pytest.approx(0.5)
        # threshold-sweep metrics are undefined for K > 2 and must be absent
        assert "auc" not in res and "auc_precision_recall" not in res

    def test_multiclass_eval_step_counts_high_classes(self, small_config,
                                                      tmp_path):
        """End-to-end: an eval step over a 3-class model must credit correct
        class-2 predictions."""
        import jax.numpy as jnp
        from wide_deep_tpu import metrics as m
        from wide_deep_tpu.training.loop import Trainer

        tr = Trainer(small_config, model_type="deep",
                     model_dir=str(tmp_path), n_classes=3,
                     overrides=dict(batch_size=8, train_data=FIXTURE,
                                    eval_data=FIXTURE, test_data=FIXTURE,
                                    keep_train=True))
        tr.ensure_initialized(restore=False)
        batch = tr._zero_batch()
        batch["mask"][:] = 1.0
        batch["weight"][:] = 1.0
        # force every label to class 2; accuracy must equal the fraction the
        # model argmaxes to 2 (and not be structurally pinned to 0)
        batch["label"][:] = 2.0
        batch_dev = tr._to_device(batch)
        acc = m.init_metrics()
        acc = tr._eval_step(tr.params, tr.mstate, batch_dev, acc)
        preds = tr._predict_step(tr.params, tr.mstate, batch_dev)
        expected = float(jnp.mean(
            (preds["class_ids"] == 2).astype(jnp.float32)))
        res = m.finalize_metrics(acc, binary=False)
        assert res["accuracy"] == pytest.approx(expected, abs=1e-6)


class TestCheckpointPinning:
    def _trainer(self, small_config, model_dir, **over):
        from wide_deep_tpu.training.loop import Trainer
        overrides = dict(batch_size=8, train_data=FIXTURE, eval_data=FIXTURE,
                         test_data=FIXTURE, keep_train=True,
                         save_checkpoints_secs=None)
        overrides.update(over)
        return Trainer(small_config, model_type="wide_deep",
                       model_dir=model_dir, overrides=overrides)

    def test_evaluate_restores_named_step(self, small_config, tmp_path):
        tr = self._trainer(small_config, str(tmp_path))
        tr.ensure_initialized(restore=False)
        tr.train_file(FIXTURE)
        tr.save()
        old_step = tr.global_step
        old_metrics = tr.evaluate(FIXTURE)
        for _ in range(3):
            tr.train_file(FIXTURE)
        tr.save()
        new_step = tr.global_step
        assert new_step > old_step
        # pin the OLDER checkpoint: metrics must be the older model's
        pinned = tr.evaluate(
            FIXTURE, checkpoint_path=os.path.join(tr.model_dir, str(old_step)))
        assert pinned["global_step"] == old_step
        assert pinned["auc"] == pytest.approx(old_metrics["auc"], abs=1e-6)
        assert pinned["average_loss"] == pytest.approx(
            old_metrics["average_loss"], abs=1e-6)
        # a bare model_dir still means "latest"
        latest = tr.evaluate(FIXTURE, checkpoint_path=tr.model_dir)
        assert latest["global_step"] == new_step

    def test_missing_checkpoint_raises(self, small_config, tmp_path):
        tr = self._trainer(small_config, str(tmp_path))
        tr.ensure_initialized(restore=False)
        tr.save()
        with pytest.raises(FileNotFoundError):
            tr.evaluate(FIXTURE, checkpoint_path=os.path.join(
                tr.model_dir, "99999"))

    def test_resolve_checkpoint(self):
        from wide_deep_tpu.training.loop import resolve_checkpoint
        d, s = resolve_checkpoint("/m/dir/42")
        assert d == "/m/dir" and s == 42
        d, s = resolve_checkpoint("/m/dir/")
        assert d == "/m/dir" and s is None


class TestExportRequiresCheckpoint:
    def test_export_without_checkpoint_raises(self, small_config, tmp_path):
        """A typo'd model_dir must not silently export random params
        (reference failed on a missing checkpoint)."""
        from wide_deep_tpu.serving.export import export_savedmodel
        with pytest.raises(FileNotFoundError):
            export_savedmodel(small_config, str(tmp_path / "exp"),
                              model_type="wide_deep",
                              model_dir=str(tmp_path / "does_not_exist"))


class TestMaskedBatchNorm:
    def test_bn_stats_ignore_padding(self, small_plan):
        """BN moments on a padded batch must equal the moments of the same
        real rows without padding."""
        import jax
        import jax.numpy as jnp
        from wide_deep_tpu.models.deep import (DeepSpec, ParamStore,
                                               PlanConstants, TowerSpec,
                                               deep_logits, init_deep_params)

        plan = small_plan
        consts = PlanConstants(plan)
        spec = DeepSpec(towers=(TowerSpec((8, 4), "simple"),),
                        batch_norm=True)
        rng = jax.random.PRNGKey(0)

        def rand_batch(B, real):
            ks = jax.random.split(rng, 16)
            spec_b = plan.batch_spec(B, 2)
            batch = {}
            i = 0
            for k, (shape, dt) in spec_b.items():
                if np.issubdtype(dt, np.integer):
                    batch[k] = np.asarray(
                        jax.random.randint(ks[i % 16], shape, 0, 7), dt)
                else:
                    batch[k] = np.asarray(
                        jax.random.uniform(ks[i % 16], shape), dt)
                i += 1
            batch["mask"] = np.zeros(B, np.float32)
            batch["mask"][:real] = 1.0
            return batch

        full = rand_batch(6, 6)
        params, bn0 = init_deep_params(rng, plan, consts, spec, 1, full)

        padded = {k: np.concatenate(
            [v[:4], np.zeros((4,) + v.shape[1:], v.dtype)], axis=0)
            for k, v in full.items()}
        padded["mask"] = np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32)
        unpadded = {k: v[:4] for k, v in full.items()}

        _, st_pad, _ = deep_logits(ParamStore(params), plan, consts, spec,
                                {k: jnp.asarray(v) for k, v in padded.items()},
                                1, True, jax.random.PRNGKey(1), bn0)
        _, st_ref, _ = deep_logits(ParamStore(params), plan, consts, spec,
                                {k: jnp.asarray(v)
                                 for k, v in unpadded.items()},
                                1, True, jax.random.PRNGKey(1), bn0)
        for key in st_ref:
            np.testing.assert_allclose(np.asarray(st_pad[key]["mean"]),
                                       np.asarray(st_ref[key]["mean"]),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(st_pad[key]["var"]),
                                       np.asarray(st_ref[key]["var"]),
                                       rtol=1e-5, atol=1e-6)
