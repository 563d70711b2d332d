"""Model-core tests: forward shapes, connectivity modes, heads, optimizers."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from wide_deep_tpu.features.pipeline import FeatureTransformer
from wide_deep_tpu.models.deep import (DeepSpec, ParamStore, PlanConstants,
                                       TowerSpec, deep_logits,
                                       init_deep_params, parse_connected_mode)
from wide_deep_tpu.models.heads import head_loss, head_predictions
from wide_deep_tpu.models.joint import WideDeep, build_model
from wide_deep_tpu.optim import (build_joint_optimizer, exponential_decay,
                                 ftrl, get_optimizer, proximal_adagrad)


@pytest.fixture(scope="module")
def batch(small_plan, fixture_rows):
    tr = FeatureTransformer(small_plan)
    return {k: jnp.asarray(v)
            for k, v in tr.transform(fixture_rows, 16).items()}


@pytest.fixture(scope="module")
def batch_nofold(small_plan_nofold, fixture_rows):
    tr = FeatureTransformer(small_plan_nofold)
    return {k: jnp.asarray(v)
            for k, v in tr.transform(fixture_rows, 16).items()}


def _spec(mode, **kw):
    return DeepSpec(towers=(TowerSpec((8, 8, 8), parse_connected_mode(mode)),),
                    **kw)


class TestDeepArm:
    @pytest.mark.parametrize("mode", ["simple", "first_dense", "last_dense",
                                      "dense", "resnet"])
    def test_named_modes(self, small_plan, batch, mode):
        spec = _spec(mode)
        consts = PlanConstants(small_plan)
        params, bn = init_deep_params(jax.random.PRNGKey(0), small_plan,
                                      consts, spec, 1, batch)
        logits, _, _ = deep_logits(ParamStore(params), small_plan, consts, spec,
                                batch, 1, False, None, bn)
        assert logits.shape == (16, 1)
        assert np.isfinite(np.asarray(logits)).all()

    def test_arbitrary_connections(self, small_plan, batch):
        # input(0) feeds layers 1 and 3; layer 1 also feeds layer 3
        spec = _spec(["0-1", "0-3", "1-3"])
        consts = PlanConstants(small_plan)
        params, bn = init_deep_params(jax.random.PRNGKey(0), small_plan,
                                      consts, spec, 1, batch)
        logits, _, _ = deep_logits(ParamStore(params), small_plan, consts, spec,
                                batch, 1, False, None, bn)
        assert logits.shape == (16, 1)

    def test_multi_tower(self, small_plan, batch):
        spec = DeepSpec(towers=(
            TowerSpec((8, 4), "simple"),
            TowerSpec((16,), "resnet"),
            TowerSpec((8,), "dense")))
        consts = PlanConstants(small_plan)
        params, bn = init_deep_params(jax.random.PRNGKey(0), small_plan,
                                      consts, spec, 1, batch)
        assert len(params["towers"]) == 3
        logits, _, _ = deep_logits(ParamStore(params), small_plan, consts, spec,
                                batch, 1, False, None, bn)
        assert logits.shape == (16, 1)

    def test_crelu_changes_width(self, small_plan, batch):
        spec = _spec("simple", activation="crelu")
        consts = PlanConstants(small_plan)
        params, _ = init_deep_params(jax.random.PRNGKey(0), small_plan,
                                     consts, spec, 1, batch)
        # crelu doubles layer output width; next kernel must take 16 inputs
        assert params["towers"][0]["hidden"][1]["kernel"].shape[0] == 16

    def test_batch_norm_state_updates(self, small_plan, batch):
        spec = _spec("simple", batch_norm=True)
        consts = PlanConstants(small_plan)
        params, bn = init_deep_params(jax.random.PRNGKey(0), small_plan,
                                      consts, spec, 1, batch)
        assert bn  # moving stats exist
        _, new_bn, _ = deep_logits(ParamStore(params), small_plan, consts, spec,
                                batch, 1, True, jax.random.PRNGKey(1), bn)
        changed = any(
            not np.allclose(np.asarray(new_bn[k]["mean"]),
                            np.asarray(bn[k]["mean"])) for k in bn)
        assert changed
        # eval mode keeps state
        _, eval_bn, _ = deep_logits(ParamStore(params), small_plan, consts, spec,
                                 batch, 1, False, None, bn)
        for k in bn:
            np.testing.assert_array_equal(np.asarray(eval_bn[k]["mean"]),
                                          np.asarray(bn[k]["mean"]))

    def test_dropout_train_only(self, small_plan, batch):
        spec = _spec("simple", dropout=0.5)
        consts = PlanConstants(small_plan)
        params, bn = init_deep_params(jax.random.PRNGKey(0), small_plan,
                                      consts, spec, 1, batch)
        l_eval1, _, _ = deep_logits(ParamStore(params), small_plan, consts, spec,
                                 batch, 1, False, None, bn)
        l_eval2, _, _ = deep_logits(ParamStore(params), small_plan, consts, spec,
                                 batch, 1, False, None, bn)
        np.testing.assert_array_equal(np.asarray(l_eval1), np.asarray(l_eval2))
        l_tr1, _, _ = deep_logits(ParamStore(params), small_plan, consts, spec,
                               batch, 1, True, jax.random.PRNGKey(1), bn)
        l_tr2, _, _ = deep_logits(ParamStore(params), small_plan, consts, spec,
                               batch, 1, True, jax.random.PRNGKey(2), bn)
        assert not np.allclose(np.asarray(l_tr1), np.asarray(l_tr2))


class TestHeads:
    def test_binary_loss_matches_manual(self):
        logits = jnp.array([[0.5], [-1.0], [2.0]])
        labels = jnp.array([1.0, 0.0, 1.0])
        w = jnp.ones(3)
        loss, per_ex = head_loss(logits, labels, w, 2)
        p = 1 / (1 + np.exp(-np.array([0.5, -1.0, 2.0])))
        expect = -(np.array([1, 0, 1]) * np.log(p)
                   + np.array([0, 1, 0]) * np.log(1 - p))
        np.testing.assert_allclose(np.asarray(per_ex), expect, rtol=1e-5)
        np.testing.assert_allclose(float(loss), expect.mean(), rtol=1e-5)

    def test_weighted_loss(self):
        logits = jnp.array([[0.3], [0.3]])
        labels = jnp.array([1.0, 0.0])
        loss_eq, _ = head_loss(logits, labels, jnp.array([1.0, 1.0]), 2)
        loss_w, _ = head_loss(logits, labels, jnp.array([9.0, 1.0]), 2)
        assert not np.isclose(float(loss_eq), float(loss_w))

    def test_mask_excludes_padding(self):
        logits = jnp.array([[0.5], [-1.0], [99.0]])
        labels = jnp.array([1.0, 0.0, 0.0])
        loss_full, _ = head_loss(logits[:2], labels[:2], jnp.ones(2), 2)
        loss_masked, _ = head_loss(logits, labels, jnp.array([1., 1., 0.]), 2)
        np.testing.assert_allclose(float(loss_full), float(loss_masked),
                                   rtol=1e-6)

    def test_multiclass(self):
        logits = jnp.array([[1.0, 2.0, 0.5], [0.1, 0.1, 3.0]])
        labels = jnp.array([1, 2])
        loss, _ = head_loss(logits, labels, jnp.ones(2), 3)
        assert float(loss) > 0
        preds = head_predictions(logits, 3)
        np.testing.assert_array_equal(np.asarray(preds["class_ids"]), [1, 2])

    def test_binary_predictions(self):
        preds = head_predictions(jnp.array([[2.0], [-2.0]]), 2)
        assert preds["probabilities"].shape == (2, 2)
        np.testing.assert_array_equal(np.asarray(preds["class_ids"]), [1, 0])
        np.testing.assert_allclose(
            np.asarray(preds["probabilities"]).sum(axis=1), 1.0, rtol=1e-6)


class TestOptim:
    def test_ftrl_sparsity(self):
        # strong l1 with tiny gradients must keep weights exactly at zero
        tx = ftrl(0.1, l1_regularization_strength=10.0)
        params = {"w": jnp.zeros(4)}
        state = tx.init(params)
        g = {"w": jnp.array([1e-4, -1e-4, 1e-5, 0.0])}
        updates, state = tx.update(g, state, params)
        np.testing.assert_array_equal(np.asarray(updates["w"]), 0.0)

    def test_ftrl_moves_without_l1(self):
        tx = ftrl(0.1)
        params = {"w": jnp.zeros(2)}
        state = tx.init(params)
        updates, _ = tx.update({"w": jnp.array([1.0, -1.0])}, state, params)
        u = np.asarray(updates["w"])
        assert u[0] < 0 < u[1]

    def test_proximal_adagrad(self):
        tx = proximal_adagrad(0.1, l1_regularization_strength=0.0)
        params = {"w": jnp.array([1.0])}
        state = tx.init(params)
        updates, _ = tx.update({"w": jnp.array([1.0])}, state, params)
        assert float(updates["w"][0]) < 0

    def test_exponential_decay(self):
        sched = exponential_decay(0.1, 0.5, 100)
        np.testing.assert_allclose(float(sched(jnp.asarray(0))), 0.1)
        np.testing.assert_allclose(float(sched(jnp.asarray(100))), 0.05)
        flat = exponential_decay(0.1, 1.0, 100)
        np.testing.assert_allclose(float(flat(jnp.asarray(1000))), 0.1)

    def test_registry_names(self):
        for name in ("Adagrad", "Adam", "Ftrl", "RMSProp", "SGD", "Momentum",
                     "ProximalAdagrad"):
            tx = get_optimizer({"name": name, "learning_rate": 0.01})
            state = tx.init({"w": jnp.zeros(3)})
            updates, _ = tx.update({"w": jnp.ones(3)}, state, {"w": jnp.zeros(3)})
            assert np.isfinite(np.asarray(updates["w"])).all()

    def test_per_arm_partition(self, small_config):
        tx = build_joint_optimizer(small_config.model, 100,
                                   {"linear": True, "dnn": True})
        params = {"linear": {"w": jnp.zeros(5)},
                  "dnn": {"k": jnp.ones(5)}}
        state = tx.init(params)
        g = {"linear": {"w": jnp.ones(5)}, "dnn": {"k": jnp.ones(5)}}
        updates, _ = tx.update(g, state, params)
        # both arms updated, by different rules
        assert np.abs(np.asarray(updates["linear"]["w"])).sum() > 0
        assert np.abs(np.asarray(updates["dnn"]["k"])).sum() > 0
        assert not np.allclose(np.asarray(updates["linear"]["w"]),
                               np.asarray(updates["dnn"]["k"]))


class TestJointModel:
    @pytest.mark.parametrize("model_type", ["wide", "deep", "wide_deep"])
    def test_model_types(self, small_config, small_plan, batch,
                         small_plan_nofold, batch_nofold, model_type):
        if model_type == "wide":  # wide-only models need the legacy layout
            small_plan, batch = small_plan_nofold, batch_nofold
        model = build_model(small_config, plan=small_plan,
                            model_type=model_type)
        params, state = model.init(jax.random.PRNGKey(0), dict(batch))
        assert ("linear" in params) == (model_type != "deep")
        assert ("dnn" in params) == (model_type != "wide")
        logits, _ = model.apply(params, state, batch)
        assert logits.shape == (16, 1)
        loss, (new_state, per_ex, preds) = model.loss_fn(
            params, state, batch, training=False)
        assert np.isfinite(float(loss))

    def test_wide_deep_is_sum(self, small_config, small_plan_nofold, batch_nofold):
        # arm decomposition needs the legacy layout: with the wide fold the
        # joint model carries wide weights inside the embedding tables, which
        # a wide-only model cannot hold
        small_plan, batch = small_plan_nofold, batch_nofold
        model = build_model(small_config, plan=small_plan,
                            model_type="wide_deep")
        params, state = model.init(jax.random.PRNGKey(0), dict(batch))
        full, _ = model.apply(params, state, batch)
        wide_only = build_model(small_config, plan=small_plan,
                                model_type="wide")
        deep_only = build_model(small_config, plan=small_plan,
                                model_type="deep")
        lw, _ = wide_only.apply({"linear": params["linear"]}, {}, batch)
        ld, _ = deep_only.apply({"dnn": params["dnn"]}, state, batch)
        np.testing.assert_allclose(np.asarray(full), np.asarray(lw + ld),
                                   rtol=1e-5)
