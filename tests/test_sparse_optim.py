"""Sparse touched-rows optimizer updates (optim/sparse.py).

The reference applies optimizers to embedding gradients as IndexedSlices
(SparseApplyAdagrad / SparseApplyFtrl / SparseApplyProximalAdagrad — tf
optimizer.minimize over lookup grads, joint.py:224-262): only rows touched by
the batch are read/written.  These tests pin that our sparse path is exactly
the dense transform restricted to touched rows, and that the end-to-end step
with sparse tables trains identically to the dense step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paths import UNIT_FIXTURE as FIXTURE

R, D, N = 64, 4, 12


def _mk(spec, zero_init=False):
    from wide_deep_tpu.optim.sparse import SparseTable
    rng = np.random.default_rng(0)
    param = (np.zeros((R, D), np.float32) if zero_init
             else rng.normal(size=(R, D)).astype(np.float32))
    ids = np.array([3, 7, 7, 11, 3, 20, 63, 0, 5, 9, 9, 9], np.int32)
    g_rows = rng.normal(size=(N, D)).astype(np.float32)
    grad = np.zeros((R, D), np.float32)
    np.add.at(grad, ids, g_rows)  # dense grad = per-row summed (XLA backward)
    table = SparseTable(name="t", path=("t",), ids_key="ids", spec=spec,
                        lr=spec.get("learning_rate", 0.1))
    return table, jnp.asarray(param), jnp.asarray(grad), jnp.asarray(ids)


def _dense_step(spec, param, grad):
    import optax
    from wide_deep_tpu.optim import get_optimizer
    tx = get_optimizer(spec, spec.get("learning_rate", 0.1))
    state = tx.init(param)
    updates, _ = tx.update(grad, state, param)
    return optax.apply_updates(param, updates)


def _sparse_step(table, param, grad, ids):
    from wide_deep_tpu.optim.sparse import (apply_sparse_update,
                                            init_table_state)
    state = init_table_state(table, param)
    new_param, new_state = apply_sparse_update(table, param, grad, ids, state)
    return new_param, new_state


class TestRowFormulas:
    def test_adagrad_matches_dense_everywhere(self):
        spec = {"name": "Adagrad", "learning_rate": 0.1,
                "initial_accumulator_value": 0.1}
        table, param, grad, ids = _mk(spec)
        dense = _dense_step(spec, param, grad)
        sparse, _ = _sparse_step(table, param, grad, ids)
        np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                                   rtol=1e-6, atol=1e-7)

    def test_sgd_matches_dense_everywhere(self):
        spec = {"name": "SGD", "learning_rate": 0.05}
        table, param, grad, ids = _mk(spec)
        dense = _dense_step(spec, param, grad)
        sparse, _ = _sparse_step(table, param, grad, ids)
        np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                                   rtol=1e-6, atol=1e-7)

    def test_ftrl_matches_dense_on_zero_init(self):
        # FTRL derives w from (z, n); with the canonical zero init a
        # zero-grad row is a fixed point, so sparse == dense everywhere
        spec = {"name": "Ftrl", "learning_rate": 0.1,
                "l1_regularization_strength": 0.3,
                "l2_regularization_strength": 0.5,
                "initial_accumulator_value": 0.1}
        table, param, grad, ids = _mk(spec, zero_init=True)
        dense = _dense_step(spec, param, grad)
        sparse, _ = _sparse_step(table, param, grad, ids)
        np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                                   rtol=1e-5, atol=1e-7)

    def test_proximal_adagrad_touched_rows_match_untouched_stay(self):
        # dense proximal shrinks every row each step; the reference's
        # SparseApplyProximalAdagrad (and our sparse path) shrinks only
        # touched rows — untouched rows must be bit-identical to the input
        spec = {"name": "ProximalAdagrad", "learning_rate": 0.1,
                "l1_regularization_strength": 0.1,
                "l2_regularization_strength": 0.1,
                "initial_accumulator_value": 0.1}
        table, param, grad, ids = _mk(spec)
        dense = np.asarray(_dense_step(spec, param, grad))
        sparse = np.asarray(_sparse_step(table, param, grad, ids)[0])
        touched = np.unique(np.asarray(ids))
        untouched = np.setdiff1d(np.arange(R), touched)
        np.testing.assert_allclose(sparse[touched], dense[touched],
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_array_equal(sparse[untouched],
                                      np.asarray(param)[untouched])
        # and the dense sweep did shrink untouched rows (the divergence is
        # real and deliberate)
        assert not np.allclose(dense[untouched],
                               np.asarray(param)[untouched])

    def test_duplicate_ids_deterministic(self):
        spec = {"name": "Adagrad", "learning_rate": 0.1}
        table, param, grad, ids = _mk(spec)
        a, _ = _sparse_step(table, param, grad, ids)
        b, _ = _sparse_step(table, param, grad, ids)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSelection:
    def test_production_plan_selects_d32_only(self, config):
        from wide_deep_tpu.features.plan import FeaturePlan
        from wide_deep_tpu.optim.sparse import plan_sparse_tables
        plan = FeaturePlan(config, sparse_opt=True)
        tables, paths = plan_sparse_tables(plan, config.model, 100.0, 25600)
        assert set(tables) == {"dnn.embed.d32"}
        assert ("dnn", "embed", "d32") in paths
        t = tables["dnn.embed.d32"]
        assert t.fused and t.dim == 32
        # plan_sparse_tables derives from plan.sparse_opt_group: a plan
        # without sparse_opt selects nothing (shape/routing consistency)
        plain = FeaturePlan(config, sparse_opt=False)
        assert plan_sparse_tables(plain, config.model, 100.0, 25600)[0] == {}

    def test_small_plan_selects_nothing(self, small_plan, small_config):
        from wide_deep_tpu.optim.sparse import plan_sparse_tables
        tables, _ = plan_sparse_tables(small_plan, small_config.model,
                                       100.0, 16)
        assert tables == {}


class TestTopologyGate:
    """build_training_plan must enable the fused sparse optimizer ONLY
    where its plans are valid: single device, or a multi-device mesh with
    PER-TABLE-SHARD plans built from the global id stream.  Without the
    gate, a multi-process mesh without the input service concatenates
    per-host compact plans (host-local perm/uids) into garbage, and a
    GSPMD-lookup multi-device mesh hands a row-sharded table to an
    unpartitionable pallas_call (see training/loop.build_training_plan)."""

    def _plan(self, config, n_dev, n_procs=1, svc=False, **conf_overrides):
        from wide_deep_tpu.training.loop import build_training_plan
        train_conf = dict(config.train)
        train_conf["sparse_optimizer"] = True
        train_conf["pack_budget"] = 3
        train_conf.update(conf_overrides)
        plan, _, _ = build_training_plan(config, train_conf, "wide_deep",
                                         n_dev, n_procs=n_procs,
                                         global_batch_input=svc)
        return plan

    def test_single_device_on(self, config):
        plan = self._plan(config, n_dev=1)
        assert plan.sparse_opt and plan.scatter_shards == 1

    def test_scatter_mode_xla_disables(self, config):
        # the fused path runs Pallas kernels (range_scatter_add + rowdma);
        # scatter_mode: xla must turn it off with the scatter kernels
        plan = self._plan(config, n_dev=1, scatter_mode="xla")
        assert not plan.sparse_opt

    def test_multiprocess_without_input_service_off(self, config):
        plan = self._plan(config, n_dev=8, n_procs=2, svc=False)
        assert not plan.sparse_opt
        assert plan.scatter_shards == 1  # no per-host kernel plans either

    def test_multiprocess_with_input_service_sharded(self, config):
        plan = self._plan(config, n_dev=8, n_procs=2, svc=True)
        assert plan.sparse_opt and plan.scatter_shards == 8

    def test_single_process_multidevice_explicit_sharded(self, config):
        # production conf: sharded_lookup auto -> explicit exchange
        plan = self._plan(config, n_dev=8)
        assert plan.sparse_opt and plan.scatter_shards == 8

    def test_gspmd_lookup_multidevice_off(self, small_config):
        # the small test conf pins sharded_lookup: gspmd (testing.py):
        # no per-shard plans exist there, so the fused path must not run
        assert small_config.distribution.get("sharded_lookup") == "gspmd"
        plan = self._plan(small_config, n_dev=8)
        assert not plan.sparse_opt and plan.scatter_shards == 1


class TestCompactPath:
    """Fused touched-rows path (apply_compact_update): per-entry compact
    cotangents + dedup plan must reproduce the dense-grad sparse path (and
    therefore the dense optax transform) exactly."""

    def test_compact_plan_invariants(self):
        from wide_deep_tpu.ops.scatter import make_compact_plan
        rng = np.random.default_rng(11)
        rows, n = 64, 40
        ids = rng.integers(0, rows, n).astype(np.int32)
        cp = make_compact_plan(ids, rows)
        uniq = np.unique(ids)
        u = uniq.shape[0]
        np.testing.assert_array_equal(cp["uids"][:u], uniq)
        assert (cp["uids"][u:] >= rows).all()
        assert (np.diff(cp["uids"].astype(np.int64)) > 0).all()  # unique+sorted
        # compact stream maps each sorted entry to its unique rank
        np.testing.assert_array_equal(
            cp["uids"][cp["ids"]], np.sort(ids))
        np.testing.assert_array_equal(ids[cp["perm"]], np.sort(ids))
        assert int(cp["tiles"][2].sum()) == n

    @pytest.mark.parametrize("name", ["Adagrad", "Ftrl", "ProximalAdagrad",
                                      "SGD"])
    def test_compact_update_matches_sparse(self, name):
        from wide_deep_tpu.ops.scatter import make_compact_plan
        from wide_deep_tpu.optim.sparse import (apply_compact_update,
                                                apply_sparse_update,
                                                init_table_state)
        spec = {"name": name, "learning_rate": 0.1,
                "initial_accumulator_value": 0.1,
                "l1_regularization_strength": 0.1,
                "l2_regularization_strength": 0.2}
        table, param, _, ids = _mk(spec)
        rng = np.random.default_rng(3)
        g_rows = rng.normal(size=(N, D)).astype(np.float32)  # per-entry
        dense_grad = np.zeros((R, D), np.float32)
        np.add.at(dense_grad, np.asarray(ids), g_rows)
        state = init_table_state(table, param)
        p_sparse, s_sparse = apply_sparse_update(
            table, param, jnp.asarray(dense_grad), ids, state)
        cp = {k: jnp.asarray(v)
              for k, v in make_compact_plan(np.asarray(ids), R).items()}
        p_compact, s_compact = apply_compact_update(
            table, param, jnp.asarray(g_rows), cp, state, interpret=True)
        np.testing.assert_allclose(np.asarray(p_compact),
                                   np.asarray(p_sparse), rtol=1e-5,
                                   atol=1e-6)
        for k in s_sparse:
            np.testing.assert_allclose(
                np.asarray(s_compact[k]), np.asarray(s_sparse[k]),
                rtol=1e-5, atol=1e-6, err_msg=k)

    def test_step_compact_matches_dense(self, small_config,
                                        small_plan_nofold, fixture_rows,
                                        monkeypatch):
        """End-to-end: training with compact plans + sinks must match the
        all-dense step's losses and tables."""
        from wide_deep_tpu.features.pipeline import FeatureTransformer
        from wide_deep_tpu.features.plan import FeaturePlan
        from wide_deep_tpu.models.joint import build_model
        from wide_deep_tpu.optim import build_joint_optimizer
        import wide_deep_tpu.optim.sparse as sparse_lib
        from wide_deep_tpu.training.step import (init_opt_state,
                                                 make_train_step)

        monkeypatch.setattr(sparse_lib, "SPARSE_MIN_ROWS", 1)
        plan = FeaturePlan(small_config, fold=False, sparse_opt=True)
        model = build_model(small_config, plan=plan, model_type="wide_deep")
        tr = FeatureTransformer(plan)
        batch = {k: jnp.asarray(v)
                 for k, v in tr.transform(fixture_rows, 16).items()}
        sopt_keys = [k for k in batch if k.startswith("sopt_uids_")]
        assert sopt_keys, "no compact plans emitted"
        params0, mstate0 = model.init(jax.random.PRNGKey(0), dict(batch))
        sparse_tables, paths = sparse_lib.plan_sparse_tables(
            plan, small_config.model, 100.0, 16)
        assert sparse_tables, "no tables selected"
        assert all(t.fused for t in sparse_tables.values())
        # fused tables carry their optimizer slots inside the param matrix;
        # both branches share the same init (the dense branch's zero-grad
        # slot columns are Adagrad fixed points, so it never moves them)
        params0 = sparse_lib.init_fused_params(params0, sparse_tables)

        arms = {"linear": True, "dnn": True}
        results = {}
        for tag, (sp, sp_paths) in {
                "dense": ({}, frozenset()),
                "compact": (sparse_tables, paths)}.items():
            tx = build_joint_optimizer(small_config.model, 100.0, arms,
                                       sparse_paths=sp_paths)
            step = make_train_step(model, tx, donate=False, sparse_tables=sp)
            params = jax.tree.map(jnp.copy, params0)
            mstate = jax.tree.map(jnp.copy, mstate0)
            opt_state = init_opt_state(tx, params, sp)
            losses = []
            for i in range(3):
                params, mstate, opt_state, loss = step(
                    params, mstate, opt_state, batch,
                    jax.random.PRNGKey(7), i)
                losses.append(float(loss))
            results[tag] = (params, losses)
        np.testing.assert_allclose(results["dense"][1],
                                   results["compact"][1], rtol=1e-5)
        for g in plan.groups:
            d_tab = results["dense"][0]["dnn"]["embed"][f"d{g.dim}"]
            c_tab = results["compact"][0]["dnn"]["embed"][f"d{g.dim}"]
            # compare the embedding block only: the compact branch evolves
            # its in-param slot columns while the dense branch keeps its
            # accumulators in the optax state
            np.testing.assert_allclose(np.asarray(c_tab)[:, :g.dim],
                                       np.asarray(d_tab)[:, :g.dim],
                                       rtol=2e-3, atol=1e-5)


class TestDeferredFused:
    def test_deferred_losses_match_immediate(self, small_config,
                                             small_plan_nofold,
                                             fixture_rows, monkeypatch):
        """defer_sparse pipelines the fused update one step: step i's
        forward sees the table updated through step i-1 — exactly what
        the immediate path's forward sees — so the LOSS trajectories must
        agree to float noise; only the between-step param view lags (the
        pending, flushed before eval/checkpoint)."""
        from wide_deep_tpu.features.pipeline import FeatureTransformer
        from wide_deep_tpu.features.plan import FeaturePlan
        from wide_deep_tpu.models.joint import build_model
        from wide_deep_tpu.optim import build_joint_optimizer
        import wide_deep_tpu.optim.sparse as sparse_lib
        from wide_deep_tpu.training.step import (init_opt_state,
                                                 make_train_step)

        monkeypatch.setattr(sparse_lib, "SPARSE_MIN_ROWS", 1)
        plan = FeaturePlan(small_config, fold=False, sparse_opt=True)
        model = build_model(small_config, plan=plan, model_type="wide_deep")
        batch = {k: jnp.asarray(v) for k, v in FeatureTransformer(
            plan).transform(fixture_rows, 16).items()}
        params0, mstate0 = model.init(jax.random.PRNGKey(0), dict(batch))
        sparse_tables, paths = sparse_lib.plan_sparse_tables(
            plan, small_config.model, 100.0, 16)
        assert sparse_tables
        params0 = sparse_lib.init_fused_params(params0, sparse_tables)
        tx = build_joint_optimizer(small_config.model, 100.0,
                                   {"linear": True, "dnn": True},
                                   sparse_paths=paths)

        def run(defer):
            step = make_train_step(model, tx, donate=False,
                                   sparse_tables=sparse_tables,
                                   defer_sparse=defer)
            params = jax.tree.map(jnp.copy, params0)
            mstate = jax.tree.map(jnp.copy, mstate0)
            opt_state = init_opt_state(tx, params, sparse_tables)
            if defer:
                opt_state["sparse_pending"] = {
                    name: {"rg": jnp.zeros(
                               (np.asarray(batch[t.ids_key]).size, t.dim),
                               t.sink_dtype),
                           **{k: batch[f"sopt_{k}_{t.path[-1]}"]
                              for k in ("uids", "ids", "perm", "tiles")}}
                    for name, t in sparse_tables.items()}
                # the seeded zero-grad apply is a weight no-op but ticks
                # the lr-schedule count; start at -1 so the apply of step
                # k's grads always runs at count k, matching immediate
                for name in sparse_tables:
                    opt_state["sparse"][name]["count"] = jnp.asarray(
                        -1, jnp.int32)
            losses = []
            for i in range(4):
                params, mstate, opt_state, loss = step(
                    params, mstate, opt_state, batch,
                    jax.random.PRNGKey(7), i)
                losses.append(float(loss))
            return losses

        immediate = run(False)
        deferred = run(True)
        np.testing.assert_allclose(immediate, deferred, rtol=5e-4)

    def test_flush_catches_params_up(self, small_config, small_plan_nofold,
                                     fixture_rows, monkeypatch):
        """After make_flush_step the deferred path's fused table matches
        the immediate path's after the same number of steps (the pending
        lag is fully applied), and a post-flush step stays stable (the
        zeroed pending re-applies as a weight no-op)."""
        from wide_deep_tpu.features.pipeline import FeatureTransformer
        from wide_deep_tpu.features.plan import FeaturePlan
        from wide_deep_tpu.models.joint import build_model
        from wide_deep_tpu.optim import build_joint_optimizer
        import wide_deep_tpu.optim.sparse as sparse_lib
        from wide_deep_tpu.training.step import (init_opt_state,
                                                 make_flush_step,
                                                 make_train_step)

        monkeypatch.setattr(sparse_lib, "SPARSE_MIN_ROWS", 1)
        plan = FeaturePlan(small_config, fold=False, sparse_opt=True)
        model = build_model(small_config, plan=plan, model_type="wide_deep")
        batch = {k: jnp.asarray(v) for k, v in FeatureTransformer(
            plan).transform(fixture_rows, 16).items()}
        params0, mstate0 = model.init(jax.random.PRNGKey(0), dict(batch))
        sparse_tables, paths = sparse_lib.plan_sparse_tables(
            plan, small_config.model, 100.0, 16)
        params0 = sparse_lib.init_fused_params(params0, sparse_tables)
        tx = build_joint_optimizer(small_config.model, 100.0,
                                   {"linear": True, "dnn": True},
                                   sparse_paths=paths)
        dims = [t.path[-1] for t in sparse_tables.values()]

        def table(params, dk):
            return np.asarray(params["dnn"]["embed"][dk])

        # immediate reference: 3 steps
        step_i = make_train_step(model, tx, donate=False,
                                 sparse_tables=sparse_tables)
        p = jax.tree.map(jnp.copy, params0)
        ms = jax.tree.map(jnp.copy, mstate0)
        st = init_opt_state(tx, p, sparse_tables)
        for i in range(3):
            p, ms, st, _ = step_i(p, ms, st, batch, jax.random.PRNGKey(7), i)
        ref_tables = {dk: table(p, dk) for dk in dims}

        # deferred 3 steps -> pending holds step 2's update -> flush
        step_d = make_train_step(model, tx, donate=False,
                                 sparse_tables=sparse_tables,
                                 defer_sparse=True)
        p = jax.tree.map(jnp.copy, params0)
        ms = jax.tree.map(jnp.copy, mstate0)
        st = init_opt_state(tx, p, sparse_tables)
        st["sparse_pending"] = {
            name: {"rg": jnp.zeros(
                       (np.asarray(batch[t.ids_key]).size, t.dim),
                       t.sink_dtype),
                   **{k: batch[f"sopt_{k}_{t.path[-1]}"]
                      for k in ("uids", "ids", "perm", "tiles")}}
            for name, t in sparse_tables.items()}
        for name in sparse_tables:
            st["sparse"][name]["count"] = jnp.asarray(-1, jnp.int32)
        for i in range(3):
            p, ms, st, _ = step_d(p, ms, st, batch, jax.random.PRNGKey(7), i)
        # before flush the last update is still pending: tables differ
        assert any(not np.allclose(table(p, dk), ref_tables[dk],
                                   atol=1e-7) for dk in dims)
        flush = make_flush_step(sparse_tables)
        p2, st2 = flush(jax.tree.map(jnp.copy, p),
                        jax.tree.map(jnp.copy, st))
        for dk in dims:
            np.testing.assert_allclose(table(p2, dk), ref_tables[dk],
                                       rtol=2e-3, atol=1e-5, err_msg=dk)
        # zeroed pending: a second flush is a weight no-op
        p3, _ = flush(jax.tree.map(jnp.copy, p2),
                      jax.tree.map(jnp.copy, st2))
        for dk in dims:
            np.testing.assert_array_equal(table(p3, dk), table(p2, dk))


class TestShardedFused:
    def test_sharded_fused_matches_single_device(self, small_config,
                                                 fixture_rows, monkeypatch):
        """Multi-device fused optimizer (per-shard compact plans +
        apply_fused_sharded_update inside shard_map) must reproduce the
        single-device fused path exactly: losses AND the full fused tables
        (param + in-param slot blocks)."""
        from wide_deep_tpu.features.pipeline import FeatureTransformer
        from wide_deep_tpu.features.plan import FeaturePlan
        from wide_deep_tpu.models.joint import build_model
        from wide_deep_tpu.optim import build_joint_optimizer
        import wide_deep_tpu.optim.sparse as sparse_lib
        from wide_deep_tpu.parallel import mesh as mesh_lib
        from wide_deep_tpu.training.step import (init_opt_state,
                                                 make_train_step)

        monkeypatch.setattr(sparse_lib, "SPARSE_MIN_ROWS", 1)
        mesh8 = mesh_lib.make_mesh(4, 2, jax.devices()[:8])
        results = {}
        for tag, (shards, mesh) in {"single": (1, None),
                                    "sharded": (8, mesh8)}.items():
            plan = FeaturePlan(small_config, fold=False, sparse_opt=True,
                               scatter_shards=shards, shard_threshold=64)
            model = build_model(small_config, plan=plan,
                                model_type="wide_deep")
            batch = {k: jnp.asarray(v) for k, v in FeatureTransformer(
                plan).transform(fixture_rows, 16).items()}
            if tag == "sharded":
                assert any(k.startswith("sopt_ok_") for k in batch), \
                    "no sharded compact plans emitted"
            sparse_tables, paths = sparse_lib.plan_sparse_tables(
                plan, small_config.model, 100.0, 16)
            assert sparse_tables and all(
                t.fused for t in sparse_tables.values())
            params, mstate = model.init(jax.random.PRNGKey(0), dict(batch))
            params = sparse_lib.init_fused_params(params, sparse_tables)
            tx = build_joint_optimizer(small_config.model, 100.0,
                                       {"linear": True, "dnn": True},
                                       sparse_paths=paths)
            step = make_train_step(model, tx, donate=False,
                                   sparse_tables=sparse_tables, mesh=mesh)
            opt_state = init_opt_state(tx, params, sparse_tables)
            losses = []
            for i in range(3):
                params, mstate, opt_state, loss = step(
                    params, mstate, opt_state, batch,
                    jax.random.PRNGKey(7), i)
                losses.append(float(loss))
            results[tag] = (params, losses)
        np.testing.assert_allclose(results["single"][1],
                                   results["sharded"][1], rtol=1e-5)
        for dim_key, tab in results["single"][0]["dnn"]["embed"].items():
            s_tab = results["sharded"][0]["dnn"]["embed"][dim_key]
            np.testing.assert_allclose(np.asarray(s_tab), np.asarray(tab),
                                       rtol=2e-4, atol=1e-6,
                                       err_msg=dim_key)


class TestShardedLiveCap:
    """Per-shard live-cap in the sharded fused optimizer (plan ABI v12):
    both the compacted branch (all shards under shard_live_cap) and the
    full-width branch (a shard skewed past it but under the 2x cap) must
    reproduce the single-device fused update exactly."""

    def _run_pair(self, ids, rows, d, seed):
        import functools

        from jax.sharding import NamedSharding, PartitionSpec as P
        import wide_deep_tpu.optim.sparse as sparse_lib
        from wide_deep_tpu.ops.rowdma import FUSED_WIDTH
        from wide_deep_tpu.ops.scatter import (make_compact_plan,
                                               make_sharded_compact_plan)
        from wide_deep_tpu.parallel import mesh as mesh_lib

        mesh8 = mesh_lib.make_mesh(4, 2, jax.devices()[:8])
        rng = np.random.default_rng(seed)
        fused = rng.normal(size=(rows, FUSED_WIDTH)).astype(np.float32)
        fused[:, d:2 * d] = 0.1  # Adagrad accum init
        rg = rng.normal(size=(ids.size, d)).astype(np.float32)
        table = sparse_lib.SparseTable(
            name="t", path=("t",), ids_key="ids",
            spec={"name": "Adagrad", "initial_accumulator_value": 0.1},
            lr=0.1, dim=d, fused=True)
        state = {"count": jnp.zeros([], jnp.int32)}

        single, _ = sparse_lib.apply_fused_update(
            table, jnp.asarray(fused), jnp.asarray(rg),
            {k: jnp.asarray(v) for k, v in
             make_compact_plan(ids.reshape(-1), rows).items()},
            dict(state), interpret=True)

        sp = make_sharded_compact_plan(ids.reshape(-1), rows, 8)
        sall = NamedSharding(mesh8, P(("data", "model")))
        plan_dev = {k: jax.device_put(jnp.asarray(v), sall)
                    for k, v in sp.items()}
        fused_dev = jax.device_put(jnp.asarray(fused), sall)
        rg_dev = jax.device_put(jnp.asarray(rg),
                                NamedSharding(mesh8, P("data")))
        ids_dev = jax.device_put(jnp.asarray(ids),
                                 NamedSharding(mesh8, P("data")))

        @functools.partial(jax.jit, static_argnums=())
        def run(f, g, i, plan):
            out, _ = sparse_lib.apply_fused_sharded_update(
                table, f, g, i, plan, dict(state), mesh8, interpret=True)
            return out

        sharded = run(fused_dev, rg_dev, ids_dev, plan_dev)
        return np.asarray(single), np.asarray(sharded), sp

    def test_compact_branch_matches_single(self):
        from wide_deep_tpu.ops.scatter import shard_cap, shard_live_cap
        rows, d, B, P = 512, 8, 256, 16
        n = B * P
        small, cap = shard_live_cap(n, 8), shard_cap(n, 8)
        assert small < cap
        rng = np.random.default_rng(41)
        ids = rng.integers(0, rows, (B, P)).astype(np.int32)
        single, sharded, sp = self._run_pair(ids, rows, d, seed=42)
        assert sp["ok"].all() and (sp["live"] <= small).all(), (
            sp["live"], small)
        np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=1e-6)

    def test_live_overflow_takes_full_branch(self):
        from wide_deep_tpu.ops.scatter import shard_cap, shard_live_cap
        rows, d, B, P = 512, 8, 256, 16
        n = B * P
        small, cap = shard_live_cap(n, 8), shard_cap(n, 8)
        shard_rows = rows // 8
        rng = np.random.default_rng(43)
        hot = (small + cap) // 2
        flat = rng.integers(shard_rows, rows, n).astype(np.int32)
        flat[:hot] = rng.integers(0, shard_rows, hot)
        ids = rng.permutation(flat).reshape(B, P).astype(np.int32)
        single, sharded, sp = self._run_pair(ids, rows, d, seed=44)
        assert sp["ok"].all()
        assert small < sp["live"][0] <= cap, (sp["live"], small, cap)
        np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=1e-6)


class TestEndToEnd:
    def test_step_with_sparse_table_matches_dense(self, small_config,
                                                  small_plan, fixture_rows):
        """Force one small table through the sparse path; training must be
        numerically identical to the all-dense step."""
        from wide_deep_tpu.features.pipeline import FeatureTransformer
        from wide_deep_tpu.models.joint import build_model
        from wide_deep_tpu.optim import build_joint_optimizer
        from wide_deep_tpu.optim.sparse import SparseTable
        from wide_deep_tpu.training.step import (init_opt_state,
                                                 make_train_step)

        model = build_model(small_config, plan=small_plan,
                            model_type="wide_deep")
        tr = FeatureTransformer(small_plan)
        batch = {k: jnp.asarray(v)
                 for k, v in tr.transform(fixture_rows, 16).items()}
        params0, mstate0 = model.init(jax.random.PRNGKey(0), dict(batch))
        dim = small_plan.groups[-1].dim
        spec = small_config.model["dnn_optimizer"]
        lr0 = spec.get("learning_rate",
                       small_config.model["dnn_initial_learning_rate"])
        sparse_tables = {
            f"dnn.embed.d{dim}": SparseTable(
                name=f"dnn.embed.d{dim}",
                path=("dnn", "embed", f"d{dim}"),
                ids_key=f"emb_ids_d{dim}", spec=spec, lr=lr0)}
        paths = frozenset(t.path for t in sparse_tables.values())

        arms = {"linear": True, "dnn": True}
        results = {}
        for tag, (sp, sp_paths) in {
                "dense": ({}, frozenset()),
                "sparse": (sparse_tables, paths)}.items():
            tx = build_joint_optimizer(small_config.model, 100.0, arms,
                                       sparse_paths=sp_paths)
            step = make_train_step(model, tx, donate=False,
                                   sparse_tables=sp)
            params = jax.tree.map(jnp.copy, params0)
            mstate = jax.tree.map(jnp.copy, mstate0)
            opt_state = init_opt_state(tx, params, sp)
            losses = []
            for i in range(3):
                params, mstate, opt_state, loss = step(
                    params, mstate, opt_state, batch,
                    jax.random.PRNGKey(7), i)
                losses.append(float(loss))
            results[tag] = (params, losses)
        # float-order noise only: step-0 tables agree to 1.5e-8, but the
        # gather->scatter summation order compounds through Adagrad rsqrt
        # to ~1e-5 table drift by step 1 and ~2e-4 relative loss drift by
        # step 2 (measured on the vendored fixture, whose multivalue id
        # collisions reorder more segment sums than the old one)
        np.testing.assert_allclose(results["dense"][1], results["sparse"][1],
                                   rtol=5e-4)
        d_tab = results["dense"][0]["dnn"]["embed"][f"d{dim}"]
        s_tab = results["sparse"][0]["dnn"]["embed"][f"d{dim}"]
        # sparse computes rows via gather->f32 math->scatter while dense is
        # elementwise over the table; identical formulas, float noise only
        np.testing.assert_allclose(np.asarray(s_tab), np.asarray(d_tab),
                                   rtol=2e-3, atol=1e-5)
