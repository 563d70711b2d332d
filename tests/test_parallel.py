"""SPMD/mesh tests on the virtual 8-device CPU mesh: sharded-table
correctness vs single-device, batch-parallel equivalence, dryrun entry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wide_deep_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def setup(small_config, small_plan, fixture_rows):
    from wide_deep_tpu.features.pipeline import FeatureTransformer
    from wide_deep_tpu.models.joint import build_model
    model = build_model(small_config, plan=small_plan,
                        model_type="wide_deep")
    tr = FeatureTransformer(small_plan)
    batch = tr.transform(fixture_rows[:8], 8)
    params, mstate = model.init(jax.random.PRNGKey(0), batch)
    return model, params, mstate, batch


def test_mesh_construction():
    mesh = mesh_lib.make_mesh(-1, 1)
    assert mesh.devices.size == jax.device_count()
    mesh2 = mesh_lib.make_mesh(4, 2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(3, 3)


def test_param_sharding_rules(setup):
    model, params, _, _ = setup
    mesh = mesh_lib.make_mesh(4, 2)
    shardings = mesh_lib.param_shardings(mesh, params, size_threshold=64)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    sharded = [p for p, s in flat if any(ax for ax in s.spec)]
    # big tables sharded, at least wide w + some embed groups
    names = ["/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                      for k in p) for p, s in flat if any(ax for ax in s.spec)]
    assert any("linear" in n and n.endswith("w") for n in names)
    assert any("embed" in n for n in names)
    # dense kernels replicated
    for p, s in flat:
        keys = [getattr(k, "key", getattr(k, "idx", None)) for k in p]
        if "towers" in keys:
            assert not any(ax for ax in s.spec)


def test_sharded_forward_matches_single_device(setup):
    """Row-sharding tables must not change the math."""
    model, params, mstate, batch = setup
    # single device result
    single, _ = model.apply(params, mstate, batch)
    mesh = mesh_lib.make_mesh(4, 2)
    shardings = mesh_lib.param_shardings(mesh, params, size_threshold=64)
    sp = jax.device_put(params, shardings)
    sm = jax.device_put(mstate, mesh_lib.replicated(mesh))
    sb = {k: jax.device_put(v, mesh_lib.batch_sharding(mesh))
          for k, v in batch.items()}
    sharded, _ = jax.jit(
        lambda p, s, b: model.apply(p, s, b))(sp, sm, sb)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               rtol=2e-4, atol=1e-5)


def test_sharded_train_step_matches_single_device(setup, small_config):
    from wide_deep_tpu.optim import build_joint_optimizer
    from wide_deep_tpu.training.step import make_train_step
    model, params, mstate, batch = setup
    tx = build_joint_optimizer(small_config.model, 100.0,
                               {"linear": True, "dnn": True})
    step = make_train_step(model, tx, donate=False)
    key = jax.random.PRNGKey(5)

    # single-device reference
    o1 = tx.init(params)
    p1, s1, o1, loss1 = step(params, mstate, o1, batch, key, 0)

    # 8-device mesh
    mesh = mesh_lib.make_mesh(4, 2)
    shardings = mesh_lib.param_shardings(mesh, params, size_threshold=64)
    sp = jax.device_put(params, shardings)
    sm = jax.device_put(mstate, mesh_lib.replicated(mesh))
    ostruct = jax.eval_shape(tx.init, sp)
    osh = mesh_lib.opt_state_shardings(mesh, sp, shardings, ostruct)
    so = jax.jit(tx.init, out_shardings=osh)(sp)
    sb = {k: jax.device_put(v, mesh_lib.batch_sharding(mesh))
          for k, v in batch.items()}
    p2, s2, o2, loss2 = step(sp, sm, so, sb, key, 0)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4)
    # updated params identical across the two placements
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-5)


def test_dryrun_multichip_entry():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_opt_state_sharding_structure(setup, small_config):
    from wide_deep_tpu.optim import build_joint_optimizer
    model, params, _, _ = setup
    mesh = mesh_lib.make_mesh(8, 1)
    tx = build_joint_optimizer(small_config.model, 100.0,
                               {"linear": True, "dnn": True})
    shardings = mesh_lib.param_shardings(mesh, params, size_threshold=64)
    struct = jax.eval_shape(tx.init, params)
    osh = mesh_lib.opt_state_shardings(mesh, params, shardings, struct)
    # every opt leaf has a sharding on the full mesh
    for s in jax.tree.leaves(osh):
        assert s.mesh.devices.size == 8


def test_single_device_mesh_avoids_spmd_lowering():
    """Round-4 cold-compile fix: on a 1-device mesh every sharding helper
    must return SingleDeviceSharding — a NamedSharding (even over one
    device) flips jit into the SPMD lowering path, measured 6-25x slower
    to compile on the production step (ARCHITECTURE.md round 4)."""
    from jax.sharding import NamedSharding, SingleDeviceSharding
    mesh1 = mesh_lib.make_mesh(1, 1, jax.devices()[:1])
    assert isinstance(mesh_lib.replicated(mesh1), SingleDeviceSharding)
    assert isinstance(mesh_lib.batch_sharding(mesh1), SingleDeviceSharding)
    assert isinstance(mesh_lib.row_sharded(mesh1), SingleDeviceSharding)
    assert isinstance(
        mesh_lib.batch_key_sharding(mesh1, "emb_ids_d8",
                                    np.zeros((4, 2), np.int32)),
        SingleDeviceSharding)
    import jax.numpy as jnp
    shs = mesh_lib.param_shardings(
        mesh1, {"embed": {"d8": jnp.zeros((1 << 17, 8))}}, size_threshold=64)
    assert isinstance(shs["embed"]["d8"], SingleDeviceSharding)
    # multi-device meshes are unaffected
    mesh8 = mesh_lib.make_mesh(4, 2)
    assert isinstance(mesh_lib.replicated(mesh8), NamedSharding)
    assert isinstance(mesh_lib.row_sharded(mesh8), NamedSharding)
