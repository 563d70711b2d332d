"""Deliberate sharded-embedding exchange (parallel/exchange.py).

Pins that the explicit all-gather(ids) -> masked local gather -> psum /
psum_scatter schedule is exactly ``jnp.take(table, ids)`` — values and
gradients — on a real 8-device mesh, and that the full training step under
the explicit path matches the GSPMD path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

FIXTURE = "/root/reference/data/test/test2"


@pytest.fixture(scope="module")
def mesh8():
    from wide_deep_tpu.parallel import mesh as mesh_lib
    return mesh_lib.make_mesh(4, 2, jax.devices()[:8])


class TestExplicitGather:
    @pytest.mark.parametrize("rows,D,B,Pw", [(256, 8, 16, 5), (512, 4, 8, 1)])
    def test_matches_take(self, mesh8, rows, D, B, Pw):
        from wide_deep_tpu.parallel.exchange import explicit_sharded_gather
        rng = np.random.default_rng(0)
        table = rng.normal(size=(rows, D)).astype(np.float32)
        ids = rng.integers(0, rows, (B, Pw)).astype(np.int32)
        tbl = jax.device_put(
            jnp.asarray(table), NamedSharding(mesh8, P(("data", "model"))))
        ids_d = jax.device_put(jnp.asarray(ids),
                               NamedSharding(mesh8, P("data")))
        got = jax.jit(
            lambda t, i: explicit_sharded_gather(t, i, mesh8))(tbl, ids_d)
        np.testing.assert_allclose(np.asarray(got), table[ids], rtol=1e-6)

    def test_gradients_match_take(self, mesh8):
        from wide_deep_tpu.parallel.exchange import explicit_sharded_gather
        rows, D, B, Pw = 256, 8, 16, 5
        rng = np.random.default_rng(1)
        table = rng.normal(size=(rows, D)).astype(np.float32)
        # include duplicate ids across and within rows (grad accumulation)
        ids = rng.integers(0, 32, (B, Pw)).astype(np.int32)
        cot = rng.normal(size=(B, Pw, D)).astype(np.float32)

        def loss_explicit(t):
            out = explicit_sharded_gather(t, jnp.asarray(ids), mesh8)
            return jnp.vdot(out, jnp.asarray(cot))

        def loss_take(t):
            return jnp.vdot(jnp.take(t, jnp.asarray(ids), axis=0),
                            jnp.asarray(cot))

        tbl = jax.device_put(
            jnp.asarray(table), NamedSharding(mesh8, P(("data", "model"))))
        g_explicit = jax.jit(jax.grad(loss_explicit))(tbl)
        g_take = jax.grad(loss_take)(jnp.asarray(table))
        np.testing.assert_allclose(np.asarray(g_explicit),
                                   np.asarray(g_take), rtol=1e-5, atol=1e-6)

    def test_bf16_table(self, mesh8):
        from wide_deep_tpu.parallel.exchange import explicit_sharded_gather
        rng = np.random.default_rng(2)
        table = rng.normal(size=(256, 8)).astype(jnp.bfloat16)
        ids = rng.integers(0, 256, (16, 3)).astype(np.int32)
        tbl = jax.device_put(
            jnp.asarray(table), NamedSharding(mesh8, P(("data", "model"))))
        got = jax.jit(
            lambda t, i: explicit_sharded_gather(t, i, mesh8))(
                tbl, jnp.asarray(ids))
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(table, np.float32)[ids])


class TestExplicitTraining:
    def test_step_matches_gspmd_path(self, small_config, tmp_path, mesh8,
                                     fixture_rows):
        """Full train step: explicit exchange vs GSPMD must agree on loss
        trajectory and final logits."""
        import shutil

        from wide_deep_tpu.config import Config
        from wide_deep_tpu.training.loop import Trainer

        conf2 = tmp_path / "conf_explicit"
        shutil.copytree(small_config.conf_dir, conf2)
        with open(conf2 / "train.yaml", "a") as f:
            f.write("\ndistribution:\n  sharded_lookup: explicit\n"
                    "  mesh: {data: 4, model: 2}\n")

        losses = {}
        for tag, cfg in (("gspmd", small_config),
                         ("explicit", Config(str(conf2)))):
            tr = Trainer(cfg, model_type="wide_deep",
                         model_dir=str(tmp_path / tag), mesh=mesh8,
                         overrides=dict(train_data=FIXTURE, eval_data=FIXTURE,
                                        test_data=FIXTURE, keep_train=True,
                                        batch_size=16))
            if tag == "explicit":
                assert getattr(tr.model, "_lookup_mesh", None) is mesh8
                # small test tables must still qualify for the exchange
                tr.model._lookup_threshold = 64
            tr.ensure_initialized(restore=False)
            traj = [tr.train_file(FIXTURE) for _ in range(3)]
            traj.append(tr.evaluate(FIXTURE)["loss"])
            losses[tag] = traj
        np.testing.assert_allclose(losses["explicit"], losses["gspmd"],
                                   rtol=5e-4)
