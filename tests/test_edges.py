"""Edge coverage: checkpoint cadence/retention, LR-decay integration,
native-loader thread determinism, launch-script syntax."""

import os
import subprocess

import numpy as np
import pytest
from paths import TRAIN1

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestCheckpointCadence:
    def test_step_cadence(self, tmp_path):
        from wide_deep_tpu.training.checkpoint import CheckpointManager
        mgr = CheckpointManager(str(tmp_path), {
            "save_checkpoints_steps": 10, "save_checkpoints_secs": None,
            "keep_checkpoint_max": 5})
        assert mgr.should_save(10)
        assert not mgr.should_save(11)
        assert mgr.should_save(20)
        mgr.close()

    def test_time_cadence(self, tmp_path):
        import time
        from wide_deep_tpu.training.checkpoint import CheckpointManager
        mgr = CheckpointManager(str(tmp_path), {
            "save_checkpoints_steps": None, "save_checkpoints_secs": 3600,
            "keep_checkpoint_max": 5})
        assert not mgr.should_save(5)  # just created; interval not elapsed
        mgr._last_save_time = time.time() - 7200
        assert mgr.should_save(5)
        mgr.close()

    def test_retention(self, tmp_path):
        import jax.numpy as jnp
        from wide_deep_tpu.training.checkpoint import CheckpointManager
        mgr = CheckpointManager(str(tmp_path), {
            "save_checkpoints_steps": 1, "save_checkpoints_secs": None,
            "keep_checkpoint_max": 2, "keep_checkpoint_every_n_hours": 10000})
        for step in range(1, 5):
            mgr.save(step, {"w": jnp.ones(3) * step}, force=True)
        steps = sorted(int(d) for d in os.listdir(tmp_path) if d.isdigit())
        assert steps == [3, 4]  # only the 2 most recent kept
        mgr.close()

    def test_forced_save_survives_crash(self, tmp_path):
        """A forced save must be durable on return: simulate a crash by
        abandoning the manager (no wait/close) and prove a fresh manager
        restores the newest step with the right values."""
        import jax.numpy as jnp
        from wide_deep_tpu.training.checkpoint import CheckpointManager
        rc = {"save_checkpoints_steps": 1, "save_checkpoints_secs": None,
              "keep_checkpoint_max": 2, "keep_checkpoint_every_n_hours": 10000}
        mgr = CheckpointManager(str(tmp_path), rc)
        for step in (1, 2, 3):
            mgr.save(step, {"w": jnp.ones(3) * step}, force=True)
        # crash: no mgr.wait(), no mgr.close() — drop it on the floor
        del mgr
        fresh = CheckpointManager(str(tmp_path), rc)
        assert fresh.latest_step() == 3
        restored = fresh.restore({"w": jnp.zeros(3)})
        np.testing.assert_allclose(np.asarray(restored["w"]), 3.0)
        fresh.close()


class TestDecayIntegration:
    def test_adagrad_lr_decays_across_updates(self):
        """The schedule must be driven by the live update count."""
        import jax.numpy as jnp
        from wide_deep_tpu.optim import exponential_decay, get_optimizer
        sched = exponential_decay(0.1, 0.5, 1.0)  # halves every update
        tx = get_optimizer({"name": "SGD", "learning_rate": 0.1}, sched)
        params = {"w": jnp.zeros(1)}
        state = tx.init(params)
        g = {"w": jnp.ones(1)}
        u1, state = tx.update(g, state, params)
        u2, state = tx.update(g, state, params)
        ratio = float(u2["w"][0] / u1["w"][0])
        np.testing.assert_allclose(ratio, 0.5, rtol=1e-5)

    def test_ftrl_lr_decays(self):
        import jax.numpy as jnp
        from wide_deep_tpu.optim import exponential_decay, ftrl
        sched = exponential_decay(0.1, 0.5, 1.0)
        tx = ftrl(sched)
        params = {"w": jnp.zeros(1)}
        state = tx.init(params)
        assert int(state.count) == 0
        _, state = tx.update({"w": jnp.ones(1)}, state, params)
        assert int(state.count) == 1  # count advances -> schedule advances


class TestNativeDeterminism:
    def test_thread_count_invariant(self, plan):
        from wide_deep_tpu.features.native import NativeTransformer
        if not NativeTransformer.available():
            pytest.skip("native lib not built")
        with open(TRAIN1, "rb") as f:
            text = f.read()
        b1 = NativeTransformer(plan, n_threads=1).transform_text(
            text, 2000, 2048)
        b4 = NativeTransformer(plan, n_threads=4).transform_text(
            text, 2000, 2048)
        for k in b1:
            np.testing.assert_array_equal(b1[k], b4[k], err_msg=k)


class TestScripts:
    @pytest.mark.parametrize("script", [
        "train.sh", "test.sh", "run_serving.sh", "run_distributed.sh",
        "stop_distributed.sh", "run_data_process.sh", "load_raw_data.sh",
        "load_process_data.sh"])
    def test_bash_syntax(self, script):
        out = subprocess.run(
            ["bash", "-n", os.path.join(REPO, "scripts", script)],
            capture_output=True, text=True)
        assert out.returncode == 0, out.stderr
