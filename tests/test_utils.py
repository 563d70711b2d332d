"""Utility tests (util.py parity) + CLI smoke tests."""

import os
import subprocess
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


class TestUtils:
    def test_timer_and_elapse(self, caplog):
        import logging
        import time
        from wide_deep_tpu.utils import elapse_time, timer

        @timer("op done")
        def op():
            return 42

        with caplog.at_level(logging.INFO, "wide_deep_tpu"):
            assert op() == 42
        assert any("op done" in r.message for r in caplog.records)
        t0 = time.time()
        assert elapse_time(t0) >= 0

    def test_column_to_dtype(self, config):
        from wide_deep_tpu.utils import column_to_dtype
        dtypes = column_to_dtype(config)
        assert dtypes["clk"] == "int64"
        assert dtypes["age"] == "float32"
        assert dtypes["idea_type"] == "int64"
        assert dtypes["u"] == "string"
        assert dtypes["request_id"] == "string"  # unused -> string
        assert len(dtypes) == 61

    def test_profile_trace_noop(self):
        from wide_deep_tpu.utils import profile_trace
        with profile_trace(None):
            pass


class TestCliSurfaces:
    """Arg-parsing smoke tests: every CLI must at least print help."""

    @pytest.mark.parametrize("tool", ["train.py", "eval.py", "pred.py",
                                      "export.py", "serve.py", "client.py",
                                      "inspect_checkpoint.py",
                                      "data_process.py"])
    def test_help(self, tool):
        out = subprocess.run(
            [sys.executable, os.path.join(TOOLS, tool), "--help"],
            capture_output=True, text=True, timeout=120,
            env={**os.environ, "PALLAS_AXON_POOL_IPS": "",
                 "JAX_PLATFORMS": "cpu"},
            cwd=os.path.dirname(TOOLS))
        assert out.returncode == 0, out.stderr[-500:]
        assert "usage" in out.stdout.lower()


class TestCompileCachePolicy:
    """wide_deep_tpu/cache.py: the persistent compile cache must NOT be
    enabled under a remote-compile tunnel (a cache HIT deserializes slower
    than compiling there — measured 300-520 s vs 42-58 s, round 4) unless
    the user forces it with an explicit JAX_COMPILATION_CACHE_DIR."""

    def _dir_after(self, monkeypatch, tmp_path, tunnel, explicit):
        import jax

        from wide_deep_tpu.cache import enable_compilation_cache
        before = jax.config.jax_compilation_cache_dir
        monkeypatch.setattr(jax.config, "update",
                            lambda k, v: setattr(self, "_set",
                                                 getattr(self, "_set", [])
                                                 + [(k, v)]))
        self._set = []
        if tunnel:
            monkeypatch.setenv("PALLAS_AXON_REMOTE_COMPILE", "1")
        else:
            monkeypatch.delenv("PALLAS_AXON_REMOTE_COMPILE", raising=False)
        if explicit:
            monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
        else:
            monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == before
        return dict(self._set).get("jax_compilation_cache_dir")

    def test_tunnel_default_off(self, monkeypatch, tmp_path):
        assert self._dir_after(monkeypatch, tmp_path, tunnel=True,
                               explicit=False) is None

    def test_tunnel_explicit_forces_on(self, monkeypatch, tmp_path):
        assert self._dir_after(monkeypatch, tmp_path, tunnel=True,
                               explicit=True) == str(tmp_path)

    def test_local_host_default_on(self, monkeypatch, tmp_path):
        assert self._dir_after(monkeypatch, tmp_path, tunnel=False,
                               explicit=False) == "/tmp/wdt_jax_cache"

    def test_empty_dir_disables(self, monkeypatch, tmp_path):
        monkeypatch.delenv("PALLAS_AXON_REMOTE_COMPILE", raising=False)
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "")
        import jax

        from wide_deep_tpu.cache import enable_compilation_cache
        monkeypatch.setattr(jax.config, "update",
                            lambda k, v: (_ for _ in ()).throw(
                                AssertionError("must not configure")))
        enable_compilation_cache()


class TestBenchProgram:
    def test_make_program_builds(self, monkeypatch):
        """bench.make_program (shared by bench main and
        tools/lower_profile.py) must build the full production program —
        plan, synthetic batch, fused sparse tables, step — without
        touching device memory (eval_shape only)."""
        monkeypatch.setenv("BENCH_BATCH_SIZE", "64")
        import importlib

        import bench
        importlib.reload(bench)  # re-read BENCH_BATCH_SIZE
        try:
            prog = bench.make_program()
            assert prog.batch["label"].shape == (64,)
            assert prog.sparse_tables, "fused sparse tables expected"
            assert prog.p_struct is not None and prog.step is not None
            spec = prog.plan.batch_spec(64)
            assert set(prog.batch) == set(spec)
        finally:
            monkeypatch.delenv("BENCH_BATCH_SIZE")
            importlib.reload(bench)
