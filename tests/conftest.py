"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Set before any jax import so sharding/collective tests exercise real SPMD
partitioning without TPU hardware (SURVEY.md §4: the reference had no
multi-worker test harness at all; we test the mesh path on every run).
"""

import os
import sys

# The interpreter may have pre-registered a TPU PJRT plugin via sitecustomize
# before this file runs, in which case env overrides are too late (the 8-CPU
# XLA flag is parsed at plugin registration).  pytest_configure below re-execs
# pytest exactly once with a clean CPU environment so the virtual 8-device
# mesh takes effect; capture is suspended first so output reaches the tty.
def pytest_configure(config):
    if (os.environ.get("WDT_TEST_REEXEC") == "1"
            or not os.environ.get("PALLAS_AXON_POOL_IPS")):
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    env = dict(
        os.environ,
        WDT_TEST_REEXEC="1",
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                   + " --xla_force_host_platform_device_count=8").strip(),
    )
    args = list(config.invocation_params.args)
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest"] + args, env)


os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def config():
    from wide_deep_tpu.config import Config
    return Config(os.path.join(REPO, "conf"))


@pytest.fixture(scope="session")
def plan(config):
    from wide_deep_tpu.features.plan import FeaturePlan
    return FeaturePlan(config)


@pytest.fixture(scope="session")
def small_conf_dir(tmp_path_factory):
    """A shrunken copy of conf/ suitable for fast CPU tests: hash spaces
    capped at 1000, cross spaces at 5k ids, small hidden layers."""
    from wide_deep_tpu.testing import write_small_conf
    return write_small_conf(str(tmp_path_factory.mktemp("conf_small")))


@pytest.fixture(scope="session")
def small_config(small_conf_dir):
    from wide_deep_tpu.config import Config
    return Config(small_conf_dir)


@pytest.fixture(scope="session")
def small_plan(small_config):
    from wide_deep_tpu.features.plan import FeaturePlan
    return FeaturePlan(small_config)


@pytest.fixture(scope="session")
def small_plan_nofold(small_config):
    """Legacy layout: every wide slot in the pool (fold disabled) — for
    wide-only models, FM, and arm-decomposition tests."""
    from wide_deep_tpu.features.plan import FeaturePlan
    return FeaturePlan(small_config, fold=False)


@pytest.fixture(scope="session")
def fixture_rows():
    """Vendored 10-row TSV unit fixture (tests/paths.py; the reference's
    data/test/test2 analog)."""
    from paths import UNIT_FIXTURE
    with open(UNIT_FIXTURE) as f:
        return [line.rstrip("\n").split("\t") for line in f if line.strip()]
