"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Set before any jax import so sharding/collective tests exercise real SPMD
partitioning without TPU hardware (SURVEY.md §4: the reference had no
multi-worker test harness at all; we test the mesh path on every run).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def config():
    from wide_deep_tpu.config import Config
    return Config(os.path.join(REPO, "conf"))


@pytest.fixture(scope="session")
def plan(config):
    from wide_deep_tpu.features.plan import FeaturePlan
    return FeaturePlan(config)


@pytest.fixture(scope="session")
def fixture_rows():
    """10-row TSV fixture (reference data/test/test2)."""
    path = os.path.join(REF_DATA, "test", "test2")
    with open(path) as f:
        return [line.rstrip("\n").split("\t") for line in f if line.strip()]
