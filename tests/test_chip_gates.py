"""On-chip regression gates wired into the test path (slow-marked).

The CPU suite cannot run these (they need the real accelerator and
~15 min of bench + profile), so they activate only with
``WDT_RUN_CHIP_GATES=1`` — the invocation for a TPU-host CI lane:

    WDT_RUN_CHIP_GATES=1 python -m pytest tests/test_chip_gates.py -q

Gates: scripts/bench_check.sh (per-op device-time vs perf_budget.json,
8% tolerance) and tools/serving_slo.py check (p50/p99 + rows/s for both
serving transports vs serving_slo.json).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("WDT_RUN_CHIP_GATES") != "1",
        reason="chip gates need the real accelerator; set "
               "WDT_RUN_CHIP_GATES=1 on a TPU host"),
]


def _chip_env():
    env = dict(os.environ)
    # the suite's conftest pins JAX_PLATFORMS=cpu for the virtual mesh;
    # the gates must run on the real chip instead
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.pop("WDT_TEST_REEXEC", None)
    return env


def test_step_perf_budget_gate():
    out = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "bench_check.sh")],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
        env=_chip_env())
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]


def test_serving_slo_gate():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "serving_slo.py"),
         "check"],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
        env=_chip_env())
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
