"""Multi-chip collective budget gate (VERDICT r3 weak #5).

Real multi-chip hardware is unreachable here, so collective-volume
regressions are caught the only way available: recompile the production
8-device train step on the virtual CPU mesh and hold XLA's emitted
collective byte volume to the committed collective_budget.json (captured
by tools/collective_budget.py).  A change that stays functionally correct
but, say, all-gathers a table shard, fails this gate instead of shipping.
"""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

BUDGET = os.path.join(REPO, "collective_budget.json")


def test_budget_file_is_committed():
    assert os.path.exists(BUDGET), (
        "collective_budget.json missing — run "
        "`python tools/collective_budget.py capture` and commit it")
    with open(BUDGET) as f:
        budget = json.load(f)
    for key in ("n_devices", "batch_size", "per_op", "total_bytes",
                "expected_collective_ms_v5e8", "assumptions"):
        assert key in budget, key
    assert budget["per_op"], "empty budget"
    # the time model must be self-consistent with the recorded volumes
    from wide_deep_tpu.parallel.hlo_stats import expected_collective_ms
    ms = expected_collective_ms(budget["per_op"], budget["n_devices"])
    assert abs(ms - budget["expected_collective_ms_v5e8"]) < 0.01, (
        ms, budget["expected_collective_ms_v5e8"])


@pytest.mark.slow
def test_production_step_within_collective_budget():
    """Recompile the real program; every op kind's byte volume must stay
    within tolerance of the committed budget (and no new kinds appear)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from collective_budget import check
    problems = check(BUDGET)
    assert not problems, "\n".join(problems)
