"""Golden-plan regression suite — the engine's analogue of the reference's
TestPerfCliDriver TPC-DS plan-diff harness (BASELINE.md row 1: the
reference publishes NO timings, only explain-plan regression). Every TPC-H
query's NORMALIZED Catalyst optimized plan is pinned; a lost pushdown, a
dropped broadcast hint, a widened scan schema or a join-order change
surfaces as a readable diff here long before it becomes a 100 TB
regression.

Regenerate intentionally changed plans with:
    python tools/plan_goldens.py
"""

from __future__ import annotations

import difflib

import pytest

from tools.plan_goldens import GOLDEN_DIR, golden_names, live_plan


@pytest.mark.parametrize("name", golden_names())
def test_tpch_plan_matches_golden(spark, name):
    path = GOLDEN_DIR / f"{name}.txt"
    assert path.exists(), (
        f"missing golden plan for {name}; run python tools/plan_goldens.py"
    )
    got = live_plan(spark, name)
    want = path.read_text()
    if got != want:
        diff = "\n".join(
            difflib.unified_diff(
                want.splitlines(), got.splitlines(), "golden", "live", lineterm=""
            )
        )
        pytest.fail(
            f"optimized plan drift for {name} (regenerate via "
            f"tools/plan_goldens.py if intended):\n{diff}"
        )
