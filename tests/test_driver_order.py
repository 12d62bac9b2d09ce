"""The driver verifies queries in alphabetical-name order with a bounded
budget (~the first 50 names each round). These tests pin the contract that
makes that order OUR priority order.

Per VERDICT r5 #2 the dark set is DERIVED from the recorded
CORRECTNESS_r*.json files inside `driver_order.py` itself (single source of
truth) and every invariant below is checked BOTH against the current files
AND against simulated future rounds (a synthetic CORRECTNESS_r06/r07.json
landing), so a new round's file can never make this suite go stale again —
the exact failure mode that hit rounds 4 and 5."""

from __future__ import annotations

import json
import re

import __spark_entry__ as entry_mod
from hdp2_5_hive2_spark.queries import REGISTRY
from hdp2_5_hive2_spark.queries.driver_order import (
    _NEW_THIS_ROUND,
    _ROTATION_PLAN,
    dark_queries,
    driver_order,
    driver_registry,
    green_union,
)

_WINDOW = 50  # driver budget observed in rounds 1-5


def _check_invariants(green: set[str]) -> None:
    """Every ordering invariant, parameterized by the green union so the
    same checks run against current files and simulated future rounds."""
    order = driver_order(green)
    # 1. covers the registry exactly once
    assert sorted(order) == sorted(REGISTRY)
    assert len(order) == len(set(order))
    # 2. dark names lead, in full, before anything green
    dark = dark_queries(green)
    assert set(dark) == {n for n in REGISTRY if n not in green}
    k = len(dark)
    assert order[:k] == dark, "dark queries must lead the order"
    # 3. after the dark head, the frozen plan order holds
    planned_rest = [n for n in _ROTATION_PLAN if n in REGISTRY and n not in set(dark)]
    assert order[k : k + len(planned_rest)] == planned_rest
    # 4. the tail is alphabetical (unplanned, green names)
    tail = order[k + len(planned_rest) :]
    assert tail == sorted(tail)
    # 5. a budget shortfall can only cut re-verification, never first
    #    verification: every dark name either fits the window or ALL window
    #    slots are dark
    in_window = set(order[:_WINDOW])
    assert set(dark) <= in_window or len(dark) >= _WINDOW


def test_invariants_against_current_files():
    _check_invariants(green_union())


def test_invariants_survive_next_round_file(tmp_path):
    """Simulate CORRECTNESS_r06.json landing with the whole window green —
    the exact event that broke this suite at the r4 and r5 boundaries. The
    derived dark set must shrink to empty and every invariant must hold
    with no code change."""
    for i, name in enumerate(driver_order()[:_WINDOW]):
        assert name in REGISTRY
    future = {
        f"{i:03d}_{n}": {
            "rows_match": True,
            "schema_match": True,
            "hash_match": True,
            "err": None,
        }
        for i, n in enumerate(driver_order()[:_WINDOW])
    }
    (tmp_path / "CORRECTNESS_r06.json").write_text(json.dumps(future))
    simulated = green_union() | green_union(tmp_path)
    assert not {n for n in REGISTRY if n not in simulated} - set(REGISTRY), (
        "sanity"
    )
    _check_invariants(simulated)
    # the six round-5 overflow names must now be green, i.e. non-dark, and
    # the leftover dark names (overflow beyond the window) keep the
    # documented contract: plan order first, unplanned alphabetically after
    leftover = {
        n
        for n in REGISTRY
        if n not in simulated and n not in driver_order()[:_WINDOW]
    }
    expected = [n for n in _ROTATION_PLAN if n in leftover] + sorted(
        leftover - set(_ROTATION_PLAN)
    )
    assert dark_queries(simulated) == expected


def test_invariants_survive_partial_round_file(tmp_path):
    """A round whose budget stopped early (only 10 names green) must also
    leave the suite green: remaining dark names still lead."""
    future = {
        f"{i:03d}_{n}": {"rows_match": True, "hash_match": True, "err": None}
        for i, n in enumerate(driver_order()[:10])
    }
    (tmp_path / "CORRECTNESS_r07.json").write_text(json.dumps(future))
    _check_invariants(green_union() | green_union(tmp_path))


def test_invariants_survive_red_verdicts():
    """A file full of red rows adds nothing to the green union; invariants
    hold with the dark set unchanged."""
    before = dark_queries()
    _check_invariants(green_union() | set())
    assert dark_queries(green_union()) == before


def test_dark_set_is_file_derived():
    """dark_queries() must agree exactly with the files — no hard-coded
    tier to go stale (the r4/r5 defect)."""
    green = green_union()
    assert set(dark_queries()) == {n for n in REGISTRY if n not in green}


def test_new_this_round_names_have_no_verdict():
    """Tier-2 names (added this round) cannot have a green verdict yet;
    names not yet registered are simply pending implementation."""
    green = green_union()
    assert not (set(_NEW_THIS_ROUND) & set(REGISTRY) & green)


def test_plan_head_is_expected_dark_set():
    """The frozen plan's head must contain every currently-dark name so the
    order cannot move when the next CORRECTNESS file lands."""
    dark = set(dark_queries())
    planned_dark = [n for n in _ROTATION_PLAN if n in dark]
    # every registered dark name is planned (unplanned dark would reorder
    # at the boundary) — mid-round additions register themselves in
    # _NEW_THIS_ROUND which is part of the plan
    assert dark <= set(_ROTATION_PLAN), (
        f"dark names missing from the rotation plan: {dark - set(_ROTATION_PLAN)}"
    )
    assert planned_dark == dark_queries()


def test_prefixed_alphabetical_order_is_priority_order():
    reg = driver_registry()
    names = list(reg)
    assert names == sorted(names), "prefixes must make alphabetical == priority"
    plain = [re.sub(r"^\d+_", "", n) for n in names]
    assert plain == driver_order()


def test_entry_module_exposes_prefixed_names_consistently():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    # every oracle-less query is a documented rows-only check, not a typo
    oracle_less = {re.sub(r"^\d+_", "", n) for n in set(qs) - set(os_)}
    assert oracle_less == {n for n in REGISTRY if REGISTRY[n].oracle is None}
