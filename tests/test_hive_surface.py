"""Hive-surface tests beyond the oracle gate: MatchPath unit semantics and
the plan shapes DISTRIBUTE/SORT/CLUSTER BY must produce."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdp2_5_hive2_spark.ptf import match_path
from hdp2_5_hive2_spark.queries.hive_surface import distribute_sort_by
from tests.conftest import SF_CORRECT


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_matchpath_finds_runs(spark):
    rows = [
        # pid, seq, v — partition 1: L H H L H ; partition 2: H H H
        (1, 1, 0), (1, 2, 9), (1, 3, 9), (1, 4, 0), (1, 5, 9),
        (2, 1, 9), (2, 2, 9), (2, 3, 9),
    ]
    df = spark.createDataFrame(rows, "pid int, seq int, v int")
    out = match_path(
        df,
        partition_by=["pid"],
        order_by=["seq"],
        symbols={"H": F.col("v") > 5, "L": F.col("v") <= 5},
        pattern="H.H+",
    ).collect()
    got = sorted((r.pid, r.seq, r.match_number, r.match_pos) for r in out)
    # partition 1: one run (seq 2,3); the lone H at seq 5 is not a match.
    # partition 2: one run (seq 1,2,3).
    assert got == [
        (1, 2, 1, 0), (1, 3, 1, 1),
        (2, 1, 1, 0), (2, 2, 1, 1), (2, 3, 1, 2),
    ]


def test_matchpath_skip_to_next_row_overlaps(spark):
    """after_match="next_row" (Hive MatchPath.java execute(): a match
    attempt at every input row) vs the past_last default on the same data:
    overlapping H.H+ runs. Sequence H H H L: past_last consumes the whole
    greedy run as ONE match; next_row also emits the suffix match starting
    at the second H."""
    rows = [(1, 1, 9), (1, 2, 9), (1, 3, 9), (1, 4, 0)]
    df = spark.createDataFrame(rows, "pid int, seq int, v int")
    sym = {"H": F.col("v") > 5, "L": F.col("v") <= 5}
    past = sorted(
        (r.seq, r.match_number, r.match_pos)
        for r in match_path(
            df, ["pid"], ["seq"], sym, "H.H+", after_match="past_last"
        ).collect()
    )
    assert past == [(1, 1, 0), (2, 1, 1), (3, 1, 2)]
    nxt = sorted(
        (r.seq, r.match_number, r.match_pos)
        for r in match_path(
            df, ["pid"], ["seq"], sym, "H.H+", after_match="next_row"
        ).collect()
    )
    # match 1 = seq 1-3 (greedy from row 1), match 2 = seq 2-3 (from row 2)
    assert nxt == [
        (1, 1, 0), (2, 1, 1), (2, 2, 0), (3, 1, 2), (3, 2, 1),
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="after_match"):
        match_path(df, ["pid"], ["seq"], sym, "H", after_match="bogus")


def test_matchpath_alternation_pattern(spark):
    rows = [(1, i, v) for i, v in enumerate([1, 9, 1, 9, 9, 1])]
    df = spark.createDataFrame(rows, "pid int, seq int, v int")
    out = match_path(
        df,
        partition_by=["pid"],
        order_by=["seq"],
        symbols={"UP": F.col("v") > 5, "DN": F.col("v") <= 5},
        pattern="DN.UP",
    ).collect()
    # non-overlapping DN,UP pairs: (0,1), (2,3) — seq 5 DN has no following UP
    assert sorted((r.seq, r.match_number) for r in out) == [(0, 1), (1, 1), (2, 2), (3, 2)]


def test_distribute_sort_by_plan(spark):
    df = distribute_sort_by(spark, SF_CORRECT)
    plan = _plan(df)
    # hash repartition on the DISTRIBUTE BY key + sort that is NOT global
    assert "hashpartitioning(o_orderstatus" in plan, plan
    assert "Sort [o_orderkey" in plan and "false, 0" in plan.split("Sort [o_orderkey")[1][:80], plan


def test_matchpath_bounded_quantifier(spark):
    """MatchPath.java path expressions allow bounded repetition (A{2,4});
    the translation must preserve regex quantifier braces."""
    # H-runs of length 1, 2, 4, and 6
    vals = [9, 0, 9, 9, 0, 9, 9, 9, 9, 0, 9, 9, 9, 9, 9, 9]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "pid int, seq int, v int")
    out = match_path(
        df,
        partition_by=["pid"],
        order_by=["seq"],
        symbols={"H": F.col("v") > 5, "L": F.col("v") <= 5},
        pattern="H{2,4}",
    ).collect()
    by_match = {}
    for r in out:
        by_match.setdefault(r.match_number, []).append(r.seq)
    lengths = sorted(len(v) for v in by_match.values())
    # run-1 too short; run-2 -> 2; run-4 -> 4; run-6 -> greedy 4 + leftover 2
    assert lengths == [2, 2, 4, 4]
    assert all(1 <= len(v) for v in by_match.values())


def test_matchpath_alternation_group_quantified(spark):
    """(A|B)-style alternation groups with a quantifier — the other
    MatchPath.java surface beyond plain concatenation."""
    #          L    M    H    L    H    M    L
    vals = [   1,   5,   9,   1,   9,   5,   1]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "pid int, seq int, v int")
    out = match_path(
        df,
        partition_by=["pid"],
        order_by=["seq"],
        symbols={
            "H": F.col("v") > 8,
            "M": (F.col("v") > 3) & (F.col("v") <= 8),
            "L": F.col("v") <= 3,
        },
        pattern="L.(H|M)+",
    ).collect()
    by_match = {}
    for r in out:
        by_match.setdefault(r.match_number, []).append((r.seq, r.match_symbol))
    seqs = sorted(tuple(s for s, _ in v) for v in by_match.values())
    # match 1: L(0) M(1) H(2); match 2: L(3) H(4) M(5); trailing L unmatched
    assert seqs == [(0, 1, 2), (3, 4, 5)]


def test_matchpath_null_partition_key_is_one_group(spark):
    """A NULL partition key forms ONE group (Hive/Spark partitioning
    semantics): NaN != NaN must not split it row-per-row, and the
    batch-carry mask must recognize a null-keyed trailing group."""
    rows = [
        (None, 1, 9), (None, 2, 9), (None, 3, 0),
        (1, 1, 9), (1, 2, 9),
    ]
    df = spark.createDataFrame(rows, "pid int, seq int, v int")
    out = match_path(
        df,
        partition_by=["pid"],
        order_by=["seq"],
        symbols={"H": F.col("v") > 5, "L": F.col("v") <= 5},
        pattern="H.H",
    ).collect()
    got = sorted(((r.pid, r.seq) for r in out), key=repr)
    # null group: seq 1,2 match; int group: seq 1,2 match
    assert got == [(1, 1), (1, 2), (None, 1), (None, 2)]


def test_char_overlong_insert_raises(spark):
    """Hive 2.1 silently truncates overlong CHAR/VARCHAR inserts; this
    engine deliberately keeps Spark's strict EXCEED_LIMIT_LENGTH error
    (documented divergence in hive_char_semantics) — pin it so the choice
    stays deliberate."""
    import pytest as _pytest

    spark.sql("DROP TABLE IF EXISTS _char_strict")
    spark.sql("CREATE TABLE _char_strict (v VARCHAR(3)) USING parquet")
    try:
        with _pytest.raises(Exception, match="EXCEED_LIMIT_LENGTH"):
            spark.sql("INSERT INTO _char_strict VALUES ('toolong')")
    finally:
        spark.sql("DROP TABLE IF EXISTS _char_strict")
