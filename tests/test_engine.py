"""Engine facade: the CLI/HiveServer2-replacement surface (SURVEY §3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdp2_5_hive2_spark.engine import Engine
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(SF_CORRECT, spark=spark)


def test_sql_roundtrip(eng):
    rows = eng.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag"
    ).collect()
    assert {r.l_returnflag for r in rows} == {"A", "N", "R"}


def test_table_access(eng):
    assert eng.table("nation").count() == 25
    with pytest.raises(KeyError):
        eng.table("nope")


def test_explain_shows_physical_plan(eng):
    plan = eng.explain("SELECT COUNT(*) FROM lineitem WHERE l_quantity > 10")
    assert "Physical Plan" in plan and "Scan parquet" in plan


def test_asof_join_semantics(spark):
    """Backward as-of: latest right row with ts <= left ts; equal ts matches;
    'left' keeps unmatched rows; the matched right row is carried atomically
    (a NULL right column must NOT be backfilled from an older right row)."""
    from hdp2_5_hive2_spark.timeseries import asof_join

    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 205, "p2"), (2, 50, "p3")],
        "k bigint, ts bigint, name string",
    )
    right = spark.createDataFrame(
        [(1, 100, "c_at_100"), (1, 200, None), (2, 60, "late")],
        "k bigint, ts bigint, tag string",
    )
    out = {
        r.name: (r.asof_ts, r.r_tag)
        for r in asof_join(
            left, right, on=["k"], right_cols=["tag"], how="left"
        ).collect()
    }
    assert out["p1"] == (100, "c_at_100")        # equal-ts match
    assert out["p2"] == (200, None)              # atomic carry: tag stays NULL
    assert out["p3"] == (None, None)             # right row is later -> no match
    inner = asof_join(left, right, on=["k"], right_cols=["tag"], how="inner")
    assert {r.name for r in inner.collect()} == {"p1", "p2"}


def test_asof_join_single_shuffle(spark):
    """The merge as-of plan must shuffle each side once on the key and never
    build a join: no BroadcastHashJoin/SortMergeJoin nodes, exactly one
    post-union Exchange feeding the window."""
    from hdp2_5_hive2_spark.timeseries import asof_join

    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("ts"), F.col("id").alias("v")
    )
    right = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("ts"), F.col("id").alias("w")
    )
    plan = (
        asof_join(left, right, on=["k"], right_cols=["w"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_join_forward_direction(spark):
    """direction='forward': earliest right row with right_ts >= left_ts,
    equal ts included."""
    from hdp2_5_hive2_spark.timeseries import asof_join

    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 10, "p2"), (2, 500, "p3")],
        "k bigint, ts bigint, name string",
    )
    right = spark.createDataFrame(
        [(1, 100, "r100"), (1, 50, "r50"), (2, 400, "r400")],
        "k bigint, ts bigint, tag string",
    )
    out = {
        r.name: (r.asof_ts, r.r_tag)
        for r in asof_join(
            left, right, on=["k"], right_cols=["tag"], how="left", direction="forward"
        ).collect()
    }
    assert out == {"p1": (100, "r100"), "p2": (50, "r50"), "p3": (None, None)}


def test_asof_join_nearest(spark):
    """Nearest picks min |gap|, ties to the earlier right row; unmatched
    only when the key has no right rows at all."""
    from hdp2_5_hive2_spark.timeseries import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 7, "p2"), (1, 300, "p3"), (2, 5, "p4")],
        "k bigint, ts bigint, name string",
    )
    right = spark.createDataFrame(
        [(1, 90, "r90"), (1, 104, "r104"), (1, 102, "r102")],
        "k bigint, ts bigint, tag string",
    )
    out = {
        r.name: (r.asof_ts, r.r_tag)
        for r in asof_join_nearest(
            left, right, on=["k"], right_cols=["tag"], how="left"
        ).collect()
    }
    # p1@100: back=90 (gap 10), fwd=102 (gap 2) -> r102
    # p2@7: no back -> fwd r90; p3@300: no fwd -> back r104
    # tie case: left@97 would be gap 7 both sides -> earlier (r90)
    assert out == {
        "p1": (102, "r102"), "p2": (90, "r90"), "p3": (104, "r104"), "p4": (None, None)
    }
    tie_left = spark.createDataFrame([(1, 97, "t")], "k bigint, ts bigint, name string")
    tie_right = spark.createDataFrame(
        [(1, 90, "r90"), (1, 104, "r104")], "k bigint, ts bigint, tag string"
    )
    got = asof_join_nearest(tie_left, tie_right, on=["k"], right_cols=["tag"]).collect()[0]
    assert (got.asof_ts, got.r_tag) == (90, "r90")


def test_qa_checks_flag_planted_violations(spark):
    """Each check type must actually catch its violation class."""
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark import qa

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 99), (3, None)], "k long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")

    uniq = qa.check_unique(child, "k", "u").first()
    assert uniq["n_violations"] == 1 and uniq["sample_key"] == 2

    fk = qa.check_foreign_key(child, "fk", parent, "pk", "f").first()
    assert fk["n_violations"] == 1 and fk["sample_key"] == 99  # NULL fk not counted

    nn = qa.check_not_null(child, "fk", "k", "n").first()
    assert nn["n_violations"] == 1 and nn["sample_key"] == 3

    pred = qa.check_predicate(child, F.col("k") > 2, "k", "p").first()
    assert pred["n_violations"] == 1 and pred["sample_key"] == 3

    clean = qa.check_unique(parent, "pk", "c").first()
    assert clean["n_violations"] == 0 and clean["sample_key"] is None

    rep = qa.constraint_report(
        [qa.check_unique(child, "k", "a"), qa.check_not_null(child, "fk", "k", "b")]
    )
    assert rep.count() == 2

    import pytest as _pytest

    with _pytest.raises(ValueError):
        qa.constraint_report([])
