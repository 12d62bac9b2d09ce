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
