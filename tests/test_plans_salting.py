"""Salting rewrites must be result-identical to their naive forms and must
actually spread the hot key across partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdp2_5_hive2_spark.catalog import load_tables
from hdp2_5_hive2_spark.plans import salted_aggregate, salted_join
from tests.conftest import SF_CORRECT


def test_salted_aggregate_equals_plain(spark):
    li = load_tables(spark, SF_CORRECT)["lineitem"]
    got = {
        r.l_returnflag: (r.n, r.total, r.mx)
        for r in salted_aggregate(
            li,
            keys=["l_returnflag"],
            aggs={
                "n": ("count", "l_orderkey"),
                "total": ("sum", "l_quantity"),
                "mx": ("max", "l_extendedprice"),
            },
            unique_col="l_orderkey",
            n_salts=16,
        ).collect()
    }
    want = {
        r.l_returnflag: (r.n, r.total, r.mx)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("l_orderkey").alias("n"),
            F.sum("l_quantity").alias("total"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_salted_aggregate_spreads_hot_key(spark):
    # one hot key: every row has the same group key; partial phase must use
    # multiple salt groups
    df = spark.range(10000).select(
        F.lit("hot").alias("k"), F.col("id"), F.lit(1).alias("v")
    )
    partial_groups = (
        df.withColumn("_salt", F.pmod(F.xxhash64("id"), F.lit(16)).cast("int"))
        .groupBy("k", "_salt")
        .count()
        .count()
    )
    assert partial_groups == 16
    out = salted_aggregate(
        df, keys=["k"], aggs={"total": ("sum", "v")}, unique_col="id", n_salts=16
    ).collect()
    assert out[0].total == 10000


def test_salted_join_equals_plain(spark):
    t = load_tables(spark, SF_CORRECT)
    fact = t["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    dim = t["customer"].select("c_custkey", "c_mktsegment").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    got = sorted(
        (r.o_orderkey, r.c_mktsegment)
        for r in salted_join(
            fact, dim, on=["o_custkey"], unique_col="o_orderkey", n_salts=8
        ).collect()
    )
    want = sorted(
        (r.o_orderkey, r.c_mktsegment) for r in fact.join(dim, "o_custkey").collect()
    )
    assert got == want


def test_bucketed_range_join_equals_bnlj_and_avoids_it(spark):
    """Result equality with the naive BETWEEN join (including a value matching
    two overlapping bands and boundary-inclusive matches), and plan shape:
    the rewrite must contain no nested-loop/cartesian node."""
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.plans.range_join import bucketed_range_join

    left = spark.createDataFrame(
        [(1, 0.0), (2, 39.9), (3, 40.0), (4, 64.9), (5, 65.0), (6, 120.0), (7, -5.0)],
        "id bigint, v double",
    )
    bands = spark.createDataFrame(
        [(0, 0.0, 65.0), (1, 40.0, 105.0), (2, 80.0, 145.0)],
        "tier int, lo double, hi double",
    )
    fast = bucketed_range_join(left, "v", bands, "lo", "hi", bucket_width=40.0)
    naive = left.join(bands, F.col("v").between(F.col("lo"), F.col("hi")))
    key = lambda df: sorted((r.id, r.tier) for r in df.collect())
    assert key(fast) == key(naive)
    # v=40.0 and v=65.0 sit in overlaps / on boundaries -> two bands each
    matches = {r.id: 0 for r in left.collect()}
    for i, _ in key(fast):
        matches[i] += 1
    assert matches == {1: 1, 2: 1, 3: 2, 4: 2, 5: 2, 6: 1, 7: 0}
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_bucketed_range_join_left_outer(spark):
    """how='left' keeps non-matching left rows with NULL right columns and
    equals the naive left BETWEEN join."""
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.plans.range_join import bucketed_range_join

    left = spark.createDataFrame(
        [(1, 10.0), (2, 999.0), (3, -5.0)], "id bigint, v double"
    )
    bands = spark.createDataFrame(
        [(0, 0.0, 65.0), (1, 40.0, 105.0)], "tier int, lo double, hi double"
    )
    fast = bucketed_range_join(left, "v", bands, "lo", "hi", 40.0, how="left")
    naive = left.join(bands, F.col("v").between(F.col("lo"), F.col("hi")), "left")
    key = lambda df: sorted((r.id, r.tier) for r in df.collect())
    assert key(fast) == key(naive)
    assert key(fast) == [(1, 0), (2, None), (3, None)]


def test_bucketed_interval_join_equals_naive(spark):
    """Overlap semantics (inclusive, containment, multi-bucket spans) equal
    the naive inequality join, each pair exactly once, no nested loop."""
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.plans.range_join import bucketed_interval_join

    left = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 5.0, 200.0), (3, 300.0, 301.0)],
        "lid bigint, a_lo double, a_hi double",
    )
    right = spark.createDataFrame(
        [(10, 9.0, 12.0), (11, 50.0, 60.0), (12, 150.0, 400.0), (13, 500.0, 600.0)],
        "rid bigint, b_lo double, b_hi double",
    )
    fast = bucketed_interval_join(left, "a_lo", "a_hi", right, "b_lo", "b_hi", 40.0)
    naive = left.join(
        right, (F.col("a_lo") <= F.col("b_hi")) & (F.col("b_lo") <= F.col("a_hi"))
    )
    key = lambda df: sorted((r.lid, r.rid) for r in df.collect())
    assert key(fast) == key(naive)
    assert key(fast) == [(1, 10), (2, 10), (2, 11), (2, 12), (3, 12)]
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
