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
