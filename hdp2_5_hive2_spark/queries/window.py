"""Windowing / PTF corpus.

Parity targets (SURVEY.md §2.5): PTFOperator (ql/exec/PTFOperator.java:46) +
WindowingTableFunction (ql/udf/ptf/WindowingTableFunction.java:69) evaluating
row_number/rank/dense_rank/percent_rank/cume_dist/ntile/first/last/lead/lag
(FunctionRegistry.java:456-468) with ROWS/RANGE frames validated in
parse/WindowingSpec.java:214-306 (default frame = RANGE UNBOUNDED PRECEDING
.. CURRENT ROW when ORDER BY present, :304-306).

Determinism rule: every ORDER BY inside a window is tie-broken to a unique
key so row_number/lag/lead/ntile agree byte-for-byte with the oracle.

Scale notes: window evaluation shuffles once on partitionBy keys; the
reference spills PTF partitions to disk (PTFRowContainer) — Spark's window
exec buffers per-partition with the same spill behavior, and the cumulative
fast path (WindowingTableFunction.java:234-261 streaming mode) corresponds
to Spark's running-frame optimization. Partition keys here (p_brand,
l_suppkey, o_custkey) are high-cardinality enough to parallelize at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hdp2_5_hive2_spark.catalog import load_tables
from hdp2_5_hive2_spark.queries.registry import query


@query(
    "window_ranking",
    oracle="""
    SELECT p_partkey, p_brand,
           ROW_NUMBER()   OVER w AS rn,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           PERCENT_RANK() OVER w AS prnk,
           CUME_DIST()    OVER w AS cdist,
           NTILE(4)       OVER w AS quartile
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    """,
    tags=("window", "rank"),
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six ranking functions over one window (FunctionRegistry.java:459-466)."""
    p = load_tables(spark, sf_dir)["part"]
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return p.select(
        "p_partkey",
        "p_brand",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_qty
    FROM lineitem
    WHERE l_suppkey <= 20
    """,
    tags=("window", "frame", "rows"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative ROWS frame — the reference's streaming fast path
    (WindowingTableFunction.java:234-261). Decimal-exact running sum."""
    li = load_tables(spark, sf_dir)["lineitem"].filter(F.col("l_suppkey") <= 20)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).cast("double").alias("running_qty"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(LAG(o_totalprice)  OVER w AS DOUBLE) AS prev_price,
           CAST(LEAD(o_totalprice) OVER w AS DOUBLE) AS next_price,
           CAST(LAG(o_totalprice, 2, -1.0) OVER w AS DOUBLE) AS prev2_price
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "lag", "lead"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead incl. offset + default (FunctionRegistry.java:456-457)."""
    o = load_tables(spark, sf_dir)["orders"].filter(F.col("o_custkey") <= 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).cast("double").alias("prev_price"),
        F.lead("o_totalprice").over(w).cast("double").alias("next_price"),
        F.lag("o_totalprice", 2, -1.0).over(w).cast("double").alias("prev2_price"),
    )


@query(
    "window_sliding_rows_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING
           ) AS DOUBLE) AS window_rev,
           COUNT(*) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING
           ) AS window_n
    FROM lineitem
    WHERE l_suppkey <= 20
    """,
    tags=("window", "frame", "rows"),
)
def window_sliding_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frame (n PRECEDING .. m FOLLOWING; WindowingSpec.java:214)."""
    li = load_tables(spark, sf_dir)["lineitem"].filter(F.col("l_suppkey") <= 20)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-2, 1)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).over(w).cast("double").alias("window_rev"),
        F.count(F.lit(1)).over(w).alias("window_n"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT p_partkey, p_size,
           COUNT(*) OVER (
             ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
           ) AS n_close_sizes
    FROM part
    WHERE p_partkey <= 500
    """,
    tags=("window", "frame", "range"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame (RANGE n PRECEDING — WindowingSpec.java:239).
    Frame membership is value-based so ties don't hurt determinism."""
    p = load_tables(spark, sf_dir)["part"].filter(F.col("p_partkey") <= 500)
    w = W.orderBy("p_size").rangeBetween(-2, 2)
    return p.select(
        "p_partkey", "p_size", F.count(F.lit(1)).over(w).alias("n_close_sizes")
    )


@query(
    "window_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderdate) OVER w AS first_date,
           LAST_VALUE(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_date,
           CAST(MAX(o_totalprice) OVER w AS DOUBLE) AS max_price_so_far
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "firstlast"),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with explicit full frame (the Hive default frame
    for last_value — RANGE .. CURRENT ROW — is the classic gotcha; we pin the
    full frame, matching WindowingSpec.java:304-306 semantics explicitly)."""
    o = load_tables(spark, sf_dir)["orders"].filter(F.col("o_custkey") <= 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderdate").over(w).alias("first_date"),
        F.last("o_orderdate").over(wfull).alias("last_date"),
        F.max("o_totalprice").over(w).cast("double").alias("max_price_so_far"),
    )


@query(
    "window_topn_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ) AS rn
      FROM customer
    ) t WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group — the windowed TopNHash pushdown pattern
    (ql/exec/PTFTopNHash.java:33)."""
    c = load_tables(spark, sf_dir)["customer"]
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select("c_nationkey", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_udaf_over_window",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
             PARTITION BY l_returnflag
           ) AS DOUBLE) / COUNT(*) OVER (PARTITION BY l_returnflag) AS avg_qty_flag,
           COUNT(*) OVER (PARTITION BY l_returnflag) AS n_flag
    FROM lineitem
    WHERE l_orderkey <= 100
    """,
    tags=("window", "agg"),
)
def window_udaf_over_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Any UDAF over a window (whole-partition frame, no ORDER BY)."""
    li = load_tables(spark, sf_dir)["lineitem"].filter(F.col("l_orderkey") <= 100)
    w = W.partitionBy("l_returnflag")
    return li.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        (F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).cast("double")
         / F.count(F.lit(1)).over(w)).alias("avg_qty_flag"),
        F.count(F.lit(1)).over(w).alias("n_flag"),
    )


@query(
    "window_percentile_exact",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           quantile_cont(l_quantity, 0.5)  OVER w AS med_qty,
           quantile_cont(l_quantity, 0.25) OVER w AS q1_qty
    FROM lineitem
    WHERE l_orderkey <= 2000
    WINDOW w AS (PARTITION BY l_suppkey)
    """,
    tags=("window", "agg", "percentile"),
)
def window_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile as a windowed UDAF (FunctionRegistry.java:394
    `percentile` evaluated through WindowingTableFunction.java:69):
    per-supplier median and first-quartile quantity on every row.

    Hash-exactness: l_quantity is integral (1..50) and the percentile ranks
    land on quarter fractions, so linear interpolation is exact in float64
    regardless of each engine's evaluation order — Spark `percentile` and
    DuckDB `quantile_cont` agree bitwise."""
    li = load_tables(spark, sf_dir)["lineitem"].filter(F.col("l_orderkey") <= 2000)
    w = W.partitionBy("l_suppkey")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.percentile("l_quantity", F.lit(0.5)).over(w).alias("med_qty"),
        F.percentile("l_quantity", F.lit(0.25)).over(w).alias("q1_qty"),
    )


@query(
    "window_running_distinct",
    oracle="""
    WITH f AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) = 1 THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(first_seen) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_types_so_far
    FROM f
    """,
    tags=("window", "running-distinct"),
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNNING DISTINCT COUNT over a window — the aggregate Spark and
    Hive both refuse (`COUNT(DISTINCT) OVER (... ROWS ...)` is
    unsupported) — computed EXACTLY by the first-seen decomposition:
    flag each row that is the first of its (user, event_type) in time
    order, then a running SUM of flags gives distinct-types-seen-so-far.
    Two windows, but both partition on user_id, so the second reuses the
    first's exchange — one shuffle total, no sketch, no quadratic
    re-scan."""
    from pyspark.sql import Window

    e = load_tables(spark, sf_dir)["events"]
    first_w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    run_w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    f = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(first_w) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return f.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(run_w).cast("bigint").alias("distinct_types_so_far"),
    )
