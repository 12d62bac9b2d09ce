"""Relational operator corpus: all join variants, set ops, subqueries,
grouping sets, distinct, limit/offset, pivot.

Parity targets (SURVEY.md §2.3/2.7/2.8):
  - CommonJoinOperator INNER/LEFT/RIGHT/FULL/LEFT SEMI + cartesian + <=>
    (ql/exec/CommonJoinOperator.java:49; null-safe = FunctionRegistry.java:337)
  - NOT IN / NOT EXISTS rewrites (ql/parse/QBSubQuery.java:42-46,
    SemanticAnalyzer.java:3001) → Spark left_anti
  - UNION ALL / UNION DISTINCT (HiveParser.g:2274-2279,
    ql/exec/UnionOperator.java:39); Spark's intersect/except are a bonus
  - GROUPING SETS / ROLLUP / CUBE + GROUPING__ID
    (SemanticAnalyzer.java:1538-1557, :3753-3784; VirtualColumn.java:66)
  - multi-DISTINCT aggregates (SemanticAnalyzer.java:4555)
  - LIMIT/OFFSET (ql/exec/LimitOperator.java:32, genLimitPlan :7268)

Scale notes: dimension joins broadcast (no shuffle); the only shuffles are on
aggregation keys. Anti/semi joins against `orders` broadcast the filtered
side when small, else shuffle once on the key — exactly what AQE picks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdp2_5_hive2_spark.catalog import load_tables, register_views
from hdp2_5_hive2_spark.queries.registry import query


@query(
    "join_inner_dim",
    oracle="""
    SELECT n.n_name, r.r_name, COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    tags=("join", "broadcast"),
)
def join_inner_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner join chain through the dimension hierarchy (broadcast both dims)."""
    t = load_tables(spark, sf_dir)
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double").alias("total_acctbal"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
    GROUP BY c.c_custkey
    """,
    tags=("join", "outer"),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER with an ON-clause residual predicate (FilterOperator on join
    residuals, ql/exec/JoinOperator.java:44)."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    c = t["customer"]
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F")
    return (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT n.n_name, COUNT(c.c_custkey) AS n_customers
    FROM customer c
    RIGHT JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("join", "outer"),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c, n = t["customer"], t["nation"]
    return (
        c.join(n, c.c_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cust_n AS (
      SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey
    ), supp_n AS (
      SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(c.k, s.k) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_cust,
           COALESCE(s.n_supp, 0) AS n_supp
    FROM cust_n c FULL OUTER JOIN supp_n s ON c.k = s.k
    """,
    tags=("join", "outer"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (both sides may have unmatched keys)."""
    t = load_tables(spark, sf_dir)
    c = t["customer"].groupBy(F.col("c_nationkey").alias("k")).agg(F.count(F.lit(1)).alias("n_cust"))
    s = t["supplier"].groupBy(F.col("s_nationkey").alias("k")).agg(F.count(F.lit(1)).alias("n_supp"))
    return (
        c.join(s, "k", "full")
        .select(
            F.col("k").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE c.c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    GROUP BY c_mktsegment
    """,
    tags=("join", "semi", "subquery"),
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → LEFT SEMI JOIN (TOK_LEFTSEMIJOIN, FromClauseParser.g:125)."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
    tags=("join", "anti", "subquery"),
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → LEFT ANTI JOIN (Hive rewrites onto outer join + null filter,
    SemanticAnalyzer.java:3001; Spark has the operator natively)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_null_safe",
    oracle="""
    SELECT COUNT(*) AS n_pairs
    FROM (SELECT NULLIF(c_nationkey % 5, 0) AS k FROM customer) a
    JOIN (SELECT NULLIF(s_nationkey % 5, 0) AS k FROM supplier) b
      ON a.k IS NOT DISTINCT FROM b.k
    """,
    tags=("join", "nullsafe"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join `<=>` (GenericUDFOPEqualNS,
    FunctionRegistry.java:337): NULL keys match each other."""
    t = load_tables(spark, sf_dir)
    a = t["customer"].select(F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("k"))
    b = t["supplier"].select(F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("k2"))
    return a.join(b, a.k.eqNullSafe(b.k2)).agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, m.c_mktsegment, COUNT(*) AS n
    FROM region r
    CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) m
    GROUP BY r.r_name, m.c_mktsegment
    """,
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (CrossProductCheck warns in the reference;
    Spark requires explicit crossJoin)."""
    t = load_tables(spark, sf_dir)
    segs = t["customer"].select("c_mktsegment").distinct()
    return (
        t["region"]
        .crossJoin(segs)
        .groupBy("r_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-DISTINCT aggregate (SemanticAnalyzer.java:4555,
    HiveExpandDistinctAggregatesRule — Catalyst expands the same way)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "groupby_rollup",
    oracle="""
    SELECT r.r_name, n.n_name, GROUPING(r.r_name, n.n_name) AS gid, COUNT(*) AS n_supp
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    tags=("agg", "rollup", "grouping"),
)
def groupby_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + GROUPING__ID (SemanticAnalyzer.java:3753-3784 bitmask;
    VirtualColumn.java:66). Spark's grouping_id uses the same MSB-first bitmask
    as ANSI GROUPING(a,b)."""
    t = load_tables(spark, sf_dir)
    joined = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping_id().alias("gid"), F.count(F.lit(1)).alias("n_supp")
    ).select("r_name", "n_name", "gid", "n_supp")


@query(
    "groupby_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, GROUPING(l_returnflag, l_linestatus) AS gid,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube", "grouping"),
)
def groupby_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    ).select("l_returnflag", "l_linestatus", "gid", "sum_qty")


@query(
    "groupby_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("agg", "grouping"),
)
def groupby_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (token dispatch parity with
    SemanticAnalyzer.java:1538-1557)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "union_all",
    oracle="""
    SELECT k, v FROM (
      SELECT c_custkey AS k, c_acctbal AS v FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT s_suppkey AS k, s_acctbal AS v FROM supplier
    ) u
    """,
    tags=("setop",),
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with schema-harmonizing selects (UnionOperator.java:39)."""
    t = load_tables(spark, sf_dir)
    a = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k"), F.col("c_acctbal").alias("v")
    )
    b = t["supplier"].select(F.col("s_suppkey").alias("k"), F.col("s_acctbal").alias("v"))
    return a.unionAll(b)


@query(
    "union_distinct",
    oracle="""
    SELECT n_regionkey AS k FROM nation
    UNION
    SELECT r_regionkey AS k FROM region
    """,
    tags=("setop",),
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT = UNION ALL + dedup (SemanticAnalyzer genUnionPlan :9504)."""
    t = load_tables(spark, sf_dir)
    a = t["nation"].select(F.col("n_regionkey").alias("k"))
    b = t["region"].select(F.col("r_regionkey").alias("k"))
    return a.union(b).distinct()


@query(
    "intersect_distinct",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey AS k FROM supplier
    """,
    tags=("setop",),
)
def intersect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (absent from Hive 2.1's grammar — Spark superset, SURVEY §2.7)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"].select(F.col("c_nationkey").alias("k"))
        .intersect(t["supplier"].select(F.col("s_nationkey").alias("k")))
    )


@query(
    "except_distinct",
    oracle="""
    SELECT n_nationkey AS k FROM nation
    EXCEPT
    SELECT c_nationkey AS k FROM customer
    """,
    tags=("setop",),
)
def except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["nation"].select(F.col("n_nationkey").alias("k"))
        .subtract(t["customer"].select(F.col("c_nationkey").alias("k")))
    )


@query(
    "subquery_scalar",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_above
    FROM customer
    WHERE c_acctbal > (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM customer
    )
    GROUP BY c_mktsegment
    """,
    tags=("subquery", "scalar"),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in WHERE (not supported by Hive 2.1 — Spark superset;
    threshold computed exactly so the comparison is engine-stable)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_above
        FROM customer
        WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM customer
        )
        GROUP BY c_mktsegment
        """
    )


@query(
    "subquery_not_in",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part
    WHERE p_partkey NOT IN (
      SELECT l_partkey FROM lineitem WHERE l_quantity >= 49
    )
    GROUP BY p_brand
    """,
    tags=("subquery", "anti"),
)
def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with non-null keys (QBSubQuery NOT_IN → outer join + null guard)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_brand, COUNT(*) AS n_parts
        FROM part
        WHERE p_partkey NOT IN (
          SELECT l_partkey FROM lineitem WHERE l_quantity >= 49
        )
        GROUP BY p_brand
        """
    )


@query(
    "subquery_correlated_exists",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48
    )
    GROUP BY o_orderstatus
    """,
    tags=("subquery", "semi"),
)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48
        )
        GROUP BY o_orderstatus
        """
    )


@query(
    "having_filter",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
    tags=("agg", "having"),
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING → post-aggregation FilterOperator (ql/exec/FilterOperator.java:37)."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "select_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("distinct",),
)
def select_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["customer"].select("c_mktsegment", "c_nationkey").distinct()


@query(
    "order_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50 OFFSET 10
    """,
    tags=("sort", "limit", "offset"),
)
def order_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT/OFFSET (genLimitPlan :7268 takes an offset arg;
    Spark TakeOrderedAndProjectExec). Fully tie-broken for determinism."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(50)
    )


@query(
    "pivot_status_by_segment",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("pivot", "agg"),
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (Spark-native; Hive expresses this as CASE WHEN aggregation)."""
    t = load_tables(spark, sf_dir)
    joined = t["orders"].join(
        F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "c_mktsegment",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


_CTE_REUSE_SQL = """
WITH big_cust AS (
  SELECT o_custkey, COUNT(*) AS n, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
  FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
)
SELECT 'by_count' AS dim, o_custkey, n, CAST(tot AS DOUBLE) AS tot
FROM (SELECT * FROM big_cust ORDER BY n DESC, o_custkey LIMIT 10) t
UNION ALL
SELECT 'by_total' AS dim, o_custkey, n, CAST(tot AS DOUBLE) AS tot
FROM (SELECT * FROM big_cust ORDER BY tot DESC, o_custkey LIMIT 10) u
"""


@query(
    "cte_reuse",
    oracle=_CTE_REUSE_SQL,
    tags=("cte", "agg"),
)
def cte_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH-clause reuse: one CTE referenced twice (top-10 customers by
    order count UNION ALL top-10 by total spend, both off the same
    aggregate). Catalyst plans the aggregate once per reference and
    ReusedExchange dedupes the shuffle — Hive's CTE handling + YSmart-style
    shared scans (ql/optimizer/correlation/CorrelationOptimizer.java:85);
    plan pinned by tests/test_plans.py::test_cte_reuse_shares_the_aggregate.

    Earlier shape (self-join of the CTE on equal order COUNTs) was replaced
    in round 5: COUNT is a tiny-cardinality join key, so the pair output
    grew quadratically with scale — 2.08M rows at sf0.1, row-explosion at
    100 TB. Both rankings here end in bounded TakeOrderedAndProject heaps
    and (rank-key DESC, o_custkey) is a total order, so the result is 20
    rows and engine-deterministic at any scale."""
    register_views(spark, sf_dir)
    return spark.sql(_CTE_REUSE_SQL)


@query(
    "view_over_view",
    oracle="""
    SELECT n_name, COUNT(*) AS n_cust
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 0 GROUP BY n_name
    """,
    tags=("view", "ddl"),
)
def view_over_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE VIEW surface (metastore-expanded views in the reference,
    SURVEY §1.1): a temp view stacked on another temp view, queried through
    Spark's catalog."""
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW positive_cust AS "
        "SELECT * FROM customer WHERE c_acctbal > 0"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW cust_nation AS "
        "SELECT n_name FROM positive_cust JOIN nation ON c_nationkey = n_nationkey"
    )
    return spark.sql("SELECT n_name, COUNT(*) AS n_cust FROM cust_nation GROUP BY n_name")


@query(
    "intersect_all_keys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop", "intersect"),
)
def intersect_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset semantics — beyond Hive 2.1's UNION-only
    set ops, SURVEY §2.7; Spark/DuckDB agree on per-row multiplicities)."""
    o = load_tables(spark, sf_dir)["orders"]
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersectAll(op)


@query(
    "except_all_keys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    tags=("setop", "except"),
)
def except_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL multiset difference (same rationale as intersect_all_keys)."""
    o = load_tables(spark, sf_dir)["orders"]
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return f.exceptAll(p)


@query(
    "salted_groupby",
    oracle="""
    SELECT l_returnflag,
           COUNT(l_orderkey) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total,
           MAX(l_extendedprice) AS mx
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "skew", "salting"),
)
def salted_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (plans.salting.salted_aggregate — the
    SkewJoinOptimizer-style rewrite for hot keys AQE can't split): must be
    result-identical to the plain GROUP BY the oracle runs."""
    from hdp2_5_hive2_spark.plans import salted_aggregate

    li = load_tables(spark, sf_dir)["lineitem"].withColumn(
        "l_quantity_dec", F.col("l_quantity").cast("decimal(18,2)")
    )
    out = salted_aggregate(
        li,
        keys=["l_returnflag"],
        aggs={
            "n": ("count", "l_orderkey"),
            "total_d": ("sum", "l_quantity_dec"),
            "mx": ("max", "l_extendedprice"),
        },
        unique_col="l_orderkey",
        n_salts=16,
    )
    return out.select(
        "l_returnflag", "n", F.col("total_d").cast("double").alias("total"), "mx"
    )


@query(
    "subquery_in_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
    FROM orders
    GROUP BY o_custkey
    HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) > (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(DISTINCT o_custkey) FROM orders
    )
    """,
    tags=("subquery", "having", "agg"),
)
def subquery_in_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery inside HAVING (QBSubQuery.java:42 — Hive 2.1 allows
    subqueries in WHERE/HAVING): customers whose total spend exceeds the
    average per-customer spend. The scalar rides a broadcast one-row cross
    join under the post-aggregation filter; exact decimal sums with one
    final double division keep both engines bitwise equal."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
        FROM orders
        GROUP BY o_custkey
        HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) > (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(DISTINCT o_custkey) FROM orders
        )
        """
    )


@query(
    "subquery_correlated_scalar",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
             AS n_orders,
           (SELECT CAST(coalesce(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0)
                        AS DOUBLE)
            FROM orders o WHERE o.o_custkey = c.c_custkey) AS total_spend
    FROM customer c
    WHERE c_custkey <= 100
    """,
    tags=("subquery", "correlated", "scalar"),
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRELATED scalar subqueries in SELECT (beyond Hive 2.1, which allows
    subqueries only in WHERE/HAVING — QBSubQuery.java:40; Spark decorrelates
    them into left outer aggregates): per customer, order count and total
    spend, zero-filled for customers with no orders. Exact decimal sums →
    one final double cast."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment,
               (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
                 AS n_orders,
               (SELECT CAST(coalesce(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0)
                            AS DOUBLE)
                FROM orders o WHERE o.o_custkey = c.c_custkey) AS total_spend
        FROM customer c
        WHERE c_custkey <= 100
        """
    )


@query(
    "qa_constraint_report",
    oracle="""
    SELECT 'orders_pk_unique' AS constraint_name,
           CAST(COALESCE((SELECT SUM(c - 1) FROM (
               SELECT o_orderkey, count(*) AS c FROM orders
               GROUP BY o_orderkey HAVING count(*) > 1)), 0) AS BIGINT)
             AS n_violations,
           CAST((SELECT MIN(o_orderkey) FROM (
               SELECT o_orderkey, count(*) AS c FROM orders
               GROUP BY o_orderkey HAVING count(*) > 1)) AS BIGINT) AS sample_key
    UNION ALL
    SELECT 'orders_custkey_fk',
           CAST(count(*) AS BIGINT),
           CAST(min(o_custkey) AS BIGINT)
    FROM orders WHERE o_custkey IS NOT NULL
      AND o_custkey NOT IN (SELECT c_custkey FROM customer)
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           CAST(count(*) AS BIGINT),
           CAST(min(l_orderkey) AS BIGINT)
    FROM lineitem WHERE l_orderkey IS NOT NULL
      AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    UNION ALL
    SELECT 'lineitem_partkey_fk',
           CAST(count(*) AS BIGINT),
           CAST(min(l_partkey) AS BIGINT)
    FROM lineitem WHERE l_partkey IS NOT NULL
      AND l_partkey NOT IN (SELECT p_partkey FROM part)
    UNION ALL
    SELECT 'lineitem_suppkey_fk',
           CAST(count(*) AS BIGINT),
           CAST(min(l_suppkey) AS BIGINT)
    FROM lineitem WHERE l_suppkey IS NOT NULL
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
    UNION ALL
    SELECT 'orders_orderdate_not_null',
           CAST(count(*) AS BIGINT),
           CAST(min(o_orderkey) AS BIGINT)
    FROM orders WHERE o_orderdate IS NULL
    UNION ALL
    SELECT 'lineitem_quantity_range',
           CAST(count(*) AS BIGINT),
           CAST(min(l_orderkey) AS BIGINT)
    FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
    UNION ALL
    SELECT 'orders_totalprice_positive',
           CAST(count(*) AS BIGINT),
           CAST(min(o_orderkey) AS BIGINT)
    FROM orders WHERE o_totalprice <= 0
    UNION ALL
    SELECT 'warn_high_value_orders',
           CAST(count(*) AS BIGINT),
           CAST(min(o_orderkey) AS BIGINT)
    FROM orders WHERE o_totalprice > 300000
    """,
    tags=("relational", "qa", "constraints"),
)
def qa_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality report (hdp2_5_hive2_spark.qa): uniqueness,
    referential integrity, completeness and row-predicate rules over the
    TPC-H schema in one constraint -> violation-count table — the
    scheduled-audit replacement for Hive 2.1's unenforced constraint
    metadata (constraints landed UNVALIDATED in 2.2, HIVE-13290).
    Per-table predicate checks are single-scan conditional aggregations;
    FK orphans are key-pruned LEFT ANTI joins (broadcast or shuffled-hash
    at AQE's discretion); samples stay aggregates (min key)."""
    from hdp2_5_hive2_spark import qa

    t = load_tables(spark, sf_dir)
    orders, customer, lineitem = t["orders"], t["customer"], t["lineitem"]
    part, supplier = t["part"], t["supplier"]
    checks = [
        qa.check_unique(orders, "o_orderkey", "orders_pk_unique"),
        qa.check_foreign_key(
            orders, "o_custkey", customer, "c_custkey", "orders_custkey_fk"
        ),
        qa.check_foreign_key(
            lineitem, "l_orderkey", orders, "o_orderkey", "lineitem_orderkey_fk"
        ),
        qa.check_foreign_key(
            lineitem, "l_partkey", part, "p_partkey", "lineitem_partkey_fk"
        ),
        qa.check_foreign_key(
            lineitem, "l_suppkey", supplier, "s_suppkey", "lineitem_suppkey_fk"
        ),
        qa.check_not_null(
            orders, "o_orderdate", "o_orderkey", "orders_orderdate_not_null"
        ),
        qa.check_predicate(
            lineitem,
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
            "l_orderkey",
            "lineitem_quantity_range",
        ),
        qa.check_predicate(
            orders,
            F.col("o_totalprice") <= 0,
            "o_orderkey",
            "orders_totalprice_positive",
        ),
        qa.check_predicate(
            orders,
            F.col("o_totalprice") > 300000,
            "o_orderkey",
            "warn_high_value_orders",
        ),
    ]
    return qa.constraint_report(checks)
