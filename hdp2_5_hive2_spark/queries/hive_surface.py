"""Hive-specific query surface: TRANSFORM scripts, LATERAL VIEW, sort
modifiers (DISTRIBUTE/SORT/CLUSTER BY), TABLESAMPLE, virtual columns,
GROUPING__ID, and the MatchPath PTF.

Parity targets (SURVEY.md §2): ScriptOperator (ql/exec/ScriptOperator.java:66
— TRANSFORM ... USING), LateralViewForward/JoinOperator
(ql/exec/LateralViewForwardOperator.java:33), genReduceSinkPlan's
DISTRIBUTE/SORT/CLUSTER BY (parse/SemanticAnalyzer.java:7541), SamplePruner
(ql/optimizer/SamplePruner.java), VirtualColumn.INPUT__FILE__NAME /
GROUPING__ID (ql/metadata/VirtualColumn.java:48-66), MatchPath
(ql/udf/ptf/MatchPath.java).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdp2_5_hive2_spark.catalog import load_tables, register_views
from hdp2_5_hive2_spark.ptf import match_path, match_path_result, symbol_attr
from hdp2_5_hive2_spark.queries.registry import query


@query(
    "transform_script_identity",
    oracle="SELECT n_nationkey, n_name FROM nation",
    tags=("transform", "script", "hive"),
)
def transform_script_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSFORM ... USING 'cat': row-streaming through an external process
    over stdin/stdout with delimited serde (ScriptOperator parity,
    ql/exec/ScriptOperator.java:66). Identity script proves the serde round
    trip; runs on SparkScriptTransformationExec (no Hive dependency)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT TRANSFORM(n_nationkey, n_name) USING 'cat'
               AS (n_nationkey int, n_name string)
        FROM nation
        """
    )


@query(
    "transform_script_sed",
    oracle="SELECT n_nationkey, replace(n_name, 'NATION_', 'N') AS short_name FROM nation",
    tags=("transform", "script", "hive"),
)
def transform_script_sed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSFORM with a real stream edit (sed): the script rewrites the
    second delimited field — proves values, not just bytes, flow through
    the external process."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT TRANSFORM(n_nationkey, n_name) USING 'sed s/NATION_/N/'
               AS (n_nationkey int, short_name string)
        FROM nation
        """
    )


@query(
    "lateral_view_explode",
    oracle="""
    SELECT o.o_orderkey, u.pri_word
    FROM orders o, unnest(string_split(o.o_orderpriority, '-')) AS u(pri_word)
    WHERE o.o_orderkey <= 100
    """,
    tags=("lateral", "udtf", "hive"),
)
def lateral_view_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode(...) — verbatim HiveQL syntax in Spark SQL
    (LateralViewJoinOperator parity, ql/exec/LateralViewJoinOperator.java:76)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, pri_word
        FROM orders
        LATERAL VIEW explode(split(o_orderpriority, '-')) t AS pri_word
        WHERE o_orderkey <= 100
        """
    )


@query(
    "distribute_sort_by",
    oracle="""
    SELECT o_orderstatus, o_orderkey, o_totalprice
    FROM orders WHERE o_orderkey <= 1000
    """,
    tags=("sort", "distribute", "hive"),
)
def distribute_sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY + SORT BY (genReduceSinkPlan parity,
    parse/SemanticAnalyzer.java:7541): hash-partition on o_orderstatus, sort
    within each partition only. The oracle compares order-insensitively —
    the semantic content is the row set plus the per-partition sort, which
    tests/test_hive_surface.py asserts on the plan."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderkey, o_totalprice
        FROM orders WHERE o_orderkey <= 1000
        DISTRIBUTE BY o_orderstatus SORT BY o_orderkey
        """
    )


@query(
    "cluster_by",
    oracle="""
    SELECT c_mktsegment, c_custkey FROM customer WHERE c_custkey <= 500
    """,
    tags=("sort", "cluster", "hive"),
)
def cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER BY = DISTRIBUTE BY + SORT BY on the same columns
    (HiveParser.g:445-447)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, c_custkey FROM customer WHERE c_custkey <= 500
        CLUSTER BY c_mktsegment
        """
    )


@query(
    "tablesample_bucket",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem WHERE l_orderkey % 16 = 0
    """,
    tags=("sample", "hive"),
)
def tablesample_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE (SamplePruner parity, ql/optimizer/SamplePruner.java):
    `TABLESAMPLE(BUCKET 1 OUT OF 16 ON l_orderkey)` compiles to a
    hash-mod predicate, and Hive's hash of an integer column IS the value
    (ObjectInspectorUtils.hashCode), so bucket 1 of 16 on l_orderkey is
    exactly `l_orderkey % 16 = 0` — deterministic and SQL-oracle-checkable
    on both engines (previously used Spark's Murmur3, which no oracle could
    reproduce)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.filter(F.pmod("l_orderkey", F.lit(16)) == 0).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


@query(
    "vc_input_file_name",
    oracle="SELECT 'lineitem.parquet' AS fname, COUNT(*) AS n_rows FROM lineitem",
    tags=("virtual-column", "hive"),
)
def vc_input_file_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INPUT__FILE__NAME virtual column (ql/metadata/VirtualColumn.java:48) →
    input_file_name(): rows grouped by source file basename."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return (
        li.select(F.regexp_extract(F.input_file_name(), r"([^/]+\.parquet)", 1).alias("fname"))
        .groupBy("fname")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@query(
    "groupby_grouping_id",
    oracle="""
    SELECT COALESCE(n_regionkey, -1) AS n_regionkey, n_name,
           CAST(GROUPING(n_regionkey, n_name) AS BIGINT) AS gid,
           COUNT(*) AS n
    FROM nation
    GROUP BY GROUPING SETS ((n_regionkey, n_name), (n_regionkey), ())
    """,
    tags=("grouping", "rollup", "hive"),
)
def groupby_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING__ID virtual column (VirtualColumn.java:66, SemanticAnalyzer
    bitmask gen :3753-3784) → grouping_id(): both Spark and the oracle use
    the leftmost-key-is-MSB convention, so values align bit-for-bit.

    The rolled-up NULL in the integer key is COALESCEd to -1 on both sides:
    a nullable-int column reaches the driver's pandas canon as float64 on
    the DuckDB side but int64/object on Spark's, breaking the dtype-sensitive
    hash (the gid column still disambiguates rollup rows)."""
    nation = load_tables(spark, sf_dir)["nation"]
    return (
        nation.groupingSets(
            [["n_regionkey", "n_name"], ["n_regionkey"], []],
            "n_regionkey",
            "n_name",
        )
        .agg(F.grouping_id().cast("bigint").alias("gid"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("n_regionkey", F.lit(-1)).alias("n_regionkey"), "n_name", "gid", "n"
        )
    )


@query(
    "matchpath_price_runs",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CASE WHEN o_totalprice > 300000 THEN 'HIGH' ELSE 'LOW' END AS sym,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      FROM orders
    ), isl AS (
      SELECT *, rn - row_number() OVER (PARTITION BY o_custkey, sym ORDER BY rn) AS grp
      FROM seq
    ), counted AS (
      SELECT *, COUNT(*) OVER (PARTITION BY o_custkey, sym, grp) AS run_len FROM isl
    )
    SELECT o_custkey, o_orderkey, 'HIGH' AS match_symbol
    FROM counted WHERE sym = 'HIGH' AND run_len >= 2
    """,
    tags=("ptf", "matchpath", "hive"),
)
def matchpath_price_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MatchPath PTF (ql/udf/ptf/MatchPath.java): runs of >= 2 consecutive
    HIGH-value orders per customer, ordered by order key. The oracle is the
    equivalent gaps-and-islands SQL; the PTF generalizes to patterns SQL
    can't express (alternation, bounded quantifiers)."""
    orders = load_tables(spark, sf_dir)["orders"]
    m = match_path(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        partition_by=["o_custkey"],
        order_by=["o_orderkey"],
        symbols={
            "HIGH": F.col("o_totalprice") > 300000,
            "LOW": F.col("o_totalprice") <= 300000,
        },
        pattern="HIGH.HIGH+",
    )
    return m.select("o_custkey", "o_orderkey", "match_symbol")


@query(
    "matchpath_bounded_runs",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderkey,
             CASE WHEN o_totalprice < 50000 THEN 'CHEAP' ELSE 'OTHER' END AS sym,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      FROM orders
    ), isl AS (
      SELECT *, rn - row_number() OVER (PARTITION BY o_custkey, sym ORDER BY rn) AS grp
      FROM seq
    ), runs AS (
      SELECT *,
             COUNT(*) OVER (PARTITION BY o_custkey, sym, grp) AS run_len,
             row_number() OVER (PARTITION BY o_custkey, sym, grp ORDER BY rn) - 1
               AS pos_in_run
      FROM isl
    )
    SELECT o_custkey, o_orderkey,
           CAST(pos_in_run % 3 AS INTEGER) AS match_pos
    FROM runs
    WHERE sym = 'CHEAP' AND run_len >= 2
      AND pos_in_run < run_len - (CASE WHEN run_len % 3 = 1 THEN 1 ELSE 0 END)
    """,
    tags=("ptf", "matchpath", "hive"),
)
def matchpath_bounded_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MatchPath bounded quantifier `CHEAP{2,3}` (ql/udf/ptf/MatchPath.java
    path expressions support {m,n} repetition): greedy non-overlapping
    chunking of each CHEAP run into blocks of 3 (trailing 2 allowed, a
    trailing singleton stays unmatched). The oracle reproduces the greedy
    scan arithmetically over gaps-and-islands run lengths: matched prefix =
    run_len minus 1 iff run_len % 3 == 1, and within the prefix the match
    offset is pos % 3."""
    orders = load_tables(spark, sf_dir)["orders"]
    m = match_path(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        partition_by=["o_custkey"],
        order_by=["o_orderkey"],
        symbols={
            "CHEAP": F.col("o_totalprice") < 50000,
            "OTHER": F.col("o_totalprice") >= 50000,
        },
        pattern="CHEAP{2,3}",
    )
    return m.select("o_custkey", "o_orderkey", "match_pos")


@query(
    "matchpath_skip_to_next_row",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CASE WHEN o_totalprice > 200000 THEN 'HIGH' ELSE 'LOW' END AS sym,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
             lead(o_orderkey)   OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS nk,
             lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS np
      FROM orders
    ),
    starts AS (
      SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY rn) AS mnum
      FROM seq WHERE sym = 'HIGH' AND nk IS NOT NULL
    )
    SELECT o_custkey, o_orderkey,
           CAST(mnum AS INTEGER) AS match_number,
           0 AS match_pos, 'HIGH' AS match_symbol
    FROM starts
    UNION ALL
    SELECT o_custkey, nk AS o_orderkey,
           CAST(mnum AS INTEGER) AS match_number,
           1 AS match_pos,
           CASE WHEN np > 200000 THEN 'HIGH' ELSE 'LOW' END AS match_symbol
    FROM starts
    """,
    tags=("ptf", "matchpath", "hive"),
)
def matchpath_skip_to_next_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MatchPath's native AFTER MATCH SKIP TO NEXT ROW semantics
    (ql/udf/ptf/MatchPath.java execute(): a match attempt starts at EVERY
    input row, so matches overlap — unlike the non-overlapping past-last
    default the other matchpath queries pin). Pattern HIGH.(HIGH|LOW):
    every high-value order followed by any order starts a 2-row match;
    consecutive HIGH rows produce overlapping matches sharing rows. The
    oracle enumerates start rows with lead() and emits both member rows
    per start, with per-customer match numbering in start order.

    100 TB plan: identical to match_path generally — one shuffle on the
    partition key, linear Arrow scan; next_row mode adds one bounded
    regex-match attempt per row, still O(rows)."""
    orders = load_tables(spark, sf_dir)["orders"]
    m = match_path(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        partition_by=["o_custkey"],
        order_by=["o_orderkey"],
        symbols={
            "HIGH": F.col("o_totalprice") > 200000,
            "LOW": F.col("o_totalprice") <= 200000,
        },
        pattern="HIGH.(HIGH|LOW)",
        after_match="next_row",
    )
    return m.select(
        "o_custkey", "o_orderkey", "match_number", "match_pos", "match_symbol"
    )


@query(
    "matchpath_alternation",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderkey,
             CASE WHEN o_totalprice > 300000 THEN 'HIGH'
                  WHEN o_totalprice > 150000 THEN 'MID'
                  ELSE 'LOW' END AS sym,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      FROM orders
    ), nbr AS (
      SELECT *,
             lead(sym) OVER (PARTITION BY o_custkey ORDER BY rn) AS next_sym,
             lag(sym)  OVER (PARTITION BY o_custkey ORDER BY rn) AS prev_sym
      FROM seq
    )
    SELECT o_custkey, o_orderkey, sym AS match_symbol,
           CAST(0 AS INTEGER) AS match_pos
    FROM nbr WHERE sym IN ('HIGH', 'MID') AND next_sym = 'LOW'
    UNION ALL
    SELECT o_custkey, o_orderkey, sym AS match_symbol,
           CAST(1 AS INTEGER) AS match_pos
    FROM nbr WHERE sym = 'LOW' AND prev_sym IN ('HIGH', 'MID')
    """,
    tags=("ptf", "matchpath", "hive"),
)
def matchpath_alternation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MatchPath alternation `(HIGH|MID).LOW` (MatchPath.java path grammar
    supports | groups): a high-or-mid order immediately followed by a low
    one. The second element (LOW) can never start a match and the first
    (HIGH/MID) can never be consumed as a second element, so non-overlapping
    greedy semantics reduce to the lead/lag pair oracle exactly."""
    orders = load_tables(spark, sf_dir)["orders"]
    m = match_path(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        partition_by=["o_custkey"],
        order_by=["o_orderkey"],
        symbols={
            "HIGH": F.col("o_totalprice") > 300000,
            "MID": F.col("o_totalprice") > 150000,
            "LOW": F.col("o_totalprice") <= 150000,
        },
        pattern="(HIGH|MID).LOW",
    )
    return m.select("o_custkey", "o_orderkey", "match_symbol", "match_pos")


@query(
    "matchpath_match_summary",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CASE WHEN o_totalprice > 300000 THEN 'HIGH' ELSE 'LOW' END AS sym,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      FROM orders
    ), isl AS (
      SELECT *, rn - row_number() OVER (PARTITION BY o_custkey, sym ORDER BY rn) AS grp
      FROM seq
    ), runs AS (
      SELECT o_custkey, grp,
             COUNT(*) AS n_orders,
             MIN(o_orderkey) AS first_orderkey,
             MAX(o_orderkey) AS last_orderkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS run_value,
             MIN(rn) AS start_rn
      FROM isl WHERE sym = 'HIGH'
      GROUP BY o_custkey, grp
    )
    SELECT o_custkey,
           CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY start_rn)
                AS INTEGER) AS match_number,
           CAST(n_orders AS BIGINT) AS n_orders,
           first_orderkey, last_orderkey, run_value
    FROM runs WHERE n_orders >= 2
    """,
    tags=("ptf", "matchpath", "hive"),
)
def matchpath_match_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MatchPath result expressions (MatchPath.java resultExprStr surface:
    one output row per match with path aggregates like size(tpath),
    first/last attributes): per-match summary of HIGH runs — row count, span
    keys, summed value. Composed Spark-first: the PTF emits matched rows
    with (match_number, match_pos) and a plain groupBy computes the
    aggregates — the partial-agg/shuffle machinery stays Catalyst's."""
    orders = load_tables(spark, sf_dir)["orders"]
    m = match_path(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        partition_by=["o_custkey"],
        order_by=["o_orderkey"],
        symbols={
            "HIGH": F.col("o_totalprice") > 300000,
            "LOW": F.col("o_totalprice") <= 300000,
        },
        pattern="HIGH.HIGH+",
    )
    return (
        m.groupBy("o_custkey", "match_number")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderkey").alias("first_orderkey"),
            F.max("o_orderkey").alias("last_orderkey"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("run_value"),
        )
        .select(
            "o_custkey", "match_number", "n_orders",
            "first_orderkey", "last_orderkey", "run_value",
        )
    )


@query(
    "matchpath_result_exprs",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CASE WHEN o_totalprice > 300000 THEN 'HIGH' ELSE 'LOW' END AS sym,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
      FROM orders
    ), isl AS (
      SELECT *, rn - row_number() OVER (PARTITION BY o_custkey, sym ORDER BY rn) AS grp
      FROM seq
    ), high_runs AS (
      SELECT o_custkey, grp, MIN(rn) AS start_rn,
             COUNT(*) AS n_high,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS high_sum,
             MAX(o_orderkey) AS last_high_orderkey
      FROM isl WHERE sym = 'HIGH' GROUP BY o_custkey, grp
    ), matches AS (
      -- a LOW.HIGH+ match exists iff the row just before a HIGH island is LOW
      -- (it cannot belong to the previous match, which ends on a HIGH)
      SELECT r.o_custkey, r.start_rn, r.n_high, r.high_sum, r.last_high_orderkey,
             a.o_orderkey AS low_orderkey, a.o_totalprice AS low_price
      FROM high_runs r
      JOIN seq a ON a.o_custkey = r.o_custkey AND a.rn = r.start_rn - 1
                AND a.sym = 'LOW'
    )
    SELECT o_custkey,
           CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY start_rn)
                AS INTEGER) AS match_number,
           CAST(n_high + 1 AS BIGINT) AS n_rows,
           low_orderkey, low_price, high_sum, last_high_orderkey
    FROM matches
    """,
    tags=("ptf", "matchpath", "hive"),
)
def matchpath_result_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MatchPath resultExpr symbol bindings (MatchPath.java:278-346 — the
    final constant-string argument selects ``A.price``-style per-symbol
    attributes into the one-row-per-match output): for each LOW.HIGH+ match,
    the anchor LOW row's orderkey and price, plus sum/last over the
    HIGH-bound rows — via match_path_result + symbol_attr, the API form of
    that surface."""
    orders = load_tables(spark, sf_dir)["orders"]
    return match_path_result(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        partition_by=["o_custkey"],
        order_by=["o_orderkey"],
        symbols={
            "HIGH": F.col("o_totalprice") > 300000,
            "LOW": F.col("o_totalprice") <= 300000,
        },
        pattern="LOW.HIGH+",
        result_exprs={
            "n_rows": F.count(F.lit(1)),
            "low_orderkey": F.min(symbol_attr("LOW", "o_orderkey")),
            "low_price": F.min(symbol_attr("LOW", "o_totalprice")),
            "high_sum": F.sum(
                symbol_attr("HIGH", F.col("o_totalprice").cast("decimal(18,2)"))
            ).cast("double"),
            "last_high_orderkey": F.max(symbol_attr("HIGH", "o_orderkey")),
        },
    )


# ---------------------------------------------------------------------------
# Semantic-drift guards (SURVEY.md §7 risk register): the places Hive and
# other engines disagree — integer division, cast behavior, null ordering.
# Each is pinned by an oracle so drift shows up as a hash mismatch.
# ---------------------------------------------------------------------------


@query(
    "hive_div_semantics",
    oracle="""
    SELECT l_orderkey,
           l_orderkey // 7 AS key_div,
           l_orderkey % 7 AS key_mod,
           CAST(CAST(l_quantity AS BIGINT) AS DOUBLE) / 4 AS qty_ratio
    FROM lineitem WHERE l_orderkey <= 200
    """,
    tags=("semantics", "div", "hive"),
)
def hive_div_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive `div` (integer division, FunctionRegistry.java:308-349) vs `/`
    (always fractional): `expr("a div b")` must floor like Hive/DuckDB `//`,
    while `/` promotes to double."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey,
               l_orderkey div 7 AS key_div,
               l_orderkey % 7 AS key_mod,
               CAST(l_quantity AS BIGINT) / 4 AS qty_ratio
        FROM lineitem WHERE l_orderkey <= 200
        """
    )


@query(
    "hive_cast_semantics",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
           COALESCE(TRY_CAST(o_orderstatus AS INTEGER), -999) AS status_int,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
           CAST(SUBSTR(o_orderpriority, 1, 1) AS INTEGER) AS prio_int
    FROM orders WHERE o_orderkey <= 200
    """,
    tags=("semantics", "cast", "hive"),
)
def hive_cast_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast surface (one registered cast function per type in the reference,
    FunctionRegistry.java:356-372): numeric→string via exact decimal,
    failing string→int as NULL (Hive's permissive cast ≙ try_cast under
    ANSI Spark), date→string ISO format, digit-prefix→int. The failed-cast
    NULL is COALESCEd to a sentinel on both sides: an all-NULL int column
    crosses the two engines' pandas bridges with different dtypes, breaking
    the driver's dtype-sensitive hash."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING) AS price_str,
               COALESCE(TRY_CAST(o_orderstatus AS INT), -999) AS status_int,
               CAST(CAST(o_orderdate AS DATE) AS STRING) AS date_str,
               CAST(SUBSTR(o_orderpriority, 1, 1) AS INT) AS prio_int
        FROM orders WHERE o_orderkey <= 200
        """
    )


@query(
    "hive_null_ordering",
    oracle="""
    SELECT l_orderkey, l_linenumber, q_or_null,
           row_number() OVER (PARTITION BY l_orderkey
                              ORDER BY q_or_null ASC NULLS FIRST, l_linenumber) AS rn
    FROM (
      SELECT l_orderkey, l_linenumber, NULLIF(l_quantity, 1.0) AS q_or_null
      FROM lineitem WHERE l_orderkey <= 100
    ) t
    """,
    tags=("semantics", "nulls", "sort", "hive"),
)
def hive_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive's ASC default puts NULLS FIRST (SURVEY §7 risk register) — same
    as Spark's asc_nulls_first. Pinned by materializing the rank, since the
    driver's comparison is order-insensitive."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, q_or_null,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY q_or_null ASC NULLS FIRST, l_linenumber) AS rn
        FROM (
          SELECT l_orderkey, l_linenumber, NULLIF(l_quantity, 1.0) AS q_or_null
          FROM lineitem WHERE l_orderkey <= 100
        ) t
        """
    )


@query(
    "lateral_view_outer",
    oracle="""
    SELECT o_orderkey, CAST(NULL AS VARCHAR) AS pri_word
    FROM orders WHERE o_orderkey <= 100 AND o_orderkey % 3 = 0
    UNION ALL
    SELECT o.o_orderkey, u.pri_word
    FROM orders o, unnest(string_split(o.o_orderpriority, '-')) AS u(pri_word)
    WHERE o.o_orderkey <= 100 AND o.o_orderkey % 3 <> 0
    """,
    tags=("lateral", "udtf", "hive"),
)
def lateral_view_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW OUTER (FromClauseParser.g:128-136 — the OUTER variant
    emits the source row with NULL generator output when the UDTF produces
    no rows, like a left join against the exploded side). Rows whose array
    is empty (every third order here) must survive with pri_word NULL."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, pri_word
        FROM orders
        LATERAL VIEW OUTER explode(
          CASE WHEN o_orderkey % 3 = 0 THEN array()
               ELSE split(o_orderpriority, '-') END) t AS pri_word
        WHERE o_orderkey <= 100
        """
    )


@query(
    "lateral_view_chained",
    oracle="""
    SELECT o.o_orderkey, u.pri_word, v.n
    FROM orders o,
         unnest(string_split(o.o_orderpriority, '-')) AS u(pri_word),
         unnest([1, 2]) AS v(n)
    WHERE o.o_orderkey <= 50
    """,
    tags=("lateral", "udtf", "hive"),
)
def lateral_view_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED LATERAL VIEWs — each subsequent view explodes against every
    row the previous one produced (HiveQL allows arbitrary chains;
    LateralViewJoinOperator.java:76 composes them as nested forward/join
    pairs). Two views here: priority words × a literal array — the result
    is the per-row cross product, verbatim HiveQL in Spark SQL."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, pri_word, n
        FROM orders
        LATERAL VIEW explode(split(o_orderpriority, '-')) t AS pri_word
        LATERAL VIEW explode(array(1, 2)) s AS n
        WHERE o_orderkey <= 50
        """
    )


@query(
    "hive_char_semantics",
    oracle="""
    WITH x(s) AS (VALUES ('ab'), ('abcde'), ('a b'))
    SELECT rpad(s, 5, ' ') AS c,
           CAST(5 AS INTEGER) AS len_char,
           s AS v,
           CAST(length(s) AS INTEGER) AS len_varchar,
           rtrim(rpad(s, 5, ' ')) = 'ab' AS eq_ab,
           rpad(s, 5, ' ') = 'ab   ' AS eq_ab_padded
    FROM x
    """,
    tags=("hive-surface", "types", "char"),
)
def hive_char_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAR(n)/VARCHAR(n) SEMANTIC DRIFT GUARD (TypeInfoFactory.java:50-51;
    HiveChar/HiveVarchar): a parquet TABLE with CHAR(5)/VARCHAR(5) columns
    read back must show Hive's contract — CHAR blank-pads to n on read
    (length 5 even for 'ab'), comparisons are trailing-space-insensitive
    ('ab   ' = 'ab' is TRUE because the shorter side pads), VARCHAR keeps
    the actual length. The oracle hand-builds the same contract with
    rpad/rtrim since DuckDB's CHAR is a plain VARCHAR alias. Known
    divergence, documented here: on OVERLONG insert Hive 2.1 silently
    truncates, Spark raises EXCEED_LIMIT_LENGTH — the strict behavior is
    kept deliberately (silent truncation loses data; tests pin the
    error)."""
    # drop_table also clears an orphaned managed location left by a crashed
    # earlier session (a fresh in-memory catalog can't see it, and CREATE
    # refuses to reuse the directory).
    from hdp2_5_hive2_spark.storage.writer import drop_table

    drop_table(spark, "_hive_char_semantics")
    spark.sql(
        "CREATE TABLE _hive_char_semantics (c CHAR(5), v VARCHAR(5)) USING parquet"
    )
    spark.sql(
        "INSERT INTO _hive_char_semantics VALUES "
        "('ab', 'ab'), ('abcde', 'abcde'), ('a b', 'a b')"
    )
    return spark.sql(
        """
        SELECT c, length(c) AS len_char, v, length(v) AS len_varchar,
               c = 'ab' AS eq_ab, c = 'ab   ' AS eq_ab_padded
        FROM _hive_char_semantics
        """
    )
