"""Table/column statistics — ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS
parity (reference: ql/exec/ColumnStatsTask.java driving the compute_stats
UDAF, FunctionRegistry.java:403 GenericUDAFComputeStats; ndv estimation via
ql/udf/generic/NumDistinctValueEstimator.java).

Spark-first shape: ONE aggregation pass over the table computes every
column's stats simultaneously (count/nulls/min/max/avg-length as plain
aggregates, exact ndv as multi-count-distinct — Catalyst's Expand operator
gives each distinct its own grouping stream, the same partial/final split
Hive's compute_stats reducer performs), then a `stack()` unpivot reshapes
the single wide row into the per-column long form the metastore stores.
Approximate ndv (`approx_ndv_accuracy`) uses Spark's native HyperLogLog++
aggregate — the modern replacement for the reference's FM-sketch estimator —
and cross-checks it against the exact count.

Scale notes: the stats pass is a full scan + partial aggregation (no row
explosion survives the map side for plain aggs; multi-distinct Expand is
|cols|× rows into the shuffle but each stream carries only (value) keys).
At 100 TB one would add sampling or sketch-only mode; exact ndv here mirrors
Hive's `hive.stats.ndv.error=0` exact path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType


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
        aggs.append(F.countDistinct(c).alias(f"{c}__ndv"))
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
    # No repartition fence: the partial aggregates parallelize with the scan
    # (wide by construction at cluster scale), and a round-robin shuffle of
    # the raw rows costs more than the single-task partial on small tables.
    wide = df.select(*dict.fromkeys(cols)).agg(*aggs)
    stack_args = ", ".join(
        "'{c}', {c}__nulls, {c}__ndv, {c}__min_num, {c}__max_num, "
        "{c}__min_str, {c}__max_str, {c}__avg_len".format(c=c)
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_nulls, ndv, min_num, max_num, min_str, max_str, avg_len)",
        "n_rows",
    ).select(
        "column_name", "n_rows", "n_nulls", "ndv",
        "min_num", "max_num", "min_str", "max_str", "avg_len",
    )


def approx_ndv_accuracy(
    df: DataFrame, cols: Sequence[str], tolerance: float = 0.1
) -> DataFrame:
    """(column_name, exact_ndv, sketch_ok) — approximate ndv via Spark's
    HyperLogLog++ (`approx_count_distinct`, default rsd=0.05 — the 0.02
    setting quadruples the register file and measurably slows the partial
    aggregate for no accuracy need at a 10% tolerance) cross-checked against
    the exact distinct count: sketch_ok ⇔ |approx/exact - 1| < tolerance.

    The sketch estimate is deterministic for a given dataset (hash-based,
    merge is a commutative register-max), so the boolean is a stable,
    oracle-checkable assertion of estimator accuracy — the same contract the
    reference's NumDistinctValueEstimator promises ANALYZE TABLE."""
    cols = list(dict.fromkeys(cols))
    if not cols:
        raise ValueError("approx_ndv_accuracy requires at least one column")
    aggs: list = []
    for c in cols:
        aggs.append(F.countDistinct(c).alias(f"{c}__exact"))
        aggs.append(F.approx_count_distinct(c).alias(f"{c}__approx"))
    wide = df.select(*dict.fromkeys(cols)).agg(*aggs)
    stack_args = ", ".join(f"'{c}', {c}__exact, {c}__approx" for c in cols)
    long = wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column_name, exact_ndv, approx_ndv)"
    )
    return long.select(
        "column_name",
        "exact_ndv",
        (
            F.abs(F.col("approx_ndv").cast("double") / F.col("exact_ndv") - F.lit(1.0))
            < F.lit(tolerance)
        ).alias("sketch_ok"),
    )
