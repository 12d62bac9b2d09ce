"""Bucketed range join: `left.v BETWEEN right.lo AND right.hi` as an
equi-join.

Catalyst compiles a bare inequality join to BroadcastNestedLoopJoin (or a
cartesian product when neither side broadcasts) — O(|L|·|R|) comparisons,
the classic scale cliff for banding/binning joins. This operator
discretizes the number line into fixed-width buckets: each right range
explodes into the buckets it covers, each left value maps to exactly one
bucket, and the match becomes an equi-join on the bucket id followed by the
exact BETWEEN filter. Shuffle keys are bucket ids (uniform when values
are); per-range fan-out is bounded by range_width / bucket_width + 1, so
pick `bucket_width` near the typical range width.

This is the standard interval-bucketing rewrite (the same shape Spark's
streaming interval joins and warehouse range-join hints use); results are
exactly the BETWEEN semantics — bucketing only prunes candidate pairs,
never changes them. Overlapping ranges are fine: a value matching k ranges
emits k rows, each found in the single bucket that contains the value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "_range_bucket"


def bucketed_range_join(
    left: DataFrame,
    value_col: str,
    right: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to every right row with
    ``right.lo_col <= left.value_col <= right.hi_col`` (inclusive BETWEEN),
    via fixed-width bucket equi-join. Returns left columns + right columns.

    how='left' additionally keeps left rows matching no range (right
    columns NULL) — the inner candidate set anti-joined back against the
    left side, still no nested loop anywhere.
    """
    if how not in ("inner", "left"):
        raise ValueError("bucketed_range_join: how must be 'inner' or 'left'")
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    l_b = left.withColumn(_BUCKET, F.floor(F.col(value_col) / F.lit(w)).cast("bigint"))
    r_b = right.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)).cast("bigint"),
                F.floor(F.col(hi_col) / F.lit(w)).cast("bigint"),
            )
        ),
    )
    inner = (
        l_b.join(r_b, _BUCKET)
        .where(F.col(value_col).between(F.col(lo_col), F.col(hi_col)))
        .drop(_BUCKET)
    )
    if how == "inner":
        return inner
    unmatched = left.join(inner.select(*left.columns), left.columns, "left_anti")
    for c in right.columns:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    return inner.unionByName(unmatched)


def bucketed_interval_join(
    left: DataFrame,
    l_lo: str,
    l_hi: str,
    right: DataFrame,
    r_lo: str,
    r_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Interval overlap join: every (left, right) pair with
    ``l_lo <= r_hi AND r_lo <= l_hi`` (inclusive overlap), as a bucket
    equi-join. Both sides explode into the fixed-width buckets their
    interval covers; overlapping pairs necessarily co-occur in the bucket
    containing ``max(l_lo, r_lo)``, and emitting ONLY from that bucket
    dedupes pairs that share several buckets without a distinct(). Column
    names must be disjoint between the two inputs; bounds must be numeric
    (convert timestamps with unix_micros first).

    Scale: shuffle keys are buckets; fan-out per interval is
    interval_width / bucket_width + 1 — pick bucket_width near the typical
    interval width. No nested loop at any size.
    """
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint; shared: {sorted(overlap)}")

    def burst(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            _BUCKET,
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / F.lit(w)).cast("bigint"),
                    F.floor(F.col(hi) / F.lit(w)).cast("bigint"),
                )
            ),
        )

    joined = burst(left, l_lo, l_hi).join(burst(right, r_lo, r_hi), _BUCKET)
    return (
        joined.where(
            (F.col(l_lo) <= F.col(r_hi))
            & (F.col(r_lo) <= F.col(l_hi))
            & (F.col(_BUCKET) == F.floor(F.greatest(F.col(l_lo), F.col(r_lo)) / F.lit(w)).cast("bigint"))
        )
        .drop(_BUCKET)
    )
