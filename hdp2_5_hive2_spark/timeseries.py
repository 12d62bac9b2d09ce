"""Time-series operators: as-of (point-in-time) join.

The reference has no as-of join (Hive 2.1 predates it everywhere); this is
part of the large-pipeline extension surface — feature attribution,
point-in-time-correct feature lookup, click→purchase joining — where an
equi+inequality join is the natural spec but a terrible plan.

Scale design: the textbook formulation (`l JOIN r ON l.k = r.k AND r.ts <=
l.ts` + max-per-row) explodes to |matches| rows per left row before
aggregation. Instead both inputs are UNIONed, shuffled ONCE on the key, and
sorted by (ts, side); a running `last(..., ignorenulls=True)` over an
unbounded-preceding window carries the most recent right-side row forward
into each left row — the classic sorted-merge as-of join expressed in pure
Catalyst window algebra. Cost: one shuffle + one in-partition sort, output
exactly |left| rows. Right rows sort BEFORE left rows at equal timestamps,
so the match condition is `right_ts <= left_ts` (ASOF's `>=` convention).
Per-key skew is per-entity event volume — naturally bounded; AQE handles
the residue.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "_asof_side"  # 0 = right (sorts first at ts ties), 1 = left


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the closest right row of the same key:
    direction='backward' (default) takes the LATEST right row with
    ``right_ts <= left_ts`` (DuckDB ASOF JOIN / pandas `merge_asof`
    semantics); direction='forward' takes the EARLIEST right row with
    ``right_ts >= left_ts`` (the same scan run in reverse time order).
    Returns all left columns plus ``asof_ts`` (the matched right timestamp)
    and the requested ``right_cols`` (prefixed ``r_``).

    how='inner' drops unmatched left rows; how='left' keeps them with NULLs.

    The matched right row is carried as ONE struct — a per-column
    `last(ignorenulls)` carry would silently stitch values from different
    right rows whenever a right column is NULL in the most recent row.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join: how must be 'inner' or 'left', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join: direction must be 'backward' or 'forward', got {direction!r}"
        )
    on = list(on)
    right_cols = list(right_cols)

    left_payload = [c for c in left.columns if c not in on and c != left_ts]
    r_struct = F.struct(
        F.col(right_ts).alias("asof_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
    )
    r_struct_type = right.select(r_struct.alias("_r")).schema["_r"].dataType

    l_side = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias(_TAG),
        *left_payload,
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_side = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias(_TAG),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        r_struct.alias("_r"),
    )
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_side.unionByName(r_side).withColumn(
        "_m", F.last("_r", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col(_TAG) == 1).select(
        *on,
        F.col("_ts").alias(left_ts),
        *left_payload,
        F.col("_m.asof_ts").alias("asof_ts"),
        *[F.col(f"_m.r_{c}").alias(f"r_{c}") for c in right_cols],
    )
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    return out


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Nearest-neighbor as-of: for every left row, the right row minimizing
    |right_ts - left_ts|; equidistant ties go to the EARLIER right row
    (pandas merge_asof direction='nearest' convention).

    Same union/carry machinery as asof_join, but BOTH directions are
    carried over the same shuffled frame — an ascending and a descending
    sorted window on one exchange — and a per-row conditional picks the
    closer side. No rejoin, so duplicate (key, ts) left rows are handled
    naturally; cost is one shuffle + two in-partition sorts.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join_nearest: how must be 'inner' or 'left', got {how!r}")
    on = list(on)
    right_cols = list(right_cols)

    left_payload = [c for c in left.columns if c not in on and c != left_ts]
    r_struct = F.struct(
        F.col(right_ts).alias("asof_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
    )
    r_struct_type = right.select(r_struct.alias("_r")).schema["_r"].dataType
    l_side = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias(_TAG),
        *left_payload,
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_side = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias(_TAG),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        r_struct.alias("_r"),
    )
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").desc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_side.unionByName(r_side)
        .withColumn("_mb", F.last("_r", ignorenulls=True).over(w_back))
        .withColumn("_mf", F.last("_r", ignorenulls=True).over(w_fwd))
    )
    ts_long = (
        (lambda c: c.cast("long"))
        if dict(left.dtypes)[left_ts] in ("bigint", "int", "long")
        else F.unix_micros
    )
    bt, ft = F.col("_mb.asof_ts"), F.col("_mf.asof_ts")
    take_back = ft.isNull() | (
        bt.isNotNull() & ((ts_long(F.col("_ts")) - ts_long(bt)) <= (ts_long(ft) - ts_long(F.col("_ts"))))
    )
    m = F.when(take_back, F.col("_mb")).otherwise(F.col("_mf"))
    out = carried.filter(F.col(_TAG) == 1).select(
        *on,
        F.col("_ts").alias(left_ts),
        *left_payload,
        m.getField("asof_ts").alias("asof_ts"),
        *[m.getField(f"r_{c}").alias(f"r_{c}") for c in right_cols],
    )
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    return out


def state_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    state_col: str,
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """SCD-Type-2 style interval build: collapse an event stream into
    per-key state-validity intervals — consecutive rows with the SAME state
    merge into one interval whose `valid_to` is the next interval's start
    (NULL for the current/open interval). The batch version of the
    change-data-capture history table the reference's UPDATE/ACID surface
    feeds (UpdateDeleteSemanticAnalyzer.java:52); here built from an
    append-only event log, which is the form that survives at 100 TB.

    Output: key..., state, valid_from, valid_to, n_events.

    Plan: gaps-and-islands via change-flag + running sum — `lag(state)`
    detects state changes and a running `sum` numbers the islands, both
    over the SAME (key)-partitioned window, so the whole detection runs in
    ONE shuffle + one in-partition sort (the row_number-difference trick
    would partition a second window by (key, state) and pay a second
    Exchange). One bounded groupBy collapses islands, and `lead` over the
    per-key interval sequence (interval count << event count) closes the
    intervals. Per-key ordering is per-entity event volume — naturally
    bounded."""
    keys = list(key_cols)
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w_all = Window.partitionBy(*keys).orderBy(*order)
    chg = F.when(
        F.lag(state_col).over(w_all).isNull()
        | (F.lag(state_col).over(w_all) != F.col(state_col)),
        1,
    ).otherwise(0)
    w_run = w_all.rowsBetween(Window.unboundedPreceding, 0)
    islands = (
        df.withColumn("_isl", F.sum(chg).over(w_run))
        .groupBy(*keys, state_col, "_isl")
        .agg(
            F.min(ts_col).alias("valid_from"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    w_seq = Window.partitionBy(*keys).orderBy(F.col("valid_from").asc())
    return islands.select(
        *keys,
        state_col,
        "valid_from",
        F.lead("valid_from").over(w_seq).alias("valid_to"),
        "n_events",
    )
