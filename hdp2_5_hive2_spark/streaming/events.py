"""Event-time windowing over the `events` table — batch + Structured Streaming.

The reference has no stream processing (SURVEY.md §2.11): Hive 2.1's
"streaming" is transactional ingest (hcatalog/streaming HiveEndPoint →
TransactionBatch ACID deltas). The idiomatic Spark replacement is Structured
Streaming: readStream → withWatermark → window()/session_window() aggregates.
Each batch operator here has a streaming twin so the same semantics run in
both modes; the batch forms are DuckDB-oracle-checked, the streaming forms
are covered by tests that compare a file-sourced stream's final result to
the batch result (exactly-once at the sink).

Scale: windowed aggregation shuffles on (window, keys); watermark bounds
state. At 100 TB/day the pattern holds — partition the source by arrival
hour, keep watermark delay ≥ max disorder, and let AQE size reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdp2_5_hive2_spark.catalog import load_tables


def tumbling_counts_batch(spark: SparkSession, sf_dir: str, width: str = "10 minutes") -> DataFrame:
    """Tumbling event-time window: count + exact sum(value) per (window, type)."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sliding_counts_batch(
    spark: SparkSession, sf_dir: str, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Sliding window (width 10m, slide 5m): every event lands in 2 windows."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def sessionize_batch(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 5
) -> DataFrame:
    """Gap-based sessionization per user (session_window batch equivalent,
    expressed with lag + running sum so it is exactly SQL-oracle-checkable).

    A new session starts when the gap to the previous event exceeds
    `gap_minutes`. Output: per-session id/user/bounds/count."""
    ev = load_tables(spark, sf_dir)["events"]
    return sessionize_df(ev, gap_minutes=gap_minutes)


def session_ids(ev: DataFrame, gap_minutes: int = 5) -> DataFrame:
    """Per-event session assignment: the input frame plus a ``session_seq``
    column (1-based per user, gap-based).

    Gap comparison uses unix_micros — full timestamp precision. unix_timestamp
    truncates to whole seconds, which silently mis-classifies any gap within
    1 s of the threshold (e.g. 300.5 s vs a 300 s gap); session_window and the
    fractional-epoch oracle both use sub-second precision, so we must too."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    with_flag = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return with_flag.withColumn(
        "session_seq", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0))
    ).drop("new_session")


def sessionize_df(ev: DataFrame, gap_minutes: int = 5) -> DataFrame:
    """Sessionize an arbitrary (user_id, event_id, ts, ...) frame into one
    row per session (see session_ids for the assignment semantics)."""
    return (
        session_ids(ev, gap_minutes)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def stream_events(
    spark: SparkSession,
    source_dir: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over parquet event files (the Structured Streaming
    ingest path; exactly-once with checkpoints at a real sink)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def streaming_tumbling_counts(
    events_stream: DataFrame,
    width: str = "10 minutes",
    watermark: str = "15 minutes",
) -> DataFrame:
    """Streaming twin of tumbling_counts_batch: watermark bounds late data and
    state size; append-mode emits each window once it is final."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def streaming_dedup(events_stream: DataFrame, watermark: str = "15 minutes") -> DataFrame:
    """Streaming exactly-once dedup on event_id within the watermark horizon."""
    return events_stream.withWatermark("ts", watermark).dropDuplicates(["event_id", "ts"])


def click_purchase_join_batch(
    spark: SparkSession, sf_dir: str, window_minutes: int = 10
) -> DataFrame:
    """Batch twin of the stream-stream interval join: each purchase matched
    with the same user's clicks in the preceding `window_minutes`. The
    time-range predicate is what makes the streaming form's state bounded
    (each side can discard rows older than watermark + window)."""
    ev = load_tables(spark, sf_dir)["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("c_ts"))
            <= window_minutes * 60 * 1_000_000
        ),
    )
    return joined.select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("micros_before"),
    )


def streaming_click_purchase_join(
    clicks_stream: DataFrame,
    purchases_stream: DataFrame,
    window_minutes: int = 10,
    watermark: str = "15 minutes",
) -> DataFrame:
    """Stream-stream inner interval join (the Structured Streaming shape the
    batch twin above oracle-checks): both sides watermarked, join condition
    equality on user + a bounded time range, so Spark can GC each side's
    state once the watermark passes the range bound.

    At scale: state per side ≈ (watermark + window) of data hashed by
    user_id; no unbounded buffering. Append output emits a match once both
    inputs' watermarks clear it."""
    c = clicks_stream.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases_stream.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    joined = c.join(
        p,
        F.expr(
            "c_user = p_user AND c_ts <= p_ts "
            f"AND p_ts <= c_ts + interval {window_minutes} minutes"
        ),
    )
    return joined.select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("micros_before"),
    )


def idempotent_parquet_sink(path: str):
    """foreachBatch writer that is idempotent under micro-batch replay.

    Structured Streaming guarantees foreachBatch sees each (batch_df,
    batch_id) at-least-once; after a failure the SAME batch_id is replayed.
    Writing each batch under a `_batch_id` partition with dynamic partition
    overwrite makes the replay overwrite its own earlier (possibly partial)
    output instead of appending duplicates — end-to-end exactly-once to a
    plain parquet sink, the Spark counterpart of the reference's ACID
    TransactionBatch ingest (hcatalog streaming; SURVEY.md §2.11).

    Scale: one partition directory per micro-batch, no global locks; readers
    see committed batches only (parquet job commit is atomic per partition).
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(path)
        )

    return write


def stateful_user_totals(
    events_stream: DataFrame,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): running
    per-user totals maintained in state and re-emitted on every trigger that
    touches the user.

    This is the engine's arbitrary-stateful-processing surface — the Spark
    analogue of what the reference could only do with ACID upserts plus a
    re-read (SURVEY.md §2.11). State is one row per user (n_events,
    total_value); the watermark lets the store GC idle users via event-time
    timeout at real scale.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("total", DoubleType())]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_asof_click_enrich(
    events_stream: DataFrame,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermark-correct STREAMING as-of join (the streaming twin of
    timeseries.asof_join): every purchase is enriched with the user's
    latest click at-or-before it, tolerating out-of-order arrival.

    Unlike a processing-time "latest click seen so far" (wrong whenever a
    click arrives after a later purchase), this buffers per-user state and
    emits a purchase only once the event-time watermark has passed its
    timestamp — at that point no on-time click at or before the purchase
    can still arrive, so the match is final. State per user:
      - clicks: (ts_us, event_id) kept sorted; pruned to the latest click
        at-or-below the watermark plus everything newer (older clicks can
        never win another match),
      - pending purchases awaiting their watermark.
    An event-time timeout re-invokes idle users so pending purchases flush
    when the watermark advances without new events for that user (Spark
    runs no-data micro-batches for exactly this). Purchases newer than the
    final watermark stay pending — correct streaming semantics (the stream
    cannot know the source is exhausted).

    Correctness contract is the standard watermark guarantee: results equal
    the batch as-of join for every emitted purchase PROVIDED event-time
    disorder is bounded by the watermark delay — rows arriving later than
    the watermark are dropped by the engine before reaching state, exactly
    as in windowed aggregation (the late-drop test pins that behavior).

    Output: (user_id, purchase_id, click_id NULL-able, gap_us NULL-able),
    emitted exactly once per purchase.
    """
    import bisect

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("purchase_id", LongType()),
            StructField("click_id", LongType()),
            StructField("gap_us", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("click_ts", ArrayType(LongType())),
            StructField("click_id", ArrayType(LongType())),
            StructField("pend_ts", ArrayType(LongType())),
            StructField("pend_id", ArrayType(LongType())),
        ]
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            c_ts, c_id, p_ts, p_id = (list(x) for x in state.get)
        else:
            c_ts, c_id, p_ts, p_id = [], [], [], []
        for pdf in pdfs:
            if not len(pdf):
                continue
            # robust to the Arrow bridge handing datetime64[ns] or [us]
            ts_us = pdf["ts"].values.astype("datetime64[us]").astype("int64").tolist()
            for t, eid, typ in zip(ts_us, pdf["event_id"], pdf["event_type"]):
                if typ == "click":
                    i = bisect.bisect_left(c_ts, t)
                    c_ts.insert(i, t)
                    c_id.insert(i, int(eid))
                elif typ == "purchase":
                    i = bisect.bisect_left(p_ts, t)
                    p_ts.insert(i, t)
                    p_id.insert(i, int(eid))
        wm_us = state.getCurrentWatermarkMs() * 1000
        rows = []
        n_emit = bisect.bisect_right(p_ts, wm_us)
        for t, pid in zip(p_ts[:n_emit], p_id[:n_emit]):
            j = bisect.bisect_right(c_ts, t) - 1
            if j >= 0:
                rows.append((int(key[0]), pid, c_id[j], t - c_ts[j]))
            else:
                rows.append((int(key[0]), pid, None, None))
        p_ts, p_id = p_ts[n_emit:], p_id[n_emit:]
        # prune clicks: keep the newest one at-or-below the watermark + rest
        keep_from = max(bisect.bisect_right(c_ts, wm_us) - 1, 0)
        c_ts, c_id = c_ts[keep_from:], c_id[keep_from:]
        state.update((c_ts, c_id, p_ts, p_id))
        # wake this key after the watermark next advances, to flush pendings
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "purchase_id", "click_id", "gap_us"]
            )

    return (
        events_stream.filter(F.col("event_type").isin("click", "purchase"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def ohlc_bars_batch(spark: SparkSession, sf_dir: str, width: str = "1 hour") -> DataFrame:
    """Batch OHLC downsampling over event-time windows (the shared kernel
    behind the events_ohlc_bars corpus query): one hash aggregate with
    min_by/max_by keyed on the (ts, event_id) struct."""
    ev = load_tables(spark, sf_dir)["events"]
    return _ohlc_agg(ev.groupBy(F.window("ts", width).alias("w"), "event_type"))


def _ohlc_agg(grouped) -> DataFrame:
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    return grouped.agg(
        F.min_by("value", ordkey).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", ordkey).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    ).select(
        F.col("w.start").alias("bar_start"),
        "event_type",
        "open",
        "high",
        "low",
        "close",
        "n_ticks",
    )


def streaming_ohlc_bars(
    events_stream: DataFrame,
    width: str = "1 hour",
    watermark: str = "15 minutes",
) -> DataFrame:
    """Streaming twin of ohlc_bars_batch: min_by/max_by are declarative
    aggregates, so Structured Streaming maintains per-window candidate
    (open, close) pairs incrementally across micro-batches — each trigger
    merges its partial bar into state exactly like the batch partial+final
    aggregation, and the watermark bounds both late data and state size.
    No custom stateful operator needed: the same one-aggregate shape runs
    batch and streaming."""
    return _ohlc_agg(
        events_stream.withWatermark("ts", watermark).groupBy(
            F.window("ts", width).alias("w"), "event_type"
        )
    )


def streaming_gap_fill_locf(
    events_stream: DataFrame,
    watermark: str = "15 minutes",
) -> DataFrame:
    """Watermark-correct STREAMING gap filling with LOCF — the streaming
    twin of events_gap_fill_locf (TimescaleDB's gapfill+locf done with
    Structured Streaming state): per series, emit one row for EVERY whole
    minute from the series' first observation onward — observed minutes
    carry their last value (ts, event_id tiebreak), empty minutes carry
    the previous value forward with filled=1 — even when no event arrives
    in a minute (the case plain windowed aggregation cannot emit).

    A minute m is final once the event-time watermark passes its end: no
    on-time event inside m can still arrive, so its fill decision is
    permanent — the row emits exactly once (append mode). State per
    series: the observation buffer (pruned to the newest at-or-below the
    emit frontier plus everything newer) and the next minute to emit; an
    event-time timeout re-invokes idle series so minutes keep emitting as
    the watermark advances through quiet periods (Spark's no-data
    micro-batches drive this). At scale state is O(disorder window) per
    series, the same bound the watermark already imposes."""
    import bisect

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    MIN_US = 60_000_000
    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("minute_us", LongType()),
            StructField("value_locf", DoubleType()),
            StructField("filled", IntegerType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("obs_ts", ArrayType(LongType())),
            StructField("obs_eid", ArrayType(LongType())),
            StructField("obs_val", ArrayType(DoubleType())),
            StructField("next_minute", LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            o_ts, o_eid, o_val, next_min = state.get
            o_ts, o_eid, o_val = list(o_ts), list(o_eid), list(o_val)
        else:
            o_ts, o_eid, o_val, next_min = [], [], [], None
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts_us = pdf["ts"].values.astype("datetime64[us]").astype("int64").tolist()
            for t, eid, v in zip(ts_us, pdf["event_id"], pdf["value"]):
                i = bisect.bisect_left(o_ts, t)
                # keep (ts, eid) sorted; equal-ts entries order by eid
                while i < len(o_ts) and o_ts[i] == t and o_eid[i] < int(eid):
                    i += 1
                o_ts.insert(i, t)
                o_eid.insert(i, int(eid))
                o_val.insert(i, float(v))
        if next_min is None and o_ts:
            next_min = (o_ts[0] // MIN_US) * MIN_US
        wm_us = state.getCurrentWatermarkMs() * 1000
        rows = []
        while next_min is not None and next_min + MIN_US <= wm_us:
            # last observation strictly before the minute's end
            j = bisect.bisect_left(o_ts, next_min + MIN_US) - 1
            if j >= 0:
                in_minute = o_ts[j] >= next_min
                rows.append(
                    (key[0], next_min, o_val[j], 0 if in_minute else 1)
                )
            next_min += MIN_US
        # prune: the newest obs at-or-below the emit frontier still carries
        if next_min is not None:
            keep_from = max(bisect.bisect_left(o_ts, next_min) - 1, 0)
            o_ts, o_eid, o_val = o_ts[keep_from:], o_eid[keep_from:], o_val[keep_from:]
        state.update((o_ts, o_eid, o_val, next_min))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        if rows:
            yield pd.DataFrame(
                rows, columns=["event_type", "minute_us", "value_locf", "filled"]
            )

    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
