"""Structured Streaming twins must equal their batch counterparts: run the
events table through a file-source stream (multiple triggers) into a memory
sink and compare with the batch result — the exactly-once guarantee the
reference gets from ACID ingest (SURVEY.md §2.11), done the Spark way."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hdp2_5_hive2_spark.catalog import load_tables
from hdp2_5_hive2_spark.streaming import events as ev
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_files(spark):
    """Split sf0.001 events into 4 parquet files (µs timestamps) so the file
    source delivers multiple triggers."""
    tmp = Path(tempfile.mkdtemp(prefix="events_stream_"))
    df = load_tables(spark, SF_SMOKE)["events"]
    df.repartition(4).write.mode("overwrite").parquet(str(tmp / "in"))
    yield str(tmp / "in"), df.schema
    shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_tumbling_equals_batch(spark, event_files):
    src, schema = event_files
    stream = ev.stream_events(spark, src, schema, max_files_per_trigger=1)
    agg = ev.streaming_tumbling_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    # batch twin over the same files
    batch_df = spark.read.schema(schema).parquet(src)
    want = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in (
            batch_df.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
            )
            .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
        ).collect()
    }
    assert got == want


def test_streaming_dedup_drops_replayed_batch(spark, event_files):
    """Replay the same file twice through dropDuplicates — row count must
    equal the distinct count, not double."""
    src, schema = event_files
    stream = ev.stream_events(spark, src, schema, max_files_per_trigger=2)
    dedup = ev.streaming_dedup(stream)
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT COUNT(*) AS n FROM dedup_test").collect()[0].n
    want = spark.read.schema(schema).parquet(src).dropDuplicates(["event_id", "ts"]).count()
    assert n == want


def test_streaming_session_window(spark, event_files):
    """Native session_window aggregation runs in streaming mode and yields the
    same number of (user, session) groups as the batch lag/cumsum formulation."""
    src, schema = event_files
    stream = ev.stream_events(spark, src, schema, max_files_per_trigger=4)
    sess = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        sess.writeStream.outputMode("complete")
        .format("memory")
        .queryName("session_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT COUNT(*) AS n FROM session_test").collect()[0].n
    want = ev.sessionize_batch(spark, SF_SMOKE, gap_minutes=5).count()
    assert got == want


def test_stateful_user_totals_matches_batch(spark, event_files):
    """applyInPandasWithState keeps running per-user totals across triggers;
    the LAST emitted row per user must equal the batch aggregate."""
    src, schema = event_files
    stream = ev.stream_events(spark, src, schema, max_files_per_trigger=1)
    totals = ev.stateful_user_totals(stream)
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode appends one row per (trigger, user); the final state is the
    # row with the max n_events per user
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in spark.sql(
            """
            SELECT user_id, n_events, total_value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
              FROM stateful_test) WHERE rn = 1
            """
        ).collect()
    }
    want = {
        r.user_id: (r.n, round(r.total, 6))
        for r in spark.read.schema(schema)
        .parquet(src)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0], (u, got[u], want[u])
        assert abs(got[u][1] - want[u][1]) < 1e-6


def test_stream_static_join_matches_batch(spark, event_files):
    """Stream-static join: the streaming side joins a static dimension
    (region-coded users) and aggregates; result equals the batch join."""
    src, schema = event_files
    static_dim = spark.createDataFrame(
        [(i, f"grp_{i % 3}") for i in range(200)], "user_id long, grp string"
    )
    stream = ev.stream_events(spark, src, schema, max_files_per_trigger=2)
    joined = (
        stream.join(static_dim, "user_id")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        joined.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ss_join_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.grp: r.n for r in spark.sql("SELECT * FROM ss_join_test").collect()}
    want = {
        r.grp: r.n
        for r in spark.read.schema(schema)
        .parquet(src)
        .join(static_dim, "user_id")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_foreachbatch_idempotent_sink_survives_replay(spark, event_files):
    """Exactly-once to a parquet sink via foreachBatch + per-batch dynamic
    partition overwrite: after the stream completes, REPLAYING a batch (same
    batch_id, as Spark does after a failure) must not change the sink's
    contents."""
    src, schema = event_files
    out = tempfile.mkdtemp(prefix="idem_sink_") + "/out"
    sink = ev.idempotent_parquet_sink(out)
    stream = ev.stream_events(spark, src, schema, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", out + "_ckpt")
        .start()
    )
    q.awaitTermination(120)
    want = spark.read.schema(schema).parquet(src).count()
    first = spark.read.parquet(out)
    assert first.count() == want
    n_batches = first.select("_batch_id").distinct().count()
    assert n_batches >= 2  # maxFilesPerTrigger=1 over 4 files → multiple batches

    # simulate the at-least-once replay: re-deliver batch 0's data with the
    # same batch_id; the dynamic overwrite must replace, not append
    replay_df = spark.read.schema(schema).parquet(src).limit(50)
    sink(replay_df, 0)
    after = spark.read.parquet(out)
    assert after.select("_batch_id").distinct().count() == n_batches
    assert after.filter(F.col("_batch_id") == 0).count() == 50
    shutil.rmtree(Path(out).parent, ignore_errors=True)


def test_watermark_drops_late_event(spark):
    """Watermark semantics: an event later than the watermark delay is
    dropped from an append-mode windowed aggregate; on-time windows emit
    exactly once with the late row excluded."""
    import os
    import pandas as pd

    tmp = Path(tempfile.mkdtemp(prefix="late_events_"))
    src = tmp / "in"
    src.mkdir()

    def write_file(name: str, rows: list[tuple[str, str]], mtime: int) -> None:
        pdf = pd.DataFrame(
            {"user_id": [u for u, _ in rows],
             "ts": pd.to_datetime([t for _, t in rows])}
        )
        p = str(src / name)
        pdf.to_parquet(p, index=False, coerce_timestamps="us")
        os.utime(p, (mtime, mtime))

    # The aggregation operator applies the watermark with a one-batch lag
    # (the value computed from batch N's data takes effect in batch N+2's
    # late filter; empirically verified on this Spark), so the late row goes
    # in a THIRD file: by then [12:00,12:10) has been emitted and evicted,
    # and the row must be dropped rather than resurrect the window.
    write_file(
        "f1.parquet",
        [("u1", "2026-01-01 12:00:00"), ("u1", "2026-01-01 12:01:00"),
         ("u1", "2026-01-01 12:30:00")],
        mtime=1_700_000_000,
    )
    write_file("f2.parquet", [("u1", "2026-01-01 12:50:00")], mtime=1_700_000_100)
    write_file(
        "f3.parquet",
        [("u1", "2026-01-01 12:00:30"), ("u1", "2026-01-01 13:00:00")],
        mtime=1_700_000_200,
    )

    stream = (
        spark.readStream.schema("user_id string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("string").alias("ws"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_drop_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    got = {r.ws: r.n for r in spark.sql("SELECT * FROM late_drop_test").collect()}
    # late 12:00:30 dropped by the watermark (counted in the metric, absent
    # from the emitted [12:00,12:10) window, which appears exactly once);
    # [12:30,12:40) finalized by the closing no-data batch; the 12:50 and
    # 13:00 windows never finalize → absent
    assert dropped == 1, q.recentProgress
    assert got == {"2026-01-01 12:00:00": 2, "2026-01-01 12:30:00": 1}, got
    shutil.rmtree(tmp, ignore_errors=True)


def test_sessionize_subsecond_gap_boundary(spark):
    """Gaps within 1 s of the threshold must classify by FULL timestamp
    precision: 300.5 s > 300 s starts a new session even though whole-second
    truncation (unix_timestamp) would see exactly 300 and keep the session.
    Also pins the strict inequality at exactly 300.0 s (same session) and
    agreement with the native session_window operator on the same frame."""
    from datetime import datetime, timedelta

    t0 = datetime(2026, 1, 1, 0, 0, 0)
    ts = [
        t0,
        t0 + timedelta(seconds=299.5),            # same session (< gap)
        t0 + timedelta(seconds=299.5 + 300.0),    # same session (== gap, strict >)
        t0 + timedelta(seconds=299.5 + 300.0 + 300.5),  # NEW session (> gap)
    ]
    df = spark.createDataFrame(
        [("u1", i, t) for i, t in enumerate(ts)], "user_id string, event_id int, ts timestamp"
    )
    sessions = sorted(
        (r.session_seq, r.n_events) for r in ev.sessionize_df(df, gap_minutes=5).collect()
    )
    assert sessions == [(1, 3), (2, 1)]

    native = (
        df.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    assert sorted(r.n_events for r in native) == [1, 3]


def test_stream_stream_join_equals_batch(spark, event_files):
    """Stream-stream interval join (watermarked both sides, bounded
    time-range condition) must emit exactly the batch twin's matches."""
    src, schema = event_files
    clicks = ev.stream_events(spark, src, schema, max_files_per_trigger=2).filter(
        F.col("event_type") == "click"
    )
    purchases = ev.stream_events(spark, src, schema, max_files_per_trigger=2).filter(
        F.col("event_type") == "purchase"
    )
    joined = ev.streaming_click_purchase_join(clicks, purchases, window_minutes=10)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.purchase_id, r.click_id, r.user_id, r.micros_before)
        for r in spark.sql("SELECT * FROM ss_join_test").collect()
    }
    want = {
        (r.purchase_id, r.click_id, r.user_id, r.micros_before)
        for r in ev.click_purchase_join_batch(spark, SF_SMOKE, window_minutes=10).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_asof_matches_batch_asof(spark, event_files):
    """The watermark-correct streaming as-of join must equal the batch
    asof_join on every purchase the final watermark passed. Files are
    delivered in time-range order (watermark contract: disorder bounded by
    the delay) — the unordered event_files fixture would violate the
    contract and legitimately drop late clicks."""
    import shutil
    import tempfile
    import time
    from pathlib import Path

    from hdp2_5_hive2_spark.timeseries import asof_join

    _, schema = event_files
    events_all = load_tables(spark, SF_SMOKE)["events"]
    tmp = Path(tempfile.mkdtemp(prefix="events_asof_stream_"))
    src = str(tmp / "in")
    try:
        # 4 chronological chunks, written sequentially so the file source
        # (oldest mod-time first) replays them in time order
        with_us = events_all.withColumn("_us", F.unix_micros("ts"))
        qs = with_us.approxQuantile("_us", [0.25, 0.5, 0.75], 0.0)
        bounds = [None, *qs, None]
        for i in range(4):
            chunk = with_us
            if bounds[i] is not None:
                chunk = chunk.filter(F.col("_us") > bounds[i])
            if bounds[i + 1] is not None:
                chunk = chunk.filter(F.col("_us") <= bounds[i + 1])
            chunk = chunk.drop("_us")
            chunk.coalesce(1).write.mode("append").parquet(src)
            time.sleep(1.1)  # distinct mod-time ordering for the file source

        stream = ev.stream_events(spark, src, schema, max_files_per_trigger=1)
        enriched = ev.streaming_asof_click_enrich(stream, watermark="10 minutes")
        q = (
            enriched.writeStream.outputMode("append")
            .format("memory")
            .queryName("asof_stream_test")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r.purchase_id: (r.click_id, r.gap_us)
            for r in spark.sql("SELECT * FROM asof_stream_test").collect()
        }

        events = spark.read.schema(schema).parquet(src)
        purchases = events.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id"
        )
        clicks = events.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        wm_final = events.agg(
            (F.unix_micros(F.max("ts")) - 10 * 60 * 1_000_000).alias("wm")
        ).collect()[0].wm
        batch = (
            asof_join(
                purchases, clicks, on=["user_id"], right_cols=["event_id"], how="left"
            )
            .filter(F.unix_micros("ts") <= wm_final)
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("r_event_id").alias("click_id"),
                (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("gap_us"),
            )
        )
        want = {r.purchase_id: (r.click_id, r.gap_us) for r in batch.collect()}
        assert got == want
        assert len(want) > 0, "test corpus must contain watermark-passed purchases"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_week_bucketing_floors_pre_epoch_days(spark):
    """The week index must FLOOR-divide the day index (matching DuckDB's
    `//`), not truncate toward zero: an event 1 day before the 2024-01-01
    epoch belongs to week -1, not week 0. Data-independent parity for the
    retention/DAU-WAU/churn bucketing (ADVICE r4)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("2023-12-31",), ("2023-12-25",), ("2023-12-24",), ("2024-01-01",),
         ("2024-01-07",), ("2024-01-08",)],
        "d string",
    ).select(
        F.expr("floor(datediff(to_date(d), DATE '2024-01-01') / 7)").alias("wk")
    )
    got = [r.wk for r in df.collect()]
    # python's // is floor division — the semantics the oracles use
    expected = [(-1) // 7, (-7) // 7, (-8) // 7, 0 // 7, 6 // 7, 7 // 7]
    assert got == expected == [-1, -1, -2, 0, 0, 1]


def test_streaming_incremental_dedup_foreachbatch(spark):
    """The incremental cross-corpus near-dedup kernel is streamable by
    construction: because candidates are only new-batch × static-index
    (never new×new), per-micro-batch results are independent, so running
    the kernel inside foreachBatch over ANY partitioning of the incoming
    docs must union to exactly the one-shot result on the whole batch —
    the production crawl-ingest loop."""
    from hdp2_5_hive2_spark.llm import dedup

    ref = load_tables(spark, SF_SMOKE)["documents"].select("doc_id", "text")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    new = ref.filter(F.col("doc_id") < 24).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 1, F.size(toks) - 1)).alias("text"),
    )
    want = {
        (r.new_id, r.ref_id)
        for r in dedup.minhash_lsh_pairs_cross(new, ref, threshold=0.8).collect()
    }
    assert len(want) >= 24  # every planted near-dup found in one shot

    tmp = Path(tempfile.mkdtemp(prefix="docs_stream_"))
    src = str(tmp / "in")
    new.repartition(4).write.mode("overwrite").parquet(src)
    got: set = set()

    def sink(batch_df, batch_id):
        got.update(
            (r.new_id, r.ref_id)
            for r in dedup.minhash_lsh_pairs_cross(
                batch_df, ref, threshold=0.8
            ).collect()
        )

    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert got == want
    shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_hll_registers_merge_across_microbatches(spark):
    """HLL mergeability IS the streaming contract: registers accumulated
    batch-by-batch with register-wise max (foreachBatch over any file
    split) must equal the one-shot registers over all the data — so a
    streaming distinct-count needs only m integers of state."""
    from hdp2_5_hive2_spark.stats import hll_estimate, hll_registers

    vals = spark.range(0, 3000).select(
        F.concat(F.lit("u"), (F.col("id") % 1700).cast("string")).alias("v")
    )
    want = {
        (r["bucket"], r["rho"])
        for r in hll_registers(vals, "v", [], p=5).collect()
    }

    tmp = Path(tempfile.mkdtemp(prefix="hll_stream_"))
    src = str(tmp / "in")
    vals.repartition(5).write.mode("overwrite").parquet(src)
    acc: dict[int, int] = {}

    def sink(batch_df, batch_id):
        for r in hll_registers(batch_df, "v", [], p=5).collect():
            acc[r["bucket"]] = max(acc.get(r["bucket"], 0), r["rho"])

    stream = (
        spark.readStream.schema(vals.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert set(acc.items()) == want

    regs = spark.createDataFrame(
        [(b, r) for b, r in acc.items()], "bucket long, rho int"
    )
    est = hll_estimate(regs, [], p=5).first()
    assert abs(est["hll_ndv"] / 1700.0 - 1.0) < 0.9
    shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_ohlc_equals_batch(spark, event_files):
    """OHLC bars assembled incrementally across 4 micro-batches must equal
    the single-pass batch aggregation — min_by/max_by state merges must be
    order-insensitive (the streaming twin of events_ohlc_bars)."""
    src, schema = event_files
    stream = ev.stream_events(spark, src, schema, max_files_per_trigger=1)
    q = (
        ev.streaming_ohlc_bars(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("ohlc_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.bar_start, r.event_type): (r.open, r.high, r.low, r.close, r.n_ticks)
        for r in spark.sql("SELECT * FROM ohlc_test").collect()
    }
    batch_df = spark.read.schema(schema).parquet(src)
    want = {
        (r.bar_start, r.event_type): (r.open, r.high, r.low, r.close, r.n_ticks)
        for r in ev._ohlc_agg(
            batch_df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_incremental_rollup_foreachbatch(spark):
    """The monoid-merge maintenance behind events_incremental_rollup run
    as a LIVE pipeline: each micro-batch's partial aggregate merges into
    a standing state table inside foreachBatch (count/decimal-sum
    addition on a full outer join), and after draining the stream the
    state must equal the one-shot batch aggregate — exactly-once
    aggregate maintenance without restating history."""
    ev_df = load_tables(spark, SF_SMOKE)["events"]
    day = F.col("ts").cast("date")

    def rollup(df):
        return df.groupBy("event_type", day.alias("day")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("tot"),
        )

    want = {
        (r.event_type, r.day): (r.n, r.tot)
        for r in rollup(ev_df).collect()
    }

    tmp = Path(tempfile.mkdtemp(prefix="rollup_stream_"))
    src = str(tmp / "in")
    ev_df.repartition(4).write.mode("overwrite").parquet(src)
    state: dict = {}

    def sink(batch_df, batch_id):
        for r in rollup(batch_df).collect():
            k = (r.event_type, r.day)
            n0, t0 = state.get(k, (0, 0))
            state[k] = (n0 + r.n, t0 + r.tot)

    stream = (
        spark.readStream.schema(ev_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert state == want and len(state) > 1
    shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_gap_fill_locf_matches_reference(spark):
    """The stateful streaming gap-fill must emit, exactly once, every
    finalized minute of every series with the same LOCF value and fill
    flag a reference computation produces from the raw events — including
    minutes with NO events (unaided windowed aggregation cannot emit
    those). Files are TIME-RANGE partitioned (mostly-ordered ingest, the
    watermark contract): the random-split fixture's month-scale disorder
    would violate any finite watermark, for this operator and for real
    windowed aggregation alike."""
    tmp = Path(tempfile.mkdtemp(prefix="locf_stream_"))
    src = str(tmp / "in")
    df = load_tables(spark, SF_SMOKE)["events"]
    schema = df.schema
    # The file source delivers by MODIFICATION TIME, so write the four
    # time-slices sequentially — one bulk repartitionByRange write gives
    # all files the same mtime and arrival order becomes luck (a real
    # flake: batch 4 arriving first fast-forwards the watermark a month).
    import time as _time

    qs = df.selectExpr(
        "percentile(unix_micros(ts), array(0.25, 0.5, 0.75)) AS q"
    ).first().q
    lo = None
    for i, hi in enumerate(list(qs) + [None]):
        part = df.where(
            (F.unix_micros("ts") >= (lo if lo is not None else -1 << 62))
            & (F.unix_micros("ts") < (hi if hi is not None else 1 << 62))
        )
        part.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(0.05)
        lo = hi
    stream = ev.stream_events(spark, src, schema, max_files_per_trigger=1)
    q = (
        ev.streaming_gap_fill_locf(stream, watermark="15 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("locf_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_type, r.minute_us): (r.value_locf, r.filled)
        for r in spark.sql("SELECT * FROM locf_test").collect()
    }
    assert len(got) == len(spark.sql("SELECT * FROM locf_test").collect()), (
        "duplicate emission"
    )

    # reference from the raw files
    rows = spark.read.schema(schema).parquet(src).collect()
    MIN_US = 60_000_000
    import collections

    by_key = collections.defaultdict(list)
    wm_candidates = []
    for r in rows:
        t = int(r.ts.timestamp() * 1_000_000)
        wm_candidates.append(t)
        by_key[r.event_type].append((t, r.event_id, r.value))
    # Reference over ALL minutes; the stream emits the finalized PREFIX
    # (how far the final watermark advanced depends on availableNow's
    # no-data batch scheduling, which is Spark's business, not the
    # operator contract).
    wm = max(wm_candidates) - 15 * MIN_US
    want = {}
    for k, obs in by_key.items():
        obs.sort()
        first_min = (obs[0][0] // MIN_US) * MIN_US
        m = first_min
        while m + MIN_US <= wm:
            before_end = [o for o in obs if o[0] < m + MIN_US]
            last = before_end[-1]
            in_minute = last[0] >= m
            want[(k, m)] = (last[2], 0 if in_minute else 1)
            m += MIN_US
    # 1. every emitted row is exactly right
    for key, val in got.items():
        assert key in want and want[key] == val, (key, val, want.get(key))
    # 2. per key the emitted minutes are a contiguous prefix of the grid
    #    (exactly-once, no holes)
    import itertools

    for k, obs in by_key.items():
        minutes = sorted(m for (kk, m) in got if kk == k)
        assert minutes, f"no emission for {k}"
        first_min = (min(o[0] for o in obs) // MIN_US) * MIN_US
        assert minutes[0] == first_min
        for a, b in itertools.pairwise(minutes):
            assert b - a == MIN_US, (k, a, b)
    # 3. coverage reached at least the watermark as of the 2nd-to-last
    #    file (a floor on how much MUST have finalized), and filled
    #    minutes were actually exercised
    file_maxes = sorted(wm_candidates)
    conservative_wm = file_maxes[len(file_maxes) // 2] - 15 * MIN_US
    for k in by_key:
        top = max(m for (kk, m) in got if kk == k)
        assert top + MIN_US >= conservative_wm, (k, top, conservative_wm)
    assert any(f == 1 for _, f in got.values()), "no filled minutes exercised"
    shutil.rmtree(tmp, ignore_errors=True)
