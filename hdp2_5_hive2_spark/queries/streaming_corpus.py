"""Event-time windowing corpus — batch equivalents of the streaming slice
(SURVEY.md §2.11: the idiomatic replacement for Hive's ACID-ingest-only
streaming surface). Each entry is the batch twin of a Structured Streaming
operator in hdp2_5_hive2_spark.streaming.events; tests/test_streaming.py
proves the streaming twins produce identical results over a file stream.

Oracle notes: events.ts is TIMESTAMP_NS in DuckDB vs microsecond in Spark —
all oracles bucket or truncate, which is insensitive to sub-µs residue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdp2_5_hive2_spark import stats
from hdp2_5_hive2_spark.llm.text import plan_checkpoint
from hdp2_5_hive2_spark.catalog import load_tables
from hdp2_5_hive2_spark.queries.registry import query
from hdp2_5_hive2_spark.streaming import events as ev


@query(
    "events_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "window", "bench"),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time window (streaming twin:
    streaming.events.streaming_tumbling_counts)."""
    return ev.tumbling_counts_batch(spark, sf_dir)


@query(
    "events_sliding_window",
    oracle="""
    SELECT window_start, event_type, COUNT(*) AS n
    FROM (
      SELECT unnest([time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)),
                     time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL '5 minutes'])
               AS window_start,
             event_type
      FROM events
    ) t
    GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window 10m/5m: each event belongs to the two 5-min-aligned
    windows covering it."""
    return ev.sliding_counts_batch(spark, sf_dir)


@query(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(CAST(ts AS TIMESTAMP)) - epoch(CAST(lag(ts) OVER w AS TIMESTAMP)) > 300
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_seq
      FROM flagged
    )
    SELECT user_id, session_seq,
           min(ts) AS session_start, max(ts) AS session_end, COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_seq
    """,
    tags=("streaming", "session"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (5-minute gap) — batch twin of
    session_window(ts, '5 minutes')."""
    return ev.sessionize_batch(spark, sf_dir, gap_minutes=5)


@query(
    "events_dedup_minute",
    oracle="""
    SELECT COUNT(*) AS n_distinct_keys FROM (
      SELECT DISTINCT user_id, event_type,
             time_bucket(INTERVAL '1 minute', CAST(ts AS TIMESTAMP)) AS minute
      FROM events
    ) t
    """,
    tags=("streaming", "dedup"),
)
def events_dedup_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup per minute bucket (streaming twin: dropDuplicates under a
    watermark — streaming.events.streaming_dedup)."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.select("user_id", "event_type", F.window("ts", "1 minute").getField("start").alias("minute"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_distinct_keys"))
    )


@query(
    "events_stream_static_join",
    oracle="""
    SELECT w.weight_class, COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e
    JOIN (VALUES ('click', 'light'), ('view', 'light'),
                 ('purchase', 'heavy'), ('signup', 'heavy'), ('error', 'ops')) AS w(event_type, weight_class)
      ON e.event_type = w.event_type
    GROUP BY w.weight_class
    """,
    tags=("streaming", "join"),
)
def events_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (dimension broadcast in both modes)."""
    e = load_tables(spark, sf_dir)["events"]
    dim = e.sparkSession.createDataFrame(
        [
            ("click", "light"),
            ("view", "light"),
            ("purchase", "heavy"),
            ("signup", "heavy"),
            ("error", "ops"),
        ],
        ["event_type", "weight_class"],
    )
    return (
        e.join(F.broadcast(dim), "event_type")
        .groupBy("weight_class")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


@query(
    "events_session_window_native",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 300
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), ids AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM seq
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM ids GROUP BY user_id, sid
    """,
    tags=("streaming", "session", "window"),
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (the Structured Streaming session operator run
    in batch mode): 5-minute-gap sessions per user; session start = first
    event time, which the gaps-and-islands oracle reproduces. This is the
    operator events_sessionize expresses manually via lag+cumsum — both
    formulations must agree."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
    )


@query(
    "events_stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS micros_before
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND p.event_type = 'purchase'
     AND c.ts <= p.ts
     AND epoch_us(p.ts) - epoch_us(c.ts) <= 10 * 60 * 1000000
    """,
    tags=("streaming", "join", "interval"),
)
def events_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, batch twin (streaming.events.
    click_purchase_join_batch / streaming_click_purchase_join): purchases
    matched to the same user's clicks within the preceding 10 minutes. The
    bounded time-range predicate is exactly what keeps the streaming form's
    join state finite (watermark + window per side)."""
    from hdp2_5_hive2_spark.streaming.events import click_purchase_join_batch

    return click_purchase_join_batch(spark, sf_dir, window_minutes=10)


@query(
    "events_asof_join",
    oracle="""
    SELECT p.user_id AS user_id, p.event_id AS purchase_id, c.event_id AS click_id,
           date_diff('microsecond', CAST(c.ts AS TIMESTAMP), CAST(p.ts AS TIMESTAMP)) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
    """,
    tags=("timeseries", "asof"),
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (hdp2_5_hive2_spark.timeseries.asof_join): each
    purchase picks the user's LATEST preceding (or simultaneous) click —
    point-in-time attribution. One shuffle + in-partition sort via the
    union/last-carry merge plan (no |clicks|x|purchases| intermediate);
    oracle is DuckDB's native ASOF JOIN. (user, ts) click pairs are unique
    at every tested SF, so the match is unambiguous."""
    from hdp2_5_hive2_spark.timeseries import asof_join

    e = load_tables(spark, sf_dir)["events"]
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    res = asof_join(purchases, clicks, on=["user_id"], right_cols=["event_id"])
    return res.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("r_event_id").alias("click_id"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("gap_us"),
    )


# Deterministic overlapping value bands for the range-join corpus entry:
# 12 bands, lo = i*40.0, hi = lo+65.0 — adjacent bands overlap by 25, so
# values can match 1-2 bands and the join is a true (non-partitioning)
# range join. All doubles are exactly representable.
_RANGE_BANDS = [(i, i * 40.0, i * 40.0 + 65.0) for i in range(12)]


@query(
    "events_range_join_bands",
    oracle="""
    SELECT b.tier AS tier, count(*) AS n_events,
           CAST(SUM(e.event_id) AS BIGINT) AS sum_event_id,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e
    JOIN (VALUES """ + ", ".join(f"({t}, {lo}, {hi})" for t, lo, hi in _RANGE_BANDS) + """)
         AS b(tier, lo, hi)
      ON e.value BETWEEN b.lo AND b.hi
    GROUP BY b.tier
    """,
    tags=("timeseries", "rangejoin"),
)
def events_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join events.value against overlapping value bands via the
    bucketed equi-join rewrite (plans.range_join.bucketed_range_join,
    bucket_width=40 ~ band width) — no BroadcastNestedLoopJoin at any
    scale. Aggregated per band with exact checksums (bigint id sum, decimal
    value sum) so the driver hash is order-independent."""
    from hdp2_5_hive2_spark.plans.range_join import bucketed_range_join

    e = load_tables(spark, sf_dir)["events"].select("event_id", "value")
    bands = spark.createDataFrame(_RANGE_BANDS, "tier int, lo double, hi double")
    joined = bucketed_range_join(e, "value", bands, "lo", "hi", bucket_width=40.0)
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("event_id").alias("sum_event_id"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


@query(
    "events_session_funnel",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(CAST(ts AS TIMESTAMP)) - epoch(CAST(lag(ts) OVER w AS TIMESTAMP)) > 300
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, event_type, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_seq
      FROM flagged
    ), per_session AS (
      SELECT user_id, session_seq,
             min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
             max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
      FROM numbered
      GROUP BY user_id, session_seq
    )
    SELECT count(*) AS n_sessions,
           CAST(count(first_click) AS BIGINT) AS n_with_click,
           CAST(SUM(CASE WHEN last_purchase >= first_click THEN 1 ELSE 0 END) AS BIGINT)
             AS n_converted
    FROM per_session
    """,
    tags=("streaming", "session", "funnel"),
)
def events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session funnel conversion (streaming.events.session_ids composite):
    per 5-minute-gap session, did a click occur, and did a purchase happen
    at-or-after the first click? One aggregate row (n_sessions,
    n_with_click, n_converted) — the composed sessionize → per-session
    conditional min/max → funnel rollup a product-analytics user runs."""
    e = load_tables(spark, sf_dir)["events"]
    per = (
        ev.session_ids(e, gap_minutes=5)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("last_purchase"),
        )
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count("first_click").alias("n_with_click"),
        F.sum(
            F.when(F.col("last_purchase") >= F.col("first_click"), 1).otherwise(0)
        ).cast("bigint").alias("n_converted"),
    )


@query(
    "events_asof_join_forward",
    oracle="""
    SELECT s.user_id AS user_id, s.event_id AS signup_id, c.event_id AS next_click_id,
           date_diff('microsecond', CAST(s.ts AS TIMESTAMP), CAST(c.ts AS TIMESTAMP)) AS lead_us
    FROM (SELECT * FROM events WHERE event_type = 'signup') s
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON s.user_id = c.user_id AND CAST(s.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP)
    """,
    tags=("timeseries", "asof"),
)
def events_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (timeseries.asof_join direction='forward'): each
    signup picks the user's EARLIEST click at-or-after it — time-to-first-
    action attribution, the mirror scan of the backward merge plan. Oracle
    is DuckDB ASOF JOIN with the <= inequality."""
    from hdp2_5_hive2_spark.timeseries import asof_join

    e = load_tables(spark, sf_dir)["events"]
    signups = e.filter(F.col("event_type") == "signup").select("user_id", "ts", "event_id")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    res = asof_join(
        signups, clicks, on=["user_id"], right_cols=["event_id"], direction="forward"
    )
    return res.select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.col("r_event_id").alias("next_click_id"),
        (F.unix_micros("asof_ts") - F.unix_micros("ts")).alias("lead_us"),
    )


@query(
    "events_asof_join_nearest",
    oracle="""
    WITH s AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE event_type = 'signup'),
    c AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'click'),
    b AS (SELECT s.user_id, s.event_id AS sid, s.ts AS sts,
                 c.event_id AS bid, c.ts AS bts
          FROM s ASOF LEFT JOIN c
            ON s.user_id = c.user_id AND s.ts >= c.ts),
    f AS (SELECT s.user_id, s.event_id AS sid,
                 c.event_id AS fid, c.ts AS fts
          FROM s ASOF LEFT JOIN c
            ON s.user_id = c.user_id AND s.ts <= c.ts)
    SELECT b.user_id AS user_id, b.sid AS signup_id,
           CASE WHEN f.fid IS NULL
                     OR (b.bid IS NOT NULL
                         AND epoch_us(b.sts) - epoch_us(b.bts)
                             <= epoch_us(f.fts) - epoch_us(b.sts))
                THEN b.bid ELSE f.fid END AS nearest_click_id,
           CASE WHEN f.fid IS NULL
                     OR (b.bid IS NOT NULL
                         AND epoch_us(b.sts) - epoch_us(b.bts)
                             <= epoch_us(f.fts) - epoch_us(b.sts))
                THEN epoch_us(b.sts) - epoch_us(b.bts)
                ELSE epoch_us(f.fts) - epoch_us(b.sts) END AS gap_us
    FROM b JOIN f ON b.sid = f.sid
    WHERE coalesce(b.bid, f.fid) IS NOT NULL
    """,
    tags=("timeseries", "asof"),
)
def events_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of (timeseries.asof_join_nearest): each signup
    picks whichever click — latest-before or earliest-after — is closer in
    time, ties to the earlier one. Dual carry over ONE key shuffle (asc +
    desc sorted windows); the oracle composes DuckDB's backward and forward
    ASOF joins and re-derives the same pick."""
    from hdp2_5_hive2_spark.timeseries import asof_join_nearest

    e = load_tables(spark, sf_dir)["events"]
    signups = e.filter(F.col("event_type") == "signup").select("user_id", "ts", "event_id")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    res = asof_join_nearest(signups, clicks, on=["user_id"], right_cols=["event_id"])
    return res.select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.col("r_event_id").alias("nearest_click_id"),
        F.abs(F.unix_micros("asof_ts") - F.unix_micros("ts")).alias("gap_us"),
    )


@query(
    "events_interval_join_incidents",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(CAST(ts AS TIMESTAMP)) - epoch(CAST(lag(ts) OVER w AS TIMESTAMP)) > 300
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    ), sess AS (
      SELECT user_id, session_seq,
             epoch_us(min(ts)) AS s_lo, epoch_us(max(ts)) AS s_hi
      FROM numbered GROUP BY user_id, session_seq
    ), mn AS (
      SELECT epoch_us(min(CAST(ts AS TIMESTAMP))) AS m FROM events
    ), inc AS (
      SELECT CAST(i AS INTEGER) AS incident_id,
             m + i * 108000000000 AS i_lo,
             m + i * 108000000000 + 1800000000 AS i_hi
      FROM mn, generate_series(0, 23) AS g(i)
    )
    SELECT incident_id, count(*) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM sess JOIN inc ON s_lo <= i_hi AND i_lo <= s_hi
    GROUP BY incident_id
    """,
    tags=("timeseries", "intervaljoin"),
)
def events_interval_join_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap join (plans.range_join.bucketed_interval_join):
    5-minute-gap user sessions overlapped with 24 synthetic 30-minute
    incident windows spaced 30 h apart — "sessions affected per incident".
    Bucketed both sides (30-min buckets), pairs deduped by emitting only
    from the max(lo) bucket; the oracle runs the naive inequality join."""
    from hdp2_5_hive2_spark.plans.range_join import bucketed_interval_join

    e = load_tables(spark, sf_dir)["events"]
    sess = ev.sessionize_batch(spark, sf_dir, gap_minutes=5).select(
        "user_id",
        F.unix_micros("session_start").alias("s_lo"),
        F.unix_micros("session_end").alias("s_hi"),
    )
    mn = e.agg(F.min(F.unix_micros("ts"))).first()[0]
    incidents = spark.createDataFrame(
        [(i, mn + i * 108_000_000_000, mn + i * 108_000_000_000 + 1_800_000_000)
         for i in range(24)],
        "incident_id int, i_lo bigint, i_hi bigint",
    )
    j = bucketed_interval_join(
        sess, "s_lo", "s_hi", incidents, "i_lo", "i_hi", bucket_width=1_800_000_000.0
    )
    return j.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH w AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS wk
      FROM events
    ), c AS (
      SELECT user_id, wk, MIN(wk) OVER (PARTITION BY user_id) AS cohort_wk
      FROM w
    )
    SELECT cohort_wk, wk - cohort_wk AS week_offset, count(*) AS n_users
    FROM c GROUP BY cohort_wk, wk - cohort_wk
    """,
    tags=("events", "cohort", "retention"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active week, counted
    in every subsequent active week — the standard product-analytics rollup.
    Weeks are PURE INTEGER day-index arithmetic (datediff // 7 from a fixed
    epoch) so both engines bucket identically regardless of week-start or
    timezone conventions. Plan: distinct (user, week) is one exchange; the
    per-user cohort min is a window over the SAME user partitioning; the
    final rollup re-keys on (cohort, offset)."""
    from pyspark.sql import Window

    e = load_tables(spark, sf_dir)["events"]
    wk = F.expr("floor(datediff(to_date(ts), DATE '2024-01-01') / 7)")
    w = e.select("user_id", wk.alias("wk")).distinct()
    c = w.withColumn("cohort_wk", F.min("wk").over(Window.partitionBy("user_id")))
    return (
        c.groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "events_anomaly_minutes",
    oracle="""
    WITH m AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 60000000 AS minute,
             count(*) AS cnt
      FROM events GROUP BY event_type, minute
    ), st AS (
      SELECT event_type, count(*) AS n,
             CAST(SUM(cnt) AS BIGINT) AS s,
             CAST(SUM(cnt * cnt) AS BIGINT) AS ss
      FROM m GROUP BY event_type
    )
    SELECT m.event_type AS event_type, st.n AS n_minutes,
           CAST(SUM(CASE WHEN (st.n * m.cnt - st.s) * (st.n * m.cnt - st.s)
                              > 9 * (st.n * st.ss - st.s * st.s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           CAST(MAX(m.cnt) AS BIGINT) AS max_cnt
    FROM m JOIN st USING (event_type)
    GROUP BY m.event_type, st.n
    """,
    tags=("events", "anomaly"),
)
def events_anomaly_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-anomaly detection: minutes whose event count sits more than 3
    sigma above/below the per-type mean. The z-score test is algebraically
    cross-multiplied into PURE INTEGER arithmetic — (n·x − S)² > 9(n·SS − S²)
    ⟺ |z| > 3 — so no sqrt/stddev (not bit-portable across engines) ever
    runs and the oracle matches exactly. Plan: minute rollup (one exchange),
    tiny per-type stats broadcast back, count-only output."""
    e = load_tables(spark, sf_dir)["events"]
    m = (
        e.select("event_type", F.expr("unix_micros(ts) div 60000000").alias("minute"))
        .groupBy("event_type", "minute")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    st = m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
    )
    dev = F.col("n") * F.col("cnt") - F.col("s")
    thresh = F.lit(9) * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
    return (
        m.join(F.broadcast(st), "event_type")
        .groupBy("event_type", F.col("n").alias("n_minutes"))
        .agg(
            F.sum(F.when(dev * dev > thresh, 1).otherwise(0)).alias("n_anomalies"),
            F.max("cnt").alias("max_cnt"),
        )
    )


@query(
    "events_session_paths",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(CAST(ts AS TIMESTAMP)) - epoch(CAST(lag(ts) OVER w AS TIMESTAMP)) > 300
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_seq
      FROM flagged
    ), paths AS (
      SELECT user_id, session_seq,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM numbered GROUP BY user_id, session_seq
    )
    SELECT path, n_sessions, rank FROM (
      SELECT path, count(*) AS n_sessions,
             row_number() OVER (ORDER BY count(*) DESC, path) AS rank
      FROM paths GROUP BY path
    ) WHERE rank <= 10
    """,
    tags=("events", "session", "path"),
)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 session paths (the event-type sequence of each 5-minute-gap
    session, joined with '>') — path analysis, the exploratory sibling of the
    funnel rollup. Deterministic ordered aggregation: events are packed as
    (ts, event_id, type) structs, array-sorted (lexicographic struct order ==
    the oracle's ORDER BY ts, event_id), then projected — no
    collect_list-order dependence. Ranking ties break on the path string.

    The top-10 cut is sort+limit (TakeOrderedAndProject bounded heaps) over
    the path-cardinality-sized aggregate — distinct paths grow with session
    count, so a global row_number window here would be the single-partition
    cliff (VERDICT r6 #2); survivors rank window-free (bounded_rank)."""
    from hdp2_5_hive2_spark.llm.retrieval import bounded_rank

    sess = ev.session_ids(load_tables(spark, sf_dir)["events"], gap_minutes=5)
    packed = sess.groupBy("user_id", "session_seq").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("evs")
    )
    paths = packed.select(
        F.concat_ws(">", F.transform(F.col("evs"), lambda e: e["event_type"])).alias(
            "path"
        )
    )
    top = (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(10)
    )
    return bounded_rank(top, "n_sessions", "path").select(
        "path", "n_sessions", "rank"
    )


@query(
    "events_dau_wau",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx
      FROM events
    ), daily AS (
      SELECT day_idx, count(*) AS dau FROM d GROUP BY day_idx
    ), weekly AS (
      SELECT day_idx // 7 AS wk, count(DISTINCT user_id) AS wau
      FROM d GROUP BY day_idx // 7
    )
    SELECT daily.day_idx AS day_idx, daily.dau AS dau, weekly.wau AS wau,
           CAST(daily.dau AS DOUBLE) / weekly.wau AS stickiness
    FROM daily JOIN weekly ON daily.day_idx // 7 = weekly.wk
    """,
    tags=("events", "engagement"),
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — the engagement ratio product analytics
    tracks. Pure integer day-index arithmetic from a fixed epoch; one
    distinct (user, day) exchange feeds both rollups; the weekly side joins
    back broadcast (weeks are tiny)."""
    e = load_tables(spark, sf_dir)["events"]
    d = e.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("day_idx"),
    ).distinct()
    daily = d.groupBy("day_idx").agg(F.count(F.lit(1)).alias("dau"))
    weekly = d.select("user_id", F.expr("floor(day_idx / 7)").alias("wk")).groupBy("wk").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        daily.join(F.broadcast(weekly), F.expr("floor(day_idx / 7)") == F.col("wk"))
        .select(
            "day_idx", "dau", "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


@query(
    "events_churned_users",
    oracle="""
    WITH w AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS wk
      FROM events
    )
    SELECT a.wk AS wk, count(*) AS n_active,
           CAST(SUM(CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_churned,
           CAST(SUM(CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS churn_rate
    FROM w a LEFT JOIN w b ON b.user_id = a.user_id AND b.wk = a.wk + 1
    GROUP BY a.wk
    """,
    tags=("events", "churn"),
)
def events_churned_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly churn: users active in week w with no activity in week w+1
    (the left-anti week-shift self-join every retention dashboard runs).
    One distinct (user, week) frame joined against its own week+1 shift —
    same key, so the exchange is reused."""
    e = load_tables(spark, sf_dir)["events"]
    w = e.select(
        "user_id",
        F.expr("floor(datediff(to_date(ts), DATE '2024-01-01') / 7)").alias("wk"),
    ).distinct()
    nxt = w.select("user_id", (F.col("wk") - 1).alias("wk"), F.lit(1).alias("active_next"))
    joined = w.join(nxt, ["user_id", "wk"], "left")
    return joined.groupBy("wk").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(F.when(F.col("active_next").isNull(), 1).otherwise(0)).alias("n_churned"),
        (
            F.sum(F.when(F.col("active_next").isNull(), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("churn_rate"),
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(CAST(ts AS TIMESTAMP)) - epoch(CAST(lag(ts) OVER w AS TIMESTAMP)) > 300
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_seq
      FROM flagged
    ), pairs AS (
      SELECT event_type AS to_type,
             lag(event_type) OVER (PARTITION BY user_id, session_seq
                                   ORDER BY ts, event_id) AS from_type
      FROM numbered
    )
    SELECT from_type, to_type, count(*) AS n_transitions
    FROM pairs WHERE from_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
    tags=("events", "session", "transition"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session event-type transition matrix (the Markov-chain counts
    behind next-action models): consecutive event pairs inside each
    5-minute-gap session, counted per (from, to). One window pass over the
    session assignment's own (user, session) partitioning — the lag reuses
    the sessionize exchange."""
    from pyspark.sql import Window

    sess = ev.session_ids(load_tables(spark, sf_dir)["events"], gap_minutes=5)
    w = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    pairs = sess.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    )
    return (
        pairs.where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@query(
    "events_heavy_hitters_cms",
    oracle="""
    WITH sk AS (
      SELECT 0 AS row,
             CAST(('0x' || substring(md5('0:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 2
      UNION ALL
      SELECT 1,
             CAST(('0x' || substring(md5('1:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64,
             CAST(count(*) AS BIGINT)
      FROM events GROUP BY 2
      UNION ALL
      SELECT 2,
             CAST(('0x' || substring(md5('2:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64,
             CAST(count(*) AS BIGINT)
      FROM events GROUP BY 2
      UNION ALL
      SELECT 3,
             CAST(('0x' || substring(md5('3:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64,
             CAST(count(*) AS BIGINT)
      FROM events GROUP BY 2
    ), exact AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM events GROUP BY user_id
      ORDER BY exact_cnt DESC, user_id LIMIT 20
    ), keyrows AS (
      SELECT user_id, exact_cnt, 0 AS row,
             CAST(('0x' || substring(md5('0:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS bucket
      FROM exact
      UNION ALL
      SELECT user_id, exact_cnt, 1,
             CAST(('0x' || substring(md5('1:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64
      FROM exact
      UNION ALL
      SELECT user_id, exact_cnt, 2,
             CAST(('0x' || substring(md5('2:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64
      FROM exact
      UNION ALL
      SELECT user_id, exact_cnt, 3,
             CAST(('0x' || substring(md5('3:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64
      FROM exact
    )
    SELECT k.user_id, k.exact_cnt,
           CAST(min(sk.cnt) AS BIGINT) AS cms_est,
           CAST(min(sk.cnt) - k.exact_cnt AS BIGINT) AS overcount
    FROM keyrows k JOIN sk USING (row, bucket)
    GROUP BY k.user_id, k.exact_cnt
    """,
    tags=("events", "sketch", "cms"),
)
def events_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count–min-sketch heavy-hitter audit (stats.count_min_sketch, 4×64
    md5-hashed cells): the top-20 users by exact event count, each with
    its CMS point estimate and the one-sided overcount. The sketch is 256
    integer cells built in ONE scan with map-side combine — the
    fixed-memory structure that survives any key cardinality at 100 TB —
    and estimates broadcast-join against it; md5 bucketing makes every
    cell engine-exact, so even the collision pattern is oracle-checkable."""
    e = load_tables(spark, sf_dir)["events"]
    sketch = stats.count_min_sketch(e, "user_id", depth=4, width=64)
    exact = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
        .limit(20)
    )
    est = stats.cms_estimate(exact, sketch, "user_id", depth=4, width=64)
    return est.select(
        "user_id",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    )


def _zorder_oracle(bits: int = 8, bucket_bits: int = 4) -> str:
    interleave = " + ".join(
        f"((x >> {i}) & 1) * {1 << (2 * i)} + ((y >> {i}) & 1) * {1 << (2 * i + 1)}"
        for i in range(bits)
    )
    return f"""
    WITH m AS (SELECT max(user_id) AS mu FROM events),
    b AS (
      SELECT (user_id * 256) // (mu + 1) AS x,
             ((hour(CAST(ts AS TIMESTAMP)) * 60
               + minute(CAST(ts AS TIMESTAMP))) * 256) // 1440 AS y
      FROM events, m
    ), z AS (
      SELECT x, y, {interleave} AS zv FROM b
    )
    SELECT zv >> {2 * bits - bucket_bits} AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
           CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
    FROM z GROUP BY zv >> {2 * bits - bucket_bits}
    """


@query(
    "events_zorder_layout",
    oracle=_zorder_oracle(),
    tags=("events", "storage", "layout", "zorder"),
)
def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit over events (storage.layout.zvalue /
    zorder_audit): normalize (user_id, minute-of-day) into 8-bit ranges,
    interleave into a Morton key, split the keyspace into 16 fixed-width
    Z-ranges — the files a Z-clustered INSERT would produce — and report
    each range's row count and per-dimension min/max footer spans. The
    audit shows every bucket bounding BOTH dimensions (~quarter range
    each at 4 bucket bits), which is the data-skipping property a
    single-column sort cannot give the second column. Exact bit algebra
    end-to-end; the normalizing max rides a broadcast one-row cross join,
    and bucketing shifts the key's top bits, so there is NO global sort —
    one bounded groupBy shuffle."""
    from hdp2_5_hive2_spark.storage import layout

    e = load_tables(spark, sf_dir)["events"]
    mu = e.agg(F.max("user_id").alias("mu"))
    base = e.crossJoin(F.broadcast(mu)).select(
        F.expr("(user_id * 256) div (mu + 1)").alias("x"),
        (
            (F.hour("ts") * 60 + F.minute("ts")) * 256
        ).cast("bigint").alias("_yraw"),
    ).select("x", F.expr("_yraw div 1440").alias("y"))
    return layout.zorder_audit(base, "x", "y", bits=8, bucket_bits=4)


@query(
    "events_scd2_intervals",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               - row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS isl
      FROM events
    ), i AS (
      SELECT user_id, event_type, min(ts) AS valid_from,
             CAST(count(*) AS BIGINT) AS n_events
      FROM o GROUP BY user_id, event_type, isl
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             AS valid_to,
           n_events
    FROM i
    """,
    tags=("events", "timeseries", "scd2"),
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 state-history build over the event log
    (timeseries.state_intervals): per user, runs of the same event_type
    collapse into validity intervals [valid_from, valid_to) closed by the
    next state change (open interval -> NULL). Gaps-and-islands in one
    key shuffle (both row_numbers share the Exchange), interval closing on
    the already-collapsed island table."""
    from hdp2_5_hive2_spark import timeseries

    e = load_tables(spark, sf_dir)["events"]
    return timeseries.state_intervals(
        e, ["user_id"], "event_type", ts_col="ts", tiebreak_col="event_id"
    )


@query(
    "events_dwell_time",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
             lead(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_us
      FROM events
    ), d AS (
      SELECT event_type,
             LEAST(next_us - t_us, 1800000000) AS dwell_us
      FROM o WHERE next_us IS NOT NULL
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(dwell_us) AS BIGINT) AS total_us,
           CAST(SUM(dwell_us) AS DOUBLE) / count(*) AS avg_us
    FROM d GROUP BY event_type
    """,
    tags=("events", "timeseries", "dwell"),
)
def events_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-time attribution: time spent 'on' each event = gap to the
    user's next event, capped at 30 minutes (the sessionization timeout —
    a user's last event before an absence contributes the cap, open tails
    contribute nothing). The product-analytics staple behind 'avg time on
    step X'. One key shuffle for the lead() window; microsecond integers
    end-to-end with a single closing division."""
    from pyspark.sql import Window

    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    t_us = F.unix_micros(F.col("ts"))
    o = e.select(
        "event_type",
        t_us.alias("t_us"),
        F.lead(t_us).over(w).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    dwell = F.least(F.col("next_us") - F.col("t_us"), F.lit(1800000000).cast("bigint"))
    return (
        o.select("event_type", dwell.alias("dwell_us"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dwell_us").alias("total_us"),
            (F.sum("dwell_us").cast("double") / F.count(F.lit(1))).alias("avg_us"),
        )
    )


@query(
    "qa_k_anonymity",
    oracle="""
    WITH q AS (
      SELECT event_type,
             hour(CAST(ts AS TIMESTAMP)) AS hr,
             CAST(floor(value / 10) AS BIGINT) AS val_band,
             count(*) AS s
      FROM events GROUP BY 1, 2, 3
    ), capped AS (
      SELECT LEAST(s, 21) AS size_capped, s FROM q
    )
    SELECT CAST(size_capped AS BIGINT) AS size_capped,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(SUM(s) AS BIGINT) AS n_rows,
           size_capped < 5 AS risky
    FROM capped GROUP BY size_capped
    """,
    tags=("events", "qa", "privacy"),
)
def qa_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (privacy QA for training-data release, Sweeney
    2002): group the event log by its quasi-identifier tuple (event_type,
    hour-of-day, value band) and report the equivalence-class size
    histogram — classes smaller than k=5 are re-identification risks the
    release gate must suppress or generalize. Sizes cap at 21 ('>20') so
    the output stays bounded at any corpus size; two groupBy passes, the
    second over the already-collapsed class table. Complements the
    row-level PII scan (llm_pii_redact) with the aggregate-disclosure
    view."""
    e = load_tables(spark, sf_dir)["events"]
    classes = (
        e.groupBy(
            "event_type",
            F.hour("ts").alias("hr"),
            F.floor(F.col("value") / 10).cast("bigint").alias("val_band"),
        )
        .agg(F.count(F.lit(1)).alias("s"))
    )
    return (
        classes.select(F.least(F.col("s"), F.lit(21)).alias("size_capped"), "s")
        .groupBy("size_capped")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("s").alias("n_rows"),
        )
        .select(
            "size_capped", "n_groups", "n_rows",
            (F.col("size_capped") < 5).alias("risky"),
        )
    )


@query(
    "qa_l_diversity",
    oracle="""
    WITH q AS (
      SELECT event_type,
             hour(CAST(ts AS TIMESTAMP)) AS hr,
             CAST(floor(value / 10) AS BIGINT) AS val_band,
             count(*) AS s,
             count(DISTINCT user_id) AS l
      FROM events GROUP BY 1, 2, 3
    )
    SELECT CAST(LEAST(l, 11) AS BIGINT) AS l_capped,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(SUM(s) AS BIGINT) AS n_rows,
           LEAST(l, 11) < 3 AS homogeneous
    FROM q GROUP BY LEAST(l, 11)
    """,
    tags=("events", "qa", "privacy"),
)
def qa_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007), the companion to
    qa_k_anonymity: per quasi-identifier class, how many DISTINCT
    sensitive values (user_id) appear — a class can be large (k-anonymous)
    yet homogeneous (l < 3), which still discloses the sensitive value.
    Output: histogram of per-class diversity, capped at 11 ('>10').
    Distinct-per-class is a two-level aggregation (class+user first, then
    class), both with map-side partials."""
    e = load_tables(spark, sf_dir)["events"]
    classes = e.groupBy(
        "event_type",
        F.hour("ts").alias("hr"),
        F.floor(F.col("value") / 10).cast("bigint").alias("val_band"),
    ).agg(
        F.count(F.lit(1)).alias("s"),
        F.count_distinct("user_id").alias("l"),
    )
    return (
        classes.select(F.least(F.col("l"), F.lit(11)).alias("l_capped"), "s")
        .groupBy("l_capped")
        .agg(F.count(F.lit(1)).alias("n_groups"), F.sum("s").alias("n_rows"))
        .select(
            "l_capped", "n_groups", "n_rows",
            (F.col("l_capped") < 3).alias("homogeneous"),
        )
    )


@query(
    "events_attribution_last_touch",
    oracle="""
    WITH touches AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM (
        SELECT user_id, ts, event_type, event_id,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id)
                 AS rk
        FROM events WHERE event_type IN ('view', 'click', 'signup')
      ) WHERE rk = 1
    ), p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      WHERE event_type = 'purchase'
    ), attrib AS (
      SELECT p.user_id, p.ts, t.ts AS touch_ts, t.event_type,
             CASE WHEN t.ts IS NOT NULL
                   AND date_diff('microsecond', t.ts, p.ts) <= 1800000000
                  THEN t.event_type ELSE 'direct' END AS channel,
             CASE WHEN t.ts IS NOT NULL
                   AND date_diff('microsecond', t.ts, p.ts) <= 1800000000
                  THEN date_diff('microsecond', t.ts, p.ts) END AS latency_us
      FROM p ASOF LEFT JOIN touches t
        ON p.user_id = t.user_id AND p.ts >= t.ts
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_conversions,
           CAST(SUM(latency_us) AS BIGINT) AS total_latency_us,
           CAST(SUM(latency_us) AS DOUBLE) / count(latency_us) AS avg_latency_us
    FROM attrib GROUP BY channel
    """,
    tags=("events", "timeseries", "attribution", "asof"),
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution built on the as-of join
    (timeseries.asof_join): each purchase credits the user's latest
    preceding view/click/signup within a 30-minute window, else 'direct'.
    Touches pre-dedupe to one row per (user, ts) by min event id so the
    as-of match is unambiguous by construction (not by data luck).
    Conversion counts and exact microsecond latency sums per channel; the
    avg divides exact integers once."""
    from pyspark.sql import Window

    from hdp2_5_hive2_spark.timeseries import asof_join

    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").asc())
    touches = (
        e.filter(F.col("event_type").isin("view", "click", "signup"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("user_id", "ts", "event_type")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    j = asof_join(
        purchases, touches, on=["user_id"], right_cols=["event_type"], how="left"
    )
    lat = F.unix_micros("ts") - F.unix_micros("asof_ts")
    attributed = F.col("asof_ts").isNotNull() & (lat <= 1800000000)
    a = j.select(
        F.when(attributed, F.col("r_event_type")).otherwise(F.lit("direct")).alias(
            "channel"
        ),
        F.when(attributed, lat).alias("latency_us"),
    )
    return a.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.sum("latency_us").alias("total_latency_us"),
        (
            F.sum("latency_us").cast("double") / F.count("latency_us")
        ).alias("avg_latency_us"),
    )


@query(
    "events_ohlc_bars",
    oracle="""
    SELECT event_type,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar_hour,
           first(value ORDER BY ts, event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           last(value ORDER BY ts, event_id) AS close,
           CAST(count(*) AS BIGINT) AS n_ticks
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "timeseries", "downsample", "bench"),
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar downsampling — the canonical timeseries-engine rollup
    (open/high/low/close per hour per series). Spark-first form: ONE
    aggregate with `min_by`/`max_by` keyed on the (ts, event_id) struct —
    no window pass; map-side partial aggregation combines per-partition
    candidate bars before the single key shuffle, so the exchange carries
    bars, never events, and the plan scales linearly at 100 TB. (Spark
    plans SortAggregate here — min_by's struct ordering buffer is not
    hash-aggregable — trading a per-partition sort for the same
    partial+final shape; tests/test_plans.py pins partial-below-exchange.)
    The (ts, event_id) struct tiebreak makes open/close deterministic
    even under equal timestamps. No float arithmetic — open/high/low/
    close are SELECTED values, bit-identical on any engine."""
    e = load_tables(spark, sf_dir)["events"]
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bar_hour")
    ).agg(
        F.min_by("value", ordkey).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", ordkey).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


@query(
    "events_mad_outliers",
    oracle="""
    WITH r AS (
      SELECT event_type, value, event_id,
             row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), m AS (
      SELECT event_type,
             (min(CASE WHEN rn = (n + 1) // 2 THEN value END)
              + min(CASE WHEN rn = (n + 2) // 2 THEN value END)) / 2.0 AS med,
             min(n) AS n
      FROM r GROUP BY event_type
    ), d AS (
      SELECT e.event_type, abs(e.value - m.med) AS dev, e.event_id, m.med, m.n
      FROM events e JOIN m USING (event_type)
    ), rd AS (
      SELECT event_type, dev, med, n,
             row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn
      FROM d
    ), md AS (
      SELECT event_type,
             (min(CASE WHEN rn = (n + 1) // 2 THEN dev END)
              + min(CASE WHEN rn = (n + 2) // 2 THEN dev END)) / 2.0 AS mad,
             min(med) AS med, min(n) AS n
      FROM rd GROUP BY event_type
    )
    SELECT rd.event_type,
           CAST(min(md.n) AS BIGINT) AS n,
           min(md.med) AS median,
           min(md.mad) AS mad,
           CAST(SUM(CASE WHEN rd.dev > 3 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM rd JOIN md USING (event_type)
    GROUP BY rd.event_type
    """,
    tags=("events", "qa", "robust-stats"),
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via MEDIAN ABSOLUTE DEVIATION per series —
    the standard telemetry-QA screen that, unlike z-scores, is not itself
    corrupted by the outliers it hunts. Exact medians by construction:
    rank rows per group (value, event_id tiebreak), select the one-or-two
    middle VALUES, median = (lo + hi) / 2 — a picked-value average, the
    identical IEEE op on any engine, never an interpolating percentile
    whose ULPs differ. Same discipline for MAD over |v - median|. Plan:
    two window passes on the same event_type key (ranks reuse one
    partitioning) + tiny per-group medians broadcast back; at 100 TB a
    hot series splits fine because ranking is the only per-group sort
    and Spark spills sorts. Flags dev > 3*MAD."""
    from pyspark.sql import Window

    e = load_tables(spark, sf_dir)["events"]

    def _median_of(df: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(F.col(col).asc(), F.col("event_id").asc())
        wc = Window.partitionBy("event_type")
        r = df.select(
            "event_type",
            col,
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(wc).alias("_n"),
        )
        lo = F.floor((F.col("_n") + 1) / 2)
        hi = F.floor((F.col("_n") + 2) / 2)
        return r.groupBy("event_type").agg(
            (
                (
                    F.min(F.when(F.col("_rn") == lo, F.col(col)))
                    + F.min(F.when(F.col("_rn") == hi, F.col(col)))
                )
                / 2.0
            ).alias(out),
            F.min("_n").alias("_n"),
        )

    med = _median_of(e.select("event_type", "value", "event_id"), "value", "med")
    dev = e.join(F.broadcast(med.select("event_type", "med")), "event_type").select(
        "event_type",
        "event_id",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
    )
    mad = _median_of(dev, "dev", "mad")
    flagged = dev.join(
        F.broadcast(
            mad.join(med.select("event_type", "med"), "event_type").select(
                "event_type", "mad", "med", "_n"
            )
        ),
        "event_type",
    )
    return flagged.groupBy("event_type").agg(
        F.min("_n").cast("bigint").alias("n"),
        F.min("med").alias("median"),
        F.min("mad").alias("mad"),
        F.sum(F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_outliers"),
    )


@query(
    "events_frequent_sequences",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), t AS (
      SELECT user_id,
             event_type || '>' || e2 || '>' || e3 AS pattern
      FROM o WHERE e3 IS NOT NULL
    )
    SELECT pattern,
           CAST(count(DISTINCT user_id) AS BIGINT) AS support,
           CAST(count(*) AS BIGINT) AS occurrences
    FROM t GROUP BY pattern
    HAVING count(DISTINCT user_id) >= 5
    """,
    tags=("events", "sequence-mining"),
)
def events_frequent_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining over event streams (the GSP/PrefixSpan
    support-counting core): every consecutive event-type TRIGRAM per user,
    with support = distinct users exhibiting it and total occurrence
    count, kept at min-support 5. Consecutive-trigram enumeration needs
    ONE window pass (two leads over the same (user, ts) sort — no
    self-joins, unlike the classic a-priori join formulation), then one
    tiny pattern-keyed aggregate: the alphabet is event types, so the
    pattern space is bounded and the distinct-user count shuffles
    (pattern, user) pairs, not events. Scales linearly at 100 TB."""
    from pyspark.sql import Window

    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    o = e.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    t = o.select(
        "user_id",
        F.concat_ws(">", "event_type", "e2", "e3").alias("pattern"),
    )
    return (
        t.groupBy("pattern")
        .agg(
            F.count_distinct("user_id").cast("bigint").alias("support"),
            F.count(F.lit(1)).alias("occurrences"),
        )
        .where(F.col("support") >= 5)
    )


@query(
    "qa_benford_audit",
    oracle="""
    WITH c AS (
      SELECT CAST(abs(CAST(value * 100 AS BIGINT)) AS VARCHAR) AS s
      FROM events WHERE CAST(value * 100 AS BIGINT) <> 0
    ), d AS (
      SELECT CAST(substring(s, 1, 1) AS BIGINT) AS digit FROM c
    ), obs AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit
    ), t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM obs)
    SELECT obs.digit, obs.n,
           CAST(obs.n AS DOUBLE) / t.total AS observed_p,
           log10(1.0 + 1.0 / obs.digit) AS benford_p
    FROM obs CROSS JOIN t
    """,
    tags=("events", "qa", "benford"),
)
def qa_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over the value column — the
    forensic-QA screen for fabricated or truncated numeric feeds. The
    first significant digit comes from the INTEGER cents representation
    (cast(value*100 as bigint) -> string), never from double formatting,
    so both engines extract identical digits; expected frequencies are
    log10(1 + 1/d) computed from integer-literal inputs — the same IEEE
    double on any engine. One map-side digit projection + a 9-row
    aggregate; scales as a pure scan."""
    e = load_tables(spark, sf_dir)["events"]
    cents = (F.col("value") * 100).cast("bigint")
    d = e.where(cents != 0).select(
        F.substring(F.abs(cents).cast("string"), 1, 1).cast("bigint").alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = obs.agg(F.sum("n").alias("total"))
    return obs.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("observed_p"),
        F.log10(1.0 + 1.0 / F.col("digit")).alias("benford_p"),
    )


@query(
    "events_temporal_scd2_join",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               - row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS isl
      FROM events WHERE event_type <> 'purchase'
    ), i AS (
      SELECT user_id, event_type AS state, min(ts) AS valid_from
      FROM o GROUP BY user_id, event_type, isl
    ), p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE event_type = 'purchase'
    ), j AS (
      SELECT p.user_id, p.event_id, s.state
      FROM p ASOF JOIN i s
        ON p.user_id = s.user_id AND p.ts >= s.valid_from
    )
    SELECT state,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM j GROUP BY state
    """,
    tags=("events", "timeseries", "scd2", "temporal-join"),
)
def events_temporal_scd2_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME (temporal table) join: each purchase joins the SCD2
    state interval active at its timestamp — 'what state was this user
    in when they bought' (states = runs of non-purchase activity, so the
    lookup is never the purchase itself). Composition of
    timeseries.state_intervals and the as-of join (the idiomatic
    temporal-table lookup: match on the latest valid_from <= ts, no
    BETWEEN nested loop). Both sides share the user_id partitioning, so
    the as-of merge adds no extra corpus shuffle."""
    from hdp2_5_hive2_spark import timeseries

    e = load_tables(spark, sf_dir)["events"]
    intervals = timeseries.state_intervals(
        e.where(F.col("event_type") != "purchase"),
        ["user_id"], "event_type", ts_col="ts", tiebreak_col="event_id"
    ).select(
        "user_id", F.col("event_type").alias("state"), F.col("valid_from").alias("ts")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    j = timeseries.asof_join(purchases, intervals, on=["user_id"], right_cols=["state"])
    return j.groupBy(F.col("r_state").alias("state")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
    )


@query(
    "events_gap_histogram",
    oracle="""
    WITH o AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT event_type, length(bin(gap_us)) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(gap_us) AS BIGINT) AS min_us,
           CAST(max(gap_us) AS BIGINT) AS max_us
    FROM o WHERE gap_us IS NOT NULL AND gap_us > 0
    GROUP BY event_type, bucket
    """,
    tags=("events", "timeseries", "histogram"),
)
def events_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-gap histogram per event stream — the distribution a
    capacity planner or anomaly detector reads (burstiness, dead air).
    Gaps are exact microsecond integers from one lag() per type; buckets
    are powers of two via BINARY-STRING LENGTH (⌊log2⌋+1 with no
    transcendental log — the llm_token_length_histogram discipline).
    Zero-gap ties are excluded (same-µs arrivals carry no spacing
    information). One keyed window pass, then a tiny rollup."""
    from pyspark.sql import Window

    e = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    t = F.unix_micros("ts")
    o = e.select(
        "event_type", (t - F.lag(t).over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
    return o.groupBy(
        "event_type", F.length(F.bin("gap_us")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("gap_us").alias("min_us"),
        F.max("gap_us").alias("max_us"),
    )


@query(
    "events_watermark_lag_audit",
    oracle="""
    WITH o AS (
      SELECT event_type,
             greatest(0,
               max(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY event_type ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               - epoch_us(CAST(ts AS TIMESTAMP))) AS late_us
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_out_of_order,
           CAST(max(late_us) AS BIGINT) AS max_late_us,
           CAST(SUM(CASE WHEN late_us > 900000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_beyond_15m
    FROM o GROUP BY event_type
    """,
    tags=("events", "streaming", "qa", "watermark"),
)
def events_watermark_lag_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATERMARK SIZING audit: how disordered is each stream, really?
    Lateness of an event = running max event-time over ARRIVAL order
    (event_id, the ingest sequence) minus its own event-time — exactly the
    quantity a Structured Streaming watermark must exceed to never drop
    it. Reports out-of-order counts, the max observed lateness, and how
    many events a 15-minute watermark (the streaming module's default)
    would have dropped. One keyed running-max window; integers
    throughout."""
    from pyspark.sql import Window

    e = load_tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = F.unix_micros("ts")
    o = e.select(
        "event_type",
        F.greatest(F.lit(0).cast("bigint"), F.max(t).over(w) - t).alias("late_us"),
    )
    return o.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_out_of_order"),
        F.max("late_us").alias("max_late_us"),
        F.sum(F.when(F.col("late_us") > 900000000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_beyond_15m"),
    )


@query(
    "events_peak_concurrency",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(CAST(ts AS TIMESTAMP)) - epoch(CAST(lag(ts) OVER w AS TIMESTAMP)) > 300
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
      FROM flagged
    ), s AS (
      SELECT user_id, session_seq,
             epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
      FROM numbered GROUP BY user_id, session_seq
    ), d AS (
      SELECT start_us AS t, 1 AS delta FROM s
      UNION ALL SELECT end_us + 1, -1 FROM s
    ), r AS (
      SELECT t, SUM(delta) OVER (ORDER BY t, delta DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run
      FROM d
    ), m AS (SELECT t, max(run) AS run_t FROM r GROUP BY t),
    p AS (SELECT max(run_t) AS peak FROM m)
    SELECT CAST(p.peak AS BIGINT) AS peak_concurrency,
           CAST(min(m.t) AS BIGINT) AS first_peak_us
    FROM m CROSS JOIN p WHERE m.run_t = p.peak GROUP BY p.peak
    """,
    tags=("events", "timeseries", "sweepline"),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK CONCURRENCY via the sweep-line: how many 5-minute-gap sessions
    were simultaneously open at the worst moment (the capacity-planning
    number behind 'max simultaneous users'). Sessions become +-1 deltas at
    [start, end+1µs); the running delta sum's maximum is the peak, and
    the answer reports it with its first microsecond. Order ties resolve
    starts-before-ends, and per-instant maxima are order-invariant (the
    max at any t lands after all its +1s), so the result is deterministic
    under any shuffle. The global prefix sum is the two-phase distributed
    form — per-day partition windows plus a broadcast cumsum of tiny
    per-day totals — never a single-partition window over the deltas."""
    from pyspark.sql import Window

    sess = ev.sessionize_batch(spark, sf_dir, gap_minutes=5)
    s = sess.select(
        F.unix_micros("session_start").alias("start_us"),
        F.unix_micros("session_end").alias("end_us"),
    )
    d = s.select(F.col("start_us").alias("t"), F.lit(1).alias("delta")).unionAll(
        s.select((F.col("end_us") + 1).alias("t"), F.lit(-1).alias("delta"))
    )
    day = F.floor(F.col("t") / F.lit(86_400_000_000))
    # the delta frame feeds the per-day bases AND the running sum —
    # materialize once or the sessionize pipeline runs twice (guide §3.3)
    d = plan_checkpoint(d.withColumn("_day", day))
    in_day = Window.partitionBy("_day").orderBy(
        F.col("t").asc(), F.col("delta").desc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    day_order = Window.orderBy(F.col("_day").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = (
        d.groupBy("_day")
        .agg(F.sum("delta").alias("_dsum"))
        .withColumn("_base", F.coalesce(F.sum("_dsum").over(day_order), F.lit(0)))
        .select("_day", "_base")
    )
    r = (
        d.withColumn("_run_in", F.sum("delta").over(in_day))
        .join(F.broadcast(bases), "_day")
        .select("t", (F.col("_base") + F.col("_run_in")).alias("run"))
    )
    m = plan_checkpoint(r.groupBy("t").agg(F.max("run").alias("run_t")))
    p = m.agg(F.max("run_t").alias("peak"))
    return (
        m.join(F.broadcast(p), F.col("run_t") == F.col("peak"))
        .groupBy("peak")
        .agg(F.min("t").alias("first_peak_us"))
        .select(
            F.col("peak").cast("bigint").alias("peak_concurrency"),
            F.col("first_peak_us").cast("bigint").alias("first_peak_us"),
        )
    )


@query(
    "analyze_equiheight_histogram",
    oracle="""
    WITH r AS (
      SELECT l_quantity AS v,
             row_number() OVER (ORDER BY l_quantity, l_orderkey * 10 + l_linenumber)
               AS rn,
             count(*) OVER () AS n
      FROM lineitem
    )
    SELECT CAST((rn * 10 + n - 1) // n AS BIGINT) AS bucket,
           min(v) AS lo, max(v) AS hi,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM r GROUP BY 1
    """,
    tags=("stats", "analyze", "histogram"),
)
def analyze_equiheight_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style EQUI-HEIGHT histogram on lineitem.l_quantity
    (stats.equiheight_histogram — the CBO selectivity statistic Hive
    builds for ANALYZE ... FOR COLUMNS, HiveStatsUtils; Spark's
    statistics.histogram.enabled equivalent): 10 buckets of ~N/10 rows
    each with SELECTED boundary values (rank positions, no
    interpolation). The oracle uses a plain global window to define the
    semantics; the Spark plan is the two-phase distributed rank — never
    a one-partition sort of the fact table."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return stats.equiheight_histogram(
        li.withColumn(
            "_rid", F.col("l_orderkey") * 10 + F.col("l_linenumber")
        ),
        "l_quantity",
        n_buckets=10,
        id_col="_rid",
    )


@query(
    "events_incremental_rollup",
    oracle="""
    SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "incremental", "rollup"),
)
def events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL AGGREGATE MAINTENANCE — the pattern that makes daily
    100 TB rollups affordable: the standing state (all days before
    Jan 25) and the new batch (Jan 25 on) aggregate SEPARATELY, then
    merge by monoid addition on a full outer join — count and decimal-sum
    are commutative monoids, so merged state is provably identical to a
    full recompute, and the ORACLE IS the full recompute (a hash match
    proves the maintenance algebra, not just the numbers). Each side
    partial-aggregates map-side before its own small shuffle; the merge
    joins two already-aggregated key tables — the fact table is never
    re-scanned across days in production use."""
    e = load_tables(spark, sf_dir)["events"]
    cutoff = F.lit("2024-01-25").cast("date")
    day = F.col("ts").cast("date")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", day.alias("day")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("tot"),
        )

    state = rollup(e.where(day < cutoff))
    delta = rollup(e.where(day >= cutoff))
    merged = state.alias("s").join(
        delta.alias("d"), ["event_type", "day"], "full_outer"
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return merged.select(
        "event_type",
        "day",
        (
            F.coalesce(F.col("s.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))
        ).cast("bigint").alias("n"),
        (
            F.coalesce(F.col("s.tot"), zero) + F.coalesce(F.col("d.tot"), zero)
        ).cast("double").alias("total_value"),
    )


@query(
    "events_gap_fill_locf",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             date_trunc('minute', CAST(ts AS TIMESTAMP)) AS m,
             last(value ORDER BY ts, event_id) AS last_value
      FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01 00:00:00'
        AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-01 06:00:00'
      GROUP BY 1, 2
    ), grid AS (
      SELECT t.event_type, g.m
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (
        SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                      TIMESTAMP '2024-01-01 05:59:00',
                                      INTERVAL 1 MINUTE)) AS m
      ) g
    ), joined AS (
      SELECT grid.event_type, grid.m, obs.last_value,
             count(obs.last_value) OVER (
               PARTITION BY grid.event_type ORDER BY grid.m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS grp
      FROM grid LEFT JOIN obs USING (event_type, m)
    )
    SELECT event_type, m AS minute,
           max(last_value) OVER (PARTITION BY event_type, grp) AS value_locf,
           CASE WHEN last_value IS NULL THEN 1 ELSE 0 END AS filled
    FROM joined
    """,
    tags=("events", "timeseries", "gap-fill"),
)
def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAP FILLING with last-observation-carried-forward — the
    TimescaleDB `time_bucket_gapfill + locf` staple: a dense per-series
    minute grid (6 h window) left-joins the observed per-minute closes
    (max_by on (ts, event_id) — a SELECTED value, deterministic under
    ties) and empty minutes carry the previous value forward.
    Spark-first carry: `last(value, ignorenulls=True)` over the grid
    order — one window on the series key; the grid is
    series x minutes, generated with `sequence`, never a driver loop.
    Minutes before a series' first observation stay NULL. `filled`
    marks synthesized rows."""
    from pyspark.sql import Window

    e = load_tables(spark, sf_dir)["events"]
    lo = F.lit("2024-01-01 00:00:00").cast("timestamp")
    hi = F.lit("2024-01-01 06:00:00").cast("timestamp")
    obs = (
        e.where((F.col("ts") >= lo) & (F.col("ts") < hi))
        .groupBy(
            "event_type", F.date_trunc("minute", "ts").alias("minute")
        )
        .agg(F.max_by("value", F.struct("ts", "event_id")).alias("last_value"))
    )
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(1).select(
                F.explode(
                    F.sequence(lo, F.lit("2024-01-01 05:59:00").cast("timestamp"),
                               F.expr("INTERVAL 1 MINUTE"))
                ).alias("minute")
            )
        )
    )
    j = grid.join(obs, ["event_type", "minute"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("minute").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "event_type",
        "minute",
        F.last("last_value", ignorenulls=True).over(w).alias("value_locf"),
        F.when(F.col("last_value").isNull(), 1).otherwise(0).alias("filled"),
    )


@query(
    "qa_fanout_histogram",
    oracle="""
    WITH f AS (
      SELECT o_custkey, count(*) AS fanout FROM orders GROUP BY o_custkey
    )
    SELECT length(bin(fanout)) AS bucket,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(min(fanout) AS BIGINT) AS min_fanout,
           CAST(max(fanout) AS BIGINT) AS max_fanout,
           CAST(SUM(fanout) AS BIGINT) AS n_orders
    FROM f GROUP BY bucket
    """,
    tags=("qa", "profiling", "join"),
)
def qa_fanout_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN FAN-OUT profile: the orders-per-customer distribution,
    power-of-two bucketed — the number a modeler checks before joining
    (is this FK 1:few or 1:millions? will the join skew?). Hot-key
    detection for free: the top bucket IS the skew candidate list the
    salting planner would feed on. One key aggregate plus a 10-row
    rollup; binary-string-length bucketing, no logs."""
    o = load_tables(spark, sf_dir)["orders"]
    f = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("fanout"))
    return f.groupBy(F.length(F.bin("fanout")).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("fanout").alias("min_fanout"),
        F.max("fanout").alias("max_fanout"),
        F.sum("fanout").alias("n_orders"),
    )


@query(
    "events_changepoint_cusum",
    oracle="""
    WITH c AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             count(*) AS cnt
      FROM events GROUP BY 1, 2
    ), t AS (
      SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n_bins
      FROM c GROUP BY event_type
    ), cu AS (
      SELECT c.event_type, c.h,
             SUM(c.cnt * t.n_bins - t.s) OVER (
               PARTITION BY c.event_type ORDER BY c.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cusum_scaled
      FROM c JOIN t USING (event_type)
    )
    SELECT cu.event_type,
           CAST(max(abs(cusum_scaled)) AS BIGINT) AS max_abs_cusum,
           min(cu.h) FILTER (
             WHERE abs(cusum_scaled) = (
               SELECT max(abs(c2.cusum_scaled)) FROM cu c2
               WHERE c2.event_type = cu.event_type
             )
           ) AS changepoint_hour,
           CAST(min(t.n_bins) AS BIGINT) AS n_bins
    FROM cu JOIN t USING (event_type)
    GROUP BY cu.event_type
    """,
    tags=("events", "timeseries", "changepoint"),
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM CHANGEPOINT detection over hourly event rates — where did
    the rate regime shift? The cumulative sum of deviations from the
    series mean peaks (in absolute value) AT the changepoint (Page 1954;
    the ECP/offline-CUSUM estimator). INTEGER-exact by scaling: deviation
    = cnt*n_bins - total (the mean times n_bins), so no float ever
    enters; the argmax hour is the estimated changepoint, min-hour
    tiebreak. One keyed running-sum window over the (type, hour) count
    table — bins-sized, not events-sized."""
    from pyspark.sql import Window

    e = load_tables(spark, sf_dir)["events"]
    c = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    t = c.groupBy("event_type").agg(
        F.sum("cnt").alias("s"), F.count(F.lit(1)).alias("n_bins")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("h").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cu = c.join(F.broadcast(t), "event_type").select(
        "event_type",
        "h",
        "n_bins",
        F.sum(F.col("cnt") * F.col("n_bins") - F.col("s")).over(w).alias("cusum"),
    )
    peak = cu.groupBy("event_type").agg(
        F.max(F.abs(F.col("cusum"))).alias("max_abs_cusum")
    )
    return (
        cu.join(F.broadcast(peak), "event_type")
        .where(F.abs(F.col("cusum")) == F.col("max_abs_cusum"))
        .groupBy("event_type")
        .agg(
            F.min("max_abs_cusum").cast("bigint").alias("max_abs_cusum"),
            F.min("h").alias("changepoint_hour"),
            F.min("n_bins").cast("bigint").alias("n_bins"),
        )
    )


@query(
    "events_item_covisitation",
    oracle="""
    WITH si AS (
      SELECT DISTINCT user_id,
             CAST(json_extract(props, '$.k') AS BIGINT) AS item
      FROM events
    )
    SELECT a.item AS item_a, b.item AS item_b,
           CAST(count(*) AS BIGINT) AS n_users
    FROM si a JOIN si b
      ON a.user_id = b.user_id AND a.item < b.item
    GROUP BY a.item, b.item
    HAVING count(*) >= 5
    """,
    tags=("events", "recsys", "covisitation"),
)
def events_item_covisitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITEM CO-VISITATION matrix — the collaborative-filtering building
    block (Amazon's item-to-item CF; the candidate generator behind
    'users who viewed X also viewed Y'): item pairs sharing a user,
    deduped to once per user, kept at support >= 5 distinct users. Items
    come from the props JSON (json k; sessions at this fixture are
    near-singleton, so the co-occurrence unit is the user history). The
    pair join is per user — fan-out bounded by items-per-user squared,
    never corpus-sized; distinct pass and join share the user
    partitioning. Real deployments cap items-per-user (power users
    otherwise contribute quadratic pairs) — the same hot-bucket cap
    discipline as llm_fingerprint_overlap."""
    e = load_tables(spark, sf_dir)["events"]
    si = e.select(
        "user_id", F.get_json_object("props", "$.k").cast("bigint").alias("item")
    ).distinct()
    a = si.alias("a")
    b = si.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .where(F.col("n_users") >= 5)
    )
