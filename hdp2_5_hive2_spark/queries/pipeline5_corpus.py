"""Round-13 corpus: arrival-process and mixture-composition audits over
the event stream plus three corpus/serving probes — sessionization
threshold sensitivity (the gap-parameter sweep run BEFORE freezing a
sessionizer), the diurnal load profile (hour-of-day mix and
peak-to-mean, the capacity-planning readout), whale concentration of
event value (nearest-rank top-decile share, cents-quantized), event-type
mix drift between stream halves (the vocab-drift idiom on the type
distribution), positional boilerplate (top-term share per head token
position — template detection the bag-of-words stats miss), windowed
type-token ratio per source (lexical diversity on disjoint 50-token
windows, length-debiased unlike a whole-doc TTR), and ANN
deletion-staleness recall (recall@10 after dropping every 5th index
vector — the index-maintenance knob: how stale can the index get before
serving quality moves).

Oracle discipline (the r4-r12 standard): every floating-point output is
eliminated or quantized first — event values quantize to CENTS via
floor(value·100) BEFORE any SUM (raw float SUMs diverge across
accumulation orders; the r13 pre-probe finding), ratios ship as integer
milli via BIGINT floor division, embedding kernels ride the
llm.similarity.quantized_* int64 family, and inter-arrival gaps are
epoch SECONDS (µs gaps overflow int64 under squaring; DuckDB's epoch()
ROUNDS so oracles use epoch_us // 1000000 — both r12 findings).

Reference surface: Hive's own corpus stops at GenericUDAF aggregates and
windowing (ql/udf/generic/, FunctionRegistry.java:376-468); these
queries are the LLM-pipeline / stream-analytics layer above that surface
(SURVEY.md §2 "training-data pipeline" axis).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdp2_5_hive2_spark.catalog import load_tables
from hdp2_5_hive2_spark.llm import similarity
from hdp2_5_hive2_spark.llm.text import _arrow_fence, plan_checkpoint
from hdp2_5_hive2_spark.queries.registry import query


@query(
    "llm_positional_boilerplate",
    oracle="""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
               FROM documents
               WHERE len(string_split_regex(trim(text), '\\s+')) >= 16),
    p AS (SELECT CAST(u.k AS BIGINT) AS pos, tk[u.k] AS term
          FROM t, unnest(generate_series(1, 16)) AS u(k)),
    c AS (SELECT pos, term, CAST(count(*) AS BIGINT) AS n
          FROM p GROUP BY pos, term),
    r AS (SELECT pos, term, n,
                 row_number() OVER (PARTITION BY pos ORDER BY n DESC, term)
                   AS rk
          FROM c),
    d AS (SELECT pos, CAST(SUM(n) AS BIGINT) AS n_docs FROM c GROUP BY pos)
    SELECT r.pos, d.n_docs, r.term AS top_term, r.n AS top_n,
           CAST(r.n * 1000 // d.n_docs AS BIGINT) AS share_milli
    FROM r JOIN d USING (pos) WHERE r.rk = 1
    """,
    tags=("llm", "text", "boilerplate", "audit"),
)
def llm_positional_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-boilerplate audit: for documents of >= 16 tokens, the
    single most frequent term AT each head position 1..16 and its share of
    documents, in exact milli — the template-generator signature
    bag-of-words frequency stats cannot see (a corpus where position 1 is
    'Subject:' in 40% of docs has positional boilerplate even if
    'Subject:' is globally rare). Reads as a per-position health
    certificate: shares near uniform-vocabulary level mean no template;
    a spike at one position is a strip-the-header candidate for the
    curation pass (llm_header_boilerplate's cross-doc shared-PREFIX check
    is the 8-gram exact-match sibling; this one catches single-slot
    templates with varying neighbors). Plan / 100 TB: one map-side
    tokenize + head slice (16 tokens per doc regardless of length), a
    (pos, term) partial-agg shuffle bounded by 16 × vocab, a 16-partition
    window over per-position term counts (position is the partition key,
    16 groups of vocabulary-bounded size), and a broadcast of the 16-row
    per-position doc totals — corpus text never shuffles."""
    d = load_tables(spark, sf_dir)["documents"]
    tk = d.select(F.split(F.trim(F.col("text")), r"\s+").alias("tk")).where(
        F.size("tk") >= 16
    )
    p = tk.select(
        F.posexplode(F.slice("tk", 1, 16)).alias("pos0", "term")
    ).select((F.col("pos0") + 1).cast("bigint").alias("pos"), "term")
    c = p.groupBy("pos", "term").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("pos").orderBy(F.desc("n"), F.asc("term"))
    r = c.withColumn("rk", F.row_number().over(w)).where(F.col("rk") == 1)
    d_tot = c.groupBy("pos").agg(F.sum("n").cast("bigint").alias("n_docs"))
    return r.join(F.broadcast(d_tot), "pos").select(
        "pos",
        "n_docs",
        F.col("term").alias("top_term"),
        F.col("n").alias("top_n"),
        F.expr("n * 1000 div n_docs").cast("bigint").alias("share_milli"),
    )


@query(
    "events_session_gap_sweep",
    oracle="""
    WITH g AS (
      SELECT user_id,
             CAST(epoch_us(ts) // 1000000 AS BIGINT)
               - lag(CAST(epoch_us(ts) // 1000000 AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events
    ),
    a AS (SELECT
            CAST(SUM(CASE WHEN gap > 1800 THEN 1 ELSE 0 END) AS BIGINT)
              AS c1800,
            CAST(SUM(CASE WHEN gap > 3600 THEN 1 ELSE 0 END) AS BIGINT)
              AS c3600,
            CAST(SUM(CASE WHEN gap > 7200 THEN 1 ELSE 0 END) AS BIGINT)
              AS c7200
          FROM g WHERE gap IS NOT NULL),
    u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
          FROM events),
    t AS (SELECT CAST(1800 AS BIGINT) AS thr, c1800 AS n_gaps_over FROM a
          UNION ALL SELECT 3600, c3600 FROM a
          UNION ALL SELECT 7200, c7200 FROM a)
    SELECT t.thr, t.n_gaps_over, u.n_users,
           CAST(t.n_gaps_over + u.n_users AS BIGINT) AS n_sessions
    FROM t CROSS JOIN u
    """,
    tags=("events", "timeseries", "session", "sweep"),
)
def events_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session gap-threshold sweep: the session count the corpus would
    yield at inactivity thresholds 1800/3600/7200 s — n_sessions(thr) =
    (inter-event gaps exceeding thr) + one opening session per user.
    The parameter-sensitivity read a sessionizer is frozen against
    (events_session_funnel et al. hardcode 1800 s): if the count moves
    sharply between 1800 and 3600 the threshold is load-bearing and needs
    a per-surface calibration; a flat curve means any value in the band
    is safe. Gaps are epoch SECONDS over the same (ts, event_id)
    user-partitioned lag window as events_interarrival_burstiness (the
    oracle floors via epoch_us // 1000000 — DuckDB's epoch() rounds).
    Plan / 100 TB: ONE user-partitioned lag window (the stream's natural
    key) feeding ONE conditional aggregate over the three constant
    thresholds — no join fan-out, no per-threshold re-scan; the 3-row
    sweep unpivots from the single aggregate row via stack."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("long")
    g = ev.select("user_id", (sec - F.lag(sec).over(w)).alias("gap")).where(
        F.col("gap").isNotNull()
    )

    def over(thr: int):
        return (
            F.sum(F.when(F.col("gap") > thr, 1).otherwise(0))
            .cast("bigint")
            .alias(f"c{thr}")
        )

    a = g.agg(over(1800), over(3600), over(7200))
    u = ev.agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    return (
        a.crossJoin(F.broadcast(u))
        .select(
            F.expr(
                "stack(3, 1800L, c1800, 3600L, c3600, 7200L, c7200)"
                " AS (thr, n_gaps_over)"
            ),
            "n_users",
        )
        .select(
            "thr",
            "n_gaps_over",
            "n_users",
            (F.col("n_gaps_over") + F.col("n_users"))
            .cast("bigint")
            .alias("n_sessions"),
        )
    )


@query(
    "events_diurnal_profile",
    oracle="""
    WITH h AS (SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
                      CAST(count(*) AS BIGINT) AS n_events
               FROM events GROUP BY 1),
    t AS (SELECT SUM(n_events) AS total, MAX(n_events) AS peak FROM h)
    SELECT h.hr, h.n_events,
           CAST(h.n_events * 24000 // t.total AS BIGINT) AS load_milli,
           CAST(t.peak * 24000 // t.total AS BIGINT) AS peak_mean_milli
    FROM h CROSS JOIN t
    """,
    tags=("events", "timeseries", "diurnal", "capacity"),
)
def events_diurnal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal load profile: events per hour-of-day with each hour's load
    index in milli-of-mean (n·24000 // total — 1000 = exactly the uniform
    rate) and the peak-to-mean ratio as the headline capacity number
    (provision for peak, bill for mean; a peak_mean_milli near 1000 means
    a flat stream where autoscaling buys nothing). hour() runs on the
    session-zone timestamp — the catalog normalizes the parquet
    TIMESTAMP(NANOS) column to a UTC session timestamp on both engines,
    so the wall-clock hour is identical (the r13 pre-probe confirmed
    Spark hour(ts) == DuckDB EXTRACT(hour) on the nanos path). Plan /
    100 TB: one map-side hour projection with partial aggregation to a
    24-row exchange, then a broadcast of the 2-value total/peak scalar —
    the canonical minimal-shuffle profile query."""
    ev = load_tables(spark, sf_dir)["events"]
    h = ev.groupBy(F.hour("ts").cast("bigint").alias("hr")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    t = h.agg(
        F.sum("n_events").alias("total"), F.max("n_events").alias("peak")
    )
    return h.crossJoin(F.broadcast(t)).select(
        "hr",
        "n_events",
        F.expr("n_events * 24000 div total").cast("bigint").alias("load_milli"),
        F.expr("peak * 24000 div total").cast("bigint").alias("peak_mean_milli"),
    )


@query(
    "llm_windowed_ttr",
    oracle="""
    WITH t AS (SELECT doc_id, source,
                      string_split_regex(trim(text), '\\s+') AS tk
               FROM documents),
    w AS (SELECT source,
                 CAST(len(list_distinct(tk[u.s:u.s + 49])) AS BIGINT) AS d
          FROM t, unnest(generate_series(1, len(tk) - 49, 50)) AS u(s))
    SELECT source, CAST(count(*) AS BIGINT) AS n_windows,
           CAST(SUM(d) AS BIGINT) AS sum_distinct,
           CAST(SUM(d) * 1000 // (count(*) * 50) AS BIGINT) AS ttr_milli
    FROM w GROUP BY source
    """,
    tags=("llm", "text", "diversity", "ttr"),
)
def llm_windowed_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed type-token ratio per source: distinct tokens per disjoint
    50-token window, aggregated as sum_distinct·1000 // (windows·50) —
    the length-debiased lexical-diversity gauge (whole-document TTR
    falls mechanically with length by Heaps' law, so cross-source
    whole-doc TTRs are incomparable; fixed windows remove the length
    confound — the MATTR/MSTTR idea from corpus linguistics). Low
    windowed TTR flags the repetitive/templated source a diversity
    filter (llm_token_diversity is the per-doc Gini-Simpson sibling)
    should down-weight. Only FULL windows count (window start s with
    s + 49 <= len). Plan / 100 TB: ONE map-side Arrow pass — tokenize
    and fold each document's windows in-batch (per-doc set work, no
    token ever shuffles, same shape as llm_prefix_echo) — then a
    source-sized aggregate."""
    d = load_tables(spark, sf_dir)["documents"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs: list[str] = []
            n_w: list[int] = []
            s_d: list[int] = []
            for src, t in zip(pdf["source"], pdf["text"]):
                toks = t.split() if isinstance(t, str) else []
                if len(toks) < 50:
                    continue
                nw = dist = 0
                for s in range(0, len(toks) - 49, 50):
                    nw += 1
                    dist += len(set(toks[s : s + 50]))
                srcs.append(src)
                n_w.append(nw)
                s_d.append(dist)
            yield pd.DataFrame(
                {
                    "source": srcs,
                    "nw": pd.array(n_w, dtype="int64"),
                    "d": pd.array(s_d, dtype="int64"),
                }
            )

    per_doc = _arrow_fence(d.select("source", "text")).mapInPandas(
        gen, "source string, nw bigint, d bigint"
    )
    return per_doc.groupBy("source").agg(
        F.sum("nw").cast("bigint").alias("n_windows"),
        F.sum("d").cast("bigint").alias("sum_distinct"),
        F.expr("sum(d) * 1000 div (sum(nw) * 50)")
        .cast("bigint")
        .alias("ttr_milli"),
    )


@query(
    "llm_ann_staleness_recall",
    oracle="""
    WITH qe AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]), x -> floor(x * 1024))
               AS qv
      FROM embeddings
    ),
    corpus AS (SELECT vec_id, qv FROM qe WHERE vec_id >= 8),
    stale AS (SELECT vec_id, qv FROM corpus WHERE vec_id % 5 <> 0),
    queries AS (SELECT vec_id, qv FROM qe WHERE vec_id < 8),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_dot_product(c.qv, q.qv) DESC, c.vec_id) AS rk
        FROM corpus c CROSS JOIN queries q
      ) WHERE rk <= 10
    ),
    approx AS (
      SELECT query_id AS aq, neighbor_id AS an FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_dot_product(c.qv, q.qv) DESC, c.vec_id) AS rk
        FROM stale c CROSS JOIN queries q
      ) WHERE rk <= 10
    )
    SELECT e.query_id,
           CAST(SUM(CASE WHEN a.an IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hits,
           CAST(SUM(CASE WHEN a.an IS NOT NULL THEN 1 ELSE 0 END) * 100
                AS BIGINT) AS recall_milli
    FROM exact e
    LEFT JOIN approx a ON a.aq = e.query_id AND a.an = e.neighbor_id
    GROUP BY e.query_id
    """,
    tags=("llm", "similarity", "ann", "staleness"),
)
def llm_ann_staleness_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN deletion-staleness recall: recall@10 against the FULL-corpus
    ground truth when the served index has silently lost every 5th vector
    (vec_id % 5 == 0 — deletions/TTL-expiry that a lazily-compacted index
    has not reconciled). The index-maintenance knob: recall_milli
    (n_hits × 100 over the 10 true neighbors; perfect = 1000) read
    against the 800-ish level tells how aggressively tombstone compaction
    must run before serving quality moves — structural staleness, unlike
    llm_quantized_ann_recall's precision loss. Both rankings ride the
    same exact int64 quantized-dot total order ((dot desc, id)) as the
    r12 IVF sweep. Plan / 100 TB: two quantized_dot_topk passes (queries
    broadcast, per-batch Arrow top-k, query-partitioned merge window);
    the stale view is a pushed-down filter on the same scan — no second
    copy of the corpus, no all-pairs beyond the 8-query audit scan."""
    e = load_tables(spark, sf_dir)["embeddings"]
    corpus = e.filter(F.col("vec_id") >= 8)
    queries = e.filter(F.col("vec_id") < 8)
    stale = corpus.filter(F.col("vec_id") % 5 != 0)
    # ONE query-collect job shared by the live and stale passes (guide §1.2).
    qb = similarity.collect_query_block(
        queries, max_queries=100_000, caller="llm_ann_staleness_recall"
    )
    exact = similarity.quantized_dot_topk(corpus, queries, k=10, q_rows=qb).select(
        "query_id", "neighbor_id"
    )
    approx = similarity.quantized_dot_topk(stale, queries, k=10, q_rows=qb).select(
        F.col("query_id").alias("aq"),
        F.col("neighbor_id").alias("an"),
        F.lit(1).alias("hit"),
    )
    hits = F.sum(F.coalesce(F.col("hit"), F.lit(0)))
    return (
        exact.join(
            approx,
            (F.col("query_id") == F.col("aq"))
            & (F.col("neighbor_id") == F.col("an")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            hits.cast("bigint").alias("n_hits"),
            (hits * 100).cast("bigint").alias("recall_milli"),
        )
    )


@query(
    "events_value_pareto",
    oracle="""
    WITH u AS (SELECT user_id,
                      CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                        AS cents
               FROM events GROUP BY user_id),
    r AS (SELECT user_id, cents,
                 row_number() OVER (ORDER BY cents DESC, user_id) AS rk
          FROM u),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
                 CAST(SUM(cents) AS BIGINT) AS total_cents FROM u)
    SELECT t.n_users,
           CAST(count(*) AS BIGINT) AS top_users,
           CAST(SUM(r.cents) AS BIGINT) AS top_cents,
           t.total_cents,
           CAST(SUM(r.cents) * 1000 // t.total_cents AS BIGINT)
             AS pareto_milli
    FROM r CROSS JOIN t
    WHERE r.rk <= (t.n_users + 9) // 10
    GROUP BY t.n_users, t.total_cents
    """,
    tags=("events", "revenue", "pareto", "audit"),
)
def events_value_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whale concentration of event value: the share of total value held
    by the top decile of users (nearest-rank: the ceil(n/10) highest
    spenders by (cents desc, user_id)), in exact milli. The
    revenue-concentration read that decides whether per-user rate limits
    and cache tiers are worth building — pareto_milli near 100 means a
    flat value distribution (synthetic uniform values read ~140); real
    marketplaces read 500+. Event values QUANTIZE TO CENTS
    (floor(value·100) as int64) BEFORE any SUM — the r13 pre-probe
    finding: float SUMs over different accumulation orders diverge in
    the last ulps, so the money column goes integer at the first touch,
    exactly how a ledger would store it.

    Plan / 100 TB — the distributed-sort top-k-SUM shape (the
    llm_front_coding_gain recipe applied to a rank cut): per-user cents
    are near-unique, so the two-phase bucket rank (balanced_shards) would
    degenerate — its bucket-count cumsum table approaches user
    cardinality. Instead the user frame range-partitions on
    (cents desc, user_id) — Spark's distributed sort, each shard a
    contiguous rank slice — ONE Arrow pass folds per-shard (first-key,
    count, sum) summaries, the ≤ shuffle-width summary rows resolve the
    decile cut into a per-shard take count (config-bounded driver sync,
    the k-means/ring precedent — NEVER a data-sized collect), and a
    second Arrow pass sums exactly each shard's slice of the top decile.
    No global window, no rank materialized per user, corpus never leaves
    its shard."""
    ev = load_tables(spark, sf_dir)["events"]
    u = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    # checkpoint: the ranged frame feeds TWO Arrow passes (summaries, cut)
    # and repartitionByRange itself runs a boundary-sampling job
    ranged = (
        u.repartitionByRange(F.col("cents").desc(), F.col("user_id").asc())
        .sortWithinPartitions(F.col("cents").desc(), F.col("user_id").asc())
        .transform(plan_checkpoint)
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        first = None
        n = tot = 0
        for pdf in batches:
            if not len(pdf):
                continue
            if first is None:
                first = (int(pdf["cents"].iloc[0]), int(pdf["user_id"].iloc[0]))
            n += len(pdf)
            tot += int(pdf["cents"].sum())
        if n:
            yield pd.DataFrame(
                {
                    "fc": pd.array([first[0]], dtype="int64"),
                    "fu": pd.array([first[1]], dtype="int64"),
                    "n": pd.array([n], dtype="int64"),
                    "tot": pd.array([tot], dtype="int64"),
                }
            )

    summ = sorted(
        ranged.mapInPandas(
            summarize, "fc bigint, fu bigint, n bigint, tot bigint"
        ).collect(),
        key=lambda r: (-r.fc, r.fu),
    )
    n_users = sum(r.n for r in summ)
    total_cents = sum(r.tot for r in summ)
    k = (n_users + 9) // 10  # nearest-rank top decile
    take: dict[tuple[int, int], int] = {}
    off = 0
    for r in summ:
        take[(int(r.fc), int(r.fu))] = max(0, min(int(r.n), k - off))
        off += int(r.n)

    def cut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = -1
        taken = top = 0
        for pdf in batches:
            if not len(pdf):
                continue
            if t < 0:
                t = take.get(
                    (int(pdf["cents"].iloc[0]), int(pdf["user_id"].iloc[0])), 0
                )
            if taken < t:
                m = min(len(pdf), t - taken)
                top += int(pdf["cents"].iloc[:m].sum())
                taken += m
        if taken:
            yield pd.DataFrame(
                {
                    "tu": pd.array([taken], dtype="int64"),
                    "tc": pd.array([top], dtype="int64"),
                }
            )

    parts = ranged.mapInPandas(cut, "tu bigint, tc bigint")
    return (
        parts.agg(
            F.coalesce(F.sum("tu"), F.lit(0)).cast("bigint").alias("top_users"),
            F.coalesce(F.sum("tc"), F.lit(0)).cast("bigint").alias("top_cents"),
        )
        .select(
            F.lit(n_users).cast("bigint").alias("n_users"),
            "top_users",
            "top_cents",
            F.lit(total_cents).cast("bigint").alias("total_cents"),
        )
        .select(
            "*",
            F.expr("top_cents * 1000 div total_cents")
            .cast("bigint")
            .alias("pareto_milli"),
        )
        # an empty stream yields zero rows on both engines (the
        # front-coding empty-input lesson, applied at design time)
        .where(F.lit(n_users) > 0)
    )


@query(
    "events_type_mix_drift",
    oracle="""
    WITH mid AS (SELECT CAST(max(event_id) + 1 AS BIGINT) // 2 AS m
                 FROM events),
    ty AS (SELECT DISTINCT event_type FROM events),
    h AS (SELECT CASE WHEN event_id < (SELECT m FROM mid) THEN 0 ELSE 1 END
                   AS half,
                 event_type, CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
    j AS (SELECT t.event_type, coalesce(a.c, 0) AS c0, coalesce(b.c, 0) AS c1
          FROM ty t
          LEFT JOIN (SELECT * FROM h WHERE half = 0) a USING (event_type)
          LEFT JOIN (SELECT * FROM h WHERE half = 1) b USING (event_type)),
    tot AS (SELECT SUM(c0) AS n0, SUM(c1) AS n1 FROM j)
    SELECT CAST(SUM(abs(c0 * tot.n1 - c1 * tot.n0)) AS BIGINT) AS l1_cross,
           CAST(MAX(tot.n0) AS BIGINT) AS n0,
           CAST(MAX(tot.n1) AS BIGINT) AS n1,
           CAST(count(*) AS BIGINT) AS n_types
    FROM j CROSS JOIN tot
    """,
    tags=("events", "drift", "mixture", "audit"),
)
def events_type_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type mix drift between stream halves (first vs second half
    of the event_id range — the release-over-release composition check
    run before retraining on the newer half): L1 distance between the two
    halves' event-type distributions, cross-multiplied exact
    (Σ|c0·n1 − c1·n0| — the llm_vocab_half_drift integer idiom, so no
    engine ever divides) over the FULL type basket (a type present in
    only one half still contributes via the coalesce-0 left joins — the
    ADVICE-r11 novelty-decay lesson applied at design time). The
    midpoint is exact int64 (max(event_id)+1) div 2. A spike means the
    newer half's instrumentation changed (new event type, dropped
    logger) and per-type models need re-baselining. Plan / 100 TB: one
    (half, type) partial aggregate (types are near-constant cardinality,
    so the exchange is tiny), a type-sized pivot, a broadcast 2-value
    total, and a one-row fold — the raw stream never shuffles."""
    ev = load_tables(spark, sf_dir)["events"]
    mid = ev.agg(F.expr("(max(event_id) + 1) div 2").cast("bigint").alias("m"))
    ty = ev.select("event_type").distinct()
    h = (
        ev.crossJoin(F.broadcast(mid))
        .select(
            F.when(F.col("event_id") < F.col("m"), 0).otherwise(1).alias("half"),
            "event_type",
        )
        .groupBy("half", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wide = h.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 0, F.col("c")).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("half") == 1, F.col("c")).otherwise(0)).alias("c1"),
    )
    j = ty.join(wide, "event_type", "left").fillna(0, subset=["c0", "c1"])
    tot = j.agg(F.sum("c0").alias("n0"), F.sum("c1").alias("n1"))
    return j.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.abs(F.col("c0") * F.col("n1") - F.col("c1") * F.col("n0")))
        .cast("bigint")
        .alias("l1_cross"),
        F.max("n0").cast("bigint").alias("n0"),
        F.max("n1").cast("bigint").alias("n1"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
