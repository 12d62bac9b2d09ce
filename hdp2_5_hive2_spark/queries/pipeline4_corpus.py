"""Round-12 corpus: sampling-primitive validation and serving-knob
ablations past the r11 health-check suite — the Jaccard-vs-containment
gap on near-dup candidate pairs (the truncation/quote detector plain
Jaccard misses), an md5-draw uniformity audit (validates the hash-draw
idiom every repo sampler rides: ppswor, salting, split assignment), an
IVF multi-probe recall sweep (nprobe = 1/2/4 — the serving knob
llm_recall_curve's single-probe curve can't see), per-user inter-arrival
burstiness over event streams (CoV² in exact integers), prefix-echo
self-repetition forensics (opening-bigram echo in the document tail —
the template/boilerplate generator signature), per-source exact length
bands (nearest-rank p10/p50/p90), and the front-coding
prefix-compression gain on the sorted vocabulary (the dictionary-layout
estimate a posting-list writer reads).

Oracle discipline (the r4-r11 standard): every floating-point output is
eliminated or a FIXED expression tree of single IEEE-754 ops over exact
integers — ratios ship as integer milli/centi via BIGINT floor
division. md5-derived draws use the cross-engine
conv(substring(md5(..)))/('0x' || ..)::BIGINT idiom. Embedding kernels
quantize floor(v·1024) once and stay in int64 (the
llm.similarity.quantized_* family).

Reference surface: Hive's own corpus stops at n-gram aggregates and
GenericUDAFs (ql/udf/generic/GenericUDAFnGrams.java,
FunctionRegistry.java:393-399); these queries are the LLM-pipeline layer
the engine adds above that surface (SURVEY.md §2 "training-data
pipeline" axis).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdp2_5_hive2_spark.catalog import load_tables
from hdp2_5_hive2_spark.llm import curation, retrieval, similarity
from hdp2_5_hive2_spark.llm.text import _arrow_fence, plan_checkpoint
from hdp2_5_hive2_spark.queries.llm_corpus import _ngram_cte
from hdp2_5_hive2_spark.queries.registry import query

# Shared tokenization CTE (DuckDB side) — mirrors llm.text.tokens.
_TOK_CTE = """
    WITH tok AS (
      SELECT doc_id, source,
             unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    )
"""


@query(
    "llm_jaccard_containment_gap",
    oracle="WITH "
    + _ngram_cte(7)
    + """
    , rare AS (SELECT ngram FROM ngd GROUP BY ngram HAVING count(*) <= 20),
    cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
             FROM ngd a JOIN ngd b USING (ngram) JOIN rare USING (ngram)
             WHERE a.doc_id < b.doc_id),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ngd
           GROUP BY doc_id),
    inter AS (SELECT c.da, c.db, CAST(count(*) AS BIGINT) AS i
              FROM cand c JOIN ngd x ON x.doc_id = c.da
              JOIN ngd y ON y.doc_id = c.db AND y.ngram = x.ngram
              GROUP BY c.da, c.db)
    SELECT i.da, i.db, i.i AS inter_grams,
           CAST(i.i * 1000 // (sa.n + sb.n - i.i) AS BIGINT) AS jaccard_milli,
           CAST(i.i * 1000 // least(sa.n, sb.n) AS BIGINT) AS containment_milli,
           CAST(CASE WHEN i.i * 1000 // least(sa.n, sb.n) >= 800
                      AND i.i * 1000 // (sa.n + sb.n - i.i) < 800
                     THEN 1 ELSE 0 END AS BIGINT) AS is_asymmetric
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.da
    JOIN sz sb ON sb.doc_id = i.db
    """,
    tags=("llm", "dedup", "jaccard", "containment"),
)
def llm_jaccard_containment_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-vs-containment gap on near-dup candidate pairs: for every
    rare-8-gram candidate pair (the shared_ngram_edges derivation at
    n=8, df <= 20), the exact 8-gram Jaccard AND the containment
    coefficient |A∩B| / min(|A|,|B|) side by side, flagging pairs where
    containment clears the 800-milli dedup gate but Jaccard does not —
    the truncation/quotation signature (a short doc fully contained in a
    long one dilutes the union, so symmetric Jaccard misses exactly the
    copies a containment pass catches; MinHash inherits the same blind
    spot). The ablation tells a dedup rollout whether it needs the
    containment pass (llm_containment_dedup) at all. Plan / 100 TB: one
    Arrow n-gram pass checkpointed and reused by all three consumers
    (sizes, candidate edges, intersections); candidate generation is the
    df-capped rare-gram bucket join (never all-pairs); the intersection
    count joins the BOUNDED candidate list back to per-doc gram lists on
    (doc, ngram) — pair-count × doc-size rows, both capped."""
    d = load_tables(spark, sf_dir)["documents"]
    ng = curation.word_ngram_rows(d, "text", "doc_id", 8).transform(
        plan_checkpoint
    )
    rare = (
        ng.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("df_"))
        .where(F.col("df_") <= 20)
        .select("ngram")
    )
    pruned = ng.join(rare, "ngram")
    cand = (
        pruned.select("ngram", F.col("id").alias("da"))
        .join(pruned.select("ngram", F.col("id").alias("db")), "ngram")
        .where(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )
    sz = ng.groupBy("id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ga = ng.select(F.col("id").alias("da"), "ngram")
    gb = ng.select(F.col("id").alias("db"), "ngram")
    inter = (
        cand.join(ga, "da")
        .join(gb, ["db", "ngram"])
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).cast("bigint").alias("i"))
    )
    jac = F.expr("i * 1000 div (na + nb - i)").cast("bigint")
    cont = F.expr("i * 1000 div least(na, nb)").cast("bigint")
    return (
        inter.join(sz.select(F.col("id").alias("da"), F.col("n").alias("na")), "da")
        .join(sz.select(F.col("id").alias("db"), F.col("n").alias("nb")), "db")
        .select(
            "da",
            "db",
            F.col("i").alias("inter_grams"),
            jac.alias("jaccard_milli"),
            cont.alias("containment_milli"),
            F.when((cont >= 800) & (jac < 800), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("is_asymmetric"),
        )
    )


@query(
    "llm_md5_draw_uniformity",
    oracle="""
    WITH d AS (
      SELECT CAST(('0x' || substring(md5('draw:' || doc_id), 1, 8)) AS BIGINT)
               % 64 AS bucket
      FROM documents
    ),
    b AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY bucket),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d)
    SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(MAX(n.n) AS BIGINT) AS n_draws,
           CAST(SUM(abs(c * 64 - n.n)) AS BIGINT) AS l1_cross,
           CAST(MAX(c) * 64000 // MAX(n.n) AS BIGINT) AS max_bucket_milli,
           CAST(MIN(c) * 64000 // MAX(n.n) AS BIGINT) AS min_bucket_milli
    FROM b CROSS JOIN n
    """,
    tags=("llm", "sampling", "hash", "audit"),
)
def llm_md5_draw_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniformity audit of the repo's OWN sampling primitive: the
    cross-engine md5 hash-draw (conv(substring(md5(..), 1, 8), 16, 10))
    that ppswor sampling, salting, split assignment, and mixture
    realization all ride. Draws one value per doc_id, buckets mod 64,
    and reports the cross-multiplied L1 distance from uniform
    (Σ|c_b·64 − N| — exact integers, no division) plus the max/min
    bucket load in milli of the uniform share (1000 = perfectly
    uniform). A skewed histogram here would mean every downstream
    sampler is biased — this is the canary the whole sampling family
    stands on. Plan / 100 TB: one map-side hash projection, a 64-row
    aggregate, and a broadcast scalar total — no joins, no windows,
    nothing larger than 64 rows past the scan."""
    d = load_tables(spark, sf_dir)["documents"]
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("draw:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 64
    )
    b = (
        d.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        b.crossJoin(F.broadcast(n))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.max("n").cast("bigint").alias("n_draws"),
            F.sum(F.abs(F.col("c") * 64 - F.col("n"))).cast("bigint").alias("l1_cross"),
            F.expr("max(c) * 64000 div max(n)").cast("bigint").alias("max_bucket_milli"),
            F.expr("min(c) * 64000 div max(n)").cast("bigint").alias("min_bucket_milli"),
        )
    )


@query(
    "llm_ivf_probe_sweep",
    oracle="""
    WITH qe AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]), x -> floor(x * 1024))
               AS qv
      FROM embeddings
    ),
    cents AS (SELECT vec_id AS cid, qv FROM qe
              WHERE vec_id >= 8 AND vec_id % 17 = 8),
    corpus AS (SELECT vec_id, qv FROM qe WHERE vec_id >= 8),
    queries AS (SELECT vec_id, qv FROM qe WHERE vec_id < 8),
    c_cell AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT c.vec_id, ct.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY list_dot_product(c.qv, ct.qv) DESC, ct.cid) AS rk
        FROM corpus c CROSS JOIN cents ct
      ) WHERE rk = 1
    ),
    q_probe AS (
      SELECT vec_id, cid AS cell, rk FROM (
        SELECT q.vec_id, ct.cid,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.qv, ct.qv) DESC, ct.cid) AS rk
        FROM queries q CROSS JOIN cents ct
      ) WHERE rk <= 4
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_dot_product(c.qv, q.qv) DESC, c.vec_id) AS rk
        FROM corpus c CROSS JOIN queries q
      ) WHERE rk <= 10
    ),
    ps AS (SELECT * FROM (VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)),
                                 (CAST(4 AS BIGINT))) v(p)),
    approx AS (
      SELECT p AS ap, query_id AS aq, neighbor_id AS an FROM (
        SELECT p.p, q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY p.p, q.vec_id
                 ORDER BY list_dot_product(c.qv, q.qv) DESC, c.vec_id) AS rk
        FROM ps p
        JOIN q_probe qp ON qp.rk <= p.p
        JOIN queries q ON q.vec_id = qp.vec_id
        JOIN c_cell cc ON cc.cell = qp.cell
        JOIN corpus c ON c.vec_id = cc.vec_id
      ) WHERE rk <= 10
    )
    SELECT e.query_id, p.p,
           CAST(SUM(CASE WHEN a.an IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hits,
           CAST(SUM(CASE WHEN a.an IS NOT NULL THEN 1 ELSE 0 END) * 100
                AS BIGINT) AS recall_milli
    FROM ps p CROSS JOIN exact e
    LEFT JOIN approx a ON a.ap = p.p AND a.aq = e.query_id
                       AND a.an = e.neighbor_id
    GROUP BY e.query_id, p.p
    """,
    tags=("llm", "similarity", "ann", "ivf", "nprobe"),
)
def llm_ivf_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF multi-probe recall sweep: recall@10 of the deterministic-IVF
    index at nprobe = 1/2/4 probed cells per query — the serving knob
    llm_recall_curve's single-probe curve cannot see. The operable
    read-out for capacity planning: if recall saturates at nprobe=2 the
    extra probe is wasted fan-out; if it is still climbing at 4, the
    coarse book is too fine for single-digit probes and either the cell
    count or the probe budget must move. recall_milli = n_hits × 100
    over the 10 ground-truth neighbors, so perfect recall reads 1000
    (milli — renamed from recall_centi, ADVICE r12). Same deterministic book as
    llm_recall_curve (every 17th corpus vector), same exact int64
    quantized-dot total order ((dot desc, id)) on both the probe ranking
    and both candidate rankings. Plan / 100 TB: cell assignment is one
    Arrow matmul against the constant broadcast book; the probe ranking
    is quantized_dot_topk over the BOOK (book-sized, not corpus-sized);
    candidates join cell-keyed with fan-out capped at nprobe × cell
    occupancy; per-(p, query) windows are partitioned — nothing global,
    nothing all-pairs except the 8-query ground-truth scan the audit
    inherently needs."""
    e = load_tables(spark, sf_dir)["embeddings"]
    corpus = e.filter(F.col("vec_id") >= 8)
    queries = e.filter(F.col("vec_id") < 8)
    cents = corpus.filter(F.col("vec_id") % 17 == 8)
    c_cell = similarity.quantized_cell_assign(corpus, cents)
    # ONE query-collect job shared by the probe and ground-truth rankings
    # (guide §1.2).
    qb = similarity.collect_query_block(
        queries, max_queries=100_000, caller="llm_ivf_probe_sweep"
    )
    q_probe = similarity.quantized_dot_topk(cents, queries, k=4, q_rows=qb).select(
        F.col("query_id").alias("qid"),
        F.col("neighbor_id").alias("cell"),
        F.col("rank").alias("probe_rank"),
    )
    ps = spark.createDataFrame([(1,), (2,), (4,)], "p bigint")
    cand = (
        F.broadcast(ps)
        .join(q_probe, F.col("probe_rank") <= F.col("p"))
        .join(c_cell.withColumnRenamed("vec_id", "neighbor_id"), "cell")
        .select("p", F.col("qid").alias("query_id"), "neighbor_id")
    )
    pairs = (
        cand.join(
            queries.select(
                F.col("vec_id").alias("query_id"),
                similarity.as_double_array("embedding").alias("qv"),
            ),
            "query_id",
        )
        .join(
            corpus.select(
                F.col("vec_id").alias("neighbor_id"),
                similarity.as_double_array("embedding").alias("cv"),
            ),
            "neighbor_id",
        )
    )
    scored = similarity.quantized_pair_dots(pairs)
    wq = Window.partitionBy("p", "query_id").orderBy(
        F.desc("dot"), F.asc("neighbor_id")
    )
    approx = (
        scored.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= 10)
        .select("p", "query_id", "neighbor_id", F.lit(1).alias("hit"))
    )
    exact = similarity.quantized_dot_topk(corpus, queries, k=10, q_rows=qb).select(
        "query_id", "neighbor_id"
    )
    hits = F.sum(F.coalesce(F.col("hit"), F.lit(0)))
    return (
        F.broadcast(ps)
        .crossJoin(exact)
        .join(approx, ["p", "query_id", "neighbor_id"], "left")
        .groupBy("query_id", "p")
        .agg(
            hits.cast("bigint").alias("n_hits"),
            (hits * 100).cast("bigint").alias("recall_milli"),
        )
    )


@query(
    "events_interarrival_burstiness",
    oracle="""
    WITH g AS (
      SELECT user_id,
             CAST(epoch_us(ts) // 1000000 AS BIGINT)
               - lag(CAST(epoch_us(ts) // 1000000 AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events
    ),
    s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
                 CAST(SUM(gap) AS BIGINT) AS s1,
                 CAST(SUM(gap * gap) AS BIGINT) AS s2
          FROM g WHERE gap IS NOT NULL GROUP BY user_id
          HAVING count(*) >= 10 AND SUM(gap) > 0)
    SELECT user_id, n_gaps, s1, s2,
           CAST((n_gaps * s2 - s1 * s1) * 1000 // (s1 * s1) AS BIGINT)
             AS cov2_milli,
           CAST(CASE WHEN n_gaps * s2 > 2 * s1 * s1 THEN 1 ELSE 0 END
                AS BIGINT) AS is_bursty
    FROM s
    """,
    tags=("events", "timeseries", "burstiness", "audit"),
)
def events_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival burstiness: the squared coefficient of
    variation CoV² = var/mean² of a user's inter-event gaps, in exact
    integer milli via the sufficient-statistics identity
    (n·Σg² − (Σg)²) / (Σg)² — a Poisson process reads ~1000, bots and
    batch replays read near 0 (metronomic), bursty humans read > 2000.
    The rate-limiter / bot-screen feature, and the arrival-model input
    for capacity planning. Gaps are computed over epoch SECONDS — at
    microsecond resolution gap² overflows int64 at realistic event
    spacing (the r11 pre-probe finding); the oracle floors via
    epoch_us // 1000000 because DuckDB's epoch() ROUNDS the fractional
    part while Spark's timestamp→long cast floors. Users need ≥ 10 gaps
    (below that CoV is noise). Plan / 100 TB: one user-partitioned lag window
    (the stream's natural key — no skew beyond a power user, and the
    per-user state is two running sums), then a per-user 4-column
    aggregate; nothing global, no joins."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("long")
    g = ev.select(
        "user_id", (sec - F.lag(sec).over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    s = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.sum("gap").cast("bigint").alias("s1"),
            F.sum(F.col("gap") * F.col("gap")).cast("bigint").alias("s2"),
        )
        .where((F.col("n_gaps") >= 10) & (F.col("s1") > 0))
    )
    return s.select(
        "user_id",
        "n_gaps",
        "s1",
        "s2",
        F.expr("(n_gaps * s2 - s1 * s1) * 1000 div (s1 * s1)")
        .cast("bigint")
        .alias("cov2_milli"),
        F.when(F.col("n_gaps") * F.col("s2") > 2 * F.col("s1") * F.col("s1"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_bursty"),
    )


@query(
    "llm_prefix_echo",
    oracle="""
    WITH t AS (SELECT doc_id, source,
                      string_split_regex(trim(text), '\\s+') AS t
               FROM documents
               WHERE len(string_split_regex(trim(text), '\\s+')) >= 32),
    head AS (SELECT DISTINCT doc_id, g FROM (
      SELECT doc_id, unnest(list_transform(generate_series(1, 15),
                            i -> array_to_string(t[i:i+1], ' '))) AS g FROM t)),
    tail AS (SELECT DISTINCT doc_id, g FROM (
      SELECT doc_id, unnest(list_transform(generate_series(17, len(t) - 1),
                            i -> array_to_string(t[i:i+1], ' '))) AS g FROM t)),
    e AS (SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_echo
          FROM head h JOIN tail x ON x.doc_id = h.doc_id AND x.g = h.g
          GROUP BY h.doc_id)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN coalesce(n_echo, 0) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_echo_docs,
           CAST(SUM(coalesce(n_echo, 0)) AS BIGINT) AS n_echo_grams,
           CAST(SUM(CASE WHEN coalesce(n_echo, 0) > 0 THEN 1 ELSE 0 END)
                * 1000 // count(*) AS BIGINT) AS echo_doc_milli
    FROM t LEFT JOIN e USING (doc_id)
    GROUP BY source
    """,
    tags=("llm", "text", "repetition", "audit"),
)
def llm_prefix_echo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-echo self-repetition forensics: for documents of >= 32
    tokens, how many of the distinct bigrams in the 16-token head reappear
    anywhere in the tail (token 17 on) — the signature of template
    generators and boilerplate-prefixed scrapes (title echoed in body,
    nav text repeated). Bigrams are the operating point: unigram echo
    saturates on stopwords (389/389 docs at fixture scale) and trigram
    echo is too thin to rank sources (13 docs) — bigrams split the
    corpus cleanly (199 of 389). Reported per source as the ranking
    signal a curation pass acts on. Plan / 100 TB: ONE map-side Arrow
    pass computes each doc's head/tail bigram-set intersection in-batch
    (sets are <= 15 grams vs the tail dict — per-doc work, no corpus
    gram shuffle at all, unlike the dedup family), then a source-sized
    aggregate."""
    d = load_tables(spark, sf_dir)["documents"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs: list[str] = []
            echoes: list[int] = []
            for src, t in zip(pdf["source"], pdf["text"]):
                toks = t.split() if isinstance(t, str) else []
                if len(toks) < 32:
                    continue
                head = {
                    (toks[i], toks[i + 1]) for i in range(15)
                }
                tail = {
                    (toks[i], toks[i + 1]) for i in range(16, len(toks) - 1)
                }
                srcs.append(src)
                echoes.append(len(head & tail))
            yield pd.DataFrame(
                {"source": srcs, "n_echo": pd.array(echoes, dtype="int64")}
            )

    per_doc = _arrow_fence(d.select("source", "text")).mapInPandas(
        gen, "source string, n_echo bigint"
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("n_echo") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_echo_docs"),
        F.sum("n_echo").cast("bigint").alias("n_echo_grams"),
        F.expr(
            "sum(CASE WHEN n_echo > 0 THEN 1 ELSE 0 END) * 1000 div count(*)"
        )
        .cast("bigint")
        .alias("echo_doc_milli"),
    )


@query(
    "llm_length_bands",
    oracle="""
    WITH L AS (SELECT doc_id, source,
                      CAST(len(string_split_regex(trim(text), '\\s+'))
                           AS BIGINT) AS n
               FROM documents),
    r AS (SELECT source, n,
                 row_number() OVER (PARTITION BY source ORDER BY n, doc_id)
                   AS i,
                 count(*) OVER (PARTITION BY source) AS m
          FROM L)
    SELECT source, CAST(MAX(m) AS BIGINT) AS n_docs,
           CAST(MAX(CASE WHEN i = (m * 10 + 99) // 100 THEN n END)
                AS BIGINT) AS p10,
           CAST(MAX(CASE WHEN i = (m * 50 + 99) // 100 THEN n END)
                AS BIGINT) AS p50,
           CAST(MAX(CASE WHEN i = (m * 90 + 99) // 100 THEN n END)
                AS BIGINT) AS p90
    FROM r GROUP BY source
    """,
    tags=("llm", "text", "length", "profile"),
)
def llm_length_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact token-length bands: nearest-rank p10/p50/p90
    (rank = ceil(p·n/100), the classical exact-percentile definition —
    deterministic, no interpolation, so both engines agree bit-for-bit)
    with (n, doc_id) as the total order. The per-source length profile a
    mixture designer reads before packing: a source whose p10 is near
    zero needs a short-doc filter, one whose p90 hits the context window
    needs chunking first. Distinct from llm_length_trim (global
    interquartile TRIM) — this is the per-source descriptive read-out.
    Plan / 100 TB: one map-side length projection, one source-partitioned
    sort window (the corpus' natural partition key), and a source-sized
    aggregate — no global sort, no joins."""
    d = load_tables(spark, sf_dir)["documents"]
    base = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("n"),
    )
    w = Window.partitionBy("source").orderBy("n", "doc_id")
    wc = Window.partitionBy("source")
    r = base.select(
        "source",
        "n",
        F.row_number().over(w).cast("bigint").alias("i"),
        F.count(F.lit(1)).over(wc).cast("bigint").alias("m"),
    )
    def band(p: int):
        return (
            F.max(
                F.when(
                    F.col("i") == F.expr(f"(m * {p} + 99) div 100"), F.col("n")
                )
            )
            .cast("bigint")
            .alias(f"p{p}")
        )

    return r.groupBy("source").agg(
        F.max("m").cast("bigint").alias("n_docs"), band(10), band(50), band(90)
    )


@query(
    "llm_front_coding_gain",
    oracle=_TOK_CTE
    + """
    , v AS (SELECT DISTINCT term FROM tok),
    s AS (SELECT term, lag(term) OVER (ORDER BY term) AS prev FROM v),
    l AS (SELECT term,
                 CASE WHEN prev IS NULL THEN 0 ELSE
                   coalesce(list_max(list_filter(
                     list_transform(
                       generate_series(1, least(len(term), len(prev))),
                       k -> CASE WHEN substring(term, 1, CAST(k AS INT))
                                   = substring(prev, 1, CAST(k AS INT))
                                 THEN k ELSE 0 END),
                     x -> x > 0)), 0)
                 END AS lcp
          FROM s)
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           CAST(coalesce(SUM(len(term)), 0) AS BIGINT) AS total_chars,
           CAST(coalesce(SUM(lcp), 0) AS BIGINT) AS saved_chars,
           CAST(SUM(lcp) * 1000 // SUM(len(term)) AS BIGINT) AS gain_milli
    FROM l
    """,
    tags=("llm", "retrieval", "dictionary", "compression"),
)
def llm_front_coding_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Front-coding prefix-compression gain on the sorted vocabulary:
    the chars saved by storing each term as (shared-prefix-length,
    suffix) against its sorted predecessor — the dictionary-layout
    estimate an inverted-index writer (llm_posting_lists' term
    dictionary) reads to choose between front-coded blocks and plain
    concatenation. saved/total in exact milli.

    Plan / 100 TB — the DISTRIBUTED sorted-adjacency shape (never a
    partition-less lag window, which the package-wide AST guard
    correctly rejects: one task would sort the world): the corpus
    tokenize reduces to a vocab-sized distinct; the vocab range-
    partitions on term (Spark's distributed sort — each shard IS a
    front-coded dictionary block), ONE Arrow pass folds each shard's
    internal LCP sum carrying the previous term across batches, and the
    partition-count-bounded summary rows (first/last term + 3 ints per
    shard) stitch the shard-boundary pairs via bounded_rank (the repo's
    window-free rank device — the summary frame is bounded by CLUSTER
    CONFIG, not data) and one interpreted-HOF lcp on those <= #shards
    boundary rows. Everything heavier than the vocab distinct is
    map-side."""
    d = load_tables(spark, sf_dir)["documents"]
    # checkpoint the vocab: repartitionByRange runs a boundary-sampling
    # pass over its input, which would otherwise re-run the corpus
    # tokenize+distinct a second time
    v = (
        d.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"))
        .distinct()
        .transform(plan_checkpoint)
    )
    return front_coding_gain(v)


def front_coding_gain(v: DataFrame) -> DataFrame:
    """Distributed front-coding gain over a (term string) vocabulary frame
    — the reusable core of llm_front_coding_gain, factored so tests can
    drive it with synthetic vocabularies whose range shards hold MANY
    terms (the real fixture's 31-term vocab spreads ~1 term per shard, so
    it exercises the boundary stitching far more than the internal
    folds). Returns one row (n_terms, total_chars, saved_chars,
    gain_milli). Shape documented on the caller."""
    shards = v.repartitionByRange(F.col("term")).sortWithinPartitions("term")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        first = prev = None
        n = total = saved = 0
        for pdf in batches:
            for t in pdf["term"]:
                n += 1
                total += len(t)
                if prev is None:
                    first = t
                else:
                    k = 0
                    for x, y in zip(prev, t):
                        if x != y:
                            break
                        k += 1
                    saved += k
                prev = t
        if n:
            yield pd.DataFrame(
                {
                    "first": [first],
                    "last": [prev],
                    "n": pd.array([n], dtype="int64"),
                    "total": pd.array([total], dtype="int64"),
                    "saved": pd.array([saved], dtype="int64"),
                }
            )

    parts = shards.mapInPandas(
        gen, "first string, last string, n bigint, total bigint, saved bigint"
    )
    ranked = retrieval.bounded_rank(parts, "first", "first", ascending=True)
    nxt = ranked.select(
        (F.col("rank") - 1).alias("rank"), F.col("first").alias("nxt_first")
    )
    # boundary pair (last of shard i, first of shard i+1); <= #shards rows,
    # so the interpreted-HOF lcp fold is on a config-bounded frame
    boundary_lcp = F.expr(
        """CASE WHEN nxt_first IS NULL THEN 0L ELSE coalesce(array_max(filter(
             transform(sequence(1, least(length(last), length(nxt_first))),
                       k -> CASE WHEN substring(last, 1, k)
                                   = substring(nxt_first, 1, k)
                                 THEN CAST(k AS BIGINT) ELSE 0L END),
             x -> x > 0L)), 0L) END"""
    )
    return (
        ranked.join(F.broadcast(nxt), "rank", "left")
        .select("n", "total", "saved", boundary_lcp.alias("blcp"))
        .agg(
            # coalesce-0 (ADVICE r12): an EMPTY vocabulary yields zero
            # shard-summary rows, so the sums read NULL while the oracle's
            # count(*) reads 0 — the counters must agree on the degenerate
            # input. gain_milli stays NULL on empty in BOTH engines (a
            # 0-term dictionary has no defined gain).
            F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_terms"),
            F.coalesce(F.sum("total"), F.lit(0))
            .cast("bigint")
            .alias("total_chars"),
            F.coalesce(F.sum("saved") + F.sum("blcp"), F.lit(0))
            .cast("bigint")
            .alias("saved_chars"),
            F.expr("(sum(saved) + sum(blcp)) * 1000 div sum(total)")
            .cast("bigint")
            .alias("gain_milli"),
        )
    )
