"""Round-11 corpus: graph closure and index-balance health checks past
the r10 planning suite — dup-graph triangle closure (transitivity of the
near-dup relation), IVF cell-balance audits, corpus drift and diversity
measures (half-vs-half vocabulary drift, Simpson collision mass, Zipf
ratio curves, Heaps vocabulary-growth checkpoints), shard-topology
skew (hash-vs-range token-weighted sharding), boilerplate forensics
(shared-header rate, cross-source shared-gram contamination matrix),
dedup policy ablation (survivorship keep-newest vs keep-longest on
planted truncations), quantization-scale ablation for ANN serving, the
MOSS winnowing density sweep, PII co-occurrence windows on planted
tokens, and length-inequality (Gini) audits.

Oracle discipline (the r4-r10 standard): every floating-point output is
a FIXED expression tree of single IEEE-754 ops over exact integers — no
transcendentals, no order-dependent double accumulation. Ratios ship as
integer milli/micro/ppm via BIGINT floor division. md5-derived draws use
the cross-engine conv(substring(md5(..)))/('0x' || ..)::BIGINT idiom.
Embedding kernels quantize floor(v·scale) once and stay in int64.

Reference surface: Hive's own corpus stops at n-gram aggregates and
GenericUDAFs (ql/udf/generic/GenericUDAFnGrams.java,
FunctionRegistry.java:393-399); these queries are the LLM-pipeline layer
the engine adds above that surface (SURVEY.md §2 "training-data
pipeline" axis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdp2_5_hive2_spark.catalog import load_tables
from hdp2_5_hive2_spark.llm import curation, retrieval, similarity
from hdp2_5_hive2_spark.llm import text as llm_text
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

# Rare-16-gram duplicate edge list with a degree cap — the shared head of
# the triangle-closure oracle. Mirrors curation.shared_ngram_edges(n=16,
# max_df=100) exactly (same derivation as _twocore_oracle's e0 in
# pipeline2_corpus).
_CAPPED_EDGE_CTE = (
    "WITH "
    + _ngram_cte(15)
    + """
    , rare AS (SELECT ngram FROM ngd GROUP BY ngram HAVING count(*) <= 100),
    e0 AS MATERIALIZED (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM ngd a JOIN ngd b USING (ngram) JOIN rare USING (ngram)
           WHERE a.doc_id < b.doc_id),
    deg AS (SELECT id, count(*) AS d FROM (
              SELECT da AS id FROM e0 UNION ALL SELECT db FROM e0
            ) GROUP BY id),
    keep AS MATERIALIZED (
      SELECT da, db FROM e0
      JOIN deg x ON x.id = e0.da JOIN deg y ON y.id = e0.db
      WHERE x.d <= 64 AND y.d <= 64)
    """
)


@query(
    "llm_dup_triangle_closure",
    oracle=_CAPPED_EDGE_CTE
    + """
    , paths AS (SELECT p.da AS a, p.db AS b, q.db AS c
                FROM keep p JOIN keep q ON q.da = p.db)
    SELECT CAST(count(*) AS BIGINT) AS n_2paths,
           CAST(coalesce(SUM(CASE WHEN k.da IS NOT NULL THEN 1 ELSE 0 END),
                         0) AS BIGINT) AS n_closed
    FROM paths LEFT JOIN keep k ON k.da = paths.a AND k.db = paths.c
    """,
    tags=("llm", "dedup", "graph", "triangle"),
)
def llm_dup_triangle_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle closure rate of the duplicate graph: ordered 2-paths
    a<b<c (both edges in the capped edge list) and how many close into
    triangles — the transitivity health check on near-dup candidate
    edges. A near-dup relation SHOULD be nearly transitive (shared
    templates make cliques); a low closure rate means the edge generator
    is bridging unrelated documents through hub n-grams and cluster
    collapse would over-merge. Same edge derivation as
    llm_dedup_clusters_star / llm_dup_graph_2core (16-gram buckets,
    df <= 100), with a degree-64 cap applied BEFORE the path join.
    Plan / 100 TB: the cap bounds per-node fan-out, so the path join
    emits <= 64 rows per edge endpoint and the closing probe is one more
    ids-only hash join — never all-pairs; every shuffle carries two or
    three int64 ids."""
    d = load_tables(spark, sf_dir)["documents"]
    edges = curation.shared_ngram_edges(d, n=16, max_df=100)
    deg = (
        edges.select(F.col("doc_a").alias("id"))
        .unionAll(edges.select(F.col("doc_b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    keep_ids = deg.filter(F.col("deg") <= 64).select("id")
    keep = (
        edges.join(keep_ids.withColumnRenamed("id", "doc_a"), "doc_a")
        .join(keep_ids.withColumnRenamed("id", "doc_b"), "doc_b")
        .select("doc_a", "doc_b")
    )
    paths = (
        keep.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .join(keep.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c")), "b")
        .select("a", "b", "c")
    )
    closing = keep.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("c"), F.lit(1).alias("hit")
    )
    flagged = paths.join(closing, ["a", "c"], "left")
    return flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_2paths"),
        F.coalesce(F.sum(F.coalesce(F.col("hit"), F.lit(0))), F.lit(0))
        .cast("bigint")
        .alias("n_closed"),
    )


@query(
    "llm_ivf_cell_balance",
    oracle="""
    WITH qe AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> floor(x * 1024)) AS qv
      FROM embeddings
    ), cents AS (SELECT vec_id AS cid, qv AS cv FROM qe WHERE vec_id < 4),
    dots AS (
      SELECT q.vec_id, c.cid,
             CAST(list_dot_product(q.qv, c.cv) AS BIGINT) AS d
      FROM qe q CROSS JOIN cents c WHERE q.vec_id >= 4
    ), assign AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d DESC, cid) AS rn
        FROM dots) WHERE rn = 1
    ), sz AS (SELECT cid, CAST(count(*) AS BIGINT) AS sz
              FROM assign GROUP BY cid),
    tot AS (SELECT SUM(sz) AS n, count(*) AS k FROM sz)
    SELECT sz.cid, sz.sz,
           CAST(sz.sz * 1000 * tot.k // tot.n AS BIGINT) AS occupancy_milli
    FROM sz CROSS JOIN tot
    """,
    tags=("llm", "similarity", "ivf", "audit"),
)
def llm_ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-balance audit: assign every corpus vector (vec_id >= 4)
    to its max-integer-dot coarse centroid (the 4 vectors vec_id < 4 —
    the same deterministic book llm_recall_curve probes) and report the
    per-cell population plus occupancy as milli of the uniform share
    (1000 = perfectly balanced). Unbalanced cells are the IVF failure
    mode: one hot cell serves most probes and the index degenerates to
    brute force. Exact: integer dots over floor(v·1024) codes, ties to
    the smaller centroid id. Plan / 100 TB: the centroid book is a
    constant-size broadcast with a raise-guard
    (similarity.quantized_cell_assign — one Arrow matmul, no shuffle);
    the audit aggregate is cell-count-sized, and the occupancy join is a
    1-row broadcast scalar."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    cents = emb.filter(F.col("vec_id") < 4)
    rest = emb.filter(F.col("vec_id") >= 4)
    assign = similarity.quantized_cell_assign(rest, cents, scale=1024)
    sz = assign.groupBy(F.col("cell").alias("cid")).agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    tot = sz.agg(
        F.sum("sz").alias("n"), F.count(F.lit(1)).alias("k")
    )
    return sz.crossJoin(F.broadcast(tot)).select(
        "cid",
        "sz",
        F.expr("sz * 1000 * k div n").cast("bigint").alias("occupancy_milli"),
    )


@query(
    "llm_vocab_half_drift",
    oracle=_TOK_CTE
    + """
    , mid AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) // 2 AS m FROM documents),
    top AS (SELECT term FROM tok GROUP BY term
            ORDER BY count(*) DESC, term LIMIT 16),
    h AS (SELECT CASE WHEN doc_id < (SELECT m FROM mid) THEN 0 ELSE 1 END AS half,
                 term, CAST(count(*) AS BIGINT) AS c
          FROM tok JOIN top USING (term) GROUP BY 1, 2),
    tot AS (SELECT half, SUM(c) AS n FROM h GROUP BY half),
    j AS (SELECT t.term, coalesce(a.c, 0) AS c0, coalesce(b.c, 0) AS c1
          FROM top t
          LEFT JOIN (SELECT * FROM h WHERE half = 0) a USING (term)
          LEFT JOIN (SELECT * FROM h WHERE half = 1) b USING (term))
    SELECT CAST(SUM(abs(c0 * (SELECT n FROM tot WHERE half = 1)
                      - c1 * (SELECT n FROM tot WHERE half = 0)))
                AS BIGINT) AS l1_cross,
           (SELECT CAST(n AS BIGINT) FROM tot WHERE half = 0) AS n0,
           (SELECT CAST(n AS BIGINT) FROM tot WHERE half = 1) AS n1
    FROM j
    """,
    tags=("llm", "text", "drift", "audit"),
)
def llm_vocab_half_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift between corpus halves (first vs second half of the
    doc_id range — the snapshot-over-snapshot drift check run before
    mixing a new crawl in): L1 distance between the two halves' term
    distributions over the top-16 overall terms, cross-multiplied exact
    (|c0·n1 - c1·n0| sums — the same integer trick as llm_centroid_drift,
    so no engine ever divides). Distinct from llm_vocab_drift (chi-square
    ranking of ALL terms): this is the headline one-number drift gauge
    over a FIXED top-k basket. Plan / 100 TB: one tokenize + term agg,
    a 16-row broadcast of the basket, one (half, term) agg, and a
    16-row final fold — nothing larger than the vocabulary ever
    shuffles."""
    d = load_tables(spark, sf_dir)["documents"]
    tok = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    mid = d.agg(
        ((F.max("doc_id") + 1).cast("bigint") / 2).cast("bigint").alias("m")
    )
    top = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cf"))
        .orderBy(F.col("cf").desc(), "term")
        .limit(16)
        .select("term")
    )
    h = (
        tok.join(F.broadcast(top), "term")
        .crossJoin(F.broadcast(mid))
        .select(
            F.when(F.col("doc_id") < F.col("m"), 0).otherwise(1).alias("half"),
            "term",
        )
        .groupBy("half", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wide = h.groupBy("term").agg(
        F.sum(F.when(F.col("half") == 0, F.col("c")).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("half") == 1, F.col("c")).otherwise(0)).alias("c1"),
    )
    # right-join the basket so terms absent from both halves still count 0
    j = top.join(wide, "term", "left").fillna(0, subset=["c0", "c1"])
    tot = j.agg(
        F.sum("c0").alias("n0"), F.sum("c1").alias("n1")
    )
    return (
        j.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.abs(F.col("c0") * F.col("n1") - F.col("c1") * F.col("n0"))
            )
            .cast("bigint")
            .alias("l1_cross"),
            F.max("n0").cast("bigint").alias("n0"),
            F.max("n1").cast("bigint").alias("n1"),
        )
    )


@query(
    "llm_simpson_collision",
    oracle=_TOK_CTE
    + """
    , tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
             FROM tok GROUP BY source, term),
    n AS (SELECT source, SUM(c) AS n FROM tf GROUP BY source)
    SELECT tf.source,
           CAST(SUM(c * (c - 1)) AS BIGINT) AS collision_mass,
           CAST(MAX(n.n) AS BIGINT) AS n_tokens,
           CAST(SUM(c * (c - 1)) * 1000000
                // (MAX(n.n) * (MAX(n.n) - 1)) AS BIGINT) AS simpson_micro
    FROM tf JOIN n USING (source)
    GROUP BY tf.source
    """,
    tags=("llm", "text", "diversity", "audit"),
)
def llm_simpson_collision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson collision mass per source: Σ c·(c−1) over term counts —
    the probability (×10^6, exact integer micro) that two tokens drawn
    without replacement collide. The inverse-diversity gauge that
    separates templated sources (high collision) from organic text, and
    the unsmoothed denominator behind 'effective vocabulary size'
    (1/Simpson). All integers: the micro ratio is one BIGINT floor
    division of exact sums — no float ever enters. Plan / 100 TB: the
    canonical two-level aggregate (map-side tokenize, (source, term)
    hash agg, per-source fold); no joins beyond the source-grain count
    attach, no windows."""
    d = load_tables(spark, sf_dir)["documents"]
    tok = d.select(
        "source", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    tf = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    n = tf.groupBy("source").agg(F.sum("c").alias("n"))
    return (
        tf.join(n, "source")
        .groupBy("source")
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1))
            .cast("bigint")
            .alias("collision_mass"),
            F.max("n").cast("bigint").alias("n_tokens"),
            F.expr("sum(c * (c - 1)) * 1000000 div (max(n) * (max(n) - 1))")
            .cast("bigint")
            .alias("simpson_micro"),
        )
    )
