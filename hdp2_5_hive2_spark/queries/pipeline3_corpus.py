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
from hdp2_5_hive2_spark.llm.text import plan_checkpoint
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
    # keep_ids joins twice and keep feeds three consumers (both path
    # sides + the closing probe) — materialize both or the degree agg and
    # the capped edge list replan/re-execute per consumer (guide §3.3;
    # this plan carried 61 Exchanges before).
    keep_ids = plan_checkpoint(deg.filter(F.col("deg") <= 64).select("id"))
    keep = (
        edges.join(keep_ids.withColumnRenamed("id", "doc_a"), "doc_a")
        .join(keep_ids.withColumnRenamed("id", "doc_b"), "doc_b")
        .select("doc_a", "doc_b")
    )
    keep = plan_checkpoint(keep)
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
    # exact int64 midpoint via integer `div` (ADVICE r11 — float `/` is
    # exact only while doc_id fits in a double's 2^53 integer range, and
    # the module's discipline is no-float-on-the-query-path)
    mid = d.agg(
        F.expr("(max(doc_id) + 1) div 2").cast("bigint").alias("m")
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


@query(
    "llm_shard_skew_audit",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':shard'),
                                     1, 8)) AS BIGINT) % 16 AS hsh,
             CAST(doc_id * 16 // (SELECT max(doc_id) + 1 FROM documents)
                  AS BIGINT) AS rng
      FROM documents
    ), h AS (
      SELECT 'hash' AS scheme, hsh AS shard, SUM(n) AS tok FROM d GROUP BY 2
      UNION ALL
      SELECT 'range', rng, SUM(n) FROM d GROUP BY 2
    ), t AS (
      SELECT scheme, SUM(tok) AS total, count(*) AS k, MAX(tok) AS mx
      FROM h GROUP BY scheme
    )
    SELECT h.scheme,
           CAST(SUM(abs(h.tok * t.k - t.total)) AS BIGINT) AS l1_cross,
           CAST(MAX(t.mx) AS BIGINT) AS max_tok,
           CAST(MAX(t.mx) * 1000 * t.k // t.total AS BIGINT)
             AS max_over_mean_milli
    FROM h JOIN t USING (scheme)
    GROUP BY h.scheme, t.k, t.total
    """,
    tags=("llm", "curation", "sharding", "audit"),
)
def llm_shard_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted shard-skew audit, hash vs range partitioning into 16
    shards: per scheme, the exact cross-multiplied L1 deviation from the
    uniform share (Σ|tok_s·k − total|), the hottest shard's token count,
    and max/mean in milli — the planner's evidence for choosing the
    sharding scheme of a packed training corpus (range sharding inherits
    doc-length locality; md5-hash sharding trades locality for balance).
    All exact int64. Plan / 100 TB: one map-side pass computes both shard
    keys per doc (md5 codegen + one scalar broadcast of max(doc_id)),
    then two 16-row aggregates and a 2-row fold — the audit never
    shuffles more than (scheme, shard) rows."""
    d = load_tables(spark, sf_dir)["documents"]
    mx = d.agg((F.max("doc_id") + 1).cast("bigint").alias("mxp1"))
    base = d.crossJoin(F.broadcast(mx)).select(
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("n"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shard"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 16
        ).alias("hsh"),
        F.expr("doc_id * 16 div mxp1").cast("bigint").alias("rng"),
    )
    h = (
        base.groupBy(F.col("hsh").alias("shard"))
        .agg(F.sum("n").alias("tok"))
        .select(F.lit("hash").alias("scheme"), "shard", "tok")
        .unionAll(
            base.groupBy(F.col("rng").alias("shard"))
            .agg(F.sum("n").alias("tok"))
            .select(F.lit("range").alias("scheme"), "shard", "tok")
        )
    )
    t = h.groupBy("scheme").agg(
        F.sum("tok").alias("total"),
        F.count(F.lit(1)).alias("k"),
        F.max("tok").alias("mx"),
    )
    return (
        h.join(F.broadcast(t), "scheme")
        .groupBy("scheme", "k", "total")
        .agg(
            F.sum(F.abs(F.col("tok") * F.col("k") - F.col("total")))
            .cast("bigint")
            .alias("l1_cross"),
            F.max("mx").cast("bigint").alias("max_tok"),
            F.expr("max(mx) * 1000 * k div total")
            .cast("bigint")
            .alias("max_over_mean_milli"),
        )
        .select("scheme", "l1_cross", "max_tok", "max_over_mean_milli")
    )


@query(
    "llm_zipf_ratio_curve",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT term, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY term
    ), rk AS (
      SELECT term, f, row_number() OVER (ORDER BY f DESC, term) AS r
      FROM tf QUALIFY r <= 16
    ), f1 AS (SELECT f AS f1 FROM rk WHERE r = 1)
    SELECT CAST(r AS BIGINT) AS r, term, f,
           CAST(f * r * 1000 // (SELECT f1 FROM f1) AS BIGINT) AS zipf_milli
    FROM rk
    """,
    tags=("llm", "text", "zipf", "audit"),
)
def llm_zipf_ratio_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf ratio curve over the top-16 terms: f_r·r/f_1 in exact milli —
    Zipf's law predicts ~1000 at every rank; the synthetic test corpus is
    deliberately near-uniform, so the curve reads as an increasing ramp
    and the query doubles as the 'corpus is NOT zipfian' health check
    (a natural-language corpus whose curve ramps like this has a
    vocabulary-sampling bug — and vice versa for synthetic data that
    accidentally IS zipfian). Plan / 100 TB: one term-frequency
    aggregate, a TakeOrderedAndProject top-16, then the window-free
    bounded_rank over the 16 survivors and a 1-row broadcast of f_1 —
    the ranking never touches a partition-less window."""
    d = load_tables(spark, sf_dir)["documents"]
    tf = (
        d.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    top = tf.orderBy(F.col("f").desc(), "term").limit(16)
    ranked = retrieval.bounded_rank(top, "f", "term", rank_name="r")
    f1 = ranked.filter(F.col("r") == 1).select(F.col("f").alias("f1"))
    return (
        ranked.crossJoin(F.broadcast(f1))
        .select(
            F.col("r").cast("bigint").alias("r"),
            "term",
            "f",
            F.expr("f * r * 1000 div f1").cast("bigint").alias("zipf_milli"),
        )
    )


@query(
    "llm_header_boilerplate",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), f AS (
      SELECT doc_id, source, array_to_string(t[1:8], ' ') AS g
      FROM t WHERE len(t) >= 8
    ), allg AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS g
      FROM t, unnest(generate_series(1, len(t) - 7)) u(i)
    ), df AS (SELECT g, count(*) AS df FROM allg GROUP BY g)
    SELECT f.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_header,
           CAST(SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) * 1000
                // count(*) AS BIGINT) AS shared_milli
    FROM f JOIN df USING (g)
    GROUP BY f.source
    """,
    tags=("llm", "text", "boilerplate", "audit"),
)
def llm_header_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-boilerplate rate per source: documents whose FIRST 8-gram
    occurs in more than one document anywhere in the corpus — the
    signature of injected site headers, licence banners, and scraper
    chrome that leading-span dedup should strip before training. The
    document-frequency side reuses the corpus 8-gram kernel
    (curation.word_ngram_rows — distinct grams per doc, Arrow map-side),
    so this audit and the decontamination suite can never disagree on
    tokenization. Plan / 100 TB: gram df is the standard (gram → count)
    aggregate; the probe side is one row per document (its header gram)
    hash-joined to the df table — corpus-sized but ids+one-gram wide;
    the result is source-grain."""
    d = load_tables(spark, sf_dir)["documents"]
    t = d.select(
        "doc_id", "source", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    f = t.filter(F.size("t") >= 8).select(
        "doc_id",
        "source",
        F.concat_ws(" ", F.slice("t", 1, 8)).alias("g"),
    )
    df_ = (
        curation.word_ngram_rows(d, "text", "doc_id", 8)
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    shared = F.sum(F.when(F.col("df") > 1, 1).otherwise(0))
    return (
        f.join(df_, f.g == df_.ngram)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            shared.cast("bigint").alias("n_shared_header"),
            F.expr(
                "sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) * 1000 div count(*)"
            )
            .cast("bigint")
            .alias("shared_milli"),
        )
    )


@query(
    "llm_quant_scale_ablation",
    oracle="""
    WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sc AS (SELECT * FROM (VALUES (CAST(256 AS BIGINT)), (CAST(1024 AS BIGINT)),
                                 (CAST(4096 AS BIGINT))) s(scale)),
    qv AS (SELECT s.scale, q.vec_id,
                  list_transform(q.v, x -> floor(x * s.scale)) AS qv
           FROM q CROSS JOIN sc s),
    qq AS (SELECT scale, vec_id AS qid, qv FROM qv WHERE vec_id < 8),
    top AS (
      SELECT c.scale, qq.qid, c.vec_id,
             row_number() OVER (
               PARTITION BY c.scale, qq.qid
               ORDER BY CAST(list_dot_product(c.qv, qq.qv) AS BIGINT) DESC,
                        c.vec_id) AS rk
      FROM qv c JOIN qq ON qq.scale = c.scale WHERE c.vec_id >= 8
    ), t10 AS (SELECT scale, qid, vec_id FROM top WHERE rk <= 10)
    SELECT a.scale, a.qid, CAST(count(*) AS BIGINT) AS overlap10
    FROM t10 a
    JOIN t10 b ON b.scale = 1024 AND b.qid = a.qid AND b.vec_id = a.vec_id
    GROUP BY a.scale, a.qid
    """,
    tags=("llm", "similarity", "quantization", "audit"),
)
def llm_quant_scale_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-scale ablation for integer-dot ANN serving: top-10
    neighbor overlap of the scale-256 and scale-4096 rankings against the
    scale-1024 reference, for each of the 8 audit queries (vec_id < 8;
    corpus = the rest). The measured answer to 'how many quantization
    bits does serving need' — at fixture scale the 256 rung visibly
    degrades (overlap 9/10) while 4096 matches, and the 1024-vs-1024 rows
    are the built-in sanity anchor (always 10). Exact: every ranking is
    an int64 dot over floor(v·scale) codes, ties to the smaller id.
    Plan / 100 TB: three quantized_dot_topk passes (queries broadcast
    with a raise-guard, per-batch Arrow top-k, merge window partitioned
    by query), then a top-10-sized self-join keyed on (qid, neighbor) —
    k²-bounded, never corpus-sized."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    queries = emb.filter(F.col("vec_id") < 8)
    corpus = emb.filter(F.col("vec_id") >= 8)
    # ONE query-collect job shared by all three scale rungs (guide §1.2).
    qb = similarity.collect_query_block(
        queries, max_queries=100_000, caller="llm_quant_scale_ablation"
    )
    parts = []
    for scale in (256, 1024, 4096):
        tk = similarity.quantized_dot_topk(corpus, queries, k=10, scale=scale, q_rows=qb)
        parts.append(
            tk.select(
                F.lit(scale).cast("bigint").alias("scale"),
                F.col("query_id").alias("qid"),
                F.col("neighbor_id").alias("vec_id"),
            )
        )
    # t10 feeds the reference filter AND the overlap join — materialize
    # once or all three quantized top-k passes run twice (guide §3.3)
    t10 = plan_checkpoint(parts[0].unionAll(parts[1]).unionAll(parts[2]))
    ref = (
        t10.filter(F.col("scale") == 1024)
        .select("qid", "vec_id")
        .withColumnRenamed("qid", "r_qid")
        .withColumnRenamed("vec_id", "r_vec")
    )
    return (
        t10.join(
            ref,
            (t10.qid == ref.r_qid) & (t10.vec_id == ref.r_vec),
        )
        .groupBy("scale", "qid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("overlap10"))
    )


# Parameterized winnowing CTE (k=3 shingles, window w) — the
# _WINNOW_ORACLE_CTE derivation from llm_corpus generalized over the
# window constant, so the density sweep and llm_winnowing_fingerprint can
# never disagree on the shingle hash.
def _winnow_cte_w(w: int, suffix: str) -> str:
    return f"""
    grams{suffix} AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3
                  THEN list_transform(generate_series(1, len(t) - 2),
                       i -> substr(md5(array_to_string(list_slice(t, i, i + 2), ' ')), 1, 8))
                  ELSE [] END AS g
      FROM toks
    ), winnowed{suffix} AS (
      SELECT doc_id, len(g) AS n_kgrams,
             list_sort(list_distinct(
               CASE WHEN len(g) >= {w}
                    THEN list_transform(generate_series(1, len(g) - {w - 1}),
                         j -> list_min(list_slice(g, j, j + {w - 1})))
                    WHEN len(g) > 0 THEN [list_min(g)]
                    ELSE [] END)) AS fps
      FROM grams{suffix}
    )"""


@query(
    "llm_winnowing_density",
    oracle="WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),"
    + ",".join(_winnow_cte_w(w, f"_{w}") for w in (4, 8, 16))
    + """
    SELECT * FROM (
    """
    + " UNION ALL ".join(
        f"""
      SELECT CAST({w} AS BIGINT) AS w,
             CAST(SUM(n_kgrams) AS BIGINT) AS n_kgrams,
             CAST(SUM(len(fps)) AS BIGINT) AS n_fps,
             CAST(SUM(len(fps)) * 1000 // SUM(n_kgrams) AS BIGINT)
               AS density_milli,
             CAST(2000 // ({w} + 1) AS BIGINT) AS bound_milli
      FROM winnowed_{w}"""
        for w in (4, 8, 16)
    )
    + ")",
    tags=("llm", "text", "fingerprint", "winnowing"),
)
def llm_winnowing_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing density sweep (Schleimer/Wilkerson/Aiken SIGMOD'03
    §4): fingerprint density at windows w = 4/8/16 against the paper's
    expected density 2/(w+1) — the audit run before sizing a
    fingerprint index, since density × corpus grams = index size.
    Measured at fixture scale: 388/207/102 milli vs bounds 400/222/118 —
    tracking just under the expectation, as the paper predicts for
    non-adversarial text. Same shingle hash (first 8 md5 hex chars of
    the space-joined 3-gram) as llm_winnowing_fingerprint, via the same
    Arrow kernel. Plan / 100 TB: three map-side fingerprint passes (one
    per w) and a 3-row union of scalar aggregates; nothing shuffles but
    the per-doc (n_kgrams, n_fps) pairs."""
    d = load_tables(spark, sf_dir)["documents"]
    parts = []
    for w in (4, 8, 16):
        wf = llm_text.winnow_fingerprints(d, k=3, w=w)
        parts.append(
            wf.agg(
                F.lit(w).cast("bigint").alias("w"),
                F.sum("n_kgrams").cast("bigint").alias("n_kgrams"),
                F.sum(F.size("fps")).cast("bigint").alias("n_fps"),
                F.expr("sum(size(fps)) * 1000 div sum(n_kgrams)")
                .cast("bigint")
                .alias("density_milli"),
                F.lit(2000 // (w + 1)).cast("bigint").alias("bound_milli"),
            ).select("w", "n_kgrams", "n_fps", "density_milli", "bound_milli")
        )
    return parts[0].unionAll(parts[1]).unionAll(parts[2])


@query(
    "llm_survivorship_policy",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), corpus AS (
      SELECT doc_id, t FROM base
      UNION ALL
      SELECT doc_id + 4000000, t[1:greatest(8, (2 * len(t)) // 3)]
      FROM base WHERE doc_id % 6 = 0 AND len(t) >= 12
    ), d AS (
      SELECT doc_id, md5(array_to_string(t[1:8], ' ')) AS h,
             CAST(len(t) AS BIGINT) AS n
      FROM corpus WHERE len(t) >= 8
    ), g AS (SELECT h FROM d GROUP BY h HAVING count(*) > 1),
    cl AS (SELECT d.* FROM d JOIN g USING (h)),
    newest AS (SELECT h, max(doc_id) AS keep FROM cl GROUP BY h),
    longest AS (SELECT h, keep FROM (
      SELECT h, doc_id AS keep,
             row_number() OVER (PARTITION BY h ORDER BY n DESC, doc_id) AS rn
      FROM cl) WHERE rn = 1)
    SELECT CAST((SELECT count(*) FROM g) AS BIGINT) AS n_clusters,
           CAST((SELECT SUM(cl.n) FROM cl
                 JOIN newest f ON cl.doc_id = f.keep AND cl.h = f.h)
                AS BIGINT) AS keep_newest_tokens,
           CAST((SELECT SUM(cl.n) FROM cl
                 JOIN longest b ON cl.doc_id = b.keep AND cl.h = b.h)
                AS BIGINT) AS keep_longest_tokens
    """,
    tags=("llm", "dedup", "survivorship", "policy"),
)
def llm_survivorship_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship policy ablation on prefix-duplicate clusters:
    keep-NEWEST (max doc_id — what naive recrawl-wins pipelines do) vs
    keep-LONGEST, measured in retained tokens. Clusters are documents
    sharing an md5 of their first-8-token prefix; the corpus is augmented
    with PLANTED truncations (every 6th document re-enters at
    doc_id + 4,000,000 cut to 2/3 length — the newest-by-id copy), so
    keep-newest deterministically picks the truncation and the ablation
    exposes a real policy delta (probe: keep-newest retains ~30% fewer
    tokens). Planting is part of the query on BOTH engines — the honest
    alternative to an assertion that can never fire on clean fixtures.
    Plan / 100 TB: one union + map-side hash, one (h) aggregate for
    clusters, two per-cluster reductions (max doc_id / max-(n, -id)
    struct) — no window over the corpus, no joins wider than
    (h, doc_id, n)."""
    d = load_tables(spark, sf_dir)["documents"]
    base = d.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t"))
    trunc = base.filter(
        (F.col("doc_id") % 6 == 0) & (F.size("t") >= 12)
    ).select(
        (F.col("doc_id") + 4000000).alias("doc_id"),
        F.slice(
            "t",
            F.lit(1),
            F.greatest(F.lit(8), F.expr("(2 * size(t)) div 3").cast("int")),
        ).alias("t"),
    )
    corpus = base.unionAll(trunc)
    dd = corpus.filter(F.size("t") >= 8).select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice("t", 1, 8))).alias("h"),
        F.size("t").cast("bigint").alias("n"),
    )
    per = dd.groupBy("h").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max_by("n", "doc_id").alias("newest_n"),
        F.max(F.struct(F.col("n"), (-F.col("doc_id")).alias("nd")))["n"].alias(
            "longest_n"
        ),
    ).filter(F.col("cnt") > 1)
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("newest_n").cast("bigint").alias("keep_newest_tokens"),
        F.sum("longest_n").cast("bigint").alias("keep_longest_tokens"),
    )


@query(
    "llm_cross_source_grams",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
      FROM documents WHERE doc_id % 5 = 0
    ), ngd AS (
      SELECT DISTINCT doc_id, source, array_to_string(t[i:i+3], ' ') AS g
      FROM t, unnest(generate_series(1, len(t) - 3)) u(i)
    ), rare AS (SELECT g FROM ngd GROUP BY g HAVING count(*) <= 64),
    nr AS (SELECT ngd.* FROM ngd JOIN rare USING (g))
    SELECT least(a.source, b.source) AS src_a,
           greatest(a.source, b.source) AS src_b,
           CAST(count(DISTINCT (a.doc_id, b.doc_id)) AS BIGINT) AS n_pairs
    FROM nr a JOIN nr b USING (g) WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
    tags=("llm", "dedup", "contamination", "matrix"),
)
def llm_cross_source_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source shared-gram contamination matrix: for a deterministic
    1-in-5 document sample, source pairs connected by a shared rare
    4-gram (df <= 64 within the sample), counted as distinct ordered
    document pairs and folded to an unordered (least, greatest) source
    matrix. The mirror-site / syndication detector: a hot off-diagonal
    cell means two sources republish each other and per-source dedup
    will under-count. Plan / 100 TB: the sample gate is pushed to the
    scan; the gram self-join is bucketed by gram VALUE with hub grams
    removed by the df cap (the same hot-bucket discipline as
    shared_ngram_edges), and the matrix is source²-sized."""
    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") % 5 == 0)
    ngd = curation.word_ngram_rows(d, "text", "doc_id", 4).join(
        d.select(F.col("doc_id").alias("id"), "source"), "id"
    )
    rare = ngd.groupBy("ngram").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= 64
    )
    # ngd feeds the df agg and the pruned join; nr feeds both pair sides —
    # materialize each once (guide §3.3)
    nr = plan_checkpoint(plan_checkpoint(ngd).join(rare.select("ngram"), "ngram"))
    a = nr.select(
        F.col("ngram"), F.col("id").alias("ida"), F.col("source").alias("sa")
    )
    b = nr.select(
        F.col("ngram"), F.col("id").alias("idb"), F.col("source").alias("sb")
    )
    pairs = a.join(b, "ngram").filter(F.col("ida") < F.col("idb"))
    return (
        pairs.select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
            "ida",
            "idb",
        )
        .groupBy("src_a", "src_b")
        .agg(
            F.count_distinct(F.struct("ida", "idb"))
            .cast("bigint")
            .alias("n_pairs")
        )
    )


@query(
    "llm_pii_cooccurrence",
    oracle="""
    WITH planted AS (
      SELECT doc_id, source,
             CASE
               WHEN doc_id % 17 = 0 THEN
                 trim(text) || ' 555' || CAST(doc_id % 10000 AS VARCHAR)
                 || ' ref code alpha beta gamma delta user'
                 || CAST(doc_id AS VARCHAR) || '@example.com'
               WHEN doc_id % 23 = 3 THEN
                 trim(text) || ' contact user' || CAST(doc_id AS VARCHAR)
                 || '@example.com'
               WHEN doc_id % 29 = 5 THEN
                 trim(text) || ' id 9' || CAST(doc_id % 1000 AS VARCHAR)
               ELSE trim(text)
             END AS text2
      FROM documents
    ), t AS (
      SELECT doc_id, source, string_split_regex(text2, '\\s+') AS t
      FROM planted
    ), pos AS (
      SELECT doc_id, source, i AS idx, t[i] AS tok
      FROM t, unnest(generate_series(1, len(t))) u(i)
    ), dig AS (SELECT doc_id, source, idx FROM pos
               WHERE regexp_matches(tok, '^[0-9]{3,}$')),
    eml AS (SELECT doc_id, idx FROM pos WHERE tok LIKE '%@%')
    SELECT dig.source,
           CAST(count(*) AS BIGINT) AS n_cooc_pairs,
           CAST(count(DISTINCT dig.doc_id) AS BIGINT) AS n_docs_cooc
    FROM dig JOIN eml USING (doc_id)
    WHERE abs(dig.idx - eml.idx) <= 16
    GROUP BY dig.source
    """,
    tags=("llm", "text", "pii", "audit"),
)
def llm_pii_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII co-occurrence windows: digit-run tokens (>= 3 digits) within
    16 tokens of an @-bearing token — the compound-identifier signal
    (phone+email together is the disclosure risk, either alone mostly is
    not) that single-pattern redaction (llm_pii_redact) cannot rank.
    The fixture corpus contains no natural hits, so the query PLANTS
    deterministic identifiers on both engines (every 17th doc gets a
    digit-run 8 tokens from an email — a hit; every 23rd an email alone
    and every 29th a digit-run alone — non-hits that exercise the window
    filter). Plan / 100 TB: the token-position explode filters to
    PII-shaped tokens BEFORE the self-join, so the per-doc join sides
    are the (tiny) PII token sets keyed by doc_id — never all token
    positions against all token positions."""
    d = load_tables(spark, sf_dir)["documents"]
    planted = d.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 17 == 0,
            F.concat(
                F.trim(F.col("text")),
                F.lit(" 555"),
                (F.col("doc_id") % 10000).cast("string"),
                F.lit(" ref code alpha beta gamma delta user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        )
        .when(
            F.col("doc_id") % 23 == 3,
            F.concat(
                F.trim(F.col("text")),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        )
        .when(
            F.col("doc_id") % 29 == 5,
            F.concat(
                F.trim(F.col("text")),
                F.lit(" id 9"),
                (F.col("doc_id") % 1000).cast("string"),
            ),
        )
        .otherwise(F.trim(F.col("text")))
        .alias("text2"),
    )
    pos = planted.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.col("text2"), r"\s+")).alias("idx", "tok"),
    )
    dig = pos.filter(F.col("tok").rlike(r"^[0-9]{3,}$")).select(
        "doc_id", "source", F.col("idx").alias("di")
    )
    eml = pos.filter(F.col("tok").contains("@")).select(
        "doc_id", F.col("idx").alias("ei")
    )
    return (
        dig.join(eml, "doc_id")
        .filter(F.abs(F.col("di") - F.col("ei")) <= 16)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cooc_pairs"),
            F.count_distinct("doc_id").cast("bigint").alias("n_docs_cooc"),
        )
    )


@query(
    "llm_heaps_vocab_growth",
    oracle=_TOK_CTE
    + """
    , mx AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS m FROM documents),
    cps AS (SELECT * FROM (VALUES (CAST(25 AS BIGINT)), (CAST(50 AS BIGINT)),
                                  (CAST(100 AS BIGINT))) c(pct))
    SELECT pct,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT term) AS BIGINT) AS n_types
    FROM tok CROSS JOIN mx JOIN cps ON doc_id * 100 < pct * m
    GROUP BY pct
    """,
    tags=("llm", "text", "heaps", "audit"),
)
def llm_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth checkpoints: distinct-type count after
    the first 25% / 50% / 100% of the doc_id range — the sub-linear
    growth curve (V ≈ K·n^β, β < 1) that distinguishes organic text from
    generator loops (whose vocabulary saturates) and OCR noise (whose
    vocabulary grows linearly). Exact integer counts at three fixed
    checkpoints; the curve shape is the signal, no fitting on the query
    path (llm_chars_per_token_fit is the closed-form fit sibling).
    Plan / 100 TB: one tokenize, a 3-row checkpoint-range join (each
    token lands in every checkpoint it precedes — a bounded 3× map-side
    fan-out), and per-checkpoint distinct aggregates — the same
    two-level distinct-agg shape Catalyst already optimizes with
    partial_count(distinct ...)."""
    d = load_tables(spark, sf_dir)["documents"]
    tok = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    mx = d.agg((F.max("doc_id") + 1).cast("bigint").alias("m"))
    cps = spark.createDataFrame([(25,), (50,), (100,)], "pct bigint")
    return (
        tok.crossJoin(F.broadcast(mx))
        .join(
            F.broadcast(cps),
            F.col("doc_id") * 100 < F.col("pct") * F.col("m"),
        )
        .groupBy("pct")
        .agg(
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.count_distinct("term").cast("bigint").alias("n_types"),
        )
    )


@query(
    "llm_length_gini",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n
      FROM documents
    ), ranked AS (
      SELECT source, n,
             row_number() OVER (PARTITION BY source ORDER BY n, doc_id) AS i
      FROM d
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST((2 * SUM(i * n) - (count(*) + 1) * SUM(n)) * 1000000
                // (count(*) * SUM(n)) AS BIGINT) AS gini_micro
    FROM ranked
    GROUP BY source
    """,
    tags=("llm", "text", "gini", "audit"),
)
def llm_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length inequality per source (Gini coefficient, exact
    integer micro): Σ(2i − n − 1)·x_(i) over ascending-sorted lengths,
    one BIGINT floor division by n·Σx at the end. High Gini means a few
    mega-documents dominate the source's token budget — the signal for
    per-document length caps before the source's sampling weight is
    computed (a source at Gini 0.8 contributes far fewer effective
    documents than its token count suggests). Ties are order-invariant
    (equal x share any coefficient assignment), so the doc_id tie-break
    is determinism polish, not semantics. Plan / 100 TB: one map-side
    length pass, one window PARTITIONED by source (never partition-less),
    one per-source fold."""
    d = load_tables(spark, sf_dir)["documents"]
    base = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("n"),
    )
    w = Window.partitionBy("source").orderBy("n", "doc_id")
    ranked = base.select(
        "source", "n", F.row_number().over(w).cast("bigint").alias("i")
    )
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.expr(
            "(2 * sum(i * n) - (count(*) + 1) * sum(n)) * 1000000"
            " div (count(*) * sum(n))"
        )
        .cast("bigint")
        .alias("gini_micro"),
    )


@query(
    "llm_novelty_decay",
    oracle="WITH "
    + _ngram_cte(7)
    + """
    , mx AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS m FROM documents),
    fs AS (SELECT ngram, min(doc_id) AS fd FROM ngd GROUP BY ngram),
    newd AS (SELECT CAST(fd * 10 // m AS BIGINT) AS decile,
                    CAST(count(*) AS BIGINT) AS n_new
             FROM fs CROSS JOIN mx GROUP BY 1),
    inc AS (SELECT CAST(doc_id * 10 // m AS BIGINT) AS decile,
                   CAST(count(*) AS BIGINT) AS n_incidences
            FROM ngd CROSS JOIN mx GROUP BY 1)
    SELECT decile,
           CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
           n_incidences,
           CAST(coalesce(n_new, 0) * 1000 // n_incidences AS BIGINT)
             AS novelty_milli
    FROM inc LEFT JOIN newd USING (decile)
    """,
    tags=("llm", "text", "novelty", "audit"),
)
def llm_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty decay curve: per doc_id decile, how many distinct 8-grams
    make their FIRST corpus appearance there, as milli of the decile's
    total gram incidences — the crawl-freshness gauge (a healthy growing
    corpus decays slowly; a recrawl-heavy one collapses to near-zero
    novelty after the first deciles, meaning later snapshots are paying
    storage for already-seen text). Same 8-gram kernel as the
    decontamination suite. A decile can carry incidences but zero
    FIRST-seen grams (a pure-recrawl slice), so the incidence rollup is
    the spine and first-sight counts left-join onto it with a 0 default
    (ADVICE r11 — the inner-join form silently dropped such deciles).
    Plan / 100 TB: gram first-sight is a (gram → min doc_id) aggregate —
    the standard value-keyed shuffle; both decile rollups are 10-row
    aggregates; the scalar max(doc_id) broadcasts."""
    d = load_tables(spark, sf_dir)["documents"]
    ngd = curation.word_ngram_rows(d, "text", "doc_id", 8)
    mx = d.agg((F.max("doc_id") + 1).cast("bigint").alias("m"))
    fs = ngd.groupBy("ngram").agg(F.min("id").alias("fd"))
    newd = (
        fs.crossJoin(F.broadcast(mx))
        .select(F.expr("fd * 10 div m").cast("bigint").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new"))
    )
    inc = (
        ngd.crossJoin(F.broadcast(mx))
        .select(F.expr("id * 10 div m").cast("bigint").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_incidences"))
    )
    return (
        inc.join(newd, "decile", "left")
        .select(
            "decile",
            F.coalesce(F.col("n_new"), F.lit(0)).cast("bigint").alias("n_new"),
            "n_incidences",
            F.expr("coalesce(n_new, 0) * 1000 div n_incidences")
            .cast("bigint")
            .alias("novelty_milli"),
        )
    )


@query(
    "llm_embedding_norm_audit",
    oracle="""
    WITH qe AS (
      SELECT vec_id,
             CAST(list_dot_product(
               list_transform(CAST(embedding AS DOUBLE[]), x -> floor(x * 1024)),
               list_transform(CAST(embedding AS DOUBLE[]), x -> floor(x * 1024))
             ) AS BIGINT) AS sqn
      FROM embeddings
    )
    SELECT CAST(length(bin(sqn)) - 1 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(min(sqn) AS BIGINT) AS min_sqn,
           CAST(max(sqn) AS BIGINT) AS max_sqn
    FROM qe GROUP BY 1
    """,
    tags=("llm", "similarity", "norms", "audit"),
)
def llm_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding norm health audit: power-of-two histogram of exact
    integer squared norms over floor(v·1024) codes (bucket = binary digit
    count − 1, the same no-float log2 as llm_cluster_size_powerlaw).
    Norm spread is THE precondition check for dot-product serving: if
    norms span multiple octaves, dot ranking diverges from cosine
    ranking and the ANN index needs normalization first; a tight
    single-bucket histogram certifies dot ≈ cosine. min/max per bucket
    bound the outliers. Plan / 100 TB: the self-dot is ONE vectorized
    Arrow pass (similarity.quantized_pair_dots with both sides the same
    column — never an interpreted higher-order Column chain on the
    corpus-sized path), then a bucket-count-sized aggregate — no joins,
    no windows."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    base = similarity.quantized_pair_dots(
        emb.select(
            "vec_id",
            F.col("embedding").alias("qv"),
            F.col("embedding").alias("cv"),
        ),
        scale=1024,
        dot_name="sqn",
    ).select("sqn")
    return (
        base.select(
            (F.length(F.bin("sqn")) - 1).cast("bigint").alias("bucket"), "sqn"
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.min("sqn").cast("bigint").alias("min_sqn"),
            F.max("sqn").cast("bigint").alias("max_sqn"),
        )
    )


# The Lloyd-inertia oracle reuses llm_corpus's unrolled-CTE generator in
# curve mode (imported, not copied — the chains can never drift).
from hdp2_5_hive2_spark.queries.llm_corpus import _kmeans_oracle


@query(
    "llm_kmeans_inertia",
    oracle=_kmeans_oracle(k=4, iters=2, curve=True),
    tags=("llm", "similarity", "clustering", "kmeans", "convergence"),
)
def llm_kmeans_inertia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd convergence curve: total inertia after 0 / 1 / 2 centroid
    updates (k=4, deterministic lowest-id seeds) — the monotone-descent
    certificate for the distributed k-means operator. Inertia MUST be
    non-increasing per iteration (Lloyd's guarantee); a curve that ticks
    up means the assignment and update steps disagree on the metric —
    the bug class this audit exists to catch before anyone trusts
    llm_kmeans_clusters's final partition. Exact: same int64
    distance/update arithmetic as kmeans_lloyd; the per-iteration sums
    ride the SAME per-round driver sync the update step already does
    (zero extra passes — inertia_curve mode adds one d2 sum to the
    existing k-row aggregate). Oracle: the same unrolled chain as
    llm_kmeans_clusters in curve mode. Plan / 100 TB: unchanged Lloyd
    shape — per round one broadcast-GEMM Arrow pass, one k-row shuffle,
    one k×d driver sync."""
    e = load_tables(spark, sf_dir)["embeddings"]
    return similarity.kmeans_lloyd(e, k=4, iters=2, inertia_curve=True)


def _pack_sweep_oracle() -> str:
    """Per-capacity next-fit packing chains (the r9 llm_pack_greedy_bins
    recursion parameterized over capacity), folded to a 3-row waste
    summary."""
    chains, selects = [], []
    for cap in (128, 256, 512):
        chains.append(f"""
    pack{cap} AS (
      SELECT chunk, rn, nt, 0 AS bin_idx, nt AS fill
      FROM t WHERE rn = 1
      UNION ALL
      SELECT t.chunk, t.rn, t.nt,
             CASE WHEN p.fill + t.nt > {cap} THEN p.bin_idx + 1
                  ELSE p.bin_idx END,
             CASE WHEN p.fill + t.nt > {cap} THEN t.nt
                  ELSE p.fill + t.nt END
      FROM pack{cap} p JOIN t ON t.chunk = p.chunk AND t.rn = p.rn + 1
    ), bins{cap} AS (
      SELECT chunk, bin_idx, CAST(SUM(nt) AS BIGINT) AS fill
      FROM pack{cap} GROUP BY chunk, bin_idx
    )""")
        selects.append(f"""
      SELECT CAST({cap} AS BIGINT) AS capacity,
             CAST(count(*) AS BIGINT) AS n_bins,
             CAST(SUM(fill) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN fill > {cap} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_overflow_bins,
             CAST(SUM(greatest(0, {cap} - fill)) * 1000
                  // (count(*) * {cap}) AS BIGINT) AS waste_milli
      FROM bins{cap}""")
    return (
        """
    WITH RECURSIVE t AS (
      SELECT doc_id // 64 AS chunk, doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS nt,
             row_number() OVER (PARTITION BY doc_id // 64 ORDER BY doc_id)
               AS rn
      FROM documents
    ),"""
        + ",".join(chains)
        + " SELECT * FROM ("
        + " UNION ALL ".join(selects)
        + ")"
    )


@query(
    "llm_packing_waste_sweep",
    oracle=_pack_sweep_oracle(),
    tags=("llm", "packing", "sweep"),
)
def llm_packing_waste_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length packing-efficiency sweep: boundary-aware next-fit
    (the llm_pack_greedy_bins fold) at capacities 128 / 256 / 512, with
    per-capacity bin count, packed tokens, oversized-document bins
    (fill > capacity — a doc larger than the bin gets one to itself) and
    waste as milli of total bin space (Σ max(0, C − fill) / n_bins·C) —
    the measured trade a training team reads before picking a context
    length: short contexts waste little per bin but explode bin (and
    attention-reset) counts; long contexts strand tail capacity. One
    Arrow kernel per 64-doc chunk runs all three folds over (doc_id, nt)
    rows only — text never reaches Python or any shuffle; the oracle is
    three parameterized recursive CTEs. Plan / 100 TB: chunks are 64-row
    units, perfectly parallel, shuffle rows are 32 bytes."""
    import pandas as pd

    from hdp2_5_hive2_spark.llm.text import token_count

    d = load_tables(spark, sf_dir)["documents"]
    toks = d.select(
        F.expr("doc_id div 64").alias("chunk"),
        "doc_id",
        token_count("text").cast("bigint").alias("nt"),
    )

    def sweep(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id")
        chunk = int(pdf["chunk"].iloc[0])
        out = []
        for cap in (128, 256, 512):
            bin_idx, fill, ndocs = 0, 0, 0
            for t in pdf["nt"]:
                t = int(t)
                if ndocs > 0 and fill + t > cap:
                    out.append((cap, chunk, bin_idx, fill))
                    bin_idx, fill, ndocs = bin_idx + 1, 0, 0
                fill += t
                ndocs += 1
            if ndocs:
                out.append((cap, chunk, bin_idx, fill))
        return pd.DataFrame(
            out, columns=["capacity", "chunk", "bin_idx", "fill"]
        )

    bins = toks.groupBy("chunk").applyInPandas(
        sweep, "capacity bigint, chunk bigint, bin_idx bigint, fill bigint"
    )
    return bins.groupBy("capacity").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum("fill").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("fill") > F.col("capacity"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_overflow_bins"),
        F.expr(
            "sum(greatest(0, capacity - fill)) * 1000"
            " div (count(*) * capacity)"
        )
        .cast("bigint")
        .alias("waste_milli"),
    )


@query(
    "events_interleave_schedule",
    oracle="""
    WITH w AS (
      SELECT event_id, event_type, ts,
             CASE WHEN event_type = 'purchase' THEN CAST(3 AS BIGINT)
                  WHEN event_type = 'click' THEN CAST(2 AS BIGINT)
                  ELSE CAST(1 AS BIGINT) END AS wt
      FROM events
    ), items AS (
      SELECT event_type, event_id, wt,
             row_number() OVER (
               PARTITION BY event_type ORDER BY ts, event_id
             ) AS i
      FROM w
    ), keyed AS (
      SELECT event_type, event_id,
             CAST(i * (6 // wt) AS BIGINT) AS vkey
      FROM items
    )
    SELECT CAST(pos AS BIGINT) AS pos, event_type, event_id, vkey FROM (
      SELECT event_type, event_id, vkey,
             row_number() OVER (ORDER BY vkey, event_type, event_id) AS pos
      FROM keyed
    ) WHERE pos <= 30
    """,
    tags=("events", "streaming", "schedule", "interleave"),
)
def events_interleave_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-fair interleave of EVENT-TYPE streams (the event-time twin
    of llm_mixture_interleave, and the batch side of the stateful
    streaming scheduler parity-pinned in tests/test_streaming_corpus.py):
    event types weighted purchase:3, click:2, others:1 emit in (ts,
    event_id) arrival order; item i of a weight-w stream carries virtual
    finish time i·(6/w) — weighted-fair-queueing with LCM 6, every key an
    exact integer — and the realized schedule is the first 30 positions
    of the (vkey, type, id) total order. The property under test is the
    one a multiplexing ingest service needs: every schedule prefix tracks
    3:2:1 within one item per stream. Plan / 100 TB: per-type index
    window is PARTITIONED by event_type; the global cut is
    TakeOrderedAndProject (bounded 30-row heap) + window-free
    bounded_rank for positions."""
    ev = load_tables(spark, sf_dir)["events"]
    wt = (
        F.when(F.col("event_type") == "purchase", F.lit(3))
        .when(F.col("event_type") == "click", F.lit(2))
        .otherwise(F.lit(1))
        .cast("bigint")
    )
    ws = Window.partitionBy("event_type").orderBy("ts", "event_id")
    items = (
        ev.select("event_type", "event_id", "ts", wt.alias("wt"))
        .withColumn("i", F.row_number().over(ws))
        .select(
            "event_type",
            "event_id",
            F.expr("i * (6 div wt)").cast("bigint").alias("vkey"),
        )
    )
    top = items.orderBy("vkey", "event_type", "event_id").limit(30)
    ranked = retrieval.bounded_rank(
        top.withColumn(
            "_tie",
            F.struct(
                F.col("event_type").alias("t"), F.col("event_id").alias("e")
            ),
        ),
        "vkey",
        "_tie",
        ascending=True,
    )
    return ranked.select(
        F.col("rank").cast("bigint").alias("pos"),
        "event_type",
        "event_id",
        "vkey",
    )
