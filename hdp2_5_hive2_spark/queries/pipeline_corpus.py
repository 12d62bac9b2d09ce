"""Round-9 corpus: the LLM-training-pipeline frontier past the dedup /
retrieval / multimodal suites — learned-sparse and language-model retrieval
(SPLADE-style impacts, Dirichlet query likelihood), ranking evaluation
(nDCG with exact-fraction discounts), data governance (robots / license
propagation), shard compaction planning, boundary-aware sequence packing,
dup-graph provenance, embedding-space audits (power iteration, centroid
drift, cosine histograms, quantization error, sign-code balance, k-NN
reciprocity), and contamination span analysis.

Oracle discipline (the r4-r8 standard): every floating-point output is a
FIXED expression tree of single IEEE-754 ops over exact integers — no
transcendentals (log-discounts become exact integer fractions over
LCM(2..11); log-likelihoods become monotonic products of single-division
probabilities), no order-dependent double accumulation (integer sums
aggregate freely; double products multiply in fixed query-term order).
Embedding kernels quantize floor(v·1024) ONCE and stay in int64 from there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdp2_5_hive2_spark.catalog import load_tables
from hdp2_5_hive2_spark.llm import curation, retrieval, similarity
from hdp2_5_hive2_spark.llm import text as llm_text
from hdp2_5_hive2_spark.llm.text import plan_checkpoint, token_count
from hdp2_5_hive2_spark.queries.registry import query

# Shared tokenization CTE (DuckDB side) — mirrors llm.text.tokens.
_TOK_CTE = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    )
"""


@query(
    "llm_splade_topk",
    oracle=_TOK_CTE
    + """
    , tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN ('spark', 'join', 'window', 'table', 'query')
      GROUP BY doc_id, term
    ), s AS (
      SELECT doc_id,
             CAST(SUM((CASE term WHEN 'spark' THEN 3 WHEN 'join' THEN 2
                        WHEN 'window' THEN 2 WHEN 'table' THEN 1
                        WHEN 'query' THEN 1 ELSE 0 END)
                      * least(tf, 5)) AS BIGINT) AS score
      FROM tf GROUP BY doc_id
    )
    SELECT doc_id, score, CAST(rank AS BIGINT) AS rank FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM s
    ) WHERE rank <= 15
    """,
    tags=("llm", "retrieval", "splade", "sparse"),
)
def llm_splade_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-sparse retrieval serving (llm.retrieval.splade_topk): the
    query is a sparse term→integer-weight vector {spark:3, join:2,
    window:2, table:1, query:1}; documents score Σ w_t·min(tf,5) —
    SPLADE-style saturated impacts kept pure int64, so the ranking needs
    no float discipline at all. Posting-list plan: tf filtered to the
    query's 5 terms before any aggregation, weights as a codegen CASE,
    top-15 via TakeOrderedAndProject + window-free bounded_rank."""
    d = load_tables(spark, sf_dir)["documents"]
    top = retrieval.splade_topk(
        d, [("spark", 3), ("join", 2), ("window", 2), ("table", 1), ("query", 1)],
        topk=15,
    )
    return top.select("doc_id", "score", F.col("rank").cast("bigint").alias("rank"))


@query(
    "llm_query_likelihood",
    oracle=_TOK_CTE
    + """
    , tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ), cf AS (
      SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf
      WHERE term IN ('spark', 'join', 'window') GROUP BY term
    ), st AS (
      SELECT CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS c_total
      FROM documents
    ), dl AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS dl
      FROM documents
    ), p AS (
      SELECT g.doc_id, g.term,
             CAST(COALESCE(t.tf, 0) * s.c_total + 2000 * g.cf AS DOUBLE)
               / CAST((g.dl + 2000) * s.c_total AS DOUBLE) AS p_t
      FROM (SELECT d.doc_id, d.dl, c.term, c.cf FROM dl d CROSS JOIN cf c) g
      LEFT JOIN tf t ON t.doc_id = g.doc_id AND t.term = g.term
      CROSS JOIN st s
    ), sc AS (
      SELECT doc_id,
             coalesce(MAX(CASE WHEN term = 'spark'  THEN p_t END), 0.0)
           * coalesce(MAX(CASE WHEN term = 'join'   THEN p_t END), 0.0)
           * coalesce(MAX(CASE WHEN term = 'window' THEN p_t END), 0.0) AS score
      FROM p GROUP BY doc_id
    )
    SELECT doc_id, score, CAST(rank AS BIGINT) AS rank FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM sc
    ) WHERE rank <= 15
    """,
    tags=("llm", "retrieval", "language-model"),
)
def llm_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood ranking
    (llm.retrieval.query_likelihood_rank, μ=2000): p(t|d) =
    (tf·|C| + μ·cf_t)/((dl+μ)·|C|) — ONE IEEE division of exact int64
    products per term — and the document score is the product of the three
    per-term probabilities in fixed query order (log-free; monotonic with
    log-sum, so the ranking matches the textbook model exactly). Every
    document scores: smoothing covers absent terms, which is the model's
    point versus BM25. Collection stats broadcast; top-15 window-free."""
    d = load_tables(spark, sf_dir)["documents"]
    top = retrieval.query_likelihood_rank(
        d, ["spark", "join", "window"], mu=2000, topk=15
    )
    return top.select("doc_id", "score", F.col("rank").cast("bigint").alias("rank"))


# Exact reciprocal-discount prefix sums: Σ_{i=1..m} 27720/(i+1) for
# m = 1..10 (27720 = LCM(2..11), so every addend is an exact integer).
_IDCG_PREFIX = [13860, 23100, 30030, 35574, 40194, 44154, 47619, 50699, 53471, 55991]


@query(
    "llm_ndcg_eval",
    oracle="""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> floor(x * 1024)) AS qv
      FROM embeddings WHERE vec_id < 8
    ), c AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> floor(x * 1024)) AS qv
      FROM embeddings WHERE vec_id >= 8
    ), s AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS dot,
             CASE WHEN q.label = c.label THEN 1 ELSE 0 END AS rel
      FROM q CROSS JOIN c
    ), r AS (
      SELECT qid, rel,
             row_number() OVER (PARTITION BY qid ORDER BY dot DESC, cid) AS rn
      FROM s
    ), nr AS (
      SELECT qid, CAST(SUM(rel) AS BIGINT) AS n_rel FROM s GROUP BY qid
    ), d AS (
      SELECT qid, CAST(SUM(rel * (27720 // (rn + 1))) AS BIGINT) AS dcg_num
      FROM r WHERE rn <= 10 GROUP BY qid
    )
    SELECT nr.qid AS vec_id, nr.n_rel, d.dcg_num,
           CAST(CASE WHEN nr.n_rel = 0 THEN 0
                ELSE [13860,23100,30030,35574,40194,44154,47619,50699,53471,55991
                     ][least(nr.n_rel, 10)] END AS BIGINT) AS idcg_num,
           CASE WHEN nr.n_rel = 0 THEN 0.0
                ELSE CAST(d.dcg_num AS DOUBLE)
                     / CAST([13860,23100,30030,35574,40194,44154,47619,50699,
                             53471,55991][least(nr.n_rel, 10)] AS DOUBLE)
           END AS ndcg
    FROM nr JOIN d USING (qid)
    """,
    tags=("llm", "similarity", "eval", "ndcg"),
)
def llm_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation: nDCG@10 of the exact quantized-dot
    retrieval against label-match relevance, per query (the evaluation
    harness a retrieval pipeline runs before swapping ANN indexes).
    Transcendental-free discounts: the usual 1/log2(i+1) is replaced by the
    reciprocal discount 1/(i+1) scaled by LCM(2..11)=27720, so DCG and
    ideal-DCG are exact int64 sums and nDCG is ONE double division —
    bit-stable on any engine. Plan: top-10 per query from
    llm.similarity.quantized_dot_topk (queries broadcast, per-batch top-k,
    window partitioned by query), relevance and n_rel ride broadcast
    label joins."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    q = emb.filter(F.col("vec_id") < 8)
    c = emb.filter(F.col("vec_id") >= 8)
    top = F.broadcast(
        similarity.quantized_dot_topk(
            c.select("vec_id", "embedding"), q.select("vec_id", "embedding"), k=10
        )
    )
    qlab = q.select(F.col("vec_id").alias("query_id"), F.col("label").alias("q_label"))
    clab = c.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("c_label"))
    rel = (
        top.join(F.broadcast(qlab), "query_id")
        .join(clab, "neighbor_id")
        .select(
            "query_id",
            F.when(F.col("q_label") == F.col("c_label"), 1).otherwise(0).alias("rel"),
            F.expr("27720 div (rank + 1)").alias("w"),
        )
    )
    dcg = rel.groupBy("query_id").agg(
        F.sum(F.col("rel") * F.col("w")).cast("bigint").alias("dcg_num")
    )
    lab_counts = c.groupBy(F.col("label").alias("c_label")).agg(
        F.count(F.lit(1)).alias("n_lab")
    )
    nr = (
        qlab.join(
            F.broadcast(lab_counts), F.col("q_label") == F.col("c_label"), "left"
        )
        .select(
            "query_id", F.coalesce(F.col("n_lab"), F.lit(0)).cast("bigint").alias("n_rel")
        )
    )
    prefix = F.array(*[F.lit(v) for v in _IDCG_PREFIX])
    idcg = F.when(F.col("n_rel") == 0, F.lit(0)).otherwise(
        F.element_at(prefix, F.least(F.col("n_rel"), F.lit(10)).cast("int"))
    )
    return (
        nr.join(dcg, "query_id")
        .select(
            F.col("query_id").alias("vec_id"),
            "n_rel",
            "dcg_num",
            idcg.cast("bigint").alias("idcg_num"),
            F.when(F.col("n_rel") == 0, F.lit(0.0))
            .otherwise(
                F.col("dcg_num").cast("double") / idcg.cast("double")
            )
            .alias("ndcg"),
        )
    )


@query(
    "llm_license_propagation",
    oracle="""
    WITH pages AS (
      SELECT doc_id, source AS host,
             CASE doc_id % 5 WHEN 0 THEN 'cc-by' WHEN 1 THEN 'cc-by-sa'
                  WHEN 2 THEN 'proprietary' ELSE NULL END AS page_license
      FROM documents
    ), hosts AS (
      SELECT host, MIN(page_license) AS host_default,
             substr(md5(host), 1, 1) IN ('0', '1', '2', '3') AS robots_blocked
      FROM pages GROUP BY host
    )
    SELECT p.host AS source,
           CAST(count(*) AS BIGINT) AS n_pages,
           h.robots_blocked,
           CAST(CASE WHEN h.robots_blocked THEN count(*) ELSE 0 END AS BIGINT)
             AS n_blocked,
           CAST(SUM(CASE WHEN p.page_license IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_explicit,
           CAST(SUM(CASE WHEN p.page_license IS NULL
                         AND h.host_default IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_inherited,
           CAST(SUM(CASE WHEN p.page_license IS NULL
                         AND h.host_default IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unlicensed,
           CAST(SUM(CASE WHEN p.page_license IS NOT NULL
                         AND h.host_default IS NOT NULL
                         AND p.page_license <> h.host_default THEN 1 ELSE 0 END)
                AS BIGINT) AS n_conflicts
    FROM pages p JOIN hosts h USING (host)
    GROUP BY p.host, h.robots_blocked
    """,
    tags=("llm", "governance", "license"),
)
def llm_license_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots / license propagation audit (the governance join a crawl
    pipeline runs before releasing a training set): page-level license
    tags (derived deterministically from doc_id, NULL = untagged)
    inherit the host-level default (MIN of the host's explicit tags — the
    most-permissive-by-collation rule, deterministic); robots disallow is
    a host-level bit (md5-derived). Per host: explicit / inherited /
    unlicensed page counts, tag-vs-default conflicts, and blocked-page
    totals. Plan / 100 TB: the host table is |hosts|-sized and broadcasts
    into the page-level pass; one page-grain aggregate — no row ever
    shuffles twice. Reference surface: Hive models this as a two-level
    dimension join (SemanticAnalyzer.java join planning); the propagation
    semantics (COALESCE down a hierarchy) are the point here."""
    d = load_tables(spark, sf_dir)["documents"]
    pages = d.select(
        "doc_id",
        F.col("source").alias("host"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("cc-by"))
        .when(F.col("doc_id") % 5 == 1, F.lit("cc-by-sa"))
        .when(F.col("doc_id") % 5 == 2, F.lit("proprietary"))
        .alias("page_license"),
    )
    # robots_blocked is an aggregate-free expression of the group key; Spark
    # requires it inside agg — first() over the per-group constant is exact.
    hosts = pages.groupBy("host").agg(
        F.min("page_license").alias("host_default"),
        F.first(
            F.substring(F.md5(F.col("host")), 1, 1).isin("0", "1", "2", "3")
        ).alias("robots_blocked"),
    )
    j = pages.join(F.broadcast(hosts), "host")
    return (
        j.groupBy(F.col("host").alias("source"), "robots_blocked")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.when(F.col("page_license").isNotNull(), 1).otherwise(0))
            .alias("n_explicit"),
            F.sum(
                F.when(
                    F.col("page_license").isNull()
                    & F.col("host_default").isNotNull(),
                    1,
                ).otherwise(0)
            ).alias("n_inherited"),
            F.sum(
                F.when(
                    F.col("page_license").isNull() & F.col("host_default").isNull(),
                    1,
                ).otherwise(0)
            ).alias("n_unlicensed"),
            F.sum(
                F.when(
                    F.col("page_license").isNotNull()
                    & F.col("host_default").isNotNull()
                    & (F.col("page_license") != F.col("host_default")),
                    1,
                ).otherwise(0)
            ).alias("n_conflicts"),
        )
        .select(
            "source",
            "n_pages",
            "robots_blocked",
            F.when(F.col("robots_blocked"), F.col("n_pages"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("n_blocked"),
            "n_explicit",
            "n_inherited",
            "n_unlicensed",
            "n_conflicts",
        )
    )


@query(
    "llm_shard_compaction_audit",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
           CAST((SUM(n_chars) + 16383) // 16384 AS BIGINT) AS n_shards,
           CAST(SUM(n_chars)
                - ((SUM(n_chars) + 16383) // 16384 - 1) * 16384 AS BIGINT)
             AS tail_bytes,
           (SUM(n_chars)
            - ((SUM(n_chars) + 16383) // 16384 - 1) * 16384) * 2 < 16384
             AS tail_small,
           CAST(SUM(CASE WHEN n_chars > 16384 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oversized,
           CAST(SUM(n_chars) AS DOUBLE)
             / CAST(((SUM(n_chars) + 16383) // 16384) * 16384 AS DOUBLE)
             AS fill_ratio
    FROM documents GROUP BY source
    """,
    tags=("llm", "storage", "compaction"),
)
def llm_shard_compaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard compaction plan audit (the small-files report a corpus-shard
    writer runs before compacting, cf. the reference's merge-files
    compaction AbstractFileMergeOperator.java): per source, the byte
    total, the shard count at a 16 KiB target (ceil via the engine-safe
    (a+b-1) div b — never -((-a) div b), both engines truncate toward
    zero), the tail-shard size and a small-tail flag (tail under half the
    target wants merging into a neighbor), oversized-document count
    (docs that must split across shards), and the fill ratio as one
    double division. Pure per-source aggregation: one shuffle at source
    grain, integers throughout."""
    d = load_tables(spark, sf_dir)["documents"]
    target = F.lit(16384)
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_bytes"),
        F.sum(F.when(F.col("n_chars") > target, 1).otherwise(0)).alias("n_oversized"),
    )
    shards = F.expr("(total_bytes + 16383) div 16384")
    tail = F.col("total_bytes") - (shards - F.lit(1)) * target
    return agg.select(
        "source",
        "n_docs",
        "total_bytes",
        shards.cast("bigint").alias("n_shards"),
        tail.cast("bigint").alias("tail_bytes"),
        (tail * F.lit(2) < target).alias("tail_small"),
        "n_oversized",
        (
            F.col("total_bytes").cast("double")
            / (shards * target).cast("double")
        ).alias("fill_ratio"),
    )


# Reused DuckDB CTE fragments from the established corpora (imported, not
# copied, so the derivations can never drift from the queries they mirror).
from hdp2_5_hive2_spark.queries.llm_corpus import (  # noqa: E402
    _ngram_cte,
    _WINNOW_ORACLE_CTE,
)


@query(
    "llm_pack_greedy_bins",
    oracle="""
    WITH RECURSIVE t AS (
      SELECT doc_id // 64 AS chunk, doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS nt,
             row_number() OVER (PARTITION BY doc_id // 64 ORDER BY doc_id)
               AS rn
      FROM documents
    ), pack AS (
      SELECT chunk, rn, nt, 0 AS bin_idx, nt AS fill
      FROM t WHERE rn = 1
      UNION ALL
      SELECT t.chunk, t.rn, t.nt,
             CASE WHEN p.fill + t.nt > 512 THEN p.bin_idx + 1
                  ELSE p.bin_idx END,
             CASE WHEN p.fill + t.nt > 512 THEN t.nt
                  ELSE p.fill + t.nt END
      FROM pack p JOIN t ON t.chunk = p.chunk AND t.rn = p.rn + 1
    )
    SELECT CAST(chunk AS BIGINT) AS chunk,
           CAST(bin_idx AS BIGINT) AS bin_idx,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS n_tokens,
           CAST(SUM(nt) AS DOUBLE) / 512.0 AS util
    FROM pack GROUP BY chunk, bin_idx
    """,
    tags=("llm", "packing", "curriculum"),
)
def llm_pack_greedy_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-AWARE sequence packing (the sibling of llm_pack_sequences,
    which concatenates across document boundaries): documents never split —
    greedy next-fit pours doc_id-ordered documents into 512-token bins and
    opens a new bin when the next document would overflow (a document
    larger than the bin gets one to itself). Packing is inherently
    sequential, so it runs per CHUNK of 64 consecutive documents
    (chunk = doc_id div 64 — the deterministic unit a packing worker owns),
    exactly how a distributed packer shards the problem: applyInPandas per
    chunk over (chunk, doc_id, n_tokens) rows ONLY — token counts are
    computed JVM-side first and the text column never reaches the Python
    worker or any shuffle. Per bin: doc count, token total, utilization
    (one double division by the power-of-two capacity). Oracle: the same
    greedy fold as a recursive CTE. 100 TB: chunks are 64 rows each,
    perfectly parallel; the shuffle carries 24-byte rows."""
    import pandas as pd

    d = load_tables(spark, sf_dir)["documents"]
    toks = d.select(
        F.expr("doc_id div 64").alias("chunk"),
        "doc_id",
        token_count("text").cast("bigint").alias("nt"),
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id")
        out = []
        chunk = int(pdf["chunk"].iloc[0])
        bin_idx, fill, ndocs = 0, 0, 0
        for t in pdf["nt"]:
            t = int(t)
            if ndocs > 0 and fill + t > 512:
                out.append((chunk, bin_idx, ndocs, fill))
                bin_idx, fill, ndocs = bin_idx + 1, 0, 0
            fill += t
            ndocs += 1
        if ndocs:
            out.append((chunk, bin_idx, ndocs, fill))
        return pd.DataFrame(
            out, columns=["chunk", "bin_idx", "n_docs", "n_tokens"]
        )

    bins = toks.groupBy("chunk").applyInPandas(
        pack, "chunk bigint, bin_idx bigint, n_docs bigint, n_tokens bigint"
    )
    return bins.withColumn(
        "util", F.col("n_tokens").cast("double") / F.lit(512.0)
    )


@query(
    "llm_dup_2hop_provenance",
    oracle=f"""
    WITH {_WINNOW_ORACLE_CTE},
    f AS (SELECT doc_id, unnest(fps) AS fp FROM winnowed),
    kept AS (SELECT fp FROM f GROUP BY fp HAVING count(*) BETWEEN 2 AND 50),
    e AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM f a JOIN kept USING (fp) JOIN f b USING (fp)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    nb AS (
      SELECT doc_a AS node, doc_b AS nbr FROM e
      UNION ALL SELECT doc_b, doc_a FROM e
    ),
    keepn AS (SELECT node FROM nb GROUP BY node HAVING count(*) <= 64),
    nbk AS (SELECT nb.node, nb.nbr FROM nb JOIN keepn USING (node)),
    two AS (
      SELECT l.nbr AS a, l.node AS mid, r.nbr AS c
      FROM nbk l JOIN nbk r ON l.node = r.node AND l.nbr < r.nbr
    ),
    g AS (SELECT a, c, CAST(count(*) AS BIGINT) AS n_middles
          FROM two GROUP BY a, c)
    SELECT g.a AS doc_a, g.c AS doc_b, g.n_middles,
           (e.doc_a IS NOT NULL) AS direct
    FROM g LEFT JOIN e ON e.doc_a = g.a AND e.doc_b = g.c
    ORDER BY g.n_middles DESC, doc_a, doc_b LIMIT 30
    """,
    tags=("llm", "dedup", "provenance", "graph"),
)
def llm_dup_2hop_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup provenance chains: 2-hop lineage over the winnowing-
    fingerprint dup graph — endpoint pairs connected through ≥1 shared
    intermediate, the evidence a curation audit uses to explain WHY two
    documents landed in one dedup cluster (transitive duplication through
    a middleman, e.g. a quote chain). Edges are the fingerprint-bucket
    pairs (same derivation as llm_fingerprint_overlap — imported CTE, no
    drift); nodes with degree > 64 are excluded before the neighbor
    self-join (the degree cap that keeps the middle fan-out ≤ 64² per hot
    node at any corpus size — the same boilerplate-hub guard the
    fingerprint pass applies at the bucket level). Output: endpoint pair,
    middle count, and whether the endpoints are ALSO directly connected
    ((n_middles desc, pair) is a total order, so LIMIT 30 is
    deterministic). 100 TB: bucket-bounded edges, degree-capped fan-out,
    ids-only shuffles."""
    d = load_tables(spark, sf_dir)["documents"]
    f = (
        llm_text.winnow_fingerprints(d, k=3, w=4)
        .select("doc_id", F.explode("fps").alias("fp"))
        .transform(plan_checkpoint)
    )
    counts = f.groupBy("fp").agg(F.count(F.lit(1)).alias("c"))
    # kept feeds both join sides — materialize or the count agg runs twice
    kept = (
        counts.filter((F.col("c") >= 2) & (F.col("c") <= 50))
        .select("fp")
        .transform(plan_checkpoint)
    )
    a = f.join(kept, "fp").alias("a")
    b = f.join(kept, "fp").alias("b")
    edges = (
        a.join(b, "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("doc_a", "doc_b")
        .transform(plan_checkpoint)
    )
    nbrs = edges.select(
        F.col("doc_a").alias("node"), F.col("doc_b").alias("nbr")
    ).unionAll(edges.select(F.col("doc_b").alias("node"), F.col("doc_a").alias("nbr")))
    keep_nodes = nbrs.groupBy("node").agg(F.count(F.lit(1)).alias("deg")).filter(
        F.col("deg") <= 64
    ).select("node")
    nbk = nbrs.join(keep_nodes, "node")
    l, r = nbk.alias("l"), nbk.alias("r")
    two = (
        l.join(r, "node")
        .filter(F.col("l.nbr") < F.col("r.nbr"))
        .select(F.col("l.nbr").alias("a"), F.col("r.nbr").alias("c"))
    )
    g = two.groupBy("a", "c").agg(F.count(F.lit(1)).alias("n_middles"))
    out = (
        g.join(
            edges,
            (F.col("doc_a") == F.col("a")) & (F.col("doc_b") == F.col("c")),
            "left",
        )
        .select(
            F.col("a").alias("_da"),
            F.col("c").alias("_db"),
            "n_middles",
            F.col("doc_a").isNotNull().alias("direct"),
        )
        .withColumnRenamed("_da", "doc_a")
        .withColumnRenamed("_db", "doc_b")
    )
    return out.orderBy(F.desc("n_middles"), "doc_a", "doc_b").limit(30)


@query(
    "llm_reference_novelty",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), ngd AS (
      SELECT DISTINCT doc_id, source, ngram FROM (
        SELECT doc_id, source,
               unnest(list_transform(generate_series(1, len(t) - 7),
                                     i -> array_to_string(t[i:i+7], ' ')))
                 AS ngram
        FROM t
      )
    ), ref AS (
      SELECT DISTINCT ngram FROM ngd WHERE source IN ('src0', 'src1')
    ), tr AS (
      SELECT doc_id, ngram FROM ngd WHERE source NOT IN ('src0', 'src1')
    )
    SELECT tr.doc_id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_ngrams,
           CAST(SUM(CASE WHEN r.ngram IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(SUM(CASE WHEN r.ngram IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS novelty_frac
    FROM tr LEFT JOIN ref r USING (ngram)
    GROUP BY tr.doc_id
    """,
    tags=("llm", "curation", "novelty"),
)
def llm_reference_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-corpus novelty scoring — the inverse of decontamination:
    how much of each candidate document's distinct 8-gram set is UNSEEN in
    a reference corpus (sources src0/src1), the up-sampling signal a data
    mixer uses to prefer documents that add new content rather than
    repeating what the reference already covers (llm_bigram_novelty
    measures corpus-internal rarity; this measures novelty against a
    designated external reference). Same Arrow n-gram pass as
    decontaminate; one left join against the reference's distinct-gram
    set; novelty is one double division of exact counts. 100 TB: grams
    shuffle by value (the decontaminate join shape); documents under 8
    tokens emit nothing on either engine."""
    d = load_tables(spark, sf_dir)["documents"]
    ref_docs = d.filter(F.col("source").isin("src0", "src1"))
    train = d.filter(~F.col("source").isin("src0", "src1"))
    ref = (
        curation.word_ngram_rows(ref_docs, "text", "doc_id", 8)
        .select("ngram")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    tr = curation.word_ngram_rows(train, "text", "doc_id", 8)
    j = tr.join(ref, "ngram", "left")
    return (
        j.groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_ngrams").cast("double")).alias(
                "novelty_frac"
            ),
        )
    )


@query(
    "llm_contamination_spans",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id, i AS idx, array_to_string(t[i:i+7], ' ') AS g
      FROM t, unnest(generate_series(1, len(t) - 7)) u(i)
    ), ev AS (
      SELECT DISTINCT g FROM pos WHERE doc_id % 29 = 0
    ), hits AS (
      SELECT p.doc_id, p.idx FROM pos p JOIN ev USING (g)
      WHERE p.doc_id % 29 <> 0
    ), isl AS (
      SELECT doc_id, idx,
             idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS grp
      FROM hits
    ), sp AS (
      SELECT doc_id, grp, count(*) AS len FROM isl GROUP BY doc_id, grp
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(MAX(len) AS BIGINT) AS max_span_len,
           CAST(SUM(len) AS BIGINT) AS n_hit_positions
    FROM sp GROUP BY doc_id
    """,
    tags=("llm", "curation", "contamination"),
)
def llm_contamination_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination SPAN analysis (Lee et al. 2021's observation that
    matches cluster into long runs): per train document, the islands of
    CONSECUTIVE eval-matching 8-gram positions — span count, longest span,
    and total matching positions. A single 50-token verbatim quote shows
    up as one 43-position span, not 43 scattered hits, which is what
    distinguishes quotation from paraphrase-level leakage. Positional
    n-grams ride a per-document window (collect_list over ROWS BETWEEN
    CURRENT AND 7 FOLLOWING — partitioned by doc_id, never global);
    islands use the classic idx - row_number() gaps-and-islands device,
    also per-document. 100 TB: every window is keyed by doc_id; the
    eval-gram join is the decontaminate shape."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("idx", "tok"),
    )
    w8 = Window.partitionBy("doc_id").orderBy("idx").rowsBetween(0, 7)
    grams = (
        toks.withColumn("g", F.concat_ws(" ", F.collect_list("tok").over(w8)))
        .withColumn("_n", F.count("tok").over(w8))
        .filter(F.col("_n") == 8)
        .select("doc_id", "idx", "g")
    )
    ev = grams.filter(F.col("doc_id") % 29 == 0).select("g").distinct()
    hits = (
        grams.filter(F.col("doc_id") % 29 != 0)
        .join(ev, "g")
        .select("doc_id", "idx")
    )
    wd = Window.partitionBy("doc_id").orderBy("idx")
    isl = hits.withColumn("grp", F.col("idx") - F.row_number().over(wd))
    sp = isl.groupBy("doc_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return sp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.max("len").cast("bigint").alias("max_span_len"),
        F.sum("len").cast("bigint").alias("n_hit_positions"),
    )


@query(
    "llm_bloom_fp_audit",
    oracle="WITH " + _ngram_cte(7) + """
    , ev AS (SELECT DISTINCT ngram FROM ngd WHERE doc_id % 29 = 0),
    pos AS (
      SELECT DISTINCT
             CAST(('0x' || substring(md5(ngram || '#' || j), 1, 8)) AS BIGINT)
               % 4194304 AS p
      FROM ev, unnest([0, 1, 2]) AS u(j)
    ), tr AS (SELECT doc_id, ngram FROM ngd WHERE doc_id % 29 <> 0),
    trpos AS (
      SELECT doc_id, ngram,
             CAST(('0x' || substring(md5(ngram || '#' || j), 1, 8)) AS BIGINT)
               % 4194304 AS p
      FROM tr, unnest([0, 1, 2]) AS u(j)
    ),
    probe AS (
      SELECT t.doc_id, t.ngram,
             SUM(CASE WHEN pos.p IS NULL THEN 0 ELSE 1 END) AS n_set
      FROM trpos t LEFT JOIN pos ON pos.p = t.p
      GROUP BY t.doc_id, t.ngram
    ),
    bloom AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_ngrams,
             CAST(SUM(CASE WHEN n_set = 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged
      FROM probe GROUP BY doc_id
    ),
    exact AS (
      SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_true
      FROM tr JOIN ev USING (ngram) GROUP BY tr.doc_id
    )
    SELECT b.doc_id, b.n_ngrams, b.n_flagged,
           CAST(coalesce(e.n_true, 0) AS BIGINT) AS n_true,
           CAST(b.n_flagged - coalesce(e.n_true, 0) AS BIGINT) AS n_fp
    FROM bloom b LEFT JOIN exact e USING (doc_id)
    """,
    tags=("llm", "curation", "bloom", "audit"),
)
def llm_bloom_fp_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter false-positive audit: the measured-vs-exact comparison
    a pipeline runs before trusting the constant-memory decontamination
    gate — per train document, Bloom-POSITIVE n-gram count versus the
    exact hit count, and their difference (the realized false positives;
    analytic expectation (1-e^(-kN/m))^k ≈ per-gram FP rate). Composes the
    two existing kernels: decontaminate_bloom (m=4M bits, k=3 — the
    per-partition bitmap-fold path reworked this round) LEFT-joined with
    exact decontaminate; Bloom one-sidedness guarantees n_fp >= 0 on every
    row, which the oracle verifies value-exactly because the md5-derived
    bit positions are deterministic on both engines."""
    d = load_tables(spark, sf_dir)["documents"]
    ev = d.filter(F.col("doc_id") % 29 == 0)
    tr = d.filter(F.col("doc_id") % 29 != 0)
    bloom = curation.decontaminate_bloom(tr, ev, n=8, m_bits=1 << 22, k=3).select(
        "doc_id", "n_ngrams", "n_flagged"
    )
    exact = curation.decontaminate(tr, ev, n=8).select(
        "doc_id", F.col("n_hit_ngrams").alias("n_true")
    )
    return (
        bloom.join(exact, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            "n_flagged",
            F.coalesce(F.col("n_true"), F.lit(0)).cast("bigint").alias("n_true"),
            (F.col("n_flagged") - F.coalesce(F.col("n_true"), F.lit(0)))
            .cast("bigint")
            .alias("n_fp"),
        )
    )


# Shared quantized-embedding CTE (DuckDB side): one (vec_id, dim, q) row per
# dimension, q = floor(v·1024) — mirrors the Spark-side posexplode+floor.
_QEMB_CTE = """
    WITH e AS (
      SELECT vec_id, label, i - 1 AS dim,
             CAST(floor(CAST(embedding AS DOUBLE[])[i] * 1024) AS BIGINT) AS q
      FROM embeddings, unnest(generate_series(1, 64)) u(i)
    )
"""


def _qemb(emb: DataFrame) -> DataFrame:
    """(vec_id, label, dim, q) quantized-embedding rows — floor(v·1024) as
    int64, dim 0-based. posexplode + a scalar floor: fully codegen, no
    higher-order functions (the HOF transform() lambda is interpreted —
    PERF.md r5/r8)."""
    return emb.select(
        "vec_id",
        "label",
        F.posexplode(similarity.as_double_array("embedding")).alias("dim", "v"),
    ).select(
        "vec_id", "label", "dim", F.floor(F.col("v") * 1024).cast("bigint").alias("q")
    )


@query(
    "llm_power_iteration",
    oracle=_QEMB_CTE
    + """
    , a0 AS (SELECT vec_id, q AS a0 FROM e WHERE dim = 0),
    w1 AS (
      SELECT e.dim, CAST(SUM(e.q * a0.a0) AS BIGINT) AS w1
      FROM e JOIN a0 USING (vec_id) GROUP BY e.dim
    ),
    v1 AS (SELECT dim, w1, CAST(w1 // 65536 AS BIGINT) AS v1 FROM w1),
    t AS (
      SELECT e.vec_id, CAST(SUM(e.q * v1.v1) AS BIGINT) AS t
      FROM e JOIN v1 USING (dim) GROUP BY e.vec_id
    ),
    v2 AS (
      SELECT e.dim, CAST(SUM(e.q * t.t) AS BIGINT) AS v2
      FROM e JOIN t USING (vec_id) GROUP BY e.dim
    )
    SELECT CAST(v1.dim AS BIGINT) AS dim, v1.w1, v1.v1, v2.v2
    FROM v1 JOIN v2 USING (dim)
    """,
    tags=("llm", "similarity", "pca", "linear-algebra"),
)
def llm_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed power iteration toward the top principal direction of
    the quantized embedding matrix — two Gram-product steps, all int64:
    w1 = Aᵀ(A·e₀) (the first matvec from the canonical basis vector),
    v1 = w1 div 2¹⁶ (integer rescale — truncation toward zero on BOTH
    engines, never floor-division), v2 = Aᵀ(A·v1). The Rayleigh-quotient
    ratio v2/v1 estimates the top eigenvalue of AᵀA; the exact-integer
    routing makes the iterate bit-identical on any engine (the float
    version would accumulate in partition order). Plan / 100 TB: A never
    materializes as a matrix — each step is one map-side product join plus
    one 64-group aggregate; v1 broadcasts (64 rows); the only data-sized
    shuffles key on vec_id/dim. Headroom: |q| ≤ 1024·max|v|, so v2 stays
    inside int64 up to ~10⁹ rows at unit-scale embeddings; larger corpora
    raise the rescale shift."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    e = _qemb(emb).select("vec_id", "dim", "q")
    a0 = e.filter(F.col("dim") == 0).select("vec_id", F.col("q").alias("a0"))
    w1 = (
        e.join(a0, "vec_id")
        .groupBy("dim")
        .agg(F.sum(F.col("q") * F.col("a0")).alias("w1"))
    )
    v1 = w1.select("dim", "w1", F.expr("w1 div 65536").cast("bigint").alias("v1"))
    t = (
        e.join(F.broadcast(v1.select("dim", "v1")), "dim")
        .groupBy("vec_id")
        .agg(F.sum(F.col("q") * F.col("v1")).alias("t"))
    )
    v2 = (
        e.join(t, "vec_id")
        .groupBy("dim")
        .agg(F.sum(F.col("q") * F.col("t")).alias("v2"))
    )
    return (
        v1.join(v2, "dim")
        .select(F.col("dim").cast("bigint").alias("dim"), "w1", "v1", "v2")
    )


@query(
    "llm_cosine_histogram",
    oracle=_QEMB_CTE
    + """
    , s AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> floor(x * 1024)) AS qv
      FROM embeddings WHERE vec_id % 10 = 0
    ), n AS (
      SELECT vec_id, CAST(list_dot_product(qv, qv) AS BIGINT) AS n2, qv
      FROM s
    ), p AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot,
             a.n2 AS na, b.n2 AS nb
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE a.n2 > 0 AND b.n2 > 0
    )
    SELECT CAST(CASE WHEN dot >= 0
                THEN (32 * dot * dot) // (na * nb)
                ELSE -((32 * dot * dot) // (na * nb)) END AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY 1
    """,
    tags=("llm", "similarity", "stats", "histogram"),
)
def llm_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-similarity distribution audit over a deterministic 10%
    hash sample: the histogram a dedup-threshold decision reads ("where
    does the corpus's cosine mass sit?"). Buckets are exact integers —
    signed_bucket = sign(dot)·((32·dot²) div (na·nb)), i.e. cos² scaled to
    33 levels with the sign reattached; Cauchy-Schwarz caps the magnitude
    at 32, and everything stays int64 (|q| ≤ 1024 ⇒ 32·dot² ≤ 1.4e17 —
    the bound holds for |v| ≤ 1; wider embeddings lower the quant scale).
    Plan / 100 TB: the pair join runs over the SAMPLE (vec_id % 10 — at
    production scale the sample rate drops to keep pairs bounded, the
    documented knob), and the broadcast-small contract is ENFORCED like
    every ANN kernel's: more than 2^16 sample vectors raises instead of
    silently attempting a multi-GB broadcast (the limit-probe is one
    cheap job). Dims explode JVM-side and the pair dot is one hash
    aggregate on (va, vb); zero-norm vectors are excluded on both engines
    before any division."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    sample = emb.filter(F.col("vec_id") % 10 == 0)
    cap = 1 << 16
    if sample.limit(cap + 1).count() > cap:
        raise ValueError(
            f"llm_cosine_histogram: sample exceeds {cap} vectors; lower the "
            "sample rate — the pair side broadcasts and pairs grow O(n²)."
        )
    s = _qemb(sample).select("vec_id", "dim", "q")
    norms = (
        s.groupBy("vec_id")
        .agg(F.sum(F.col("q") * F.col("q")).alias("n2"))
        .filter(F.col("n2") > 0)
    )
    a = s.alias("a")
    b = s.alias("b")
    pairs = (
        # dim has only 64 distinct values — a hash join on it would pile the
        # whole sample into 64 skewed partitions. The b side is the capped
        # sample: broadcast it and keep the pair fan-out map-side.
        a.join(F.broadcast(b), "dim")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .groupBy(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"))
        .agg(F.sum(F.col("a.q") * F.col("b.q")).alias("dot"))
    )
    j = (
        pairs.join(F.broadcast(norms.select(F.col("vec_id").alias("va"), F.col("n2").alias("na"))), "va")
        .join(F.broadcast(norms.select(F.col("vec_id").alias("vb"), F.col("n2").alias("nb"))), "vb")
    )
    mag = F.expr("(32 * dot * dot) div (na * nb)")
    bucket = F.when(F.col("dot") >= 0, mag).otherwise(-mag)
    return (
        j.select(bucket.cast("bigint").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "llm_centroid_drift",
    oracle=_QEMB_CTE
    + """
    , h AS (
      SELECT vec_id % 2 AS half, label, dim, q FROM e
    ), cs AS (
      SELECT half, label, dim, CAST(SUM(q) AS BIGINT) AS s
      FROM h GROUP BY half, label, dim
    ), cn AS (
      SELECT half, label, CAST(count(DISTINCT vec_id) AS BIGINT) AS n
      FROM (SELECT vec_id % 2 AS half, label, vec_id FROM embeddings)
      GROUP BY half, label
    ), j AS (
      SELECT a.label, a.dim, a.s AS s1, b.s AS s2, na.n AS n1, nb.n AS n2
      FROM cs a
      JOIN cs b ON a.label = b.label AND a.dim = b.dim
                AND a.half = 0 AND b.half = 1
      JOIN cn na ON na.half = 0 AND na.label = a.label
      JOIN cn nb ON nb.half = 1 AND nb.label = a.label
    )
    SELECT label,
           CAST(MAX(n1) AS BIGINT) AS n1,
           CAST(MAX(n2) AS BIGINT) AS n2,
           CAST(SUM(abs(s1 * n2 - s2 * n1)) AS BIGINT) AS l1_cross,
           CAST(SUM(abs(s1 * n2 - s2 * n1)) AS DOUBLE)
             / CAST(MAX(n1) * MAX(n2) * 64 AS DOUBLE) AS drift
    FROM j GROUP BY label
    """,
    tags=("llm", "similarity", "drift", "qa"),
)
def llm_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift between two corpus snapshots (the
    embedding-space QA a pipeline runs when re-embedding or re-crawling:
    did any class's centroid move?). Snapshots are the vec_id parity
    halves; drift is the mean per-dimension L1 distance between the two
    label centroids, computed CROSS-MULTIPLIED — |s1·n2 − s2·n1| sums
    exactly in int64 and divides by n1·n2·64 once at the end, so no
    per-dimension mean ever becomes a float (the llm_embedding_dim_stats
    moment trick applied to differences). Plan: two (half,label,dim)-grain
    aggregates and a 64·|labels|-row join — corpus touched once."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    e = _qemb(emb).withColumn("half", F.col("vec_id") % 2)
    cs = e.groupBy("half", "label", "dim").agg(F.sum("q").alias("s"))
    cn = emb.select((F.col("vec_id") % 2).alias("half"), "label").groupBy(
        "half", "label"
    ).agg(F.count(F.lit(1)).alias("n"))
    a = cs.filter(F.col("half") == 0).select("label", "dim", F.col("s").alias("s1"))
    b = cs.filter(F.col("half") == 1).select("label", "dim", F.col("s").alias("s2"))
    na = cn.filter(F.col("half") == 0).select("label", F.col("n").alias("n1"))
    nb = cn.filter(F.col("half") == 1).select("label", F.col("n").alias("n2"))
    j = (
        a.join(b, ["label", "dim"])
        .join(F.broadcast(na), "label")
        .join(F.broadcast(nb), "label")
    )
    diff = F.abs(F.col("s1") * F.col("n2") - F.col("s2") * F.col("n1"))
    return (
        j.groupBy("label")
        .agg(
            F.max("n1").cast("bigint").alias("n1"),
            F.max("n2").cast("bigint").alias("n2"),
            F.sum(diff).cast("bigint").alias("l1_cross"),
        )
        .select(
            "label",
            "n1",
            "n2",
            "l1_cross",
            (
                F.col("l1_cross").cast("double")
                / (F.col("n1") * F.col("n2") * F.lit(64)).cast("double")
            ).alias("drift"),
        )
    )


@query(
    "llm_quantization_error",
    oracle=_QEMB_CTE
    + """
    , r AS (
      SELECT label, q, q - (q // 8) * 8 AS err FROM e
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vals,
           CAST(SUM(err * err) AS BIGINT) AS total_sq_err,
           CAST(MAX(abs(err)) AS BIGINT) AS max_abs_err,
           CAST(SUM(err * err) AS DOUBLE) / count(*) AS mse
    FROM r GROUP BY label
    """,
    tags=("llm", "similarity", "quantization", "qa"),
)
def llm_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-error audit for the int8-style coarsening an ANN
    deployment applies (drop the 3 low bits of the 10-bit grid:
    coarse = (q div 8)·8): per label, the exact integer sum of squared
    errors, the worst per-dimension error, and MSE as one final division.
    The remainder q − (q div 8)·8 carries the dividend's sign on both
    engines (truncating division), so the error distribution is
    reproduced exactly. One map-side pass + one label-grain aggregate —
    the audit a serving team runs before committing to a cheaper code."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    e = _qemb(emb)
    err = F.col("q") - F.expr("q div 8") * F.lit(8)
    r = e.select("label", err.alias("err"))
    return r.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vals"),
        F.sum(F.col("err") * F.col("err")).cast("bigint").alias("total_sq_err"),
        F.max(F.abs(F.col("err"))).cast("bigint").alias("max_abs_err"),
        (
            F.sum(F.col("err") * F.col("err")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mse"),
    )


@query(
    "llm_sign_code_balance",
    oracle=_QEMB_CTE
    + """
    , codes AS (
      SELECT vec_id, dim // 8 AS sub,
             CAST(SUM(CASE WHEN q > 0
                      THEN CAST(1 AS BIGINT) << (dim % 8) ELSE 0 END)
                  AS BIGINT) AS code
      FROM e GROUP BY vec_id, dim // 8
    ), cc AS (
      SELECT sub, code, CAST(count(*) AS BIGINT) AS cnt
      FROM codes GROUP BY sub, code
    )
    SELECT CAST(sub AS BIGINT) AS sub,
           CAST(count(*) AS BIGINT) AS n_codes_used,
           CAST(MAX(cnt) AS BIGINT) AS max_cnt,
           CAST(MIN(cnt) AS BIGINT) AS min_cnt,
           CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS top_share
    FROM cc GROUP BY sub
    """,
    tags=("llm", "similarity", "quantization", "balance"),
)
def llm_sign_code_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-code (1-bit-per-dimension, ITQ-style) bucket balance audit:
    each vector's 64 dims split into 8 subspaces of 8 bits; the code is
    the sign bitmask. Per subspace: distinct codes in use (of 256), the
    hottest and coldest code populations, and the hottest code's share —
    the skew report that predicts Hamming-bucket ANN hot spots before an
    index is built. Integer bit arithmetic end to end; share is one
    double division. Plan: two hash aggregates, (vec,sub) then (sub,code)
    grain — both shuffle tiny keyed rows, never embeddings."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    e = _qemb(emb)
    codes = (
        e.groupBy("vec_id", F.expr("dim div 8").alias("sub"))
        .agg(
            F.sum(
                F.when(
                    F.col("q") > 0,
                    # pyspark's shiftleft() only takes a literal bit count —
                    # the SQL form accepts a column expression
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(dim % 8 AS INT))"),
                ).otherwise(F.lit(0))
            ).alias("code")
        )
    )
    cc = codes.groupBy("sub", "code").agg(F.count(F.lit(1)).alias("cnt"))
    return cc.groupBy(F.col("sub").cast("bigint").alias("sub")).agg(
        F.count(F.lit(1)).alias("n_codes_used"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.min("cnt").cast("bigint").alias("min_cnt"),
        (F.max("cnt").cast("double") / F.sum("cnt").cast("double")).alias(
            "top_share"
        ),
    )


@query(
    "llm_knn_reciprocity",
    oracle="""
    WITH s AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> floor(x * 1024)) AS qv
      FROM embeddings WHERE vec_id % 4 = 0
    ), p AS (
      SELECT a.vec_id AS va, a.label AS la, b.vec_id AS vb,
             CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot
      FROM s a JOIN s b ON a.vec_id <> b.vec_id
    ), r AS (
      SELECT va, la, vb,
             row_number() OVER (PARTITION BY va ORDER BY dot DESC, vb) AS rn
      FROM p
    ), e AS (
      SELECT va, la, vb FROM r WHERE rn <= 3
    ), m AS (
      SELECT e.va, e.la, (e2.va IS NOT NULL) AS mut
      FROM e LEFT JOIN e e2 ON e2.va = e.vb AND e2.vb = e.va
    )
    SELECT la AS label,
           CAST(count(DISTINCT va) AS BIGINT) AS n_nodes,
           CAST(count(*) AS BIGINT) AS n_edges,
           CAST(SUM(CASE WHEN mut THEN 1 ELSE 0 END) AS BIGINT) AS n_mutual,
           CAST(SUM(CASE WHEN mut THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
             AS reciprocity
    FROM m GROUP BY la
    """,
    tags=("llm", "similarity", "knn", "graph"),
)
def llm_knn_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-k-NN reciprocity audit over a deterministic 25% sample: the
    k-NN-graph health check run before graph-based clustering or
    hubness-sensitive ANN evaluation (low reciprocity per class = hub
    vectors attracting asymmetric edges). Top-3 neighbors per node by
    exact integer dot (llm.similarity.quantized_dot_topk with k=4 — the
    self edge, when present, is filtered and the survivors re-ranked
    per-query; any true top-3 non-self neighbor is within the overall
    top-4, so the cut is exact). Reciprocity = mutual-edge share among
    each label's outgoing edges, one double division. 100 TB: the sample
    rate is the documented knob; scoring is the broadcast-query Arrow
    matmul, never an all-pairs shuffle; windows partition by query."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    s = emb.filter(F.col("vec_id") % 4 == 0).select("vec_id", "label", "embedding")
    top = similarity.quantized_dot_topk(
        s.select("vec_id", "embedding"), s.select("vec_id", "embedding"), k=4
    )
    nonself = top.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    edges = (
        nonself.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(F.col("query_id").alias("va"), F.col("neighbor_id").alias("vb"))
    )
    back = edges.select(F.col("va").alias("vb2"), F.col("vb").alias("va2"))
    m = edges.join(
        back,
        (F.col("va") == F.col("va2")) & (F.col("vb") == F.col("vb2")),
        "left",
    ).select("va", F.col("va2").isNotNull().alias("mut"))
    lab = s.select(F.col("vec_id").alias("va"), "label")
    return (
        m.join(F.broadcast(lab), "va")
        .groupBy("label")
        .agg(
            F.countDistinct("va").cast("bigint").alias("n_nodes"),
            F.count(F.lit(1)).alias("n_edges"),
            F.sum(F.when(F.col("mut"), 1).otherwise(0)).cast("bigint").alias("n_mutual"),
        )
        .select(
            "label",
            "n_nodes",
            "n_edges",
            "n_mutual",
            (F.col("n_mutual").cast("double") / F.col("n_edges").cast("double")).alias(
                "reciprocity"
            ),
        )
    )


@query(
    "llm_quota_allocation",
    oracle="""
    WITH c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ), t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM c),
    b AS (
      SELECT source, n_docs,
             (100 * n_docs) // t.total AS base,
             100 * n_docs - ((100 * n_docs) // t.total) * t.total AS rem
      FROM c, t
    ), d AS (SELECT 100 - CAST(SUM(base) AS BIGINT) AS deficit FROM b),
    r AS (
      SELECT source, n_docs, base, rem,
             row_number() OVER (ORDER BY rem DESC, source) AS rk
      FROM b
    )
    SELECT source, n_docs,
           CAST(base AS BIGINT) AS base_alloc,
           CAST(rem AS BIGINT) AS rem_scaled,
           CAST(base + CASE WHEN rk <= d.deficit THEN 1 ELSE 0 END AS BIGINT)
             AS alloc
    FROM r, d
    """,
    tags=("llm", "curation", "sampling", "allocation"),
)
def llm_quota_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) quota allocation: distribute a
    100-document sample budget across sources proportionally with EXACT
    integer arithmetic — base = (B·N_h) div N, then the sources with the
    largest scaled remainders (B·N_h − base·N, an integer — no float
    fractions to compare) absorb the rounding deficit one unit each, ties
    by source name. Σ alloc == B exactly, the property proportional-float
    rounding cannot give. The stratified-sampling front-end
    (llm_stratified_sample draws the rows; this decides HOW MANY per
    stratum). Plan / 100 TB: one source-grain aggregate; the rounding
    deficit is ≤ B−1 (a CONSTANT, 100 here) regardless of stratum count,
    so the +1 winners come from orderBy+limit(deficit) — a bounded
    per-partition heap (TakeOrderedAndProject) — never a rank over the
    stratum frame (a million domains would make any |strata|-sized rank
    or k×k bounded_rank join a cliff). The deficit itself is ONE scalar
    row collected to parameterize the limit."""
    d = load_tables(spark, sf_dir)["documents"]
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    t = c.agg(F.sum("n_docs").alias("total"))
    b = c.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        F.expr("(100 * n_docs) div total").alias("base"),
        (
            F.lit(100) * F.col("n_docs")
            - F.expr("(100 * n_docs) div total") * F.col("total")
        ).alias("rem"),
    )
    deficit = int(
        b.agg((F.lit(100) - F.sum("base")).alias("deficit")).collect()[0][0]
    )
    winners = (
        b.orderBy(F.desc("rem"), F.asc("source"))
        .limit(deficit)
        .select("source", F.lit(1).alias("_plus"))
    )
    return (
        b.join(F.broadcast(winners), "source", "left")
        .select(
            "source",
            "n_docs",
            F.col("base").cast("bigint").alias("base_alloc"),
            F.col("rem").cast("bigint").alias("rem_scaled"),
            (F.col("base") + F.coalesce(F.col("_plus"), F.lit(0)))
            .cast("bigint")
            .alias("alloc"),
        )
    )


@query(
    "llm_curriculum_stages",
    oracle="""
    WITH d AS (
      SELECT doc_id, n_chars,
             len(string_split_regex(trim(text), '\\s+')) AS nt
      FROM documents
    ), x AS (
      SELECT doc_id, nt, (1000 * n_chars) // nt AS diff FROM d
    ), r AS (
      SELECT doc_id, nt, diff,
             row_number() OVER (ORDER BY diff ASC, doc_id) AS rank
      FROM x
    ), t AS (SELECT count(*) AS n FROM x)
    SELECT CAST(((rank - 1) * 4) // t.n AS BIGINT) AS stage,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(MIN(diff) AS BIGINT) AS min_diff,
           CAST(MAX(diff) AS BIGINT) AS max_diff,
           CAST(SUM(nt) AS BIGINT) AS total_tokens
    FROM r, t GROUP BY 1
    """,
    tags=("llm", "curation", "curriculum"),
)
def llm_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging: rank every document by a difficulty proxy
    (mean chars per token ×1000, exact integer division — longer words =
    harder text) and deal the ranked corpus into 4 equal stages,
    stage = ((rank−1)·4) div N — the easy→hard schedule a curriculum
    trainer feeds. The global (diff asc, doc_id) rank REUSES
    llm.curation.balanced_shards' two-phase distributed rank (weight =
    −diff, so its (weight desc, id) order IS difficulty ascending):
    per-bucket parallel windows + broadcast base offsets — no
    single-partition ranking window at any size (the device the AST plan
    test enforces). Per stage: doc count, difficulty range, token mass."""
    d = load_tables(spark, sf_dir)["documents"]
    x = d.select(
        "doc_id",
        token_count("text").cast("bigint").alias("nt"),
        F.expr("(1000 * n_chars) div size(split(trim(text), '\\\\s+'))").alias(
            "diff"
        ),
    )
    ranked = curation.balanced_shards(
        x.withColumn("negd", -F.col("diff")), n_shards=1, weight_col="negd"
    ).select("doc_id", "rank")
    n = x.agg(F.count(F.lit(1)).alias("n"))
    staged = (
        x.join(ranked, "doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            "nt",
            "diff",
            F.expr("((rank - 1) * 4) div n").cast("bigint").alias("stage"),
        )
    )
    return staged.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("diff").cast("bigint").alias("min_diff"),
        F.max("diff").cast("bigint").alias("max_diff"),
        F.sum("nt").cast("bigint").alias("total_tokens"),
    )


@query(
    "llm_split_doc_chains",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), ht AS (
      SELECT doc_id,
             array_to_string(t[1:3], ' ') AS head,
             array_to_string(t[len(t)-2:len(t)], ' ') AS tail
      FROM t WHERE len(t) >= 6
    ), hot AS (
      SELECT gram FROM (
        SELECT head AS gram FROM ht UNION ALL SELECT tail FROM ht
      ) GROUP BY gram HAVING count(*) > 64
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.tail AS gram
    FROM ht a JOIN ht b ON a.tail = b.head AND a.doc_id <> b.doc_id
    WHERE a.tail NOT IN (SELECT gram FROM hot)
    """,
    tags=("llm", "curation", "reassembly"),
)
def llm_split_doc_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-document reassembly candidates: document pairs where A's last
    trigram equals B's first trigram — the continuation evidence a crawl
    pipeline uses to re-join documents that a page-boundary or
    chunk-size limit split apart (each pair is a candidate A→B seam).
    Docs need ≥6 tokens so head and tail never overlap inside one doc.
    Plan / 100 TB: heads and tails are 3-token strings extracted map-side
    (slice on the token array — fixed-size, not a per-token HOF chain);
    the seam join keys on the trigram string, so candidates come only
    from shared seams (never all-pairs) and text never shuffles — and
    seams occurring > 64 times (boilerplate trigrams, the k×m pair bomb)
    are excluded BEFORE the join, the same hot-bucket cap every dedup
    family carries."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = F.split(F.trim(F.col("text")), r"\s+")
    ht = d.select(
        "doc_id",
        F.concat_ws(" ", F.slice(toks, 1, 3)).alias("head"),
        F.concat_ws(" ", F.slice(toks, F.size(toks) - 2, 3)).alias("tail"),
    ).filter(F.size(toks) >= 6)
    occ = (
        ht.select(F.col("head").alias("gram"))
        .unionAll(ht.select(F.col("tail").alias("gram")))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_occ"))
        .filter(F.col("_occ") <= 64)
        .select("gram")
    )
    a = ht.select(F.col("doc_id").alias("doc_a"), F.col("tail").alias("gram")).join(
        occ, "gram"
    )
    b = ht.select(F.col("doc_id").alias("doc_b"), F.col("head").alias("gram"))
    return a.join(b, "gram").filter(F.col("doc_a") != F.col("doc_b")).select(
        "doc_a", "doc_b", "gram"
    )


@query(
    "llm_wilson_quality",
    oracle="""
    WITH c AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_good
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, n_good,
           CAST(n_good AS DOUBLE) / CAST(n_docs AS DOUBLE) AS p_hat,
           ((CAST(n_good AS DOUBLE) / CAST(n_docs AS DOUBLE)
             + 2.0 / CAST(n_docs AS DOUBLE))
            - 2.0 * sqrt(((CAST(n_good AS DOUBLE) / CAST(n_docs AS DOUBLE)
                           * (1.0 - CAST(n_good AS DOUBLE)
                                    / CAST(n_docs AS DOUBLE)))
                          + 1.0 / CAST(n_docs AS DOUBLE))
                         / CAST(n_docs AS DOUBLE)))
           / (1.0 + 4.0 / CAST(n_docs AS DOUBLE)) AS wilson_lb
    FROM c
    """,
    tags=("llm", "qa", "quality", "wilson"),
)
def llm_wilson_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain quality score with a Wilson lower bound (z=2): the
    small-sample-safe ranking a per-domain quality gate uses instead of
    the raw pass rate (a 2/2 domain must not outrank a 95/100 one).
    wilson_lb = (p̂ + z²/2n − z·√((p̂(1−p̂) + z²/4n)/n)) / (1 + z²/n) with
    z² = 4 — a FIXED expression tree of single IEEE ops (each division,
    product, and the square root is one correctly-rounded operation on
    both engines; the tree is written identically in the oracle, the
    repo's determinism contract for non-integer outputs). Success =
    n_chars ≥ 300 (the corpus median). One source-grain aggregate."""
    d = load_tables(spark, sf_dir)["documents"]
    c = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_chars") >= 300, 1).otherwise(0))
        .cast("bigint")
        .alias("n_good"),
    )
    nD = F.col("n_docs").cast("double")
    p = F.col("n_good").cast("double") / nD
    lb = (
        (p + F.lit(2.0) / nD)
        - F.lit(2.0)
        * F.sqrt(((p * (F.lit(1.0) - p)) + F.lit(1.0) / nD) / nD)
    ) / (F.lit(1.0) + F.lit(4.0) / nD)
    return c.select(
        "source", "n_docs", "n_good", p.alias("p_hat"), lb.alias("wilson_lb")
    )
