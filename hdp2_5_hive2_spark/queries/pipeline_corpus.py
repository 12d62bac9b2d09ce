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
from hdp2_5_hive2_spark.llm.text import token_count
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
        .localCheckpoint(eager=False)
    )
    counts = f.groupBy("fp").agg(F.count(F.lit(1)).alias("c"))
    kept = counts.filter((F.col("c") >= 2) & (F.col("c") <= 50)).select("fp")
    a = f.join(kept, "fp").alias("a")
    b = f.join(kept, "fp").alias("b")
    edges = (
        a.join(b, "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
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
