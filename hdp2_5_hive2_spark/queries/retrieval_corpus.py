"""Round-4 corpus: retrieval statistics (TF-IDF / BM25 / vocabulary
coverage / bigram novelty), mixture-executing sampling, cross-corpus exact
decontamination, and ANALYZE TABLE column-statistics parity.

Oracle discipline: every floating-point value is produced by a FIXED
expression tree of single IEEE-754 ops over exact integers (counts, lengths,
md5-derived buckets) — no transcendental functions (log idf is replaced by
the monotonic raw odds ratio, see llm/retrieval.py) and no order-dependent
double accumulation (BM25 term scores are pivoted into fixed columns and
added left-to-right; coverage fractions divide exact bigint running sums) —
so Spark and DuckDB agree bitwise and the driver hash-compare is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdp2_5_hive2_spark import stats
from hdp2_5_hive2_spark.catalog import load_tables
from hdp2_5_hive2_spark.llm import curation, retrieval
from hdp2_5_hive2_spark.llm import text as llm_text
from hdp2_5_hive2_spark.queries.registry import query

# Shared tokenization CTE (DuckDB side) — mirrors llm.text.tokens.
_TOK_CTE = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    )
"""


@query(
    "llm_tfidf_topterms",
    oracle=_TOK_CTE
    + """
    , tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ), dfq AS (
      SELECT term, count(*) AS df_term FROM tf GROUP BY term
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, term, tf, df_term, score FROM (
      SELECT t.doc_id, t.term, t.tf, d.df_term,
             CAST(t.tf AS DOUBLE) * n.n_docs / d.df_term AS score,
             row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY CAST(t.tf AS DOUBLE) * n.n_docs / d.df_term DESC, t.term
             ) AS rn
      FROM tf t JOIN dfq d USING (term) CROSS JOIN n
    ) WHERE rn <= 3
    """,
    tags=("llm", "retrieval", "tfidf", "bench"),
)
def llm_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf·idf (log-free ratio
    idf; reference text surface: GenericUDAFnGrams.java stops at raw n-gram
    counting — this is the weighting layer above it). Top-k per doc compiles
    to WindowGroupLimit."""
    d = load_tables(spark, sf_dir)["documents"]
    return retrieval.tfidf_top_terms(d, k=3)


@query(
    "llm_bm25_rank",
    oracle=_TOK_CTE
    + """
    , tf_all AS (
      SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ), dfq AS (
      SELECT term, count(*) AS df_term FROM tf_all GROUP BY term
    ), st AS (
      SELECT count(*) AS n_docs,
             CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
               / count(*) AS avgdl
      FROM documents
    ), dl AS (
      SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS dl
      FROM documents
    ), s AS (
      -- literals are CAST to DOUBLE: DuckDB parses 2.2 as DECIMAL and would
      -- carry decimal arithmetic where Spark computes IEEE doubles.
      SELECT t.doc_id, t.term,
             ((CAST(n.n_docs AS DOUBLE) - d.df_term + CAST(0.5 AS DOUBLE))
                / (CAST(d.df_term AS DOUBLE) + CAST(0.5 AS DOUBLE)))
               * (CAST(t.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
               / (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
                  * (CAST(0.25 AS DOUBLE)
                     + CAST(0.75 AS DOUBLE) * (l.dl / n.avgdl))) AS s
      FROM tf_all t
      JOIN dfq d USING (term)
      JOIN dl l USING (doc_id)
      CROSS JOIN st n
      WHERE t.term IN ('spark', 'join', 'window')
    ), p AS (
      SELECT doc_id,
             coalesce(MAX(CASE WHEN term = 'spark'  THEN s END), 0.0)
           + coalesce(MAX(CASE WHEN term = 'join'   THEN s END), 0.0)
           + coalesce(MAX(CASE WHEN term = 'window' THEN s END), 0.0) AS score
      FROM s GROUP BY doc_id
    )
    SELECT doc_id, score, rank FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM p
    ) WHERE rank <= 15
    """,
    tags=("llm", "retrieval", "bm25"),
)
def llm_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 documents for the query {spark, join, window} under BM25
    (k1=1.2, b=0.75; log-free idf — identical ranking, bit-stable doubles).
    Per-term scores pivot into fixed columns summed in term order."""
    d = load_tables(spark, sf_dir)["documents"]
    return retrieval.bm25_rank(d, ["spark", "join", "window"], topk=15)


@query(
    "llm_vocab_coverage",
    oracle=_TOK_CTE
    + """
    , counts AS (
      SELECT term, count(*) AS cnt FROM tok GROUP BY term
    ), tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM counts)
    SELECT rank, term, cnt, CAST(cum AS DOUBLE) / total_tokens AS cum_frac
    FROM (
      SELECT term, cnt, total_tokens,
             row_number() OVER (ORDER BY cnt DESC, term) AS rank,
             CAST(SUM(cnt) OVER (
               ORDER BY cnt DESC, term
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum
      FROM counts CROSS JOIN tot
    ) WHERE rank <= 25
    """,
    tags=("llm", "retrieval", "vocab"),
)
def llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 vocabulary terms with cumulative corpus coverage — the
    tokenizer-budget table. Running sum windows over the POST-AGG vocab
    table (vocab-sized single-partition window, not corpus-sized)."""
    d = load_tables(spark, sf_dir)["documents"]
    return retrieval.vocab_coverage(d, top=25)


@query(
    "llm_bigram_novelty",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), b AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1]
             ))) AS ngram
      FROM t WHERE len(t) >= 2
    ), dfq AS (
      SELECT ngram, count(*) AS bg_df FROM b GROUP BY ngram
    )
    SELECT b.doc_id AS doc_id,
           count(*) AS n_bigrams,
           CAST(SUM(CASE WHEN d.bg_df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
           1.0 - CAST(SUM(CASE WHEN d.bg_df >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) AS novelty_frac
    FROM b JOIN dfq d USING (ngram)
    GROUP BY b.doc_id
    """,
    tags=("llm", "retrieval", "novelty"),
)
def llm_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of each document's distinct bigrams that are corpus-rare
    (document frequency < 3) — the cross-document complement of the
    within-document repetition filters (llm.text.repetition_stats)."""
    d = load_tables(spark, sf_dir)["documents"]
    return retrieval.bigram_novelty(d, min_df=3)


@query(
    "llm_weighted_sample",
    oracle="""
    SELECT doc_id, source, u FROM (
      SELECT doc_id, source,
             CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
      FROM documents
    ) WHERE u < CASE WHEN source IN ('src0','src1','src2','src3','src4')
                     THEN 0.2 ELSE 0.7 END
    """,
    tags=("llm", "curation", "sampling"),
)
def llm_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli mixture sampling: keep iff md5-derived
    u(doc_id) < per-source rate (0.2 for src0-4, 0.7 otherwise) — the
    executing half of llm_mixture_rates, reproducible across engines,
    runs and partitionings (curation.weighted_sample; the operator
    preserves the input schema, so the draw is re-derived here only for
    the oracle-visible output column). Map-side only."""
    d = load_tables(spark, sf_dir)["documents"]
    rate = F.when(
        F.col("source").isin("src0", "src1", "src2", "src3", "src4"), F.lit(0.2)
    ).otherwise(F.lit(0.7))
    kept = curation.weighted_sample(d, rate)
    return kept.select("doc_id", "source", curation.uniform_draw("doc_id").alias("u"))


@query(
    "llm_cross_dedup",
    oracle="""
    SELECT d.doc_id AS doc_id, d.n_chars AS n_chars
    FROM documents d
    WHERE md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) NOT IN (
      SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
      FROM documents WHERE doc_id % 5 = 0
    )
    """,
    tags=("llm", "curation", "decontamination"),
)
def llm_cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-match cross-corpus decontamination: the synthetic eval set is
    every doc_id ≡ 0 (mod 5); training docs whose normalized text appears
    verbatim in it are dropped via a broadcast anti-join on 16-byte md5
    fingerprints (curation.cross_corpus_exact_dedup) — train text never
    shuffles."""
    d = load_tables(spark, sf_dir)["documents"]
    eval_df = d.filter(F.col("doc_id") % 5 == 0)
    return curation.cross_corpus_exact_dedup(d, eval_df).select("doc_id", "n_chars")


@query(
    "analyze_table_stats",
    oracle="""
    SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
           count(*) - count(o_orderkey) AS n_nulls,
           count(DISTINCT o_orderkey) AS ndv,
           CAST(min(o_orderkey) AS DOUBLE) AS min_num,
           CAST(max(o_orderkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
           CAST(NULL AS DOUBLE) AS avg_len
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           min(o_orderstatus), max(o_orderstatus),
           CAST(SUM(length(o_orderstatus)) AS DOUBLE) / count(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           min(o_orderpriority), max(o_orderpriority),
           CAST(SUM(length(o_orderpriority)) AS DOUBLE) / count(o_orderpriority)
    FROM orders
    """,
    tags=("stats", "hive"),
)
def analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE orders COMPUTE STATISTICS FOR COLUMNS parity
    (ql/exec/ColumnStatsTask.java + GenericUDAFComputeStats,
    FunctionRegistry.java:403): one aggregation pass computes
    count/nulls/exact-ndv/min/max/avg-len for four columns, stack()
    unpivots to the metastore's long form."""
    o = load_tables(spark, sf_dir)["orders"]
    return stats.column_stats(
        o, ["o_orderkey", "o_totalprice", "o_orderstatus", "o_orderpriority"]
    )


@query(
    "analyze_ndv_sketch",
    oracle="""
    SELECT 'o_custkey' AS column_name,
           count(DISTINCT o_custkey) AS exact_ndv, TRUE AS sketch_ok FROM orders
    UNION ALL
    SELECT 'o_orderkey', count(DISTINCT o_orderkey), TRUE FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(DISTINCT o_orderpriority), TRUE FROM orders
    """,
    tags=("stats", "hive", "sketch"),
)
def analyze_ndv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-ndv accuracy contract (reference:
    NumDistinctValueEstimator.java FM-sketch; here Spark's native HLL++):
    sketch_ok asserts |approx/exact - 1| < 0.1 per column. The oracle pins
    the exact ndv AND the accuracy boolean — a sketch drift fails the
    driver hash."""
    o = load_tables(spark, sf_dir)["orders"]
    return stats.approx_ndv_accuracy(
        o, ["o_custkey", "o_orderkey", "o_orderpriority"], tolerance=0.1
    )


@query(
    "llm_bigram_lm_score",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), b AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1])) AS ngram
      FROM t WHERE len(t) >= 2
    ), db AS (
      SELECT doc_id, ngram, count(*) AS cnt FROM b GROUP BY doc_id, ngram
    ), cb AS (
      SELECT ngram, CAST(SUM(cnt) AS BIGINT) AS c_bg,
             string_split(ngram, ' ')[1] AS w1
      FROM db GROUP BY ngram
    ), cp AS (
      SELECT w1, CAST(SUM(c_bg) AS BIGINT) AS c_w1 FROM cb GROUP BY w1
    ), q AS (
      SELECT cb.ngram,
             CAST(floor((CAST(cb.c_bg AS DOUBLE) / cp.c_w1)
                        * CAST(1048576 AS DOUBLE)) AS BIGINT) AS pq
      FROM cb JOIN cp USING (w1)
    )
    SELECT db.doc_id AS doc_id,
           CAST(SUM(db.cnt) AS BIGINT) AS n_bigrams,
           CAST(SUM(db.cnt * q.pq) AS BIGINT) AS score_q,
           CAST(SUM(db.cnt * q.pq) AS DOUBLE)
             / (CAST(SUM(db.cnt) AS DOUBLE) * CAST(1048576 AS DOUBLE)) AS avg_prob
    FROM db JOIN q USING (ngram) GROUP BY db.doc_id
    """,
    tags=("llm", "retrieval", "lm-score", "bench"),
)
def llm_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style bigram-LM quality score per document: average corpus
    p(w2|w1), quantized to 2^-20 BEFORE aggregation so every sum is exact
    bigint arithmetic (retrieval.bigram_lm_score) — the float-determinism
    discipline that makes an LM score oracle-checkable."""
    d = load_tables(spark, sf_dir)["documents"]
    return retrieval.bigram_lm_score(d)


@query(
    "llm_chunk_dedup",
    oracle="""
    WITH src AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
    ), c AS (
      SELECT doc_id, array_to_string(t[s+1:s+100], ' ') AS chunk_text
      FROM (
        SELECT doc_id, t, unnest(range(0, greatest(len(t) - 1, 0) + 1, 80)) AS s
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM src)
      )
    ), f AS (
      SELECT doc_id, md5(chunk_text) AS fp FROM c
    ), d AS (
      SELECT fp, count(DISTINCT doc_id) AS n_docs FROM f GROUP BY fp
    )
    SELECT f.doc_id AS doc_id, count(*) AS n_chunks,
           CAST(SUM(CASE WHEN d.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           CAST(SUM(CASE WHEN d.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS dup_frac
    FROM f JOIN d USING (fp) GROUP BY f.doc_id
    """,
    tags=("llm", "dedup", "chunk", "bench"),
)
def llm_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document chunk-level duplication (dedup.chunk_dup_stats) over a
    corpus with planted clones (every doc_id ≡ 0 mod 7 re-appears as
    doc_id+1000000): cloned documents must report dup_frac 1.0, everything
    else 0 unless chunks genuinely repeat. Chunk text reduces to md5
    map-side; full text never shuffles."""
    from hdp2_5_hive2_spark.llm import dedup as dd

    d = load_tables(spark, sf_dir)["documents"]
    src = d.select("doc_id", "text").unionAll(
        d.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return dd.chunk_dup_stats(src, chunk_tokens=100, overlap=20)


_FH_DIM = 8
_FH_CASES = "".join(
    f",\n           CAST(SUM(CASE WHEN b = {i} THEN 1 ELSE 0 END) AS BIGINT) AS f{i}"
    for i in range(_FH_DIM)
)


@query(
    "llm_feature_hashing",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ), b AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(term), 1, 8)) AS BIGINT) % {_FH_DIM} AS b
      FROM tok
    )
    SELECT doc_id{_FH_CASES}
    FROM b GROUP BY doc_id
    """,
    tags=("llm", "retrieval", "vectorize"),
)
def llm_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick document vectors (retrieval.feature_hash_vectors,
    dim=8): token → md5-bucket count histogram as wide integer columns —
    the engine-stable vectorizer a downstream classifier consumes. One
    shuffle on doc_id; buckets map-side."""
    d = load_tables(spark, sf_dir)["documents"]
    return retrieval.feature_hash_vectors(d, dim=_FH_DIM)


@query(
    "llm_embedding_quantize",
    oracle="""
    WITH e AS (
      SELECT vec_id, unnest(embedding) AS v FROM embeddings
    ), m AS (
      SELECT vec_id, v,
             MAX(abs(CAST(v AS DOUBLE))) OVER (PARTITION BY vec_id) AS max_abs
      FROM e
    ), q AS (
      SELECT vec_id, max_abs,
             CASE WHEN max_abs = 0 THEN CAST(1 AS DOUBLE)
                  ELSE CAST(127 AS DOUBLE) / max_abs END AS scale,
             CAST(GREATEST(CAST(-127 AS DOUBLE), LEAST(CAST(127 AS DOUBLE),
                    floor(CAST(v AS DOUBLE)
                          * (CASE WHEN max_abs = 0 THEN CAST(1 AS DOUBLE)
                                  ELSE CAST(127 AS DOUBLE) / max_abs END))))
                  AS BIGINT) AS q
      FROM m
    )
    SELECT vec_id, max_abs, scale,
           CAST(SUM(q) AS BIGINT) AS qsum,
           CAST(MIN(q) AS BIGINT) AS qmin,
           CAST(MAX(q) AS BIGINT) AS qmax
    FROM q GROUP BY vec_id, max_abs, scale
    UNION ALL
    -- empty vectors never unnest; the operator still emits a zero-summary row
    SELECT vec_id, CAST(0 AS DOUBLE), CAST(1 AS DOUBLE),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    FROM embeddings WHERE len(embedding) = 0
    """,
    tags=("llm", "similarity", "quantize"),
)
def llm_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization summary
    (similarity.quantize_int8_summary): float32→float64 widening precedes
    all arithmetic so Spark (numpy) and DuckDB compute identical IEEE
    doubles. One Arrow pass, zero shuffle — vectors are row-local."""
    from hdp2_5_hive2_spark.llm import similarity

    e = load_tables(spark, sf_dir)["embeddings"]
    return similarity.quantize_int8_summary(e)


# Importing the module (not just the registry dict) guarantees the
# llm_corpus_filter entry exists regardless of queries/__init__ import order.
from hdp2_5_hive2_spark.queries import llm_corpus as _llm_corpus  # noqa: F401
from hdp2_5_hive2_spark.queries.registry import REGISTRY as _REG

_CF_ORACLE = _REG["llm_corpus_filter"].oracle


@query(
    "llm_curation_report",
    oracle=f"""
    SELECT d.source AS source,
           count(*) AS n_docs,
           CAST(SUM(CASE WHEN NOT f.quality_keep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quality_fail,
           CAST(SUM(CASE WHEN NOT f.lang_keep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lang_fail,
           CAST(SUM(CASE WHEN NOT f.is_canonical THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup,
           CAST(SUM(CASE WHEN f.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
    FROM ({_CF_ORACLE}) f JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
    tags=("llm", "curation", "report"),
)
def llm_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus-loss funnel — the accounting table a pipeline owner
    reads after a curation run: how many documents each source lost to
    quality, language-mismatch, and exact-dup collapse, and how many
    survived. Reuses corpus_filter's per-document flags (its oracle is
    embedded verbatim as a subquery, so the two queries can never drift);
    one extra broadcast join tags each doc with its source."""
    d = load_tables(spark, sf_dir)["documents"]
    flags = curation.corpus_filter(d)
    return (
        flags.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(~F.col("quality_keep"), 1).otherwise(0)).alias("n_quality_fail"),
            F.sum(F.when(~F.col("lang_keep"), 1).otherwise(0)).alias("n_lang_fail"),
            F.sum(F.when(~F.col("is_canonical"), 1).otherwise(0)).alias("n_dup"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_keep"),
        )
    )


@query(
    "llm_tokenizer_fertility",
    oracle="""
    SELECT lang,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
             AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text,
                ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))) AS BIGINT)
             AS bpe_tokens,
           CAST(SUM(len(regexp_extract_all(text,
                ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))) AS DOUBLE)
             / SUM(len(string_split_regex(trim(text), '\\s+'))) AS fertility
    FROM documents WHERE length(trim(text)) > 0
    GROUP BY lang
    """,
    tags=("llm", "text", "tokens"),
)
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — BPE-style segments per whitespace
    word, the number a multilingual token-budget planner reads (languages
    with high fertility cost more context per word). Exact bigint sums, one
    final double division; pure map-side regexp counting + one tiny
    aggregation."""
    from hdp2_5_hive2_spark.llm import text as t

    d = load_tables(spark, sf_dir)["documents"].filter(F.length(F.trim("text")) > 0)
    return (
        d.groupBy("lang")
        .agg(
            F.sum(t.token_count("text")).alias("ws_tokens"),
            F.sum(t.bpe_ish_token_count("text")).alias("bpe_tokens"),
        )
        .select(
            "lang",
            "ws_tokens",
            "bpe_tokens",
            (F.col("bpe_tokens").cast("double") / F.col("ws_tokens")).alias("fertility"),
        )
    )


@query(
    "llm_dataset_card",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, source,
             len(string_split_regex(trim(text), '\\s+')) AS n_tok,
             length(text) AS n_chars,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
      FROM documents
    ), dup AS (
      SELECT CAST(SUM(cnt - 1) AS BIGINT) AS n_dup_docs
      FROM (SELECT fp, count(*) AS cnt FROM base GROUP BY fp)
    )
    SELECT count(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           count(DISTINCT lang) AS n_langs,
           count(DISTINCT source) AS n_sources,
           CAST(MIN(n_tok) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tok) AS BIGINT) AS max_tokens,
           CAST(SUM(n_tok) AS DOUBLE) / count(*) AS mean_tokens,
           d.n_dup_docs AS n_dup_docs,
           CAST(d.n_dup_docs AS DOUBLE) / count(*) AS dup_rate
    FROM base CROSS JOIN dup d
    GROUP BY d.n_dup_docs
    """,
    tags=("llm", "curation", "report"),
)
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary — the one-row release-stats table a published
    corpus ships with: document/token/char totals, language and source
    cardinality, token-length extremes, and the exact-duplicate rate
    (docs beyond the first per normalized fingerprint). Exact bigints with
    two final double divisions; the dup count rides a broadcast one-row
    cross join of a fingerprint-keyed aggregate."""
    d = load_tables(spark, sf_dir)["documents"]
    from hdp2_5_hive2_spark.llm.text import normalize_text, token_count

    base = d.select(
        "doc_id", "lang", "source",
        token_count("text").alias("n_tok"),
        F.length("text").alias("n_chars"),
        F.md5(normalize_text("text")).alias("fp"),
    )
    dup = (
        base.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.sum(F.col("cnt") - 1).alias("n_dup_docs"))
    )
    return (
        base.crossJoin(F.broadcast(dup))
        .groupBy("n_dup_docs")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("n_tok").alias("min_tokens"),
            F.max("n_tok").alias("max_tokens"),
            (F.sum("n_tok").cast("double") / F.count(F.lit(1))).alias("mean_tokens"),
        )
        .select(
            "n_docs", "total_tokens", "total_chars", "n_langs", "n_sources",
            "min_tokens", "max_tokens", "mean_tokens", "n_dup_docs",
            (F.col("n_dup_docs").cast("double") / F.col("n_docs")).alias("dup_rate"),
        )
    )


@query(
    "llm_bpe_pair_counts",
    oracle="""
    WITH w AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
      FROM documents
    ),
    v AS (SELECT word, count(*) AS n FROM w WHERE word <> '' GROUP BY word),
    p AS (
      SELECT unnest(list_transform(range(1, length(word)),
                                   i -> substr(word, CAST(i AS INTEGER), 2)))
               AS pair,
             n
      FROM v WHERE length(word) >= 2
    )
    SELECT pair, CAST(sum(n) AS BIGINT) AS cnt
    FROM p GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 50
    """,
    tags=("llm", "retrieval", "tokenizer", "bpe"),
)
def llm_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training pair statistics (Sennrich et al. 2016): the
    top-50 adjacent character pairs weighted by word frequency — iteration
    0 of the merge loop; argmax of this table IS the first merge rule. The
    oracle recomputes the same vocabulary -> pair expansion with DuckDB
    list_transform, and (cnt DESC, pair) totally orders the heap.

    100 TB plan: see retrieval.bpe_pair_counts — corpus text is read once
    into a word-count vocabulary (one shuffle, map-side combine); pair
    expansion runs over the DISTINCT vocab (Heaps-law-bounded), and the
    top-50 is a TakeOrderedAndProject."""
    d = load_tables(spark, sf_dir)["documents"]
    return retrieval.bpe_pair_counts(d, top_k=50)


def _dsir_oracle(dim: int = 16, target_source: str = "src0", topk: int = 20) -> str:
    """Oracle SQL mirroring retrieval.dsir_importance_weights' FIXED
    bucket-order expression tree (generated once at import; the registry
    stores the plain string)."""
    b = "CAST(('0x' || substring(md5(term), 1, 8)) AS BIGINT) % " + str(dim)
    f_slots = ",\n".join(
        f"        SUM(CASE WHEN b = {i} THEN 1 ELSE 0 END) AS f{i}" for i in range(dim)
    )
    t_slots = ",\n".join(
        f"        SUM(CASE WHEN b = {i} THEN 1 ELSE 0 END) AS t{i}" for i in range(dim)
    )
    r_slots = ",\n".join(
        f"        SUM(CASE WHEN b = {i} THEN 1 ELSE 0 END) AS r{i}" for i in range(dim)
    )
    # identical inner structure to the Spark column expression:
    # f_i * (ln(t_i+1) - ln(r_i+1) + (ln(R+dim) - ln(T+dim))), summed 0..dim-1
    terms = " + ".join(
        f"f{i} * (ln(t{i} + 1) - ln(r{i} + 1) + (ln(r_total + {dim}) - ln(t_total + {dim})))"
        for i in range(dim)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, source,
             unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ), bk AS (
      SELECT doc_id, source, {b} AS b FROM tok
    ), feats AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
{f_slots}
      FROM bk GROUP BY doc_id
    ), t AS (
      SELECT count(*) AS t_total,
{t_slots}
      FROM bk WHERE source = '{target_source}'
    ), r AS (
      SELECT count(*) AS r_total,
{r_slots}
      FROM bk
    )
    SELECT doc_id, n_tokens, rank FROM (
      SELECT doc_id, n_tokens,
             row_number() OVER (ORDER BY ({terms}) DESC, doc_id) AS rank
      FROM feats, t, r
    ) WHERE rank <= {topk}
    """


@query(
    "llm_dsir_weights",
    oracle=_dsir_oracle(),
    tags=("llm", "retrieval", "curation", "dsir", "bench"),
)
def llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance-resampling selection (retrieval
    .dsir_importance_weights): score every document by the hashed-unigram
    log-likelihood ratio against the source='src0' target domain, return
    the top-20 candidates (rank, not the raw double — ln is the one
    non-correctly-rounded op in the chain, so like llm_ann_topk the corpus
    pins the engine-stable ranking; distinct bucket histograms separate by
    ≫ ulp, identical histograms tie exactly and break on doc_id)."""
    d = load_tables(spark, sf_dir)["documents"]
    # target as a Column predicate: the target domain IS a slice of the
    # corpus here, so the kernel's one-pass path applies (one tokenize
    # pass + derived LM rows instead of three tokenize passes — r13
    # optimization; results proven identical against the same oracle).
    weights = retrieval.dsir_importance_weights(
        d, target=F.col("source") == "src0", dim=16
    )
    # Top-20 of the CORPUS-sized weights table via sort+limit
    # (TakeOrderedAndProject bounded heaps, VERDICT r6 #2) — never a
    # single-partition window over the full corpus; the ≤20 survivors are
    # ranked window-free (retrieval.bounded_rank). (weight desc, doc_id
    # asc) is a total order, so the limit is deterministic.
    top = weights.orderBy(F.desc("weight"), F.asc("doc_id")).limit(20)
    return retrieval.bounded_rank(top, "weight", "doc_id").select(
        "doc_id", "n_tokens", "rank"
    )


@query(
    "llm_heldout_lm_score",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), b AS (
      SELECT doc_id, source,
             unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1])) AS ngram
      FROM t WHERE len(t) >= 2
    ), db AS (
      SELECT doc_id, ngram, count(*) AS cnt FROM b GROUP BY doc_id, ngram
    ), train AS (
      SELECT doc_id, ngram, count(*) AS cnt FROM b
      WHERE source IN ('src0','src1','src2','src3','src4')
      GROUP BY doc_id, ngram
    ), cb AS (
      SELECT ngram, CAST(SUM(cnt) AS BIGINT) AS c_bg,
             string_split(ngram, ' ')[1] AS w1
      FROM train GROUP BY ngram
    ), cp AS (
      SELECT w1, CAST(SUM(c_bg) AS BIGINT) AS c_w1 FROM cb GROUP BY w1
    ), q AS (
      SELECT cb.ngram,
             CAST(floor((CAST(cb.c_bg AS DOUBLE) / cp.c_w1)
                        * CAST(1048576 AS DOUBLE)) AS BIGINT) AS pq
      FROM cb JOIN cp USING (w1)
    )
    SELECT db.doc_id AS doc_id,
           CAST(SUM(db.cnt) AS BIGINT) AS n_bigrams,
           CAST(SUM(db.cnt * q.pq) AS BIGINT) AS score_q,
           CAST(SUM(db.cnt * q.pq) AS DOUBLE)
             / (CAST(SUM(db.cnt) AS DOUBLE) * CAST(1048576 AS DOUBLE)) AS avg_prob
    FROM db JOIN q USING (ngram) GROUP BY db.doc_id
    """,
    tags=("llm", "retrieval", "lm-score", "heldout"),
)
def llm_heldout_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram-LM scoring (retrieval.bigram_lm_score with
    ``train_df`` — the CCNet shape proper): the LM is fit ONLY on sources
    src0-src4 (the "clean reference domain") and every document is scored
    under it; bigrams unseen in training are excluded (inner join, no
    smoothing — documented kernel contract). n_bigrams here counts the
    KNOWN bigram occurrences per doc, so the column also exposes how much
    of each document the reference LM covers."""
    d = load_tables(spark, sf_dir)["documents"]
    train = d.filter(
        F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    )
    return retrieval.bigram_lm_score(d, train_df=train)


@query(
    "llm_rrf_fusion",
    oracle=_TOK_CTE
    + """
    , tf_all AS (
      SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ), dfq AS (
      SELECT term, count(*) AS df_term FROM tf_all GROUP BY term
    ), st AS (
      SELECT count(*) AS n_docs,
             CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
               / count(*) AS avgdl
      FROM documents
    ), dl AS (
      SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS dl
      FROM documents
    ), s AS (
      SELECT t.doc_id, t.term,
             ((CAST(n.n_docs AS DOUBLE) - d.df_term + CAST(0.5 AS DOUBLE))
                / (CAST(d.df_term AS DOUBLE) + CAST(0.5 AS DOUBLE)))
               * (CAST(t.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
               / (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
                  * (CAST(0.25 AS DOUBLE)
                     + CAST(0.75 AS DOUBLE) * (l.dl / n.avgdl))) AS s
      FROM tf_all t
      JOIN dfq d USING (term)
      JOIN dl l USING (doc_id)
      CROSS JOIN st n
      WHERE t.term IN ('spark', 'join', 'window')
    ), p AS (
      SELECT doc_id,
             coalesce(MAX(CASE WHEN term = 'spark'  THEN s END), 0.0)
           + coalesce(MAX(CASE WHEN term = 'join'   THEN s END), 0.0)
           + coalesce(MAX(CASE WHEN term = 'window' THEN s END), 0.0) AS score
      FROM s GROUP BY doc_id
    ), bm AS (
      SELECT doc_id, rank FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        FROM p
      ) WHERE rank <= 50
    ), ann AS (
      SELECT doc_id, rank FROM (
        SELECT c.vec_id AS doc_id,
               row_number() OVER (
                 ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                                 CAST(q.embedding AS DOUBLE[])) DESC,
                          c.vec_id
               ) AS rank
        FROM embeddings c
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 7) q
      ) WHERE rank <= 50
    ), f AS (
      SELECT COALESCE(bm.doc_id, ann.doc_id) AS doc_id,
             COALESCE(CAST(1 AS DOUBLE) / (60 + bm.rank), CAST(0 AS DOUBLE))
           + COALESCE(CAST(1 AS DOUBLE) / (60 + ann.rank), CAST(0 AS DOUBLE))
               AS rrf_score
      FROM bm FULL OUTER JOIN ann ON bm.doc_id = ann.doc_id
    )
    SELECT doc_id, rrf_score, rank FROM (
      SELECT doc_id, rrf_score,
             row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
      FROM f
    ) WHERE rank <= 20
    """,
    tags=("llm", "retrieval", "fusion"),
)
def llm_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (llm.retrieval.rrf_fuse):
    fuse the BM25 top-50 for {spark, join, window} with the embedding-cosine
    top-50 for query vector vec_id=7 (docs and embeddings share the id
    space) — score(d) = 1/(60+rank_bm25) + 1/(60+rank_ann), absent lists
    contribute 0. Scores derive from integer RANKS in fixed slots (single
    IEEE divisions summed left-to-right), so doubles match bitwise
    cross-engine even though raw cosine floats would not."""
    from hdp2_5_hive2_spark.llm import similarity

    t = load_tables(spark, sf_dir)
    d, e = t["documents"], t["embeddings"]
    bm = retrieval.bm25_rank(d, ["spark", "join", "window"], topk=50).select(
        "doc_id", "rank"
    )
    ann = similarity.brute_force_topk(
        corpus=e, queries=e.filter(F.col("vec_id") == 7), k=50
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return retrieval.rrf_fuse([bm, ann], topk=20)


@query(
    "llm_bpe_merge_step",
    oracle=_TOK_CTE
    + r"""
    , vocab AS (
      SELECT term AS word, CAST(count(*) AS BIGINT) AS n
      FROM tok WHERE term <> '' GROUP BY term
    ), cand AS (
      SELECT substr(word, CAST(i AS INT), 2) AS pair, CAST(SUM(n) AS BIGINT) AS cnt
      FROM vocab, unnest(generate_series(1, length(word) - 1)) AS u(i)
      WHERE length(word) >= 2
      GROUP BY 1
    ), top AS (
      SELECT pair FROM cand ORDER BY cnt DESC, pair LIMIT 1
    ), pos AS (
      SELECT v.word, v.n, CAST(u.i AS BIGINT) AS i
      FROM vocab v, unnest(generate_series(1, length(v.word) - 1)) AS u(i), top
      WHERE length(v.word) >= 2
        AND substr(v.word, CAST(u.i AS INT), 2) = top.pair
    ), isl AS (
      SELECT word, n,
             i - row_number() OVER (PARTITION BY word ORDER BY i) AS g
      FROM pos
    ), runs AS (
      SELECT word, n, g, CAST(count(*) AS BIGINT) AS m
      FROM isl GROUP BY word, n, g
    ), pw AS (
      SELECT word, n, CAST(SUM((m + 1) // 2) AS BIGINT) AS mw
      FROM runs GROUP BY word, n
    ), tot AS (
      SELECT CAST(SUM(n * length(word)) AS BIGINT) AS symbols_before FROM vocab
    )
    SELECT top.pair,
           CAST(coalesce(SUM(pw.n), 0) AS BIGINT) AS affected_word_occs,
           CAST(coalesce(SUM(pw.n * pw.mw), 0) AS BIGINT) AS n_merges,
           tot.symbols_before,
           tot.symbols_before - CAST(coalesce(SUM(pw.n * pw.mw), 0) AS BIGINT)
             AS symbols_after
    FROM tot CROSS JOIN top LEFT JOIN pw ON true
    GROUP BY top.pair, tot.symbols_before
    """,
    tags=("llm", "retrieval", "bpe", "tokenizer"),
)
def llm_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge iteration's exact accounting (llm.retrieval
    .bpe_merge_step_stats): the top adjacent character pair is applied
    greedily left-to-right and the resulting merge count, affected word
    occurrences, and symbol totals are computed via gaps-and-islands
    integer arithmetic over the DISTINCT vocabulary (each maximal run of
    consecutive match positions yields (len+1) div 2 merges — consecutive
    matches only occur for doubled-character pairs). The corpus is touched
    once; everything downstream is Heaps-bounded vocab work."""
    d = load_tables(spark, sf_dir)["documents"]
    return retrieval.bpe_merge_step_stats(d)


@query(
    "llm_bpe_train3",
    oracle=_TOK_CTE
    + r"""
    , v0 AS (
      SELECT term AS word, CAST(count(*) AS BIGINT) AS n
      FROM tok WHERE term <> '' GROUP BY term
    ), p0 AS (
      SELECT substr(word, CAST(i AS INT), 2) AS pair, CAST(SUM(n) AS BIGINT) AS cnt
      FROM v0, unnest(generate_series(1, length(word) - 1)) AS u(i)
      WHERE length(word) >= 2 GROUP BY 1
    ), t0 AS (SELECT pair, cnt FROM p0 ORDER BY cnt DESC, pair LIMIT 1),
    v1 AS (
      SELECT replace(word, (SELECT pair FROM t0), chr(57344)) AS word, n FROM v0
    ), p1 AS (
      SELECT substr(word, CAST(i AS INT), 2) AS pair, CAST(SUM(n) AS BIGINT) AS cnt
      FROM v1, unnest(generate_series(1, length(word) - 1)) AS u(i)
      WHERE length(word) >= 2 GROUP BY 1
    ), t1 AS (SELECT pair, cnt FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
    v2 AS (
      SELECT replace(word, (SELECT pair FROM t1), chr(57345)) AS word, n FROM v1
    ), p2 AS (
      SELECT substr(word, CAST(i AS INT), 2) AS pair, CAST(SUM(n) AS BIGINT) AS cnt
      FROM v2, unnest(generate_series(1, length(word) - 1)) AS u(i)
      WHERE length(word) >= 2 GROUP BY 1
    ), t2 AS (SELECT pair, cnt FROM p2 ORDER BY cnt DESC, pair LIMIT 1)
    SELECT 0 AS merge_idx, pair, cnt FROM t0
    UNION ALL SELECT 1, pair, cnt FROM t1
    UNION ALL SELECT 2, pair, cnt FROM t2
    """,
    tags=("llm", "retrieval", "bpe", "tokenizer"),
)
def llm_bpe_train3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three rounds of actual BPE training (llm.retrieval.bpe_train): each
    round counts adjacent symbol pairs over the transformed vocabulary,
    takes the (cnt desc, pair) argmax, and applies the merge with greedy
    left-to-right replace into a fresh private-use symbol — so rounds 2-3
    can (and do) merge previously-merged symbols, exactly like the real
    algorithm. Output is the learned merge table. The corpus is scanned
    once; every round is Heaps-bounded vocab work."""
    d = load_tables(spark, sf_dir)["documents"]
    return retrieval.bpe_train(d, n_merges=3)


@query(
    "llm_bpe_fertility_gain",
    oracle=_TOK_CTE
    + r"""
    , v0 AS (
      SELECT term AS word, CAST(count(*) AS BIGINT) AS n
      FROM tok WHERE term <> '' GROUP BY term
    ), p0 AS (
      SELECT substr(word, CAST(i AS INT), 2) AS pair, CAST(SUM(n) AS BIGINT) AS cnt
      FROM v0, unnest(generate_series(1, length(word) - 1)) AS u(i)
      WHERE length(word) >= 2 GROUP BY 1
    ), t0 AS (SELECT pair FROM p0 ORDER BY cnt DESC, pair LIMIT 1),
    v1 AS (
      SELECT replace(word, (SELECT pair FROM t0), chr(57344)) AS word, n FROM v0
    ), p1 AS (
      SELECT substr(word, CAST(i AS INT), 2) AS pair, CAST(SUM(n) AS BIGINT) AS cnt
      FROM v1, unnest(generate_series(1, length(word) - 1)) AS u(i)
      WHERE length(word) >= 2 GROUP BY 1
    ), t1 AS (SELECT pair FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
    v2 AS (
      SELECT replace(word, (SELECT pair FROM t1), chr(57345)) AS word, n FROM v1
    ), p2 AS (
      SELECT substr(word, CAST(i AS INT), 2) AS pair, CAST(SUM(n) AS BIGINT) AS cnt
      FROM v2, unnest(generate_series(1, length(word) - 1)) AS u(i)
      WHERE length(word) >= 2 GROUP BY 1
    ), t2 AS (SELECT pair FROM p2 ORDER BY cnt DESC, pair LIMIT 1),
    v3 AS (
      SELECT replace(word, (SELECT pair FROM t2), chr(57346)) AS word, n FROM v2
    ), stats AS (
      SELECT (SELECT CAST(SUM(n * length(word)) AS BIGINT) FROM v0) AS symbols_before,
             (SELECT CAST(SUM(n * length(word)) AS BIGINT) FROM v3) AS symbols_after,
             (SELECT CAST(SUM(n) AS BIGINT) FROM v0) AS word_occs
    )
    SELECT symbols_before, symbols_after, word_occs,
           CAST(symbols_before - symbols_after AS DOUBLE)
             / CAST(symbols_before AS DOUBLE) AS compression,
           CAST(symbols_after AS DOUBLE) / CAST(word_occs AS DOUBLE)
             AS fertility_after
    FROM stats
    """,
    tags=("llm", "retrieval", "bpe", "tokenizer"),
)
def llm_bpe_fertility_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End use of the learned BPE merges: apply llm_bpe_train3's three
    merge rules to the vocabulary and measure the corpus-weighted symbol
    compression and resulting fertility (symbols per word occurrence) —
    the number a tokenizer team watches to decide how many merges to buy.
    Integer symbol totals; two single IEEE divisions at the end."""
    d = load_tables(spark, sf_dir)["documents"]
    from hdp2_5_hive2_spark.llm.text import tokens as _tokens

    merges = retrieval.bpe_train(d, n_merges=3).collect()
    vocab = (
        d.select(F.explode(_tokens("text")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    before = vocab.agg(
        F.sum(F.col("n") * F.length("word")).alias("symbols_before"),
        F.sum("n").alias("word_occs"),
    )
    after_word = F.col("word")
    for m in merges:
        after_word = F.replace(
            after_word, F.lit(m["pair"]), F.lit(chr(0xE000 + m["merge_idx"]))
        )
    after = vocab.select(after_word.alias("word"), "n").agg(
        F.sum(F.col("n") * F.length("word")).alias("symbols_after")
    )
    return (
        before.crossJoin(F.broadcast(after))
        .select(
            "symbols_before",
            "symbols_after",
            "word_occs",
            (
                (F.col("symbols_before") - F.col("symbols_after")).cast("double")
                / F.col("symbols_before").cast("double")
            ).alias("compression"),
            (
                F.col("symbols_after").cast("double")
                / F.col("word_occs").cast("double")
            ).alias("fertility_after"),
        )
    )


@query(
    "llm_bpe_doc_tokens",
    oracle=_TOK_CTE
    + r"""
    , v0 AS (
      SELECT term AS word, CAST(count(*) AS BIGINT) AS n
      FROM tok WHERE term <> '' GROUP BY term
    ), p0 AS (
      SELECT substr(word, CAST(i AS INT), 2) AS pair, CAST(SUM(n) AS BIGINT) AS cnt
      FROM v0, unnest(generate_series(1, length(word) - 1)) AS u(i)
      WHERE length(word) >= 2 GROUP BY 1
    ), t0 AS (SELECT pair FROM p0 ORDER BY cnt DESC, pair LIMIT 1),
    v1 AS (
      SELECT replace(word, (SELECT pair FROM t0), chr(57344)) AS word, n FROM v0
    ), p1 AS (
      SELECT substr(word, CAST(i AS INT), 2) AS pair, CAST(SUM(n) AS BIGINT) AS cnt
      FROM v1, unnest(generate_series(1, length(word) - 1)) AS u(i)
      WHERE length(word) >= 2 GROUP BY 1
    ), t1 AS (SELECT pair FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
    v2 AS (
      SELECT replace(word, (SELECT pair FROM t1), chr(57345)) AS word, n FROM v1
    ), p2 AS (
      SELECT substr(word, CAST(i AS INT), 2) AS pair, CAST(SUM(n) AS BIGINT) AS cnt
      FROM v2, unnest(generate_series(1, length(word) - 1)) AS u(i)
      WHERE length(word) >= 2 GROUP BY 1
    ), t2 AS (SELECT pair FROM p2 ORDER BY cnt DESC, pair LIMIT 1),
    r AS (
      SELECT doc_id,
             length(term) AS lp,
             length(replace(replace(replace(term,
                      (SELECT pair FROM t0), chr(57344)),
                      (SELECT pair FROM t1), chr(57345)),
                      (SELECT pair FROM t2), chr(57346))) AS ls
      FROM tok WHERE term <> ''
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(lp) AS BIGINT) AS symbols_plain,
           CAST(sum(ls) AS BIGINT) AS symbols_bpe
    FROM r GROUP BY doc_id
    """,
    tags=("llm", "retrieval", "bpe", "tokenizer"),
)
def llm_bpe_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document tokenization cost under the learned BPE merges: apply
    llm_bpe_train3's three rules (chained greedy replaces — sequential
    application, exactly the training transform) to every word occurrence
    and report per-doc symbol counts before/after — the per-example
    context-window budget under the real tokenizer, where
    llm_bpe_fertility_gain gave only the corpus aggregate. One explode +
    codegen replace chain + one doc-keyed aggregate."""
    d = load_tables(spark, sf_dir)["documents"]
    from hdp2_5_hive2_spark.llm.text import tokens as _tokens

    merges = retrieval.bpe_train(d, n_merges=3).collect()
    words = d.select(
        "doc_id", F.explode(_tokens("text")).alias("word")
    ).filter(F.col("word") != "")
    transformed = F.col("word")
    for m in merges:
        transformed = F.replace(
            transformed, F.lit(m["pair"]), F.lit(chr(0xE000 + m["merge_idx"]))
        )
    return (
        words.select(
            "doc_id",
            F.length("word").alias("lp"),
            F.length(transformed).alias("ls"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("lp").alias("symbols_plain"),
            F.sum("ls").alias("symbols_bpe"),
        )
    )


@query(
    "llm_kn_bigram_score",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), b AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1])) AS ngram
      FROM t WHERE len(t) >= 2
    ), db AS (
      SELECT doc_id, ngram, count(*) AS cnt FROM b GROUP BY doc_id, ngram
    ), cb AS (
      SELECT ngram, CAST(SUM(cnt) AS BIGINT) AS c_bg,
             string_split(ngram, ' ')[1] AS w1,
             string_split(ngram, ' ')[2] AS w2
      FROM db GROUP BY ngram
    ), cw AS (
      SELECT w1, CAST(SUM(c_bg) AS BIGINT) AS c_w1,
             CAST(count(*) AS BIGINT) AS n1_fwd
      FROM cb GROUP BY w1
    ), cont AS (
      SELECT w2, CAST(count(*) AS BIGINT) AS n1_bwd FROM cb GROUP BY w2
    ), tt AS (
      SELECT CAST(count(*) AS BIGINT) AS t_types FROM cb
    ), q AS (
      SELECT cb.ngram,
             CAST(floor((
               ((CAST(c_bg AS DOUBLE) - 0.75) / CAST(c_w1 AS DOUBLE))
               + (((0.75 * CAST(n1_fwd AS DOUBLE)) / CAST(c_w1 AS DOUBLE))
                  * (CAST(n1_bwd AS DOUBLE) / CAST(t_types AS DOUBLE)))
             ) * CAST(1048576 AS DOUBLE)) AS BIGINT) AS pq
      FROM cb JOIN cw USING (w1) JOIN cont USING (w2), tt
    )
    SELECT db.doc_id AS doc_id,
           CAST(SUM(db.cnt) AS BIGINT) AS n_bigrams,
           CAST(SUM(db.cnt * q.pq) AS BIGINT) AS score_q,
           CAST(SUM(db.cnt * q.pq) AS DOUBLE)
             / (CAST(SUM(db.cnt) AS DOUBLE) * CAST(1048576 AS DOUBLE)) AS avg_prob
    FROM db JOIN q USING (ngram) GROUP BY db.doc_id
    """,
    tags=("llm", "retrieval", "lm-score", "kneser-ney"),
)
def llm_kn_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram LM quality score per document
    (retrieval.kn_bigram_score, D=0.75) — the smoothing family CCNet's
    KenLM filter uses, vs llm_bigram_lm_score's raw MLE. P_KN is evaluated
    in a fixed IEEE op order over exact integer counts and quantized to
    2^-20 BEFORE aggregation, so the oracle hash is bitwise despite being
    a probability model."""
    d = load_tables(spark, sf_dir)["documents"]
    return retrieval.kn_bigram_score(d)


def _nb_oracle(dim: int = 32) -> str:
    """Oracle SQL mirroring retrieval.nb_hashed_classify's FIXED bucket-order
    score expression (generated once at import)."""
    b = "CAST(('0x' || substring(md5(term), 1, 8)) AS BIGINT) % " + str(dim)
    f_slots = ",\n".join(
        f"        SUM(CASE WHEN b = {i} THEN 1 ELSE 0 END) AS f{i}" for i in range(dim)
    )
    t_slots = ",\n".join(
        f"        SUM(CASE WHEN b = {i} THEN 1 ELSE 0 END) AS t{i}" for i in range(dim)
    )
    score = " + ".join(
        f"f{i} * (ln(t{i} + 1) - ln(total + {dim}))" for i in range(dim)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ), bk AS (
      SELECT doc_id, lang, {b} AS b FROM tok
    ), feats AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
{f_slots}
      FROM bk GROUP BY doc_id
    ), models AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS total,
{t_slots}
      FROM bk GROUP BY lang
    ), mp AS (
      SELECT m.*, p.docs_c FROM models m
      JOIN (SELECT lang, CAST(count(*) AS BIGINT) AS docs_c
            FROM documents GROUP BY lang) p USING (lang)
    ), nd AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
    )
    SELECT doc_id, n_tokens, lang AS pred_lang FROM (
      SELECT f.doc_id, f.n_tokens, mp.lang,
             row_number() OVER (
               PARTITION BY f.doc_id
               ORDER BY ({score} + (ln(docs_c) - ln(n_docs))) DESC, mp.lang
             ) AS r
      FROM feats f CROSS JOIN mp CROSS JOIN nd
    ) WHERE r = 1
    """


@query(
    "llm_nb_classify",
    oracle=_nb_oracle(),
    tags=("llm", "retrieval", "classifier", "naive-bayes"),
)
def llm_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier trained and applied in
    one distributed composition (retrieval.nb_hashed_classify, 32 md5 hash
    buckets, add-one smoothing, class log-priors) — the fastText-style
    linear baseline for corpus labeling. Model is n_classes × 32 ints
    (broadcast); scores evaluate in fixed bucket order so the argmax is
    engine-stable (DSIR ln/rank discipline); output pins (doc_id,
    n_tokens, pred_lang) only."""
    d = load_tables(spark, sf_dir)["documents"]
    return retrieval.nb_hashed_classify(d, class_col="lang", dim=32)


@query(
    "llm_chars_per_token_fit",
    oracle="""
    WITH base AS (
      SELECT source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS x,
             CAST(n_chars AS BIGINT) AS y
      FROM documents
    ), agg AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM base GROUP BY source
    )
    SELECT source, n,
           CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) <> 0 THEN
             CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
           END AS slope,
           CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) <> 0 THEN
             (CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE)
           END AS intercept,
           CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) <> 0
                 AND CAST(n * syy - sy * sy AS DOUBLE) <> 0 THEN
             (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
             / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
           END AS r2
    FROM agg
    """,
    tags=("llm", "stats", "regression"),
)
def llm_chars_per_token_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source chars-per-token linear fit (stats.linfit_by_group): the
    tokenizer cost model "bytes ≈ a + b·tokens" fitted in closed form from
    one aggregation pass of exact-int sufficient statistics — the
    distributed normal-equations primitive (never an iterative driver
    loop). Slope/intercept/r² are fixed-order IEEE ops over exact bigint
    sums, so the doubles hash-match the oracle bitwise."""
    d = load_tables(spark, sf_dir)["documents"]
    base = d.select(
        "source",
        llm_text.token_count("text").alias("x"),
        F.col("n_chars").alias("y"),
    )
    return stats.linfit_by_group(base, ["source"], "x", "y")


@query(
    "llm_oov_rate",
    oracle="""
    WITH sp AS (
      SELECT doc_id, source, text,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 100 AS b
      FROM documents
    ), tr AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM sp WHERE b < 90
    ), vocab AS (
      SELECT term FROM (
        SELECT term, count(*) AS cnt FROM tr GROUP BY term
        ORDER BY cnt DESC, term ASC LIMIT 16
      )
    ), ev AS (
      SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM sp WHERE b >= 90
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN term IN (SELECT term FROM vocab) THEN 0 ELSE 1 END)
                AS BIGINT) AS n_oov,
           CAST(SUM(CASE WHEN term IN (SELECT term FROM vocab) THEN 0 ELSE 1 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS oov_rate
    FROM ev GROUP BY source
    """,
    tags=("llm", "retrieval", "vocab", "oov"),
)
def llm_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out OOV rate under a capped 16-token vocabulary learned from the
    train split (llm.retrieval.oov_rate) — the tokenizer-budget acceptance
    metric: what fraction of deployment tokens falls to <unk> at this vocab
    size. Split rule is the standard md5(doc_id)%100 hash split (<90 train,
    rest held out — same rule as llm_split_assign). The vocab ranking runs
    on the post-agg vocab-sized table and is then BROADCAST, so held-out
    text is scored map-side; exact integer counts, one closing division."""
    d = load_tables(spark, sf_dir)["documents"]
    b = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % 100
    train = d.filter(b < 90)
    heldout = d.filter(b >= 90)
    return retrieval.oov_rate(train, heldout, vocab_size=16)


@query(
    "llm_posting_lists",
    oracle="""
    WITH p AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents
      )
    ), b AS (
      SELECT term, doc_id,
             (row_number() OVER (PARTITION BY term ORDER BY doc_id) - 1) // 128
               AS block_id
      FROM p
    ), g AS (
      SELECT term, block_id, list(doc_id ORDER BY doc_id) AS arr
      FROM b GROUP BY term, block_id
    )
    SELECT term, CAST(block_id AS BIGINT) AS block_id,
           CAST(len(arr) AS BIGINT) AS n_postings,
           CAST(arr[1] AS BIGINT) AS first_doc,
           CAST(arr[-1] AS BIGINT) AS last_doc,
           array_to_string(list_transform(generate_series(1, len(arr)),
                          i -> CASE WHEN i = 1 THEN CAST(0 AS BIGINT)
                                    ELSE CAST(arr[i] - arr[i-1] AS BIGINT) END), ',')
             AS gaps
    FROM g
    """,
    tags=("llm", "retrieval", "index"),
)
def llm_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-encoded inverted index build (llm.retrieval.posting_blocks):
    per term, the sorted posting list split into 128-entry blocks of
    delta-encoded doc ids — the block-max/skip-list shape real search
    indexes persist, chosen over one-list-per-term precisely because the
    aggregation buffer stays bounded at any document frequency. Integer
    output end-to-end (ids, block ids, gap arrays)."""
    d = load_tables(spark, sf_dir)["documents"]
    return retrieval.posting_blocks(d, block_size=128)
