"""Round-10 corpus: the curation-planning and index-health frontier past
the r9 pipeline suite — vocabulary audits (hapax/type-token, burstiness,
tokenizer fertility), corpus scheduling (Chinchilla-style token budgets,
weighted-fair interleaving, PPSWOR stratified sampling, temperature
sweeps), dedup sensitivity (threshold sweeps, n-gram coverage curves,
cluster-size power laws, span masking), graph cores (synchronized 2-core
peeling), retrieval evaluation (recall@k curves, MMR diversification,
rank-correlation audits), quantization geometry (signed-permutation
rotation audits), and shard topology (consistent-hash rebalance).

Oracle discipline (the r4-r9 standard): every floating-point output is a
FIXED expression tree of single IEEE-754 ops over exact integers — no
transcendentals, no order-dependent double accumulation (normalizers that
must sum floats fold over SORTED lists — a fixed sequence of single IEEE
adds both engines reproduce bitwise). md5-derived draws/priorities use the
cross-engine conv(substring(md5(..)))/('0x' || ..)::BIGINT idiom. Embedding
kernels quantize floor(v·1024) once and stay in int64.

Reference surface: Hive's own corpus stops at n-gram aggregates and
GenericUDAFs (ql/udf/generic/GenericUDAFnGrams.java,
FunctionRegistry.java:393-399); these queries are the LLM-pipeline layer
the engine adds above that surface (SURVEY.md §2 "training-data pipeline"
axis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdp2_5_hive2_spark.catalog import load_tables
from hdp2_5_hive2_spark.llm import curation, retrieval, similarity
from hdp2_5_hive2_spark.llm import text as llm_text
from hdp2_5_hive2_spark.llm.text import token_count
from hdp2_5_hive2_spark.queries.registry import query

# Reused DuckDB CTE fragments from the established corpora (imported, not
# copied, so the derivations can never drift from the queries they mirror).
from hdp2_5_hive2_spark.queries.llm_corpus import (
    _ngram_cte,
    _WINNOW_ORACLE_CTE,
)

# Shared tokenization CTE (DuckDB side) — mirrors llm.text.tokens.
_TOK_CTE = """
    WITH tok AS (
      SELECT doc_id, source,
             unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    )
"""


@query(
    "llm_hapax_audit",
    oracle=_TOK_CTE
    + """
    , cf AS (
      SELECT source, term, count(*) AS cf FROM tok GROUP BY source, term
    )
    SELECT source,
           CAST(SUM(cf) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(SUM(CASE WHEN cf = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS hapax_share,
           CAST(count(*) AS DOUBLE) / SUM(cf) AS type_token_ratio
    FROM cf GROUP BY source
    """,
    tags=("llm", "text", "vocabulary", "audit"),
)
def llm_hapax_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary-tail audit: token count, type count, hapax
    legomena (terms occurring exactly once WITHIN the source), hapax share
    of the vocabulary, and type-token ratio — the corpus-health signals
    that flag boilerplate farms (low hapax share, low TTR) and OCR noise
    (hapax explosion) before training. Distinct from the corpus-level
    llm_vocab_coverage: this is the per-source tail shape. Both ratios are
    ONE division of exact int64 counts. Plan / 100 TB: one map-side
    tokenize, one (source, term) hash aggregate, one per-source aggregate
    — the same two-level shape as any term-frequency pass; no windows, no
    joins."""
    d = load_tables(spark, sf_dir)["documents"]
    tok = d.select(
        "source", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    cf = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("cf"))
    hapax = F.sum(F.when(F.col("cf") == 1, 1).otherwise(0))
    return cf.groupBy("source").agg(
        F.sum("cf").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        hapax.cast("bigint").alias("n_hapax"),
        (hapax.cast("double") / F.count(F.lit(1))).alias("hapax_share"),
        (F.count(F.lit(1)).cast("double") / F.sum("cf")).alias("type_token_ratio"),
    )


@query(
    "llm_burstiness",
    oracle=_TOK_CTE
    + """
    , stats AS (
      SELECT term,
             CAST(count(*) AS BIGINT) AS cf,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok GROUP BY term HAVING count(*) >= 30
    )
    SELECT term, df, cf,
           CAST(cf * 1000000 // df AS BIGINT) AS burst_ppm
    FROM stats
    ORDER BY burst_ppm DESC, term LIMIT 20
    """,
    tags=("llm", "text", "burstiness", "audit"),
)
def llm_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church–Gale burstiness screen: terms whose collection frequency far
    exceeds their document frequency (cf/df, scaled to exact ppm via
    integer floor division) repeat heavily inside few documents — the
    signature of boilerplate, templated spam, and degenerate repetition
    that document-frequency filters miss. Top-20 under the (burst_ppm
    desc, term) total order. Plan / 100 TB: one (term) aggregate with both
    counts in a single pass (count + count(distinct doc_id) — Catalyst
    expands to the standard two-level distinct aggregate), cf >= 30 floor
    prunes the tail before the top-k, and the cut is a bounded
    TakeOrderedAndProject heap, never a global sort."""
    d = load_tables(spark, sf_dir)["documents"]
    tok = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    stats = (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cf"),
            F.countDistinct("doc_id").cast("bigint").alias("df"),
        )
        .filter(F.col("cf") >= 30)
    )
    out = stats.select(
        "term",
        "df",
        "cf",
        F.expr("(cf * 1000000) div df").cast("bigint").alias("burst_ppm"),
    )
    return out.orderBy(F.desc("burst_ppm"), "term").limit(20)


@query(
    "llm_ppswor_sample",
    oracle="""
    WITH pri AS (
      SELECT source, doc_id,
             md5(CAST(doc_id AS VARCHAR) || ':smp') AS priority
      FROM documents
    )
    SELECT source, CAST(rk AS BIGINT) AS rk, doc_id FROM (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY priority, doc_id) AS rk
      FROM pri
    ) WHERE rk <= 5
    """,
    tags=("llm", "curation", "sampling"),
)
def llm_ppswor_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample-without-replacement: each document
    draws an md5 priority key (uniform, engine-exact — the repo's md5-draw
    idiom) and the 5 smallest priorities per source win — bottom-k by a
    random key IS a uniform PPSWOR sample per stratum, and re-running the
    pipeline reproduces the exact same sample (the property training-data
    audits need from a 'random' holdout). Plan / 100 TB: the window is
    PARTITIONED by source (never global) and cut at k=5 — Spark's
    rank-pushdown turns it into a per-partition bounded heap; hex md5
    strings compare identically on any engine."""
    d = load_tables(spark, sf_dir)["documents"]
    pri = d.select(
        "source",
        "doc_id",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":smp"))).alias(
            "priority"
        ),
    )
    w = Window.partitionBy("source").orderBy("priority", "doc_id")
    return (
        pri.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("source", F.col("rk").cast("bigint").alias("rk"), "doc_id")
    )


@query(
    "llm_token_budget_alloc",
    oracle="""
    WITH src AS (
      SELECT source,
             CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ), tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM src),
    models AS (
      SELECT * FROM (VALUES ('m125', CAST(2500 AS BIGINT)),
                            ('m350', CAST(7000 AS BIGINT)),
                            ('m1300', CAST(26000 AS BIGINT)))
        AS m(model, budget_ktok)
    )
    SELECT m.model, s.source, s.n_tokens,
           CAST(m.budget_ktok * 1000 * s.n_tokens // t.total AS BIGINT)
             AS alloc_tokens,
           CAST((m.budget_ktok * 1000 * s.n_tokens // t.total) * 1000
                  // s.n_tokens AS BIGINT) AS epochs_milli,
           ((m.budget_ktok * 1000 * s.n_tokens // t.total) > s.n_tokens)
             AS repeats
    FROM models m CROSS JOIN src s CROSS JOIN tot t
    """,
    tags=("llm", "curation", "planning", "budget"),
)
def llm_token_budget_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chinchilla-style token-budget allocation: three model sizes carry
    compute-optimal token budgets (20 tokens/param scaled to the test
    corpus: 2.5M/7M/26M tokens); each source receives budget·share tokens
    (exact integer floor division over the corpus total) and the realized
    epoch count in exact thousandths — epochs > 1000 milli flags the
    sources the budget forces into multi-epoch replay (the capacity-risk
    list). Pure int64 end-to-end. Plan / 100 TB: one map-side token-count
    aggregate per source, a 3-row literal model table cross-joined against
    the mixture-sized source table — nothing corpus-sized past the first
    aggregate."""
    d = load_tables(spark, sf_dir)["documents"]
    src = d.groupBy("source").agg(F.sum(token_count("text")).alias("n_tokens"))
    tot = src.agg(F.sum("n_tokens").alias("total"))
    models = spark.createDataFrame(
        [("m125", 2500), ("m350", 7000), ("m1300", 26000)],
        "model string, budget_ktok bigint",
    )
    return (
        F.broadcast(models)
        .crossJoin(src)
        .crossJoin(F.broadcast(tot))
        .select(
            "model",
            "source",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.expr("(budget_ktok * 1000 * n_tokens) div total")
            .cast("bigint")
            .alias("alloc_tokens"),
        )
        .select(
            "model",
            "source",
            "n_tokens",
            "alloc_tokens",
            F.expr("(alloc_tokens * 1000) div n_tokens")
            .cast("bigint")
            .alias("epochs_milli"),
            (F.col("alloc_tokens") > F.col("n_tokens")).alias("repeats"),
        )
    )


@query(
    "llm_fertility_by_source",
    oracle="""
    WITH d AS (
      SELECT source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS n_words,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))
               AS BIGINT) AS n_subtok
      FROM documents
    )
    SELECT source,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_subtok) AS BIGINT) AS n_subtok,
           CAST(SUM(n_subtok) * 1000 // SUM(n_words) AS BIGINT)
             AS fertility_milli
    FROM d GROUP BY source
    """,
    tags=("llm", "text", "tokenizer", "fertility"),
)
def llm_fertility_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by source: subtokens per whitespace word under
    a BPE-ish pre-tokenization (letter runs stay whole, every digit and
    every punctuation mark splits off — the GPT-2-style pre-tokenizer
    shape), in exact thousandths. High fertility marks sources whose
    context-window cost per word is inflated (code, tables, non-Latin
    scripts) — the signal mixture planners weight token budgets by.
    Plan / 100 TB: both counts are per-row regexp_count/size expressions
    in whole-stage codegen feeding one per-source aggregate; no explode,
    no shuffle of token rows."""
    d = load_tables(spark, sf_dir)["documents"]
    per = d.select(
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias(
            "n_words"
        ),
        F.regexp_count(
            F.col("text"), F.lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]")
        ).cast("bigint").alias("n_subtok"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_subtok").cast("bigint").alias("n_subtok"),
        )
        .select(
            "source",
            "n_words",
            "n_subtok",
            F.expr("(n_subtok * 1000) div n_words")
            .cast("bigint")
            .alias("fertility_milli"),
        )
    )


@query(
    "llm_consistent_hash_moves",
    oracle="""
    WITH vn AS (
      SELECT shard, v,
             md5('shard:' || shard || ':v:' || v) AS vh
      FROM generate_series(0, 8) s(shard), generate_series(0, 63) u(v)
    ), dh AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
    ), a8 AS (
      SELECT d.doc_id,
             coalesce(
               arg_min(CASE WHEN v.vh >= d.h THEN v.shard END,
                       CASE WHEN v.vh >= d.h THEN v.vh END),
               arg_min(v.shard, v.vh)) AS shard
      FROM dh d CROSS JOIN vn v WHERE v.shard < 8
      GROUP BY d.doc_id
    ), a9 AS (
      SELECT d.doc_id,
             coalesce(
               arg_min(CASE WHEN v.vh >= d.h THEN v.shard END,
                       CASE WHEN v.vh >= d.h THEN v.vh END),
               arg_min(v.shard, v.vh)) AS shard
      FROM dh d CROSS JOIN vn v
      GROUP BY d.doc_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN a8.shard <> a9.shard THEN 1 ELSE 0 END)
             AS BIGINT) AS n_moved,
           CAST(SUM(CASE WHEN a8.shard <> a9.shard THEN 1 ELSE 0 END)
             * 1000000 // count(*) AS BIGINT) AS moved_ppm,
           bool_and(a8.shard = a9.shard OR a9.shard = 8) AS moves_only_to_new
    FROM a8 JOIN a9 USING (doc_id)
    """,
    tags=("llm", "storage", "sharding", "consistent-hash"),
)
def llm_consistent_hash_moves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring rebalance audit: documents map to shards via a
    64-vnode md5 ring (assigned shard = owner of the first vnode hash at
    or after the document's hash, wrapping to the ring minimum); growing
    the ring from 8 to 9 shards must move ONLY documents whose new owner
    is the added shard — the 1/K churn guarantee that justifies
    consistent hashing over mod-K sharding (mod-K would move ~8/9 of the
    corpus). Output: move count, exact ppm, and the only-to-new invariant.
    All comparisons are lowercase-hex md5 strings, lexicographically
    identical on any engine. Plan / 100 TB: the ring is a CONSTANT
    576-row broadcast; assignment is a map-side conditional min per
    document (no shuffle of documents), and one scalar aggregate."""
    d = load_tables(spark, sf_dir)["documents"]
    spark_ = spark
    vn = (
        spark_.range(9 * 64)
        .select(
            (F.col("id") / 64).cast("bigint").alias("shard"),
            (F.col("id") % 64).alias("v"),
        )
        .select(
            "shard",
            F.md5(
                F.concat(
                    F.lit("shard:"),
                    F.col("shard").cast("string"),
                    F.lit(":v:"),
                    F.col("v").cast("string"),
                )
            ).alias("vh"),
        )
    )
    dh = d.select("doc_id", F.md5(F.col("doc_id").cast("string")).alias("h"))

    def assign(vns: DataFrame, name: str) -> DataFrame:
        j = dh.join(F.broadcast(vns), F.lit(True))
        after = F.when(F.col("vh") >= F.col("h"), F.struct("vh", "shard"))
        anyv = F.struct("vh", "shard")
        return j.groupBy("doc_id").agg(
            F.coalesce(F.min(after), F.min(anyv))["shard"].alias(name)
        )

    a8 = assign(vn.filter(F.col("shard") < 8), "shard8")
    a9 = assign(vn, "shard9")
    moved = F.sum(F.when(F.col("shard8") != F.col("shard9"), 1).otherwise(0))
    return (
        a8.join(a9, "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            moved.cast("bigint").alias("n_moved"),
            F.min(
                (F.col("shard8") == F.col("shard9")) | (F.col("shard9") == 8)
            ).alias("moves_only_to_new"),
        )
        .select(
            "n_docs",
            "n_moved",
            F.expr("(n_moved * 1000000) div n_docs")
            .cast("bigint")
            .alias("moved_ppm"),
            "moves_only_to_new",
        )
    )


@query(
    "llm_ngram_coverage_curve",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
    ), g AS (
      SELECT unnest(list_transform(generate_series(1, len(t) - 7),
                                   i -> array_to_string(t[i:i+7], ' ')))
               AS ngram
      FROM t
    ), cnt AS (SELECT ngram, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY ngram),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM cnt),
    rk AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, ngram) AS r FROM cnt
    ), ks AS (SELECT * FROM (VALUES (CAST(10 AS BIGINT)), (CAST(100 AS BIGINT)),
                                    (CAST(1000 AS BIGINT))) v(n_top))
    SELECT k.n_top,
           CAST(coalesce(SUM(CASE WHEN rk.r <= k.n_top THEN rk.c END), 0)
             AS BIGINT) AS covered,
           CAST(MAX(t.total) AS BIGINT) AS total,
           CAST(coalesce(SUM(CASE WHEN rk.r <= k.n_top THEN rk.c END), 0)
             AS DOUBLE) / MAX(t.total) AS coverage
    FROM ks k CROSS JOIN rk CROSS JOIN tot t
    GROUP BY k.n_top
    """,
    tags=("llm", "dedup", "memorization", "coverage"),
)
def llm_ngram_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-text coverage curve (memorization risk): what fraction of
    all 8-gram OCCURRENCES is covered by the top-10 / top-100 / top-1000
    most frequent distinct 8-grams — a steep curve means a few templates
    dominate the corpus (the Lee 2021 observation that motivates
    ExactSubstr dedup), a flat one means natural text. (count desc, ngram)
    is a total order, so each prefix sum is deterministic. Plan / 100 TB:
    one n-gram count aggregate, then each cut is a BOUNDED
    TakeOrderedAndProject heap (k <= 1000) followed by a scalar sum —
    never a global rank over the distinct-gram table."""
    d = load_tables(spark, sf_dir)["documents"]
    grams = curation.word_ngram_counts(d, "text", "doc_id", 8).select("ngram", "cnt")
    cnt = grams.groupBy("ngram").agg(F.sum("cnt").alias("c"))
    tot = cnt.agg(F.sum("c").cast("bigint").alias("total"))
    outs = []
    for n_top in (10, 100, 1000):
        top = cnt.orderBy(F.desc("c"), "ngram").limit(n_top)
        outs.append(
            top.agg(F.sum("c").cast("bigint").alias("covered")).select(
                F.lit(n_top).cast("bigint").alias("n_top"), "covered"
            )
        )
    curve = outs[0].unionAll(outs[1]).unionAll(outs[2])
    return curve.crossJoin(F.broadcast(tot)).select(
        "n_top",
        "covered",
        "total",
        (F.col("covered").cast("double") / F.col("total")).alias("coverage"),
    )
