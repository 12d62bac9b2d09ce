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
from hdp2_5_hive2_spark.llm.text import plan_checkpoint
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
    identical on any engine. Plan / 100 TB: the ring is CONSTANT — its
    576 (vnode-hash, shard) pairs are computed driver-side (hashlib on
    576 strings, no Spark job) and ride into ONE Arrow pass as two
    sorted numpy arrays; each document's owner on both rings is a
    np.searchsorted binary probe (first vnode hash >= doc hash, wrap to
    index 0), so there is ZERO row fan-out and zero shuffle before the
    final scalar aggregate. (Until round 11 this was a 576x
    broadcast-nested-loop fan-out + per-doc min — correct and
    constant-factor, but the VERDICT r10 polish note names this exact
    rewrite.) Document hashes stay JVM-side codegen md5 — the Arrow
    kernel never hashes (the standing AST ban)."""
    import hashlib as _hashlib

    import numpy as np
    import pandas as pd

    d = load_tables(spark, sf_dir)["documents"]
    ring = sorted(
        (_hashlib.md5(f"shard:{sh}:v:{v}".encode()).hexdigest(), sh)
        for sh in range(9)
        for v in range(64)
    )
    vh9 = np.asarray([h for h, _ in ring])
    sh9 = np.asarray([sh for _, sh in ring], dtype=np.int64)
    m8 = sh9 < 8
    vh8, sh8 = vh9[m8], sh9[m8]

    def owners(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            h = pdf["h"].to_numpy()
            i8 = np.searchsorted(vh8, h, side="left")
            i9 = np.searchsorted(vh9, h, side="left")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "shard8": sh8[i8 % len(vh8)],
                    "shard9": sh9[i9 % len(vh9)],
                }
            )

    dh = d.select("doc_id", F.md5(F.col("doc_id").cast("string")).alias("h"))
    assigned = dh.mapInPandas(
        owners, "doc_id bigint, shard8 bigint, shard9 bigint"
    )
    moved = F.sum(F.when(F.col("shard8") != F.col("shard9"), 1).otherwise(0))
    return (
        assigned
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
    # cnt feeds the total agg and three top-N cuts — materialize once
    cnt = plan_checkpoint(grams.groupBy("ngram").agg(F.sum("cnt").alias("c")))
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


@query(
    "llm_contamination_position",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id, i - 1 AS p, len(t) - 7 AS n_pos,
             array_to_string(t[i:i+7], ' ') AS g
      FROM t, unnest(generate_series(1, len(t) - 7)) u(i)
    ), ev AS (
      SELECT DISTINCT g FROM pos WHERE doc_id % 29 = 0
    ), hits AS (
      SELECT p.doc_id, (p.p * 10) // p.n_pos AS decile
      FROM pos p JOIN ev USING (g)
      WHERE p.doc_id % 29 <> 0
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_hits,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM hits GROUP BY decile
    """,
    tags=("llm", "curation", "contamination", "position"),
)
def llm_contamination_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination position heatmap: eval-matching 8-gram hit positions
    bucketed into relative-position deciles of each train document —
    leakage concentrated in decile 0 means contaminated HEADERS (license
    blocks, shared prompts), a flat profile means full-document copies;
    the two need different remediation (header strip vs drop). The decile
    is exact integer arithmetic ((0-based position × 10) div n_positions).
    Same positional-gram window device as llm_contamination_spans
    (per-document ROWS window, never global); the eval join is the
    decontaminate broadcast shape. 100 TB: everything is keyed by doc_id
    until the final 10-row aggregate."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("idx", "tok"),
    )
    w8 = Window.partitionBy("doc_id").orderBy("idx").rowsBetween(0, 7)
    wd = Window.partitionBy("doc_id")
    grams = (
        toks.withColumn("g", F.concat_ws(" ", F.collect_list("tok").over(w8)))
        .withColumn("_n", F.count("tok").over(w8))
        .filter(F.col("_n") == 8)
        .withColumn("n_pos", F.count(F.lit(1)).over(wd))
        .select("doc_id", "idx", "n_pos", "g")
    )
    ev = grams.filter(F.col("doc_id") % 29 == 0).select("g").distinct()
    hits = (
        grams.filter(F.col("doc_id") % 29 != 0)
        .join(ev, "g")
        .select("doc_id", F.expr("(idx * 10) div n_pos").alias("decile"))
    )
    return hits.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )


@query(
    "llm_span_dedup_mask",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id, i AS idx, len(t) AS n_tokens,
             array_to_string(t[i:i+7], ' ') AS g
      FROM t, unnest(generate_series(1, len(t) - 7)) u(i)
    ), ev AS (
      SELECT DISTINCT g FROM pos WHERE doc_id % 29 = 0
    ), hits AS (
      SELECT p.doc_id, p.idx, p.n_tokens FROM pos p JOIN ev USING (g)
      WHERE p.doc_id % 29 <> 0
    ), cov AS (
      SELECT doc_id, n_tokens,
             least(8, coalesce(lead(idx) OVER (PARTITION BY doc_id
                                               ORDER BY idx) - idx, 8)) AS c
      FROM hits
    )
    SELECT doc_id,
           CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(c) AS BIGINT) AS masked_tokens,
           CAST(((MAX(n_tokens) - SUM(c)) * 1000) // MAX(n_tokens) AS BIGINT)
             AS retained_milli
    FROM cov GROUP BY doc_id
    """,
    tags=("llm", "curation", "contamination", "masking"),
)
def llm_span_dedup_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-masking cost audit: if every eval-matching 8-gram window were
    masked out of the training document (the span-removal remedy, Lee
    2021 §4), how many tokens survive? The masked-token union is computed
    WITHOUT materializing intervals: sorted hit starts contribute
    least(8, next_start - start) each (last contributes 8) — the exact
    size of the union of [start, start+7] windows, one per-document
    window pass. retained_milli is exact integer thousandths. 100 TB:
    per-document windows only; the hit derivation is the decontaminate
    broadcast join."""
    d = load_tables(spark, sf_dir)["documents"]
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("idx", "tok"),
    )
    n_tok = d.select("doc_id", token_count("text").alias("n_tokens"))
    w8 = Window.partitionBy("doc_id").orderBy("idx").rowsBetween(0, 7)
    grams = (
        toks.withColumn("g", F.concat_ws(" ", F.collect_list("tok").over(w8)))
        .withColumn("_n", F.count("tok").over(w8))
        .filter(F.col("_n") == 8)
        .select("doc_id", "idx", "g")
    )
    ev = grams.filter(F.col("doc_id") % 29 == 0).select("g").distinct()
    hits = grams.filter(F.col("doc_id") % 29 != 0).join(ev, "g").select(
        "doc_id", "idx"
    )
    wd = Window.partitionBy("doc_id").orderBy("idx")
    cov = hits.withColumn(
        "c",
        F.least(F.lit(8), F.coalesce(F.lead("idx").over(wd) - F.col("idx"), F.lit(8))),
    )
    per = cov.groupBy("doc_id").agg(F.sum("c").alias("masked"))
    return (
        per.join(n_tok, "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("masked").cast("bigint").alias("masked_tokens"),
            F.expr("((n_tokens - masked) * 1000) div n_tokens")
            .cast("bigint")
            .alias("retained_milli"),
        )
    )


@query(
    "llm_dedup_threshold_sweep",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents WHERE doc_id < 120
    ), corpus AS (
      SELECT doc_id, array_to_string(t, ' ') AS text FROM base
      UNION ALL
      SELECT doc_id + 2000000, array_to_string(t[1:len(t)-1], ' ')
      FROM base WHERE doc_id < 40 AND len(t) >= 10
      UNION ALL
      SELECT doc_id + 4000000, array_to_string(t[1:(3*len(t))//4], ' ')
      FROM base WHERE doc_id < 40 AND len(t) >= 16
    ), t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM corpus
    ), ngd AS (
      SELECT DISTINCT doc_id, ngram FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(t) - 7),
                                     i -> array_to_string(t[i:i+7], ' ')))
                 AS ngram
        FROM t
      )
    ), na AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ngd GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS i
      FROM ngd a JOIN ngd b USING (ngram)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), j AS (
      SELECT inter.i, x.n AS na, y.n AS nb
      FROM inter JOIN na x ON x.doc_id = inter.da
                 JOIN na y ON y.doc_id = inter.db
    ), thr AS (SELECT * FROM (VALUES (CAST(70 AS BIGINT)), (CAST(80 AS BIGINT)),
                                     (CAST(90 AS BIGINT))) v(thr_pct))
    SELECT t.thr_pct,
           CAST(coalesce(SUM(CASE WHEN j.i * 100 >= t.thr_pct
                                       * (j.na + j.nb - j.i)
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_pairs
    FROM thr t LEFT JOIN j ON true
    GROUP BY t.thr_pct
    """,
    tags=("llm", "dedup", "jaccard", "threshold"),
)
def llm_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold sensitivity: exact 8-gram Jaccard pair counts at
    0.7 / 0.8 / 0.9 on a capped audit sample (doc_id < 120) extended with
    two planted perturbation bands — a copy missing its final token
    (Jaccard ≈ (n−1)/n, survives every threshold) and a copy truncated to
    its first three quarters (Jaccard ≈ 0.75·n/(n), lands between 0.7 and
    0.9 depending on length) — so the curve has mass at every scale and
    the audit actually separates the thresholds (the curve a curation
    team reads before fixing the production LSH threshold). The Jaccard
    test is integer cross-multiplication (i·100 >= thr·(na+nb−i)) — no
    float ratios. Candidate pairs come from the co-gram join (only pairs
    sharing ≥1 gram can pass any threshold ≥ 0.7), never an all-pairs
    product; empty candidate sets still emit all three thresholds with
    zero counts (LEFT join against the threshold table). 100 TB: this is
    the documented capped-sample audit; the production path at full scale
    is llm_setsim_join's prefix-filtered PPJoin with the same integer
    threshold test."""
    base = (
        load_tables(spark, sf_dir)["documents"]
        .filter(F.col("doc_id") < 120)
        .select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t"))
    )
    corpus = (
        base.select("doc_id", F.concat_ws(" ", "t").alias("text"))
        .unionAll(
            base.filter((F.col("doc_id") < 40) & (F.size("t") >= 10)).select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat_ws(" ", F.expr("slice(t, 1, size(t) - 1)")).alias("text"),
            )
        )
        .unionAll(
            base.filter((F.col("doc_id") < 40) & (F.size("t") >= 16)).select(
                (F.col("doc_id") + 4000000).alias("doc_id"),
                F.concat_ws(" ", F.expr("slice(t, 1, (3 * size(t)) div 4)")).alias(
                    "text"
                ),
            )
        )
    )
    # ngd feeds the per-doc size agg and both self-join sides —
    # materialize the Arrow n-gram pass once (guide §3.3)
    ngd = plan_checkpoint(curation.word_ngram_rows(corpus, "text", "doc_id", 8))
    na = ngd.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a, b = ngd.alias("a"), ngd.alias("b")
    inter = (
        a.join(b, "ngram")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("da"), F.col("b.id").alias("db"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    j = (
        inter.join(na.withColumnRenamed("id", "da").withColumnRenamed("n", "na"), "da")
        .join(na.withColumnRenamed("id", "db").withColumnRenamed("n", "nb"), "db")
        .select("i", "na", "nb")
    )
    thr = spark.createDataFrame([(70,), (80,), (90,)], "thr_pct bigint")
    return (
        F.broadcast(thr)
        .join(j, F.lit(True), "left")
        .groupBy("thr_pct")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("i") * 100
                        >= F.col("thr_pct") * (F.col("na") + F.col("nb") - F.col("i")),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_pairs")
        )
    )


@query(
    "llm_temperature_sweep",
    oracle="""
    WITH c AS (
      SELECT source,
             CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ), t AS (SELECT CAST(MAX(n_tokens) AS BIGINT) AS n_max FROM c),
    temps AS (SELECT * FROM (VALUES ('t100'), ('t050'), ('t025')) v(t_label))
    SELECT tp.t_label, c.source, c.n_tokens,
           CASE tp.t_label
             WHEN 't100' THEN CAST(c.n_tokens AS DOUBLE) / t.n_max
             WHEN 't050' THEN sqrt(CAST(c.n_tokens AS DOUBLE) / t.n_max)
             ELSE sqrt(sqrt(CAST(c.n_tokens AS DOUBLE) / t.n_max))
           END AS w_rel,
           CAST(floor(CASE tp.t_label
             WHEN 't100' THEN CAST(c.n_tokens AS DOUBLE) / t.n_max
             WHEN 't050' THEN sqrt(CAST(c.n_tokens AS DOUBLE) / t.n_max)
             ELSE sqrt(sqrt(CAST(c.n_tokens AS DOUBLE) / t.n_max))
           END * 1000.0) AS BIGINT) AS quota_per_1k_of_max
    FROM temps tp CROSS JOIN c CROSS JOIN t
    """,
    tags=("llm", "curation", "mixture", "temperature"),
)
def llm_temperature_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sweep of the mixture-flattening rule (p_s ∝ n_s^T) at
    T ∈ {1, 1/2, 1/4}, on TOKEN counts: the side-by-side table a mixture
    planner reads to pick how hard to flatten (T=1 is proportional replay,
    lower T up-weights small sources). Exactness discipline: T=1/2 and
    T=1/4 are sqrt and sqrt∘sqrt — each a correctly-rounded single IEEE op
    — over ONE exact integer division by the max source, so every double
    is a fixed chain both engines reproduce bitwise (the r6 relative-form
    device; a Σ n^T normalizer would be an order-dependent float sum).
    100 TB: one map-side token count per source; everything after is
    mixture-sized."""
    d = load_tables(spark, sf_dir)["documents"]
    c = d.groupBy("source").agg(F.sum(token_count("text")).alias("n_tokens"))
    t = c.agg(F.max("n_tokens").alias("n_max"))
    temps = spark.createDataFrame([("t100",), ("t050",), ("t025",)], "t_label string")
    r = F.col("n_tokens").cast("double") / F.col("n_max").cast("double")
    w = (
        F.when(F.col("t_label") == "t100", r)
        .when(F.col("t_label") == "t050", F.sqrt(r))
        .otherwise(F.sqrt(F.sqrt(r)))
    )
    return (
        F.broadcast(temps)
        .crossJoin(c)
        .crossJoin(F.broadcast(t))
        .select(
            "t_label",
            "source",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            w.alias("w_rel"),
            F.floor(w * F.lit(1000.0)).cast("bigint").alias("quota_per_1k_of_max"),
        )
    )


@query(
    "llm_rank_stability",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN ('spark', 'join', 'window', 'table', 'query', 'merge')
      GROUP BY doc_id, term
    ), sa AS (
      SELECT doc_id,
             CAST(SUM((CASE term WHEN 'spark' THEN 3 WHEN 'join' THEN 2
                        WHEN 'window' THEN 2 WHEN 'table' THEN 1
                        WHEN 'query' THEN 1 ELSE 0 END)
                      * least(tf, 5)) AS BIGINT) AS score
      FROM tf GROUP BY doc_id
    ), sb AS (
      SELECT doc_id,
             CAST(SUM((CASE term WHEN 'query' THEN 3 WHEN 'table' THEN 2
                        WHEN 'merge' THEN 2 WHEN 'spark' THEN 1
                        WHEN 'join' THEN 1 ELSE 0 END)
                      * least(tf, 5)) AS BIGINT) AS score
      FROM tf GROUP BY doc_id
    ), ra AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
      FROM sa QUALIFY r <= 15
    ), rb AS (
      SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
      FROM sb QUALIFY r <= 15
    ), common AS (
      SELECT ra.doc_id, ra.r AS r_a, rb.r AS r_b FROM ra JOIN rb USING (doc_id)
    ), pairs AS (
      SELECT CASE WHEN (x.r_a - y.r_a) * (x.r_b - y.r_b) > 0 THEN 1 ELSE 0 END
               AS conc
      FROM common x JOIN common y ON x.doc_id < y.doc_id
    )
    SELECT CAST((SELECT count(*) FROM common) AS BIGINT) AS n_common,
           CAST(coalesce(SUM(conc), 0) AS BIGINT) AS concordant,
           CAST(coalesce(SUM(1 - conc), 0) AS BIGINT) AS discordant,
           CAST(CASE WHEN count(*) > 0
                     THEN ((SUM(conc) - SUM(1 - conc)) * 1000) // count(*)
                     ELSE 0 END AS BIGINT) AS tau_milli
    FROM pairs
    """,
    tags=("llm", "retrieval", "eval", "rank-correlation"),
)
def llm_rank_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-correlation audit between two retrieval runs (Kendall tau over
    the common top-15): run A is the llm_splade_topk weight vector, run B
    re-weights the query ({query:3, table:2, merge:2, spark:1, join:1}) —
    the weight-perturbation stability check an eval harness runs before
    trusting a single learned-sparse ranking. Both runs are pure-int64
    saturated-impact scores; ranks are distinct (row_number under a total
    order) so there are no ties and tau = (C − D)/(C + D), reported in
    exact integer thousandths (floor division, truncation toward zero on
    both engines). 100 TB: each run is the splade posting-list plan with a
    bounded top-15 heap; the pair stage joins two 15-row frames — O(k²)
    on k=15, nothing corpus-sized."""
    d = load_tables(spark, sf_dir)["documents"]
    run_a = retrieval.splade_topk(
        d, [("spark", 3), ("join", 2), ("window", 2), ("table", 1), ("query", 1)],
        topk=15,
    ).select("doc_id", F.col("rank").alias("r_a"))
    run_b = retrieval.splade_topk(
        d, [("query", 3), ("table", 2), ("merge", 2), ("spark", 1), ("join", 1)],
        topk=15,
    ).select("doc_id", F.col("rank").alias("r_b"))
    # common feeds the triangular pair join (twice) and the n_common agg —
    # materialize once or BOTH splade runs execute three times (guide §3.3)
    common = plan_checkpoint(run_a.join(run_b, "doc_id"))
    x, y = common.alias("x"), common.alias("y")
    pairs = x.join(y, F.col("x.doc_id") < F.col("y.doc_id")).select(
        F.when(
            (F.col("x.r_a") - F.col("y.r_a")) * (F.col("x.r_b") - F.col("y.r_b")) > 0,
            1,
        )
        .otherwise(0)
        .alias("conc")
    )
    n_common = common.agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    return (
        pairs.agg(
            F.coalesce(F.sum("conc"), F.lit(0)).cast("bigint").alias("concordant"),
            F.coalesce(F.sum(1 - F.col("conc")), F.lit(0))
            .cast("bigint")
            .alias("discordant"),
            F.count(F.lit(1)).alias("_np"),
        )
        .crossJoin(F.broadcast(n_common))
        .select(
            "n_common",
            "concordant",
            "discordant",
            F.when(F.col("_np") > 0,
                   F.expr("((concordant - discordant) * 1000) div _np"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("tau_milli"),
        )
    )


@query(
    "llm_cluster_size_powerlaw",
    oracle="WITH RECURSIVE " + _ngram_cte(15) + """
    , rare AS (SELECT ngram FROM ngd GROUP BY ngram HAVING count(*) <= 100),
    e0 AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM ngd a JOIN ngd b USING (ngram) JOIN rare USING (ngram)
           WHERE a.doc_id < b.doc_id),
    e AS (SELECT da AS s, db AS d FROM e0 UNION SELECT db, da FROM e0),
    v AS (SELECT DISTINCT s AS id FROM e),
    walk AS (
      SELECT id, id AS lab FROM v
      UNION
      SELECT e.d AS id, w.lab FROM walk w JOIN e ON e.s = w.id
    ), cc AS (
      SELECT id, min(lab) AS rep FROM walk GROUP BY id
    ), sizes AS (
      SELECT rep, CAST(count(*) AS BIGINT) AS sz FROM cc GROUP BY rep
    )
    SELECT CAST(length(bin(sz)) - 1 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs
    FROM sizes GROUP BY bucket
    """,
    tags=("llm", "dedup", "graph", "powerlaw"),
)
def llm_cluster_size_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution in power-of-two buckets
    (bucket = floor(log2(size)) computed EXACTLY as the binary-digit count
    minus one — no float log): the shape check on the dedup graph before
    choosing a survivorship policy. A heavy 2^4+ tail means template farms
    (cluster-collapse saves big); all-singleton-pairs means near-dup
    removal barely pays. Same edges as llm_dedup_clusters_star (16-gram
    buckets, df <= 100) and the same label-propagation CC operator the
    cluster queries pin. 100 TB: bounded-round CC over bucketed edges;
    the histogram is cluster-count-sized."""
    d = load_tables(spark, sf_dir)["documents"]
    edges = curation.shared_ngram_edges(d, n=16, max_df=100)
    cc = curation.connected_components(edges)
    sizes = cc.groupBy("cluster_rep").agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.select(
            (F.length(F.bin("sz")) - 1).cast("bigint").alias("bucket"), "sz"
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("sz").cast("bigint").alias("n_docs"),
        )
    )


def _twocore_oracle(rounds: int) -> str:
    """Chained-CTE oracle for the synchronized 2-core peel: round r keeps
    nodes with degree >= 2 in the round-(r-1) induced subgraph and filters
    edges to kept endpoints. Generated mechanically so the Spark loop and
    the SQL run EXACTLY the same number of synchronized rounds — results
    match by construction whether or not the peel has converged (and the
    convergence test in tests/test_llm.py pins that it HAS, at the shipped
    scales)."""
    parts = [
        "WITH " + _ngram_cte(15),
        """
    , rare AS (SELECT ngram FROM ngd GROUP BY ngram HAVING count(*) <= 100),
    e0 AS MATERIALIZED (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           FROM ngd a JOIN ngd b USING (ngram) JOIN rare USING (ngram)
           WHERE a.doc_id < b.doc_id)
    """,
    ]
    prev = "e0"
    for r in range(1, rounds + 1):
        parts.append(f"""
    , k{r} AS MATERIALIZED (
      SELECT node FROM (
        SELECT da AS node FROM {prev} UNION ALL SELECT db FROM {prev}
      ) GROUP BY node HAVING count(*) >= 2
    ), e{r} AS MATERIALIZED (
      SELECT e.da, e.db FROM {prev} e
      JOIN k{r} x ON x.node = e.da JOIN k{r} y ON y.node = e.db
    )""")
        prev = f"e{r}"
    parts.append(f"""
    SELECT node AS doc_id, CAST(count(*) AS BIGINT) AS core_deg FROM (
      SELECT da AS node FROM {prev} UNION ALL SELECT db FROM {prev}
    ) GROUP BY node
    """)
    return "".join(parts)


@query(
    "llm_dup_graph_2core",
    oracle=_twocore_oracle(12),
    tags=("llm", "dedup", "graph", "kcore"),
)
def llm_dup_graph_2core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the duplicate graph (iterative degree peel): nodes that
    survive repeated removal of degree-<2 vertices — the subgraph where
    duplication is MUTUALLY corroborated (trees/pendant edges are one
    shared quote; the 2-core is template farms and copy rings, the part
    of the graph worth cluster-collapsing). Peeling runs 12 SYNCHRONIZED
    rounds on both engines (each round: recompute degrees in the induced
    subgraph, keep nodes with degree >= 2, filter edges to kept
    endpoints), so Spark and the chained-CTE oracle agree by construction;
    the convergence pytest pins that 12 rounds reach the true fixpoint at
    the shipped scales. Same edge derivation as llm_dedup_clusters_star
    (16-gram buckets, df <= 100). 100 TB: each round is two
    semi-joins keyed on node ids over an only-shrinking edge list, the
    same bounded-round discipline as connected_components; lineage is cut
    every round (localCheckpoint) so the plan stays flat."""
    d = load_tables(spark, sf_dir)["documents"]
    edges = curation.shared_ngram_edges(d, n=16, max_df=100).transform(
        plan_checkpoint
    )
    for _ in range(12):
        nodes = edges.select(F.col("doc_a").alias("node")).unionAll(
            edges.select(F.col("doc_b").alias("node"))
        )
        keep = (
            nodes.groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= 2)
            .select("node")
        )
        edges = (
            edges.join(keep.withColumnRenamed("node", "doc_a"), "doc_a")
            .join(keep.withColumnRenamed("node", "doc_b"), "doc_b")
            .select("doc_a", "doc_b")
            .transform(plan_checkpoint)
        )
    nodes = edges.select(F.col("doc_a").alias("doc_id")).unionAll(
        edges.select(F.col("doc_b").alias("doc_id"))
    )
    return nodes.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("core_deg")
    )


@query(
    "llm_mixture_interleave",
    oracle="""
    WITH w AS (
      SELECT * FROM (VALUES ('src0', CAST(3 AS BIGINT)),
                            ('src1', CAST(2 AS BIGINT)),
                            ('src2', CAST(1 AS BIGINT))) v(source, wt)
    ), items AS (
      SELECT d.source, d.doc_id, w.wt,
             row_number() OVER (
               PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR) || ':ord'), d.doc_id
             ) AS i
      FROM documents d JOIN w USING (source)
    ), keyed AS (
      SELECT source, doc_id, CAST(i * (6 // wt) AS BIGINT) AS vkey FROM items
    )
    SELECT CAST(pos AS BIGINT) AS pos, source, doc_id, vkey FROM (
      SELECT source, doc_id, vkey,
             row_number() OVER (ORDER BY vkey, source, doc_id) AS pos
      FROM keyed
    ) WHERE pos <= 30
    """,
    tags=("llm", "curation", "mixture", "schedule"),
)
def llm_mixture_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-fair interleaved mixture schedule: three sources with
    integer weights 3:2:1 emit documents in md5-shuffled order; item i of
    a weight-w source carries virtual time i·(LCM/w) (LCM = 6, so every
    key is an exact integer — the weighted-fair-queueing finish-time rule)
    and the realized schedule is the first 30 positions of the (vkey,
    source, doc_id) total order. Guarantees each prefix of the schedule
    tracks the 3:2:1 ratio within one item per source — the interleaving
    property data loaders need so no training window sees a source drought.
    100 TB: the per-source index window is PARTITIONED by source; the
    global cut is TakeOrderedAndProject (bounded 30-row heap) + the
    window-free bounded_rank for positions."""
    d = load_tables(spark, sf_dir)["documents"]
    w = spark.createDataFrame(
        [("src0", 3), ("src1", 2), ("src2", 1)], "source string, wt bigint"
    )
    ws = Window.partitionBy("source").orderBy("pri", "doc_id")
    items = (
        d.join(F.broadcast(w), "source")
        .select(
            "source",
            "doc_id",
            "wt",
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":ord"))).alias(
                "pri"
            ),
        )
        .withColumn("i", F.row_number().over(ws))
        .select(
            "source", "doc_id", F.expr("i * (6 div wt)").cast("bigint").alias("vkey")
        )
    )
    top = items.orderBy("vkey", "source", "doc_id").limit(30)
    ranked = retrieval.bounded_rank(
        top.withColumn(
            "_tie", F.struct(F.col("source").alias("s"), F.col("doc_id").alias("d"))
        ),
        "vkey",
        "_tie",
        ascending=True,
    )
    return ranked.select(
        F.col("rank").cast("bigint").alias("pos"), "source", "doc_id", "vkey"
    )


_QINT_CTE = """
    WITH qe AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> floor(x * 1024)) AS qv
      FROM embeddings
    )
"""


@query(
    "llm_recall_curve",
    oracle=_QINT_CTE
    + """
    , cents AS (
      SELECT vec_id AS cid, qv FROM qe WHERE vec_id >= 8 AND vec_id % 17 = 8
    ), corpus AS (SELECT vec_id, qv FROM qe WHERE vec_id >= 8),
    queries AS (SELECT vec_id, qv FROM qe WHERE vec_id < 8),
    c_cell AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT c.vec_id, ct.cid,
               row_number() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY list_dot_product(c.qv, ct.qv) DESC, ct.cid
               ) AS rk
        FROM corpus c CROSS JOIN cents ct
      ) WHERE rk = 1
    ), q_cell AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT q.vec_id, ct.cid,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.qv, ct.qv) DESC, ct.cid
               ) AS rk
        FROM queries q CROSS JOIN cents ct
      ) WHERE rk = 1
    ), exact AS (
      SELECT query_id, neighbor_id, rk FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_dot_product(c.qv, q.qv) DESC, c.vec_id
               ) AS rk
        FROM corpus c CROSS JOIN queries q
      ) WHERE rk <= 10
    ), approx AS (
      SELECT query_id, neighbor_id, rk FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_dot_product(c.qv, q.qv) DESC, c.vec_id
               ) AS rk
        FROM queries q
        JOIN q_cell qc ON qc.vec_id = q.vec_id
        JOIN c_cell cc ON cc.cell = qc.cell
        JOIN corpus c ON c.vec_id = cc.vec_id
      ) WHERE rk <= 10
    ), ks AS (SELECT * FROM (VALUES (CAST(1 AS BIGINT)), (CAST(5 AS BIGINT)),
                                    (CAST(10 AS BIGINT))) v(k))
    SELECT e.query_id, k.k,
           CAST(SUM(CASE WHEN a.rk IS NOT NULL AND a.rk <= k.k
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           CAST(SUM(CASE WHEN a.rk IS NOT NULL AND a.rk <= k.k
                         THEN 1 ELSE 0 END) AS DOUBLE) / k.k AS recall
    FROM ks k CROSS JOIN exact e
    LEFT JOIN approx a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    WHERE e.rk <= k.k
    GROUP BY e.query_id, k.k
    """,
    tags=("llm", "similarity", "ann", "recall", "ivf"),
)
def llm_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k curve (k = 1/5/10) of a single-probe deterministic-IVF
    index against exact integer-dot ground truth: the acceptance curve an
    ANN rollout reads — recall@1 collapsing while recall@10 holds means
    near-boundary cells, a uniformly low curve means too few probes. The
    coarse book is every 17th corpus vector (llm.similarity
    .quantized_cell_assign: id-sorted broadcast book, exact int64 dots,
    first-max = smallest-id tie-break), candidates are the query's single
    cell, and both rankings share llm_ndcg_eval's quantized-dot total
    order ((dot desc, id) — no float ties to adjudicate). 100 TB: corpus
    assignment is one Arrow matmul against a constant-size broadcast book
    (raise-guarded); the candidate join is cell-keyed; the exact side is
    quantized_dot_topk's broadcast-queries shape; nothing all-pairs except
    the 8-query ground-truth scan the audit inherently needs."""
    e = load_tables(spark, sf_dir)["embeddings"]
    corpus = e.filter(F.col("vec_id") >= 8)
    queries = e.filter(F.col("vec_id") < 8)
    cents = corpus.filter(F.col("vec_id") % 17 == 8)
    c_cell = similarity.quantized_cell_assign(corpus, cents)
    q_cell = similarity.quantized_cell_assign(queries, cents)
    cand = (
        q_cell.withColumnRenamed("vec_id", "query_id")
        .join(c_cell.withColumnRenamed("vec_id", "neighbor_id"), "cell")
        .select("query_id", "neighbor_id")
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
    wq = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    approx = (
        scored.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= 10)
        .select("query_id", "neighbor_id", F.col("rk").alias("a_rk"))
    )
    exact = similarity.quantized_dot_topk(corpus, queries, k=10).select(
        "query_id", "neighbor_id", F.col("rank").alias("e_rk")
    )
    ks = spark.createDataFrame([(1,), (5,), (10,)], "k bigint")
    hit = F.sum(
        F.when(F.col("a_rk").isNotNull() & (F.col("a_rk") <= F.col("k")), 1).otherwise(
            0
        )
    )
    return (
        F.broadcast(ks)
        .crossJoin(exact)
        .join(approx, ["query_id", "neighbor_id"], "left")
        .filter(F.col("e_rk") <= F.col("k"))
        .groupBy("query_id", "k")
        .agg(
            hit.cast("bigint").alias("n_hits"),
            (hit.cast("double") / F.col("k")).alias("recall"),
        )
    )


@query(
    "llm_opq_rotation_audit",
    oracle="""
    WITH dims AS (
      SELECT j,
             CAST(('0x' || substring(md5('perm:' || j), 1, 8)) AS BIGINT) AS h,
             CASE WHEN CAST(('0x' || substring(md5('sign:' || j), 1, 8))
                    AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sgn
      FROM generate_series(0, 63) t(j)
    ), perm AS (
      SELECT a.j, a.sgn,
             CAST((SELECT count(*) FROM dims b
                   WHERE b.h < a.h OR (b.h = a.h AND b.j <= a.j)) - 1
               AS BIGINT) AS pos
      FROM dims a
    ), q AS (
      SELECT vec_id, i - 1 AS dim,
             CAST(floor(CAST(embedding AS DOUBLE[])[i] * 1024) AS BIGINT) AS q
      FROM embeddings, unnest(generate_series(1, 64)) u(i)
    ), raw_b AS (
      SELECT vec_id,
             CAST(SUM(CASE WHEN q > 0 THEN 1 ELSE 0 END
                      * (CAST(1 AS BIGINT) << CAST(dim AS INT))) AS BIGINT)
               AS bucket
      FROM q WHERE dim < 8 GROUP BY vec_id
    ), rot_b AS (
      SELECT vec_id,
             CAST(SUM(CASE WHEN p.sgn * q.q > 0 THEN 1 ELSE 0 END
                      * (CAST(1 AS BIGINT) << CAST(p.pos AS INT))) AS BIGINT)
               AS bucket
      FROM q JOIN perm p ON p.j = q.dim
      WHERE p.pos < 8 GROUP BY vec_id
    ), stats AS (
      SELECT 'raw' AS variant, bucket, count(*) AS c FROM raw_b GROUP BY bucket
      UNION ALL
      SELECT 'rotated', bucket, count(*) FROM rot_b GROUP BY bucket
    )
    SELECT variant,
           CAST(SUM(c) AS BIGINT) AS n_vecs,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(MAX(c) AS BIGINT) AS max_bucket,
           CAST(SUM(c * c) AS BIGINT) AS sum_sq
    FROM stats GROUP BY variant
    """,
    tags=("llm", "similarity", "quantize", "rotation"),
)
def llm_opq_rotation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ-style rotation audit: does an orthogonal transform balance the
    sign-code buckets? The rotation is a SIGNED PERMUTATION (md5-ranked
    dimension reorder + md5-derived per-dimension sign flips) — exactly
    orthogonal and exactly integer (r[perm(j)] = sgn_j·q_j permutes and
    flips the floor(v·1024) codes unchanged), so the audit is bit-stable
    on any engine while testing the same thing OPQ's learned rotation is
    tested on: occupancy skew of the leading-8-bit sign codes before vs
    after (n_buckets used, max bucket, Σcount² — the collision mass that
    drives Hamming-probe cost). Extends llm_sign_code_balance (the
    before-only audit). 100 TB: the permutation is a 64-row broadcast
    (rank via a 64×64 self-join count, no global window); buckets are one
    map-side shift-OR aggregate per vector over dims < 8."""
    e = load_tables(spark, sf_dir)["embeddings"]
    q = e.select(
        "vec_id",
        F.posexplode(similarity.as_double_array("embedding")).alias("dim", "v"),
    ).select(
        "vec_id", "dim", F.floor(F.col("v") * 1024).cast("bigint").alias("q")
    )
    dims = spark.range(64).select(
        F.col("id").alias("j"),
        F.conv(F.substring(F.md5(F.concat(F.lit("perm:"), F.col("id").cast("string"))), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h"),
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("sign:"), F.col("id").cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % 2
            == 0,
            1,
        )
        .otherwise(-1)
        .alias("sgn"),
    )
    a, b = dims.alias("a"), dims.alias("b")
    perm = (
        a.join(
            F.broadcast(b),
            (F.col("b.h") < F.col("a.h"))
            | ((F.col("b.h") == F.col("a.h")) & (F.col("b.j") <= F.col("a.j"))),
        )
        .groupBy(F.col("a.j").alias("j"), F.col("a.sgn").alias("sgn"))
        .agg((F.count(F.lit(1)) - 1).cast("bigint").alias("pos"))
    )
    raw_b = (
        q.filter(F.col("dim") < 8)
        .withColumn("bit", F.when(F.col("q") > 0, 1).otherwise(0))
        .groupBy("vec_id")
        .agg(
            F.sum(F.expr("bit * shiftleft(CAST(1 AS BIGINT), CAST(dim AS INT))"))
            .cast("bigint")
            .alias("bucket")
        )
    )
    rot_b = (
        q.join(F.broadcast(perm), F.col("dim") == F.col("j"))
        .filter(F.col("pos") < 8)
        .withColumn("bit", F.when(F.col("sgn") * F.col("q") > 0, 1).otherwise(0))
        .groupBy("vec_id")
        .agg(
            F.sum(F.expr("bit * shiftleft(CAST(1 AS BIGINT), CAST(pos AS INT))"))
            .cast("bigint")
            .alias("bucket")
        )
    )
    stats = (
        raw_b.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.lit("raw").alias("variant"), "bucket", "c")
        .unionAll(
            rot_b.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("c"))
            .select(F.lit("rotated").alias("variant"), "bucket", "c")
        )
    )
    return stats.groupBy("variant").agg(
        F.sum("c").cast("bigint").alias("n_vecs"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.max("c").cast("bigint").alias("max_bucket"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_sq"),
    )


@query(
    "llm_mmr_diversify",
    oracle=_QINT_CTE.replace("WITH qe", "WITH RECURSIVE qe")
    + """
    , corpus AS (SELECT vec_id, qv FROM qe WHERE vec_id >= 8),
    qv0 AS (SELECT qv FROM qe WHERE vec_id = 0),
    scored AS (
      SELECT c.vec_id, CAST(list_dot_product(c.qv, q.qv) AS BIGINT) AS rel
      FROM corpus c CROSS JOIN qv0 q
    ),
    pool AS MATERIALIZED (
      SELECT vec_id, rel FROM scored ORDER BY rel DESC, vec_id LIMIT 12
    ),
    sims AS MATERIALIZED (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             CAST(list_dot_product(x.qv, y.qv) AS BIGINT) AS s
      FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
      JOIN corpus x ON x.vec_id = a.vec_id
      JOIN corpus y ON y.vec_id = b.vec_id
    ),
    sel AS (
      (SELECT CAST(1 AS BIGINT) AS step, vec_id,
              CAST(2 * rel AS BIGINT) AS mmr, [vec_id] AS chosen
       FROM pool ORDER BY rel DESC, vec_id LIMIT 1)
      UNION ALL
      SELECT s.step + 1, nxt.vec_id, nxt.mmr, list_append(s.chosen, nxt.vec_id)
      FROM sel s, LATERAL (
        SELECT p.vec_id,
               CAST(2 * p.rel - (SELECT MAX(sm.s) FROM sims sm
                                 WHERE sm.ia = p.vec_id
                                   AND list_contains(s.chosen, sm.ib))
                 AS BIGINT) AS mmr
        FROM pool p
        WHERE NOT list_contains(s.chosen, p.vec_id)
        ORDER BY mmr DESC, p.vec_id
        LIMIT 1
      ) nxt
      WHERE s.step < 6
    )
    SELECT step, vec_id, mmr FROM sel
    """,
    tags=("llm", "retrieval", "diversity", "mmr"),
)
def llm_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diversification (Carbonell–Goldstein
    1998) with λ = 2/3 kept EXACT by scaling: 3·MMR = 2·rel − max-sim, all
    int64 quantized dots, greedy pick 6 of a 12-candidate pool (pool =
    quantized_dot_topk vs query vector 0; step 1 scores 2·rel, later steps
    subtract the max similarity to the already-chosen set; ties go to the
    smaller id). The re-ranking layer result diversification needs above
    plain top-k — near-duplicate neighbors of the first pick drop behind
    fresh regions of the embedding space. Oracle: the same greedy fold as
    a recursive CTE carrying the chosen set as a LIST column (the
    cumulative set, NOT just the previous row — the r9 probe's finding).
    100 TB: the pool is a bounded top-k (broadcast-query kernel); the
    greedy loop runs in ONE applyInPandas group over the 132 directed pool
    pairs — bounded by construction at pool²; nothing corpus-sized past
    the top-k cut."""
    import pandas as pd

    e = load_tables(spark, sf_dir)["embeddings"]
    corpus = e.filter(F.col("vec_id") >= 8)
    q0 = e.filter(F.col("vec_id") == 0)
    # pool feeds the vec prune and the rel join; vecs feeds both pair
    # sides — materialize each once (guide §3.3)
    pool = similarity.quantized_dot_topk(corpus, q0, k=12).select(
        F.col("neighbor_id").alias("vec_id"), F.col("dot").alias("rel")
)
    pool = plan_checkpoint(pool)
    vecs = plan_checkpoint(
        corpus.join(pool.select("vec_id"), "vec_id").select(
            "vec_id", similarity.as_double_array("embedding").alias("v")
        )
    )
    a = vecs.select(F.col("vec_id").alias("ia"), F.col("v").alias("qv"))
    b = vecs.select(F.col("vec_id").alias("ib"), F.col("v").alias("cv"))
    prs = a.join(F.broadcast(b), F.col("ia") != F.col("ib"))
    sims = similarity.quantized_pair_dots(prs, dot_name="s")
    frame = sims.join(
        F.broadcast(pool.withColumnRenamed("vec_id", "ia")), "ia"
    ).withColumn("_g", F.lit(1))

    def greedy(pdf: "pd.DataFrame") -> "pd.DataFrame":
        rel = {int(i): int(r) for i, r in zip(pdf["ia"], pdf["rel"])}
        sim = {
            (int(i), int(j)): int(s)
            for i, j, s in zip(pdf["ia"], pdf["ib"], pdf["s"])
        }
        chosen: list[int] = []
        out = []
        for step in range(1, 7):
            best, best_m = None, None
            for p in sorted(rel):
                if p in chosen:
                    continue
                m = 2 * rel[p] - (
                    max(sim[(p, c)] for c in chosen) if chosen else 0
                )
                if best is None or m > best_m:
                    best, best_m = p, m
            if best is None:
                break
            out.append((step, best, best_m))
            chosen.append(best)
        return pd.DataFrame(out, columns=["step", "vec_id", "mmr"])

    return frame.groupBy("_g").applyInPandas(
        greedy, "step bigint, vec_id bigint, mmr bigint"
    )


@query(
    "llm_packing_contamination",
    oracle="WITH RECURSIVE " + _ngram_cte(7) + """
    , ev AS (SELECT DISTINCT ngram FROM ngd WHERE doc_id % 29 = 0),
    contam AS (
      SELECT DISTINCT n.doc_id FROM ngd n JOIN ev USING (ngram)
      WHERE n.doc_id % 29 <> 0
    ), t AS (
      SELECT doc_id // 64 AS chunk, doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS nt,
             row_number() OVER (PARTITION BY doc_id // 64 ORDER BY doc_id)
               AS rn
      FROM documents
    ), pack AS (
      SELECT chunk, rn, doc_id, 0 AS bin_idx, nt AS fill
      FROM t WHERE rn = 1
      UNION ALL
      SELECT t.chunk, t.rn, t.doc_id,
             CASE WHEN p.fill + t.nt > 512 THEN p.bin_idx + 1
                  ELSE p.bin_idx END,
             CASE WHEN p.fill + t.nt > 512 THEN t.nt
                  ELSE p.fill + t.nt END
      FROM pack p JOIN t ON t.chunk = p.chunk AND t.rn = p.rn + 1
    ), member AS (
      SELECT p.chunk, p.bin_idx, p.doc_id,
             (c.doc_id IS NOT NULL) AS contam
      FROM pack p LEFT JOIN contam c USING (doc_id)
    ), bins AS (
      SELECT chunk, bin_idx,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN contam THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
             CAST(SUM(CASE WHEN contam THEN 0 ELSE 1 END) AS BIGINT) AS n_ok
      FROM member GROUP BY chunk, bin_idx
    )
    SELECT CAST(chunk AS BIGINT) AS chunk,
           CAST(count(*) AS BIGINT) AS n_bins,
           CAST(SUM(CASE WHEN n_bad > 0 AND n_ok > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_mixed_bins,
           CAST(SUM(CASE WHEN n_bad > 0 THEN n_ok ELSE 0 END) AS BIGINT)
             AS n_exposed_docs
    FROM bins GROUP BY chunk
    """,
    tags=("llm", "packing", "contamination"),
)
def llm_packing_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-contamination through sequence packing: when contaminated
    documents (train docs sharing an 8-gram with the doc_id%29 eval set —
    the decontaminate derivation) are packed into 512-token bins with
    clean ones, every clean bin-mate trains inside a contaminated
    attention window. Per 64-doc packing chunk: bin count, bins mixing
    contaminated and clean docs, and clean docs so exposed — the
    measurement that motivates masking/ordering fixes BEFORE packing.
    Composes the llm_pack_greedy_bins fold (same chunk sharding, here
    emitting bin MEMBERSHIP) with the decontaminate join. 100 TB: the
    packing shuffle carries (chunk, doc_id, nt) only; the contamination
    side is the broadcast eval-gram join; output is chunk-count-sized."""
    import pandas as pd

    d = load_tables(spark, sf_dir)["documents"]
    grams = curation.word_ngram_rows(d, "text", "doc_id", 8)
    ev = grams.filter(F.col("id") % 29 == 0).select("ngram").distinct()
    contam = (
        grams.filter(F.col("id") % 29 != 0)
        .join(ev, "ngram")
        .select(F.col("id").alias("doc_id"))
        .distinct()
        .withColumn("contam", F.lit(True))
    )
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
        for did, t in zip(pdf["doc_id"], pdf["nt"]):
            t = int(t)
            if ndocs > 0 and fill + t > 512:
                bin_idx, fill, ndocs = bin_idx + 1, 0, 0
            out.append((chunk, bin_idx, int(did)))
            fill += t
            ndocs += 1
        return pd.DataFrame(out, columns=["chunk", "bin_idx", "doc_id"])

    member = toks.groupBy("chunk").applyInPandas(
        pack, "chunk bigint, bin_idx bigint, doc_id bigint"
    )
    flagged = member.join(contam, "doc_id", "left").select(
        "chunk", "bin_idx", F.coalesce("contam", F.lit(False)).alias("contam")
    )
    bins = flagged.groupBy("chunk", "bin_idx").agg(
        F.sum(F.when(F.col("contam"), 1).otherwise(0)).alias("n_bad"),
        F.sum(F.when(F.col("contam"), 0).otherwise(1)).alias("n_ok"),
    )
    return bins.groupBy("chunk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum(F.when((F.col("n_bad") > 0) & (F.col("n_ok") > 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_mixed_bins"),
        F.sum(F.when(F.col("n_bad") > 0, F.col("n_ok")).otherwise(0))
        .cast("bigint")
        .alias("n_exposed_docs"),
    )


@query(
    "llm_compaction_stream",
    oracle="""
    WITH RECURSIVE f AS (
      SELECT user_id, (event_id % 997) + 64 AS bytes,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ), fold AS (
      SELECT user_id, rn, bytes,
             CASE WHEN bytes >= 4096 THEN 1 ELSE 0 END AS comp,
             CASE WHEN bytes >= 4096 THEN 0 ELSE bytes END AS fill
      FROM f WHERE rn = 1
      UNION ALL
      SELECT f.user_id, f.rn, f.bytes,
             CASE WHEN p.fill + f.bytes >= 4096 THEN p.comp + 1
                  ELSE p.comp END,
             CASE WHEN p.fill + f.bytes >= 4096 THEN 0
                  ELSE p.fill + f.bytes END
      FROM fold p JOIN f ON f.user_id = p.user_id AND f.rn = p.rn + 1
    ), last AS (
      SELECT user_id, comp, fill,
             row_number() OVER (PARTITION BY user_id ORDER BY rn DESC) AS rk
      FROM fold
    )
    SELECT f.user_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(SUM(f.bytes) AS BIGINT) AS total_bytes,
           CAST(MAX(l.comp) AS BIGINT) AS n_compactions,
           CAST(MAX(l.fill) AS BIGINT) AS residual_bytes
    FROM f JOIN last l ON l.user_id = f.user_id AND l.rk = 1
    GROUP BY f.user_id
    """,
    tags=("llm", "storage", "compaction", "streaming-twin"),
)
def llm_compaction_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-ordered shard-compaction accounting — the BATCH twin of the
    stateful streaming monitor (streaming.corpus.streaming_compaction
    _monitor, parity-pinned in tests/test_streaming_corpus.py): shard
    files arrive per writer (user_id) in (ts, event_id) order with
    deterministic sizes ((event_id % 997) + 64 bytes); a writer's fill
    accumulates until it crosses the 4096-byte target, which fires a
    compaction and resets the fill — the running decision a streaming
    ingest service makes per micro-batch, here folded over the full
    history. Output per writer: files, bytes, compactions fired, residual
    fill. The fold is inherently sequential PER KEY, so it runs as
    applyInPandas per user (keyed state, the applyInPandasWithState shape
    in batch form); the oracle is the same fold as a recursive CTE.
    100 TB: keyed by writer — groups are writer-history-sized, exactly
    the state the streaming monitor holds; nothing global anywhere."""
    import pandas as pd

    ev = load_tables(spark, sf_dir)["events"]
    f = ev.select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") % 997) + 64).cast("bigint").alias("bytes"),
    )

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts", "event_id"])
        uid = int(pdf["user_id"].iloc[0])
        fill, comp, total = 0, 0, 0
        for b in pdf["bytes"]:
            b = int(b)
            total += b
            fill += b
            if fill >= 4096:
                comp += 1
                fill = 0
        return pd.DataFrame(
            [(uid, len(pdf), total, comp, fill)],
            columns=[
                "user_id", "n_files", "total_bytes", "n_compactions",
                "residual_bytes",
            ],
        )

    return f.groupBy("user_id").applyInPandas(
        fold,
        "user_id bigint, n_files bigint, total_bytes bigint, "
        "n_compactions bigint, residual_bytes bigint",
    )
