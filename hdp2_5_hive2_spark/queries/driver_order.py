"""Driver-facing verification order for the correctness corpus.

The external driver verifies queries in ALPHABETICAL name order and has a
bounded per-round budget (~50 names/round in rounds 1-3). Plain registry
names therefore decide WHAT gets verified, and this module assigns every
registry query a zero-padded numeric prefix (``000_events_asof_join``) so the
alphabetical order the driver uses IS the priority order we choose.

Round-4 rotation: the union of CORRECTNESS_r01 + r02 + r03 covers 140
distinct queries, all green — the only never-verified names are the 19
round-3 overflow queries (added after the r3 window filled). Those 19 fill
positions 000-018, cheap -> heavy. Positions 019+ hold queries ADDED in
round 4 (no verdict possible yet), then the remaining thrice/twice/once-green
registry alphabetically — re-verification is the lowest-value use of the
driver's budget.

The prefix is presentation-only: `REGISTRY` keys, tests and bench.py keep the
plain names. ``prefixed -> plain`` is recoverable by stripping ``^\\d+_``.
"""

from __future__ import annotations

from hdp2_5_hive2_spark.queries import REGISTRY, QuerySpec

# Tier 1 — the 19 queries with no driver verdict in r01-r03 (the round-3
# overflow queue), cheap map-side ops first, multi-shuffle graph/join ops last.

_DARK_R4 = [
    # pure map-side / single-shuffle column ops
    "llm_normalize_text",
    "llm_split_assign",
    "fn_mask",
    "llm_url_host_stats",
    "llm_chunk_documents",
    # single-agg / small-join ops
    "llm_mixture_rates",
    "llm_stratified_sample",
    "llm_corpus_filter",
    "llm_embedding_centroids",
    "llm_pack_sequences",
    # as-of / range / interval join family
    "events_asof_join",
    "events_asof_join_forward",
    "events_asof_join_nearest",
    "events_range_join_bands",
    "events_interval_join_incidents",
    "events_session_funnel",
    # heavy Arrow / iterative end
    "llm_knn_classify",
    "llm_decontaminate",
    "llm_dedup_clusters",
]

# Tier 2 — queries added in round 4 (no verdict possible yet). Keep this list
# in sync as operators land; they must sit inside the ~50-name window.
_NEW_THIS_ROUND: list[str] = [
    # retrieval statistics + curation (llm/retrieval.py, llm/curation.py)
    "llm_tfidf_topterms",
    "llm_bm25_rank",
    "llm_vocab_coverage",
    "llm_bigram_novelty",
    "llm_weighted_sample",
    "llm_cross_dedup",
    # ANALYZE TABLE column-stats parity (stats.py)
    "analyze_table_stats",
    "analyze_ndv_sketch",
    # storage: Hive default TEXTFILE layout + DROP PARTITION DDL
    "storage_textfile_roundtrip",
    "storage_drop_partition",
    # LM scoring / vectorization / sub-document dedup
    "llm_bigram_lm_score",
    "llm_feature_hashing",
    "llm_chunk_dedup",
    # chained LATERAL VIEWs + int8 vector quantization
    "lateral_view_chained",
    "llm_embedding_quantize",
    # HAVING-subquery + cohort retention
    "subquery_in_having",
    "events_retention_cohorts",
    # integer-exact rate anomalies + per-source curation loss funnel
    "events_anomaly_minutes",
    "llm_curation_report",
    # end-to-end MinHash -> connected-components near-dedup pipeline
    "llm_minhash_clusters",
    # binary-asset exact dedup (payloads never shuffle)
    "multimodal_payload_dedup",
    # parquet schema evolution on read (mergeSchema)
    "storage_schema_evolution",
    # per-language tokenizer fertility (token-budget planning)
    "llm_tokenizer_fertility",
    # RegexSerDe (tables over raw log lines)
    "storage_regex_serde",
    # correlated scalar subqueries in SELECT (decorrelated outer aggregates)
    "subquery_correlated_scalar",
    # dataset-card release statistics (one-row corpus summary)
    "llm_dataset_card",
    # top session paths (deterministic ordered aggregation)
    "events_session_paths",
    # engagement/churn/provenance analytics (window positions 046-049)
    "events_dau_wau",
    "events_churned_users",
    "llm_cross_source_dups",
    "events_transition_matrix",
]

# Tier 3 — green in a prior round but re-implemented this round; a stale
# verdict no longer covers the shipped code.
_CHANGED_THIS_ROUND: list[str] = []

# Tier 4 — added after the 50-name window filled (19 dark + 31 new =
# positions 000-049). Queued immediately after position 049: verified this
# round only if the driver's budget exceeds 50 names, otherwise they lead
# the round-5 rotation (the same mechanism round 3 used for its nineteen).
_OVERFLOW_THIS_ROUND: list[str] = [
    "llm_contamination_by_source",  # eval-overlap provenance breakdown
    "llm_token_length_histogram",   # power-of-two doc-length distribution
]

_PRIORITY = _DARK_R4 + _NEW_THIS_ROUND + _CHANGED_THIS_ROUND + _OVERFLOW_THIS_ROUND


def dark_queries() -> list[str]:
    """The 19 never-driver-verified names (rotation target, r4)."""
    return list(_DARK_R4)


def driver_order() -> list[str]:
    """Plain registry names in driver-verification priority order.

    Names listed in the tiers above come first (in that order); anything else
    in the registry — new queries land here until explicitly placed, plus the
    multi-green remainder — follows alphabetically."""
    listed = [n for n in _PRIORITY if n in REGISTRY]
    rest = sorted(n for n in REGISTRY if n not in set(_PRIORITY))
    return listed + rest


def driver_registry() -> dict[str, QuerySpec]:
    """Prefixed-name → spec mapping whose ALPHABETICAL key order equals
    :func:`driver_order` (zero-padded numeric prefixes)."""
    names = driver_order()
    width = max(3, len(str(len(names) - 1)))
    return {f"{i:0{width}d}_{n}": REGISTRY[n] for i, n in enumerate(names)}
