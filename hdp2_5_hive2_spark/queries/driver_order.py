"""Driver-facing verification order for the correctness corpus.

The external driver verifies queries in ALPHABETICAL name order and has a
bounded per-round budget: rounds 1 and 2 each produced verdicts for exactly
the first 50 alphabetical names. Plain registry names therefore decide WHAT
gets verified, and this module assigns every registry query a zero-padded
numeric prefix (``000_subquery_scalar``) so the alphabetical order the driver
uses IS the priority order we choose.

Round-3 rotation (VERDICT.md r2 "Next round" #1): the union of
CORRECTNESS_r01 + CORRECTNESS_r02 left exactly 46 queries with no driver
verdict ever. Those 46 fill positions 000-045, ordered cheap -> heavy so a
time-capped driver still gets through all of them:

  1. relational surface never verified (subqueries, unions, lateral-outer,
     pivot, views, virtual columns, tablesample, salting, TRANSFORM),
  2. llm text analysis (map-side built-ins, sub-second),
  3. MatchPath PTF + multimodal plumbing (Arrow kernels, ~0.5 s each),
  4. llm dedup / ANN (the heavy Arrow end),
  5. storage round trips (table writes dominate their cost).

Positions 046+ start with the queries whose *implementation changed this
round* and therefore deserve a fresh verdict (q2's broadcast-aggregate fix,
llm_ann_topk's brute-force schema change), then the remaining twice-green
queries alphabetically — re-verification is the lowest-value use of the
driver's budget.

The prefix is presentation-only: `REGISTRY` keys, tests and bench.py keep the
plain names. ``prefixed -> plain`` is recoverable by stripping ``^\\d+_``.
"""

from __future__ import annotations

from hdp2_5_hive2_spark.queries import REGISTRY, QuerySpec

# Tier 1 — the 46 queries with no driver verdict in r01 or r02, cheap first.

_DARK_RELATIONAL = [
    "subquery_correlated_exists",
    "subquery_not_in",
    "subquery_scalar",
    "union_all",
    "union_distinct",
    "lateral_view_outer",
    "pivot_status_by_segment",
    "view_over_view",
    "vc_input_file_name",
    "tablesample_bucket",
    "salted_groupby",
    "transform_script_identity",
    "transform_script_sed",
]

_DARK_LLM_TEXT = [
    "llm_token_count",
    "llm_text_stats",
    "llm_quality_score",
    "llm_lang_id",
    "llm_fingerprint",
    "llm_pii_redact",
    "llm_repetition_stats",
    "llm_top_bigrams",
]

_DARK_PTF_MULTIMODAL = [
    "matchpath_price_runs",
    "matchpath_bounded_runs",
    "matchpath_alternation",
    "matchpath_match_summary",
    "multimodal_meta_sha",
    "multimodal_frame_sample",
    "multimodal_resize_meta",
]

_DARK_LLM_HEAVY = [
    "llm_exact_dedup",
    "llm_embedding_dup_pairs",
    "llm_lsh_ann_topk",
    "llm_ivf_ann_topk",
    "llm_simhash_dedup",
    "llm_minhash_dedup",
    "llm_ngram_jaccard",
]

_DARK_STORAGE = [
    "storage_csv_roundtrip",
    "storage_json_roundtrip",
    "storage_orc_roundtrip",
    "storage_partitioned_roundtrip",
    "storage_compacted_roundtrip",
    "storage_insert_into",
    "storage_union_type",
    "storage_sequencefile_roundtrip",
    "storage_upsert_delete",
    "storage_multi_insert",
    "storage_bucketed_join",
]

_DARK_46 = (
    _DARK_RELATIONAL
    + _DARK_LLM_TEXT
    + _DARK_PTF_MULTIMODAL
    + _DARK_LLM_HEAVY
    + _DARK_STORAGE
)

# Tier 2 — green in a prior round but re-implemented this round; a stale
# verdict no longer covers the shipped code.
_CHANGED_THIS_ROUND = [
    "q2_min_cost_supplier",  # broadcast-aggregate -> window-min rewrite
    "llm_ann_topk",          # brute_force_topk id-schema generalization
]

# Tier 3 — queries added this round (no verdict possible yet); they must
# still land inside the ~50-name driver window.
_NEW_THIS_ROUND = [
    "matchpath_result_exprs",    # MatchPath resultExpr symbol bindings
    "events_stream_stream_join",  # watermarked interval join, batch twin
]

# Tier 4 — added after the 50-name window filled (46 dark + 2 changed + 2
# new). Queued immediately after position 049: verified this round only if
# the driver's budget exceeds 50 names, otherwise they lead the next
# rotation.
_OVERFLOW_THIS_ROUND = [
    "llm_decontaminate",      # eval-set n-gram decontamination
    "llm_dedup_clusters",     # connected-components duplicate clusters
    "llm_stratified_sample",  # deterministic hash-ordered stratified sample
    "fn_mask",                # Hive 2.1 data-masking UDF family
    "llm_corpus_filter",      # composed quality/lang/dedup keep-decision
    "llm_embedding_centroids",  # order-independent quantized vector means
    "llm_knn_classify",       # k-NN majority-vote classification
    "events_asof_join",       # point-in-time merge as-of join
    "events_range_join_bands",  # bucketed range-join rewrite
    "events_session_funnel",  # sessionize -> funnel conversion rollup
    "llm_chunk_documents",    # token chunking with overlap (RAG prep)
    "llm_pack_sequences",     # contiguous packing via distributed prefix sum
    "llm_normalize_text",     # dedup-grade canonicalization hashes
    "llm_url_host_stats",     # URL/host accounting (parse_url pipeline)
    "events_asof_join_forward",  # forward as-of (time-to-first-action)
    "events_asof_join_nearest",  # nearest as-of (dual carry, one shuffle)
    "events_interval_join_incidents",  # interval overlap via bucket join
    "llm_split_assign",       # deterministic hash train/val/test split
    "llm_mixture_rates",      # data-mixing sampling-rate arithmetic
]

_PRIORITY = _DARK_46 + _CHANGED_THIS_ROUND + _NEW_THIS_ROUND + _OVERFLOW_THIS_ROUND


def dark_queries() -> list[str]:
    """The 46 never-driver-verified names (rotation target, r3)."""
    return list(_DARK_46)


def driver_order() -> list[str]:
    """Plain registry names in driver-verification priority order.

    Names listed in the tiers above come first (in that order); anything else
    in the registry — new queries land here until explicitly placed, plus the
    twice-green remainder — follows alphabetically."""
    listed = [n for n in _PRIORITY if n in REGISTRY]
    rest = sorted(n for n in REGISTRY if n not in set(_PRIORITY))
    return listed + rest


def driver_registry() -> dict[str, QuerySpec]:
    """Prefixed-name → spec mapping whose ALPHABETICAL key order equals
    :func:`driver_order` (zero-padded numeric prefixes)."""
    names = driver_order()
    width = max(3, len(str(len(names) - 1)))
    return {f"{i:0{width}d}_{n}": REGISTRY[n] for i, n in enumerate(names)}
