"""Streaming corpus-curation operators: the ingestion-time twins of the
batch LLM-pipeline gates in ``hdp2_5_hive2_spark.llm``.

A training-data pipeline at 100 TB is not rebuilt from scratch per crawl —
new documents ARRIVE, and the dedup/quality gates must decide keep/drop
against everything already ingested without re-scanning the corpus. That is
exactly Structured Streaming's arbitrary-stateful-processing surface
(SURVEY.md §2.11): keeper summaries live in the state store, each
micro-batch is compared against them, and verdicts append exactly once.

Reference scope: the reference engine has no streaming dedup; this extends
its batch semantics (the same MinHash/LSH family as ``llm/dedup.py``) to
incremental ingestion, the gap SURVEY §2.11 assigns to Structured
Streaming.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hdp2_5_hive2_spark.llm.dedup import _MIX, _MIX2, _shingle_list

__all__ = [
    "streaming_minhash_dedup",
    "resolve_dup_verdicts",
    "streaming_image_dedup",
    "resolve_image_verdicts",
]


def _banded_sig_stream(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    n_shingle: int,
) -> DataFrame:
    """(id, band_id, band_hash, sig) rows for a STREAMING document frame:
    the same shingle → multiply-shift-minhash → per-band mix kernel as
    ``llm.dedup._minhash_banded``, but carrying the full signature on every
    banded row (bucket state needs it to estimate Jaccard) and without the
    ``_arrow_fence`` repartition probe (``df.rdd`` is illegal on streams —
    parallelism here comes from the source's file splits and the stateful
    shuffle right after)."""
    a = (
        _MIX * (np.arange(num_hashes, dtype=np.uint64) * np.uint64(2) + np.uint64(1))
    ) | np.uint64(1)
    b = _MIX2 * np.arange(num_hashes, dtype=np.uint64)

    def gen(batches):
        empty = pd.DataFrame(
            {"id": [], "band_id": [], "band_hash": [], "sig": []}
        ).astype({"id": "int64", "band_id": "int32", "band_hash": "int64"})
        for pdf in batches:
            ids: list[int] = []
            offsets: list[int] = []
            flat: list[str] = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                shs = _shingle_list(t, n_shingle)
                if not shs:
                    continue
                ids.append(int(i))
                offsets.append(len(flat))
                flat.extend(shs)
            if not ids:
                yield empty
                continue
            h = pd.util.hash_array(np.asarray(flat, dtype=object))
            off = np.asarray(offsets)
            mins = np.empty((num_hashes, len(ids)), dtype=np.uint64)
            for s in range(num_hashes):
                mins[s] = np.minimum.reduceat(a[s] * h + b[s], off)
            rows_per_band = num_hashes // bands
            bm = mins.reshape(bands, rows_per_band, len(ids))
            bh = bm[:, 0, :].copy()
            for r in range(1, rows_per_band):
                bh = bh * _MIX + bm[:, r, :]
            sigs = [mins[:, j].view(np.int64).tolist() for j in range(len(ids))]
            ids_arr = np.asarray(ids, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "id": np.tile(ids_arr, bands),
                    "band_id": np.repeat(np.arange(bands, dtype=np.int32), len(ids_arr)),
                    "band_hash": bh.reshape(-1).view(np.int64),
                    "sig": sigs * bands,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        gen, "id bigint, band_id int, band_hash bigint, sig array<bigint>"
    )


def streaming_minhash_dedup(
    doc_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    n_shingle: int = 3,
) -> DataFrame:
    """STREAMING MinHash/LSH near-duplicate ingestion gate — the streaming
    twin of ``llm.dedup.minhash_dedup``: documents arrive over micro-batches
    and each is judged against every KEEPER ingested so far, without ever
    re-reading the corpus.

    Composition (all engine-native):
      signature kernel (Arrow, map-side) → groupBy(band_id, band_hash) →
      ``applyInPandasWithState``: bucket state holds the keeper signatures
      that have landed in that bucket; a new document whose estimated
      Jaccard (matching-minhash fraction, the unbiased MinHash estimator)
      against some keeper reaches ``threshold`` is flagged with the
      smallest matching keeper id; novel documents join the bucket state.
      Same-batch arrivals are processed in ``id`` order, so verdicts are
      deterministic and a duplicate pair arriving together resolves to the
      smaller id — matching the batch operator's min-id-keeper convention
      when ingestion order follows id order.

    Returns the PER-BUCKET verdict stream ``(doc_id, dup_of, est_jaccard)``
    — one row per (document, band). The cross-band reduce (dup if ANY
    bucket matched) is one ``groupBy(doc_id)`` away, but a second stateful
    aggregation cannot chain after arbitrary stateful processing without
    event time, so the reduce belongs in the sink's ``foreachBatch`` (a
    document's band rows always share a micro-batch — the reduce is exact
    per batch): pass each batch through :func:`resolve_dup_verdicts`.

    Verification semantics vs the batch operator: the batch gate verifies
    candidates with EXACT Jaccard on shingle sets; re-shingling here would
    mean holding every keeper's shingle set in state (unbounded per doc),
    so the streaming gate uses the signature estimate instead — with 32
    hashes the estimator's σ is ≤0.09, and `tests/test_streaming_corpus.py`
    pins agreement with the batch clusters on planted near-dups.

    100 TB notes: state per keeper per band is one (id, 32×8-byte
    signature) entry ≈ 2 KB/doc across 8 bands — RocksDB state store
    territory at billions of docs (set
    ``spark.sql.streaming.stateStore.providerClass`` accordingly), and the
    per-bucket linear scan is vectorized (one numpy equality over the
    bucket's signature matrix). Hot boilerplate buckets concentrate
    near-identical docs, which is precisely when the FIRST keeper matches
    and the scan exits at one row. Keyspace (band_hash) is uniform, so the
    stateful shuffle is skew-free by construction.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("dup_of", LongType()),
            StructField("est_jaccard", DoubleType()),
        ]
    )
    # keeper ids + row-major flattened signatures (stride = num_hashes):
    # flat arrays keep the state codec trivial and the numpy reshape free.
    state_schema = StructType(
        [
            StructField("ids", ArrayType(LongType())),
            StructField("sigs", ArrayType(LongType())),
        ]
    )
    H = num_hashes
    thr = threshold

    def update(key, pdfs, state: GroupState):
        if state.exists:
            kept_ids, kept_flat = state.get
            kept_ids, kept_flat = list(kept_ids), list(kept_flat)
        else:
            kept_ids, kept_flat = [], []
        arrivals: list[tuple[int, np.ndarray]] = []
        for pdf in pdfs:
            for did, sig in zip(pdf["id"], pdf["sig"]):
                arrivals.append((int(did), np.asarray(sig, dtype=np.int64)))
        arrivals.sort(key=lambda x: x[0])
        out_id, out_dup, out_est = [], [], []
        mat = (
            np.asarray(kept_flat, dtype=np.int64).reshape(-1, H)
            if kept_flat
            else np.empty((0, H), dtype=np.int64)
        )
        for did, sig in arrivals:
            dup_of, est = None, None
            if len(mat):
                frac = (mat == sig).mean(axis=1)
                hits = np.flatnonzero(frac >= thr)
                if len(hits):
                    j = hits[np.argmin(np.asarray(kept_ids)[hits])]
                    dup_of, est = int(kept_ids[j]), float(frac[j])
            if dup_of is None:
                kept_ids.append(did)
                # .tolist() -> plain Python ints: the state row is pickled
                # to the JVM codec, which rejects numpy scalars.
                kept_flat.extend(sig.tolist())
                mat = np.vstack([mat, sig[None, :]])
            out_id.append(did)
            out_dup.append(dup_of)
            out_est.append(est)
        state.update((kept_ids, kept_flat))
        if out_id:
            yield pd.DataFrame(
                {"doc_id": out_id, "dup_of": out_dup, "est_jaccard": out_est}
            )

    banded = _banded_sig_stream(
        doc_stream, text_col, id_col, num_hashes, bands, n_shingle
    )
    return banded.groupBy("band_id", "band_hash").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def resolve_dup_verdicts(band_verdicts: DataFrame) -> DataFrame:
    """Per-document reduce over the gate's per-band verdict rows (run it
    inside ``foreachBatch`` — see :func:`streaming_minhash_dedup`): a
    document is a duplicate if ANY band matched a keeper; ``dup_of`` is the
    smallest matching keeper (min over bands of per-band smallest) and
    ``est_jaccard`` the estimate against that keeper."""
    best = F.min(F.struct("dup_of", "est_jaccard")).alias("best")
    return (
        band_verdicts.where(F.col("dup_of").isNotNull())
        .groupBy("doc_id")
        .agg(best)
        .select("doc_id", "best.dup_of", "best.est_jaccard")
        .join(
            band_verdicts.select("doc_id").distinct(),
            "doc_id",
            "right",
        )
        .select(
            "doc_id",
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of",
            "est_jaccard",
        )
    )


def streaming_image_dedup(
    img_stream: DataFrame,
    payload_col: str = "payload",
    id_col: str = "asset_id",
    max_hamming: int = 6,
) -> DataFrame:
    """STREAMING perceptual image-dedup ingestion gate — the image twin of
    :func:`streaming_minhash_dedup`, built on the dHash family
    (``llm.image_dedup``): image payloads arrive over micro-batches, each
    is decoded + dHashed map-side, and judged against every KEEPER image
    ingested so far via the same band-bucket state-store discipline.

    Composition: Arrow decode/hash pass (payload bytes never shuffle —
    only the four 16-bit bands leave the map side) →
    groupBy(band_id, band_val) → ``applyInPandasWithState``: bucket state
    holds keeper (id, 4-band hash) entries; a new image whose Hamming
    distance to some keeper is ≤ ``max_hamming`` is flagged with the
    closest (then smallest-id) keeper; novel images join the state.
    Same-batch arrivals process in id order → deterministic min-id
    convention, exactly like the text gate.

    Returns per-bucket verdicts ``(asset_id, dup_of, hamming)``; reduce
    per document in the sink's ``foreachBatch`` via
    :func:`resolve_image_verdicts` (same rationale as the text gate: a
    second stateful aggregation cannot chain after arbitrary stateful
    processing without event time).

    100 TB notes: state per keeper per band is (id, 4×8-byte bands) ≈
    40 B — an order of magnitude lighter than the MinHash gate's
    signatures, so billions of images fit a RocksDB state store easily;
    the per-bucket scan is one LUT-popcount over the bucket's hash matrix
    (``llm.image_dedup.hamming_matrix``). Degenerate flat-image buckets
    concentrate identical hashes, which is exactly when the first keeper
    matches and the scan exits at one row.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from hdp2_5_hive2_spark.llm.image_dedup import _to_gray_9x8, dhash_bands, hamming_matrix

    def gen(batches):
        empty = pd.DataFrame(
            {"id": [], "band_id": [], "band_val": [], "h": []}
        ).astype({"id": "int64", "band_id": "int32", "band_val": "int32"})
        for pdf in batches:
            rows = {"id": [], "band_id": [], "band_val": [], "h": []}
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                bands = dhash_bands(_to_gray_9x8(bytes(payload)))
                for bi in range(4):
                    rows["id"].append(int(i))
                    rows["band_id"].append(bi)
                    rows["band_val"].append(bands[bi])
                    rows["h"].append(list(bands))
            yield pd.DataFrame(rows) if rows["id"] else empty

    banded = img_stream.select(id_col, payload_col).mapInPandas(
        gen, "id bigint, band_id int, band_val int, h array<bigint>"
    )

    out_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("dup_of", LongType()),
            StructField("hamming", IntegerType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("ids", ArrayType(LongType())),
            StructField("hashes", ArrayType(LongType())),
        ]
    )
    thr = max_hamming

    def update(key, pdfs, state: GroupState):
        if state.exists:
            kept_ids, kept_flat = state.get
            kept_ids, kept_flat = list(kept_ids), list(kept_flat)
        else:
            kept_ids, kept_flat = [], []
        arrivals = []
        for pdf in pdfs:
            for aid, h in zip(pdf["id"], pdf["h"]):
                arrivals.append((int(aid), np.asarray(h, dtype=np.int64)))
        arrivals.sort(key=lambda x: x[0])
        mat = (
            np.asarray(kept_flat, dtype=np.int64).reshape(-1, 4)
            if kept_flat
            else np.empty((0, 4), dtype=np.int64)
        )
        out_id, out_dup, out_d = [], [], []
        for aid, h in arrivals:
            dup_of, dist = None, None
            if len(mat):
                d = hamming_matrix(mat, h)
                hits = np.flatnonzero(d <= thr)
                if len(hits):
                    ids_h = np.asarray(kept_ids)[hits]
                    order = np.lexsort((ids_h, d[hits]))
                    j = hits[order[0]]
                    dup_of, dist = int(kept_ids[j]), int(d[j])
            if dup_of is None:
                kept_ids.append(aid)
                kept_flat.extend(int(x) for x in h)
                mat = np.vstack([mat, h[None, :]])
            out_id.append(aid)
            out_dup.append(dup_of)
            out_d.append(dist)
        state.update((kept_ids, kept_flat))
        if out_id:
            yield pd.DataFrame(
                {"asset_id": out_id, "dup_of": out_dup, "hamming": out_d}
            )

    return banded.groupBy("band_id", "band_val").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def resolve_image_verdicts(band_verdicts: DataFrame) -> DataFrame:
    """Per-image reduce over the gate's per-band verdicts (run inside
    ``foreachBatch``): duplicate if ANY band matched; ``dup_of`` is the
    closest keeper (ties → smallest id)."""
    best = F.min(F.struct("hamming", "dup_of")).alias("best")
    return (
        band_verdicts.where(F.col("dup_of").isNotNull())
        .groupBy("asset_id")
        .agg(best)
        .select("asset_id", "best.dup_of", "best.hamming")
        .join(band_verdicts.select("asset_id").distinct(), "asset_id", "right")
        .select(
            "asset_id",
            F.col("dup_of").isNotNull().alias("is_dup"),
            "dup_of",
            "hamming",
        )
    )


def streaming_compaction_monitor(
    file_stream: DataFrame,
    target_bytes: int = 4096,
) -> DataFrame:
    """STREAMING shard-compaction monitor — the stateful twin of the batch
    llm_compaction_stream query (queries/pipeline2_corpus.py): shard-file
    arrival events ``(user_id, ts, event_id, bytes)`` stream in per writer;
    each writer's keyed state carries (fill, compactions, files, bytes) and
    a compaction fires whenever the accumulated fill crosses
    ``target_bytes`` (fill resets to 0 — the same greedy fold the batch
    twin runs over the full history). Emits ONE row per writer per
    micro-batch with the RUNNING totals, so the last emission per writer
    equals the batch query's row — the parity contract pinned in
    tests/test_streaming_corpus.py.

    Within a micro-batch, arrivals are processed in (ts, event_id) order —
    deterministic replay, the same discipline as the dedup gate. 100 TB
    notes: state is four ints per writer (RocksDB-trivial); the stateful
    shuffle keys on writer id, the same partitioning the ingest service's
    commit log already has; compaction decisions are made executor-side
    with no driver involvement."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_files", LongType()),
            StructField("total_bytes", LongType()),
            StructField("n_compactions", LongType()),
            StructField("residual_bytes", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n_files", LongType()),
            StructField("total_bytes", LongType()),
            StructField("n_compactions", LongType()),
            StructField("fill", LongType()),
        ]
    )
    tgt = int(target_bytes)

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n_files, total, comp, fill = state.get
        else:
            n_files, total, comp, fill = 0, 0, 0, 0
        rows = []
        for pdf in pdfs:
            for ts, eid, b in zip(pdf["ts"], pdf["event_id"], pdf["bytes"]):
                rows.append((int(ts), int(eid), int(b)))
        rows.sort()
        for _, _, b in rows:
            n_files += 1
            total += b
            fill += b
            if fill >= tgt:
                comp += 1
                fill = 0
        state.update((int(n_files), int(total), int(comp), int(fill)))
        if rows:
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "n_files": [n_files],
                    "total_bytes": [total],
                    "n_compactions": [comp],
                    "residual_bytes": [fill],
                }
            )

    return file_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_interleave_scheduler(event_stream: DataFrame) -> DataFrame:
    """STREAMING weighted-fair interleave scheduler — the stateful twin of
    the batch events_interleave_schedule query (queries/pipeline3_corpus
    .py): events stream in per type; each type's keyed state carries ONE
    integer (items seen so far) and every arrival is stamped with its
    weighted-fair-queueing virtual finish time vkey = i·(6/w) for weights
    purchase:3, click:2, others:1 (LCM 6, exact integers). The realized
    schedule is the (vkey, type, id) total order over the emitted rows —
    the parity test in tests/test_streaming_corpus.py sorts the union of
    all micro-batch emissions and matches the batch query's 30-row cut.

    Within a micro-batch, arrivals are processed in (ts, event_id) order —
    deterministic replay. PRECONDITION (ADVICE r11): ingestion must be
    ts-ordered PER KEY ACROSS triggers — per-stream indices are assigned
    in arrival order, so an event landing in a later trigger with an
    earlier ts than anything already indexed would get a later index than
    the batch twin assigns and silently break vkey parity. The state
    therefore carries the last-seen ts per key and the operator RAISES on
    regression instead of diverging silently; a true late-data deployment
    would front this with a watermark-sorted stage. 100 TB notes: state is
    three ints per stream key (index, has_ts flag, last ts); the stateful shuffle keys on event_type (or
    any finer mux key a real service multiplexes by); vkey assignment is
    executor-side with no driver involvement, and the consumer-side cut is
    a bounded top-k."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("event_id", LongType()),
            StructField("vkey", LongType()),
        ]
    )
    # Explicit has_ts flag instead of a -1 sentinel (ADVICE r12): a
    # legitimate pre-1970 (negative epoch-second) last_ts must survive the
    # state round-trip, or the ts-regression guard silently disarms.
    state_schema = StructType(
        [
            StructField("i", LongType()),
            StructField("has_ts", LongType()),
            StructField("last_ts", LongType()),
        ]
    )
    weights = {"purchase": 3, "click": 2}

    def update(key, pdfs, state: GroupState):
        etype = str(key[0])
        wt = weights.get(etype, 1)
        step = 6 // wt
        i, has_ts, last_ts = state.get if state.exists else (0, 0, 0)
        if not has_ts:
            last_ts = None  # key seen but nothing indexed yet
        rows = []
        for pdf in pdfs:
            for ts, eid in zip(pdf["ts"], pdf["event_id"]):
                rows.append((int(ts), int(eid)))
        rows.sort()
        if rows and last_ts is not None and rows[0][0] < last_ts:
            raise ValueError(
                f"interleave scheduler key {etype!r}: trigger delivered "
                f"ts {rows[0][0]} < last indexed ts {last_ts} — "
                "in-order-per-key ingestion precondition violated "
                "(vkey parity with the batch twin no longer holds)"
            )
        out_ids, out_keys = [], []
        for ts, eid in rows:
            i += 1
            last_ts = ts
            out_ids.append(eid)
            out_keys.append(i * step)
        state.update(
            (
                int(i),
                1 if last_ts is not None else 0,
                int(last_ts) if last_ts is not None else 0,
            )
        )
        if out_ids:
            yield pd.DataFrame(
                {
                    "event_type": [etype] * len(out_ids),
                    "event_id": out_ids,
                    "vkey": out_keys,
                }
            )

    return event_stream.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_burstiness_monitor(event_stream: DataFrame) -> DataFrame:
    """STREAMING per-user burstiness monitor — the stateful twin of the
    batch events_interarrival_burstiness query (queries/pipeline4_corpus
    .py): events stream in per user (``user_id bigint, ts bigint`` epoch
    SECONDS, ``event_id bigint``); keyed state carries an
    explicit has_ts flag plus the four sufficient statistics (last_ts,
    n_gaps, Σgap, Σgap²) and every
    trigger re-emits the user's current exact-integer CoV² verdict once
    it clears the >= 10-gap floor — the online bot-screen / rate-limiter
    feed, maintained in O(1) state per user with no reprocessing. The
    emitted (n_gaps, s1, s2, cov2_milli, is_bursty) row after the final
    trigger equals the batch query's row for that user exactly (parity
    test in tests/test_streaming_corpus.py).

    PRECONDITION (same contract as streaming_interleave_scheduler,
    ADVICE r11): ingestion must be ts-ordered PER KEY ACROSS triggers —
    gaps are differences of consecutive arrivals, so a late event with an
    earlier ts would silently corrupt every subsequent gap. The operator
    RAISES on ts regression instead of diverging. Seconds, not
    microseconds: gap² at microsecond resolution overflows int64 at
    realistic event spacing (the r11 pre-probe finding). 100 TB notes:
    state is five ints per user; the stateful shuffle keys on user_id
    (the stream's natural key); emission is append-mode, so downstream
    consumers read the latest row per user."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_gaps", LongType()),
            StructField("s1", LongType()),
            StructField("s2", LongType()),
            StructField("cov2_milli", LongType()),
            StructField("is_bursty", LongType()),
        ]
    )
    # Explicit has_ts flag instead of a -1 sentinel (ADVICE r12): a
    # legitimate pre-1970 (negative epoch-second) last_ts must survive the
    # state round-trip, or the ts-regression guard silently disarms and the
    # cross-trigger gap is dropped (stats would diverge from the batch twin).
    state_schema = StructType(
        [
            StructField("has_ts", LongType()),
            StructField("last_ts", LongType()),
            StructField("n_gaps", LongType()),
            StructField("s1", LongType()),
            StructField("s2", LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        uid = int(key[0])
        if state.exists:
            has_ts, last_ts, n, s1, s2 = state.get
        else:
            has_ts, last_ts, n, s1, s2 = 0, 0, 0, 0, 0
        if not has_ts:
            last_ts = None  # key seen but nothing ingested yet
        rows = []
        for pdf in pdfs:
            for ts, eid in zip(pdf["ts"], pdf["event_id"]):
                rows.append((int(ts), int(eid)))
        rows.sort()
        if rows and last_ts is not None and rows[0][0] < last_ts:
            raise ValueError(
                f"burstiness monitor user {uid}: trigger delivered "
                f"ts {rows[0][0]} < last ingested ts {last_ts} — "
                "in-order-per-key ingestion precondition violated "
                "(gap statistics would silently corrupt)"
            )
        for ts, _ in rows:
            if last_ts is not None:
                g = ts - last_ts
                n += 1
                s1 += g
                s2 += g * g
            last_ts = ts
        state.update(
            (
                1 if last_ts is not None else 0,
                int(last_ts) if last_ts is not None else 0,
                int(n),
                int(s1),
                int(s2),
            )
        )
        if rows and n >= 10 and s1 > 0:
            cov2 = (n * s2 - s1 * s1) * 1000 // (s1 * s1)
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "n_gaps": [n],
                    "s1": [s1],
                    "s2": [s2],
                    "cov2_milli": [cov2],
                    "is_bursty": [1 if n * s2 > 2 * s1 * s1 else 0],
                }
            )

    return event_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_session_gap_monitor(event_stream: DataFrame) -> DataFrame:
    """STREAMING per-user session-gap monitor — the stateful twin of the
    batch events_session_gap_sweep query (queries/pipeline5_corpus.py):
    events stream in per user (``user_id bigint, ts bigint`` epoch
    SECONDS, ``event_id bigint``); keyed state carries (has_ts, last_ts)
    plus the three gap-over counters for thresholds 1800/3600/7200 s, and
    every trigger re-emits the user's current counts — the online
    sessionizer-calibration feed. Aggregating the LAST emission per user
    as n_users + Σ counter reproduces the batch sweep's n_sessions row
    for each threshold exactly (parity test in
    tests/test_streaming_corpus.py).

    Same contracts as streaming_burstiness_monitor: explicit has_ts flag
    (a pre-1970 negative last_ts must survive the state round-trip —
    ADVICE r12, applied at design time), and ingestion must be ts-ordered
    PER KEY ACROSS triggers — the operator RAISES on ts regression
    instead of silently missing or inventing session boundaries.
    100 TB notes: state is five ints per user keyed on the stream's
    natural shuffle key; thresholds are compile-time constants so each
    arrival is three compares — no window, no re-scan."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("c1800", LongType()),
            StructField("c3600", LongType()),
            StructField("c7200", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("has_ts", LongType()),
            StructField("last_ts", LongType()),
            StructField("c1800", LongType()),
            StructField("c3600", LongType()),
            StructField("c7200", LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        uid = int(key[0])
        if state.exists:
            has_ts, last_ts, c18, c36, c72 = state.get
        else:
            has_ts, last_ts, c18, c36, c72 = 0, 0, 0, 0, 0
        if not has_ts:
            last_ts = None  # key seen but nothing ingested yet
        rows = []
        for pdf in pdfs:
            for ts, eid in zip(pdf["ts"], pdf["event_id"]):
                rows.append((int(ts), int(eid)))
        rows.sort()
        if rows and last_ts is not None and rows[0][0] < last_ts:
            raise ValueError(
                f"session gap monitor user {uid}: trigger delivered "
                f"ts {rows[0][0]} < last ingested ts {last_ts} — "
                "in-order-per-key ingestion precondition violated "
                "(session boundaries would silently shift)"
            )
        for ts, _ in rows:
            if last_ts is not None:
                g = ts - last_ts
                c18 += 1 if g > 1800 else 0
                c36 += 1 if g > 3600 else 0
                c72 += 1 if g > 7200 else 0
            last_ts = ts
        state.update(
            (
                1 if last_ts is not None else 0,
                int(last_ts) if last_ts is not None else 0,
                int(c18),
                int(c36),
                int(c72),
            )
        )
        if rows:
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "c1800": [c18],
                    "c3600": [c36],
                    "c7200": [c72],
                }
            )

    return event_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
