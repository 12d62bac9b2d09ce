"""The streaming MinHash ingestion gate must agree with its batch twin:
originals stream in first and become keepers in the band-bucket state;
planted near-dups arriving in a LATER micro-batch must be flagged against
those round-1 keepers (i.e. the verdict depends on cross-trigger state, not
just the current batch), with the min-id keeper convention the batch
operator uses."""

from __future__ import annotations

import os
import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hdp2_5_hive2_spark.catalog import load_tables
from hdp2_5_hive2_spark.llm.dedup import _shingle_list
from hdp2_5_hive2_spark.streaming import (
    resolve_dup_verdicts,
    streaming_minhash_dedup,
)
from tests.conftest import SF_CORRECT

OFFSET = 1_000_000


@pytest.fixture(scope="module")
def planted(spark):
    """(originals_pdf, near_pdf): docs with ≥20 tokens (so a dropped last
    token keeps true jaccard ≥ 17/18 ≈ 0.94 — comfortably above the 0.8
    gate even through 32-hash estimator noise) and their last-token-dropped
    near-duplicates at doc_id + OFFSET."""
    d = load_tables(spark, SF_CORRECT)["documents"].filter(F.col("doc_id") < 200)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    d = d.filter(F.size(toks) >= 20)
    near = d.select(
        (F.col("doc_id") + OFFSET).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 1, F.size(toks) - 1)).alias("text"),
    )
    return (
        d.select("doc_id", "text").toPandas(),
        near.toPandas(),
    )


def _run_gate(spark, files, **gate_kw):
    """Write each pandas frame in ``files`` as one mtime-ordered parquet
    file, stream them one file per trigger through the gate, and return the
    per-batch resolved verdicts [(batch_id, pandas_frame), ...]."""
    tmp = Path(tempfile.mkdtemp(prefix="stream_dedup_"))
    src = tmp / "in"
    src.mkdir()
    try:
        for i, pdf in enumerate(files):
            p = str(src / f"b{i}.parquet")
            pdf.to_parquet(p, index=False)
            os.utime(p, (1_700_000_000 + 100 * i,) * 2)
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        gate = streaming_minhash_dedup(stream, **gate_kw)
        out: list[tuple[int, object]] = []

        def sink(bdf, bid):
            pdf = resolve_dup_verdicts(bdf).toPandas()
            if len(pdf):
                out.append((int(bid), pdf))

        q = gate.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
        assert q.awaitTermination(300), "stream timed out (300s)"
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = set(_shingle_list(a, n)), set(_shingle_list(b, n))
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


def test_streaming_gate_flags_planted_dups_across_triggers(spark, planted):
    originals, near = planted
    batches = _run_gate(spark, [originals, near])

    # keepers and dups arrived in different files → different micro-batches
    assert len(batches) >= 2, "file source must deliver multiple triggers"
    by_doc = {}
    for bid, pdf in batches:
        for row in pdf.itertuples():
            by_doc[int(row.doc_id)] = (
                bid,
                bool(row.is_dup),
                None if row.dup_of is None or row.dup_of != row.dup_of else int(row.dup_of),
            )
    assert set(by_doc) == set(originals["doc_id"]) | set(near["doc_id"])

    # cross-trigger state: planted dups must be flagged against the keeper
    # ingested in an EARLIER batch, with the exact original as dup_of
    orig_batch = max(by_doc[int(i)][0] for i in originals["doc_id"])
    hits = 0
    for i in near["doc_id"]:
        bid, is_dup, dup_of = by_doc[int(i)]
        assert bid > orig_batch or not is_dup
        if is_dup and dup_of == int(i) - OFFSET:
            hits += 1
    recall = hits / len(near)
    assert recall >= 0.9, f"planted recall {recall}"

    # keeper convention + soundness: every flag points at a smaller id, and
    # any non-planted flag is a genuine near-dup (exact jaccard on shingle
    # sets — the same verification the batch operator applies)
    text_of = {
        int(r.doc_id): r.text
        for pdf in (originals, near)
        for r in pdf.itertuples()
    }
    for did, (_, is_dup, dup_of) in by_doc.items():
        if not is_dup:
            continue
        assert dup_of is not None and dup_of < did
        if dup_of != did - OFFSET:
            j = _jaccard(text_of[did], text_of[dup_of])
            assert j >= 0.5, f"false flag {did}->{dup_of} (jaccard {j:.2f})"


def test_streaming_kernel_matches_batch_kernel(spark, planted):
    """The streaming signature kernel must live in the SAME hash space as
    the batch kernel (identical (id, band_id, band_hash) rows on identical
    input): a corpus deduped in batch and then continued incrementally by
    the streaming gate must agree on every bucket assignment, or the
    incremental path would silently re-admit known duplicates."""
    from hdp2_5_hive2_spark.llm.dedup import _minhash_banded
    from hdp2_5_hive2_spark.streaming.corpus import _banded_sig_stream

    originals, _ = planted
    df = spark.createDataFrame(originals)
    batch_rows = {
        (r.id, r.band_id, r.band_hash)
        for r in _minhash_banded(df, "text", "doc_id", 32, 8, 3).collect()
    }
    # the streaming kernel is plan-compatible with batch frames too — run it
    # on the same static frame to compare outputs exactly
    stream_df = _banded_sig_stream(df, "text", "doc_id", 32, 8, 3)
    stream_rows = {(r.id, r.band_id, r.band_hash) for r in stream_df.collect()}
    assert batch_rows == stream_rows
    # and the carried signature is the full minhash vector, band-invariant
    sig_len = {len(r.sig) for r in stream_df.limit(50).collect()}
    assert sig_len == {32}


def test_streaming_gate_rocksdb_state_store(spark, planted):
    """The 100 TB path: keeper state in the RocksDB state store (the
    provider the docstring prescribes for billions of docs) must produce
    exactly the verdicts the default HDFS-backed store produces. This
    converts the docstring's scale note into a tested contract — the state
    codec round-trips through RocksDB, not just the in-memory map."""
    originals, near = planted
    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        batches = _run_gate(spark, [originals, near])
    finally:
        if before is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, before)
    flags = {
        int(r.doc_id): int(r.dup_of)
        for _, pdf in batches
        for r in pdf.itertuples()
        if bool(r.is_dup)
    }
    hits = sum(1 for i in near["doc_id"] if flags.get(int(i)) == int(i) - OFFSET)
    assert hits / len(near) >= 0.9


def test_streaming_gate_state_survives_restart(spark, planted):
    """Fault tolerance: keepers ingested before a query stop must still
    gate documents that arrive after a restart from the same checkpoint —
    the state store recovery the reference gets from ACID tables, done the
    Structured Streaming way (checkpointed state + file-source offsets)."""
    originals, near = planted
    tmp = Path(tempfile.mkdtemp(prefix="stream_dedup_ckpt_"))
    src = tmp / "in"
    src.mkdir()
    ckpt = str(tmp / "ckpt")
    try:
        def start(sink):
            stream = (
                spark.readStream.schema("doc_id bigint, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(str(src))
            )
            gate = streaming_minhash_dedup(stream)
            return (
                gate.writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        # run 1: only the originals exist; they become checkpointed keepers
        p1 = str(src / "b1.parquet")
        originals.to_parquet(p1, index=False)
        os.utime(p1, (1_700_000_000,) * 2)
        # the sink must consume every partition or the state stores never
        # commit (Spark validates per-partition commits for the batch)
        q = start(lambda bdf, bid: bdf.count())
        assert q.awaitTermination(300), "stream timed out (300s)"

        # run 2 (fresh query, same checkpoint): only the near-dups are new
        p2 = str(src / "b2.parquet")
        near.to_parquet(p2, index=False)
        os.utime(p2, (1_700_000_100,) * 2)
        out: list = []

        def sink(bdf, bid):
            pdf = resolve_dup_verdicts(bdf).toPandas()
            if len(pdf):
                out.append(pdf)

        q = start(sink)
        assert q.awaitTermination(300), "stream timed out (300s)"

        seen = {int(r.doc_id) for pdf in out for r in pdf.itertuples()}
        assert seen and seen <= set(int(i) for i in near["doc_id"]), (
            "restart must process ONLY the new file (offsets recovered)"
        )
        flags = {
            int(r.doc_id): int(r.dup_of)
            for pdf in out
            for r in pdf.itertuples()
            if bool(r.is_dup)
        }
        hits = sum(
            1 for i in near["doc_id"] if flags.get(int(i)) == int(i) - OFFSET
        )
        assert hits / len(near) >= 0.9, (
            "pre-restart keepers must gate post-restart arrivals"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_gate_same_batch_pair_resolves_to_min_id(spark, planted):
    """A duplicate pair arriving in the SAME micro-batch must resolve
    deterministically: the smaller id becomes the keeper, the larger the
    duplicate — matching the batch operator's min-id convention."""
    import pandas as pd

    originals, near = planted
    both = pd.concat([originals, near], ignore_index=True)
    batches = _run_gate(spark, [both])
    flags = {}
    for _, pdf in batches:
        for row in pdf.itertuples():
            if bool(row.is_dup):
                flags[int(row.doc_id)] = int(row.dup_of)
    # keepers (small ids) never flagged; dups resolve to the original
    assert not (set(flags) & set(int(i) for i in originals["doc_id"]) & {
        k for k, v in flags.items() if v == k - OFFSET
    })
    hits = sum(
        1 for i in near["doc_id"] if flags.get(int(i)) == int(i) - OFFSET
    )
    assert hits / len(near) >= 0.9
    for did, dup_of in flags.items():
        assert dup_of < did


# ---------------------------------------------------------------------------
# Streaming perceptual image gate (dHash twin)
# ---------------------------------------------------------------------------


def _png_corpus():
    """(originals_pdf, variants_pdf): 20 textured originals; variants are
    the same pixels with a two-pixel swap (≤ 2 flipped dHash comparisons)
    at asset_id + OFFSET — must flag against the round-1 keeper."""
    import numpy as np
    import pandas as pd

    from hdp2_5_hive2_spark.llm.media_codecs import png_encode

    rng = np.random.default_rng(42)
    orig_rows, var_rows = [], []
    for k in range(20):
        px = rng.integers(0, 256, (8, 9), dtype=np.uint8)
        orig_rows.append((k, png_encode(px)))
        tw = px.copy()
        tw[3, 0], tw[3, 1] = tw[3, 1], tw[3, 0]
        var_rows.append((k + OFFSET, png_encode(tw)))
    mk = lambda rows: pd.DataFrame(
        {"asset_id": [r[0] for r in rows], "payload": [r[1] for r in rows]}
    )
    return mk(orig_rows), mk(var_rows)


def test_streaming_image_gate_flags_variants_across_triggers(spark):
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from hdp2_5_hive2_spark.streaming import (
        resolve_image_verdicts,
        streaming_image_dedup,
    )

    originals, variants = _png_corpus()
    tmp = Path(tempfile.mkdtemp(prefix="stream_imgdedup_"))
    src = tmp / "in"
    src.mkdir()
    try:
        for i, pdf in enumerate([originals, variants]):
            p = str(src / f"b{i}.parquet")
            pdf.to_parquet(p, index=False)
            os.utime(p, (1_700_000_000 + 100 * i,) * 2)
        stream = (
            spark.readStream.schema("asset_id bigint, payload binary")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        gate = streaming_image_dedup(stream, max_hamming=6)
        out = []

        def sink(bdf, bid):
            pdf = resolve_image_verdicts(bdf).toPandas()
            if len(pdf):
                out.append((int(bid), pdf))

        q = gate.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
        assert q.awaitTermination(300), "stream timed out (300s)"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert len(out) >= 2, "file source must deliver multiple triggers"
    by_asset = {}
    for bid, pdf in out:
        for r in pdf.itertuples():
            by_asset[int(r.asset_id)] = (
                bid,
                bool(r.is_dup),
                None if r.dup_of is None or r.dup_of != r.dup_of else int(r.dup_of),
            )
    assert set(by_asset) == set(range(20)) | {k + OFFSET for k in range(20)}
    # originals (batch 0) are keepers; textured randoms must not cross-flag
    orig_batch = max(by_asset[k][0] for k in range(20))
    hits = 0
    for k in range(20):
        bid, is_dup, dup_of = by_asset[k + OFFSET]
        assert bid > orig_batch
        if is_dup and dup_of == k:
            hits += 1
    assert hits >= 18, f"variant recall {hits}/20"
    false_orig = [k for k in range(20) if by_asset[k][1]]
    assert len(false_orig) <= 1, f"textured originals cross-flagged: {false_orig}"


def test_streaming_gate_replay_is_deterministic(spark, planted):
    """Dedup-gate replay determinism: running the IDENTICAL file-source
    stream end-to-end twice (fresh checkpoints, fresh state stores) must
    produce byte-identical verdicts — batch assignment, is_dup flags and
    keeper ids included. The gate's hashes are md5-derived with no RNG and
    its state transitions are pure functions of arrival order, so a replay
    of the same ordered input is exactly reproducible — the property an
    at-least-once pipeline relies on when it reprocesses a shard."""
    originals, near = planted

    def canon(batches):
        rows = []
        for bid, pdf in batches:
            for r in pdf.itertuples():
                dup_of = None if r.dup_of != r.dup_of or r.dup_of is None else int(r.dup_of)
                rows.append((bid, int(r.doc_id), bool(r.is_dup), dup_of))
        return sorted(rows)

    first = canon(_run_gate(spark, [originals, near]))
    second = canon(_run_gate(spark, [originals, near]))
    assert first == second
    assert first, "gate must emit verdicts"


def test_streaming_compaction_monitor_matches_batch_twin(spark):
    """The stateful compaction monitor's LAST emission per writer must
    equal the llm_compaction_stream batch query's row for that writer —
    cross-trigger state parity: arrivals split across three time-ordered
    micro-batches, so every writer's totals depend on state carried
    between triggers."""
    from hdp2_5_hive2_spark.queries import REGISTRY
    from hdp2_5_hive2_spark.streaming import streaming_compaction_monitor

    # ts rides as epoch-micros ints: pandas datetime64[ns] round-trips as
    # TIMESTAMP(NANOS) parquet, which Spark's plain timestamp reader
    # rejects; the conversion is monotone so arrival order is unchanged.
    base = load_tables(spark, SF_CORRECT)["events"]
    ts_col = (
        F.unix_micros("ts")
        if dict(base.dtypes)["ts"].startswith("timestamp")
        else F.col("ts").cast("bigint")
    )
    ev = (
        base.select(
            "user_id",
            ts_col.alias("ts"),
            "event_id",
            ((F.col("event_id") % 997) + 64).cast("bigint").alias("bytes"),
        )
        .orderBy("ts", "event_id")
        .toPandas()
    )
    third = len(ev) // 3
    files = [ev.iloc[:third], ev.iloc[third : 2 * third], ev.iloc[2 * third :]]

    tmp = Path(tempfile.mkdtemp(prefix="stream_compact_"))
    src = tmp / "in"
    src.mkdir()
    try:
        for i, pdf in enumerate(files):
            p = str(src / f"b{i}.parquet")
            pdf.to_parquet(p, index=False)
            os.utime(p, (1_700_000_000 + 100 * i,) * 2)
        stream = (
            spark.readStream.schema(
                "user_id bigint, ts bigint, event_id bigint, bytes bigint"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        mon = streaming_compaction_monitor(stream)
        out: list[tuple[int, object]] = []

        def sink(bdf, bid):
            pdf = bdf.toPandas()
            out.append((int(bid), pdf))

        q = mon.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
        assert q.awaitTermination(300), "stream timed out (300s)"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert len([1 for _, pdf in out if len(pdf)]) >= 3, "need >= 3 triggers"
    last: dict[int, tuple] = {}
    for bid, pdf in sorted(out, key=lambda x: x[0]):
        for r in pdf.itertuples():
            last[int(r.user_id)] = (
                int(r.n_files),
                int(r.total_bytes),
                int(r.n_compactions),
                int(r.residual_bytes),
            )
    batch = {
        int(r.user_id): (
            int(r.n_files),
            int(r.total_bytes),
            int(r.n_compactions),
            int(r.residual_bytes),
        )
        for r in REGISTRY["llm_compaction_stream"].fn(spark, SF_CORRECT).collect()
    }
    assert last == batch


def test_streaming_interleave_scheduler_matches_batch_twin(spark):
    """The stateful interleave scheduler's emitted (type, id, vkey) rows,
    globally sorted by (vkey, type, id) and cut to 30, must equal the
    events_interleave_schedule batch query — cross-trigger state parity:
    arrivals split across three time-ordered micro-batches, so every
    stream's item index depends on state carried between triggers."""
    from hdp2_5_hive2_spark.queries import REGISTRY
    from hdp2_5_hive2_spark.streaming import streaming_interleave_scheduler

    base = load_tables(spark, SF_CORRECT)["events"]
    ts_col = (
        F.unix_micros("ts")
        if dict(base.dtypes)["ts"].startswith("timestamp")
        else F.col("ts").cast("bigint")
    )
    ev = (
        base.select("event_type", ts_col.alias("ts"), "event_id")
        .orderBy("ts", "event_id")
        .toPandas()
    )
    third = len(ev) // 3
    files = [ev.iloc[:third], ev.iloc[third : 2 * third], ev.iloc[2 * third :]]

    tmp = Path(tempfile.mkdtemp(prefix="stream_interleave_"))
    src = tmp / "in"
    src.mkdir()
    try:
        for i, pdf in enumerate(files):
            p = str(src / f"b{i}.parquet")
            pdf.to_parquet(p, index=False)
            os.utime(p, (1_700_000_000 + 100 * i,) * 2)
        stream = (
            spark.readStream.schema(
                "event_type string, ts bigint, event_id bigint"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        sched = streaming_interleave_scheduler(stream)
        out: list[tuple[int, object]] = []

        def sink(bdf, bid):
            pdf = bdf.toPandas()
            out.append((int(bid), pdf))

        q = sched.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
        assert q.awaitTermination(300), "stream timed out (300s)"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert len([1 for _, pdf in out if len(pdf)]) >= 3, "need >= 3 triggers"
    emitted = []
    for _, pdf in out:
        for r in pdf.itertuples():
            emitted.append((int(r.vkey), str(r.event_type), int(r.event_id)))
    emitted.sort()
    streamed = [
        (pos + 1, et, eid, vk)
        for pos, (vk, et, eid) in enumerate(emitted[:30])
    ]
    batch = [
        (int(r.pos), str(r.event_type), int(r.event_id), int(r.vkey))
        for r in REGISTRY["events_interleave_schedule"]
        .fn(spark, SF_CORRECT)
        .orderBy("pos")
        .collect()
    ]
    assert streamed == batch


def test_streaming_interleave_scheduler_rocksdb_state_store(spark):
    """Same cross-trigger parity contract as the default-store test, but
    with keyed state in the RocksDB state store — the provider the 100 TB
    docstring prescribes. Converts the scale note into a tested contract:
    the one-int-per-stream state codec round-trips through RocksDB."""
    from hdp2_5_hive2_spark.queries import REGISTRY
    from hdp2_5_hive2_spark.streaming import streaming_interleave_scheduler

    base = load_tables(spark, SF_CORRECT)["events"]
    ts_col = (
        F.unix_micros("ts")
        if dict(base.dtypes)["ts"].startswith("timestamp")
        else F.col("ts").cast("bigint")
    )
    ev = (
        base.select("event_type", ts_col.alias("ts"), "event_id")
        .orderBy("ts", "event_id")
        .toPandas()
    )
    third = len(ev) // 3
    files = [ev.iloc[:third], ev.iloc[third : 2 * third], ev.iloc[2 * third :]]

    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    tmp = Path(tempfile.mkdtemp(prefix="stream_interleave_rocks_"))
    src = tmp / "in"
    src.mkdir()
    try:
        for i, pdf in enumerate(files):
            p = str(src / f"b{i}.parquet")
            pdf.to_parquet(p, index=False)
            os.utime(p, (1_700_000_000 + 100 * i,) * 2)
        stream = (
            spark.readStream.schema(
                "event_type string, ts bigint, event_id bigint"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out: list[tuple[int, object]] = []

        def sink(bdf, bid):
            out.append((int(bid), bdf.toPandas()))

        q = (
            streaming_interleave_scheduler(stream)
            .writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "stream timed out (300s)"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        if before is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, before)

    emitted = sorted(
        (int(r.vkey), str(r.event_type), int(r.event_id))
        for _, pdf in out
        for r in pdf.itertuples()
    )
    streamed = [
        (pos + 1, et, eid, vk)
        for pos, (vk, et, eid) in enumerate(emitted[:30])
    ]
    batch = [
        (int(r.pos), str(r.event_type), int(r.event_id), int(r.vkey))
        for r in REGISTRY["events_interleave_schedule"]
        .fn(spark, SF_CORRECT)
        .orderBy("pos")
        .collect()
    ]
    assert streamed == batch


def test_streaming_interleave_scheduler_raises_on_ts_regression(spark):
    """The in-order-per-key ingestion precondition must fail LOUDLY
    (ADVICE r11): an event arriving in a later trigger with an earlier ts
    than anything already indexed for its key would silently break vkey
    parity with the batch twin — the operator carries last-seen ts in
    state and the query must ERROR, not emit a divergent schedule."""
    import pandas as pd
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from hdp2_5_hive2_spark.streaming import streaming_interleave_scheduler

    first = pd.DataFrame(
        {"event_type": ["click", "click"], "ts": [100, 200], "event_id": [1, 2]}
    )
    late = pd.DataFrame(
        {"event_type": ["click"], "ts": [50], "event_id": [3]}  # ts regressed
    )
    tmp = Path(tempfile.mkdtemp(prefix="stream_interleave_late_"))
    src = tmp / "in"
    src.mkdir()
    try:
        for i, pdf in enumerate([first, late]):
            p = str(src / f"b{i}.parquet")
            pdf.to_parquet(p, index=False)
            os.utime(p, (1_700_000_000 + 100 * i,) * 2)
        stream = (
            spark.readStream.schema(
                "event_type string, ts bigint, event_id bigint"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        sched = streaming_interleave_scheduler(stream)
        q = (
            sched.writeStream.format("memory")
            .queryName("interleave_late_arrival")
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(StreamingQueryException) as exc_info:
            q.awaitTermination(300)
            raise AssertionError("query must fail on ts regression")
        assert "in-order-per-key ingestion precondition" in str(exc_info.value)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_burstiness_monitor_matches_batch_twin(spark):
    """The monitor's LAST emission per user (after all triggers) must equal
    the events_interarrival_burstiness batch query row for row — the
    cross-trigger state contract: gaps spanning micro-batch boundaries
    depend on last_ts carried in state."""
    from hdp2_5_hive2_spark.queries import REGISTRY
    from hdp2_5_hive2_spark.streaming import streaming_burstiness_monitor

    base = load_tables(spark, SF_CORRECT)["events"]
    ev = (
        base.select(
            "user_id", F.col("ts").cast("long").alias("ts"), "event_id"
        )
        .orderBy("ts", "event_id")
        .toPandas()
    )
    third = len(ev) // 3
    files = [ev.iloc[:third], ev.iloc[third : 2 * third], ev.iloc[2 * third :]]

    tmp = Path(tempfile.mkdtemp(prefix="stream_burst_"))
    src = tmp / "in"
    src.mkdir()
    try:
        for i, pdf in enumerate(files):
            p = str(src / f"b{i}.parquet")
            pdf.to_parquet(p, index=False)
            os.utime(p, (1_700_000_000 + 100 * i,) * 2)
        stream = (
            spark.readStream.schema("user_id bigint, ts bigint, event_id bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        mon = streaming_burstiness_monitor(stream)
        out: list[tuple[int, object]] = []

        def sink(bdf, bid):
            pdf = bdf.toPandas()
            if len(pdf):
                out.append((int(bid), pdf))

        q = mon.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
        assert q.awaitTermination(300), "stream timed out (300s)"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert len(out) >= 3, "need >= 3 emitting triggers"
    latest = {}
    for bid, pdf in sorted(out):
        for r in pdf.itertuples():
            latest[int(r.user_id)] = (
                int(r.n_gaps), int(r.s1), int(r.s2),
                int(r.cov2_milli), int(r.is_bursty),
            )
    batch = {
        int(r.user_id): (
            int(r.n_gaps), int(r.s1), int(r.s2),
            int(r.cov2_milli), int(r.is_bursty),
        )
        for r in REGISTRY["events_interarrival_burstiness"]
        .fn(spark, SF_CORRECT)
        .collect()
    }
    assert latest == batch
    # mid-stream emissions must also be self-consistent prefixes: every
    # emitted row satisfies the gap floor it claims
    for _, pdf in out:
        assert (pdf["n_gaps"] >= 10).all()
        assert (pdf["s1"] > 0).all()


def test_streaming_burstiness_monitor_raises_on_ts_regression(spark):
    """Same loud-failure contract as the interleave scheduler: a late
    trigger with an earlier ts for an already-seen user must ERROR, not
    silently corrupt the gap statistics."""
    import pandas as pd
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from hdp2_5_hive2_spark.streaming import streaming_burstiness_monitor

    first = pd.DataFrame(
        {"user_id": [7, 7], "ts": [100, 200], "event_id": [1, 2]}
    )
    late = pd.DataFrame({"user_id": [7], "ts": [50], "event_id": [3]})
    tmp = Path(tempfile.mkdtemp(prefix="stream_burst_late_"))
    src = tmp / "in"
    src.mkdir()
    try:
        for i, pdf in enumerate([first, late]):
            p = str(src / f"b{i}.parquet")
            pdf.to_parquet(p, index=False)
            os.utime(p, (1_700_000_000 + 100 * i,) * 2)
        stream = (
            spark.readStream.schema("user_id bigint, ts bigint, event_id bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        mon = streaming_burstiness_monitor(stream)
        q = (
            mon.writeStream.format("memory")
            .queryName("burstiness_late_arrival")
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(StreamingQueryException) as exc_info:
            q.awaitTermination(300)
            raise AssertionError("query must fail on ts regression")
        assert "in-order-per-key ingestion precondition" in str(exc_info.value)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_burstiness_monitor_pre_1970_ts_state_roundtrip(spark):
    """ADVICE r12: a legitimate negative epoch-second last_ts (pre-1970
    data) must survive the state round-trip via the explicit has_ts flag —
    the old -1 sentinel reinterpreted any stored negative ts as 'nothing
    seen', dropping the cross-trigger gap and disarming the regression
    guard. Twelve events at ts = -1200..-100 split across two triggers:
    the final emission must count the boundary-spanning gap."""
    import pandas as pd
    from hdp2_5_hive2_spark.streaming import streaming_burstiness_monitor

    ts = [-1200 + 100 * i + (7 if i % 3 == 0 else 0) for i in range(12)]
    gaps = [b - a for a, b in zip(ts, ts[1:])]
    n, s1, s2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
    ev = pd.DataFrame(
        {"user_id": [1] * 12, "ts": ts, "event_id": list(range(12))}
    )

    tmp = Path(tempfile.mkdtemp(prefix="stream_burst_neg_"))
    src = tmp / "in"
    src.mkdir()
    try:
        for i, pdf in enumerate((ev.iloc[:6], ev.iloc[6:])):
            p = str(src / f"b{i}.parquet")
            pdf.to_parquet(p, index=False)
            os.utime(p, (1_700_000_000 + 100 * i,) * 2)
        stream = (
            spark.readStream.schema("user_id bigint, ts bigint, event_id bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        mon = streaming_burstiness_monitor(stream)
        out: list[tuple[int, object]] = []

        def sink(bdf, bid):
            pdf = bdf.toPandas()
            if len(pdf):
                out.append((int(bid), pdf))

        q = mon.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
        assert q.awaitTermination(300), "stream timed out (300s)"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert out, "the 11-gap user must emit once past the 10-gap floor"
    last = sorted(out)[-1][1].iloc[0]
    assert (int(last.n_gaps), int(last.s1), int(last.s2)) == (n, s1, s2), (
        "cross-trigger gap over negative epoch seconds was dropped"
    )


def test_streaming_session_gap_monitor_matches_batch_sweep(spark):
    """Aggregating the monitor's LAST emission per user as
    n_users + Σ counter must equal the batch events_session_gap_sweep
    n_sessions row per threshold — the cross-trigger state contract:
    gaps spanning micro-batch boundaries depend on last_ts carried in
    state."""
    from hdp2_5_hive2_spark.queries import REGISTRY
    from hdp2_5_hive2_spark.streaming import streaming_session_gap_monitor

    base = load_tables(spark, SF_CORRECT)["events"]
    ev = (
        base.select(
            "user_id", F.col("ts").cast("long").alias("ts"), "event_id"
        )
        .orderBy("ts", "event_id")
        .toPandas()
    )
    third = len(ev) // 3
    files = [ev.iloc[:third], ev.iloc[third : 2 * third], ev.iloc[2 * third :]]

    tmp = Path(tempfile.mkdtemp(prefix="stream_gap_"))
    src = tmp / "in"
    src.mkdir()
    try:
        for i, pdf in enumerate(files):
            p = str(src / f"b{i}.parquet")
            pdf.to_parquet(p, index=False)
            os.utime(p, (1_700_000_000 + 100 * i,) * 2)
        stream = (
            spark.readStream.schema("user_id bigint, ts bigint, event_id bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        mon = streaming_session_gap_monitor(stream)
        out: list[tuple[int, object]] = []

        def sink(bdf, bid):
            pdf = bdf.toPandas()
            if len(pdf):
                out.append((int(bid), pdf))

        q = mon.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
        assert q.awaitTermination(300), "stream timed out (300s)"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert len(out) >= 3, "need >= 3 emitting triggers"
    latest = {}
    for bid, pdf in sorted(out):
        for r in pdf.itertuples():
            latest[int(r.user_id)] = (int(r.c1800), int(r.c3600), int(r.c7200))
    n_users = len(latest)
    got = {
        thr: n_users + sum(v[i] for v in latest.values())
        for i, thr in enumerate((1800, 3600, 7200))
    }
    want = {
        int(r.thr): int(r.n_sessions)
        for r in REGISTRY["events_session_gap_sweep"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want
    # counters are monotone in the threshold for every user
    for c18, c36, c72 in latest.values():
        assert c18 >= c36 >= c72


def test_streaming_session_gap_monitor_raises_on_ts_regression(spark):
    """Same loud-failure contract as the burstiness monitor: a late
    trigger with an earlier ts for an already-seen user must ERROR, not
    silently shift session boundaries."""
    import pandas as pd
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from hdp2_5_hive2_spark.streaming import streaming_session_gap_monitor

    tmp = Path(tempfile.mkdtemp(prefix="stream_gap_late_"))
    src = tmp / "in"
    src.mkdir()
    try:
        a = pd.DataFrame({"user_id": [1, 1], "ts": [5000, 9000],
                          "event_id": [0, 1]})
        b = pd.DataFrame({"user_id": [1], "ts": [100], "event_id": [2]})
        for i, pdf in enumerate((a, b)):
            p = str(src / f"b{i}.parquet")
            pdf.to_parquet(p, index=False)
            os.utime(p, (1_700_000_000 + 100 * i,) * 2)
        stream = (
            spark.readStream.schema("user_id bigint, ts bigint, event_id bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        mon = streaming_session_gap_monitor(stream)
        q = (
            mon.writeStream.format("memory")
            .queryName("session_gap_late_arrival")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
            raised = False
        except StreamingQueryException as e:
            raised = "precondition violated" in str(e)
        assert raised, "late arrival must fail loudly, not corrupt state"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
