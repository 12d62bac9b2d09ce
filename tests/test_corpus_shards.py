"""JSONL corpus shards (llm/corpus_shards.py): codec auto-detection,
executor-side sharded write → read roundtrips, JSON fidelity through
get_json_object, and the hostile-input contract."""

from __future__ import annotations

import glob
import json
import os
import random

import pytest

from hdp2_5_hive2_spark.llm.corpus_shards import (
    build_jsonl_shard,
    read_jsonl_shards,
    split_jsonl,
    write_jsonl_shards,
)


def _rows(n=40):
    return [
        {"doc_id": i, "text": f"doc {i}\nline two é {'x' * (i % 7)}"}
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["plain", "gzip", "zstd", "bzip2", "xz"])
def test_build_split_roundtrip(codec):
    rows = _rows()
    lines = split_jsonl(build_jsonl_shard(rows, codec))
    assert [json.loads(ln) for ln in lines] == rows


def test_split_detects_codec_by_magic():
    rows = _rows(5)
    blobs = {
        c: build_jsonl_shard(rows, c)
        for c in ("plain", "gzip", "zstd", "bzip2", "xz")
    }
    assert blobs["gzip"][:2] == b"\x1f\x8b"
    assert blobs["zstd"][:4] == b"\x28\xb5\x2f\xfd"
    assert blobs["bzip2"][:3] == b"BZh" and blobs["xz"][:6] == b"\xfd7zXZ\x00"
    assert len({tuple(split_jsonl(b)) for b in blobs.values()}) == 1


def test_write_read_shards(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"text {i} with ☃ and \"quotes\"") for i in range(100)],
        "doc_id bigint, text string",
    ).repartition(3)
    root = str(tmp_path / "shards")
    write_jsonl_shards(df, root, codec="zstd")
    paths = sorted(glob.glob(f"{root}/part-*.jsonl.zst"))
    assert 1 <= len(paths) <= 3
    back = read_jsonl_shards(spark, paths)
    from pyspark.sql import functions as F

    got = (
        back.select(
            F.get_json_object("line", "$.doc_id").cast("bigint").alias("doc_id"),
            F.get_json_object("line", "$.text").alias("text"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [(r["doc_id"], r["text"]) for r in got] == [
        (i, f"text {i} with ☃ and \"quotes\"") for i in range(100)
    ]


def test_hostile_inputs_valueerror_only():
    rng = random.Random(3)
    for codec in ("gzip", "zstd", "bzip2", "xz"):
        base = bytearray(build_jsonl_shard(_rows(10), codec))
        for _ in range(60):
            mut = bytearray(base)
            mut[rng.randrange(len(mut))] = rng.randrange(256)
            try:
                split_jsonl(bytes(mut))
            except ValueError:
                pass
    with pytest.raises(ValueError):
        split_jsonl(b"\xff\xfe plain but not utf8 \xff")
    with pytest.raises(ValueError):
        build_jsonl_shard([], codec="lz77")


def test_seekable_container_conformance(spark):
    """The seekable container must remain a PLAIN multi-frame zstd file to
    spec decoders: zstd-jni and our own whole-buffer decoder both read
    the concatenation (skippable seek table ignored), while the seek
    table reconstructs every frame boundary and checksum."""
    from hdp2_5_hive2_spark.storage.zstd_codec import zstd_decompress
    from hdp2_5_hive2_spark.storage.zstd_seekable import (
        read_seek_table,
        read_seekable,
        write_seekable,
    )

    chunks = [f"chunk {i} ".encode() * (i + 1) for i in range(7)]
    blob = write_seekable(chunks)
    whole = b"".join(chunks)
    assert zstd_decompress(blob) == whole
    entries = read_seek_table(blob)
    assert [e.d_len for e in entries] == [len(c) for c in chunks]
    assert b"".join(read_seekable(blob, e) for e in entries) == whole
    # spec magics sit where the spec puts them
    import struct

    assert struct.unpack_from("<I", blob, len(blob) - 4)[0] == 0x8F92EAB1
    # corrupt one frame byte: its checksum (not another frame's) trips
    bad = bytearray(blob)
    bad[entries[3].c_off + 10] ^= 0x20
    assert read_seekable(bytes(bad), entries[2]) == chunks[2]
    with pytest.raises(ValueError):
        read_seekable(bytes(bad), entries[3])


def test_seekable_shards_one_task_per_frame(spark, tmp_path):
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.llm.corpus_shards import (
        read_jsonl_seekable,
        write_jsonl_seekable,
    )

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(250)], "doc_id bigint, text string"
    ).coalesce(1)
    root = str(tmp_path / "seek")
    write_jsonl_seekable(df, root, lines_per_frame=40)
    paths = sorted(glob.glob(f"{root}/part-*.jsonl.zst"))
    assert len(paths) == 1
    lines = read_jsonl_seekable(spark, paths)
    got = lines.select(
        "frame_idx",
        F.get_json_object("line", "$.doc_id").cast("bigint").alias("doc_id"),
    )
    rows = got.collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(250))
    # 250 rows / 40 per frame = 7 frames, so 7 independent splits
    assert got.select("frame_idx").distinct().count() == 7


def test_shard_leading_skippable_frame_any_magic():
    """RFC 8878 defines 16 skippable magics (0x184D2A50-5F); a shard that
    LEADS with one (e.g. a seek-table variant) must still route to the
    zstd decoder, not the plain-text path."""
    rows = _rows(4)
    import struct

    from hdp2_5_hive2_spark.llm.corpus_shards import build_jsonl_shard

    for nibble in (0x0, 0xE, 0xF):
        skip = struct.pack("<II", 0x184D2A50 | nibble, 3) + b"xyz"
        blob = skip + build_jsonl_shard(rows, "zstd")
        assert [json.loads(ln) for ln in split_jsonl(blob)] == rows


def test_jsonlshards_datasource(spark, tmp_path):
    """format('jsonlshards'): one InputPartition per seekable frame, per
    file otherwise; rows identical to the functional readers."""
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.llm.corpus_shards import (
        write_jsonl_seekable,
        write_jsonl_shards,
    )
    from hdp2_5_hive2_spark.llm.shards_datasource import (
        JsonlShardsReader,
        read_shards_ds,
    )

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(120)], "doc_id bigint, text string"
    ).coalesce(1)
    seek_root = str(tmp_path / "seek")
    write_jsonl_seekable(df, seek_root, lines_per_frame=30)  # 4 frames
    gz_root = str(tmp_path / "gz")
    write_jsonl_shards(df, gz_root, codec="gzip")  # 1 file

    # split planning: 4 frame-splits + 1 whole-member split
    mixed = str(tmp_path / "mixed")
    os.makedirs(mixed)
    for root in (seek_root, gz_root):
        for f in os.listdir(root):
            os.link(os.path.join(root, f), os.path.join(mixed, f"{os.path.basename(root)}-{f}"))
    parts = JsonlShardsReader({"path": mixed}).partitions()
    assert len(parts) == 5
    assert sorted(p.frame_idx for p in parts) == [-1, 0, 1, 2, 3]

    got = (
        read_shards_ds(spark, mixed)
        .select(F.get_json_object("line", "$.doc_id").cast("bigint").alias("k"))
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum("k").alias("s"))
        .head()
    )
    assert got["n"] == 240 and got["s"] == 2 * sum(range(120))


def test_jsonlshardstream_source(spark, tmp_path):
    """Streaming front door: shards landing in a directory arrive as
    micro-batches; a checkpoint restart resumes at the committed file
    offset (no re-read, no loss)."""
    from hdp2_5_hive2_spark.llm.corpus_shards import build_jsonl_shard
    from hdp2_5_hive2_spark.llm.shards_datasource import JsonlShardsStreamSource

    land = tmp_path / "landing"
    land.mkdir()
    sink = tmp_path / "sink.parquet"
    ckpt = str(tmp_path / "ckpt")
    (land / "a.jsonl.zst").write_bytes(
        build_jsonl_shard([{"doc_id": i} for i in range(10)], "zstd")
    )
    spark.dataSource.register(JsonlShardsStreamSource)

    def run_once():
        (
            spark.readStream.format("jsonlshardstream")
            .load(str(land))
            .writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )

    run_once()
    assert spark.read.parquet(str(sink)).count() == 10
    (land / "b.jsonl.gz").write_bytes(
        build_jsonl_shard([{"doc_id": i} for i in range(7)], "gzip")
    )
    run_once()  # restart from checkpoint: only the new shard arrives
    got = spark.read.parquet(str(sink))
    assert got.count() == 17
    assert got.where("path like '%b.jsonl.gz'").count() == 7


def test_shard_stream_feeds_minhash_gate_end_to_end(spark, tmp_path):
    """Capstone: the crawl's streaming front door composed — .jsonl.zst
    shards land in a directory, the jsonlshardstream source turns them
    into micro-batches, JSON fields extract in codegen, and the
    stateful MinHash gate flags a shard-2 duplicate of a shard-1 keeper
    ACROSS micro-batches (keeper state carried in the state store)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.llm.corpus_shards import build_jsonl_shard
    from hdp2_5_hive2_spark.llm.shards_datasource import JsonlShardsStreamSource
    from hdp2_5_hive2_spark.streaming.corpus import (
        resolve_dup_verdicts,
        streaming_minhash_dedup,
    )

    rng = random.Random(4)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    docs = {
        i: " ".join(rng.choice(words) for _ in range(60)) for i in range(8)
    }
    land = tmp_path / "landing"
    land.mkdir()
    (land / "shard-000.jsonl.zst").write_bytes(
        build_jsonl_shard(
            [{"doc_id": i, "text": docs[i]} for i in range(8)], "zstd"
        )
    )
    spark.dataSource.register(JsonlShardsStreamSource)
    stream = (
        spark.readStream.format("jsonlshardstream")
        .load(str(land))
        .select(
            F.get_json_object("line", "$.doc_id").cast("bigint").alias("doc_id"),
            F.get_json_object("line", "$.text").alias("text"),
        )
    )
    gate = streaming_minhash_dedup(stream)
    out: list[pd.DataFrame] = []

    def sink(bdf, bid):
        pdf = resolve_dup_verdicts(bdf).toPandas()
        if len(pdf):
            out.append(pdf)

    ckpt = str(tmp_path / "ckpt")

    def run_once():
        (
            gate.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination(300)
        )

    run_once()
    # shard 2: one exact dup of doc 3 + one novel doc, judged on RESTART
    # (keeper state must come back from the checkpointed state store)
    (land / "shard-001.jsonl.zst").write_bytes(
        build_jsonl_shard(
            [
                {"doc_id": 100, "text": docs[3]},
                {"doc_id": 101, "text": "totally novel content " * 10},
            ],
            "zstd",
        )
    )
    run_once()
    verdicts = pd.concat(out)
    v100 = verdicts[verdicts.doc_id == 100].iloc[0]
    v101 = verdicts[verdicts.doc_id == 101].iloc[0]
    assert bool(v100.is_dup) and int(v100.dup_of) == 3
    assert not bool(v101.is_dup)
    assert not verdicts[verdicts.doc_id < 100].is_dup.any()
