"""JSONL corpus shards (llm/corpus_shards.py): codec auto-detection,
executor-side sharded write → read roundtrips, JSON fidelity through
get_json_object, and the hostile-input contract."""

from __future__ import annotations

import glob
import json
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


@pytest.mark.parametrize("codec", ["plain", "gzip", "zstd"])
def test_build_split_roundtrip(codec):
    rows = _rows()
    lines = split_jsonl(build_jsonl_shard(rows, codec))
    assert [json.loads(ln) for ln in lines] == rows


def test_split_detects_codec_by_magic():
    rows = _rows(5)
    blobs = {c: build_jsonl_shard(rows, c) for c in ("plain", "gzip", "zstd")}
    assert blobs["gzip"][:2] == b"\x1f\x8b"
    assert blobs["zstd"][:4] == b"\x28\xb5\x2f\xfd"
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
    for codec in ("gzip", "zstd"):
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
