"""JSONL corpus-shard ingestion: ``.jsonl`` / ``.jsonl.gz`` / ``.jsonl.zst``.

Public LLM corpora ship as compressed JSON-lines shards (The Pile and
Dolma distribute ``.jsonl.zst``, RedPajama/C4 ``.json.gz`` — one JSON
object per line, a ``text`` field plus source-specific metadata). This
module is the front door for those shards, completing the crawl-side
trio (WARC archives in llm/warc.py, tar shards in llm/webdataset.py).

Division of labor, deliberately:

- Python side (this module) does ONLY decompress + line split — one
  task per shard, payloads never touch the driver.
- JSON *field* extraction stays JVM-side (``F.get_json_object`` /
  ``from_json`` over the ``line`` column), so the schema-bearing work
  runs in codegen, not in Python loops.

100 TB notes: publishers size shards ~100-500 MB precisely so that
one-task-per-shard is the intended parallelism grain; gzip and zstd
streams are not random-access, so whole-member decode per task is the
honest cost model (same contract as llm/warc.py's .warc.gz path). On a
cluster with native Hadoop codecs, plain/.gz shards can also go through
``spark.read.json`` directly; in this container (no native hadoop, no
native libzstd for Hadoop's ZStandardCodec) the zstd leg runs on
storage/zstd_codec.py — the from-spec RFC 8878 decoder, cross-parity
pinned against zstd-jni — which is also the only ``.zst`` path here.

Hostile-input contract: ValueError only (corrupt members raise; the
caller chooses degrade-vs-fail, as with every parser in this package).
"""

from __future__ import annotations

import gzip
import json
import zlib

__all__ = [
    "split_jsonl",
    "build_jsonl_shard",
    "read_jsonl_shards",
    "write_jsonl_shards",
]

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def _decompress_member(blob: bytes) -> bytes:
    if blob[:4] == _ZSTD_MAGIC or blob[:4] == b"\x50\x2a\x4d\x18":
        from hdp2_5_hive2_spark.storage.zstd_codec import zstd_decompress

        return zstd_decompress(blob)
    if blob[:2] == b"\x1f\x8b":
        try:
            return gzip.decompress(blob)  # handles concatenated members
        except (OSError, EOFError, zlib.error) as exc:
            raise ValueError(f"jsonl shard corrupt: bad gzip ({exc})") from None
    return blob


def split_jsonl(blob: bytes) -> list[str]:
    """Decompressed-or-plain shard bytes → one string per non-empty line
    (UTF-8, the JSONL contract; bad UTF-8 raises)."""
    try:
        text = _decompress_member(blob).decode("utf-8")
    except UnicodeDecodeError as exc:
        raise ValueError(f"jsonl shard corrupt: not UTF-8 ({exc})") from None
    return [ln for ln in text.split("\n") if ln.strip()]


def build_jsonl_shard(rows: list[dict], codec: str = "zstd") -> bytes:
    """Fixture/export writer: dict rows → one shard blob.

    ``zstd`` emits conformant store frames (storage/zstd_codec.py) any
    spec decoder opens — same write-side stance as the Avro zstandard
    leg; ``gzip`` is fully compressed via zlib."""
    payload = "".join(
        json.dumps(r, ensure_ascii=False, sort_keys=True) + "\n" for r in rows
    ).encode("utf-8")
    if codec == "zstd":
        from hdp2_5_hive2_spark.storage.zstd_codec import zstd_compress_store

        return zstd_compress_store(payload)
    if codec == "gzip":
        return gzip.compress(payload, mtime=0)
    if codec == "plain":
        return payload
    raise ValueError(f"jsonl shard codec {codec!r} not supported")


def write_jsonl_shards(df, path: str, codec: str = "zstd") -> None:
    """One shard per partition, serialized executor-side (no driver
    collect — the storage/avro.py foreachPartition shape); repartition
    upstream to pick the shard count/size. Overwrite semantics."""
    import os
    import shutil

    ext = {"plain": "jsonl", "gzip": "jsonl.gz", "zstd": "jsonl.zst"}[codec]
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    cols = df.columns

    def _write_partition(rows) -> None:
        from pyspark import TaskContext

        rows = [dict(zip(cols, r)) for r in rows]
        if not rows:
            return
        pid = TaskContext.get().partitionId()
        with open(os.path.join(path, f"part-{pid:05d}.{ext}"), "wb") as fh:
            fh.write(build_jsonl_shard(rows, codec))

    df.rdd.foreachPartition(_write_partition)


def read_jsonl_shards(spark, paths: list[str], parallelism: int | None = None):
    """(path, line_idx, line) rows across JSONL shards, auto-detecting
    plain/gzip/zstd per file by magic bytes. One task per shard; JSON
    field extraction belongs downstream on the ``line`` column
    (``F.get_json_object`` — JVM-side, codegen)."""
    import pandas as pd

    pdf = spark.createDataFrame([(p,) for p in paths], "path string")
    if parallelism:
        pdf = pdf.repartition(parallelism)

    def run(batches):
        for b in batches:
            rows = []
            for path in b["path"]:
                with open(path, "rb") as fh:
                    blob = fh.read()
                for i, ln in enumerate(split_jsonl(blob)):
                    rows.append((path, i, ln))
            yield pd.DataFrame(rows, columns=["path", "line_idx", "line"])

    return pdf.mapInPandas(run, "path string, line_idx bigint, line string")
