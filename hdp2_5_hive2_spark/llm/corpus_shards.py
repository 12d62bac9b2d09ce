"""JSONL corpus-shard ingestion: .jsonl / .gz / .zst / .bz2 / .xz.

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
honest cost model (same contract as llm/warc.py's .warc.gz path) —
EXCEPT seekable-zstd shards (write_jsonl_seekable/read_jsonl_seekable,
storage/zstd_seekable.py), which split one shard into independently
decodable frames and plan one task per frame. On a
cluster with native Hadoop codecs, plain/.gz shards can also go through
``spark.read.json`` directly; in this container (no native hadoop, no
native libzstd for Hadoop's ZStandardCodec) the zstd leg runs on
storage/zstd_codec.py — the from-spec RFC 8878 decoder, cross-parity
pinned against zstd-jni — which is also the only ``.zst`` path here.

Hostile-input contract: ValueError only (corrupt members raise; the
caller chooses degrade-vs-fail, as with every parser in this package).
"""

from __future__ import annotations

import bz2
import gzip
import json
import lzma
import zlib

__all__ = [
    "split_jsonl",
    "build_jsonl_shard",
    "read_jsonl_shards",
    "write_jsonl_shards",
    "write_jsonl_seekable",
    "read_jsonl_seekable",
]

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"


def _decompress_member(blob: bytes) -> bytes:
    # zstd frame magic, or any of the 16 skippable-frame magics
    # 0x184D2A50-0x184D2A5F (a seekable shard legitimately STARTS with
    # one when its first frame is skippable; our own write_seekable puts
    # the 0x...5E seek table last, but other writers may lead with one)
    if blob[:4] == _ZSTD_MAGIC or (
        len(blob) >= 4
        and blob[1:4] == b"\x2a\x4d\x18"
        and 0x50 <= blob[0] <= 0x5F
    ):
        from hdp2_5_hive2_spark.storage.zstd_codec import zstd_decompress

        return zstd_decompress(blob)
    if blob[:2] == b"\x1f\x8b":
        try:
            return gzip.decompress(blob)  # handles concatenated members
        except (OSError, EOFError, zlib.error) as exc:
            raise ValueError(f"jsonl shard corrupt: bad gzip ({exc})") from None
    if blob[:3] == b"BZh":
        try:
            return bz2.decompress(blob)
        except (OSError, EOFError, ValueError) as exc:
            raise ValueError(f"jsonl shard corrupt: bad bzip2 ({exc})") from None
    if blob[:6] == b"\xfd7zXZ\x00":
        try:
            return lzma.decompress(blob)
        except (lzma.LZMAError, EOFError) as exc:
            raise ValueError(f"jsonl shard corrupt: bad xz ({exc})") from None
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

    ``zstd`` emits LZ77+FSE compressed frames (storage/zstd_codec.py's
    own encoder, zstd-jni cross-parity pinned); ``gzip``/``bzip2``/``xz``
    use the stdlib codecs."""
    payload = "".join(
        json.dumps(r, ensure_ascii=False, sort_keys=True) + "\n" for r in rows
    ).encode("utf-8")
    if codec == "zstd":
        from hdp2_5_hive2_spark.storage.zstd_codec import zstd_compress

        return zstd_compress(payload)
    if codec == "gzip":
        return gzip.compress(payload, mtime=0)
    if codec == "bzip2":
        return bz2.compress(payload)
    if codec == "xz":
        return lzma.compress(payload)
    if codec == "plain":
        return payload
    raise ValueError(f"jsonl shard codec {codec!r} not supported")


def write_jsonl_shards(df, path: str, codec: str = "zstd") -> None:
    """One shard per partition, serialized executor-side (no driver
    collect — the storage/avro.py foreachPartition shape); repartition
    upstream to pick the shard count/size. Overwrite semantics."""
    import os
    import shutil

    ext = {
        "plain": "jsonl",
        "gzip": "jsonl.gz",
        "zstd": "jsonl.zst",
        "bzip2": "jsonl.bz2",
        "xz": "jsonl.xz",
    }[codec]
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


def write_jsonl_seekable(
    df, path: str, lines_per_frame: int = 1000
) -> None:
    """Seekable-zstd shards (storage/zstd_seekable.py): one shard per
    partition, each holding whole-line frames of ``lines_per_frame``
    rows — so every frame is independently parseable JSONL and
    ``read_jsonl_seekable`` can plan one task per FRAME instead of per
    shard. Overwrite semantics."""
    import json as _json
    import os
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    cols = df.columns

    def _write_partition(rows) -> None:
        from pyspark import TaskContext

        from hdp2_5_hive2_spark.storage.zstd_seekable import write_seekable

        lines = [
            _json.dumps(dict(zip(cols, r)), ensure_ascii=False, sort_keys=True)
            + "\n"
            for r in rows
        ]
        if not lines:
            return
        chunks = [
            "".join(lines[i : i + lines_per_frame]).encode("utf-8")
            for i in range(0, len(lines), lines_per_frame)
        ]
        pid = TaskContext.get().partitionId()
        with open(os.path.join(path, f"part-{pid:05d}.jsonl.zst"), "wb") as fh:
            fh.write(write_seekable(chunks))

    df.rdd.foreachPartition(_write_partition)


def read_jsonl_seekable(spark, paths: list[str]):
    """(path, frame_idx, line_idx, line) across seekable-zstd shards with
    ONE TASK PER FRAME: planning reads only each file's seek-table
    footer (the ranged-GET pattern); tasks pread and decode just their
    frame's compressed byte range. This is the split-parallel .zst
    path the plain read_jsonl_shards cost model calls out — the same
    discipline as the RCFile sync-marker and Avro sync-aligned splits.
    Requires worker-visible paths (local/NFS; object stores would swap
    the pread for a ranged GET)."""
    import pandas as pd

    from hdp2_5_hive2_spark.storage.zstd_seekable import read_seek_table_file

    splits = []
    for p in paths:
        entries = read_seek_table_file(p)  # two ranged preads, footer only
        if entries is None:
            raise ValueError(f"jsonl shard {p!r} is not seekable-zstd")
        for i, e in enumerate(entries):
            splits.append((p, i, e.c_off, e.c_len, e.d_len, e.checksum))
    sdf = spark.createDataFrame(
        splits,
        "path string, frame_idx int, c_off bigint, c_len bigint, "
        "d_len bigint, checksum bigint",
    ).repartition(max(1, min(len(splits), spark.sparkContext.defaultParallelism)))

    def run(batches):
        from hdp2_5_hive2_spark.storage.zstd_codec import xxh64, zstd_decompress

        for b in batches:
            rows = []
            for path, fi, off, ln, dlen, ck in zip(
                b["path"], b["frame_idx"], b["c_off"], b["c_len"],
                b["d_len"], b["checksum"],
            ):
                with open(path, "rb") as fh:
                    fh.seek(int(off))
                    frame = fh.read(int(ln))
                data = zstd_decompress(frame)
                if len(data) != int(dlen):
                    raise ValueError("seekable zstd corrupt: frame size mismatch")
                if pd.notna(ck) and xxh64(data) & 0xFFFFFFFF != int(ck):
                    raise ValueError(
                        "seekable zstd corrupt: frame checksum mismatch"
                    )
                try:
                    text = data.decode("utf-8")
                except UnicodeDecodeError as exc:
                    raise ValueError(
                        f"jsonl shard corrupt: not UTF-8 ({exc})"
                    ) from None
                for j, lnr in enumerate(x for x in text.split("\n") if x.strip()):
                    rows.append((path, int(fi), j, lnr))
            yield pd.DataFrame(
                rows, columns=["path", "frame_idx", "line_idx", "line"]
            )

    return sdf.mapInPandas(
        run, "path string, frame_idx int, line_idx bigint, line string"
    )
