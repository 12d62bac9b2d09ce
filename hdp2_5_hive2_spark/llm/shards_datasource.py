"""JSONL corpus shards as a first-class Spark data source:
``spark.read.format("jsonlshards").load(path)``.

Same shape as the RCFile/Avro sources (storage/rcfile_datasource.py,
storage/avro_datasource.py): Catalyst plans one InputPartition per unit
of independent work — per FRAME for seekable-zstd shards (footer-only
planning via two ranged preads, storage/zstd_seekable.py), per FILE for
plain/gz/zst/bz2/xz members (not random-access, the honest split).
Rows are ``(path, frame_idx, line_idx, line)``; JSON field extraction
belongs downstream in codegen (``get_json_object``/``from_json``), the
same division of labor as llm/corpus_shards.py's functional API.

Filter pushdown is deliberately NOT implemented — the same Spark 4.1
Python-source scan-reuse hazard the RCFile/Avro sources document
(consumed filters leak into later filterless scans of the same
relation); predicates evaluate engine-side above the scan.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_SCHEMA = "path string, frame_idx int, line_idx bigint, line string"


class ShardSplit(InputPartition):
    def __init__(
        self,
        path: str,
        frame_idx: int,
        c_off: int,
        c_len: int,
        d_len: int,
        checksum: int | None,
    ) -> None:
        self.path = path
        self.frame_idx = frame_idx  # -1 = whole-member file
        self.c_off = c_off
        self.c_len = c_len
        self.d_len = d_len
        self.checksum = checksum


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
        )
    return [path]


class JsonlShardsDataSource(DataSource):
    """``spark.dataSource.register(JsonlShardsDataSource)`` then
    ``spark.read.format("jsonlshards").load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonlshards"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "JsonlShardsReader":
        return JsonlShardsReader(self.options)


class JsonlShardsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self._options = options

    def partitions(self) -> Sequence[ShardSplit]:
        from hdp2_5_hive2_spark.storage.zstd_seekable import read_seek_table_file

        parts: list[ShardSplit] = []
        for f in _list_files(self._options["path"]):
            size = os.path.getsize(f)
            if size == 0:
                continue
            entries = read_seek_table_file(f) if size >= 17 else None
            if entries is not None:
                for i, e in enumerate(entries):
                    parts.append(
                        ShardSplit(f, i, e.c_off, e.c_len, e.d_len, e.checksum)
                    )
            else:
                parts.append(ShardSplit(f, -1, 0, size, -1, None))
        if not parts:
            return [ShardSplit("", -1, 0, 0, -1, None)]
        return parts

    def read(self, partition: ShardSplit) -> Iterator[tuple]:
        if not partition.path:
            return
        from hdp2_5_hive2_spark.llm.corpus_shards import split_jsonl
        from hdp2_5_hive2_spark.storage.zstd_codec import xxh64, zstd_decompress

        if partition.frame_idx < 0:
            with open(partition.path, "rb") as fh:
                lines = split_jsonl(fh.read())
            for j, ln in enumerate(lines):
                yield (partition.path, 0, j, ln)
            return
        with open(partition.path, "rb") as fh:
            fh.seek(partition.c_off)
            frame = fh.read(partition.c_len)
        data = zstd_decompress(frame)
        if len(data) != partition.d_len:
            raise ValueError("seekable zstd corrupt: frame size mismatch")
        if (
            partition.checksum is not None
            and xxh64(data) & 0xFFFFFFFF != partition.checksum
        ):
            raise ValueError("seekable zstd corrupt: frame checksum mismatch")
        try:
            text = data.decode("utf-8")
        except UnicodeDecodeError as exc:
            raise ValueError(f"jsonl shard corrupt: not UTF-8 ({exc})") from None
        j = 0
        for ln in text.split("\n"):
            if ln.strip():
                yield (partition.path, partition.frame_idx, j, ln)
                j += 1


def read_shards_ds(spark, path: str):
    """Register-and-load convenience, mirroring read_avro_ds."""
    try:
        spark.dataSource.register(JsonlShardsDataSource)
    except Exception:
        pass  # already registered
    return spark.read.format("jsonlshards").load(path)


class _ShardsStreamReader(SimpleDataSourceStreamReader):
    """SimpleDataSourceStreamReader over a landing directory: each
    micro-batch picks up shard files not yet committed. The offset is
    the sorted list of consumed filenames — the same full-log design as
    Spark's own FileStreamSource (whose seen-files map also grows with
    the file count); a production variant would age entries out behind
    a watermark exactly as FileStreamSource.maxFileAge does.
    readBetweenOffsets replays a committed batch deterministically from
    the filename delta, giving exactly-once file-level semantics across
    restarts."""

    def __init__(self, options) -> None:
        self._path = options["path"]

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _rows_for(self, files):
        from hdp2_5_hive2_spark.llm.corpus_shards import split_jsonl

        for f in files:
            with open(os.path.join(self._path, f), "rb") as fh:
                lines = split_jsonl(fh.read())
            for j, ln in enumerate(lines):
                yield (os.path.join(self._path, f), 0, j, ln)

    def read(self, start: dict):
        seen = set(start["seen"])
        now = [
            f
            for f in sorted(os.listdir(self._path))
            if not f.startswith((".", "_")) and f not in seen
        ] if os.path.isdir(self._path) else []
        end = {"seen": sorted(seen | set(now))}
        # a LIST, not a generator: the engine's prefetch cache copies the
        # iterator (copy.copy), which generators do not support
        return list(self._rows_for(now)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        delta = sorted(set(end["seen"]) - set(start["seen"]))
        return list(self._rows_for(delta))

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint log


class JsonlShardsStreamSource(DataSource):
    """``spark.readStream.format("jsonlshardstream").load(path)`` — the
    streaming front door: shards landing in a directory become
    micro-batches of (path, frame_idx, line_idx, line), feeding the
    streaming dedup gates (streaming/corpus.py) exactly as the batch
    reader feeds the batch pipeline."""

    @classmethod
    def name(cls) -> str:
        return "jsonlshardstream"

    def schema(self) -> str:
        return _SCHEMA

    def simpleStreamReader(self, schema) -> _ShardsStreamReader:
        return _ShardsStreamReader(self.options)
