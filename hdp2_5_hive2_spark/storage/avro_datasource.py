"""Avro as a first-class Spark data source: ``spark.read.format("avro_py")``.

Same shape as the RCFile source (storage/rcfile_datasource.py): one
InputPartition per sync-aligned byte range (Avro ``DataFileReader.sync()``
split semantics via ``iter_avro_range``), so a directory of files — or one
monolithic container — fans out across executors with O(block) task
memory. This is the in-memory-session scale path for Avro reads;
hive-catalog sessions keep the JVM AvroSerDe route
(``read_avro(use_jvm=True)``).

Unlike RCFile (text cells), Avro is TYPED: the source emits the reader
schema's real types (int/long/double/string/bytes/boolean/date/timestamp/
decimal/arrays/maps/structs), with per-file writer schemas resolved to the
engine schema by the spec's resolution rules — so a directory of files
written under EVOLVED schemas reads uniformly (the
avro_evolved_schemas.q contract, now split-parallel).

The name is ``avro_py`` because Spark reserves ``avro`` for its built-in
(absent) module and refuses to shadow it.

Filter pushdown is deliberately NOT implemented: Spark 4.1's Python-source
``pushFilters`` (off by default) reuses the MOST RECENT scan — with its
consumed filters — for later filterless plans over the same loaded
relation, silently dropping rows (verified empirically; see
tests/test_avro.py::test_filterless_reuse_returns_all_rows). Predicates
evaluate engine-side above the scan, which is always correct.

Reference parity: ql/io/avro/AvroContainerInputFormat.java (which wraps
org.apache.avro.mapred.AvroRecordReader — the same sync-seek split
semantics re-implemented here).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from hdp2_5_hive2_spark.storage.avro import (
    _parse_header,
    avro_schema_of,
    iter_avro_range,
    spark_schema_of,
)

_HEADER_PROBE = 1 << 20  # header = magic + metadata map (schema JSON) + sync


class AvroSplit(InputPartition):
    def __init__(
        self,
        path: str,
        start: int,
        end: int,
        writer_schema_json: str,
        codec: str,
        sync: bytes,
        reader_schema_json: str | None,
    ) -> None:
        self.path = path
        self.start = start
        self.end = end
        self.writer_schema_json = writer_schema_json
        self.codec = codec
        self.sync = sync
        self.reader_schema_json = reader_schema_json


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
        )
    return [path]


def _probe(path: str):
    with open(path, "rb") as fh:
        header_end, meta, sync = _parse_header(fh.read(_HEADER_PROBE))
    return (
        header_end,
        meta["avro.schema"].decode("utf-8"),
        meta.get("avro.codec", b"null").decode("utf-8"),
        sync,
    )


class AvroDataSource(DataSource):
    """``spark.dataSource.register(AvroDataSource)`` then
    ``spark.read.format("avro_py").load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self) -> str:
        ddl = self.options.get("ddl")
        if ddl:
            return ddl
        for f in _list_files(self.options["path"]):
            if os.path.getsize(f) <= 4:
                continue
            _, schema_json, _, _ = _probe(f)
            st = spark_schema_of(schema_json)
            return ", ".join(
                f"`{fl.name}` {fl.dataType.simpleString()}" for fl in st.fields
            )
        raise ValueError("avro_py: no non-empty files under path, pass ddl option")

    def reader(self, schema) -> "AvroReader":
        return AvroReader(schema, self.options)


class AvroReader(DataSourceReader):
    def __init__(self, schema, options) -> None:
        self._schema = schema
        self._options = options

    def partitions(self) -> Sequence[AvroSplit]:
        path = self._options["path"]
        split_size = int(self._options.get("split_size", 64 << 20))
        if split_size <= 0:
            raise ValueError("split_size must be positive")
        reader_json = avro_schema_of(self._schema)
        parts: list[AvroSplit] = []
        for f in _list_files(path):
            size = os.path.getsize(f)
            if size <= 4:
                continue
            header_end, writer_json, codec, sync = _probe(f)
            # ranges over PRECEDING-SYNC start positions: the first block's
            # sync is the header's trailing one at header_end - 16
            lo = header_end - 16
            span = size - lo
            n = max(1, (span + split_size - 1) // split_size)
            step = (span + n - 1) // n
            for i in range(n):
                parts.append(
                    AvroSplit(
                        f,
                        lo + i * step,
                        min(lo + (i + 1) * step, size),
                        writer_json,
                        codec,
                        sync,
                        # identical schemas skip the resolution pass
                        None
                        if json.loads(writer_json) == json.loads(reader_json)
                        else reader_json,
                    )
                )
        if not parts:
            return [AvroSplit("", 0, 0, "", "null", b"", None)]
        return parts

    def read(self, partition: AvroSplit) -> Iterator[tuple]:
        if not partition.path:
            return
        yield from iter_avro_range(
            partition.path,
            partition.start,
            partition.end,
            partition.writer_schema_json,
            partition.codec,
            partition.sync,
            partition.reader_schema_json,
        )


def read_avro_ds(spark, path: str, schema: str | None = None, split_size: int = 64 << 20):
    """Split-parallel Avro read through the registered Python data source.
    ``schema`` (Spark DDL) is the reader schema for evolution-on-read; None
    infers from the first file's header."""
    try:
        spark.dataSource.register(AvroDataSource)
    except Exception:
        pass  # already registered
    reader = spark.read.format("avro_py").option("split_size", str(split_size))
    if schema is not None:
        reader = reader.option("ddl", schema).schema(schema)
    return reader.load(path)
