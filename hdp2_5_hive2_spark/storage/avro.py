"""Apache Avro object-container files, implemented from the public spec.

Parity target: the reference's STORED AS AVRO surface —
ql/src/java/org/apache/hadoop/hive/ql/io/avro/AvroContainerInputFormat.java
/ AvroContainerOutputFormat.java and
serde/src/java/org/apache/hadoop/hive/serde2/avro/AvroSerDe.java (+
AvroSerializer/AvroDeserializer, SchemaToTypeInfo/TypeInfoToSchema) in
/root/reference, exercised by avro_joins.q / avro_evolved_schemas.q /
avro_nullable_fields.q in its clientpositive suite.

Why a from-scratch codec: this container ships Avro CORE jars
(avro-1.12.1) but not the spark-avro datasource module, so
``spark.read.format("avro")`` is unavailable (probed r2/r3/r5). Two paths
exist anyway, the same dual shape as RCFile (storage/rcfile.py):

- **Hive-catalog session (the 100 TB path)**: CREATE EXTERNAL TABLE ...
  STORED AS AVRO + ``spark.table`` / INSERT OVERWRITE — Hive's own
  AvroSerDe + container input/output formats run JVM-side, split-parallel
  (verified working in this container: hive-exec 2.3.10 + avro 1.12 jars).
- **In-memory session**: this module's pure-Python codec, written from the
  published Avro 1.x specification (container layout, zigzag-varint binary
  encoding, deflate/snappy/zstandard codecs, reader/writer schema
  resolution). Fixture and migration scale.

The Hive schema mapping is matched exactly (pinned by the cross-parity
test): one top-level record whose fields are ``["null", T]`` unions with
``"default": null``, logical types date (int), timestamp-millis (long),
decimal (bytes + precision/scale).

Schema evolution on read follows the spec's resolution rules, the
avro_evolved_schemas.q contract: reader fields missing from the writer
take their defaults, writer fields absent from the reader are skipped,
numeric promotions int→long→float→double (and float→double) apply.

Scale notes (100 TB): in a hive-catalog session both read and write are
JVM-side and split-parallel (Avro blocks are sync-delimited, so HDFS-style
splits work natively). The pure-Python paths parallelize per file
(binaryFiles read; one serializer per partition on write) and decode rows
in Python — fixture-scale by design, documented here like the RCFile
in-memory carve-out.
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib
from collections.abc import Iterable, Iterator, Sequence
from datetime import date, datetime, timedelta
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"
_EPOCH_DATE = date(1970, 1, 1)
_EPOCH_TS = datetime(1970, 1, 1)
_MS = timedelta(milliseconds=1)
_US = timedelta(microseconds=1)
_BLOCK_ROWS = 4096

__all__ = [
    "avro_schema_of",
    "parse_avro",
    "read_avro",
    "serialize_avro",
    "spark_schema_of",
    "write_avro",
]


# --------------------------------------------------------------------------
# Binary primitives (Avro spec: zigzag varint longs, IEEE-LE floats)
# --------------------------------------------------------------------------


def _write_long(out: bytearray, n: int) -> None:
    u = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _write_bytes(out: bytearray, b: bytes) -> None:
    _write_long(out, len(b))
    out.extend(b)


def _read_sized(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(buf, pos)
    if pos + n > len(buf):
        raise ValueError("Avro corrupt: truncated bytes/string")
    return buf[pos : pos + n], pos + n


# --------------------------------------------------------------------------
# Schema model
# --------------------------------------------------------------------------

_PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}


class _Node:
    """One Avro schema node. kind ∈ primitives | record | array | map |
    union | fixed | enum; ``logical`` carries date / timestamp-millis /
    timestamp-micros / decimal (+ precision/scale)."""

    __slots__ = (
        "kind",
        "logical",
        "name",
        "fields",
        "items",
        "values",
        "branches",
        "size",
        "symbols",
        "precision",
        "scale",
    )

    def __init__(self, kind: str):
        self.kind = kind
        self.logical = None
        self.name = None
        self.fields: list[tuple[str, _Node, bool, object]] = []
        self.items = None
        self.values = None
        self.branches: list[_Node] = []
        self.size = 0
        self.symbols: list[str] = []
        self.precision = 0
        self.scale = 0


def _parse_schema(js, names: dict[str, _Node] | None = None) -> _Node:
    """JSON schema (str | list | dict) → _Node tree; named types are
    registered so later by-name references resolve."""
    if names is None:
        names = {}
    if isinstance(js, str):
        if js in _PRIMITIVES:
            return _Node(js)
        if js in names:
            return names[js]
        raise ValueError(f"Avro schema: unknown type name {js!r}")
    if isinstance(js, list):
        n = _Node("union")
        n.branches = [_parse_schema(b, names) for b in js]
        return n
    if not isinstance(js, dict):
        raise ValueError(f"Avro schema: unparseable node {js!r}")
    t = js["type"]
    if t in _PRIMITIVES:
        n = _Node(t)
        lt = js.get("logicalType")
        if lt in ("date", "timestamp-millis", "timestamp-micros", "decimal"):
            n.logical = lt
            if lt == "decimal":
                n.precision = int(js.get("precision", 38))
                n.scale = int(js.get("scale", 0))
        return n
    if t == "record":
        n = _Node("record")
        n.name = js.get("name")
        full = js.get("name")
        if js.get("namespace") and full:
            names[f"{js['namespace']}.{full}"] = n
        if full:
            names[full] = n
        for f in js["fields"]:
            n.fields.append(
                (
                    f["name"],
                    _parse_schema(f["type"], names),
                    "default" in f,
                    f.get("default"),
                )
            )
        return n
    if t == "array":
        n = _Node("array")
        n.items = _parse_schema(js["items"], names)
        return n
    if t == "map":
        n = _Node("map")
        n.values = _parse_schema(js["values"], names)
        return n
    if t == "fixed":
        n = _Node("fixed")
        n.name = js.get("name")
        n.size = int(js["size"])
        if js.get("logicalType") == "decimal":
            n.logical = "decimal"
            n.precision = int(js.get("precision", 38))
            n.scale = int(js.get("scale", 0))
        if n.name:
            names[n.name] = n
        return n
    if t == "enum":
        n = _Node("enum")
        n.name = js.get("name")
        n.symbols = list(js["symbols"])
        if n.name:
            names[n.name] = n
        return n
    if isinstance(t, (list, dict)):
        return _parse_schema(t, names)
    raise ValueError(f"Avro schema: unsupported type {t!r}")


def _nonnull_branch(node: _Node) -> _Node:
    for b in node.branches:
        if b.kind != "null":
            return b
    return node.branches[0]


# ---- Spark ↔ Avro schema mapping (Hive AvroSerDe's TypeInfoToSchema) ----


def _avro_type_of(dt: T.DataType) -> object:
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        return "int"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, (T.StringType, T.VarcharType, T.CharType)):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # Hive 2.x TIMESTAMP is wall-clock (NTZ semantics) stored as
        # timestamp-millis; both Spark timestamp flavors map onto it
        return {"type": "long", "logicalType": "timestamp-millis"}
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.ArrayType):
        # elements nullable, like every Hive value position
        return {"type": "array", "items": ["null", _avro_type_of(dt.elementType)]}
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise ValueError("Avro maps require string keys")
        return {"type": "map", "values": ["null", _avro_type_of(dt.valueType)]}
    if isinstance(dt, T.StructType):
        return {
            "type": "record",
            "name": f"rec_{abs(hash(dt.simpleString())) % 10**8}",
            "fields": [
                {
                    "name": f.name,
                    "type": ["null", _avro_type_of(f.dataType)],
                    "default": None,
                }
                for f in dt.fields
            ],
        }
    raise ValueError(f"Avro: unsupported Spark type {dt.simpleString()}")


def avro_schema_of(
    schema: T.StructType, name: str = "hive_record", namespace: str = "default"
) -> str:
    """Spark schema → the Avro record JSON Hive's AvroSerDe generates: every
    column a nullable union with default null (AvroSerDe.java's
    TypeInfoToSchema mapping; pinned by the hive cross-parity test)."""
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "namespace": namespace,
            "fields": [
                {
                    "name": f.name,
                    "type": ["null", _avro_type_of(f.dataType)],
                    "default": None,
                }
                for f in schema.fields
            ],
        }
    )


def _spark_type_of(node: _Node) -> T.DataType:
    if node.kind == "union":
        return _spark_type_of(_nonnull_branch(node))
    if node.logical == "date":
        return T.DateType()
    if node.logical in ("timestamp-millis", "timestamp-micros"):
        return T.TimestampType()
    if node.logical == "decimal":
        return T.DecimalType(node.precision, node.scale)
    return {
        "null": T.NullType(),
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
        "fixed": T.BinaryType(),
        "enum": T.StringType(),
    }.get(node.kind) or (
        T.ArrayType(_spark_type_of(node.items))
        if node.kind == "array"
        else T.MapType(T.StringType(), _spark_type_of(node.values))
        if node.kind == "map"
        else T.StructType(
            [T.StructField(n, _spark_type_of(t), True) for n, t, _, _ in node.fields]
        )
    )


def spark_schema_of(avro_json: str) -> T.StructType:
    """Avro record JSON → Spark StructType (schema inference on read)."""
    root = _parse_schema(json.loads(avro_json))
    if root.kind != "record":
        raise ValueError("Avro: top-level schema must be a record")
    return T.StructType(
        [T.StructField(n, _spark_type_of(t), True) for n, t, _, _ in root.fields]
    )


# --------------------------------------------------------------------------
# Value encode / decode
# --------------------------------------------------------------------------


def _write_value(node: _Node, v, out: bytearray) -> None:
    k = node.kind
    if k == "union":
        if v is None:
            for i, b in enumerate(node.branches):
                if b.kind == "null":
                    _write_long(out, i)
                    return
            raise ValueError("Avro: None for a union without a null branch")
        for i, b in enumerate(node.branches):
            if b.kind != "null":
                _write_long(out, i)
                _write_value(b, v, out)
                return
        raise ValueError("Avro: union has no non-null branch")
    if k == "null":
        return
    if k == "boolean":
        out.append(1 if v else 0)
        return
    if k in ("int", "long"):
        if node.logical == "date":
            v = (v - _EPOCH_DATE).days if isinstance(v, date) else int(v)
        elif node.logical == "timestamp-millis":
            v = (v - _EPOCH_TS) // _MS if isinstance(v, datetime) else int(v)
        elif node.logical == "timestamp-micros":
            v = (v - _EPOCH_TS) // _US if isinstance(v, datetime) else int(v)
        _write_long(out, int(v))
        return
    if k == "float":
        out.extend(struct.pack("<f", float(v)))
        return
    if k == "double":
        out.extend(struct.pack("<d", float(v)))
        return
    if k == "string":
        _write_bytes(out, str(v).encode("utf-8"))
        return
    if k == "bytes":
        if node.logical == "decimal":
            unscaled = int(
                Decimal(v).scaleb(node.scale).to_integral_value()
            )
            blen = max(1, (unscaled.bit_length() + 8) // 8)
            _write_bytes(out, unscaled.to_bytes(blen, "big", signed=True))
            return
        _write_bytes(out, bytes(v))
        return
    if k == "fixed":
        b = bytes(v)
        if len(b) != node.size:
            raise ValueError(f"Avro fixed({node.size}): got {len(b)} bytes")
        out.extend(b)
        return
    if k == "enum":
        _write_long(out, node.symbols.index(v))
        return
    if k == "array":
        seq = list(v)
        if seq:
            _write_long(out, len(seq))
            for item in seq:
                _write_value(node.items, item, out)
        _write_long(out, 0)
        return
    if k == "map":
        entries = list(v.items()) if isinstance(v, dict) else list(v)
        if entries:
            _write_long(out, len(entries))
            for mk, mv in entries:
                _write_bytes(out, str(mk).encode("utf-8"))
                _write_value(node.values, mv, out)
        _write_long(out, 0)
        return
    if k == "record":
        if isinstance(v, dict):
            vals = [v.get(n) for n, _, _, _ in node.fields]
        else:  # Row / tuple, positional
            vals = list(v)
        for (_, ft, _, _), fv in zip(node.fields, vals):
            _write_value(ft, fv, out)
        return
    raise ValueError(f"Avro: cannot encode kind {k}")


def _read_value(node: _Node, buf: bytes, pos: int) -> tuple[object, int]:
    k = node.kind
    if k == "union":
        idx, pos = _read_long(buf, pos)
        return _read_value(node.branches[idx], buf, pos)
    if k == "null":
        return None, pos
    if k == "boolean":
        return buf[pos] != 0, pos + 1
    if k in ("int", "long"):
        n, pos = _read_long(buf, pos)
        if node.logical == "date":
            return _EPOCH_DATE + timedelta(days=n), pos
        if node.logical == "timestamp-millis":
            return _EPOCH_TS + timedelta(milliseconds=n), pos
        if node.logical == "timestamp-micros":
            return _EPOCH_TS + timedelta(microseconds=n), pos
        return n, pos
    if k == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if k == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if k == "string":
        b, pos = _read_sized(buf, pos)
        return b.decode("utf-8"), pos
    if k == "bytes":
        b, pos = _read_sized(buf, pos)
        if node.logical == "decimal":
            unscaled = int.from_bytes(b, "big", signed=True)
            return Decimal(unscaled).scaleb(-node.scale), pos
        return b, pos
    if k == "fixed":
        b = buf[pos : pos + node.size]
        pos += node.size
        if node.logical == "decimal":
            unscaled = int.from_bytes(b, "big", signed=True)
            return Decimal(unscaled).scaleb(-node.scale), pos
        return b, pos
    if k == "enum":
        idx, pos = _read_long(buf, pos)
        return node.symbols[idx], pos
    if k == "array":
        items = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return items, pos
            if n < 0:
                _, pos = _read_long(buf, pos)  # byte size, unused
                n = -n
            for _ in range(n):
                item, pos = _read_value(node.items, buf, pos)
                items.append(item)
    if k == "map":
        m = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return m, pos
            if n < 0:
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                kb, pos = _read_sized(buf, pos)
                mv, pos = _read_value(node.values, buf, pos)
                m[kb.decode("utf-8")] = mv
    if k == "record":
        vals = {}
        for fname, ft, _, _ in node.fields:
            vals[fname], pos = _read_value(ft, buf, pos)
        return vals, pos
    raise ValueError(f"Avro: cannot decode kind {k}")


# ---- reader-schema resolution (spec §"Schema Resolution") ----

_PROMOTE_OK = {
    ("int", "long"),
    ("int", "float"),
    ("int", "double"),
    ("long", "float"),
    ("long", "double"),
    ("float", "double"),
    ("string", "bytes"),
    ("bytes", "string"),
}


def _effective_kind(node: _Node) -> str:
    return _nonnull_branch(node).kind if node.kind == "union" else node.kind


def _default_value(reader_field: _Node, default):
    """JSON default → Python value under the reader field's type."""
    if default is None:
        return None
    k = _effective_kind(reader_field)
    if k in ("int", "long"):
        return int(default)
    if k in ("float", "double"):
        return float(default)
    if k == "bytes":
        return default.encode("latin-1") if isinstance(default, str) else default
    return default


def _convert(v, writer: _Node, reader: _Node):
    """Promote a decoded writer value to the reader's type."""
    if v is None:
        return None
    wk, rk = _effective_kind(writer), _effective_kind(reader)
    wl = (_nonnull_branch(writer) if writer.kind == "union" else writer).logical
    rl = (_nonnull_branch(reader) if reader.kind == "union" else reader).logical
    if wk == rk and wl == rl:
        if wk == "record":
            wrec = _nonnull_branch(writer) if writer.kind == "union" else writer
            rrec = _nonnull_branch(reader) if reader.kind == "union" else reader
            return _resolve_record(v, wrec, rrec)
        return v
    if (wk, rk) in _PROMOTE_OK:
        if rk in ("long",):
            return int(v)
        if rk in ("float", "double"):
            return float(v)
        if rk == "string":
            return v.decode("utf-8") if isinstance(v, (bytes, bytearray)) else str(v)
        if rk == "bytes":
            return v.encode("utf-8") if isinstance(v, str) else v
    raise ValueError(f"Avro resolution: cannot promote {wk} → {rk}")


def _resolve_record(decoded: dict, writer: _Node, reader: _Node) -> dict:
    by_name = {n: (t,) for n, t, _, _ in writer.fields}
    out = {}
    for rname, rtype, has_default, default in reader.fields:
        if rname in by_name:
            out[rname] = _convert(decoded[rname], by_name[rname][0], rtype)
        elif has_default:
            out[rname] = _default_value(rtype, default)
        else:
            raise ValueError(
                f"Avro resolution: reader field {rname!r} missing from the "
                "writer schema and has no default"
            )
    return out


# --------------------------------------------------------------------------
# Container encode / decode
# --------------------------------------------------------------------------


def serialize_avro(
    rows: Iterable[Sequence],
    schema_json: str,
    codec: str = "deflate",
    seed: str = "avro",
) -> bytes:
    """Rows (positional, matching the record's field order) → one Avro
    object-container file: magic, metadata map (avro.schema, avro.codec),
    16-byte sync, then blocks of ≤ _BLOCK_ROWS records each framed as
    (count, byte-size, data, sync). deflate = raw RFC-1951 (wbits=-15)."""
    if codec not in ("null", "deflate", "snappy", "zstandard"):
        raise ValueError(
            f"Avro codec {codec!r} not supported (null|deflate|snappy|zstandard)"
        )
    root = _parse_schema(json.loads(schema_json))
    sync = hashlib.md5(seed.encode("utf-8")).digest()
    out = bytearray(_MAGIC)
    meta = {"avro.schema": schema_json.encode("utf-8"), "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    out.extend(sync)

    block = bytearray()
    count = 0

    def flush() -> None:
        nonlocal block, count
        if not count:
            return
        payload = bytes(block)
        if codec == "deflate":
            co = zlib.compressobj(wbits=-15)
            payload = co.compress(payload) + co.flush()
        elif codec == "snappy":
            # avro spec: raw snappy block + CRC32 of the UNCOMPRESSED bytes
            from hdp2_5_hive2_spark.storage.snappy_codec import snappy_compress

            payload = snappy_compress(payload) + struct.pack(
                ">I", zlib.crc32(payload)
            )
        elif codec == "zstandard":
            # avro spec: one zstd frame per block, no extra CRC (the frame
            # carries its own XXH64 content checksum)
            from hdp2_5_hive2_spark.storage.zstd_codec import zstd_compress

            payload = zstd_compress(payload)
        _write_long(out, count)
        _write_long(out, len(payload))
        out.extend(payload)
        out.extend(sync)
        block, count = bytearray(), 0

    for row in rows:
        _write_value(root, row, block)
        count += 1
        if count >= _BLOCK_ROWS:
            flush()
    flush()
    return bytes(out)


def _parse_header(data: bytes) -> tuple[int, dict[str, bytes], bytes]:
    if data[:4] != _MAGIC:
        raise ValueError("Avro corrupt: bad magic")
    pos, meta = 4, {}
    while True:
        n, pos = _read_long(data, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = _read_long(data, pos)
            n = -n
        for _ in range(n):
            kb, pos = _read_sized(data, pos)
            vb, pos = _read_sized(data, pos)
            meta[kb.decode("utf-8")] = vb
    sync = data[pos : pos + 16]
    return pos + 16, meta, sync


def parse_avro(
    data: bytes, reader_schema_json: str | None = None
) -> Iterator[tuple]:
    """Yield rows (tuples in reader-field order) from one container file's
    bytes. ``reader_schema_json`` activates schema resolution (evolution on
    read); None reads with the writer's own schema."""
    pos, meta, sync = _parse_header(data)
    writer = _parse_schema(json.loads(meta["avro.schema"].decode("utf-8")))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate", "snappy", "zstandard"):
        raise ValueError(
            f"Avro codec {codec!r} not supported (null|deflate|snappy|zstandard)"
        )
    reader = (
        _parse_schema(json.loads(reader_schema_json))
        if reader_schema_json
        else writer
    )
    names = [n for n, _, _, _ in reader.fields]
    end = len(data)
    while pos < end:
        count, pos = _read_long(data, pos)
        size, pos = _read_long(data, pos)
        if pos + size > end:
            raise ValueError("Avro corrupt: truncated block")
        payload = data[pos : pos + size]
        pos += size
        if data[pos : pos + 16] != sync:
            raise ValueError("Avro corrupt: sync mismatch")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec == "snappy":
            from hdp2_5_hive2_spark.storage.snappy_codec import snappy_decompress

            (crc,) = struct.unpack(">I", payload[-4:])
            payload = snappy_decompress(payload[:-4])
            if zlib.crc32(payload) != crc:
                raise ValueError("Avro corrupt: snappy block CRC mismatch")
        elif codec == "zstandard":
            from hdp2_5_hive2_spark.storage.zstd_codec import zstd_decompress

            payload = zstd_decompress(payload)
        p = 0
        for _ in range(count):
            decoded, p = _read_value(writer, payload, p)
            if reader is not writer:
                decoded = _resolve_record(decoded, writer, reader)
            yield tuple(decoded[n] for n in names)
        if p != len(payload):
            raise ValueError("Avro corrupt: block over/under-read")


# --------------------------------------------------------------------------
# Sync-aligned ranged reading (split semantics of Avro's DataFileReader)
# --------------------------------------------------------------------------


def _read_file_long(fh) -> int:
    """Zigzag varint straight off a file handle (≤10 bytes)."""
    shift, acc = 0, 0
    while True:
        b = fh.read(1)
        if not b:
            raise ValueError("Avro corrupt: EOF inside varint")
        v = b[0]
        acc |= (v & 0x7F) << shift
        if not (v & 0x80):
            return (acc >> 1) ^ -(acc & 1)
        shift += 7


def _scan_sync(fh, sync: bytes, start: int, limit: int) -> int:
    """First occurrence of ``sync`` starting at a position in [start, limit);
    -1 if none. Chunked scan with a 15-byte overlap carry — O(chunk) memory."""
    fh.seek(start)
    base = start
    buf = b""
    while True:
        i = buf.find(sync)
        while i >= 0:
            if base + i >= limit:
                return -1
            return base + i
        keep = buf[-15:]
        base += len(buf) - len(keep)
        buf = keep
        if base >= limit:
            return -1
        chunk = fh.read(1 << 20)
        if not chunk:
            return -1
        buf += chunk


def iter_avro_range(
    path: str,
    start: int,
    end: int,
    writer_schema_json: str,
    codec: str,
    sync: bytes,
    reader_schema_json: str | None = None,
) -> Iterator[tuple]:
    """Yield rows from the blocks whose PRECEDING sync marker starts in
    [start, end) — Avro ``DataFileReader.sync()`` split semantics, so
    splits covering [header_end − 16, file_size) partition every block
    exactly once. Needs worker-local ``open()`` (like RCFile's ranged
    reader); task memory is O(block). A spurious sync-pattern match inside
    a block payload is detected by the trailing-sync check and scanning
    resumes one byte later."""
    import os

    writer = _parse_schema(json.loads(writer_schema_json))
    reader = (
        _parse_schema(json.loads(reader_schema_json))
        if reader_schema_json
        else writer
    )
    names = [n for n, _, _, _ in reader.fields]
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        pos = start
        while True:
            q = _scan_sync(fh, sync, pos, end)
            if q < 0:
                return
            # block begins right after the sync at q
            fh.seek(q + 16)
            try:
                count = _read_file_long(fh)
                bsize = _read_file_long(fh)
            except ValueError:
                return  # trailing sync at EOF
            blk_start = fh.tell()
            if count < 0 or bsize < 0 or blk_start + bsize + 16 > size:
                pos = q + 1  # payload coincidence, not a real block boundary
                continue
            payload = fh.read(bsize)
            trailing = fh.read(16)
            if trailing != sync:
                pos = q + 1
                continue
            if codec == "deflate":
                payload = zlib.decompress(payload, wbits=-15)
            elif codec == "snappy":
                from hdp2_5_hive2_spark.storage.snappy_codec import (
                    snappy_decompress,
                )

                (crc,) = struct.unpack(">I", payload[-4:])
                payload = snappy_decompress(payload[:-4])
                if zlib.crc32(payload) != crc:
                    raise ValueError("Avro corrupt: snappy block CRC mismatch")
            elif codec == "zstandard":
                from hdp2_5_hive2_spark.storage.zstd_codec import (
                    zstd_decompress,
                )

                payload = zstd_decompress(payload)
            p = 0
            for _ in range(count):
                decoded, p = _read_value(writer, payload, p)
                if reader is not writer:
                    decoded = _resolve_record(decoded, writer, reader)
                yield tuple(decoded[n] for n in names)
            # next block's preceding sync is this block's trailing one
            pos = blk_start + bsize
            if pos >= end:
                return


# --------------------------------------------------------------------------
# DataFrame-level API (dual-path, same shape as storage/rcfile.py)
# --------------------------------------------------------------------------


def _hive_ddl(schema: T.StructType) -> str:
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)


def write_avro(df: DataFrame, path: str, use_jvm: bool | None = None) -> None:
    """STORED AS AVRO with Hive's schema mapping; overwrite semantics.

    Hive-catalog sessions write through an EXTERNAL ... STORED AS AVRO
    table (AvroContainerOutputFormat, JVM-side — the 100 TB path);
    otherwise the pure-Python serializer runs once per partition
    (deflate-coded)."""
    spark = df.sparkSession
    if use_jvm is None:
        use_jvm = (
            spark.conf.get("spark.sql.catalogImplementation", "in-memory")
            == "hive"
        )
    if use_jvm:
        import uuid

        tag = uuid.uuid4().hex[:12]
        table, view = f"_avro_sink_{tag}", f"_avro_src_{tag}"
        df.createOrReplaceTempView(view)
        try:
            spark.sql(
                f"CREATE EXTERNAL TABLE {table} ({_hive_ddl(df.schema)}) "
                f"STORED AS AVRO LOCATION '{path}'"
            )
            spark.sql(f"INSERT OVERWRITE TABLE {table} SELECT * FROM {view}")
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            spark.catalog.dropTempView(view)
        return

    import os
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    schema_json = avro_schema_of(df.schema)

    def _write_partition(rows) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return  # no header-only files for empty partitions
        import itertools

        blob = serialize_avro(
            itertools.chain([first], it), schema_json, seed=f"{path}:{pid}"
        )
        with open(os.path.join(path, f"part-{pid:05d}.avro"), "wb") as fh:
            fh.write(blob)

    df.rdd.foreachPartition(_write_partition)


def read_avro(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    use_jvm: bool | None = None,
) -> DataFrame:
    """Read an Avro directory, dual-path:

    - **Hive-catalog session**: CREATE EXTERNAL TABLE ... STORED AS AVRO +
      ``spark.table`` (AvroContainerInputFormat / AvroDeserializer,
      JVM-side, split-parallel). ``schema`` (Spark DDL) is the reader
      schema — AvroSerDe applies the same resolution rules on its side.
    - **In-memory session**: the registered Python data source
      (``format("avro_py")``) — one InputPartition per sync-aligned split
      (Avro's own DataFileReader.sync() semantics), O(block) task memory,
      per-file writer schemas resolved to the reader schema. ``schema``
      (DDL) activates reader-schema resolution, None infers the schema
      from the first file's header.
    """
    if use_jvm is None:
        use_jvm = (
            spark.conf.get("spark.sql.catalogImplementation", "in-memory")
            == "hive"
        )
    if use_jvm:
        if schema is None:
            raise ValueError("read_avro: hive path needs an explicit DDL schema")
        import hashlib as _h

        target = T.StructType.fromDDL(schema)
        tag = _h.md5(f"{path}:{schema}".encode("utf-8")).hexdigest()[:12]
        table = f"_avro_scan_{tag}"
        spark.sql(
            f"CREATE EXTERNAL TABLE IF NOT EXISTS {table} ({_hive_ddl(target)}) "
            f"STORED AS AVRO LOCATION '{path}'"
        )
        spark.sql(f"REFRESH TABLE {table}")
        return spark.table(table)

    from hdp2_5_hive2_spark.storage.avro_datasource import read_avro_ds

    return read_avro_ds(spark, path, schema=schema)
