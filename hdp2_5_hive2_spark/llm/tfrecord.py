"""TFRecord + tf.train.Example codec from the public wire formats.

The TensorFlow-side exchange format for training data: a TFRecord file
is a sequence of records framed as

    u64le length | u32le masked_crc32c(length) | data | u32le masked_crc32c(data)

with CRC32C (Castagnoli) and the published mask rotation; `data` is a
serialized ``tf.train.Example`` protobuf. Both layers here are written
from their public specifications — the TFRecord framing documented with
TensorFlow's data format, and the protobuf WIRE encoding (varints,
length-delimited fields, packed repeated scalars) applied to the
``Example``/``Features``/``Feature`` message shapes:

    Example{1: Features}  Features{1: map<string, Feature>}
    Feature{oneof 1: BytesList, 2: FloatList, 3: Int64List}
    *List{1: repeated bytes | packed float | packed int64}

Every record's BOTH checksums are verified on read (ValueError on
mismatch — hostile-input contract). The Spark reader fans one task per
file and emits long-form (record, key, kind, values) rows, the shape
that joins/pivots cleanly; the writer is byte-deterministic (sorted
feature keys) for reproducible exports.
"""

from __future__ import annotations

import struct

__all__ = [
    "crc32c",
    "tfrecord_write",
    "tfrecord_read",
    "example_encode",
    "example_decode",
    "read_tfrecord",
]

_CRC_TABLE = None


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli, reflected poly 0x82F63B78), table-driven."""
    global _CRC_TABLE
    if _CRC_TABLE is None:
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            tbl.append(c)
        _CRC_TABLE = tbl
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# protobuf wire helpers
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, pos: int):
    v = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("protobuf corrupt: truncated varint")
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 63:
            raise ValueError("protobuf corrupt: varint too long")


def _field(num: int, wire: int, payload: bytes) -> bytes:
    head = _varint((num << 3) | wire)
    if wire == 2:
        return head + _varint(len(payload)) + payload
    return head + payload


def _iter_fields(data: bytes):
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        num, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = _read_varint(data, pos)
            yield num, wire, v
        elif wire == 2:
            ln, pos = _read_varint(data, pos)
            if pos + ln > len(data):
                raise ValueError("protobuf corrupt: truncated field")
            yield num, wire, data[pos : pos + ln]
            pos += ln
        elif wire == 5:
            if pos + 4 > len(data):
                raise ValueError("protobuf corrupt: truncated fixed32")
            yield num, wire, data[pos : pos + 4]
            pos += 4
        elif wire == 1:
            if pos + 8 > len(data):
                raise ValueError("protobuf corrupt: truncated fixed64")
            yield num, wire, data[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"protobuf corrupt: wire type {wire}")


# ---------------------------------------------------------------------------
# tf.train.Example
# ---------------------------------------------------------------------------


def example_encode(features: dict) -> bytes:
    """{key: bytes | str | [bytes] | [int] | [float]} → serialized
    Example. Keys sorted for byte-deterministic output."""
    entries = b""
    for key in sorted(features):
        val = features[key]
        if isinstance(val, (bytes, str)):
            val = [val.encode() if isinstance(val, str) else val]
        if not isinstance(val, (list, tuple)) or not val:
            raise ValueError(f"tfrecord: empty/unsupported value for {key!r}")
        if isinstance(val[0], (bytes, str)):
            items = b"".join(
                _field(1, 2, v.encode() if isinstance(v, str) else v) for v in val
            )
            feat = _field(1, 2, items)  # BytesList
        elif isinstance(val[0], bool):
            raise ValueError("tfrecord: bool features unsupported")
        elif isinstance(val[0], int):
            packed = b"".join(_varint(v & 0xFFFFFFFFFFFFFFFF) for v in val)
            feat = _field(3, 2, _field(1, 2, packed))  # Int64List packed
        elif isinstance(val[0], float):
            packed = b"".join(struct.pack("<f", v) for v in val)
            feat = _field(2, 2, _field(1, 2, packed))  # FloatList packed
        else:
            raise ValueError(f"tfrecord: unsupported value type for {key!r}")
        entry = _field(1, 2, key.encode()) + _field(2, 2, feat)
        entries += _field(1, 2, entry)  # Features.feature map entry
    return _field(1, 2, entries)  # Example.features


def example_decode(data: bytes) -> dict:
    """Serialized Example → {key: [bytes] | [int] | [float]}."""
    out: dict = {}
    for num, wire, feats in _iter_fields(data):
        if num != 1 or wire != 2:
            continue
        for enum, ewire, entry in _iter_fields(feats):
            if enum != 1 or ewire != 2:
                continue
            key = None
            value: list | None = None
            for fnum, fwire, fval in _iter_fields(entry):
                if fnum == 1 and fwire == 2:
                    key = fval.decode("utf-8", "replace")
                elif fnum == 2 and fwire == 2:
                    for lnum, lwire, lval in _iter_fields(fval):
                        if lnum == 1 and lwire == 2:  # BytesList
                            value = [
                                v for n, w, v in _iter_fields(lval)
                                if n == 1 and w == 2
                            ]
                        elif lnum == 2 and lwire == 2:  # FloatList packed
                            inner = next(
                                (v for n, w, v in _iter_fields(lval) if n == 1),
                                b"",
                            )
                            if len(inner) % 4:
                                raise ValueError("protobuf corrupt: float list")
                            value = [
                                struct.unpack_from("<f", inner, i)[0]
                                for i in range(0, len(inner), 4)
                            ]
                        elif lnum == 3 and lwire == 2:  # Int64List packed
                            inner = next(
                                (v for n, w, v in _iter_fields(lval) if n == 1),
                                b"",
                            )
                            vals, pos = [], 0
                            while pos < len(inner):
                                v, pos = _read_varint(inner, pos)
                                vals.append(v - (1 << 64) if v >> 63 else v)
                            value = vals
            if key is not None and value is not None:
                out[key] = value
    return out


# ---------------------------------------------------------------------------
# TFRecord framing
# ---------------------------------------------------------------------------


def tfrecord_write(examples: list[dict]) -> bytes:
    out = bytearray()
    for features in examples:
        data = example_encode(features)
        lb = struct.pack("<Q", len(data))
        out += lb
        out += struct.pack("<I", _masked(crc32c(lb)))
        out += data
        out += struct.pack("<I", _masked(crc32c(data)))
    return bytes(out)


def tfrecord_read(data: bytes) -> list[dict]:
    """Both checksums verified per record."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("TFRecord corrupt: truncated header")
        lb = data[pos : pos + 8]
        (length,) = struct.unpack("<Q", lb)
        (lcrc,) = struct.unpack_from("<I", data, pos + 8)
        if _masked(crc32c(lb)) != lcrc:
            raise ValueError("TFRecord corrupt: length checksum mismatch")
        pos += 12
        if pos + length + 4 > n:
            raise ValueError("TFRecord corrupt: truncated record")
        payload = data[pos : pos + length]
        (dcrc,) = struct.unpack_from("<I", data, pos + length)
        if _masked(crc32c(payload)) != dcrc:
            raise ValueError("TFRecord corrupt: data checksum mismatch")
        pos += length + 4
        out.append(example_decode(payload))
    return out


def read_tfrecord(spark, paths: list[str], parallelism: int | None = None):
    """(path, record_idx, key, kind, v_bytes, v_ints, v_floats) rows —
    one task per file, checksums verified, long-form features."""
    import pandas as pd

    pdf = spark.createDataFrame([(p,) for p in paths], "path string")
    if parallelism:
        pdf = pdf.repartition(parallelism)

    cols = ["path", "record_idx", "key", "kind", "v_bytes", "v_ints", "v_floats"]

    def run(batches):
        for b in batches:
            rows = []
            for path in b["path"]:
                with open(path, "rb") as fh:
                    examples = tfrecord_read(fh.read())
                for i, ex in enumerate(examples):
                    for key, val in ex.items():
                        if val and isinstance(val[0], bytes):
                            rows.append((path, i, key, "bytes", val[0], None, None))
                        elif val and isinstance(val[0], float):
                            rows.append((path, i, key, "float", None, None, val))
                        else:
                            rows.append((path, i, key, "int64", None, val, None))
            yield pd.DataFrame(rows, columns=cols)

    return pdf.mapInPandas(
        run,
        "path string, record_idx int, key string, kind string, "
        "v_bytes binary, v_ints array<bigint>, v_floats array<float>",
    )
