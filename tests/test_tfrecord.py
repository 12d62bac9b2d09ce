"""TFRecord + Example codec (llm/tfrecord.py): public CRC-32C test
vectors (RFC 3720), framing + protobuf roundtrips, checksum corruption
detection, the Spark long-form reader, and fuzz."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.llm.tfrecord import (
    crc32c,
    example_decode,
    example_encode,
    read_tfrecord,
    tfrecord_read,
    tfrecord_write,
)


def test_crc32c_public_vectors():
    """RFC 3720 appendix test patterns — an independent ground truth for
    the checksum implementation."""
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E


@settings(max_examples=40, deadline=None)
@given(
    recs=st.lists(
        st.dictionaries(
            st.text(min_size=1, max_size=8),
            st.one_of(
                st.lists(st.binary(max_size=50), min_size=1, max_size=4),
                st.lists(st.integers(-(1 << 62), 1 << 62), min_size=1, max_size=6),
                st.lists(
                    st.floats(width=32, allow_nan=False, allow_infinity=False),
                    min_size=1, max_size=6,
                ),
            ),
            min_size=1, max_size=4,
        ),
        min_size=1, max_size=5,
    )
)
def test_framing_property_roundtrip(recs):
    back = tfrecord_read(tfrecord_write(recs))
    assert len(back) == len(recs)
    for got, want in zip(back, recs):
        assert set(got) == set(want)
        for k, v in want.items():
            assert got[k] == v


def test_checksums_catch_every_byte():
    blob = tfrecord_write([{"a": [b"payload bytes here"], "b": [1, 2, 3]}])
    for i in range(len(blob)):
        bad = bytearray(blob)
        bad[i] ^= 0x01
        with pytest.raises(ValueError):
            tfrecord_read(bytes(bad))


@settings(max_examples=150, deadline=None)
@given(seed=st.integers(0, 2**31), n_mut=st.integers(1, 8), cut=st.floats(0.02, 1.0))
def test_fuzz_only_valueerror(seed, n_mut, cut):
    import random as _random

    rnd = _random.Random(seed)
    data = bytearray(tfrecord_write([{"x": [b"abc" * 30]}, {"y": [1.5, 2.5]}]))
    for _ in range(n_mut):
        data[rnd.randrange(len(data))] = rnd.randrange(256)
    blob = bytes(data)[: max(1, int(len(data) * cut))]
    try:
        tfrecord_read(blob)
    except ValueError:
        pass


def test_spark_reader(spark, tmp_path):
    recs = [
        {"text": [f"doc {i}".encode()], "id": [i], "w": [i / 4.0]}
        for i in range(10)
    ]
    p = str(tmp_path / "train-00000.tfrecord")
    with open(p, "wb") as f:
        f.write(tfrecord_write(recs))
    rows = read_tfrecord(spark, [p]).collect()
    by = {(r.record_idx, r.key): r for r in rows}
    assert len(by) == 30
    assert bytes(by[(7, "text")].v_bytes) == b"doc 7"
    assert by[(7, "id")].v_ints == [7]
    assert by[(7, "w")].v_floats == [1.75]
    assert {r.kind for r in rows} == {"bytes", "int64", "float"}
