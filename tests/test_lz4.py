"""LZ4 block codec (storage/lz4_codec.py): property roundtrips, Hadoop
framing, and cross-parity against lz4-java (net.jpountz) both ways."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.storage.lz4_codec import (
    hadoop_lz4_compress,
    hadoop_lz4_decompress,
    lz4_compress,
    lz4_decompress,
)


@settings(max_examples=60, deadline=None)
@given(
    data=st.one_of(
        st.binary(max_size=4000),
        st.builds(
            lambda chunk, reps: chunk * reps,
            st.binary(min_size=1, max_size=40),
            st.integers(1, 200),
        ),
    )
)
def test_block_property_roundtrip(data):
    assert lz4_decompress(lz4_compress(data), len(data)) == data
    assert hadoop_lz4_decompress(hadoop_lz4_compress(data)) == data


def test_corrupt_raises():
    good = lz4_compress(b"a" * 100)
    with pytest.raises(ValueError, match="corrupt"):
        lz4_decompress(good[:-3], 100)
    with pytest.raises(ValueError, match="corrupt"):
        lz4_decompress(b"\x12\x00\xff\xff", 50)
    with pytest.raises(ValueError, match="corrupt"):
        hadoop_lz4_decompress(b"\x00\x00\x00\x10\x00\x00")


def test_lz4_java_cross_parity(spark):
    """Our blocks decompress through net.jpountz and its blocks through
    us — an implementation we didn't write, on content with matches,
    runs, and incompressible spans."""
    jvm = spark._jvm
    factory = jvm.net.jpountz.lz4.LZ4Factory.fastestInstance()
    jcomp = factory.fastCompressor()
    jdec = factory.fastDecompressor()

    import numpy as np

    rng = np.random.default_rng(7)
    cases = [
        b"",
        b"short",
        b"the quick brown fox " * 500,
        bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
        bytes(rng.integers(0, 4, 8000, dtype=np.uint8)),
        (b"ABCD" * 7)[:27] + bytes(rng.integers(0, 256, 100, dtype=np.uint8)),
    ]
    for data in cases:
        # python → java
        ours = lz4_compress(data)
        got = bytes(jdec.decompress(bytearray(ours), len(data)))
        assert got == data, "java failed to read our block"
        # java → python
        theirs = bytes(jcomp.compress(bytearray(data)))
        assert lz4_decompress(theirs, len(data)) == data, (
            "we failed to read lz4-java's block"
        )


def test_rcfile_lz4_codec_roundtrip():
    """RCFile with Hadoop's Lz4Codec: serialize + parse through the
    pure-Python container paths."""
    from hdp2_5_hive2_spark.storage.rcfile import parse_rcfile, serialize_rcfile

    rows = [
        (str(i), f"payload-{i % 13}", None if i % 7 == 0 else "x" * (i % 29))
        for i in range(3000)
    ]
    blob = serialize_rcfile(
        rows, ncols=3,
        codec="org.apache.hadoop.io.compress.Lz4Codec", record_interval=23,
    )
    assert list(parse_rcfile(blob)) == rows
