"""EXIF audit + strip (llm/exif.py): IFD parsing through the shared TIFF
reader, GPS detection, and the transcoding-free guarantee — stripping a
real JPEG's metadata leaves the decoded pixels byte-identical."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.llm.exif import build_exif_app1, exif_audit, exif_strip


def _splice_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 right after SOI (the spec position)."""
    assert jpeg[:2] == b"\xff\xd8"
    return jpeg[:2] + app1 + jpeg[2:]


def test_audit_fields_and_gps():
    shell = b"\xff\xd8\xff\xda\x00\x04\x00\x00tail"
    j = _splice_app1(shell, build_exif_app1(6, "ACME Camera Co", with_gps=True))
    a = exif_audit(j)
    assert (a.has_exif, a.has_gps, a.orientation, a.make) == (
        True, True, 6, "ACME Camera Co",
    )
    assert exif_audit(shell) == type(a)(False, False, None, None, None, 0)
    # inline (≤4 byte) ASCII value form
    assert exif_audit(_splice_app1(shell, build_exif_app1(1, "AB"))).make == "AB"
    with pytest.raises(ValueError, match="missing SOI"):
        exif_audit(b"nope")


def test_strip_preserves_pixels_exactly(spark):
    """Real ImageIO-encoded JPEG + spliced EXIF: stripping removes the
    metadata while the T.81 decoder sees byte-identical pixels — the
    no-transcode scrubbing guarantee."""
    from tests.test_media_codecs import _jpeg_tools

    from hdp2_5_hive2_spark.llm.jpeg import jpeg_decode

    encode, _ = _jpeg_tools(spark)
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    clean = encode(px, gray=True)
    tagged = _splice_app1(clean, build_exif_app1(3, "SpyCam", with_gps=True))
    assert exif_audit(tagged).has_gps
    stripped = exif_strip(tagged)
    assert not exif_audit(stripped).has_exif
    assert (jpeg_decode(stripped) == jpeg_decode(clean)).all()
    # other segments (JFIF APP0, quant tables, huffman) all survive
    assert stripped == clean


@settings(max_examples=200, deadline=None)
@given(seed=st.integers(0, 2**31), n_mut=st.integers(1, 8), cut=st.floats(0.05, 1.0))
def test_fuzz_only_valueerror(seed, n_mut, cut):
    import random as _random

    rnd = _random.Random(seed)
    base = bytearray(
        b"\xff\xd8"
        + build_exif_app1(1, "Maker Name Here", with_gps=True)
        + b"\xff\xda\x00\x04\x00\x00" + bytes(range(64))
    )
    for _ in range(n_mut):
        base[rnd.randrange(len(base))] = rnd.randrange(256)
    blob = bytes(base)[: max(2, int(len(base) * cut))]
    for fn in (exif_audit, exif_strip):
        try:
            fn(blob)
        except ValueError:
            pass
