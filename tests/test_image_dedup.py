"""dHash perceptual image dedup (llm/image_dedup.py): bit packing, codec
invariance (same pixels through PNG vs BMP vs imageio-PNG hash
identically), resize robustness, pigeonhole recall guarantee, and the
banded Spark pair join."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.llm.image_dedup import (
    _to_gray_9x8,
    dhash_bands,
    dhash_near_dup_pairs,
    image_dhash,
)
from hdp2_5_hive2_spark.llm.media_codecs import bmp_encode, png_encode


def test_dhash_bit_packing():
    # strictly increasing rows → every comparison true → all bits set
    inc = np.tile(np.arange(9), (8, 1))
    assert dhash_bands(inc) == (0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF)
    # strictly decreasing → no bits
    assert dhash_bands(inc[:, ::-1]) == (0, 0, 0, 0)
    # single comparison: row 3 (band 1, odd row → bit (1*8 + x))
    v = np.zeros((8, 9), dtype=np.int64)
    v[3, 5] = 1  # gray[3,4] < gray[3,5] → x=4 → bit 12 of band 1
    assert dhash_bands(v) == (0, 1 << 12, 0, 0)
    with pytest.raises(ValueError, match="expects"):
        dhash_bands(np.zeros((9, 8)))


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31))
def test_codec_invariance(seed):
    """The SAME pixels reach the same hash through different containers —
    the property that makes dHash catch re-encoded duplicates."""
    rng = np.random.default_rng(seed)
    gray = rng.integers(0, 256, (8, 9), dtype=np.uint8)
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    h_png = dhash_bands(_to_gray_9x8(png_encode(gray)))
    h_bmp = dhash_bands(_to_gray_9x8(bmp_encode(rgb)))
    assert h_png == h_bmp == dhash_bands(gray.astype(np.int64))


def test_resize_invariance_and_luma():
    """A 4x-upscaled (nearest-neighbor) copy hashes identically — mild
    rescaling is the transformation perceptual hashing must survive."""
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (8, 9), dtype=np.uint8)
    big = gray[np.arange(32) // 4][:, np.arange(36) // 4]
    assert dhash_bands(_to_gray_9x8(png_encode(big))) == dhash_bands(
        gray.astype(np.int64)
    )
    # RGB luma: pure-red vs pure-blue differ, constant luma rows compare flat
    red = np.zeros((8, 9, 3), dtype=np.uint8)
    red[:, :, 0] = 200
    assert dhash_bands(_to_gray_9x8(png_encode(red))) == (0, 0, 0, 0)
    with pytest.raises(ValueError, match="unsupported payload"):
        _to_gray_9x8(b"not an image")


def test_pigeonhole_recall_and_band_join(spark):
    """Planted duplicates: doc 0/1 identical (hamming 0), doc 2 differs
    from 0 by one bit-flip in band 3, doc 3 is the bit-complement of 0
    (hamming 64 — must NOT pair with 0/1/2). The banded join must find
    exactly the close pairs with exact distances."""
    rng = np.random.default_rng(8)
    base = rng.integers(0, 256, (8, 9), dtype=np.uint8)
    tweak = base.copy()
    # flip one comparison in row 7 (band 3): make [7,0] vs [7,1] invert
    tweak[7, 0], tweak[7, 1] = tweak[7, 1], tweak[7, 0]
    anti = base[:, ::-1].copy()  # reversed columns → complemented-ish bits
    imgs = [(0, png_encode(base)), (1, png_encode(base)),
            (2, png_encode(tweak)), (3, png_encode(anti))]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in imgs], "id long, payload binary"
    )
    hashes = image_dhash(df, "id", "payload")
    rows = {
        (r.id_a, r.id_b): r.hamming
        for r in dhash_near_dup_pairs(hashes, "id", max_hamming=6).collect()
    }
    assert rows[(0, 1)] == 0
    assert rows[(0, 2)] == rows[(1, 2)] and 1 <= rows[(0, 2)] <= 2
    assert not any(3 in pair for pair in rows)


def test_hot_bucket_cap(spark):
    """max_bucket drops degenerate buckets: 10 identical flat images all
    share every band, so a cap below 10 suppresses the flat cluster while
    a distinctive duplicate pair (in buckets of size 2) survives."""
    rng = np.random.default_rng(4)
    flat = np.zeros((8, 9), dtype=np.uint8)
    textured = rng.integers(0, 256, (8, 9), dtype=np.uint8)
    imgs = [(i, png_encode(flat)) for i in range(10)]
    imgs += [(10, png_encode(textured)), (11, png_encode(textured))]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in imgs], "id long, payload binary"
    )
    hashes = image_dhash(df, "id", "payload")
    capped = {
        (r.id_a, r.id_b)
        for r in dhash_near_dup_pairs(hashes, "id", max_bucket=8).collect()
    }
    assert capped == {(10, 11)}
    uncapped = dhash_near_dup_pairs(hashes, "id").count()
    assert uncapped == 45 + 1  # all flat pairs + the textured pair
