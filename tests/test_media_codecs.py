"""From-spec PNG/BMP/WAV codecs: property roundtrips, independent
cross-parity against javax.imageio (a PNG implementation we don't control,
whose adaptive per-row filters exercise the Sub/Up/Average/Paeth decode
paths our filter-0 encoder never emits), and the Codec-seam integration
with the multimodal pipeline."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.llm import multimodal
from hdp2_5_hive2_spark.llm.media_codecs import (
    PixelCodec,
    bmp_decode,
    bmp_encode,
    png_decode,
    png_encode,
    resize_nearest,
    resize_png_images,
    wav_decode,
    wav_encode,
)

_dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


@settings(max_examples=30, deadline=None)
@given(dims=_dims, ch=st.sampled_from([1, 2, 3, 4]), seed=st.integers(0, 2**31))
def test_png_property_roundtrip(dims, ch, seed):
    h, w = dims
    px = np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)
    back = png_decode(png_encode(px))
    assert back.shape == (h, w, ch) and (back == px).all()


@settings(max_examples=20, deadline=None)
@given(dims=_dims, seed=st.integers(0, 2**31))
def test_bmp_property_roundtrip(dims, seed):
    h, w = dims
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (bmp_decode(bmp_encode(px)) == px).all()


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 2000),
    channels=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31),
)
def test_wav_property_roundtrip(n, channels, rate, seed):
    rng = np.random.default_rng(seed)
    shape = (n,) if channels == 1 else (n, channels)
    s = rng.integers(-32768, 32768, shape, dtype=np.int16)
    back, r = wav_decode(wav_encode(s, rate))
    assert r == rate and back.shape == s.shape and (back == s).all()


def test_png_corrupt_raises():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    good = png_encode(px)
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JUNK" + good[4:])
    bad = bytearray(good)
    bad[20] ^= 0xFF  # inside IHDR body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(bad))


def _jvm_codec(spark):
    jvm = spark._jvm

    def j_decode(png_bytes: bytes) -> np.ndarray:
        img = jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(png_bytes)
        )
        w, h = img.getWidth(), img.getHeight()
        out = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                rgb = img.getRGB(x, y)
                out[y, x] = [(rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF]
        return out

    def j_encode(px: np.ndarray) -> bytes:
        h, w, _ = px.shape
        BI = jvm.java.awt.image.BufferedImage
        img = BI(w, h, BI.TYPE_INT_RGB)
        for y in range(h):
            for x in range(w):
                r, g, b = int(px[y, x, 0]), int(px[y, x, 1]), int(px[y, x, 2])
                img.setRGB(x, y, (r << 16) | (g << 8) | b)
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.javax.imageio.ImageIO.write(img, "png", baos)
        return bytes(baos.toByteArray())

    return j_decode, j_encode


def test_imageio_cross_parity(spark):
    """Independent-implementation check both directions, including a smooth
    gradient (ImageIO's encoder picks content-adaptive filters there)."""
    j_decode, j_encode = _jvm_codec(spark)
    rng = np.random.default_rng(7)
    noisy = rng.integers(0, 256, (12, 10, 3), dtype=np.uint8)
    grad = (np.add.outer(np.arange(40), np.arange(40)) % 256).astype(np.uint8)
    smooth = np.stack([grad, grad.T, 255 - grad], axis=2)
    for px in (noisy, smooth):
        assert (j_decode(png_encode(px)) == px).all(), "py->imageio"
        assert (png_decode(j_encode(px)) == px).all(), "imageio->py"


def test_pixel_codec_through_multimodal_pipeline(spark):
    """The Codec seam with REAL content: features computed from decoded
    pixels must match numpy ground truth exactly, through the same
    mapInPandas plan the stub pipeline uses."""
    rng = np.random.default_rng(3)
    rows = []
    truth = {}
    for i in range(6):
        px = rng.integers(0, 256, (5 + i, 7 + i, 3), dtype=np.uint8)
        rows.append((i, bytearray(png_encode(px))))
        truth[i] = (float(px.shape[1]), float(px.shape[0]), 3.0, float(px.mean()))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = multimodal.extract_features(
        df, "doc_id", "payload", modality="image", codec=PixelCodec()
    ).collect()
    assert len(feats) == 6
    for r in feats:
        w, h, c, mean = truth[r.asset_id]
        assert r.feature[0] == w and r.feature[1] == h and r.feature[2] == c
        assert abs(r.feature[3] - mean) < 1e-4  # float32 column


def test_pixel_codec_wav_and_unknown(spark):
    s = np.array([0, 100, -100, 200], dtype=np.int16)
    feat = PixelCodec().decode(wav_encode(s, 8000), "audio")
    assert feat[0] == 4.0 and feat[1] == 8000.0
    with pytest.raises(NotImplementedError):
        PixelCodec().decode(b"\x00\x00\x00\x18ftypmp42 video-ish", "video")


# --------------------------------------------------------------------------
# GIF decoder (LZW) — lossless for <=256-color images, so decode of
# imageio-encoded files must be bit-exact
# --------------------------------------------------------------------------


def test_gif_decode_exact_vs_imageio_encoder(spark):
    from hdp2_5_hive2_spark.llm.media_codecs import gif_decode

    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage

    def j_encode_gif(px: np.ndarray) -> bytes:
        h, w, _ = px.shape
        img = BI(w, h, BI.TYPE_INT_RGB)
        for y in range(h):
            for x in range(w):
                r, g, b = int(px[y, x, 0]), int(px[y, x, 1]), int(px[y, x, 2])
                img.setRGB(x, y, (r << 16) | (g << 8) | b)
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.javax.imageio.ImageIO.write(img, "gif", baos)
        return bytes(baos.toByteArray())

    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    cases = [
        pal[rng.integers(0, 64, (37, 51))],  # random indexed
        np.where(  # 2-color checkerboard: minimal code width
            (np.add.outer(np.arange(100), np.arange(80)) % 2)[:, :, None] == 0,
            np.array([255, 0, 0], dtype=np.uint8),
            np.array([0, 0, 255], dtype=np.uint8),
        ),
        pal[(np.add.outer(np.arange(200) // 4, np.arange(300) // 5)) % 64],  # 12-bit codes
    ]
    for px in cases:
        out = gif_decode(j_encode_gif(px))
        assert out.shape == px.shape and (out == px).all()
    with pytest.raises(ValueError, match="signature"):
        gif_decode(b"NOTAGIF")


def test_pixel_codec_decodes_gif(spark):
    from hdp2_5_hive2_spark.llm.media_codecs import gif_decode  # noqa: F401

    # hand-rolled 2x2 GIF87a, 2-color table, uncompressed-ish LZW
    # (easier: go through our own png for truth, imageio for gif — covered
    # above; here just check the sniff path dispatches)
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    img = BI(4, 4, BI.TYPE_INT_RGB)
    for y in range(4):
        for x in range(4):
            img.setRGB(x, y, 0x00FF00)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(img, "gif", baos)
    feat = PixelCodec().decode(bytes(baos.toByteArray()), "image")
    assert feat[:3] == [4.0, 4.0, 3.0]
    assert feat[3] == pytest.approx((0 + 255 + 0) / 3, abs=0.01)


def _j_encode_animated_gif(spark, colors, size=(8, 6)) -> bytes:
    """ImageIO GIF sequence writer: one constant-color frame per color."""
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(None)
    w, h = size
    for color in colors:
        img = BI(w, h, BI.TYPE_INT_RGB)
        for y in range(h):
            for x in range(w):
                img.setRGB(x, y, color)
        writer.writeToSequence(jvm.javax.imageio.IIOImage(img, None, None), None)
    writer.endWriteSequence()
    ios.close()
    return bytes(baos.toByteArray())


def _gif_with_delays(data: bytes, delay_cs: int) -> bytes:
    """Insert a Graphic Control Extension (delay in centiseconds) before
    every image descriptor, walking the real block structure (an 0x2C byte
    inside LZW data must not be mistaken for a separator)."""
    out = bytearray(data[:13])
    pos = 13
    packed = data[10]
    if packed & 0x80:
        n = 3 * (2 << (packed & 7))
        out += data[pos : pos + n]
        pos += n
    gce = bytes([0x21, 0xF9, 0x04, 0x00, delay_cs & 0xFF, delay_cs >> 8, 0x00, 0x00])
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:
            out.append(b)
            break
        if b == 0x21:
            start = pos
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            out += data[start:pos]
            continue
        assert b == 0x2C
        out += gce
        start = pos
        pos += 10
        ipacked = data[start + 9]
        if ipacked & 0x80:
            pos += 3 * (2 << (ipacked & 7))
        pos += 1  # min code size
        while data[pos]:
            pos += 1 + data[pos]
        pos += 1
        out += data[start:pos]
    return bytes(out)


def test_gif_animated_frames_and_delays(spark):
    from hdp2_5_hive2_spark.llm.media_codecs import gif_decode_frames

    raw = _j_encode_animated_gif(spark, [0xFF0000, 0x00FF00, 0x0000FF])
    anim = _gif_with_delays(raw, delay_cs=20)  # 200 ms per frame
    frames = gif_decode_frames(anim)
    assert [d for d, _ in frames] == [200, 200, 200]
    want = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    for (_, px), rgb in zip(frames, want):
        assert px.shape == (6, 8, 3)
        assert (px == np.array(rgb, dtype=np.uint8)).all()


def test_sample_gif_frames_real_pixels(spark):
    """The video-ish seam with REAL decode: sampling at 100 ms over 200 ms
    frames must emit two ticks per frame, with features from the actual
    composited pixels."""
    from hdp2_5_hive2_spark.llm.media_codecs import sample_gif_frames

    raw = _j_encode_animated_gif(spark, [0xFF0000, 0x00FF00, 0x0000FF])
    anim = _gif_with_delays(raw, delay_cs=20)
    df = spark.createDataFrame([(1, bytearray(anim))], "doc_id long, payload binary")
    rows = sorted(
        sample_gif_frames(df, "doc_id", "payload", every_ms=100).collect(),
        key=lambda r: r.ts_ms,
    )
    assert [(r.frame_idx, r.ts_ms) for r in rows] == [
        (0, 0), (0, 100), (1, 200), (1, 300), (2, 400), (2, 500),
    ]
    # constant frames: mean == 255/3, std over channels
    for r in rows:
        assert r.feature[0] == 8.0 and r.feature[1] == 6.0
        assert abs(r.feature[3] - 255.0 / 3) < 1e-3


# --------------------------------------------------------------------------
# Baseline JPEG decoder (llm/jpeg.py) vs javax.imageio's encoder+decoder
# --------------------------------------------------------------------------


def _jpeg_tools(spark):
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage

    def encode(px: np.ndarray, gray: bool = False) -> bytes:
        h, w = px.shape[:2]
        img = BI(w, h, BI.TYPE_BYTE_GRAY if gray else BI.TYPE_INT_RGB)
        if gray:
            raster = img.getRaster()  # raw samples: no Java gray colorspace
            for y in range(h):
                for x in range(w):
                    raster.setSample(x, y, 0, int(px[y, x]))
        else:
            for y in range(h):
                for x in range(w):
                    r, g, b = int(px[y, x, 0]), int(px[y, x, 1]), int(px[y, x, 2])
                    img.setRGB(x, y, (r << 16) | (g << 8) | b)
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.javax.imageio.ImageIO.write(img, "jpeg", baos)
        return bytes(baos.toByteArray())

    def decode_gray(jb: bytes) -> np.ndarray:
        img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(jb))
        w, h = img.getWidth(), img.getHeight()
        raster = img.getRaster()
        out = np.zeros((h, w), dtype=np.int32)
        for y in range(h):
            for x in range(w):
                out[y, x] = raster.getSample(x, y, 0)
        return out

    return encode, decode_gray


def test_jpeg_constant_images_decode_exactly(spark):
    """A constant image quantizes losslessly (single DC coefficient), so
    decode must return the exact original — any DC/dequant/IDCT/level-shift
    bug shows up here with zero tolerance."""
    from hdp2_5_hive2_spark.llm.jpeg import jpeg_decode

    encode, _ = _jpeg_tools(spark)
    const = np.full((24, 40, 3), 130, dtype=np.uint8)
    assert (jpeg_decode(encode(const)) == 130).all()
    cg = np.full((17, 23), 77, dtype=np.uint8)
    out = jpeg_decode(encode(cg, gray=True))
    assert out.shape == (17, 23, 1) and (out == 77).all()


def test_jpeg_gray_decoder_vs_imageio_decoder(spark):
    """Decoder-vs-decoder on single-component files (no chroma upsampling,
    no color management): the two independent IDCT implementations must
    agree within one code value (T.81 Annex A conformance territory)."""
    from hdp2_5_hive2_spark.llm.jpeg import jpeg_decode

    encode, decode_gray = _jpeg_tools(spark)
    yy, xx = np.mgrid[0:40, 0:56]
    rng = np.random.default_rng(9)
    for g in (
        ((yy * 2 + xx) % 256).astype(np.uint8),
        rng.integers(0, 256, (33, 29), dtype=np.uint8),  # odd dims: MCU crop
    ):
        jb = encode(g, gray=True)
        d = np.abs(jpeg_decode(jb)[:, :, 0].astype(int) - decode_gray(jb))
        assert d.max() <= 1, d.max()


def test_jpeg_rgb_within_lossy_tolerance_of_original(spark):
    """Full color path (4:2:0 subsampled by ImageIO's encoder): smooth
    content must come back within normal JPEG loss of the original."""
    from hdp2_5_hive2_spark.llm.jpeg import jpeg_decode

    encode, _ = _jpeg_tools(spark)
    yy, xx = np.mgrid[0:120, 0:200]
    # continuously smooth (sinusoids — no wrap discontinuities, so error is
    # quantization/subsampling, not edge ringing)
    smooth = np.stack(
        [
            127.5 + 120 * np.sin(yy / 19 + xx / 23),
            127.5 + 120 * np.cos(yy / 31),
            127.5 + 120 * np.sin(xx / 17),
        ],
        axis=2,
    ).astype(np.uint8)
    out = jpeg_decode(encode(smooth))
    assert out.shape == smooth.shape
    d = np.abs(out.astype(int) - smooth.astype(int))
    assert d.mean() < 3.0 and d.max() <= 32, (d.mean(), d.max())


def test_jpeg_unsupported_modes_rejected(spark):
    """Arithmetic-coded (SOF9) and lossless (SOF3) frames raise cleanly
    (progressive SOF2 is now decoded — see the progressive test)."""
    from hdp2_5_hive2_spark.llm.jpeg import jpeg_decode

    encode, _ = _jpeg_tools(spark)
    base = bytes(encode(np.full((8, 8), 50, dtype=np.uint8), gray=True))
    idx = base.find(b"\xff\xc0")
    assert idx > 0
    for sof in (0xC9, 0xC3):
        jb = bytearray(base)
        jb[idx + 1] = sof
        with pytest.raises(ValueError, match="DCT supported"):
            jpeg_decode(bytes(jb))


def test_pixel_codec_decodes_jpeg(spark):
    from hdp2_5_hive2_spark.llm.jpeg import jpeg_decode

    encode, _ = _jpeg_tools(spark)
    px = np.full((16, 16, 3), 200, dtype=np.uint8)
    feat = PixelCodec().decode(encode(px), "image")
    assert feat[0] == 16.0 and feat[1] == 16.0 and feat[2] == 3.0
    assert abs(feat[3] - 200.0) < 1.0


def test_resize_png_images_real_pixels(spark):
    """Resize transform: output payloads are valid PNGs whose pixels equal
    the numpy nearest-neighbor ground truth."""
    rng = np.random.default_rng(11)
    originals = {i: rng.integers(0, 256, (16, 12, 3), dtype=np.uint8) for i in range(4)}
    df = spark.createDataFrame(
        [(i, bytearray(png_encode(px))) for i, px in originals.items()],
        "doc_id long, payload binary",
    )
    out = resize_png_images(df, "doc_id", "payload", width=6, height=8).collect()
    assert len(out) == 4
    for r in out:
        assert (r.width, r.height) == (6, 8)
        back = png_decode(bytes(r.payload))
        assert (back == resize_nearest(originals[r.asset_id], 6, 8)).all()


def test_png_adam7_interlace_vs_imageio(spark):
    """ImageIO-written PROGRESSIVE (Adam7) PNGs — pass structure and
    per-pass adaptive filters from an encoder we don't control — must
    decode to the exact pixels, across sizes that exercise empty and
    partial passes."""
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage

    def j_encode_progressive(px: np.ndarray) -> bytes:
        h, w = px.shape[:2]
        img = BI(w, h, BI.TYPE_INT_RGB)
        for y in range(h):
            for x in range(w):
                r, g, b = (int(v) for v in px[y, x])
                img.setRGB(x, y, (r << 16) | (g << 8) | b)
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
        baos = jvm.java.io.ByteArrayOutputStream()
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        param = writer.getDefaultWriteParam()
        param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
        writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
        ios.flush()
        return bytes(baos.toByteArray())

    rng = np.random.default_rng(6)
    for h, w in ((1, 1), (3, 5), (8, 8), (13, 21)):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        blob = j_encode_progressive(px)
        # confirm the file really is interlaced (IHDR byte 12)
        ihdr_at = blob.index(b"IHDR") + 4
        assert blob[ihdr_at + 12] == 1, "writer did not interlace"
        back = png_decode(blob)
        assert back.shape == (h, w, 3) and (back == px).all(), (h, w)


def test_jpeg_progressive_vs_baseline(spark):
    """SOF2 progressive files (ImageIO's scan script: spectral selection
    + successive approximation with EOB runs and AC refinement) must
    reconstruct the SAME coefficients as the baseline encoding of the
    same pixels — decoded outputs identical, and constants exact."""
    from hdp2_5_hive2_spark.llm.jpeg import jpeg_decode

    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage

    def enc(px, progressive, gray=False):
        h, w = px.shape[:2]
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
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
        baos = jvm.java.io.ByteArrayOutputStream()
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        p = writer.getDefaultWriteParam()
        if progressive:
            p.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
        writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), p)
        ios.flush()
        return bytes(baos.toByteArray())

    const = np.full((24, 40, 3), 130, dtype=np.uint8)
    blob = enc(const, True)
    assert b"\xff\xc2" in blob  # really SOF2
    assert (jpeg_decode(blob) == 130).all()

    rng = np.random.default_rng(0)
    g = (np.add.outer(np.arange(33) * 3, np.arange(47) * 2) % 256).astype(np.uint8)
    assert (
        jpeg_decode(enc(g, True, gray=True)) == jpeg_decode(enc(g, False, gray=True))
    ).all()
    c = rng.integers(0, 256, (21, 37, 3), dtype=np.uint8)
    assert (jpeg_decode(enc(c, True)) == jpeg_decode(enc(c, False))).all()
