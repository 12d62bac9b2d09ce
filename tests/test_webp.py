"""WebP VP8L decoder (llm/webp.py): literal roundtrips via the fixture
encoder, every inverse transform (subtract-green, all 14 predictor
modes, color transform, palettes incl. packed indices), hand-built
spec vectors for LZ77 backward references and the color cache, and the
hostile-input fuzz contract."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.llm.webp import (
    _BitW,
    _canonical,
    _rev,
    _write_simple_code,
    sniff_webp,
    vp8l_encode_lossless,
    webp_decode,
)


def _want(px):
    if px.ndim == 2:
        return np.stack([px] * 3 + [np.full_like(px, 255)], axis=2)
    if px.shape[2] == 3:
        return np.dstack([px, np.full(px.shape[:2], 255, np.uint8)])
    return px


@settings(max_examples=25, deadline=None)
@given(
    dims=st.tuples(st.integers(1, 16), st.integers(1, 16)),
    ch=st.sampled_from([2, 3, 4]),
    seed=st.integers(0, 2**31),
)
def test_literal_property_roundtrip(dims, ch, seed):
    h, w = dims
    shape = (h, w) if ch == 2 else (h, w, ch)
    px = np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)
    assert (webp_decode(vp8l_encode_lossless(px)) == _want(px)).all()


def test_all_transforms_roundtrip():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (9, 13, 4), dtype=np.uint8)
    assert (webp_decode(vp8l_encode_lossless(px, subtract_green=True)) == px).all()
    for mode in range(14):
        assert (
            webp_decode(vp8l_encode_lossless(px, predictor_mode=mode)) == px
        ).all(), mode
    assert (
        webp_decode(vp8l_encode_lossless(px, color_transform=(23, 200, 77))) == px
    ).all()
    for ncol, shape in ((40, (12, 11)), (9, (8, 10)), (3, (7, 9)), (2, (6, 17))):
        img = rng.integers(0, 256, (ncol, 4), dtype=np.uint8)[
            rng.integers(0, ncol, shape)
        ]
        assert (webp_decode(vp8l_encode_lossless(img, palette=True)) == img).all()


def _normal_pair_code(bw, symbols, n_symbols):
    """Normal-form table with exactly two used symbols (both length 1) —
    needed when a symbol exceeds the simple code's 8-bit field."""
    lengths = [0] * n_symbols
    for s in symbols:
        lengths[s] = 1
    cl_lengths = [0] * 19
    cl_lengths[0] = 1
    cl_lengths[1] = 1
    bw.write(0, 1)
    bw.write(19 - 4, 4)
    from hdp2_5_hive2_spark.llm.webp import _CL_ORDER

    for sym in _CL_ORDER:
        bw.write(cl_lengths[sym], 3)
    bw.write(0, 1)  # no max_symbol
    cl = _canonical(cl_lengths)
    for i in range(n_symbols):
        c, l = cl[lengths[i]]
        bw.write(_rev(c, l), l)
    return _canonical(lengths)


def _wrap(bw) -> bytes:
    import struct

    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_lz77_backward_reference_vector():
    """2×2 image: one literal then a (length 3, distance 1) reference —
    all four pixels equal. Exercises length/distance prefix values and
    the neighborhood distance map (code 2 → previous pixel)."""
    bw = _BitW()
    bw.write(1, 14)  # w-1
    bw.write(1, 14)  # h-1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transform
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    G, R, B, A = 55, 10, 20, 255
    gcode = _normal_pair_code(bw, [G, 256 + 2], 256 + 24)  # literal + len-3
    _write_simple_code(bw, [R])
    _write_simple_code(bw, [B])
    _write_simple_code(bw, [A])
    _write_simple_code(bw, [1], eight_bit=False)  # dist prefix value 2 → d=1
    c, l = gcode[G]
    bw.write(_rev(c, l), l)  # literal pixel (r/b/a are 0-bit codes)
    c, l = gcode[256 + 2]
    bw.write(_rev(c, l), l)  # backward ref, length 3, dist code 0-bit
    out = webp_decode(_wrap(bw))
    assert out.shape == (2, 2, 4)
    assert (out == np.array([R, G, B, A], dtype=np.uint8)).all()


def test_color_cache_vector():
    """2×1 image: literal then a cache hit for the same pixel."""
    bw = _BitW()
    bw.write(1, 14)  # w-1 → w=2
    bw.write(0, 14)  # h=1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transform
    bw.write(1, 1)  # cache present
    cache_bits = 4
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta
    G, R, B, A = 99, 1, 2, 255
    pix = (A << 24) | (R << 16) | (G << 8) | B
    hash_ = ((pix * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)
    cache_sym = 256 + 24 + hash_
    n_green = 256 + 24 + (1 << cache_bits)
    gcode = _normal_pair_code(bw, sorted([G, cache_sym]), n_green)
    _write_simple_code(bw, [R])
    _write_simple_code(bw, [B])
    _write_simple_code(bw, [A])
    _write_simple_code(bw, [0], eight_bit=False)
    c, l = gcode[G]
    bw.write(_rev(c, l), l)
    c, l = gcode[cache_sym]
    bw.write(_rev(c, l), l)
    out = webp_decode(_wrap(bw))
    assert (out[0, 0] == [R, G, B, A]).all() and (out[0, 1] == [R, G, B, A]).all()


def test_sniff_and_lossy_rejection():
    px = np.zeros((4, 4, 4), dtype=np.uint8)
    blob = vp8l_encode_lossless(px)
    assert sniff_webp(blob) == "webp-lossless"
    import struct

    lossy = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    )
    assert sniff_webp(lossy) == "webp"
    with pytest.raises(ValueError, match="lossy VP8"):
        webp_decode(lossy)
    with pytest.raises(ValueError, match="not a WebP"):
        webp_decode(b"RIFF\x00\x00\x00\x00WAVE")


@settings(max_examples=200, deadline=None)
@given(seed=st.integers(0, 2**31), n_mut=st.integers(1, 8), cut=st.floats(0.05, 1.0))
def test_fuzz_only_valueerror(seed, n_mut, cut):
    import random as _random

    rnd = _random.Random(seed)
    base = vp8l_encode_lossless(
        np.random.default_rng(3).integers(0, 256, (8, 8, 4), dtype=np.uint8)
    )
    data = bytearray(base)
    for _ in range(n_mut):
        data[rnd.randrange(len(data))] = rnd.randrange(256)
    blob = bytes(data)[: max(12, int(len(data) * cut))]
    try:
        webp_decode(blob)
    except ValueError:
        pass


def test_predictor13_truncates_toward_zero():
    """libwebp's ClampedAddSubtractHalf uses C (a - b) / 2 truncation:
    avg(L,T)=10 with TL=13 predicts 10 + trunc(-3/2) = 9, not floor's 8.
    Hand-built 2x2 vector: residuals crafted against the C semantics."""
    import numpy as np

    from hdp2_5_hive2_spark.llm.webp import _inverse_predictor

    # layout: TL=(0,0), T=(0,1), L=(1,0), target=(1,1); mode 13 everywhere
    timg = np.full((1, 1), (0xFF << 24) | (13 << 8), np.uint32)
    # residuals reconstruct TL=13, T=12, L=8 (row 0 / col 0 use the
    # fixed left/top predictors), then target = pred + 0 exposes pred:
    # green avg(L,T)=10, TL=13 -> pred must be 10 + trunc(-3/2) = 9
    def delta(v, prev):
        d = (v - prev) % 256
        return (d << 16) | (d << 8) | d

    res = np.zeros((2, 2), np.uint32)
    res[0, 0] = delta(13, 0)
    res[0, 1] = delta(12, 13)
    res[1, 0] = delta(8, 13)
    res[1, 1] = 0  # target = pred + 0 -> exposes pred directly
    out = _inverse_predictor(res.copy(), 1, timg)  # 2x2 px per timg cell
    got = out[1, 1]
    assert (got >> 8) & 0xFF == 9, hex(int(got))  # green: trunc, not floor
    assert (got >> 16) & 0xFF == 9 and got & 0xFF == 9


def test_simple_code_descending_symbol_order():
    """Spec 6.2.1: in a 2-symbol simple code, bit 0 decodes to the
    FIRST-written symbol even when symbols are written in descending
    order — positional, not canonical-by-value."""
    from hdp2_5_hive2_spark.llm.webp import _Bits, _read_code_lengths

    w = _BitW()
    w.write(1, 1)  # simple
    w.write(1, 1)  # two symbols
    w.write(1, 1)  # first symbol in 8 bits
    w.write(200, 8)
    w.write(100, 8)
    w.write(0, 1)  # next read: code 0 -> 200
    w.write(1, 1)  # then code 1 -> 100
    br = _Bits(w.bytes())
    code = _read_code_lengths(br, 256)
    assert code.read(br) == 200
    assert code.read(br) == 100


def test_sniff_vp8x_wrapped_lossless():
    """VP8X extended container: VP8L chunk sits after the 18-byte VP8X
    chunk (offset 30) — the sniffer must chunk-walk, not window-scan."""
    import numpy as np

    core = vp8l_encode_lossless(np.zeros((4, 4, 3), np.uint8))
    vp8l_chunk = core[12:]  # strip RIFF/WEBP header, keep VP8L chunk
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + b"\x00" * 10
    payload = vp8x + vp8l_chunk
    blob = b"RIFF" + (4 + len(payload)).to_bytes(4, "little") + b"WEBP" + payload
    assert sniff_webp(blob) == "webp-lossless"
    from hdp2_5_hive2_spark.llm.webp import webp_decode

    assert webp_decode(core).shape == (4, 4, 4)
