"""MP4 / ISO BMFF container (llm/mp4.py): sample-table resolution across
layout variants (single- and multi-chunk stsc, constant stsz, co64,
version-1 mdhd), ranged-access agreement with the mdat payloads, and
MJPEG-track decode through the from-spec T.81 decoder."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.llm.mp4 import (
    mp4_decode_frames,
    mp4_mux,
    mp4_parse,
    mp4_sample_ranges,
)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 12),
    delta=st.integers(1, 3000),
    seed=st.integers(0, 2**31),
)
def test_sample_table_property_roundtrip(n, delta, seed):
    rng = np.random.default_rng(seed)
    frames = [bytes(rng.integers(0, 256, rng.integers(1, 200), dtype=np.uint8).tobytes()) for _ in range(n)]
    data = mp4_mux(frames, 64, 48, sample_delta=delta)
    (t,) = mp4_parse(data)
    assert (t.width, t.height, t.n_samples) == (64, 48, n)
    assert t.duration == n * delta and t.timescale == 1000
    for i, (off, ln, ts) in enumerate(mp4_sample_ranges(data)):
        assert data[off : off + ln] == frames[i]
        assert ts == i * delta * 1000 // 1000


def _patch_box(data: bytes, fourcc: bytes, new_box: bytes) -> bytes:
    """Replace the first `fourcc` box wherever it sits, fixing every
    ancestor box length (sizes are u32 at each ancestor's start)."""
    i = data.find(fourcc) - 4
    (old_size,) = struct.unpack_from(">I", data, i)
    grown = len(new_box) - old_size
    out = bytearray(data[:i] + new_box + data[i + old_size :])
    # walk ancestors: any box whose [start, end) strictly contains i
    pos = 0
    while pos < i:
        (size,) = struct.unpack_from(">I", out, pos)
        if pos + size > i:  # ancestor — grow it and descend
            struct.pack_into(">I", out, pos, size + grown)
            pos += 8
        else:
            pos += size
    return bytes(out)


def test_multi_chunk_stsc_and_constant_stsz():
    """Two chunks: first holds 2 samples, second holds 3; all samples the
    same size via stsz's constant-size form. The resolver must expand the
    stsc run list and chunk bases exactly."""
    frames = [bytes([i]) * 24 for i in range(5)]
    data = mp4_mux(frames, 8, 8, sample_delta=100)
    # rewrite stsz to constant form, stsc to two runs, stco to two chunks
    mdat_start = data.find(b"mdat") + 4
    stsz = struct.pack(">I", 8 + 4 + 8) + b"stsz" + b"\x00" * 4 + struct.pack(">II", 24, 5)
    data = _patch_box(data, b"stsz", stsz)
    stsc_body = b"\x00" * 4 + struct.pack(">I", 2) + struct.pack(">III", 1, 2, 1) + struct.pack(">III", 2, 3, 1)
    data = _patch_box(data, b"stsc", struct.pack(">I", 8 + len(stsc_body)) + b"stsc" + stsc_body)
    stco_body = b"\x00" * 4 + struct.pack(">I", 2) + struct.pack(">II", mdat_start, mdat_start + 48)
    data = _patch_box(data, b"stco", struct.pack(">I", 8 + len(stco_body)) + b"stco" + stco_body)
    r = mp4_sample_ranges(data)
    assert [(o, ln) for o, ln, _ in r] == [
        (mdat_start, 24), (mdat_start + 24, 24),
        (mdat_start + 48, 24), (mdat_start + 72, 24), (mdat_start + 96, 24),
    ]
    assert [ts for _, _, ts in r] == [0, 100, 200, 300, 400]


def test_co64_and_v1_mdhd_variants():
    frames = [b"x" * 10, b"y" * 20]
    data = mp4_mux(frames, 4, 4, sample_delta=512)
    (t0,) = mp4_parse(data)
    # co64: same chunk offset, 64-bit form
    stco_pos = data.find(b"stco") - 4
    base = t0.sample_offsets[0]
    co64 = struct.pack(">I", 8 + 4 + 4 + 8) + b"co64" + b"\x00" * 4 + struct.pack(">I", 1) + struct.pack(">Q", base)
    data64 = _patch_box(data, b"stco", co64)
    assert [o for o, _, _ in mp4_sample_ranges(data64)] == t0.sample_offsets
    # version-1 mdhd (64-bit times), timescale 90000
    mdhd1 = (
        struct.pack(">I", 8 + 4 + 8 + 8 + 4 + 8 + 4) + b"mdhd"
        + struct.pack(">I", 1 << 24) + struct.pack(">QQIQ", 0, 0, 90000, 1024)
        + struct.pack(">HH", 0x55C4, 0)
    )
    data90 = _patch_box(data64, b"mdhd", mdhd1)
    (t,) = mp4_parse(data90)
    assert (t.timescale, t.duration) == (90000, 1024)
    assert t.ts_ms(1) == 512 * 1000 // 90000


@settings(max_examples=300, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    n_mut=st.integers(1, 8),
    cut=st.floats(0.05, 1.0),
)
def test_fuzz_only_valueerror(seed, n_mut, cut):
    """Byte-mutated / truncated files either parse or raise ValueError —
    never struct.error / IndexError / a hang (crawl data is hostile)."""
    import random as _random

    rnd = _random.Random(seed)
    data = bytearray(mp4_mux([b"x" * 50, b"y" * 60, b"z" * 70], 8, 8))
    for _ in range(n_mut):
        data[rnd.randrange(len(data))] = rnd.randrange(256)
    blob = bytes(data)[: max(8, int(len(data) * cut))]
    try:
        mp4_parse(blob)
    except ValueError:
        pass


def test_corrupt_raises():
    with pytest.raises(ValueError, match="missing ftyp"):
        mp4_parse(b"\x00\x00\x00\x08free")
    data = mp4_mux([b"abc"], 4, 4)
    with pytest.raises(ValueError, match="overruns|missing moov"):
        mp4_parse(data[: len(data) - 40])
    with pytest.raises(ValueError, match="unsupported sample codec"):
        mp4_decode_frames(mp4_mux([b"\x00\x01"], 4, 4, codec="avc1"))


def test_mjpeg_track_decode_via_imageio(spark):
    """'jpeg'-coded track muxed from javax.imageio-encoded constant frames
    (bit-exact decodable per T.81's single-DC argument) decodes through
    the container + T.81 path with exact pixel values and timing."""
    from tests.test_media_codecs import _jpeg_tools

    encode, _ = _jpeg_tools(spark)
    levels = [25, 128, 230]
    jpegs = [encode(np.full((8, 16, 3), v, dtype=np.uint8)) for v in levels]
    data = mp4_mux(jpegs, 16, 8, codec="jpeg", sample_delta=33)
    out = mp4_decode_frames(data)
    assert [ts for ts, _ in out] == [0, 33, 66]
    for (_, px), v in zip(out, levels):
        assert px.shape == (8, 16, 3) and (px == v).all()


def test_fragmented_equals_flat():
    """CMAF/DASH-shaped fragmented files resolve to the same samples and
    timing as the flat layout: moof/tfhd(default-base-is-moof +
    default-duration)/tfdt/trun walks reproduce stbl's answers."""
    from hdp2_5_hive2_spark.llm.mp4 import mp4_mux_fragmented

    frames = [bytes([i]) * (40 + i * 3) for i in range(7)]
    frag = mp4_mux_fragmented(frames, 12, 10, sample_delta=33, frames_per_fragment=3)
    flat = mp4_mux(frames, 12, 10, sample_delta=33)
    (tf,) = mp4_parse(frag)
    (tl,) = mp4_parse(flat)
    assert tf.sample_ts == tl.sample_ts and tf.sample_sizes == tl.sample_sizes
    assert tf.duration == tl.duration == 7 * 33
    for (o, ln, ts), (fo, fl, fts) in zip(
        mp4_sample_ranges(frag), mp4_sample_ranges(flat)
    ):
        assert frag[o : o + ln] == flat[fo : fo + fl] and ts == fts


def test_fragmented_probe_budget_and_decode(spark):
    """Probe stays metadata-sized across many fragments, and a jpeg-coded
    fragmented track decodes exactly."""
    import io

    from tests.test_media_codecs import _jpeg_tools

    from hdp2_5_hive2_spark.llm.mp4 import mp4_mux_fragmented, mp4_probe

    class CF(io.BytesIO):
        def __init__(self, b):
            super().__init__(b)
            self.n = 0

        def read(self, k=-1):
            r = super().read(k)
            self.n += len(r)
            return r

    big = mp4_mux_fragmented(
        [bytes([i % 256]) * 5000 for i in range(60)], 32, 32, frames_per_fragment=5
    )
    fh = CF(big)
    (t,) = mp4_probe(fh)
    assert t.n_samples == 60 and fh.n < len(big) // 50

    encode, _ = _jpeg_tools(spark)
    levels = [30, 140, 250]
    jpegs = [encode(np.full((8, 16, 3), v, dtype=np.uint8)) for v in levels]
    frag = mp4_mux_fragmented(jpegs, 16, 8, codec="jpeg", sample_delta=50,
                              frames_per_fragment=2)
    out = mp4_decode_frames(frag)
    assert [ts for ts, _ in out] == [0, 50, 100]
    for (_, px), v in zip(out, levels):
        assert (px == v).all()


@settings(max_examples=150, deadline=None)
@given(seed=st.integers(0, 2**31), n_mut=st.integers(1, 8), cut=st.floats(0.05, 1.0))
def test_fragmented_fuzz_only_valueerror(seed, n_mut, cut):
    import random as _random

    from hdp2_5_hive2_spark.llm.mp4 import mp4_mux_fragmented

    rnd = _random.Random(seed)
    data = bytearray(
        mp4_mux_fragmented([b"x" * 50, b"y" * 60, b"z" * 70], 8, 8,
                           frames_per_fragment=2)
    )
    for _ in range(n_mut):
        data[rnd.randrange(len(data))] = rnd.randrange(256)
    blob = bytes(data)[: max(8, int(len(data) * cut))]
    try:
        mp4_parse(blob)
    except ValueError:
        pass


def test_audio_track_pcm_roundtrip():
    """'soun' tracks: AudioSampleEntry resolution (channels, 16.16
    sample rate), per-chunk sample ranges, and PCM reassembly — both
    byte orders ('sowt' LE, 'twos' BE)."""
    from hdp2_5_hive2_spark.llm.mp4 import _first, mp4_extract_audio

    rng = np.random.default_rng(4)
    sig = rng.integers(-30000, 30000, 480, dtype=np.int16)
    for codec, dt in (("sowt", "<i2"), ("twos", ">i2")):
        chunks = [sig[i * 160 : (i + 1) * 160].astype(dt).tobytes() for i in range(3)]
        data = mp4_mux(
            [b"V" * 50], 8, 8, codec="avc1",
            audio=(chunks, codec, 1, 16000, 160),
        )
        tracks = mp4_parse(data)
        a = _first(tracks, "soun")
        assert (a.codec, a.channels, a.sample_rate, a.timescale) == (
            codec, 1, 16000, 16000,
        )
        assert a.n_samples == 3 and a.ts_ms(1) == 10 and a.duration == 480
        back, rate, ch = mp4_extract_audio(data)
        assert rate == 16000 and ch == 1 and np.array_equal(back, sig)
    # video helpers must still target the video track with audio present
    d2 = mp4_mux([b"F" * 30, b"G" * 40], 8, 8,
                 audio=([b"\x00\x01" * 80], "sowt", 1, 8000, 80))
    assert [ln for _, ln, _ in mp4_sample_ranges(d2)] == [30, 40]
    with pytest.raises(ValueError, match="unsupported audio codec"):
        mp4_extract_audio(
            mp4_mux([b"F"], 8, 8, audio=([b"\x00" * 10], "mp4a", 2, 44100, 1024))
        )
