"""WebM/Matroska container (llm/webm.py): EBML vint + element grammar,
frame range/timestamp resolution, seek-probe byte budget, V_MJPEG decode
through the T.81 decoder, fuzz (ValueError-only), and video_source
dispatch."""

from __future__ import annotations

import io

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.llm.webm import (
    webm_decode_frames,
    webm_frame_ranges,
    webm_mux,
    webm_parse,
    webm_probe,
)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 10),
    frame_ms=st.integers(1, 500),
    seed=st.integers(0, 2**31),
)
def test_property_roundtrip(n, frame_ms, seed):
    rng = np.random.default_rng(seed)
    frames = [
        bytes(rng.integers(0, 256, rng.integers(1, 300), dtype=np.uint8).tobytes())
        for _ in range(n)
    ]
    data = webm_mux(frames, 320, 240, codec="V_VP8", frame_ms=frame_ms)
    t = webm_parse(data)
    assert (t.codec, t.width, t.height, len(t.frames)) == ("V_VP8", 320, 240, n)
    for i, (o, ln, ts) in enumerate(webm_frame_ranges(data)):
        assert data[o : o + ln] == frames[i] and ts == i * frame_ms


def test_probe_budget_and_agreement():
    payloads = [bytes([i % 256]) * 30000 for i in range(40)]
    data = webm_mux(payloads, 1280, 720, codec="V_AV1")

    class CF(io.BytesIO):
        def __init__(self, b):
            super().__init__(b)
            self.n = 0

        def read(self, k=-1):
            r = super().read(k)
            self.n += len(r)
            return r

    fh = CF(data)
    t = webm_probe(fh)
    assert t.codec == "V_AV1" and len(t.frames) == 40
    assert [(o, ln) for o, ln, _ in t.frames] == [
        (o, ln) for o, ln, _ in webm_frame_ranges(data)
    ]
    assert fh.n < len(data) // 100


def test_mjpeg_track_decode(spark):
    from tests.test_media_codecs import _jpeg_tools

    encode, _ = _jpeg_tools(spark)
    levels = [50, 150, 240]
    jpegs = [encode(np.full((8, 16, 3), v, dtype=np.uint8)) for v in levels]
    data = webm_mux(jpegs, 16, 8, codec="V_MJPEG", frame_ms=25)
    out = webm_decode_frames(data)
    assert [ts for ts, _ in out] == [0, 25, 50]
    for (_, px), v in zip(out, levels):
        assert px.shape == (8, 16, 3) and (px == v).all()
    with pytest.raises(ValueError, match="unsupported track codec"):
        webm_decode_frames(webm_mux([b"x"], 4, 4, codec="V_VP9"))


def test_laced_blocks_rejected():
    data = bytearray(webm_mux([b"abcd"], 4, 4))
    # flip the SimpleBlock flags byte (track vint 0x81 + i16 ts + flags)
    i = bytes(data).rindex(b"\x81\x00\x00\x80")
    data[i + 3] = 0x86  # keyframe + EBML lacing
    with pytest.raises(ValueError, match="laced"):
        webm_parse(bytes(data))


@settings(max_examples=200, deadline=None)
@given(seed=st.integers(0, 2**31), n_mut=st.integers(1, 8), cut=st.floats(0.05, 1.0))
def test_fuzz_only_valueerror(seed, n_mut, cut):
    import random as _random

    rnd = _random.Random(seed)
    data = bytearray(webm_mux([bytes([i]) * 40 for i in range(4)], 8, 8))
    for _ in range(n_mut):
        data[rnd.randrange(len(data))] = rnd.randrange(256)
    blob = bytes(data)[: max(4, int(len(data) * cut))]
    try:
        webm_parse(blob)
    except ValueError:
        pass


def test_video_source_dispatch(spark, tmp_path):
    """video_frame_index + raw extraction over a WebM corpus file."""
    from hdp2_5_hive2_spark.llm.video_source import (
        read_video_frames,
        video_frame_index,
    )

    payloads = [bytes([9 * i % 256]) * (60 + i) for i in range(5)]
    p = str(tmp_path / "clip.webm")
    with open(p, "wb") as f:
        f.write(webm_mux(payloads, 24, 18, codec="V_VP9", frame_ms=20))
    idx = video_frame_index(spark, [p])
    rows = sorted(idx.collect(), key=lambda r: r.frame_idx)
    assert rows[0].container == "webm" and rows[0].codec == "V_VP9"
    assert [(r.frame_idx, r.ts_ms) for r in rows] == [(i, i * 20) for i in range(5)]
    raw = read_video_frames(idx, decode=False).collect()
    assert {r.frame_idx: bytes(r.payload) for r in raw} == dict(enumerate(payloads))
