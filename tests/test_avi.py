"""AVI container (llm/avi.py): property roundtrips for BI_RGB streams,
MJPG streams muxed from javax.imageio-encoded JPEGs (an encoder we don't
control) decoded through the from-spec T.81 decoder, idx1 random-access
vs sequential-walk agreement, and the Spark-side frame-sampling and
Codec-seam integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.llm.avi import (
    avi_decode_frames,
    avi_demux,
    avi_encode_dib,
    avi_frame_ranges,
    avi_mux,
    sample_avi_frames,
)
from hdp2_5_hive2_spark.llm.media_codecs import PixelCodec, _sniff


@settings(max_examples=25, deadline=None)
@given(
    dims=st.tuples(st.integers(1, 16), st.integers(1, 16)),
    n=st.integers(1, 6),
    gray=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_dib_property_roundtrip(dims, n, gray, seed):
    h, w = dims
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    frames = [rng.integers(0, 256, shape, dtype=np.uint8) for _ in range(n)]
    data = avi_encode_dib(frames, rate=1000, scale=40)
    out = avi_decode_frames(data)
    assert len(out) == n
    for i, (ts, px) in enumerate(out):
        assert ts == i * 40
        want = frames[i] if not gray else np.repeat(frames[i][:, :, None], 3, axis=2)
        assert px.shape == want.shape and (px == want).all()


def test_demux_metadata_and_index_paths_agree():
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (5, 11, 3), dtype=np.uint8) for _ in range(4)]
    with_idx = avi_encode_dib(frames, rate=30000, scale=1001)  # NTSC timing
    st_ = avi_demux(with_idx)
    assert (st_.width, st_.height) == (11, 5)
    assert (st_.rate, st_.scale, st_.compression) == (30000, 1001, "DIB")
    # the no-idx1 variant (spec allows) must demux identically via movi walk
    from hdp2_5_hive2_spark.llm.avi import _dib_encode

    no_idx = avi_mux(
        [_dib_encode(f) for f in frames], 11, 5,
        rate=30000, scale=1001, compression="DIB", write_idx1=False,
    )
    assert avi_demux(no_idx).frames == st_.frames
    # idx1 ranges point at exactly the frame payloads
    for (off, ln), payload in zip(avi_frame_ranges(with_idx), st_.frames):
        assert with_idx[off : off + ln] == payload


def test_absolute_offset_idx1_variant():
    """Some writers store idx1 offsets absolute from file start; the reader
    must detect and accept that layout (fourcc check at the claimed spot)."""
    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, (4, 6, 3), dtype=np.uint8) for _ in range(3)]
    data = bytearray(avi_encode_dib(frames))
    # locate idx1 and rebase each offset: movi fourcc position + rel offset
    i = data.rfind(b"idx1")
    (ln,) = struct.unpack_from("<I", data, i + 4)
    movi_fourcc = data.find(b"movi")
    for e in range(i + 8, i + 8 + ln, 16):
        (rel,) = struct.unpack_from("<I", data, e + 8)
        struct.pack_into("<I", data, e + 8, movi_fourcc + rel)
    out = avi_decode_frames(bytes(data))
    assert all((px == f).all() for (_, px), f in zip(out, frames))


@settings(max_examples=300, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    n_mut=st.integers(1, 8),
    cut=st.floats(0.05, 1.0),
)
def test_fuzz_only_valueerror(seed, n_mut, cut):
    """Byte-mutated / truncated AVIs either parse or raise ValueError —
    never an unguarded struct/index error or a hang."""
    import random as _random

    rnd = _random.Random(seed)
    base = np.zeros((4, 6, 3), dtype=np.uint8)
    data = bytearray(avi_encode_dib([base, base + 1, base + 2]))
    for _ in range(n_mut):
        data[rnd.randrange(len(data))] = rnd.randrange(256)
    blob = bytes(data)[: max(12, int(len(data) * cut))]
    try:
        avi_demux(blob)
    except ValueError:
        pass


def test_corrupt_and_unsupported_raise():
    with pytest.raises(ValueError, match="bad RIFF/AVI"):
        avi_demux(b"RIFF\x04\x00\x00\x00WAVE")
    rng = np.random.default_rng(0)
    data = avi_encode_dib([rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)])
    with pytest.raises(ValueError, match="overruns|missing"):
        avi_demux(data[: len(data) // 2])
    h264 = avi_mux([b"\x00\x01\x02"], 4, 4, compression="H264")
    with pytest.raises(ValueError, match="unsupported stream codec"):
        avi_decode_frames(h264)


def test_mjpg_stream_via_imageio_encoder(spark):
    """MJPG AVI: frames JPEG-encoded by javax.imageio (constant images →
    bit-exact decode per the T.81 single-DC argument), muxed by avi_mux,
    then container-parsed + T.81-decoded end to end."""
    from tests.test_media_codecs import _jpeg_tools

    encode, _ = _jpeg_tools(spark)
    levels = [40, 90, 200]
    jpegs = [encode(np.full((16, 24, 3), v, dtype=np.uint8)) for v in levels]
    data = avi_mux(jpegs, 24, 16, rate=1000, scale=100, compression="MJPG")
    st_ = avi_demux(data)
    assert st_.compression == "MJPG" and st_.frames == jpegs
    out = avi_decode_frames(data)
    assert [ts for ts, _ in out] == [0, 100, 200]
    for (ts, px), v in zip(out, levels):
        assert px.shape == (16, 24, 3) and (px == v).all()


def test_sample_avi_frames_real_pixels(spark):
    """Spark-side sampling: 25 fps stream sampled at 80 ms must pick the
    frame displayed at each tick (frame timing from dwRate/dwScale), with
    features from actual pixel content."""
    rng = np.random.default_rng(5)
    payloads = []
    for k in range(3):
        frames = [
            np.full((6, 8, 3), (k * 50 + i * 10) % 256, dtype=np.uint8)
            for i in range(5)
        ]
        payloads.append(avi_encode_dib(frames, rate=1000, scale=40))
    df = spark.createDataFrame(
        [(k, bytearray(p)) for k, p in enumerate(payloads)],
        "asset_id long, payload binary",
    )
    rows = sample_avi_frames(df, "asset_id", "payload", every_ms=80).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    for k in range(3):
        got = sorted(by_asset[k], key=lambda r: r.ts_ms)
        # duration 200 ms, ticks at 0/80/160 → frames 0, 2, 4
        assert [(r.frame_idx, r.ts_ms) for r in got] == [(0, 0), (2, 80), (4, 160)]
        for r, fidx in zip(got, (0, 2, 4)):
            assert r.feature[3] == pytest.approx((k * 50 + fidx * 10) % 256)


def test_pixel_codec_video_feature():
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (7, 9, 3), dtype=np.uint8) for _ in range(4)]
    data = avi_encode_dib(frames)
    assert _sniff(data) == "avi"
    feat = PixelCodec().decode(data, "video")
    assert feat[:3] == [9.0, 7.0, 4.0]  # width, height, n_frames
    stack = np.concatenate(frames, axis=0).astype(np.float64)
    assert feat[3] == pytest.approx(stack.mean())
    assert feat[6] == float(stack.max())


def test_opendml_segments_roundtrip_and_probe():
    """AVI 2.0: frames spread over RIFF-AVIX extension segments resolve
    through the indx super-index → ix00 standard indexes, bit-exact and
    metadata-only (AVIX bodies never walked by the probe)."""
    import io

    from hdp2_5_hive2_spark.llm.avi import (
        _dib_encode,
        avi_frame_ranges,
        avi_mux_opendml,
        avi_probe,
    )

    rng = np.random.default_rng(6)
    frames = [rng.integers(0, 256, (6, 9, 3), dtype=np.uint8) for _ in range(11)]
    data = avi_mux_opendml(
        [_dib_encode(f) for f in frames], 9, 6,
        compression="DIB", frames_per_segment=4,
    )
    out = avi_decode_frames(data)
    assert len(out) == 11
    for i, (ts, px) in enumerate(out):
        assert ts == i * 40 and (px == frames[i]).all()

    class CF(io.BytesIO):
        def __init__(self, b):
            super().__init__(b)
            self.n = 0

        def read(self, k=-1):
            r = super().read(k)
            self.n += len(r)
            return r

    payloads = [bytes([i % 256]) * 20000 for i in range(40)]
    big = avi_mux_opendml(payloads, 100, 100, frames_per_segment=8)
    fh = CF(big)
    st_, ranges = avi_probe(fh)
    assert [big[o : o + ln] for o, ln, _ in ranges] == payloads
    assert fh.n < len(big) // 100
    assert [(o, ln) for o, ln, _ in ranges] == avi_frame_ranges(big)


@settings(max_examples=150, deadline=None)
@given(seed=st.integers(0, 2**31), n_mut=st.integers(1, 8), cut=st.floats(0.05, 1.0))
def test_opendml_fuzz_only_valueerror(seed, n_mut, cut):
    import random as _random

    from hdp2_5_hive2_spark.llm.avi import avi_mux_opendml

    rnd = _random.Random(seed)
    data = bytearray(
        avi_mux_opendml([bytes([i]) * 30 for i in range(5)], 4, 4,
                        frames_per_segment=2)
    )
    for _ in range(n_mut):
        data[rnd.randrange(len(data))] = rnd.randrange(256)
    blob = bytes(data)[: max(12, int(len(data) * cut))]
    try:
        avi_demux(blob)
    except ValueError:
        pass
