"""Seek-based container probes (avi_probe/mp4_probe) and the distributed
frame index/extract operators (llm/video_source.py): metadata-only byte
budgets, index agreement with full in-memory demux, Catalyst filtering
before payload reads, and decode parity with the in-memory path."""

from __future__ import annotations

import io

import numpy as np
import pytest

from hdp2_5_hive2_spark.llm.avi import (
    avi_decode_frames,
    avi_encode_dib,
    avi_probe,
)
from hdp2_5_hive2_spark.llm.mp4 import mp4_mux, mp4_probe, mp4_sample_ranges
from hdp2_5_hive2_spark.llm.video_source import read_video_frames, video_frame_index


class _CountingFile(io.BytesIO):
    def __init__(self, b):
        super().__init__(b)
        self.nread = 0

    def read(self, n=-1):
        r = super().read(n)
        self.nread += len(r)
        return r


def test_probe_byte_budget_avi():
    """Probing must read metadata only: for a file that is ~99% frame
    payload, the probe's read volume stays under 1% (idx1 path) — movi is
    seeked over, never read."""
    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 256, (64, 64, 3), dtype=np.uint8) for _ in range(30)]
    data = avi_encode_dib(frames)
    fh = _CountingFile(data)
    st, ranges = avi_probe(fh)
    assert len(ranges) == 30 and (st.width, st.height) == (64, 64)
    assert fh.nread < len(data) // 100
    # ranges agree with the full in-memory decode
    full = avi_decode_frames(data)
    for (off, ln, ts), (ts2, _) in zip(ranges, full):
        assert ts == ts2
    # and payload slices decode identically
    from hdp2_5_hive2_spark.llm.avi import _dib_decode

    for (off, ln, _), (_, px) in zip(ranges, full):
        assert (_dib_decode(data[off : off + ln], 64, 64) == px).all()


def test_probe_byte_budget_mp4():
    frames = [bytes([i % 256]) * 4096 for i in range(50)]
    data = mp4_mux(frames, 32, 32, sample_delta=33)
    fh = _CountingFile(data)
    (t,) = mp4_probe(fh)
    assert t.n_samples == 50
    assert fh.nread < len(data) // 100
    assert [
        (t.sample_offsets[i], t.sample_sizes[i], t.ts_ms(i)) for i in range(50)
    ] == mp4_sample_ranges(data)


def test_distributed_index_filter_extract(spark, tmp_path):
    """End to end: write a mixed AVI+MP4 corpus, index it distributed,
    filter to every 2nd frame WITH CATALYST (before any payload read),
    extract + decode, and match the in-memory decode exactly."""
    paths, want = [], {}
    for k in range(4):
        frames = [
            np.full((8, 12, 3), (k * 40 + i * 7) % 256, dtype=np.uint8)
            for i in range(4 + k)
        ]
        p = str(tmp_path / f"v{k}.avi")
        with open(p, "wb") as f:
            f.write(avi_encode_dib(frames, rate=1000, scale=40))
        paths.append(p)
        want[p] = frames
    # one MP4 with raw (non-decodable) payloads for the raw-extract path
    mp4_payloads = [bytes([7 * i % 256]) * (100 + i) for i in range(6)]
    pm = str(tmp_path / "clip.mp4")
    with open(pm, "wb") as f:
        f.write(mp4_mux(mp4_payloads, 16, 9, codec="avc1", sample_delta=40))

    idx = video_frame_index(spark, paths + [pm], parallelism=3)
    pdx = {r.path: r for r in idx.collect() if r.frame_idx == 0}
    assert pdx[paths[0]].container == "avi" and pdx[paths[0]].codec == "DIB"
    assert pdx[pm].container == "mp4" and pdx[pm].codec == "avc1"
    assert pdx[pm].n_frames == 6

    # AVI side: every 2nd frame, decoded
    sel = idx.filter((idx.container == "avi") & (idx.frame_idx % 2 == 0))
    rows = read_video_frames(sel.orderBy("path", "frame_idx")).collect()
    assert len(rows) == sum((len(v) + 1) // 2 for v in want.values())
    for r in rows:
        v = (int(r.path[-5]) * 40 + r.frame_idx * 7) % 256
        assert r.feature[3] == pytest.approx(v)  # mean of a constant frame
        assert r.ts_ms == r.frame_idx * 40

    # MP4 side: raw codec-agnostic extraction
    raw = read_video_frames(idx.filter(idx.container == "mp4"), decode=False).collect()
    got = {r.frame_idx: bytes(r.payload) for r in raw}
    assert got == {i: p for i, p in enumerate(mp4_payloads)}
    # decode=True on an avc1 track must raise (no from-spec bitstream decoder)
    with pytest.raises(Exception, match="no from-spec decoder"):
        read_video_frames(idx.filter(idx.container == "mp4")).collect()


def test_videoframes_datasource(spark, tmp_path):
    """spark.read.format('videoframes'): per-file partitions, format-layer
    every_n sampling (skipped frames never read), decode=feature parity
    with the index+extract path, and raw extraction for AVC tracks."""
    from hdp2_5_hive2_spark.llm.video_source import read_video_frames_ds

    paths = {}
    for k in range(3):
        frames = [
            np.full((6, 8, 3), (k * 30 + i * 11) % 256, dtype=np.uint8)
            for i in range(6)
        ]
        p = str(tmp_path / f"c{k}.avi")
        with open(p, "wb") as f:
            f.write(avi_encode_dib(frames, rate=1000, scale=40))
        paths[p] = frames
    (tmp_path / "raw").mkdir()
    pm = str(tmp_path / "raw" / "x.mp4")
    with open(pm, "wb") as f:
        f.write(mp4_mux([b"a" * 64, b"b" * 64], 4, 4, codec="avc1"))

    df = read_video_frames_ds(spark, str(tmp_path), every_n=3, decode=True)
    rows = [r for r in df.collect() if r.container == "avi"]
    # 6 frames, every 3rd → idx 0 and 3 per file
    assert sorted((r.path, r.frame_idx) for r in rows) == sorted(
        (p, i) for p in paths for i in (0, 3)
    )
    for r in rows:
        k = int(r.path[-5])
        assert r.feature[3] == pytest.approx((k * 30 + r.frame_idx * 11) % 256)
        assert r.ts_ms == r.frame_idx * 40 and (r.width, r.height) == (8, 6)
    # raw path covers any codec
    raw = read_video_frames_ds(spark, pm).collect()
    assert [bytes(r.payload) for r in raw] == [b"a" * 64, b"b" * 64]
    assert raw[0].codec == "avc1"
    # feature decode on avc1 must fail loudly
    with pytest.raises(Exception, match="no from-spec decoder"):
        read_video_frames_ds(spark, pm, decode=True).collect()
