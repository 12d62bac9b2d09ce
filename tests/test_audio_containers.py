"""Audio container audits (llm/audio_containers.py): synthesized
spec-valid MP3 frame streams / FLAC STREAMINFO / OGG page sequences,
resync + ID3 handling, and the ValueError-only fuzz contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.llm.audio_containers import (
    flac_audit,
    mp3_audit,
    ogg_audit,
    sniff_audio,
)

_BR_IDX = {32: 1, 96: 7, 112: 8, 128: 9, 160: 10, 192: 11}
_SR_IDX = {44100: 0, 48000: 1, 32000: 2}


def _mp3_frame_bytes(kbps=128, rate=44100, padding=0, mode=0) -> bytes:
    h = (
        (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
        | (_BR_IDX[kbps] << 12) | (_SR_IDX[rate] << 10) | (padding << 9)
        | (mode << 6)
    )
    frame_len = 1152 // 8 * kbps * 1000 // rate + padding
    return struct.pack(">I", h) + b"\x00" * (frame_len - 4)


def test_mp3_cbr_walk_and_id3():
    frames = [_mp3_frame_bytes(128, 44100, padding=i % 2) for i in range(30)]
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 1, 5]) + b"\x00" * ((1 << 7) + 5)
    a = mp3_audit(id3 + b"".join(frames))
    assert (a.container, a.codec) == ("mp3", "mp3")
    assert (a.sample_rate, a.channels, a.n_frames) == (44100, 2, 30)
    assert a.duration_ms == 30 * 1152 * 1000 // 44100
    assert a.bitrate_kbps == 128 and not a.vbr


def test_mp3_vbr_average_and_resync():
    frames = [_mp3_frame_bytes(96), _mp3_frame_bytes(192), _mp3_frame_bytes(96)]
    blob = frames[0] + b"\x00garbage\x00" + frames[1] + frames[2]
    a = mp3_audit(blob)
    assert a.n_frames == 3 and a.vbr
    assert a.bitrate_kbps == (96 + 192 + 96) // 3
    assert a.channels == 2
    with pytest.raises(ValueError, match="no valid frame"):
        mp3_audit(b"\x00" * 100)
    # mono mode bits
    assert mp3_audit(_mp3_frame_bytes(mode=3)).channels == 1


def _flac_bytes(rate=16000, channels=1, bps=16, total=48000) -> bytes:
    bits = (rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | total
    body = (
        struct.pack(">HH", 16, 16) + b"\x00" * 6
        + bits.to_bytes(8, "big") + bytes(range(16))
    )
    return b"fLaC" + b"\x80" + struct.pack(">I", len(body))[1:] + body


def test_flac_streaminfo():
    a = flac_audit(_flac_bytes(rate=22050, channels=2, bps=24, total=44100))
    assert (a.sample_rate, a.channels) == (22050, 2)
    assert a.duration_ms == 2000
    assert a.extra["bits_per_sample"] == 24
    assert a.extra["md5"] == bytes(range(16)).hex()
    with pytest.raises(ValueError, match="missing fLaC"):
        flac_audit(b"flaC1234")


def _ogg_page(body: bytes, granule: int, seq: int, last=False) -> bytes:
    segs = []
    n = len(body)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)
    return (
        b"OggS\x00" + (b"\x04" if last else b"\x00")
        + struct.pack("<q", granule) + struct.pack("<II", 1, seq)
        + b"\x00\x00\x00\x00" + bytes([len(segs)]) + bytes(segs) + body
    )


def test_ogg_opus_duration():
    head = b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312) + struct.pack("<I", 48000) + b"\x00" * 4
    pages = (
        _ogg_page(head, 0, 0)
        + _ogg_page(b"\x01" * 300, 48000, 1)
        + _ogg_page(b"\x02" * 40, 96312, 2, last=True)
    )
    a = ogg_audit(pages)
    assert (a.codec, a.channels, a.sample_rate) == ("opus", 2, 48000)
    assert a.n_frames == 3
    assert a.duration_ms == (96312 - 312) * 1000 // 48000 == 2000
    # vorbis id header
    vhead = b"\x01vorbis" + struct.pack("<I", 0) + bytes([1]) + struct.pack("<I", 44100)
    va = ogg_audit(_ogg_page(vhead, 0, 0) + _ogg_page(b"x", 88200, 1, last=True))
    assert (va.codec, va.sample_rate, va.channels) == ("vorbis", 44100, 1)
    assert va.duration_ms == 2000


def test_sniff():
    assert sniff_audio(_mp3_frame_bytes()) == "mp3"
    assert sniff_audio(b"ID3\x04" + b"\x00" * 20) == "mp3"
    assert sniff_audio(_flac_bytes()) == "flac"
    assert sniff_audio(_ogg_page(b"x", 0, 0)) == "ogg"
    assert sniff_audio(b"RIFF\x00\x00\x00\x00WAVE") == "wav"
    assert sniff_audio(b"\x00\x01\x02\x03") == "unknown"


@settings(max_examples=200, deadline=None)
@given(seed=st.integers(0, 2**31), n_mut=st.integers(1, 10), cut=st.floats(0.02, 1.0))
def test_fuzz_only_valueerror(seed, n_mut, cut):
    import random as _random

    rnd = _random.Random(seed)
    base = (
        b"".join(_mp3_frame_bytes() for _ in range(4))
        + _flac_bytes()
        + _ogg_page(b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 0) + struct.pack("<I", 48000), 0, 0)
    )
    data = bytearray(base)
    for _ in range(n_mut):
        data[rnd.randrange(len(data))] = rnd.randrange(256)
    blob = bytes(data)[: max(4, int(len(data) * cut))]
    for fn in (mp3_audit, flac_audit, ogg_audit):
        try:
            fn(blob)
        except ValueError:
            pass


def test_id3v2_text_frames_both_versions():
    from hdp2_5_hive2_spark.llm.audio_containers import build_id3v2, id3v2_tags

    tags = {"TIT2": "Söme Title", "TPE1": "Ärtist", "TALB": "Album"}
    for ver in (3, 4):
        blob = build_id3v2(tags, version=ver) + _mp3_frame_bytes()
        assert id3v2_tags(blob) == tags, ver
    assert id3v2_tags(_mp3_frame_bytes()) == {}
    # audit composes: tag skipped, frames still counted
    a = mp3_audit(build_id3v2(tags) + b"".join(_mp3_frame_bytes() for _ in range(4)))
    assert a.n_frames == 4
    with pytest.raises(ValueError, match="frame id|overruns|encoding|syncsafe"):
        bad = bytearray(build_id3v2(tags))
        bad[10] = 0x01  # corrupt the first frame id
        id3v2_tags(bytes(bad))


@settings(max_examples=150, deadline=None)
@given(seed=st.integers(0, 2**31), n_mut=st.integers(1, 8))
def test_id3v2_fuzz_only_valueerror(seed, n_mut):
    import random as _random

    from hdp2_5_hive2_spark.llm.audio_containers import build_id3v2, id3v2_tags

    rnd = _random.Random(seed)
    data = bytearray(build_id3v2({"TIT2": "abc", "TPE1": "def"}))
    for _ in range(n_mut):
        data[rnd.randrange(len(data))] = rnd.randrange(256)
    try:
        id3v2_tags(bytes(data))
    except ValueError:
        pass
