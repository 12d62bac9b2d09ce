"""Subtitle parsing + alignment (llm/subtitles.py): SRT/WebVTT grammar,
tag stripping, NOTE/identifier handling, overlap join semantics, fuzz."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.llm.subtitles import (
    align_cues,
    parse_srt,
    parse_subtitles,
    parse_vtt,
)


def _fmt(ms: int, sep: str) -> str:
    h, rem = divmod(ms, 3600000)
    m, rem = divmod(rem, 60000)
    s, milli = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{milli:03d}"


@settings(max_examples=30, deadline=None)
@given(
    spans=st.lists(
        st.tuples(st.integers(0, 3_000_000), st.integers(1, 60_000)),
        min_size=1, max_size=8,
    ),
    numbered=st.booleans(),
)
def test_srt_vtt_property_roundtrip(spans, numbered):
    cues = [(s, s + d, f"line {i} text") for i, (s, d) in enumerate(spans)]
    srt = "\n".join(
        (f"{i + 1}\n" if numbered else "")
        + f"{_fmt(a, ',')} --> {_fmt(b, ',')}\n{t}\n"
        for i, (a, b, t) in enumerate(cues)
    )
    assert parse_srt(srt) == cues
    vtt = "WEBVTT\n\n" + "\n".join(
        f"{_fmt(a, '.')} --> {_fmt(b, '.')}\n{t}\n" for a, b, t in cues
    )
    assert parse_vtt(vtt) == cues
    assert parse_subtitles(vtt.encode()) == cues


def test_grammar_details():
    assert parse_srt("00:00:01,000 --> 00:00:02,000\n<i>x</i>  y\n") == [
        (1000, 2000, "x y")
    ]
    vtt = (
        "WEBVTT - with title\n\nNOTE skip\nme\n\nid1\n"
        "00:00:01.000 --> 00:00:02.000 align:start\nA\nB\n"
    )
    assert parse_vtt(vtt) == [(1000, 2000, "A B")]
    with pytest.raises(ValueError, match="ends before"):
        parse_srt("00:00:05,000 --> 00:00:01,000\nX\n")
    with pytest.raises(ValueError, match="invalid timestamp"):
        parse_srt("00:99:01,000 --> 01:99:02,000\nX\n")
    with pytest.raises(ValueError, match="missing WEBVTT"):
        parse_vtt("no header\n")


@settings(max_examples=150, deadline=None)
@given(seed=st.integers(0, 2**31), n_mut=st.integers(1, 10))
def test_fuzz_only_valueerror(seed, n_mut):
    import random as _random

    rnd = _random.Random(seed)
    base = bytearray(
        b"WEBVTT\n\n00:00:01.000 --> 00:00:02.000\nhello there\n\n"
        b"00:00:03.000 --> 00:00:04.000\nworld\n"
    )
    for _ in range(n_mut):
        base[rnd.randrange(len(base))] = rnd.randrange(256)
    try:
        parse_subtitles(bytes(base))
    except ValueError:
        pass


def test_align_cues_overlap_join(spark):
    cues = spark.createDataFrame(
        [
            (1, 0, 0, 2000, "a"),
            (1, 1, 2500, 4000, "b"),
            (2, 0, 0, 1000, "c"),
        ],
        "asset_id long, cue_idx int, start_ms long, end_ms long, text string",
    )
    segs = spark.createDataFrame(
        [(1, 1500, 3000), (1, 5000, 6000), (2, 500, 800)],
        "asset_id long, seg_start_ms long, seg_end_ms long",
    )
    rows = {(r.asset_id, r.cue_idx, r.seg_start_ms): r.overlap_ms
            for r in align_cues(cues, segs).collect()}
    # cue a overlaps seg [1500,3000) by 500; cue b by 500; cue c by 300
    assert rows == {(1, 0, 1500): 500, (1, 1, 1500): 500, (2, 0, 500): 300}
