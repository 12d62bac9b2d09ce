"""Subtitle formats (SRT, WebVTT) + time-aligned pairing operators.

Speech training data is (audio, transcript) PAIRS, and the transcripts
crawled alongside video are subtitle files: SubRip (.srt — numbered
cues, `HH:MM:SS,mmm --> HH:MM:SS,mmm` timing lines) and WebVTT (the
W3C spec — `WEBVTT` header, `HH:MM:SS.mmm` dot-millisecond timing,
optional cue settings after the timestamps, NOTE/STYLE blocks, simple
inline tags). Both parse here from their published formats into the
same cue shape, and `align_cues` pairs cues with any time-interval
frame (audio activity segments, scene cuts, frame ranges) by overlap —
a bounded interval join keyed per asset.

Scale: parsing is map-side Arrow batches over subtitle payloads; the
alignment join shuffles on the asset key only, with the per-asset cue ×
segment product bounded by real media (hundreds of cues, not millions).
ValueError-only on hostile input, as everywhere.
"""

from __future__ import annotations

import re

__all__ = ["parse_srt", "parse_vtt", "parse_subtitles", "align_cues"]

_TS = re.compile(r"(\d{1,2}):(\d{2}):(\d{2})[.,](\d{3})")
_TAG = re.compile(r"</?[^>]+>")


def _ts_ms(m: re.Match) -> int:
    h, mi, s, ms = (int(g) for g in m.groups())
    if mi >= 60 or s >= 60:
        raise ValueError("subtitle corrupt: invalid timestamp")
    return ((h * 60 + mi) * 60 + s) * 1000 + ms


def _clean(lines: list[str]) -> str:
    text = " ".join(" ".join(_TAG.sub("", ln).split()) for ln in lines)
    return " ".join(text.split())


def parse_srt(text: str) -> list[tuple[int, int, str]]:
    """SubRip → [(start_ms, end_ms, text)] in file order. Cue numbers
    are tolerated but not required (crawled files drop them)."""
    cues: list[tuple[int, int, str]] = []
    block: list[str] = []

    def flush():
        if not block:
            return
        idx = 0
        if block and block[0].strip().isdigit():
            idx = 1
        if idx >= len(block) or "-->" not in block[idx]:
            raise ValueError("SRT corrupt: cue without timing line")
        times = _TS.findall(block[idx])
        ms = [_ts_ms(m) for m in _TS.finditer(block[idx])]
        if len(ms) < 2:
            raise ValueError("SRT corrupt: bad timing line")
        start, end = ms[0], ms[1]
        if end < start:
            raise ValueError("SRT corrupt: cue ends before it starts")
        body = _clean(block[idx + 1 :])
        if body:
            cues.append((start, end, body))
        block.clear()

    for raw in text.splitlines():
        if raw.strip():
            block.append(raw)
        else:
            flush()
    flush()
    return cues


def parse_vtt(text: str) -> list[tuple[int, int, str]]:
    """WebVTT → [(start_ms, end_ms, text)]: header required, NOTE/STYLE/
    REGION blocks skipped, cue settings after the timing ignored, inline
    tags stripped."""
    lines = text.splitlines()
    if not lines or not lines[0].strip().startswith("WEBVTT"):
        raise ValueError("not a WebVTT file (missing WEBVTT header)")
    cues: list[tuple[int, int, str]] = []
    i = 1
    n = len(lines)
    while i < n:
        ln = lines[i].strip()
        if not ln:
            i += 1
            continue
        if ln.startswith(("NOTE", "STYLE", "REGION")):
            while i < n and lines[i].strip():
                i += 1
            continue
        # optional cue identifier line
        if "-->" not in ln:
            i += 1
            if i >= n or "-->" not in lines[i]:
                raise ValueError("WebVTT corrupt: cue without timing line")
            ln = lines[i].strip()
        ms = [_ts_ms(m) for m in _TS.finditer(ln)]
        if len(ms) < 2:
            raise ValueError("WebVTT corrupt: bad timing line")
        start, end = ms[0], ms[1]
        if end < start:
            raise ValueError("WebVTT corrupt: cue ends before it starts")
        i += 1
        body_lines = []
        while i < n and lines[i].strip():
            body_lines.append(lines[i])
            i += 1
        body = _clean(body_lines)
        if body:
            cues.append((start, end, body))
    return cues


def parse_subtitles(payload: bytes) -> list[tuple[int, int, str]]:
    """Dispatch on the WEBVTT magic, else SRT."""
    text = payload.decode("utf-8", "replace").lstrip("﻿")
    if text.lstrip()[:6] == "WEBVTT":
        return parse_vtt(text)
    return parse_srt(text)


def align_cues(cues_df, segments_df, asset_col: str = "asset_id"):
    """Pair subtitle cues with time-interval rows by overlap.

    ``cues_df``: (asset, cue_idx, start_ms, end_ms, text);
    ``segments_df``: (asset, seg_start_ms, seg_end_ms, ...). Returns one
    row per overlapping (cue, segment) with the overlap length — the
    input to CTC-style pairing or coverage QA (cues with zero overlap
    rows are silence-only captions; segments with none are untranscribed
    speech). Asset-keyed equi-join THEN the interval predicate: the only
    shuffle key is the asset id, never time."""
    from pyspark.sql import functions as F

    c, s = cues_df.alias("c"), segments_df.alias("s")
    overlap = F.least(F.col("c.end_ms"), F.col("s.seg_end_ms")) - F.greatest(
        F.col("c.start_ms"), F.col("s.seg_start_ms")
    )
    return (
        c.join(s, F.col(f"c.{asset_col}") == F.col(f"s.{asset_col}"))
        .where(
            (F.col("c.start_ms") < F.col("s.seg_end_ms"))
            & (F.col("s.seg_start_ms") < F.col("c.end_ms"))
        )
        .select(
            F.col(f"c.{asset_col}").alias(asset_col),
            "c.cue_idx",
            "c.start_ms",
            "c.end_ms",
            "s.seg_start_ms",
            "s.seg_end_ms",
            overlap.alias("overlap_ms"),
            "c.text",
        )
    )
