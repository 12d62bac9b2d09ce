"""Unified payload sniffing (llm/sniff.py): every fixture builder in the
package must classify correctly, plus the Spark triage profile."""

from __future__ import annotations

import gzip

import numpy as np
import pytest

from hdp2_5_hive2_spark.llm.sniff import sniff_any, sniff_counts


def _cases(spark=None):
    from hdp2_5_hive2_spark.llm.audio_containers import build_id3v2
    from hdp2_5_hive2_spark.llm.avi import avi_encode_dib
    from hdp2_5_hive2_spark.llm.documents import build_docx, build_epub, build_pdf
    from hdp2_5_hive2_spark.llm.flac import flac_encode
    from hdp2_5_hive2_spark.llm.media_codecs import bmp_encode, png_encode, wav_encode
    from hdp2_5_hive2_spark.llm.mp4 import mp4_mux
    from hdp2_5_hive2_spark.llm.tfrecord import tfrecord_write
    from hdp2_5_hive2_spark.llm.tiff import tiff_encode
    from hdp2_5_hive2_spark.llm.warc import build_warc, build_warc_gz
    from hdp2_5_hive2_spark.llm.webdataset import build_shard
    from hdp2_5_hive2_spark.llm.webm import webm_mux

    px = np.zeros((8, 9), dtype=np.uint8)
    rgb = np.zeros((8, 9, 3), dtype=np.uint8)
    sig = np.zeros(100, dtype=np.int16)
    return {
        ("image", "png"): png_encode(px),
        ("image", "bmp"): bmp_encode(rgb),
        ("image", "tiff"): tiff_encode(px),
        ("image", "webp-lossless"): __import__(
            "hdp2_5_hive2_spark.llm.webp", fromlist=["vp8l_encode_lossless"]
        ).vp8l_encode_lossless(rgb),
        ("audio", "wav"): wav_encode(sig, 16000),
        ("audio", "flac"): flac_encode(sig),
        ("audio", "mp3"): build_id3v2({"TIT2": "x"}) + b"\xff\xfb\x90\x00",
        ("video", "avi"): avi_encode_dib([rgb]),
        ("video", "mp4"): mp4_mux([b"x"], 4, 4),
        ("video", "webm"): webm_mux([b"x"], 4, 4),
        ("doc", "pdf"): build_pdf(["hi"]),
        ("doc", "docx"): build_docx(["hi"]),
        ("doc", "epub"): build_epub(["hi"]),
        ("archive", "warc"): build_warc([{"warc_type": "resource", "payload": b"x"}]),
        ("archive", "warc-gz"): build_warc_gz(
            [{"warc_type": "resource", "payload": b"x"}]
        ),
        ("archive", "gzip"): gzip.compress(b"plain stuff"),
        ("archive", "tar"): build_shard([("k", {"txt": b"v"})]),
        ("archive", "tfrecord"): tfrecord_write([{"a": [b"b"]}]),
        ("text", "subtitle-vtt"):
            "WEBVTT\n\n00:00:01.000 --> 00:00:02.000\nx\n".encode(),
        ("text", "subtitle-srt"):
            "1\n00:00:01,000 --> 00:00:02,000\nx\n".encode(),
        ("text", "json"): b'{"a": 1}',
        ("text", "html"): b"<html><body>x</body></html>",
        ("text", "plain"): b"just words here",
        ("unknown", "binary"): bytes([0xFE, 0xFE, 0x00, 0x81]) * 10,
        ("unknown", "empty"): b"",
    }


def test_every_builder_classifies(spark):
    """Also covers jpeg/gif via ImageIO — encoders we don't control."""
    from tests.test_media_codecs import _jpeg_tools

    cases = _cases()
    encode, _ = _jpeg_tools(spark)
    cases[("image", "jpeg")] = encode(np.full((8, 8, 3), 5, dtype=np.uint8))
    mismatches = {
        want: sniff_any(p) for want, p in cases.items() if sniff_any(p) != want
    }
    assert not mismatches, mismatches


def test_sniff_counts_profile(spark):
    from hdp2_5_hive2_spark.llm.media_codecs import png_encode

    payloads = (
        [png_encode(np.zeros((4, 4), dtype=np.uint8))] * 3
        + [b"plain text"] * 2
        + [b""]
    )
    df = spark.createDataFrame([(bytearray(p),) for p in payloads], "payload binary")
    rows = {(r.family, r.kind): (r.n, r.total_bytes)
            for r in sniff_counts(df).collect()}
    assert rows[("image", "png")][0] == 3
    assert rows[("text", "plain")] == (2, 20)
    assert rows[("unknown", "empty")][0] == 1
