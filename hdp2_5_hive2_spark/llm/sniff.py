"""One front door for crawled payloads: unified type sniffing.

Every family in this package ships its own magic-byte dispatch (images,
audio, video containers, documents, archives, subtitles). `sniff_any`
unifies them into a single classification — the first thing an
ingestion job does with an unknown payload — returning (family, kind):

    image:  png bmp gif jpeg tiff
    audio:  wav flac mp3 ogg
    video:  avi mp4 webm
    doc:    pdf docx epub zip
    text:   html subtitle-srt subtitle-vtt json plain
    archive: warc warc-gz gzip tar tfrecord(?)

TFRecord has no magic; it is detected structurally (first record's
masked length-CRC verifies) — cheap and collision-proof, since a valid
CRC-32C of the first 8 bytes landing at exactly offset 8 by chance is a
1-in-4-billion event. Text kinds apply only after binary sniffs miss
and the payload decodes as UTF-8.

Pure function, Arrow-seam friendly; `sniff_counts` is the one-line
corpus profile (what's in this crawl?) every triage run starts with.
"""

from __future__ import annotations

__all__ = ["sniff_any", "sniff_counts"]


def sniff_any(payload: bytes) -> tuple[str, str]:
    from hdp2_5_hive2_spark.llm.audio_containers import sniff_audio
    from hdp2_5_hive2_spark.llm.documents import sniff_document
    from hdp2_5_hive2_spark.llm.media_codecs import _sniff as sniff_image

    if not payload:
        return ("unknown", "empty")
    img = sniff_image(payload)
    if img == "avi":
        return ("video", "avi")
    if img == "webp":
        from hdp2_5_hive2_spark.llm.webp import sniff_webp

        return ("image", sniff_webp(payload))
    if img != "unknown":
        return ("image" if img not in ("wav", "flac") else "audio", img)
    if payload[4:8] == b"ftyp":
        return ("video", "mp4")
    if payload[:4] == b"\x1aE\xdf\xa3":
        return ("video", "webm")
    au = sniff_audio(payload)
    if au != "unknown":
        return ("audio", au)
    doc = sniff_document(payload)
    if doc == "zip":
        return ("doc", "zip")
    if doc != "unknown":
        return ("doc", doc)
    if payload[:2] == b"\x1f\x8b":
        return ("archive", "warc-gz" if _gz_is_warc(payload) else "gzip")
    if payload[:5] == b"WARC/":
        return ("archive", "warc")
    if len(payload) > 262 and payload[257:262] in (b"ustar", b"ustar"):
        return ("archive", "tar")
    if _looks_tfrecord(payload):
        return ("archive", "tfrecord")
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError:
        return ("unknown", "binary")
    t = text.lstrip("﻿ \t\r\n")
    if t[:6] == "WEBVTT":
        return ("text", "subtitle-vtt")
    if "-->" in t.split("\n\n", 1)[0].replace("\r", ""):
        return ("text", "subtitle-srt")
    if t[:1] in ("{", "["):
        return ("text", "json")
    if t[:1] == "<" or "<html" in t[:256].lower():
        return ("text", "html")
    return ("text", "plain")


def _gz_is_warc(payload: bytes) -> bool:
    import zlib

    try:
        head = zlib.decompressobj(wbits=31).decompress(payload[:4096], 16)
        return head[:5] == b"WARC/"
    except zlib.error:
        return False


def _looks_tfrecord(payload: bytes) -> bool:
    import struct

    from hdp2_5_hive2_spark.llm.tfrecord import _masked, crc32c

    if len(payload) < 12:
        return False
    (want,) = struct.unpack_from("<I", payload, 8)
    return _masked(crc32c(payload[:8])) == want


def sniff_counts(df, payload_col: str = "payload"):
    """The corpus triage profile: (family, kind, n, total_bytes) per
    payload type — one Arrow map pass + one tiny aggregation."""
    import pandas as pd
    from pyspark.sql import functions as F

    def run(batches):
        for b in batches:
            rows = []
            for p in b[payload_col]:
                p = bytes(p) if p is not None else b""
                fam, kind = sniff_any(p)
                rows.append((fam, kind, len(p)))
            yield pd.DataFrame(rows, columns=["family", "kind", "n_bytes"])

    return (
        df.select(payload_col)
        .mapInPandas(run, "family string, kind string, n_bytes bigint")
        .groupBy("family", "kind")
        .agg(F.count("*").alias("n"), F.sum("n_bytes").alias("total_bytes"))
    )
