"""Audio container/bitstream AUDITS from public specs: MP3, FLAC, OGG.

Speech-corpus triage needs duration / rate / channel / bitrate metadata
for crawled audio WITHOUT a decoder library — the audio counterpart of
the video container probes (`llm/avi.py`, `llm/mp4.py`, `llm/webm.py`).
Everything derives from published format documentation:

- MP3: the MPEG-1/2 audio frame header (ISO/IEC 11172-3 / 13818-3
  public layouts — 11-bit sync, version/layer bits, bitrate and
  sample-rate tables, padding), ID3v2 tag skipping (syncsafe sizes),
  and the de-facto Xing/Info VBR header. The audit WALKS frame headers
  (4 bytes each, payloads seeked over) so a CBR/VBR file yields exact
  frame counts and duration.
- FLAC: the 'fLaC' stream marker + METADATA_BLOCK_STREAMINFO bit
  layout (sample rate 20 bits, channels 3+1, bits-per-sample 5+1,
  total samples 36 bits, unencoded-audio MD5) — one bounded read.
- OGG: the RFC 3533 page structure ('OggS' capture, granule position,
  segment lacing) plus the Vorbis ('\\x01vorbis') and Opus ('OpusHead')
  identification headers for rate/channels; duration comes from the
  last page's granule position (Opus granules run at 48 kHz by spec).

All parsers honor the hostile-crawl contract: corrupt input raises
ValueError only (fuzz-pinned), and per-file read volume is bounded by
headers, not payloads. Decode stays out of scope by design — these are
the audit/triage path; WAV-PCM decode lives in `media_codecs.wav_decode`
and MP4-PCM in `mp4.mp4_extract_audio`.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

__all__ = ["AudioAudit", "mp3_audit", "flac_audit", "ogg_audit", "sniff_audio", "id3v2_tags", "build_id3v2"]


@dataclass
class AudioAudit:
    container: str          # "mp3" | "flac" | "ogg"
    codec: str              # "mp3" | "flac" | "vorbis" | "opus" | "?"
    sample_rate: int
    channels: int
    duration_ms: int
    n_frames: int           # mp3 frames / flac inter-frame N/A (0) / ogg pages
    bitrate_kbps: int       # average (0 if unknown)
    vbr: bool = False
    extra: dict | None = None


# ---------------------------------------------------------------------------
# MP3
# ---------------------------------------------------------------------------

_BITRATES_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_BITRATES_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_RATES_V1 = [44100, 48000, 32000]
_RATES_V2 = [22050, 24000, 16000]
_RATES_V25 = [11025, 12000, 8000]


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (syncsafe 28-bit size)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    b = data[6:10]
    if any(x & 0x80 for x in b):
        raise ValueError("MP3 corrupt: non-syncsafe ID3v2 size")
    return 10 + ((b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3])


def _mp3_frame(data: bytes, pos: int):
    """Parse one frame header → (frame_len, samples, rate, kbps,
    channels) or None when the sync/fields are invalid."""
    if pos + 4 > len(data):
        return None
    h = struct.unpack_from(">I", data, pos)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver = (h >> 19) & 0x3          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (h >> 17) & 0x3        # 1 = Layer III
    if ver == 1 or layer != 1:
        return None
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    padding = (h >> 9) & 0x1
    mode = (h >> 6) & 0x3
    channels = 1 if mode == 3 else 2
    if ver == 3:
        kbps, rate, samples = _BITRATES_V1_L3[br_idx], _RATES_V1[sr_idx], 1152
    else:
        rate = (_RATES_V2 if ver == 2 else _RATES_V25)[sr_idx]
        kbps, samples = _BITRATES_V2_L3[br_idx], 576
    frame_len = samples // 8 * kbps * 1000 // rate + padding
    if frame_len < 4:
        return None
    return frame_len, samples, rate, kbps, channels


def mp3_audit(data: bytes) -> AudioAudit:
    """Walk every frame header: exact frame count, per-frame bitrate
    average, total duration. A leading ID3v2 tag is skipped; a Xing/Info
    header (first frame of VBR files) marks the file VBR and its frame
    count is cross-checked. Resyncs after junk by scanning to the next
    valid sync (crawled MP3s are routinely truncated/spliced)."""
    pos = _id3v2_size(data)
    n = total_samples = total_kbps = 0
    kbps_min, kbps_max = 1 << 30, 0
    rate = channels = None
    vbr = False
    xing_frames = None
    while pos + 4 <= len(data):
        f = _mp3_frame(data, pos)
        if f is None:
            nxt = data.find(b"\xff", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        frame_len, samples, r, kbps, ch = f
        if rate is None:
            rate, channels = r, ch
            body = data[pos + 4 : pos + frame_len]
            for tag in (b"Xing", b"Info"):
                i = body.find(tag)
                if 0 <= i < 40:
                    flags = struct.unpack_from(">I", body, i + 4)[0]
                    if flags & 0x1:
                        xing_frames = struct.unpack_from(">I", body, i + 8)[0]
                    vbr = tag == b"Xing"
                    break
        n += 1
        total_samples += samples
        total_kbps += kbps
        kbps_min, kbps_max = min(kbps_min, kbps), max(kbps_max, kbps)
        pos += frame_len
    if rate is None:
        raise ValueError("MP3 corrupt: no valid frame header found")
    avg = total_kbps // n
    vbr = vbr or kbps_min != kbps_max
    return AudioAudit(
        "mp3", "mp3", rate, channels, total_samples * 1000 // rate, n, avg,
        vbr, {"xing_frames": xing_frames} if xing_frames is not None else None,
    )


# ---------------------------------------------------------------------------
# FLAC
# ---------------------------------------------------------------------------


def flac_audit(data: bytes) -> AudioAudit:
    """STREAMINFO only — the first metadata block is mandatory and holds
    everything triage needs; audio frames are never touched."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC marker)")
    pos = 4
    while pos + 4 <= len(data):
        hdr = data[pos]
        btype = hdr & 0x7F
        (size,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + size]
        if btype == 0:
            if len(body) < 34:
                raise ValueError("FLAC corrupt: short STREAMINFO")
            bits = int.from_bytes(body[10:18], "big")
            rate = bits >> 44
            channels = ((bits >> 41) & 0x7) + 1
            bps = ((bits >> 36) & 0x1F) + 1
            total = bits & ((1 << 36) - 1)
            if rate == 0:
                raise ValueError("FLAC corrupt: zero sample rate")
            return AudioAudit(
                "flac", "flac", rate, channels, total * 1000 // rate, 0, 0,
                False,
                {"bits_per_sample": bps, "total_samples": total,
                 "md5": body[18:34].hex()},
            )
        if hdr & 0x80:
            break
        pos += 4 + size
    raise ValueError("FLAC corrupt: missing STREAMINFO")


# ---------------------------------------------------------------------------
# OGG (Vorbis / Opus)
# ---------------------------------------------------------------------------


def ogg_audit(data: bytes) -> AudioAudit:
    """RFC 3533 page walk: codec id from the first packet, duration from
    the final granule position. Page payload bytes are only read for the
    identification header (first page)."""
    if data[:4] != b"OggS":
        raise ValueError("not an OGG stream (missing OggS capture)")
    pos = 0
    n_pages = 0
    last_granule = 0
    codec, rate, channels, pre_skip = "?", 0, 0, 0
    while pos + 27 <= len(data):
        if data[pos : pos + 4] != b"OggS":
            raise ValueError("OGG corrupt: lost page sync")
        granule = struct.unpack_from("<q", data, pos + 6)[0]
        nsegs = data[pos + 26]
        seg_table = data[pos + 27 : pos + 27 + nsegs]
        if len(seg_table) < nsegs:
            raise ValueError("OGG corrupt: truncated segment table")
        body = pos + 27 + nsegs
        body_len = sum(seg_table)
        if body + body_len > len(data):
            raise ValueError("OGG corrupt: truncated page body")
        if n_pages == 0:
            first = data[body : body + body_len]
            if first[:7] == b"\x01vorbis":
                codec = "vorbis"
                channels = first[11]
                (rate,) = struct.unpack_from("<I", first, 12)
            elif first[:8] == b"OpusHead":
                codec = "opus"
                channels = first[9]
                (pre_skip,) = struct.unpack_from("<H", first, 10)
                (rate,) = struct.unpack_from("<I", first, 12)  # input rate
        if granule >= 0:
            last_granule = max(last_granule, granule)
        n_pages += 1
        pos = body + body_len
    if n_pages == 0:
        raise ValueError("OGG corrupt: no pages")
    if codec == "opus":
        # Opus granules tick at 48 kHz regardless of the input rate
        duration_ms = max(0, last_granule - pre_skip) * 1000 // 48000
    elif rate:
        duration_ms = last_granule * 1000 // rate
    else:
        duration_ms = 0
    return AudioAudit(
        "ogg", codec, rate, channels, duration_ms, n_pages, 0, True,
        {"pre_skip": pre_skip} if codec == "opus" else None,
    )


def sniff_audio(data: bytes) -> str:
    if data[:3] == b"ID3" or (
        len(data) > 1 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    ):
        return "mp3"
    if data[:4] == b"fLaC":
        return "flac"
    if data[:4] == b"OggS":
        return "ogg"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return "unknown"


# ---------------------------------------------------------------------------
# ID3v2 text frames (the metadata block mp3_audit skips)
# ---------------------------------------------------------------------------


def id3v2_tags(data: bytes) -> dict[str, str]:
    """Text frames from a leading ID3v2.3/2.4 tag: {frame_id: text} for
    T*** frames (TIT2 title, TPE1 artist, TALB album, …), decoding the
    four spec text encodings (latin-1, UTF-16 w/BOM, UTF-16BE, UTF-8).
    v2.4 uses syncsafe frame sizes, v2.3 plain big-endian — both per the
    published informal standards. Returns {} when no tag is present;
    corrupt tags raise ValueError (hostile-crawl contract)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return {}
    ver = data[3]
    total = _id3v2_size(data)
    if total > len(data):
        raise ValueError("MP3 corrupt: ID3v2 size past EOF")
    pos = 10
    if data[5] & 0x40:  # extended header present
        if ver >= 4:
            (ext,) = struct.unpack_from(">I", data, pos)
            ext = ((ext >> 24) & 0x7F) << 21 | ((ext >> 16) & 0x7F) << 14 \
                | ((ext >> 8) & 0x7F) << 7 | (ext & 0x7F)
        else:
            (ext,) = struct.unpack_from(">I", data, pos)
            ext += 4
        pos += ext
    out: dict[str, str] = {}
    enc_map = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}
    while pos + 10 <= total:
        fid = data[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        if not fid.isalnum():
            raise ValueError(f"MP3 corrupt: bad ID3 frame id {fid!r}")
        (raw_size,) = struct.unpack_from(">I", data, pos + 4)
        if ver >= 4:
            if raw_size & 0x80808080:
                raise ValueError("MP3 corrupt: non-syncsafe v2.4 frame size")
            size = ((raw_size >> 24) & 0x7F) << 21 | ((raw_size >> 16) & 0x7F) << 14 \
                | ((raw_size >> 8) & 0x7F) << 7 | (raw_size & 0x7F)
        else:
            size = raw_size
        body_at = pos + 10
        if body_at + size > total:
            raise ValueError("MP3 corrupt: ID3 frame overruns tag")
        if fid[:1] == b"T" and size >= 1:
            enc = data[body_at]
            codec = enc_map.get(enc)
            if codec is None:
                raise ValueError(f"MP3 corrupt: ID3 text encoding {enc}")
            text = data[body_at + 1 : body_at + size].decode(codec, "replace")
            out[fid.decode("ascii")] = text.rstrip("\x00")
        pos = body_at + size
    return out


def build_id3v2(tags: dict[str, str], version: int = 4) -> bytes:
    """Fixture builder: v2.3 or v2.4 tag with UTF-8 (v2.4) or UTF-16
    (v2.3) text frames."""
    frames = b""
    for fid, text in sorted(tags.items()):
        if version >= 4:
            body = b"\x03" + text.encode("utf-8")
        else:
            body = b"\x01" + text.encode("utf-16")
        size = len(body)
        if version >= 4:
            raw = ((size >> 21) & 0x7F) << 24 | ((size >> 14) & 0x7F) << 16 \
                | ((size >> 7) & 0x7F) << 8 | (size & 0x7F)
        else:
            raw = size
        frames += fid.encode("ascii") + struct.pack(">I", raw) + b"\x00\x00" + body
    total = len(frames)
    ss = bytes([(total >> 21) & 0x7F, (total >> 14) & 0x7F,
                (total >> 7) & 0x7F, total & 0x7F])
    return b"ID3" + bytes([version, 0, 0]) + ss + frames
