"""WebM / Matroska (EBML) video container from the public specs.

Completes the crawled-video container set (`llm/avi.py` RIFF-AVI,
`llm/mp4.py` ISO BMFF): WebM is the web's open container, and a
training-data pipeline must audit it (codec id, geometry, timing) and
extract frame payloads without a codec library. Everything derives from
the published Matroska/EBML specifications (RFC 8794 EBML structure +
the matroska.org element registry): variable-length-integer element IDs
and sizes, the Segment → Info/Tracks/Cluster hierarchy, and SimpleBlock
framing (track vint + signed 16-bit relative timestamp + flags).

Scope:
- parse/demux: first video track (TrackType 1) — codec id (V_VP8,
  V_VP9, V_AV1, V_UNCOMPRESSED, V_MJPEG, ...), PixelWidth/Height,
  TimestampScale-correct per-frame timestamps, frame payload ranges.
  Block lacing is rejected explicitly (video tracks are laceless in
  practice; audio lacing is out of video scope).
- probe: seek-based walk reading element HEADERS and the small
  Info/Tracks elements; SimpleBlock payloads are seeked over (~15 bytes
  read per frame — same budget class as AVI's no-idx1 walk; Matroska
  keeps frame data inline in Clusters, so unlike idx1/moov there is no
  single off-band index to read instead; Cues point at clusters, not
  frames).
- mux: minimal conformant writer (EBML header, Info, one video
  TrackEntry, per-frame Clusters) so roundtrips don't depend on an
  external muxer. V_MJPEG payloads decode through the from-spec T.81
  decoder; compressed VP8/VP9/AV1 bitstreams stay extraction-only — the
  same boundary the other containers draw.

Scale: same Arrow-seam discipline as avi/mp4 — parse map-side, payloads
never shuffle; `video_source` dispatches on the EBML magic.
"""

from __future__ import annotations

import struct

__all__ = [
    "WebmTrack",
    "webm_mux",
    "webm_parse",
    "webm_probe",
    "webm_frame_ranges",
    "webm_decode_frames",
]

_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_UNKNOWN = -1


def _vint(data: bytes, pos: int, keep_marker: bool):
    """EBML variable-length integer at ``pos`` → (value, next_pos).
    IDs keep the length-marker bit (matching the registry constants);
    sizes strip it; an all-ones size means 'unknown' (→ _UNKNOWN)."""
    if pos >= len(data):
        raise ValueError("EBML corrupt: truncated vint")
    first = data[pos]
    if first == 0:
        raise ValueError("EBML corrupt: invalid vint marker")
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        raise ValueError("EBML corrupt: truncated vint")
    if keep_marker:
        val = int.from_bytes(data[pos : pos + length], "big")
    else:
        val = first & (0xFF >> length)
        for i in range(1, length):
            val = (val << 8) | data[pos + i]
        if val == (1 << (7 * length)) - 1:
            return _UNKNOWN, pos + length
    return val, pos + length


def _walk(data: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) over an EBML stream."""
    while pos < end:
        eid, p = _vint(data, pos, keep_marker=True)
        size, body = _vint(data, p, keep_marker=False)
        if size == _UNKNOWN:
            yield eid, body, end  # unknown-size: extends to parent end
            return
        if body + size > end:
            raise ValueError("EBML corrupt: element overruns its parent")
        yield eid, body, body + size
        pos = body + size


def _uint(data: bytes, b: int, e: int) -> int:
    return int.from_bytes(data[b:e], "big")


class WebmTrack:
    """First video track's audit + frame geometry."""

    def __init__(self, codec, width, height, timestamp_scale):
        self.codec = codec
        self.width = width
        self.height = height
        self.timestamp_scale = timestamp_scale  # ns per timestamp tick
        self.frames: list[tuple[int, int, int]] = []  # (offset, length, ts)

    def ts_ms(self, i: int) -> int:
        return self.frames[i][2] * self.timestamp_scale // 1_000_000


def _parse_block_header(data: bytes, b: int, e: int):
    """SimpleBlock: track vint + i16 relative timestamp + flags byte →
    (track_number, rel_ts, payload_start). Laced blocks are rejected."""
    track, p = _vint(data, b, keep_marker=False)
    if p + 3 > e:
        raise ValueError("EBML corrupt: truncated SimpleBlock header")
    (rel_ts,) = struct.unpack_from(">h", data, p)
    flags = data[p + 2]
    if flags & 0x06:
        raise ValueError("WebM: laced blocks unsupported (video is laceless)")
    return track, rel_ts, p + 3


def webm_parse(data: bytes) -> WebmTrack:
    """Parse the container and locate every video frame (no pixel
    decode): codec/geometry from Tracks, timestamps from cluster +
    relative block times in TimestampScale units."""
    try:
        return _parse_inner(data)
    except struct.error as exc:
        raise ValueError(f"EBML corrupt: {exc}") from None


def _parse_inner(data: bytes) -> WebmTrack:
    top = _walk(data, 0, len(data))
    eid, b, e = next(top, (None, 0, 0))
    if eid != _EBML:
        raise ValueError("not a WebM/Matroska file (missing EBML header)")
    seg = next((x for x in top if x[0] == _SEGMENT), None)
    if seg is None:
        raise ValueError("EBML corrupt: missing Segment")
    scale = 1_000_000
    track: WebmTrack | None = None
    video_track_no = None
    for eid, b, e in _walk(data, seg[1], seg[2]):
        if eid == _INFO:
            for iid, ib, ie in _walk(data, b, e):
                if iid == _TIMESTAMP_SCALE:
                    scale = _uint(data, ib, ie)
        elif eid == _TRACKS:
            for tid, tb, te in _walk(data, b, e):
                if tid != _TRACK_ENTRY:
                    continue
                num = ttype = width = height = None
                codec = "?"
                for fid, fb, fe in _walk(data, tb, te):
                    if fid == _TRACK_NUMBER:
                        num = _uint(data, fb, fe)
                    elif fid == _TRACK_TYPE:
                        ttype = _uint(data, fb, fe)
                    elif fid == _CODEC_ID:
                        codec = data[fb:fe].decode("ascii", "replace")
                    elif fid == _VIDEO:
                        for vid, vb, ve in _walk(data, fb, fe):
                            if vid == _PIXEL_W:
                                width = _uint(data, vb, ve)
                            elif vid == _PIXEL_H:
                                height = _uint(data, vb, ve)
                if ttype == 1 and track is None:
                    track = WebmTrack(codec, width or 0, height or 0, scale)
                    video_track_no = num
        elif eid == _CLUSTER:
            if track is None:
                raise ValueError("EBML corrupt: Cluster before Tracks")
            cluster_ts = 0
            for cid, cb, ce in _walk(data, b, e):
                if cid == _CLUSTER_TS:
                    cluster_ts = _uint(data, cb, ce)
                elif cid == _SIMPLE_BLOCK:
                    tno, rel, payload = _parse_block_header(data, cb, ce)
                    if tno == video_track_no:
                        track.frames.append(
                            (payload, ce - payload, cluster_ts + rel)
                        )
    if track is None:
        raise ValueError("WebM: no video track")
    track.timestamp_scale = scale
    return track


def webm_frame_ranges(data: bytes) -> list[tuple[int, int, int]]:
    """(offset, length, ts_ms) per video frame."""
    t = webm_parse(data)
    return [(o, ln, ts * t.timestamp_scale // 1_000_000) for o, ln, ts in t.frames]


def webm_probe(fh) -> WebmTrack:
    """Seek-based probe: element headers + the small Info/Tracks bodies
    are read; SimpleBlock payloads are seeked over, so per-frame cost is
    ~15 bytes regardless of frame size. (Matroska frame data is inline
    in Clusters — there is no off-band per-frame index like idx1/moov,
    so a header walk is the metadata-minimal access path.)"""

    def read_at(pos, n):
        fh.seek(pos)
        return fh.read(n)

    head = read_at(0, 4096)
    top = _walk(head, 0, len(head))
    eid, b, e = next(top, (None, 0, 0))
    if eid != _EBML:
        raise ValueError("not a WebM/Matroska file (missing EBML header)")
    # locate Segment from the in-memory prefix (EBML header is tiny)
    pos = e
    hdr = read_at(pos, 16)
    eid, p = _vint(hdr, 0, keep_marker=True)
    if eid != _SEGMENT:
        raise ValueError("EBML corrupt: missing Segment")
    size, body_rel = _vint(hdr, p, keep_marker=False)
    seg_start = pos + body_rel
    fh.seek(0, 2)
    seg_end = fh.tell() if size == _UNKNOWN else seg_start + size

    scale = 1_000_000
    track: WebmTrack | None = None
    video_track_no = None
    pos = seg_start
    cluster_ts = 0
    while pos < seg_end:
        hdr = read_at(pos, 16)
        if not hdr:
            break
        eid, p = _vint(hdr, 0, keep_marker=True)
        size, body_rel = _vint(hdr, p, keep_marker=False)
        body = pos + body_rel
        end = seg_end if size == _UNKNOWN else body + size
        if eid in (_INFO, _TRACKS):
            buf = read_at(body, end - body)
            fake = WebmTrack("?", 0, 0, scale)
            for iid, ib, ie in _walk(buf, 0, len(buf)):
                if eid == _INFO and iid == _TIMESTAMP_SCALE:
                    scale = _uint(buf, ib, ie)
                elif eid == _TRACKS and iid == _TRACK_ENTRY:
                    num = ttype = width = height = None
                    codec = "?"
                    for fid, fb, fe in _walk(buf, ib, ie):
                        if fid == _TRACK_NUMBER:
                            num = _uint(buf, fb, fe)
                        elif fid == _TRACK_TYPE:
                            ttype = _uint(buf, fb, fe)
                        elif fid == _CODEC_ID:
                            codec = buf[fb:fe].decode("ascii", "replace")
                        elif fid == _VIDEO:
                            for vid, vb, ve in _walk(buf, fb, fe):
                                if vid == _PIXEL_W:
                                    width = _uint(buf, vb, ve)
                                elif vid == _PIXEL_H:
                                    height = _uint(buf, vb, ve)
                    if ttype == 1 and track is None:
                        track = WebmTrack(codec, width or 0, height or 0, scale)
                        video_track_no = num
            pos = end
        elif eid == _CLUSTER:
            if track is None:
                raise ValueError("EBML corrupt: Cluster before Tracks")
            cpos = body
            while cpos < end:
                chdr = read_at(cpos, 16)
                if not chdr:
                    break
                cid, cp = _vint(chdr, 0, keep_marker=True)
                csize, cbody_rel = _vint(chdr, cp, keep_marker=False)
                cbody = cpos + cbody_rel
                cend = end if csize == _UNKNOWN else cbody + csize
                if cid == _CLUSTER_TS:
                    cluster_ts = _uint(read_at(cbody, cend - cbody), 0, cend - cbody)
                elif cid == _SIMPLE_BLOCK:
                    bh = read_at(cbody, min(12, cend - cbody))
                    tno, rel, payload_rel = _parse_block_header(bh, 0, len(bh))
                    if tno == video_track_no:
                        track.frames.append(
                            (cbody + payload_rel, cend - (cbody + payload_rel),
                             cluster_ts + rel)
                        )
                cpos = cend
            pos = end
        else:
            pos = end
    if track is None:
        raise ValueError("WebM: no video track")
    track.timestamp_scale = scale
    return track


# ---------------------------------------------------------------------------
# Minimal writer
# ---------------------------------------------------------------------------


def _enc_vint_size(val: int) -> bytes:
    """Encode a SIZE vint (marker bit set per length)."""
    for length in range(1, 9):
        if val < (1 << (7 * length)) - 1:
            return ((1 << (7 * length)) | val).to_bytes(length, "big")
    raise ValueError("EBML: size too large")


def _enc_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _el(eid: int, body: bytes) -> bytes:
    return _enc_id(eid) + _enc_vint_size(len(body)) + body


def _el_uint(eid: int, val: int) -> bytes:
    return _el(eid, val.to_bytes(max(1, (val.bit_length() + 7) // 8), "big"))


def webm_mux(
    frames: list[bytes],
    width: int,
    height: int,
    codec: str = "V_VP8",
    frame_ms: int = 40,
) -> bytes:
    """Minimal conformant WebM: EBML header, Segment{Info, Tracks, one
    Cluster per frame (keyframe SimpleBlocks, relative ts 0)}. With the
    default 1 ms TimestampScale tick (1,000,000 ns), cluster timestamps
    are exact milliseconds."""
    if not frames:
        raise ValueError("WebM: need at least one frame")
    ebml = _el(
        _EBML,
        _el_uint(0x4286, 1) + _el_uint(0x42F7, 1) + _el_uint(0x42F2, 4)
        + _el_uint(0x42F3, 8) + _el(0x4282, b"webm")
        + _el_uint(0x4287, 2) + _el_uint(0x4285, 2),
    )
    info = _el(_INFO, _el_uint(_TIMESTAMP_SCALE, 1_000_000))
    video = _el(_VIDEO, _el_uint(_PIXEL_W, width) + _el_uint(_PIXEL_H, height))
    entry = _el(
        _TRACK_ENTRY,
        _el_uint(_TRACK_NUMBER, 1) + _el_uint(0x73C5, 1)
        + _el_uint(_TRACK_TYPE, 1) + _el(0x9C, b"\x00")  # FlagLacing = 0
        + _el(_CODEC_ID, codec.encode("ascii")) + video,
    )
    tracks = _el(_TRACKS, entry)
    clusters = b""
    for i, f in enumerate(frames):
        block = b"\x81" + struct.pack(">h", 0) + b"\x80" + f  # track 1, key
        clusters += _el(
            _CLUSTER,
            _el_uint(_CLUSTER_TS, i * frame_ms) + _el(_SIMPLE_BLOCK, block),
        )
    return ebml + _el(_SEGMENT, info + tracks + clusters)


def webm_decode_frames(data: bytes):
    """[(ts_ms, RGB array)] for V_MJPEG tracks via the T.81 decoder;
    compressed codecs raise — use webm_frame_ranges for extraction."""
    import numpy as np

    t = webm_parse(data)
    if t.codec != "V_MJPEG":
        raise ValueError(f"WebM: unsupported track codec {t.codec!r}")
    from hdp2_5_hive2_spark.llm.jpeg import jpeg_decode

    out = []
    for i, (o, ln, _) in enumerate(t.frames):
        px = jpeg_decode(data[o : o + ln])
        if px.ndim == 2:
            px = np.repeat(px[:, :, None], 3, axis=2)
        out.append((t.ts_ms(i), px))
    return out
