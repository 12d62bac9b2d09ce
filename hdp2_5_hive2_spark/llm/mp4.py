"""MP4 / ISO Base Media File Format container from the public spec.

Parity target: same multimodal-ingest contract as `llm/avi.py` (SURVEY §2
"multimodal columns") — MP4 is the dominant container in crawled video
corpora, so a training-data pipeline must at minimum AUDIT it (codec,
geometry, duration, frame count, bitrate) and locate sample byte ranges
without a codec library. Everything derives from the published ISO/IEC
14496-12 box grammar: box = u32 size + fourcc (size 1 → u64 largesize),
`moov/trak/mdia/minf/stbl` hierarchy, and the sample tables

  stsd — sample descriptions (codec fourcc, width/height for video)
  stts — decoding time deltas, run-length encoded (sample_count, delta)
  stsz — per-sample byte sizes (or one constant size)
  stsc — sample→chunk mapping runs (first_chunk, samples_per_chunk, ...)
  stco / co64 — chunk file offsets (u32 / u64)

With those five tables every sample's (file_offset, length, timestamp)
is computable — `mp4_sample_ranges` does exactly that, which is the
ranged-GET random-access path at 100 TB (the moov box is a tiny prefix/
suffix read; mdat is never scanned). Full pixel decode stays honestly
bounded: `mjpeg`-coded tracks (fourcc 'jpeg'/'mjpa') decode through the
from-spec T.81 decoder; AVC/HEVC payloads are extracted but not decoded
(a real codec library's job — same boundary avi.py draws for H264).

The writer emits a minimal conformant file (ftyp + mdat + moov with one
video track, identity matrices, 1000-unit timescale) so roundtrips and
cross-checks don't depend on any external muxer.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

__all__ = [
    "Mp4Track",
    "mp4_parse",
    "mp4_probe",
    "mp4_sample_ranges",
    "mp4_mux",
    "mp4_mux_fragmented",
    "mp4_decode_frames",
    "mp4_extract_audio",
]


def _u32(x: int) -> bytes:
    return struct.pack(">I", x)


def _box(fourcc: bytes, body: bytes) -> bytes:
    return _u32(8 + len(body)) + fourcc + body


def _full(fourcc: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + body)


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) over a box sequence."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("MP4 corrupt: box overruns its parent")
        yield fourcc, body, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, fourcc: bytes):
    for fc, b, e in _walk(data, pos, end):
        if fc == fourcc:
            return b, e
    return None


@dataclass
class Mp4Track:
    """One video track's audit row + sample geometry."""

    codec: str                 # stsd entry fourcc, e.g. "avc1", "jpeg"
    width: int
    height: int
    timescale: int             # mdhd units/second
    duration: int              # mdhd units
    n_samples: int
    sample_sizes: list[int] = field(repr=False)
    sample_offsets: list[int] = field(repr=False)
    sample_ts: list[int] = field(repr=False)  # decode times, mdhd units
    track_id: int = 1
    handler: str = "vide"      # mdia hdlr: "vide" | "soun"
    channels: int = 0          # audio tracks only
    sample_rate: int = 0       # audio tracks only (Hz)

    @property
    def duration_ms(self) -> int:
        return self.duration * 1000 // self.timescale if self.timescale else 0

    def ts_ms(self, i: int) -> int:
        return self.sample_ts[i] * 1000 // self.timescale


def _parse_stbl(data: bytes, b: int, e: int):
    codec = entry = None
    sizes: list[int] = []
    chunk_offsets: list[int] = []
    stsc_runs: list[tuple[int, int]] = []
    deltas: list[tuple[int, int]] = []
    for fc, bb, ee in _walk(data, b, e):
        if fc == b"stsd":
            (n,) = struct.unpack_from(">I", data, bb + 4)
            if n:
                entry = bb + 8
                codec = data[entry + 4 : entry + 8].decode("ascii", "replace")
        elif fc == b"stsz":
            const, n = struct.unpack_from(">II", data, bb + 4)
            sizes = (
                [const] * n
                if const
                else list(struct.unpack_from(f">{n}I", data, bb + 12))
            )
        elif fc == b"stco":
            (n,) = struct.unpack_from(">I", data, bb + 4)
            chunk_offsets = list(struct.unpack_from(f">{n}I", data, bb + 8))
        elif fc == b"co64":
            (n,) = struct.unpack_from(">I", data, bb + 4)
            chunk_offsets = list(struct.unpack_from(f">{n}Q", data, bb + 8))
        elif fc == b"stsc":
            (n,) = struct.unpack_from(">I", data, bb + 4)
            for i in range(n):
                first, per, _desc = struct.unpack_from(">III", data, bb + 8 + 12 * i)
                stsc_runs.append((first, per))
        elif fc == b"stts":
            (n,) = struct.unpack_from(">I", data, bb + 4)
            for i in range(n):
                cnt, delta = struct.unpack_from(">II", data, bb + 8 + 8 * i)
                deltas.append((cnt, delta))
    return codec, entry, sizes, chunk_offsets, stsc_runs, deltas


def _sample_layout(
    sizes: list[int],
    chunk_offsets: list[int],
    stsc_runs: list[tuple[int, int]],
    deltas: list[tuple[int, int]],
):
    """Resolve stsz+stco+stsc+stts into per-sample (offset, ts)."""
    # samples per chunk: stsc runs apply from first_chunk until next run
    per_chunk: list[int] = []
    for i, (first, per) in enumerate(stsc_runs):
        last = (
            stsc_runs[i + 1][0] - 1 if i + 1 < len(stsc_runs) else len(chunk_offsets)
        )
        per_chunk.extend([per] * (last - first + 1))
    offsets: list[int] = []
    si = 0
    for ci, base in enumerate(chunk_offsets):
        off = base
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= len(sizes):
                break
            offsets.append(off)
            off += sizes[si]
            si += 1
    ts: list[int] = []
    t = 0
    for cnt, delta in deltas:
        for _ in range(cnt):
            ts.append(t)
            t += delta
    return offsets, ts


def mp4_parse(data: bytes) -> list[Mp4Track]:
    """Parse moov and return every video track's audit + sample geometry.
    Only box headers and the (small) sample tables are touched — mdat
    payload bytes are never read, so at scale this is a metadata-sized
    read per asset."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4 (missing ftyp)")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("MP4 corrupt: missing moov")
    tracks = _parse_moov(data, *moov)
    if any(t.n_samples == 0 for t in tracks):
        frags = [
            (b - 8, bytes(data[b - 8 : e]))
            for fc, b, e in _walk(data, 0, len(data))
            if fc == b"moof"
        ]
        if frags:
            _apply_fragments(tracks, frags)
    return tracks


def _parse_moov(data: bytes, start: int, end: int) -> list[Mp4Track]:
    """Track extraction over a moov BODY — shared by the whole-buffer
    parser and the seek-based file probe (which reads only the moov box).
    Corrupt sample tables (truncated arrays, missing required boxes)
    raise ValueError, never struct.error/IndexError — crawl data is
    hostile and callers filter on a single exception type."""
    try:
        return _parse_moov_inner(data, start, end)
    except struct.error as exc:
        raise ValueError(f"MP4 corrupt: truncated table ({exc})") from None


def _parse_moov_inner(data: bytes, start: int, end: int) -> list[Mp4Track]:
    tracks: list[Mp4Track] = []
    for fc, b, e in _walk(data, start, end):
        if fc != b"trak":
            continue
        mdia = _find(data, b, e, b"mdia")
        if mdia is None:
            continue
        mdhd = _find(data, *mdia, b"mdhd")
        hdlr = _find(data, *mdia, b"hdlr")
        if mdhd is None or hdlr is None:
            raise ValueError("MP4 corrupt: trak missing mdhd/hdlr")
        version = data[mdhd[0]]
        if version == 1:
            timescale, duration = struct.unpack_from(">IQ", data, mdhd[0] + 20)
        else:
            timescale, duration = struct.unpack_from(">II", data, mdhd[0] + 12)
        handler = data[hdlr[0] + 8 : hdlr[0] + 12]
        if handler not in (b"vide", b"soun"):
            continue
        minf = _find(data, *mdia, b"minf")
        stbl = _find(data, *minf, b"stbl") if minf is not None else None
        if stbl is None:
            raise ValueError("MP4 corrupt: media trak missing minf/stbl")
        codec, entry, sizes, chunks, stsc, deltas = _parse_stbl(data, *stbl)
        width = height = channels = rate = 0
        if entry is not None:
            if handler == b"vide":
                # VisualSampleEntry: 16 SampleEntry + 16 predefined/reserved
                width, height = struct.unpack_from(">HH", data, entry + 32)
            else:
                # AudioSampleEntry: 16 SampleEntry + 8 reserved, then
                # channelcount/samplesize u16, 4 reserved, samplerate 16.16
                channels, _ss = struct.unpack_from(">HH", data, entry + 24)
                rate = struct.unpack_from(">I", data, entry + 32)[0] >> 16
        offsets, ts = _sample_layout(sizes, chunks, stsc, deltas)
        if len(offsets) != len(sizes) or len(ts) < len(sizes):
            raise ValueError("MP4 corrupt: sample tables disagree on count")
        tkhd = _find(data, b, e, b"tkhd")
        track_id = 1
        if tkhd is not None:
            tv = data[tkhd[0]]
            (track_id,) = struct.unpack_from(">I", data, tkhd[0] + (20 if tv else 12))
        tracks.append(
            Mp4Track(
                codec or "????", width, height, timescale, duration,
                len(sizes), sizes, offsets, ts[: len(sizes)], track_id,
                handler.decode("ascii"), channels, rate,
            )
        )
    return tracks


def _parse_moof_box(box: bytes):
    """One moof BOX (header included) → {track_id: (sizes, offsets, durs)}
    with offsets relative to the moof box start (or absolute when tfhd
    carried an explicit base_data_offset — flagged by the bool).

    Covers the ISO 14496-12 movie-fragment layout DASH/CMAF emit: tfhd
    defaults (base-data-offset 0x1, sample-description 0x2, default
    duration 0x8 / size 0x10 / flags 0x20, default-base-is-moof 0x20000),
    tfdt v0/v1 decode times, trun data-offset 0x1 / first-sample-flags
    0x4 and per-sample duration/size/flags/cto 0x100/0x200/0x400/0x800."""
    try:
        return _parse_moof_inner(box)
    except struct.error as exc:
        raise ValueError(f"MP4 corrupt: truncated fragment ({exc})") from None


def _parse_moof_inner(box: bytes):
    out: dict[int, tuple[list[int], list[tuple[bool, int]], list[int], int | None]] = {}
    for fc, b, e in _walk(box, 8, len(box)):
        if fc != b"traf":
            continue
        tf_flags = track_id = None
        base: tuple[bool, int] | None = None
        def_dur = def_size = None
        tfdt_time = None
        sizes: list[int] = []
        offs: list[tuple[bool, int]] = []
        durs: list[int] = []
        cursor: tuple[bool, int] | None = None
        for sc, sb, se in _walk(box, b, e):
            if sc == b"tfhd":
                (vf,) = struct.unpack_from(">I", box, sb)
                tf_flags = vf & 0xFFFFFF
                (track_id,) = struct.unpack_from(">I", box, sb + 4)
                p = sb + 8
                if tf_flags & 0x1:
                    (bdo,) = struct.unpack_from(">Q", box, p)
                    base, p = (True, bdo), p + 8
                if tf_flags & 0x2:
                    p += 4
                if tf_flags & 0x8:
                    (def_dur,) = struct.unpack_from(">I", box, p)
                    p += 4
                if tf_flags & 0x10:
                    (def_size,) = struct.unpack_from(">I", box, p)
                    p += 4
                if base is None:
                    # default-base-is-moof (0x20000) or the spec's implicit
                    # first-traf default: the moof box start
                    base = (False, 0)
            elif sc == b"tfdt":
                ver = box[sb]
                tfdt_time = (
                    struct.unpack_from(">Q", box, sb + 4)[0]
                    if ver
                    else struct.unpack_from(">I", box, sb + 4)[0]
                )
            elif sc == b"trun":
                if tf_flags is None:
                    raise ValueError("MP4 corrupt: trun before tfhd")
                (vf,) = struct.unpack_from(">I", box, sb)
                tr_flags = vf & 0xFFFFFF
                (count,) = struct.unpack_from(">I", box, sb + 4)
                p = sb + 8
                if tr_flags & 0x1:
                    (doff,) = struct.unpack_from(">i", box, p)
                    p += 4
                    cursor = (base[0], base[1] + doff)
                elif cursor is None:
                    cursor = base
                if tr_flags & 0x4:
                    p += 4
                for _ in range(count):
                    dur, size = def_dur, def_size
                    if tr_flags & 0x100:
                        (dur,) = struct.unpack_from(">I", box, p)
                        p += 4
                    if tr_flags & 0x200:
                        (size,) = struct.unpack_from(">I", box, p)
                        p += 4
                    if tr_flags & 0x400:
                        p += 4
                    if tr_flags & 0x800:
                        p += 4
                    if size is None or dur is None:
                        raise ValueError(
                            "MP4 corrupt: fragment sample lacks size/duration"
                        )
                    sizes.append(size)
                    offs.append(cursor)
                    durs.append(dur)
                    cursor = (cursor[0], cursor[1] + size)
        if track_id is not None and sizes:
            out[track_id] = (sizes, offs, durs, tfdt_time)
    return out


def _apply_fragments(tracks: list[Mp4Track], frags: list[tuple[int, bytes]]) -> None:
    """Extend empty (fragmented-init) tracks with moof sample runs.
    ``frags`` = [(absolute_moof_box_offset, moof_box_bytes), …] in file
    order. Durations accumulate into decode timestamps per track (tfdt
    re-anchors when present); mdhd duration 0 is replaced by the total."""
    by_id = {t.track_id: t for t in tracks}
    clock: dict[int, int] = {tid: 0 for tid in by_id}
    for moof_pos, box in frags:
        for tid, (sizes, offs, durs, tfdt_time) in _parse_moof_box(box).items():
            t = by_id.get(tid)
            if t is None:
                continue
            if tfdt_time is not None:
                clock[tid] = tfdt_time
            for size, (absolute, off), dur in zip(sizes, offs, durs):
                t.sample_sizes.append(size)
                t.sample_offsets.append(off if absolute else moof_pos + off)
                t.sample_ts.append(clock[tid])
                clock[tid] += dur
            t.n_samples = len(t.sample_sizes)
    for t in tracks:
        if t.duration == 0:
            t.duration = clock.get(t.track_id, 0)


def mp4_probe(fh) -> list[Mp4Track]:
    """Seek-based probe over an open binary file: walks top-level box
    HEADERS (8-16 bytes each), loads only the moov box — and, for
    fragmented files, each (small) moof box — into memory; mdat is
    skipped with a seek, so probing a multi-GB file reads kilobytes. The
    object-store translation is one ranged GET per metadata box; sample
    offsets in the returned tracks are absolute file offsets, ready for
    ranged payload reads."""
    hdr = fh.read(12)
    if len(hdr) < 12 or hdr[4:8] != b"ftyp":
        raise ValueError("not an MP4 (missing ftyp)")
    (size,) = struct.unpack_from(">I", hdr, 0)
    fh.seek(size)
    pos = size
    moov_body = None
    frags: list[tuple[int, bytes]] = []
    while True:
        head = fh.read(8)
        if len(head) < 8:
            break
        (size,) = struct.unpack_from(">I", head, 0)
        fourcc = head[4:8]
        body = 8
        if size == 1:
            (size,) = struct.unpack(">Q", fh.read(8))
            body = 16
        if size < body:
            raise ValueError("MP4 corrupt: bad box size")
        if fourcc == b"moov":
            moov_body = fh.read(size - body)
            if len(moov_body) < size - body:
                raise ValueError("MP4 corrupt: truncated moov")
        elif fourcc == b"moof":
            frag = head + fh.read(size - body)
            if len(frag) < size:
                raise ValueError("MP4 corrupt: truncated moof")
            frags.append((pos, frag))
        else:
            fh.seek(size - body, 1)
        pos += size
    if moov_body is None:
        raise ValueError("MP4 corrupt: missing moov")
    tracks = _parse_moov(moov_body, 0, len(moov_body))
    if frags and any(t.n_samples == 0 for t in tracks):
        _apply_fragments(tracks, frags)
    return tracks


def _first(tracks: list[Mp4Track], handler: str) -> Mp4Track:
    for t in tracks:
        if t.handler == handler:
            return t
    raise ValueError(f"MP4: no {handler!r} track")


def mp4_sample_ranges(data: bytes) -> list[tuple[int, int, int]]:
    """(file_offset, length, ts_ms) per video sample of the first video
    track — the ranged-GET access path: frame k is one bounded read."""
    t = _first(mp4_parse(data), "vide")
    return [
        (t.sample_offsets[i], t.sample_sizes[i], t.ts_ms(i))
        for i in range(t.n_samples)
    ]


def _audio_trak(
    chunks: list[bytes],
    codec: str,
    channels: int,
    rate: int,
    delta: int,
    data_start: int,
    track_id: int,
) -> bytes:
    """One 'soun' trak: AudioSampleEntry + full sample tables, all
    chunks back to back at ``data_start``; mdhd timescale = sample rate
    so stts deltas are sample counts."""
    n = len(chunks)
    duration = n * delta
    entry = _box(
        codec.encode("ascii"),
        b"\x00" * 6 + struct.pack(">H", 1)        # SampleEntry tail
        + b"\x00" * 8                               # reserved
        + struct.pack(">HHHH", channels, 16, 0, 0)  # chans/bits/predef/res
        + _u32(rate << 16),                         # 16.16 sample rate
    )
    stsd = _full(b"stsd", _u32(1) + entry)
    stts = _full(b"stts", _u32(1) + struct.pack(">II", n, delta))
    stsc = _full(b"stsc", _u32(1) + struct.pack(">III", 1, n, 1))
    stsz = _full(b"stsz", _u32(0) + _u32(n) + b"".join(_u32(len(c)) for c in chunks))
    stco = _full(b"stco", _u32(1) + _u32(data_start))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    smhd = _full(b"smhd", struct.pack(">HH", 0, 0))
    dref = _full(b"dref", _u32(1) + _full(b"url ", b"", flags=1))
    minf = _box(b"minf", smhd + _box(b"dinf", dref) + stbl)
    mdhd = _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, rate, duration, 0x55C4, 0))
    hdlr = _full(b"hdlr", _u32(0) + b"soun" + _u32(0) * 3 + b"SoundHandler\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, track_id, 0, duration) + b"\x00" * 16
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 0, 0),
        flags=3,
    )
    return _box(b"trak", tkhd + mdia)


def mp4_mux(
    frames: list[bytes],
    width: int,
    height: int,
    codec: str = "jpeg",
    timescale: int = 1000,
    sample_delta: int = 40,
    audio: tuple[list[bytes], str, int, int, int] | None = None,
) -> bytes:
    """Minimal conformant single-video-track MP4: ftyp, mdat (frame
    payloads back to back), moov with full sample tables. Chunk layout:
    one chunk holding all samples (stsc run (1, n)), stco pointing into
    mdat — enough to exercise every table the parser resolves.

    ``audio`` adds a second ('soun') track:
    (chunks, codec — e.g. "sowt"/"twos"/"lpcm"/"mp4a", channels,
    sample_rate_hz, samples_per_chunk); chunk payloads land in mdat
    after the video frames."""
    if not frames:
        raise ValueError("MP4: need at least one frame")
    ftyp = _box(b"ftyp", b"isom" + _u32(512) + b"isomiso2mp41")
    audio_chunks = audio[0] if audio else []
    mdat_body = b"".join(frames) + b"".join(audio_chunks)
    mdat = _box(b"mdat", mdat_body)
    data_start = len(ftyp) + 8  # offset of first sample in the file

    n = len(frames)
    duration = n * sample_delta

    # VisualSampleEntry body: 6 reserved + u16 data_ref_index, then
    # pre_defined/reserved (16 bytes), width, height, resolutions, frame
    # count, compressorname(32), depth, pre_defined
    sample_entry = _box(
        codec.encode("ascii"),
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + _u32(0) + struct.pack(">H", 1) + b"\x00" * 32
        + struct.pack(">Hh", 24, -1),
    )
    stsd = _full(b"stsd", _u32(1) + sample_entry)
    stts = _full(b"stts", _u32(1) + struct.pack(">II", n, sample_delta))
    stsc = _full(b"stsc", _u32(1) + struct.pack(">III", 1, n, 1))
    stsz = _full(b"stsz", _u32(0) + _u32(n) + b"".join(_u32(len(f)) for f in frames))
    stco = _full(b"stco", _u32(1) + _u32(data_start))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    vmhd = _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    dref = _full(b"dref", _u32(1) + _full(b"url ", b"", flags=1))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)

    mdhd = _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0))
    hdlr = _full(b"hdlr", _u32(0) + b"vide" + _u32(0) * 3 + b"VideoHandler\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    tkhd = _full(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 16 + matrix
        + struct.pack(">II", width << 16, height << 16),
        flags=3,
    )
    trak = _box(b"trak", tkhd + mdia)
    if audio:
        chunks, acodec, channels, rate, adelta = audio
        trak += _audio_trak(
            chunks, acodec, channels, rate, adelta,
            data_start + sum(len(f) for f in frames), track_id=2,
        )
    mvhd = _full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iH", 0x10000, 0x0100) + b"\x00" * 10 + matrix
        + b"\x00" * 24 + _u32(3 if audio else 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def mp4_mux_fragmented(
    frames: list[bytes],
    width: int,
    height: int,
    codec: str = "jpeg",
    timescale: int = 1000,
    sample_delta: int = 40,
    frames_per_fragment: int = 2,
) -> bytes:
    """Fragmented MP4 (the CMAF/DASH shape streaming corpora crawl):
    ftyp + moov init segment (empty stbl, mvex/trex defaults) followed by
    [moof + mdat] pairs — tfhd uses default-base-is-moof with a default
    sample duration, tfdt carries each fragment's decode time, trun
    carries data-offset + per-sample sizes. The fixed-layout counterpart
    the parser's fragment walk is verified against."""
    if not frames:
        raise ValueError("MP4: need at least one frame")
    # init segment: the flat muxer's moov with EMPTIED sample tables,
    # zeroed durations (fragments define timing) and an mvex/trex
    flat = mp4_mux(frames[:1], width, height, codec, timescale, sample_delta)
    ftyp_end = next(e for fc, b, e in _walk(flat, 0, len(flat)) if fc == b"ftyp")
    ftyp = flat[:ftyp_end]
    mb, me = _find(flat, 0, len(flat), b"moov")

    def _rebuild(buf: bytes, start: int, end: int) -> bytes:
        out = b""
        for fc, b, e in _walk(buf, start, end):
            if fc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                out += _box(fc, _rebuild(buf, b, e))
            elif fc == b"stts":
                out += _full(b"stts", _u32(0))
            elif fc == b"stsc":
                out += _full(b"stsc", _u32(0))
            elif fc == b"stsz":
                out += _full(b"stsz", _u32(0) + _u32(0))
            elif fc == b"stco":
                out += _full(b"stco", _u32(0))
            elif fc in (b"mvhd", b"mdhd"):
                body = bytearray(buf[b:e])
                struct.pack_into(">I", body, 16, 0)  # duration ← 0
                out += _box(fc, bytes(body))
            elif fc == b"tkhd":
                body = bytearray(buf[b:e])
                struct.pack_into(">I", body, 20, 0)  # duration ← 0
                out += _box(fc, bytes(body))
            else:
                out += buf[b - 8 : e]
        return out

    trex = _full(b"trex", struct.pack(">IIIII", 1, 1, 0, 0, 0))
    moov = _box(b"moov", _rebuild(flat, mb, me) + _box(b"mvex", trex))

    out = bytearray(ftyp + moov)
    seq = 1
    t = 0
    for i in range(0, len(frames), frames_per_fragment):
        chunk = frames[i : i + frames_per_fragment]
        mfhd = _full(b"mfhd", _u32(seq))
        tfhd = _full(
            b"tfhd", _u32(1) + _u32(sample_delta), flags=0x20008
        )  # default-base-is-moof | default-sample-duration
        tfdt = _full(b"tfdt", _u32(t))
        trun_body = (
            _u32(len(chunk))
            + struct.pack(">i", 0)  # data_offset patched below
            + b"".join(_u32(len(f)) for f in chunk)
        )
        trun = _full(b"trun", trun_body, flags=0x201)  # data-offset | sizes
        traf = _box(b"traf", tfhd + tfdt + trun)
        moof = bytearray(_box(b"moof", mfhd + traf))
        # patch trun data_offset: payloads start right after moof + mdat hdr
        doff_at = 8 + len(mfhd) + 8 + len(tfhd) + len(tfdt) + 16
        struct.pack_into(">i", moof, doff_at, len(moof) + 8)
        out += bytes(moof) + _box(b"mdat", b"".join(chunk))
        seq += 1
        t += len(chunk) * sample_delta
    return bytes(out)


def mp4_decode_frames(data: bytes):
    """[(ts_ms, RGB uint8 array)] for mjpeg-coded tracks ('jpeg'/'mjpa'
    sample entries) via the from-spec T.81 decoder; other codecs raise —
    use mp4_sample_ranges for codec-agnostic extraction."""
    import numpy as np

    t = _first(mp4_parse(data), "vide")
    if t.codec not in ("jpeg", "mjpa"):
        raise ValueError(f"MP4: unsupported sample codec {t.codec!r}")
    from hdp2_5_hive2_spark.llm.jpeg import jpeg_decode

    out = []
    for i in range(t.n_samples):
        o, ln = t.sample_offsets[i], t.sample_sizes[i]
        px = jpeg_decode(data[o : o + ln])
        if px.ndim == 2:
            px = np.repeat(px[:, :, None], 3, axis=2)
        out.append((t.ts_ms(i), px))
    return out


def mp4_extract_audio(data: bytes):
    """(samples int16 array, rate, channels) for the first uncompressed
    PCM-16 audio track — 'sowt' (little-endian) and 'twos' (big-endian)
    sample entries, the QuickTime/ISO names for raw PCM. Compressed
    audio (mp4a/AAC, opus) raises: use the track's sample ranges for
    codec-agnostic extraction instead."""
    import numpy as np

    t = _first(mp4_parse(data), "soun")
    if t.codec not in ("sowt", "twos"):
        raise ValueError(f"MP4: unsupported audio codec {t.codec!r}")
    raw = b"".join(
        data[t.sample_offsets[i] : t.sample_offsets[i] + t.sample_sizes[i]]
        for i in range(t.n_samples)
    )
    samples = np.frombuffer(raw, dtype="<i2" if t.codec == "sowt" else ">i2")
    if t.channels > 1:
        samples = samples.reshape(-1, t.channels)
    return samples, t.sample_rate, t.channels
