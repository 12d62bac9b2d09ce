"""Real media codecs from public specs: PNG, BMP, WAV (PCM).

The multimodal pipeline (`llm/multimodal.py`) was designed around a Codec
seam because this container ships no PIL/ffmpeg. These three formats need
nothing beyond zlib + numpy, and their wire formats are published (PNG:
RFC 2083 / W3C spec; BMP: Windows BITMAPINFOHEADER layout; WAV: RIFF/PCM),
so the seam can be REAL for them — decode to pixel/sample arrays, extract
features from actual content, resize actual pixels, re-encode. JPEG
decodes via the from-spec baseline T.81 decoder (`llm.jpeg`); video
containers parse via `llm.avi` (RIFF/AVI, DIB + MJPEG decode) and
`llm.mp4` (ISO BMFF sample tables) — only non-MJPEG video BITSTREAMS
(H.264/HEVC) stay out of scope, a real codec library's job.

Independent-verification strategy (tests/test_media_codecs.py): the JVM
ships ``javax.imageio`` — a from-scratch PNG implementation we don't
control. Our encoder's files must decode to identical pixels through
ImageIO, and ImageIO-written PNGs (which use adaptive per-row filters, so
they exercise Sub/Up/Average/Paeth paths our encoder never emits) must
decode identically through ours.

Scale: codecs run inside Arrow-batched ``mapInPandas`` via
``PixelCodec`` — map-side, no shuffle, same plan shape as the stubbed
pipeline. Python-side pixel work is fixture/feature-extraction scale; a
100 TB image corpus would plug a native codec into the same seam.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from hdp2_5_hive2_spark.llm.multimodal import Codec

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

__all__ = [
    "PixelCodec",
    "bmp_decode",
    "bmp_encode",
    "gif_decode",
    "gif_decode_frames",
    "png_decode",
    "sample_gif_frames",
    "png_encode",
    "resize_nearest",
    "resize_png_images",
    "wav_decode",
    "wav_encode",
]


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/pixel


def _unfilter(raw: bytes, base: int, width: int, height: int, ch: int) -> bytes:
    """Unfilter one scanline group (a whole image, or one Adam7 pass)
    starting at ``base``; returns ``height*width*ch`` raw sample bytes.
    Plain bytearrays with explicit mod-256 ints — the serial dependency
    in Sub/Average/Paeth rules out full vectorization anyway."""
    stride = width * ch
    out = bytearray(height * stride)
    prev = bytes(stride)
    bpp = ch  # bytes per pixel at depth 8
    for y in range(height):
        at = base + y * (stride + 1)
        if at + 1 + stride > len(raw):
            raise ValueError("PNG corrupt: decompressed size mismatch")
        ftype = raw[at]
        row = bytearray(raw[at + 1 : at + 1 + stride])
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            for x in range(stride):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG corrupt: filter type {ftype}")
        out[y * stride : (y + 1) * stride] = row
        prev = bytes(row)
    return bytes(out)


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per the PNG spec
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def png_decode(data: bytes) -> np.ndarray:
    """PNG → uint8 array (H, W, C). Supports bit depth 8, color types
    gray/RGB/palette/gray+alpha/RGBA, all five scanline filters, and
    both interlace methods (none + Adam7 — each pass is its own
    filtered scanline group scattered onto the 8×8 grid)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("PNG corrupt: bad signature")
    pos, n = 8, len(data)
    width = height = None
    color_type = bit_depth = None
    palette = None
    idat = bytearray()
    while pos < n:
        (clen,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        expect_crc = struct.unpack_from(">I", data, pos + 8 + clen)[0]
        if zlib.crc32(ctype + body) != expect_crc:
            raise ValueError(f"PNG corrupt: {ctype!r} chunk CRC mismatch")
        pos += 12 + clen
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise ValueError(f"PNG: bit depth {bit_depth} not supported (8 only)")
            if color_type not in _CHANNELS:
                raise ValueError(f"PNG: color type {color_type} not supported")
            if comp or filt:
                raise ValueError("PNG corrupt: unknown compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(f"PNG corrupt: interlace method {interlace}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG corrupt: no IHDR")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if interlace == 0:
        if len(raw) != height * (stride + 1):
            raise ValueError("PNG corrupt: decompressed size mismatch")
        flat = _unfilter(raw, 0, width, height, ch)
        px = np.frombuffer(flat, dtype=np.uint8).reshape(height, width, ch)
    else:
        px = np.zeros((height, width, ch), dtype=np.uint8)
        base = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            flat = _unfilter(raw, base, pw, ph, ch)
            base += ph * (pw * ch + 1)
            sub = np.frombuffer(flat, dtype=np.uint8).reshape(ph, pw, ch)
            px[y0::dy, x0::dx] = sub
        if base != len(raw):
            raise ValueError("PNG corrupt: decompressed size mismatch")
    if color_type == 3:
        if palette is None:
            raise ValueError("PNG corrupt: palette image without PLTE")
        px = palette[px[:, :, 0]]
    return px


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def png_encode(px: np.ndarray) -> bytes:
    """uint8 array (H, W) or (H, W, C in {1,2,3,4}) → PNG (filter 0 rows,
    one zlib stream — byte-exact deterministic)."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"PNG encode: {ch} channels unsupported")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    stride = w * ch
    flat = px.reshape(h, stride)
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type None
        raw += flat[y].tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------
# BMP (24-bit BITMAPINFOHEADER, bottom-up BGR, 4-byte row padding)
# --------------------------------------------------------------------------


def bmp_decode(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("BMP corrupt: bad magic")
    (off,) = struct.unpack_from("<I", data, 10)
    hsize, w, h, planes, bpp = struct.unpack_from("<IiihH", data, 14)
    if bpp != 24:
        raise ValueError(f"BMP: {bpp}-bit not supported (24 only)")
    bottom_up = h > 0
    h = abs(h)
    pad = (-(w * 3)) % 4
    px = np.zeros((h, w, 3), dtype=np.uint8)
    pos = off
    for y in range(h):
        row = np.frombuffer(data, dtype=np.uint8, count=w * 3, offset=pos)
        px[h - 1 - y if bottom_up else y] = row.reshape(w, 3)[:, ::-1]  # BGR→RGB
        pos += w * 3 + pad
    return px


def bmp_encode(px: np.ndarray) -> bytes:
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w, ch = px.shape
    if ch != 3:
        raise ValueError("BMP encode: need 3 channels")
    pad = (-(w * 3)) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += px[y, :, ::-1].tobytes()  # RGB→BGR
        body += b"\x00" * pad
    data_off = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack("<IiihHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + bytes(body)
    )


# --------------------------------------------------------------------------
# GIF (87a/89a, LZW) — decode only; web corpora contain GIFs, pipelines
# read them. First frame only (animation = video territory).
# --------------------------------------------------------------------------


def gif_decode(data: bytes) -> np.ndarray:
    """GIF → uint8 RGB array (H, W, 3) of the FIRST frame (composited onto
    the logical screen). See :func:`gif_decode_frames` for animations."""
    return gif_decode_frames(data)[0][1]


def gif_decode_frames(data: bytes) -> list[tuple[int, np.ndarray]]:
    """Animated GIF → [(delay_ms, full-canvas RGB frame)], frames composited
    per the 89a graphic-control semantics: per-frame region placement,
    transparency masking, disposal none/keep (0/1), restore-to-background
    (2) and restore-to-previous (3). Supports 87a/89a, global/local color
    tables, LZW, interlacing. Frames without a GCE get delay 0."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("GIF corrupt: bad signature")
    sw, sh, packed, bg_idx, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    bg_rgb = gct[bg_idx] if gct is not None and bg_idx < len(gct) else np.zeros(3, np.uint8)
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg_rgb
    frames: list[tuple[int, np.ndarray]] = []
    delay_ms = 0
    transparent: int | None = None
    disposal = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] >= 4:  # Graphic Control Extension
                gpacked = data[pos + 1]
                delay_ms = struct.unpack_from("<H", data, pos + 2)[0] * 10
                transparent = data[pos + 4] if gpacked & 1 else None
                disposal = (gpacked >> 2) & 0x7
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"GIF corrupt: unexpected block 0x{b:02x}")
        x0, y0, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            table = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF corrupt: no color table")
        interlaced = bool(ipacked & 0x40)
        min_code_size = data[pos]
        pos += 1
        stream = bytearray()
        while data[pos]:
            ln = data[pos]
            stream += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(stream), min_code_size, w * h)
        px = np.asarray(idx, dtype=np.uint16).reshape(h, w)
        if interlaced:
            de = np.zeros_like(px)
            rows = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            for src, dst in enumerate(rows):
                de[dst] = px[src]
            px = de
        rgb = table[np.minimum(px, len(table) - 1)]
        before = canvas.copy() if disposal == 3 else None
        region = canvas[y0 : y0 + h, x0 : x0 + w]
        if transparent is not None:
            mask = px != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append((delay_ms, canvas.copy()))
        if disposal == 2:  # restore region to background
            canvas[y0 : y0 + h, x0 : x0 + w] = bg_rgb
        elif disposal == 3 and before is not None:
            canvas = before
        delay_ms, transparent, disposal = 0, None, 0
    if not frames:
        raise ValueError("GIF corrupt: no image block")
    return frames


def _lzw_decode(stream: bytes, min_code_size: int, expect: int) -> list[int]:
    """GIF-variant LZW: variable code width, CLEAR/EOI codes, 12-bit max."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader, LSB-first
    acc = nbits = 0
    sp = 0

    def read_code(width: int) -> int:
        nonlocal acc, nbits, sp
        while nbits < width:
            if sp >= len(stream):
                return eoi  # truncated stream: treat as end
            acc |= stream[sp] << nbits
            nbits += 8
            sp += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    def reset():
        return {i: [i] for i in range(clear)}, min_code_size + 1

    table, width = reset()
    prev: list[int] | None = None
    next_code = eoi + 1
    while len(out) < expect:
        code = read_code(width)
        if code == clear:
            table, width = reset()
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + [prev[0]]
        else:
            raise ValueError("GIF corrupt: LZW code out of range")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:expect]


# --------------------------------------------------------------------------
# WAV (RIFF, PCM 16-bit)
# --------------------------------------------------------------------------


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV → (samples int16 array (N,) or (N, channels), sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("WAV corrupt: bad RIFF/WAVE header")
    pos, n = 12, len(data)
    rate = channels = None
    samples = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt != 1 or bits != 16:
                raise ValueError("WAV: only PCM-16 supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
    if rate is None or samples is None:
        raise ValueError("WAV corrupt: missing fmt/data chunk")
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return samples, rate


def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    s = np.ascontiguousarray(samples, dtype="<i2")
    channels = 1 if s.ndim == 1 else s.shape[1]
    body = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


# --------------------------------------------------------------------------
# Transforms + the Codec-seam implementation
# --------------------------------------------------------------------------


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (the deterministic integer choice — no
    float filter kernels, so results are engine-exact everywhere)."""
    h, w = px.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return px[ys][:, xs]


def _sniff(payload: bytes) -> str:
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return "unknown"


def _image_feature(px: np.ndarray) -> list[float]:
    """The 8-float image feature every pixel path emits: [width, height,
    channels, mean, std, min, max, horizontal edge-energy]."""
    f = px.astype(np.float64)
    edge = float(np.abs(np.diff(f, axis=1)).mean()) if px.shape[1] > 1 else 0.0
    return [
        float(px.shape[1]),
        float(px.shape[0]),
        float(px.shape[2] if px.ndim == 3 else 1),
        float(f.mean()),
        float(f.std()),
        float(f.min()),
        float(f.max()),
        edge,
    ]


def resize_png_images(df, id_col: str, payload_col: str, width: int, height: int):
    """REAL image resize over PNG payloads: decode → nearest-neighbor
    resample → re-encode, Arrow-batched and map-side (the pixel-true
    counterpart of ``multimodal.resize_images``' plumbing stub). Output
    payloads are valid PNGs of the target geometry."""
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            payloads = [
                png_encode(resize_nearest(png_decode(bytes(p)), width, height))
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "payload": payloads,
                    "width": width,
                    "height": height,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def sample_gif_frames(df, id_col: str, payload_col: str, every_ms: int = 100):
    """REAL frame sampling over animated GIF payloads — the pixel-true
    counterpart of ``multimodal.frame_sample``'s stub: decode every frame
    with its graphic-control delay, then sample the frame DISPLAYED at
    t = 0, every_ms, 2·every_ms, … (last-frame-carried within its display
    interval). Frames without delays (delay 0 throughout) are treated as
    lasting ``every_ms`` each, so undelayed files emit one row per frame.
    Features are the PixelCodec image features over the composited canvas.
    Map-side only (same plan shape as the stub)."""
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                frames = gif_decode_frames(bytes(payload))
                delays = [d if d > 0 else every_ms for d, _ in frames]
                starts = np.concatenate([[0], np.cumsum(delays)])
                total = int(starts[-1])
                fi = 0
                for t in range(0, total, every_ms):
                    while fi + 1 < len(frames) and starts[fi + 1] <= t:
                        fi += 1
                    rows.append((int(aid), fi, t, _image_feature(frames[fi][1])))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "ts_ms", "feature"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


class PixelCodec(Codec):
    """Codec-seam implementation over the real decoders: features come from
    actual pixel / sample content (not byte statistics). Image feature:
    [width, height, channels, mean, std, min, max, edge-energy]; audio:
    [n_samples, rate, rms, zero-crossings, mean, std, min, max]; video
    (AVI containers, DIB or MJPG streams — `llm.avi`): the image feature
    over all decoded frames stacked, with channels slot = frame count.
    JPEG decodes through the baseline T.81 decoder (`llm.jpeg`); unknown
    containers still raise — the honest stub."""

    def decode(self, payload: bytes, modality: str) -> list[float]:
        kind = _sniff(payload)
        if kind in ("png", "bmp", "jpeg", "gif", "tiff", "webp"):
            if kind == "jpeg":
                from hdp2_5_hive2_spark.llm.jpeg import jpeg_decode as _jd

                px = _jd(payload)
            elif kind == "tiff":
                from hdp2_5_hive2_spark.llm.tiff import tiff_decode as _td

                px = _td(payload)
            elif kind == "webp":
                from hdp2_5_hive2_spark.llm.webp import webp_decode as _wd

                px = _wd(payload)  # VP8L; lossy VP8 raises its own error
            else:
                px = {"png": png_decode, "bmp": bmp_decode, "gif": gif_decode}[
                    kind
                ](payload)
            return _image_feature(px)
        if kind == "avi":
            from hdp2_5_hive2_spark.llm.avi import avi_decode_frames

            frames = avi_decode_frames(payload)
            stack = np.concatenate([p for _, p in frames], axis=0)
            feat = _image_feature(stack)
            feat[0] = float(frames[0][1].shape[1])  # width of one frame
            feat[1] = float(frames[0][1].shape[0])  # height of one frame
            feat[2] = float(len(frames))            # frame count
            return feat
        if kind in ("wav", "flac"):
            if kind == "flac":
                from hdp2_5_hive2_spark.llm.flac import flac_decode

                s, rate = flac_decode(payload)
            else:
                s, rate = wav_decode(payload)
            flat = s.astype(np.float64).reshape(-1)
            zc = int(np.count_nonzero(np.diff(np.signbit(flat)))) if len(flat) > 1 else 0
            return [
                float(flat.size),
                float(rate),
                float(np.sqrt((flat**2).mean())) if flat.size else 0.0,
                float(zc),
                float(flat.mean()) if flat.size else 0.0,
                float(flat.std()) if flat.size else 0.0,
                float(flat.min()) if flat.size else 0.0,
                float(flat.max()) if flat.size else 0.0,
            ]
        raise NotImplementedError(
            f"no from-spec decoder for this payload (sniffed {kind!r}); "
            "compressed video bitstreams (H.264/HEVC) need a real codec library"
        )
