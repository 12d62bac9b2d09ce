"""WebP lossless (VP8L) decoder from the public bitstream specification.

WebP is ubiquitous on the modern web; its LOSSLESS form (VP8L) is fully
specified in the public "WebP Lossless Bitstream Specification" and
decodes here from scratch: RIFF/WEBP container, the VP8L header
(signature 0x2F, 14-bit dimensions), the four inverse transforms
(predictor, color, subtract-green, color-indexing), meta-prefix-coded
entropy images, canonical prefix codes (normal + the simple 1/2-symbol
form), LZ77 backward references with the distance neighborhood mapping,
and the color cache. Lossy VP8 is a full video intra codec and stays
out of scope (documented, like H.264 elsewhere); `sniff` still labels
it so triage can count it.

Verification: no independent WebP implementation ships in this
container, so the test strategy is the EWAH one — a from-spec fixture
ENCODER (literal prefix-coded ARGB, optional subtract-green, optional
explicit LZ77 references and color-cache hits) generates streams whose
pixels are known by construction, property-fuzzed across geometries;
plus hand-built vectors for each transform. The encoder never feeds the
decoder anything the spec doesn't define.

Hostile-input contract and Arrow-seam placement as all codecs here.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["webp_decode", "vp8l_encode_lossless", "sniff_webp"]


class _Bits:
    """VP8L is LSB-first within bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("VP8L corrupt: bitstream truncated")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _Prefix:
    """Canonical prefix code built from code lengths (spec section 6).
    A code with exactly one used symbol consumes zero bits per read."""

    def __init__(self, lengths: list[int]):
        self.fast: dict[tuple[int, int], int] = {}
        used = [i for i, l in enumerate(lengths) if l]
        if len(used) == 0:
            self.single = 0  # never read from in valid streams
            self.max_len = 0
            return
        if len(used) == 1:
            self.single = used[0]
            self.max_len = 0
            return
        self.single = None
        max_len = max(lengths)
        count = [0] * (max_len + 1)
        for l in lengths:
            if l:
                count[l] += 1
        next_code = [0] * (max_len + 1)
        code = 0
        for l in range(1, max_len + 1):
            code = (code + count[l - 1]) << 1
            next_code[l] = code
        for sym, l in enumerate(lengths):
            if l:
                self.fast[(l, next_code[l])] = sym
                next_code[l] += 1
        self.max_len = max_len

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for l in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            hit = self.fast.get((l, code))
            if hit is not None:
                return hit
        raise ValueError("VP8L corrupt: invalid prefix code")


_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_code_lengths(br: _Bits, n_symbols: int) -> _Prefix:
    """Spec 6.2.2: simple (1-2 symbol) or normal code-length coding."""
    if br.read(1):  # simple code
        n = br.read(1) + 1
        first_len = br.read(1)
        sym0 = br.read(8 if first_len else 1)
        lengths = [0] * n_symbols
        if n == 2:
            sym1 = br.read(8)
            if sym0 >= n_symbols or sym1 >= n_symbols:
                raise ValueError("VP8L corrupt: simple-code symbol range")
            # spec 6.2.1: code 0 is the FIRST-written symbol, code 1 the
            # second — positional, not canonical-by-value (they may be
            # written in descending order)
            p = _Prefix.__new__(_Prefix)
            p.single = None
            p.max_len = 1
            p.fast = {(1, 0): sym0, (1, 1): sym1}
            return p
        else:
            if sym0 >= n_symbols:
                raise ValueError("VP8L corrupt: simple-code symbol range")
            lengths[sym0] = 1
        return _Prefix(lengths)
    n_codes = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(n_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _Prefix(cl_lengths)
    # max_symbol handling
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = n_symbols
    lengths = [0] * n_symbols
    prev = 8
    i = 0
    while i < n_symbols:
        if max_symbol == 0:
            break
        max_symbol -= 1
        sym = cl_code.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < n_symbols:
                    lengths[i] = prev
                    i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    if i > n_symbols:
        raise ValueError("VP8L corrupt: code lengths overflow")
    return _Prefix(lengths)


def _dist_map(code: int, xsize: int) -> int:
    """Distance neighborhood mapping (spec 5.2.2): codes 1..120 address
    nearby pixels in a 2D window; higher codes are linear + 120."""
    _OFFSETS = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
        (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
        (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
        (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
        (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
        (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
        (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
        (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
        (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
        (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
        (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
        (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
    ]
    if code > 120:
        return code - 120
    dx, dy = _OFFSETS[code - 1]
    d = dy * xsize + dx
    return max(d, 1)


def _read_extra(br: _Bits, code: int) -> int:
    """Length/distance prefix value decoding (spec 5.2.2): codes 0-3 map
    to 1-4; above that, extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def webp_decode(data: bytes) -> np.ndarray:
    """WebP → uint8 (H, W, 4) RGBA. VP8L (lossless) only; lossy VP8
    raises with its own message so callers can count it."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP header)")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + ln]
        if fourcc == b"VP8L":
            payload = body
            break
        if fourcc == b"VP8 ":
            raise ValueError("WebP: lossy VP8 not supported (VP8L only)")
        pos += 8 + ln + (ln & 1)
    if payload is None:
        raise ValueError("WebP corrupt: no VP8L chunk")
    if not payload or payload[0] != 0x2F:
        raise ValueError("VP8L corrupt: bad signature")
    br = _Bits(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L corrupt: unsupported version")
    argb = _decode_image(br, w, h, top_level=True)
    rgba = np.zeros((h, w, 4), dtype=np.uint8)
    rgba[:, :, 0] = (argb >> 16) & 0xFF
    rgba[:, :, 1] = (argb >> 8) & 0xFF
    rgba[:, :, 2] = argb & 0xFF
    rgba[:, :, 3] = (argb >> 24) & 0xFF
    return rgba


def _decode_image(br: _Bits, w: int, h: int, top_level: bool) -> np.ndarray:
    """Spatially-coded image (spec 5): transforms (top level only) then
    the entropy-coded ARGB plane. Returns uint32 (h, w) ARGB."""
    transforms = []
    xsize = w
    if top_level:
        while br.read(1):
            ttype = br.read(2)
            if ttype == 0:  # predictor
                bits = br.read(3) + 2
                bw = -(-xsize // (1 << bits))
                bh = -(-h // (1 << bits))
                timg = _decode_image(br, bw, bh, top_level=False)
                transforms.append(("pred", bits, timg))
            elif ttype == 1:  # color transform
                bits = br.read(3) + 2
                bw = -(-xsize // (1 << bits))
                bh = -(-h // (1 << bits))
                timg = _decode_image(br, bw, bh, top_level=False)
                transforms.append(("color", bits, timg))
            elif ttype == 2:  # subtract green
                transforms.append(("subgreen",))
            else:  # color indexing
                n_colors = br.read(8) + 1
                pal = _decode_image(br, n_colors, 1, top_level=False)
                # delta-coded palette: accumulate PER CHANNEL mod 256
                acc = np.zeros(4, dtype=np.int64)
                flat = np.zeros(n_colors, dtype=np.uint32)
                for ci in range(n_colors):
                    v = int(pal[0, ci])
                    acc[0] = (acc[0] + ((v >> 24) & 0xFF)) & 0xFF
                    acc[1] = (acc[1] + ((v >> 16) & 0xFF)) & 0xFF
                    acc[2] = (acc[2] + ((v >> 8) & 0xFF)) & 0xFF
                    acc[3] = (acc[3] + (v & 0xFF)) & 0xFF
                    flat[ci] = (
                        (int(acc[0]) << 24) | (int(acc[1]) << 16)
                        | (int(acc[2]) << 8) | int(acc[3])
                    )
                pal = flat.reshape(1, -1)
                width_bits = (
                    3 if n_colors <= 2 else 2 if n_colors <= 4
                    else 1 if n_colors <= 16 else 0
                )
                transforms.append(("index", n_colors, pal[0], width_bits))
                if width_bits:
                    xsize = -(-xsize // (1 << width_bits))

    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L corrupt: bad color cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    # meta prefix image
    meta = None
    meta_bits = 0
    n_groups = 1
    if top_level and br.read(1):
        meta_bits = br.read(3) + 2
        mw = -(-xsize // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta = _decode_image(br, mw, mh, top_level=False)
        n_groups = int(((meta >> 8) & 0xFFFF).max()) + 1

    n_lit = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_code_lengths(br, n_lit),
                _read_code_lengths(br, 256),
                _read_code_lengths(br, 256),
                _read_code_lengths(br, 256),
                _read_code_lengths(br, 40),
            )
        )

    npix = xsize * h
    out = np.zeros(npix, dtype=np.uint32)
    i = 0
    while i < npix:
        if meta is not None:
            x, y = i % xsize, i // xsize
            g = int(
                (meta[y >> meta_bits, x >> meta_bits] >> 8) & 0xFFFF
            )
            green_c, red_c, blue_c, alpha_c, dist_c = groups[g]
        else:
            green_c, red_c, blue_c, alpha_c, dist_c = groups[0]
        sym = green_c.read(br)
        if sym < 256:  # literal
            r = red_c.read(br)
            b = blue_c.read(br)
            a = alpha_c.read(br)
            pix = (a << 24) | (r << 16) | (sym << 8) | b
            out[i] = pix
            if cache is not None:
                cache[((pix * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)] = pix
            i += 1
        elif sym < 256 + 24:  # backward reference
            length = _read_extra(br, sym - 256)
            dist_code = dist_c.read(br)
            dist = _dist_map(_read_extra(br, dist_code), xsize)
            if dist > i or length > npix - i:
                raise ValueError("VP8L corrupt: backward reference range")
            for k in range(length):
                out[i + k] = out[i - dist + k]
                if cache is not None:
                    p = int(out[i + k])
                    cache[((p * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)] = p
            i += length
        else:  # color cache hit
            if cache is None:
                raise ValueError("VP8L corrupt: cache hit without cache")
            out[i] = cache[sym - 256 - 24]
            i += 1

    img = out.reshape(h, xsize)

    # apply inverse transforms in reverse order
    for t in reversed(transforms):
        if t[0] == "index":
            _n, pal, width_bits = t[1], t[2], t[3]
            if width_bits:
                pix_per = 1 << width_bits
                bits_per = 8 >> width_bits
                wide = np.zeros((h, w), dtype=np.uint32)
                for x in range(w):
                    packed = img[:, x >> width_bits]
                    green = (packed >> 8) & 0xFF
                    shift = (x % pix_per) * bits_per
                    idx = (green >> shift) & ((1 << bits_per) - 1)
                    wide[:, x] = idx
                idx = wide
            else:
                idx = (img >> 8) & 0xFF
            if int(idx.max()) >= len(pal):
                raise ValueError("VP8L corrupt: palette index out of range")
            img = pal[idx]
        elif t[0] == "subgreen":
            a = (img >> 24) & 0xFF
            r = (img >> 16) & 0xFF
            g = (img >> 8) & 0xFF
            b = img & 0xFF
            r = (r + g) & 0xFF
            b = (b + g) & 0xFF
            img = (a << 24) | (r << 16) | (g << 8) | b
        elif t[0] == "pred":
            img = _inverse_predictor(img, t[1], t[2])
        elif t[0] == "color":
            img = _inverse_color_transform(img, t[1], t[2])
    return img


def _trunc_half(d):
    """C-style (d / 2) truncation toward zero (libwebp AddSubtractComponentHalf)
    — Python // floors, which diverges for negative odd differences."""
    return np.sign(d) * (np.abs(d) // 2)


def _avg2(a, b):
    return (a + b) // 2


def _inverse_predictor(img: np.ndarray, bits: int, timg: np.ndarray) -> np.ndarray:
    h, w = img.shape
    out = img.astype(np.int64).copy()

    def px(y, x):
        return out[y, x]

    def parts(v):
        return np.array([(v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF])

    def pack(p):
        return (
            (int(p[0]) & 0xFF) << 24 | (int(p[1]) & 0xFF) << 16
            | (int(p[2]) & 0xFF) << 8 | (int(p[3]) & 0xFF)
        )

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px(0, x - 1)
            elif x == 0:
                pred = px(y - 1, 0)
            else:
                mode = int((timg[y >> bits, x >> bits] >> 8) & 0xFF)
                L = parts(px(y, x - 1))
                T = parts(px(y - 1, x))
                TL = parts(px(y - 1, x - 1))
                # TR at the right edge wraps to the FIRST pixel of the
                # current row (rows are contiguous in the spec's memory
                # model: pos - width + 1)
                TR = parts(px(y - 1, x + 1) if x + 1 < w else px(y, 0))
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = pack(L)
                elif mode == 2:
                    pred = pack(T)
                elif mode == 3:
                    pred = pack(TR)
                elif mode == 4:
                    pred = pack(TL)
                elif mode == 5:
                    pred = pack(_avg2(_avg2(L, TR), T))
                elif mode == 6:
                    pred = pack(_avg2(L, TL))
                elif mode == 7:
                    pred = pack(_avg2(L, T))
                elif mode == 8:
                    pred = pack(_avg2(TL, T))
                elif mode == 9:
                    pred = pack(_avg2(T, TR))
                elif mode == 10:
                    pred = pack(_avg2(_avg2(L, TL), _avg2(T, TR)))
                elif mode == 11:  # Select: Manhattan distance of L+T-TL
                    p = L + T - TL
                    pl = int(np.abs(p - L).sum())
                    pt = int(np.abs(p - T).sum())
                    pred = pack(L) if pl < pt else pack(T)
                elif mode == 12:  # ClampAddSubtractFull
                    pred = pack(np.clip(L + T - TL, 0, 255))
                elif mode == 13:  # ClampAddSubtractHalf
                    avg = _avg2(L, T)
                    pred = pack(np.clip(avg + _trunc_half(avg - TL), 0, 255))
                else:
                    raise ValueError("VP8L corrupt: predictor mode")
            v = int(out[y, x])
            p = pred if isinstance(pred, int) else pred
            pa = (p >> 24) & 0xFF
            pr = (p >> 16) & 0xFF
            pg = (p >> 8) & 0xFF
            pb = p & 0xFF
            va = ((v >> 24) + pa) & 0xFF
            vr = ((v >> 16) + pr) & 0xFF
            vg = ((v >> 8) + pg) & 0xFF
            vb = (v + pb) & 0xFF
            out[y, x] = (va << 24) | (vr << 16) | (vg << 8) | vb
    return out.astype(np.uint32)


def _inverse_color_transform(img: np.ndarray, bits: int, timg: np.ndarray) -> np.ndarray:
    """Spec 4.3: delta(t, c) = (int8(t) * int8(c)) >> 5; inverse adds
    deltas back — blue uses the already-RECOVERED red."""
    h, w = img.shape
    res = np.zeros_like(img, dtype=np.int64)

    def s8(v: int) -> int:
        return v - 256 if v >= 128 else v

    for y in range(h):
        for x in range(w):
            cte = int(timg[y >> bits, x >> bits])
            g2r = s8(cte & 0xFF)
            g2b = s8((cte >> 8) & 0xFF)
            r2b = s8((cte >> 16) & 0xFF)
            v = int(img[y, x])
            a = (v >> 24) & 0xFF
            g = (v >> 8) & 0xFF
            r = (((v >> 16) & 0xFF) + ((g2r * s8(g)) >> 5)) & 0xFF
            b = ((v & 0xFF) + ((g2b * s8(g)) >> 5)) & 0xFF
            b = (b + ((r2b * s8(r)) >> 5)) & 0xFF
            res[y, x] = (a << 24) | (r << 16) | (g << 8) | b
    return res.astype(np.uint32)


def sniff_webp(data: bytes) -> str:
    """Chunk-walk the RIFF payload: a VP8X extended container places the
    VP8L chunk after the 18-byte VP8X chunk (offset 30), so a fixed
    search window would miss it."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        return "unknown"
    pos = 12
    for _ in range(8):  # image chunk appears within the first few chunks
        if pos + 8 > len(data):
            break
        fourcc = data[pos : pos + 4]
        if fourcc == b"VP8L":
            return "webp-lossless"
        if fourcc == b"VP8 ":
            return "webp"
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        pos += 8 + size + (size & 1)
    return "webp"


# ---------------------------------------------------------------------------
# Fixture encoder: literal-coded VP8L (+ optional explicit LZ77 refs)
# ---------------------------------------------------------------------------


class _BitW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, nbits: int):
        for i in range(nbits):
            self.acc |= ((v >> i) & 1) << self.n
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.n = 0

    def bytes(self) -> bytes:
        out = bytes(self.buf) + (bytes([self.acc]) if self.n else b"")
        return out


def _write_simple_code(w: _BitW, symbols: list[int], eight_bit: bool = True):
    """Simple prefix code (spec 6.2.1): 1 or 2 symbols."""
    w.write(1, 1)  # simple
    w.write(len(symbols) - 1, 1)
    w.write(1 if eight_bit else 0, 1)  # first symbol length 8 bits
    w.write(symbols[0], 8 if eight_bit else 1)
    if len(symbols) == 2:
        w.write(symbols[1], 8)


def _emit_argb_image(bw: "_BitW", r, g, b, a, top_level: bool = False) -> None:
    """Entropy-coded ARGB image body: [no cache bit][meta bit if top
    level][5 tables][pixels] — matching the decoder's read order for
    main images and transform sub-images."""
    h, w = g.shape
    bw.write(0, 1)  # no color cache
    if top_level:
        bw.write(0, 1)  # no meta prefix image

    def emit_table(values: np.ndarray, n_symbols: int):
        used = sorted(set(int(v) for v in values.reshape(-1)))
        if len(used) <= 2:
            _write_simple_code(bw, used if used else [0])
            if len(used) == 1:
                return {used[0]: (0, 0)}
            return {s: (i, 1) for i, s in enumerate(used)}
        # normal form: canonical lengths satisfying Kraft exactly —
        # (2^L - len(used)) symbols get length L-1, the rest length L
        import math

        L = max(1, math.ceil(math.log2(len(used))))
        n_short = (1 << L) - len(used)
        lengths_used = [L - 1] * n_short + [L] * (len(used) - n_short)
        lengths = [0] * n_symbols
        for sym, l in zip(used, lengths_used):
            lengths[sym] = l
        cl_syms = sorted(set(lengths_used) | {0})
        cl_lengths = [0] * 19
        nbits = max(1, math.ceil(math.log2(len(cl_syms))))
        while (1 << nbits) < len(cl_syms):
            nbits += 1
        n_short_cl = (1 << nbits) - len(cl_syms)
        cl_assigned = [nbits - 1] * n_short_cl + [nbits] * (len(cl_syms) - n_short_cl)
        for sym, l in zip(cl_syms, cl_assigned):
            cl_lengths[sym] = l
        bw.write(0, 1)  # normal code-length coding
        bw.write(19 - 4, 4)
        for sym in _CL_ORDER:
            bw.write(cl_lengths[sym], 3)
        bw.write(0, 1)  # no max_symbol
        cl_prefix = _canonical(cl_lengths)
        for i in range(n_symbols):
            c, l = cl_prefix[lengths[i]]
            bw.write(_rev(c, l), l)
        code = _canonical(lengths)
        return {sym: code[sym] for sym in used}

    gcode = emit_table(g, 256 + 24)
    rcode = emit_table(r, 256)
    bcode = emit_table(b, 256)
    acode = emit_table(a, 256)
    # distance table: unused — single-symbol simple code
    _write_simple_code(bw, [0], eight_bit=False)
    for y in range(h):
        for x in range(w):
            for code, vals in ((gcode, g), (rcode, r), (bcode, b), (acode, a)):
                c, l = code[int(vals[y, x])]
                bw.write(_rev(c, l), l)


def _split(argb: np.ndarray):
    return (
        (argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF, (argb >> 24) & 0xFF
    )


def vp8l_encode_lossless(
    px: np.ndarray,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    palette: bool = False,
) -> bytes:
    """Spec-conformant fixture encoder. Base form is literal-only (no
    cache, one code group); the optional arguments each emit one REAL
    transform so every decoder inverse path is exercised:

    - ``subtract_green``: transform 2 (residuals r-g, b-g)
    - ``predictor_mode``: transform 0 with a whole-image block (size
      bits 7 → 512px) carrying one mode; residuals computed by the
      forward predictor over original neighbors
    - ``color_transform``: (g2r, g2b, r2b) as transform 1, one block
    - ``palette``: transform 3 with delta-coded palette, including the
      sub-byte index packing when ≤16 colors

    At most one transform per call (decode order is untested territory
    the fixtures don't claim)."""
    opts = [subtract_green, predictor_mode is not None,
            color_transform is not None, palette]
    if sum(bool(o) for o in opts) > 1:
        raise ValueError("vp8l_encode_lossless: one transform at a time")
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = np.stack([px, px, px, np.full_like(px, 255)], axis=2)
    if px.shape[2] == 3:
        px = np.dstack([px, np.full(px.shape[:2], 255, dtype=np.uint8)])
    h, w = px.shape[:2]
    r = px[:, :, 0].astype(np.int64)
    g = px[:, :, 1].astype(np.int64)
    b = px[:, :, 2].astype(np.int64)
    a = px[:, :, 3].astype(np.int64)

    bw = _BitW()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if (a != 255).any() else 0, 1)
    bw.write(0, 3)  # version

    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # transform type 2
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    elif predictor_mode is not None:
        bw.write(1, 1)
        bw.write(0, 2)  # transform type 0
        bw.write(7, 3)  # block bits 7+2 → 512: one block for the image
        timg = np.full((1, 1), (0xFF << 24) | (predictor_mode << 8), np.uint32)
        tr_, tg_, tb_, ta_ = _split(timg)
        _emit_argb_image(bw, tr_, tg_, tb_, ta_)
        orig = (
            (a.astype(np.uint32) << 24) | (r.astype(np.uint32) << 16)
            | (g.astype(np.uint32) << 8) | b.astype(np.uint32)
        )
        res = _forward_predictor(orig, predictor_mode)
        r, g, b, a = (x.astype(np.int64) for x in _split(res))
    elif color_transform is not None:
        g2r, g2b, r2b = color_transform
        bw.write(1, 1)
        bw.write(1, 2)  # transform type 1
        bw.write(7, 3)
        cte = (0xFF << 24) | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
        timg = np.full((1, 1), cte, np.uint32)
        tr_, tg_, tb_, ta_ = _split(timg)
        _emit_argb_image(bw, tr_, tg_, tb_, ta_)

        def s8(v):
            return v - 256 if v >= 128 else v

        rr = np.zeros_like(r)
        bb = np.zeros_like(b)
        for y in range(h):
            for x in range(w):
                gv, rv, bv = int(g[y, x]), int(r[y, x]), int(b[y, x])
                rs = (rv - ((s8(g2r & 0xFF) * s8(gv)) >> 5)) & 0xFF
                bs = (bv - ((s8(g2b & 0xFF) * s8(gv)) >> 5)
                      - ((s8(r2b & 0xFF) * s8(rv)) >> 5)) & 0xFF
                rr[y, x] = rs
                bb[y, x] = bs
        r, b = rr, bb
    elif palette:
        colors = np.unique(px.reshape(-1, 4), axis=0)
        if len(colors) > 256:
            raise ValueError("palette: more than 256 colors")
        argb_pal = (
            (colors[:, 3].astype(np.uint32) << 24)
            | (colors[:, 0].astype(np.uint32) << 16)
            | (colors[:, 1].astype(np.uint32) << 8)
            | colors[:, 2].astype(np.uint32)
        )
        lut = {int(v): i for i, v in enumerate(argb_pal)}
        orig = (
            (a.astype(np.uint32) << 24) | (r.astype(np.uint32) << 16)
            | (g.astype(np.uint32) << 8) | b.astype(np.uint32)
        )
        idx = np.vectorize(lambda v: lut[int(v)])(orig)
        n_colors = len(argb_pal)
        bw.write(1, 1)
        bw.write(3, 2)  # transform type 3
        bw.write(n_colors - 1, 8)
        # delta-coded palette as a n_colors x 1 image
        deltas = np.zeros(n_colors, dtype=np.uint32)
        prev = 0
        for i, v in enumerate(argb_pal):
            d = (int(v) - prev) & 0xFFFFFFFF
            da = ((int(v) >> 24) - (prev >> 24)) & 0xFF
            dr = (((int(v) >> 16) & 0xFF) - ((prev >> 16) & 0xFF)) & 0xFF
            dg = (((int(v) >> 8) & 0xFF) - ((prev >> 8) & 0xFF)) & 0xFF
            db = ((int(v) & 0xFF) - (prev & 0xFF)) & 0xFF
            deltas[i] = (da << 24) | (dr << 16) | (dg << 8) | db
            prev = int(v)
        pr_, pg_, pb_, pa_ = _split(deltas.reshape(1, -1))
        _emit_argb_image(bw, pr_, pg_, pb_, pa_)
        width_bits = (
            3 if n_colors <= 2 else 2 if n_colors <= 4
            else 1 if n_colors <= 16 else 0
        )
        if width_bits:
            pix_per = 1 << width_bits
            bits_per = 8 >> width_bits
            pw = -(-w // pix_per)
            packed = np.zeros((h, pw), dtype=np.int64)
            for x in range(w):
                packed[:, x >> width_bits] |= idx[:, x] << ((x % pix_per) * bits_per)
            g = packed
            r = np.zeros_like(packed)
            b = np.zeros_like(packed)
            a = np.full_like(packed, 255)
        else:
            g = idx.astype(np.int64)
            r = np.zeros_like(g)
            b = np.zeros_like(g)
            a = np.full_like(g, 255)
    bw.write(0, 1)  # end of transforms
    _emit_argb_image(bw, r, g, b, a, top_level=True)
    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _forward_predictor(img: np.ndarray, mode: int) -> np.ndarray:
    """Forward predictor transform: residual = pixel - pred (mod 256 per
    channel), predictions computed from ORIGINAL neighbors in scan
    order — exactly what the decoder's inverse reconstructs."""
    h, w = img.shape
    # run the decoder's inverse in mirror: compute pred from originals
    out = np.zeros_like(img, dtype=np.uint32)
    orig = img.astype(np.int64)

    def parts(v):
        return np.array(
            [(v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF]
        )

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(orig[0, x - 1])
            elif x == 0:
                pred = int(orig[y - 1, 0])
            else:
                pred = _predict_one(orig, y, x, w, mode)
            v = int(orig[y, x])
            p = int(pred)
            res = (
                ((((v >> 24) - (p >> 24)) & 0xFF) << 24)
                | ((((v >> 16) - ((p >> 16) & 0xFF)) & 0xFF) << 16)
                | ((((v >> 8) - ((p >> 8) & 0xFF)) & 0xFF) << 8)
                | ((v - (p & 0xFF)) & 0xFF)
            )
            out[y, x] = res
    return out


def _predict_one(orig: np.ndarray, y: int, x: int, w: int, mode: int) -> int:
    def parts(v):
        return np.array(
            [(v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF],
            dtype=np.int64,
        )

    def pack(p):
        return (
            (int(p[0]) & 0xFF) << 24 | (int(p[1]) & 0xFF) << 16
            | (int(p[2]) & 0xFF) << 8 | (int(p[3]) & 0xFF)
        )

    L = parts(int(orig[y, x - 1]))
    T = parts(int(orig[y - 1, x]))
    TL = parts(int(orig[y - 1, x - 1]))
    TR = parts(int(orig[y - 1, x + 1]) if x + 1 < w else int(orig[y, 0]))
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return pack(L)
    if mode == 2:
        return pack(T)
    if mode == 3:
        return pack(TR)
    if mode == 4:
        return pack(TL)
    if mode == 5:
        return pack(_avg2(_avg2(L, TR), T))
    if mode == 6:
        return pack(_avg2(L, TL))
    if mode == 7:
        return pack(_avg2(L, T))
    if mode == 8:
        return pack(_avg2(TL, T))
    if mode == 9:
        return pack(_avg2(T, TR))
    if mode == 10:
        return pack(_avg2(_avg2(L, TL), _avg2(T, TR)))
    if mode == 11:
        p = L + T - TL
        pl = int(np.abs(p - L).sum())
        pt = int(np.abs(p - T).sum())
        return pack(L) if pl < pt else pack(T)
    if mode == 12:
        return pack(np.clip(L + T - TL, 0, 255))
    if mode == 13:
        avg = _avg2(L, T)
        return pack(np.clip(avg + _trunc_half(avg - TL), 0, 255))
    raise ValueError("bad predictor mode")


def _canonical(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) canonical assignment (same rule the
    decoder's _Prefix uses)."""
    max_len = max(lengths) if lengths else 0
    count = [0] * (max_len + 1)
    for l in lengths:
        if l:
            count[l] += 1
    next_code = [0] * (max_len + 1)
    code = 0
    for l in range(1, max_len + 1):
        code = (code + count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for sym, l in enumerate(lengths):
        if l:
            out[sym] = (next_code[l], l)
            next_code[l] += 1
    return out


def _rev(code: int, nbits: int) -> int:
    """Prefix codes are written MSB-first into the LSB-first stream."""
    v = 0
    for _ in range(nbits):
        v = (v << 1) | (code & 1)
        code >>= 1
    return v
