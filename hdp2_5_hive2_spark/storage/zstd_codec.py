"""Zstandard frame codec from RFC 8878, written from the specification.

Why a from-scratch codec: no ``zstandard``/``lz4``-style Python binding
ships in this container, yet zstd is the de-facto compression for modern
data lakes (parquet/orc codecs, Avro's optional ``zstandard`` codec,
``.jsonl.zst`` corpus shards). Spark's own parquet/ORC zstd stays
JVM-native (zstd-jni) and untouched — this module is the *format-layer*
path for the pure-Python container codecs in this package (Avro object
container files, corpus-shard ingestion) plus a spec-pinned audit tool.

Decoder: COMPLETE — frame header grammar,
raw/RLE/compressed blocks, all four literals block types (raw, RLE,
Huffman-compressed in 1- and 4-stream forms, treeless repeats), Huffman
table descriptions (direct weights and FSE-compressed weights with the
two interleaved states), FSE table descriptions (variable-bit threshold
coding with zero-repeat flags), predefined/RLE/FSE/repeat sequence
table modes, the three repeat-offsets with their literals-length-zero
shuffle, overlapping match copies across block boundaries, XXH64
content checksums, skippable frames, multi-frame concatenation, and
§5 DICTIONARIES (entropy-table preload + content-as-virtual-history +
repeat-offset seeding; raw-content dictionaries too) — pass the
dictionary blob to ``zstd_decompress``; frames that declare a
Dictionary_ID without one raise.

Encoders, two rungs: ``zstd_compress`` does REAL compression — greedy
LZ77 matching emitted as sequences under the predefined FSE tables
(encoding states derived by inverting this module's own decode tables),
HUFFMAN-coded literals (1- and 4-stream, Kraft-exact length-limited code
construction; the tree description is whichever of direct 4-bit weights
and FSE-compressed weights (§4.2.1.2) is smaller, so any byte alphabet —
including symbols above 128 — gets entropy-coded literals),
and RLE/raw blocks where nothing pays — measured ~4.7x on doc corpora,
decodable by any spec decoder (zstd-jni parity pinned).
``zstd_compress_store`` keeps the raw/RLE-only form for fixtures.

Verification: the container ships the reference implementation JVM-side
(zstd-jni, ``com.github.luben.zstd.Zstd``) — tests/test_zstd.py pins
cross-parity BOTH directions at multiple compression levels (levels
exercise predefined vs FSE-described tables, 1- vs 4-stream Huffman
literals, treeless repeats and multi-block history), and XXH64 against
Spark's ``xxhash64`` SQL function (same public algorithm, seed 42).

Hostile-input contract: ``ValueError`` only, like every parser in this
package (crawl payloads are attacker-controlled).

100 TB notes: decode is pure Python (~MB/s) — a *format* tool for
container-codec blocks and audits, not a bulk-data hot path; bulk
columnar zstd (parquet/ORC) already rides Tungsten's native codec. Avro
blocks are ≤ a few MB, decoded inside mapInPandas tasks, so the work
distributes with the splits.
"""

from __future__ import annotations

import bisect
import struct

__all__ = [
    "zstd_decompress",
    "zstd_compress",
    "zstd_compress_store",
    "xxh64",
    "ZstdDict",
]

_MAGIC = 0xFD2FB528
_SKIP_LO = 0x184D2A50
_SKIP_HI = 0x184D2A5F

# ---------------------------------------------------------------------------
# XXH64 (public algorithm; RFC 8878 uses the low 32 bits as Content_Checksum)
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` — pinned against Spark's xxhash64 in tests."""
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        lanes = (n // 32) * 32
        for off in range(0, lanes, 32):
            a, b, c, d = struct.unpack_from("<QQQQ", data, off)
            v1 = (_rotl((v1 + a * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + b * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + c * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + d * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
        pos = lanes
    else:
        h = (seed + _P5) & _M64
        pos = 0
    h = (h + n) & _M64
    while pos + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, pos)
        h ^= (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        pos += 8
    if pos + 4 <= n:
        (k,) = struct.unpack_from("<I", data, pos)
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# Bitstreams. zstd entropy payloads are written LSB-first and read BACKWARD
# from a final 1-bit sentinel; table descriptions are read forward.
# ---------------------------------------------------------------------------


class _BackBits:
    """Backward reader: ``read(n)`` pops the n most-recently-written bits,
    first-popped bit ending up the MSB of the result (RFC 8878 §4.1)."""

    __slots__ = ("data", "rem")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ValueError("zstd corrupt: bitstream missing sentinel bit")
        self.data = data
        self.rem = 8 * len(data) - 1  # strip padding sentinel
        top = data[-1]
        while not (top & 0x80):
            top <<= 1
            self.rem -= 1

    def read(self, n: int) -> int:
        if n > self.rem:
            raise ValueError("zstd corrupt: bitstream exhausted")
        self.rem -= n
        pos = self.rem
        chunk = int.from_bytes(self.data[pos >> 3 : (pos + n + 7) >> 3], "little")
        return (chunk >> (pos & 7)) & ((1 << n) - 1)

    def peek_padded(self, n: int) -> int:
        """Peek n bits, zero-padding low bits past the stream start (the
        reference decoder's end-of-stream Huffman lookahead)."""
        take = min(n, self.rem)
        pos = self.rem - take
        chunk = int.from_bytes(self.data[pos >> 3 : (pos + take + 7) >> 3], "little")
        return ((chunk >> (pos & 7)) & ((1 << take) - 1)) << (n - take)

    def skip(self, n: int) -> None:
        if n > self.rem:
            raise ValueError("zstd corrupt: bitstream exhausted")
        self.rem -= n


class _FwdBits:
    """Forward LSB-first reader for FSE table descriptions (§4.1.1)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > 8 * len(self.data):
            raise ValueError("zstd corrupt: table description truncated")
        chunk = int.from_bytes(
            self.data[self.pos >> 3 : (end + 7) >> 3], "little"
        )
        v = (chunk >> (self.pos & 7)) & ((1 << n) - 1)
        self.pos = end
        return v

    def rewind(self, n: int) -> None:
        self.pos -= n

    def bytes_used(self) -> int:
        return (self.pos + 7) >> 3


# ---------------------------------------------------------------------------
# FSE (§4.1)
# ---------------------------------------------------------------------------


class _FseTable:
    __slots__ = ("alog", "symbol", "nbits", "base")

    def __init__(self, alog: int, symbol, nbits, base):
        self.alog = alog
        self.symbol = symbol
        self.nbits = nbits
        self.base = base


def _fse_from_counts(counts: list[int], alog: int) -> _FseTable:
    """Decode-table construction (§4.1.1): less-than-one symbols take the
    top slots, the rest spread with the (5/8·size + 3) step."""
    size = 1 << alog
    symbols = [0] * size
    state_desc = [0] * len(counts)
    high = size - 1
    for s, c in enumerate(counts):
        if c == -1:
            symbols[high] = s
            state_desc[s] = 1
            high -= 1
        elif c > 0:
            state_desc[s] = c
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, c in enumerate(counts):
        for _ in range(max(c, 0)):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd corrupt: FSE counts do not fill the table")
    nbits = [0] * size
    base = [0] * size
    for i in range(size):
        s = symbols[i]
        x = state_desc[s]
        state_desc[s] = x + 1
        nb = alog - (x.bit_length() - 1)
        nbits[i] = nb
        base[i] = (x << nb) - size
    return _FseTable(alog, symbols, nbits, base)


def _fse_rle(symbol: int) -> _FseTable:
    return _FseTable(0, [symbol], [0], [0])


def _read_fse_counts(
    br: _FwdBits, max_symbol: int, max_alog: int
) -> tuple[list[int], int]:
    """Variable-bit normalized-count reader (§4.1.1) with the probability
    -1 ("less than one") encoding and 2-bit zero-repeat flags."""
    alog = br.read(4) + 5
    if alog > max_alog:
        raise ValueError("zstd corrupt: FSE accuracy log too large")
    remaining = (1 << alog) + 1
    counts: list[int] = []
    while remaining > 1:
        if len(counts) > max_symbol:
            raise ValueError("zstd corrupt: FSE counts exceed symbol range")
        bits = remaining.bit_length()
        val = br.read(bits)
        low_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - remaining
        if (val & low_mask) < threshold:
            br.rewind(1)
            proba = (val & low_mask) - 1
        elif val > low_mask:
            proba = val - threshold - 1
        else:
            proba = val - 1
        counts.append(proba)
        remaining -= -proba if proba < 0 else proba
        if proba == 0:
            rep = br.read(2)
            counts.extend([0] * rep)
            while rep == 3:
                rep = br.read(2)
                counts.extend([0] * rep)
    if remaining != 1 or len(counts) > max_symbol + 1:
        raise ValueError("zstd corrupt: bad FSE count stream")
    return counts, alog


def _fse_decode_open(table: _FseTable, bb: _BackBits) -> list[int]:
    """Interleaved two-state FSE decode of an unknown-length symbol run
    (Huffman weights, §4.2.1): stop when a state update would read past
    the stream start, then flush the other state."""
    s1 = bb.read(table.alog)
    s2 = bb.read(table.alog)
    out: list[int] = []
    while True:
        if len(out) > 255:
            raise ValueError("zstd corrupt: runaway Huffman weight stream")
        out.append(table.symbol[s1])
        nb = table.nbits[s1]
        if nb > bb.rem:
            out.append(table.symbol[s2])
            break
        s1 = table.base[s1] + bb.read(nb)
        out.append(table.symbol[s2])
        nb = table.nbits[s2]
        if nb > bb.rem:
            out.append(table.symbol[s1])
            break
        s2 = table.base[s2] + bb.read(nb)
    return out


# ---------------------------------------------------------------------------
# Huffman literals (§4.2)
# ---------------------------------------------------------------------------


class _HufTable:
    __slots__ = ("tlog", "symbol", "nbits")

    def __init__(self, tlog: int, symbol: list[int], nbits: list[int]):
        self.tlog = tlog
        self.symbol = symbol
        self.nbits = nbits


def _huf_from_weights(weights: list[int]) -> _HufTable:
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd corrupt: empty Huffman weights")
    tlog = total.bit_length()  # total < 2^tlog <= 2*total
    rest = (1 << tlog) - total
    if rest & (rest - 1):
        raise ValueError("zstd corrupt: Huffman weights not normalizable")
    weights = weights + [rest.bit_length()]
    if len(weights) > 256 or tlog > 11:
        raise ValueError("zstd corrupt: Huffman table out of range")
    size = 1 << tlog
    symbol = [0] * size
    nbits = [0] * size
    # longest codes (lowest weights) occupy the lowest table ranks; within
    # a weight class, ascending symbol order (§4.2.1 rank layout)
    if max(weights) > tlog:
        raise ValueError("zstd corrupt: Huffman weight exceeds table log")
    rank_count = [0] * (tlog + 1)
    for w in weights:
        rank_count[w] += 1
    rank_idx = [0] * (tlog + 2)
    acc = 0
    for w in range(1, tlog + 1):
        rank_idx[w] = acc
        acc += rank_count[w] << (w - 1)
    if acc != size:
        raise ValueError("zstd corrupt: Huffman weights do not fill table")
    for s, w in enumerate(weights):
        if w == 0:
            continue
        run = 1 << (w - 1)
        at = rank_idx[w]
        nb = tlog + 1 - w
        for i in range(at, at + run):
            symbol[i] = s
            nbits[i] = nb
        rank_idx[w] += run
    return _HufTable(tlog, symbol, nbits)


def _read_huf_desc(data: bytes) -> tuple[_HufTable, int]:
    """Huffman_Tree_Description (§4.2.1): direct 4-bit weights when the
    header byte is >= 128, else an FSE-compressed weight stream."""
    if not data:
        raise ValueError("zstd corrupt: missing Huffman description")
    hb = data[0]
    if hb >= 128:
        nw = hb - 127
        nbytes = (nw + 1) // 2
        raw = data[1 : 1 + nbytes]
        if len(raw) < nbytes:
            raise ValueError("zstd corrupt: truncated Huffman weights")
        weights = []
        for i in range(nw):
            b = raw[i >> 1]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return _huf_from_weights(weights), 1 + nbytes
    comp = data[1 : 1 + hb]
    if len(comp) < hb:
        raise ValueError("zstd corrupt: truncated Huffman FSE weights")
    fwd = _FwdBits(comp)
    counts, alog = _read_fse_counts(fwd, 255, 6)
    table = _fse_from_counts(counts, alog)
    weights = _fse_decode_open(table, _BackBits(comp[fwd.bytes_used() :]))
    return _huf_from_weights(weights), 1 + hb


def _huf_decode(table: _HufTable, stream: bytes, count: int) -> bytearray:
    if count == 0:
        return bytearray()
    bb = _BackBits(stream)
    out = bytearray(count)
    tlog, symbol, nbits = table.tlog, table.symbol, table.nbits
    for i in range(count):
        idx = bb.peek_padded(tlog)
        out[i] = symbol[idx]
        bb.skip(nbits[idx])  # a valid stream's code lengths sum to rem
    if bb.rem != 0:
        raise ValueError("zstd corrupt: literals bitstream not fully consumed")
    return out


# ---------------------------------------------------------------------------
# Sequences (§3.1.1.3.2)
# ---------------------------------------------------------------------------

_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
_ML_BASE = [c + 3 for c in range(32)] + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]

_LL_DEFAULT = [
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1,
]
_ML_DEFAULT = [
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    -1, -1, -1, -1, -1, -1, -1,
]
_OF_DEFAULT = [
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, -1, -1, -1, -1, -1,
]

_SEQ_MAX_SYM = {"ll": 35, "of": 31, "ml": 52}
_SEQ_MAX_ALOG = {"ll": 9, "of": 8, "ml": 9}
_SEQ_DEFAULT = {
    "ll": _fse_from_counts(_LL_DEFAULT, 6),
    "of": _fse_from_counts(_OF_DEFAULT, 5),
    "ml": _fse_from_counts(_ML_DEFAULT, 6),
}


def _read_seq_table(
    kind: str, mode: int, data: bytes, pos: int, prev: _FseTable | None
) -> tuple[_FseTable, int]:
    if mode == 0:
        return _SEQ_DEFAULT[kind], pos
    if mode == 1:
        if pos >= len(data):
            raise ValueError("zstd corrupt: missing RLE sequence symbol")
        sym = data[pos]
        if sym > _SEQ_MAX_SYM[kind]:
            raise ValueError("zstd corrupt: RLE sequence symbol out of range")
        return _fse_rle(sym), pos + 1
    if mode == 2:
        fwd = _FwdBits(data[pos:])
        counts, alog = _read_fse_counts(fwd, _SEQ_MAX_SYM[kind], _SEQ_MAX_ALOG[kind])
        return _fse_from_counts(counts, alog), pos + fwd.bytes_used()
    if prev is None:
        raise ValueError("zstd corrupt: repeat sequence table with no previous")
    return prev, pos


class _FrameCtx:
    """Per-frame state the format threads across blocks: repeat offsets,
    the last Huffman table (treeless literals) and last FSE tables
    (repeat mode)."""

    def __init__(self) -> None:
        self.reps = [1, 4, 8]
        self.huf: _HufTable | None = None
        self.ll: _FseTable | None = None
        self.of: _FseTable | None = None
        self.ml: _FseTable | None = None


def _decode_literals(block: bytes, ctx: _FrameCtx) -> tuple[bytes, int]:
    """Literals section (§3.1.1.3.1) → (literals, bytes consumed)."""
    if not block:
        raise ValueError("zstd corrupt: empty compressed block")
    b0 = block[0]
    btype = b0 & 3
    sf = (b0 >> 2) & 3
    if btype in (0, 1):  # Raw / RLE
        if sf in (0, 2):
            regen, hdr = b0 >> 3, 1
        elif sf == 1:
            if len(block) < 2:
                raise ValueError("zstd corrupt: truncated literals header")
            regen, hdr = (b0 >> 4) | (block[1] << 4), 2
        else:
            if len(block) < 3:
                raise ValueError("zstd corrupt: truncated literals header")
            regen, hdr = (b0 >> 4) | (block[1] << 4) | (block[2] << 12), 3
        if btype == 0:
            lits = block[hdr : hdr + regen]
            if len(lits) < regen:
                raise ValueError("zstd corrupt: truncated raw literals")
            return lits, hdr + regen
        if len(block) < hdr + 1:
            raise ValueError("zstd corrupt: truncated RLE literal")
        return bytes([block[hdr]]) * regen, hdr + 1
    # Compressed (2) / Treeless (3)
    if sf == 0:
        streams, hdr_len, nbits = 1, 3, 10
    elif sf == 1:
        streams, hdr_len, nbits = 4, 3, 10
    elif sf == 2:
        streams, hdr_len, nbits = 4, 4, 14
    else:
        streams, hdr_len, nbits = 4, 5, 18
    if len(block) < hdr_len:
        raise ValueError("zstd corrupt: truncated literals header")
    v = int.from_bytes(block[:hdr_len], "little")
    regen = (v >> 4) & ((1 << nbits) - 1)
    comp = (v >> (4 + nbits)) & ((1 << nbits) - 1)
    pos = hdr_len
    end = hdr_len + comp
    if len(block) < end:
        raise ValueError("zstd corrupt: truncated compressed literals")
    if btype == 2:
        table, used = _read_huf_desc(block[pos:end])
        ctx.huf = table
        pos += used
    else:
        table = ctx.huf
        if table is None:
            raise ValueError("zstd corrupt: treeless literals with no table")
    if streams == 1:
        return bytes(_huf_decode(table, block[pos:end], regen)), end
    if end - pos < 6:
        raise ValueError("zstd corrupt: missing literals jump table")
    s1, s2, s3 = struct.unpack_from("<HHH", block, pos)
    pos += 6
    sizes = [s1, s2, s3, end - pos - s1 - s2 - s3]
    if sizes[3] <= 0:
        raise ValueError("zstd corrupt: bad literals jump table")
    per = (regen + 3) // 4
    counts = [per, per, per, regen - 3 * per]
    if counts[3] < 0:
        raise ValueError("zstd corrupt: literals shorter than 4-stream form")
    out = bytearray()
    for sz, cnt in zip(sizes, counts):
        out += _huf_decode(table, block[pos : pos + sz], cnt)
        pos += sz
    return bytes(out), end


def _decode_block(block: bytes, ctx: _FrameCtx, history: bytearray) -> None:
    blk_start = len(history)
    lits, pos = _decode_literals(block, ctx)
    if len(lits) > (1 << 17):
        raise ValueError("zstd corrupt: literals beyond block maximum size")
    if pos >= len(block):
        raise ValueError("zstd corrupt: missing sequences header")
    b0 = block[pos]
    if b0 < 128:
        nseq, pos = b0, pos + 1
    elif b0 < 255:
        if pos + 2 > len(block):
            raise ValueError("zstd corrupt: truncated sequence count")
        nseq, pos = ((b0 - 128) << 8) | block[pos + 1], pos + 2
    else:
        if pos + 3 > len(block):
            raise ValueError("zstd corrupt: truncated sequence count")
        nseq, pos = block[pos + 1] | (block[pos + 2] << 8) | 0x7F00, pos + 3
    if nseq == 0:
        history += lits
        return
    if pos >= len(block):
        raise ValueError("zstd corrupt: missing compression modes")
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd corrupt: reserved sequence mode bits set")
    ctx.ll, pos = _read_seq_table("ll", (modes >> 6) & 3, block, pos, ctx.ll)
    ctx.of, pos = _read_seq_table("of", (modes >> 4) & 3, block, pos, ctx.of)
    ctx.ml, pos = _read_seq_table("ml", (modes >> 2) & 3, block, pos, ctx.ml)
    bb = _BackBits(block[pos:])
    sll = bb.read(ctx.ll.alog)
    sof = bb.read(ctx.of.alog)
    sml = bb.read(ctx.ml.alog)
    lpos = 0
    reps = ctx.reps
    for i in range(nseq):
        of_code = ctx.of.symbol[sof]
        if of_code > 31:
            raise ValueError("zstd corrupt: offset code out of range")
        of_val = (1 << of_code) + bb.read(of_code)
        ml_code = ctx.ml.symbol[sml]
        ml = _ML_BASE[ml_code] + bb.read(_ML_BITS[ml_code])
        ll_code = ctx.ll.symbol[sll]
        ll = _LL_BASE[ll_code] + bb.read(_LL_BITS[ll_code])
        if of_val > 3:
            offset = of_val - 3
            reps[:] = [offset, reps[0], reps[1]]
        else:
            idx = of_val + (1 if ll == 0 else 0)
            if idx == 1:
                offset = reps[0]
            elif idx == 2:
                offset = reps[1]
                reps[:] = [reps[1], reps[0], reps[2]]
            elif idx == 3:
                offset = reps[2]
                reps[:] = [reps[2], reps[0], reps[1]]
            else:
                offset = reps[0] - 1
                reps[:] = [offset, reps[0], reps[1]]
        if offset <= 0:
            raise ValueError("zstd corrupt: zero match offset")
        if lpos + ll > len(lits):
            raise ValueError("zstd corrupt: literals overrun")
        history += lits[lpos : lpos + ll]
        lpos += ll
        if offset > len(history):
            raise ValueError("zstd corrupt: match offset beyond history")
        if len(history) - blk_start + ml > (1 << 17):
            raise ValueError("zstd corrupt: block output beyond maximum size")
        start = len(history) - offset
        if offset >= ml:
            history += history[start : start + ml]
        else:
            chunk = bytes(history[start:])
            while len(chunk) < ml:
                chunk += chunk
            history += chunk[:ml]
        if i + 1 < nseq:
            nb = ctx.ll.nbits[sll]
            sll = ctx.ll.base[sll] + bb.read(nb)
            nb = ctx.ml.nbits[sml]
            sml = ctx.ml.base[sml] + bb.read(nb)
            nb = ctx.of.nbits[sof]
            sof = ctx.of.base[sof] + bb.read(nb)
    if bb.rem != 0:
        raise ValueError("zstd corrupt: sequence bitstream not fully consumed")
    history += lits[lpos:]
    if len(history) - blk_start > (1 << 17):
        raise ValueError("zstd corrupt: block output beyond maximum size")



# ---------------------------------------------------------------------------
# Dictionaries (RFC 8878 §5)
# ---------------------------------------------------------------------------

_DICT_MAGIC = 0xEC30A437


class ZstdDict:
    """Parsed dictionary: id, pre-loaded entropy tables, repeat offsets,
    and the content that serves as virtual history before the frame.
    Blobs without the dictionary magic are RAW-CONTENT dictionaries
    (content only, default tables/offsets) per §5."""

    __slots__ = ("dict_id", "huf", "of", "ml", "ll", "reps", "content")

    def __init__(self, blob: bytes):
        if len(blob) >= 8 and int.from_bytes(blob[:4], "little") == _DICT_MAGIC:
            self.dict_id = int.from_bytes(blob[4:8], "little")
            pos = 8
            self.huf, used = _read_huf_desc(blob[pos:])
            pos += used
            fwd = _FwdBits(blob[pos:])
            counts, alog = _read_fse_counts(fwd, _SEQ_MAX_SYM["of"], _SEQ_MAX_ALOG["of"])
            self.of = _fse_from_counts(counts, alog)
            pos += fwd.bytes_used()
            fwd = _FwdBits(blob[pos:])
            counts, alog = _read_fse_counts(fwd, _SEQ_MAX_SYM["ml"], _SEQ_MAX_ALOG["ml"])
            self.ml = _fse_from_counts(counts, alog)
            pos += fwd.bytes_used()
            fwd = _FwdBits(blob[pos:])
            counts, alog = _read_fse_counts(fwd, _SEQ_MAX_SYM["ll"], _SEQ_MAX_ALOG["ll"])
            self.ll = _fse_from_counts(counts, alog)
            pos += fwd.bytes_used()
            if pos + 12 > len(blob):
                raise ValueError("zstd corrupt: dictionary header truncated")
            self.reps = [
                int.from_bytes(blob[pos + 4 * i : pos + 4 * i + 4], "little")
                for i in range(3)
            ]
            if any(r == 0 for r in self.reps):
                raise ValueError("zstd corrupt: zero dictionary repeat offset")
            self.content = blob[pos + 12 :]
        else:
            self.dict_id = 0
            self.huf = self.of = self.ml = self.ll = None
            self.reps = [1, 4, 8]
            self.content = blob


def _decode_frame(
    data: bytes, pos: int, zdict: ZstdDict | None = None
) -> tuple[bytearray, int]:
    if pos + 2 > len(data):
        raise ValueError("zstd corrupt: truncated frame header")
    fhd = data[pos]
    pos += 1
    if fhd & 0x08:
        raise ValueError("zstd corrupt: reserved frame header bit set")
    single = bool(fhd & 0x20)
    checksum = bool(fhd & 0x04)
    did_flag = fhd & 3
    fcs_flag = fhd >> 6
    if not single:
        if pos >= len(data):
            raise ValueError("zstd corrupt: missing window descriptor")
        pos += 1  # window bound is advisory for a whole-buffer decoder
    did_len = (0, 1, 2, 4)[did_flag]
    if did_len:
        did = int.from_bytes(data[pos : pos + did_len], "little")
        if did:
            if zdict is None:
                raise ValueError(
                    "zstd: dictionary frame — pass the dictionary blob"
                )
            if zdict.dict_id and zdict.dict_id != did:
                raise ValueError("zstd corrupt: dictionary ID mismatch")
        pos += did_len
    fcs_len = (1 if single else 0, 2, 4, 8)[fcs_flag]
    fcs = None
    if fcs_len:
        if pos + fcs_len > len(data):
            raise ValueError("zstd corrupt: truncated frame content size")
        fcs = int.from_bytes(data[pos : pos + fcs_len], "little")
        if fcs_len == 2:
            fcs += 256
        pos += fcs_len
    ctx = _FrameCtx()
    prefix = 0
    out = bytearray()
    if zdict is not None:
        ctx.huf, ctx.of, ctx.ml, ctx.ll = zdict.huf, zdict.of, zdict.ml, zdict.ll
        ctx.reps = list(zdict.reps)
        prefix = len(zdict.content)
        out = bytearray(zdict.content)
    while True:
        if pos + 3 > len(data):
            raise ValueError("zstd corrupt: truncated block header")
        bh = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        if btype == 3:
            raise ValueError("zstd corrupt: reserved block type")
        if bsize > (1 << 17):
            # Block_Maximum_Size = min(Window_Size, 128 KiB) for every
            # block type — also the decompression-bomb guard for RLE
            raise ValueError("zstd corrupt: block beyond maximum size")
        if btype == 1:  # RLE: 1 stored byte, bsize output bytes
            if pos + 1 > len(data):
                raise ValueError("zstd corrupt: truncated RLE block")
            out += bytes([data[pos]]) * bsize
            pos += 1
        else:
            if pos + bsize > len(data):
                raise ValueError("zstd corrupt: truncated block")
            body = data[pos : pos + bsize]
            pos += bsize
            if btype == 0:
                out += body
            else:
                _decode_block(body, ctx, out)
        if last:
            break
    del out[:prefix]
    if fcs is not None and len(out) != fcs:
        raise ValueError("zstd corrupt: content size mismatch")
    if checksum:
        if pos + 4 > len(data):
            raise ValueError("zstd corrupt: missing content checksum")
        want = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if xxh64(bytes(out)) & 0xFFFFFFFF != want:
            raise ValueError("zstd corrupt: content checksum mismatch")
    return out, pos


def zstd_decompress(data: bytes, dictionary: bytes | None = None) -> bytes:
    """Decode a (possibly multi-frame) zstd buffer per RFC 8878.
    ``dictionary`` is a §5 dictionary blob (magic 0xEC30A437 with
    entropy tables + content, or raw content) applied to every frame
    that declares a Dictionary_ID."""
    out = bytearray()
    pos = 0
    zdict: ZstdDict | None = None
    if not data:
        raise ValueError("zstd corrupt: empty input")
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("zstd corrupt: truncated magic")
        magic = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if _SKIP_LO <= magic <= _SKIP_HI:
            if pos + 4 > len(data):
                raise ValueError("zstd corrupt: truncated skippable frame")
            skip = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4 + skip
            if pos > len(data):
                raise ValueError("zstd corrupt: truncated skippable frame")
            continue
        if magic != _MAGIC:
            raise ValueError("zstd corrupt: bad magic")
        if zdict is None and dictionary is not None:
            zdict = ZstdDict(dictionary)
        frame, pos = _decode_frame(data, pos, zdict)
        out += frame
    return bytes(out)


# ---------------------------------------------------------------------------
# Store encoder (raw/RLE blocks; the webp.py fixture-encoder strategy)
# ---------------------------------------------------------------------------


def zstd_compress_store(data: bytes, checksum: bool = True) -> bytes:
    """Conformant single-segment frame with raw/RLE blocks only (§3.1.1).

    Spec-complete decoders — zstd-jni included, pinned in tests — read it;
    this package's own zstd WRITES are store-layer by design (reads are
    the complete path)."""
    out = bytearray(struct.pack("<I", _MAGIC))
    n = len(data)
    if n < 256 and n != 0:
        fcs_flag, fcs = 0, struct.pack("<B", n)
    elif 256 <= n < 65536 + 256:
        fcs_flag, fcs = 1, struct.pack("<H", n - 256)
    elif n < (1 << 32):
        fcs_flag, fcs = 2, struct.pack("<I", n)
    else:
        fcs_flag, fcs = 3, struct.pack("<Q", n)
    if n == 0:
        fcs_flag, fcs = 0, b"\x00"
    out.append((fcs_flag << 6) | 0x20 | (0x04 if checksum else 0))
    out += fcs
    chunks = range(0, n, 1 << 16) if n else [0]
    last_off = (max(chunks) if n else 0)
    for off in chunks:
        body = data[off : off + (1 << 16)]
        last = 1 if off == last_off else 0
        if len(body) > 1 and len(set(body)) == 1:
            out += struct.pack("<I", last | (1 << 1) | (len(body) << 3))[:3]
            out.append(body[0])
        else:
            out += struct.pack("<I", last | (0 << 1) | (len(body) << 3))[:3]
            out += body
    if checksum:
        out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Compressing encoder: LZ77 sequences + predefined FSE tables, raw literals
# ---------------------------------------------------------------------------


class _FseEncoder:
    """FSE encoding derived from a decode table: to emit symbol ``s``
    whose decoder will NEXT be in state ``y``, pick the unique state
    ``x`` with symbol[x] == s whose update range covers y and write the
    low bits (y - base[x]) in nbits[x] bits. Processing sequences in
    reverse and writing fields reversed makes the backward-reading
    decoder replay them in order."""

    def __init__(self, table: _FseTable):
        self.table = table
        # per symbol: its states sorted by update-range base, plus the
        # parallel base list — a symbol's ranges partition [0, 2^alog), so
        # the state covering `nxt` is found by bisect, not a linear scan
        # (a tuned table can give one dominant symbol hundreds of states)
        tmp: dict[int, list[int]] = {}
        for x in range(1 << table.alog):
            tmp.setdefault(table.symbol[x], []).append(x)
        self.by_symbol: dict[int, tuple[list[int], list[int]]] = {}
        for s, xs in tmp.items():
            xs.sort(key=lambda x: table.base[x])
            self.by_symbol[s] = ([table.base[x] for x in xs], xs)
            # Partition invariant, asserted ONCE here so the fused
            # pick-state-and-write loop in _compress_sequences can skip the
            # per-symbol range check without ever emitting a silently
            # corrupt bitstream (ADVICE r8): each symbol's update ranges
            # must tile [0, 2^alog) exactly — a future normalizer bug
            # (e.g. a -1 count) fails loudly at table-build time.
            end = 0
            for x in xs:
                if table.base[x] != end:
                    raise AssertionError(
                        f"FSE ranges for symbol {s} do not tile the state "
                        f"space: gap/overlap at {end} vs base {table.base[x]}"
                    )
                end += 1 << table.nbits[x]
            if end != 1 << table.alog:
                raise AssertionError(
                    f"FSE ranges for symbol {s} cover {end} of "
                    f"{1 << table.alog} states"
                )

    def state_for(self, s: int, nxt: int | None) -> tuple[int, int, int]:
        """(state, field_value, field_nbits) so the decoder at ``state``
        emits ``s`` and transitions to ``nxt`` (None = s is the LAST
        symbol read, any state works, no field)."""
        entry = self.by_symbol.get(s)
        if not entry:
            raise ValueError(f"symbol {s} has zero probability in this table")
        bases, xs = entry
        if nxt is None:
            return xs[0], 0, -1
        t = self.table
        x = xs[bisect.bisect_right(bases, nxt) - 1]
        lo = t.base[x]
        if not (lo <= nxt < lo + (1 << t.nbits[x])):
            raise AssertionError("FSE ranges must cover the state space")
        return x, nxt - lo, t.nbits[x]


_ENC_LL = _FseEncoder(_SEQ_DEFAULT["ll"])
_ENC_OF = _FseEncoder(_SEQ_DEFAULT["of"])
_ENC_ML = _FseEncoder(_SEQ_DEFAULT["ml"])
_ENC_PREDEF = {"ll": _ENC_LL, "of": _ENC_OF, "ml": _ENC_ML}
# implied per-symbol probability of the predefined tables (state-spread
# occupancy), for the tuned-vs-predefined cost estimate
_SEQ_PRED_COUNTS = {
    k: {s: t.symbol.count(s) for s in set(t.symbol)}
    for k, t in _SEQ_DEFAULT.items()
}


def _normalize_seq_counts(freq: dict[int, int], alog: int) -> list[int] | None:
    """Exact-sum normalization of sequence-code frequencies to FSE counts
    summing to 1 << alog, every present symbol >= 1. Unlike the
    Huffman-weight normalizer there is NO half-table cap: sequence
    bitstreams are closed-ended (nseq is explicit), so zero-bit dominant
    states are legal — exactly how real zstd tables encode a near-constant
    code. None when the alphabet cannot fit the table."""
    size = 1 << alog
    syms = sorted(freq)
    if len(syms) < 2 or len(syms) > size:
        return None
    cap = size - (len(syms) - 1)
    total = sum(freq.values())
    counts = {s: min(cap, max(1, (freq[s] * size) // total)) for s in syms}
    diff = size - sum(counts.values())
    while diff > 0:
        under = [s for s in syms if counts[s] < cap]
        if not under:
            return None
        s = max(under, key=lambda s: freq[s] / counts[s])
        counts[s] += 1
        diff -= 1
    while diff < 0:
        over = [s for s in syms if counts[s] > 1]
        if not over:
            return None
        s = min(over, key=lambda s: freq[s] / counts[s])
        counts[s] -= 1
        diff += 1
    out = [0] * (max(syms) + 1)
    for s in syms:
        out[s] = counts[s]
    return out


def _choose_seq_table(
    kind: str, codesyms: list[int]
) -> tuple[int, bytes, "_FseTable", _FseEncoder]:
    """(mode, description bytes, decode table, encoder) for one sequence
    field: Predefined_Mode (0), RLE_Mode (1) for a constant code, or
    FSE_Compressed_Mode (2) with a per-block tuned table when its
    entropy estimate (+ table description bytes) beats the predefined
    distribution. The tuned table is built by the SAME _fse_from_counts
    the decoder uses, so encode/decode cannot drift."""
    import math

    freq: dict[int, int] = {}
    for s in codesyms:
        freq[s] = freq.get(s, 0) + 1
    if len(freq) == 1:
        sym = next(iter(freq))
        t = _fse_rle(sym)
        return 1, bytes([sym]), t, _FseEncoder(t)
    predef = _SEQ_DEFAULT[kind]
    pc = _SEQ_PRED_COUNTS[kind]
    est_pred = 0.0
    for s, f in freq.items():
        c = pc.get(s, 0)
        if not c:
            est_pred = float("inf")
            break
        est_pred += f * (predef.alog - math.log2(c))
    total = len(codesyms)
    best_est = est_pred
    best: tuple[bytes, list[int], int] | None = None
    max_alog = _SEQ_MAX_ALOG[kind]
    for alog in sorted({max_alog, max(5, min(max_alog, (total - 1).bit_length()))}):
        counts = _normalize_seq_counts(freq, alog)
        if counts is None:
            continue
        desc = _write_fse_counts(counts, alog)
        est = 8 * len(desc) + (alog - predef.alog)  # initial-state width delta
        for s, f in freq.items():
            est += f * (alog - math.log2(counts[s]))
        if est < best_est:
            best_est = est
            best = (desc, counts, alog)
    if best is None:
        return 0, b"", predef, _ENC_PREDEF[kind]
    desc, counts, alog = best
    t = _fse_from_counts(counts, alog)
    return 2, desc, t, _FseEncoder(t)


def _code_of(value: int, bases: list[int]) -> int:
    return bisect.bisect_right(bases, value) - 1


def _find_sequences(
    block: bytes,
    chain: int = 32,
    keylen: int = 8,
    lazy_below: int = 0,
    nice: int = 128,
    bsize: int | None = None,
) -> tuple[list[tuple[int, int, int]], int]:
    """Chain-matched LZ77: (lit_len, match_len, offset) triples + count
    of trailing literals. Min match = ``keylen`` (8 — selective keys beat
    4-byte ones: the chains then hold only candidates that already agree
    on 8 bytes, so a depth-``chain`` walk inspects long-match material
    instead of short-key noise; measured ~+23% ratio at equal depth on
    the JSONL corpus, 3.27x -> 4.02x at chain=16).

    The zstd reference encoder's strategy rungs, re-expressed:

    - The per-key predecessor chains are built VECTORIZED before the
      scan: one stable argsort of the exact 8-byte keys gives
      ``prev[i]`` = the latest j < i with the same key (no dict inserts
      in the hot loop, and match-interior positions are indexed for
      free — a single-slot table would let text after a long match
      only ever match across it).
    - ``nice``: stop the chain walk once a match is at least this long
      (zstd's "nice length" cutoff).
    - ``lazy_below``: one-step lazy matching, applied only when the
      found match is shorter than this. Off by default: measured on the
      JSONL corpus, lazy_below=16 buys +1.5% ratio for ~40% more time —
      an opt-in ratio knob, not the bulk-write default.
    - ``bsize``: when set, no emitted match crosses a ``bsize``-aligned
      output boundary (it is capped there; the continuation re-matches
      at the boundary, typically as an ll=0 sequence with the same
      offset). This lets the caller run ONE matcher pass over a whole
      frame segment — offsets reach across block boundaries, which the
      format's frame-wide history allows — and still split the result
      into spec-max-sized blocks.

    Deterministic: pure function of the input bytes."""
    n = len(block)
    seqs: list[tuple[int, int, int]] = []
    if n < keylen:
        return seqs, n
    import numpy as np

    a = np.frombuffer(block, dtype=np.uint8).astype(np.uint64)
    nk = n - keylen + 1
    k = a[:nk].copy()
    for b in range(1, keylen):
        k |= a[b : b + nk] << np.uint64(8 * b)
    order = np.argsort(k, kind="stable")
    ks = k[order]
    same = ks[1:] == ks[:-1]
    prev_arr = np.full(nk, -1, np.int64)
    prev_arr[order[1:][same]] = order[:-1][same]
    prev = prev_arr.tolist()
    blk = block

    def find(i: int, cap: int) -> tuple[int, int]:
        best = 0
        boff = 0
        stop = nice if nice < cap else cap
        j = prev[i]
        depth = chain
        while j >= 0 and depth and best < stop:
            depth -= 1
            # quick reject: a candidate can only win if it matches at the
            # current best length's boundary byte
            if best == 0 or (i + best < n and blk[j + best] == blk[i + best]):
                ln = keylen
                while i + ln + 16 <= n and blk[j + ln : j + ln + 16] == blk[i + ln : i + ln + 16]:
                    ln += 16
                while i + ln < n and blk[j + ln] == blk[i + ln]:
                    ln += 1
                if ln > best:
                    best, boff = ln, i - j
            j = prev[j]
        if best > cap:
            best = cap if cap >= keylen else 0
        return best, boff

    i = 0
    lit_start = 0
    limit = nk  # one past the last position with a full key
    big = n + keylen
    while i < limit:
        cap = (bsize - i % bsize) if bsize else big
        ml, off = find(i, cap)
        if ml < keylen:
            i += 1
            continue
        while ml < lazy_below and i + 1 < limit:
            cap2 = (bsize - (i + 1) % bsize) if bsize else big
            ml2, off2 = find(i + 1, cap2)
            if ml2 > ml:
                i += 1
                ml, off = ml2, off2
            else:
                break
        seqs.append((i - lit_start, ml, off))
        i += ml
        lit_start = i
    return seqs, n - lit_start


def _enc_sequences_block(
    block: bytes,
    reps_in: tuple[int, int, int] = (1, 4, 8),
    seqs: list[tuple[int, int, int]] | None = None,
) -> tuple[bytes, tuple[int, int, int]] | None:
    """One compressed block: Huffman-or-raw literals + predefined-table
    FSE sequences (or a literals-only block when no match pays). None
    when neither beats a raw block.

    ``reps_in`` is the frame's repeat-offset state entering this block
    (the decoder threads it across blocks, `_FrameCtx.reps`); on success
    the updated state is returned alongside the body so the caller can
    commit it — a raw/RLE fallback block leaves the decoder's reps
    untouched, so the caller must NOT advance them on a None return.
    An offset equal to a live repeat slot encodes as offset_value 1-3
    (0-1 extra bits instead of ~log2(offset)) with the exact inverse of
    the decoder's §3.1.1.5 slot rotation, including the lit_len==0
    index shift and the rep1-1 special slot.

    ``seqs``: precomputed (lit_len, match_len, offset) triples whose
    lit_len is block-local (the frame-segment matcher path in
    :func:`zstd_compress`); offsets may reach into EARLIER blocks of
    the frame — the decoder's history is frame-wide. When None, the
    matcher runs block-locally here."""
    if seqs is None:
        seqs, _trailing = _find_sequences(block)
    if len(seqs) > 0x7EFF:
        return None
    if not seqs:
        body = _enc_literals(bytes(block)) + b"\x00"  # nseq = 0
        return (body, tuple(reps_in)) if len(body) < len(block) else None
    lits = bytearray()
    pos = 0
    codes = []
    r1, r2, r3 = reps_in
    for ll, ml, off in seqs:
        lits += block[pos : pos + ll]
        pos += ll + ml
        if ll != 0:
            if off == r1:
                of_val = 1
            elif off == r2:
                of_val = 2
                r1, r2 = r2, r1
            elif off == r3:
                of_val = 3
                r1, r2, r3 = r3, r1, r2
            else:
                of_val = off + 3
                r1, r2, r3 = off, r1, r2
        else:
            if off == r2:
                of_val = 1
                r1, r2 = r2, r1
            elif off == r3:
                of_val = 2
                r1, r2, r3 = r3, r1, r2
            elif off == r1 - 1 and off > 0:
                of_val = 3
                r1, r2, r3 = r1 - 1, r1, r2
            else:
                of_val = off + 3
                r1, r2, r3 = off, r1, r2
        of_code = of_val.bit_length() - 1
        ml_code = _code_of(ml, _ML_BASE)
        ll_code = _code_of(ll, _LL_BASE)
        if of_code > 28:  # predefined offset table is 29 symbols
            return None
        codes.append(
            (
                ll_code, ll - _LL_BASE[ll_code], _LL_BITS[ll_code],
                of_code, of_val - (1 << of_code),
                ml_code, ml - _ML_BASE[ml_code], _ML_BITS[ml_code],
            )
        )
    lits += block[pos:]
    # per-block table choice: predefined / RLE / tuned-FSE per field
    mode_ll, desc_ll, tbl_ll, enc_ll = _choose_seq_table("ll", [c[0] for c in codes])
    mode_of, desc_of, tbl_of, enc_of = _choose_seq_table("of", [c[3] for c in codes])
    mode_ml, desc_ml, tbl_ml, enc_ml = _choose_seq_table("ml", [c[5] for c in codes])
    # ONE fused reverse pass: pick FSE states AND write the bitstream.
    # The decoder reads fields forward (init states, then per seq i:
    # of/ml/ll extras + the state-update fields read after i); the
    # backward-reading format means we emit exactly that list REVERSED —
    # and since state selection also runs i = n-1 .. 0 (state for seq i
    # depends on seq i+1's state), both fuse into one loop with no
    # intermediate states/upd/fields materialization (~9n tuples and 3n
    # method calls on the old path — measured hot at 2 MB frames).
    n = len(seqs)
    alog_ll, alog_of, alog_ml = tbl_ll.alog, tbl_of.alog, tbl_ml.alog
    by_ll, base_ll, nb_ll = enc_ll.by_symbol, enc_ll.table.base, enc_ll.table.nbits
    by_of, base_of, nb_of = enc_of.by_symbol, enc_of.table.base, enc_of.table.nbits
    by_ml, base_ml, nb_ml = enc_ml.by_symbol, enc_ml.table.base, enc_ml.table.nbits
    br = bisect.bisect_right
    acc = 0
    nbits = 0
    out_bits = bytearray()
    nxt_ll = nxt_of = nxt_ml = None
    last = n - 1
    for i in range(last, -1, -1):
        c = codes[i]
        if nxt_ll is None:  # seq n-1: free state choice, no update fields
            x_ll = by_ll[c[0]][1][0]
            x_of = by_of[c[3]][1][0]
            x_ml = by_ml[c[5]][1][0]
        else:
            bases, xs = by_ll[c[0]]
            x_ll = xs[br(bases, nxt_ll) - 1]
            bases, xs = by_of[c[3]]
            x_of = xs[br(bases, nxt_of) - 1]
            bases, xs = by_ml[c[5]]
            x_ml = xs[br(bases, nxt_ml) - 1]
            # update fields, in reverse of the decoder's ll, ml, of reads
            nb = nb_of[x_of]
            acc |= (nxt_of - base_of[x_of]) << nbits
            nbits += nb
            nb = nb_ml[x_ml]
            acc |= (nxt_ml - base_ml[x_ml]) << nbits
            nbits += nb
            nb = nb_ll[x_ll]
            acc |= (nxt_ll - base_ll[x_ll]) << nbits
            nbits += nb
        # extras, in reverse of the decoder's of, ml, ll reads
        acc |= c[1] << nbits
        nbits += c[2]
        acc |= c[6] << nbits
        nbits += c[7]
        acc |= c[4] << nbits
        nbits += c[3]
        while nbits >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        nxt_ll, nxt_of, nxt_ml = x_ll, x_of, x_ml
    # initial states, in reverse of the decoder's ll, of, ml reads
    acc |= nxt_ml << nbits
    nbits += alog_ml
    acc |= nxt_of << nbits
    nbits += alog_of
    acc |= nxt_ll << nbits
    nbits += alog_ll
    acc |= 1 << nbits  # sentinel
    nbits += 1
    while nbits > 0:
        out_bits.append(acc & 0xFF)
        acc >>= 8
        nbits -= 8
    body = bytearray(_enc_literals(bytes(lits)))
    # sequences header
    if n < 128:
        body.append(n)
    else:
        body.append(128 + (n >> 8))
        body.append(n & 0xFF)
    body.append((mode_ll << 6) | (mode_of << 4) | (mode_ml << 2))
    body += desc_ll
    body += desc_of
    body += desc_ml
    body += out_bits
    return (bytes(body), (r1, r2, r3)) if len(body) < len(block) else None


def zstd_compress(data: bytes, checksum: bool = True, level: int = 1) -> bytes:
    """Compressing single-segment frame: chain-matched LZ77 with a
    frame-wide (8 MB-segmented) match window + Huffman-or-raw literals +
    FSE sequences with repeat-offset codes and per-block table choice
    (predefined / RLE / tuned FSE_Compressed_Mode, whichever the entropy
    estimate says is smaller), raw/RLE blocks otherwise — decodable by
    any spec decoder (zstd-jni cross-parity pinned). Measured on the
    sf0.1 JSONL corpus sample (1.4 MB, r9 re-baseline): level 1 = 5.82x
    at 0.85 MB/s (zstd-jni level 3 on the same input: 4.96x).

    ``level`` trades encode time for ratio via the matcher's search depth
    (measured r9, same sample):

    - 1 (default): chain=32, nice=128 — 5.82x, 0.85 MB/s. The bulk-write
      setting; the pipeline's shard writers stay here.
    - 2: chain=128 — 6.20x, 0.59 MB/s (+6.6% ratio for 0.7x speed).
    - 3: chain=256, nice=512 — 6.25x, 0.40 MB/s; archival. (Adding
      one-step lazy matching on top was measured WORSE with deep chains —
      6.23x at 0.22 MB/s — so no level enables it.)

    Measured and REJECTED beyond these (PERF.md r9): a suffix-array exact
    match finder (prefix-doubling + PSV/NSV longest-previous-match) hits
    only 6.17x at 0.28 MB/s — exact-longest greedy equals chain=128, so
    the remaining gap to zstd-jni L19 (6.77x) is optimal-parse PRICING,
    whose per-(position,length) DP is a ~0.05 MB/s proposition in pure
    Python; treeless repeat tables were rejected r8 at a 0.4% ceiling."""
    if level not in (1, 2, 3):
        raise ValueError(f"zstd_compress: level must be 1, 2 or 3, got {level}")
    _knobs = {
        1: dict(chain=32, nice=128),
        2: dict(chain=128, nice=128),
        3: dict(chain=256, nice=512),
    }[level]
    out = bytearray(struct.pack("<I", _MAGIC))
    n = len(data)
    if n < 256 and n != 0:
        fcs_flag, fcs = 0, struct.pack("<B", n)
    elif 256 <= n < 65536 + 256:
        fcs_flag, fcs = 1, struct.pack("<H", n - 256)
    elif n < (1 << 32):
        fcs_flag, fcs = 2, struct.pack("<I", n)
    else:
        fcs_flag, fcs = 3, struct.pack("<Q", n)
    if n == 0:
        fcs_flag, fcs = 0, b"\x00"
    out.append((fcs_flag << 6) | 0x20 | (0x04 if checksum else 0))
    out += fcs
    bsize = 1 << 16
    chunks = range(0, n, bsize) if n else [0]
    last_off = max(chunks) if n else 0
    reps = (1, 4, 8)  # frame repeat-offset state; raw/RLE blocks skip it
    # ONE matcher pass per 8 MB segment (bounds the position-chain memory),
    # matches capped at block boundaries but offsets reaching across them —
    # the single-segment frame's window is the whole frame, so cross-block
    # references are legal and they are where long-range text repeats live
    # (the dominant share of the 2.47x -> 4.16x measured gain: long-range
    # text repeats live across 64 KB boundaries).
    seg_size = 1 << 23
    block_seqs: dict[int, list[tuple[int, int, int]]] = {}
    for seg_start in range(0, n, seg_size):
        seqs, _tr = _find_sequences(
            data[seg_start : seg_start + seg_size], bsize=bsize, **_knobs
        )
        pos = 0
        for ll, ml, off in seqs:
            mstart = pos + ll
            blk_start = mstart - mstart % bsize
            # literals before this match that fall in EARLIER blocks become
            # those blocks' trailing literals; this block's lit_len starts
            # at its own boundary
            block_seqs.setdefault(seg_start + blk_start, []).append(
                (mstart - max(pos, blk_start), ml, off)
            )
            pos = mstart + ml
    for off in chunks:
        body = data[off : off + bsize]
        last = 1 if off == last_off else 0
        res = (
            _enc_sequences_block(body, reps, seqs=block_seqs.get(off, []))
            if len(body) >= 16
            else None
        )
        if res is not None:
            comp, reps = res
            out += struct.pack("<I", last | (2 << 1) | (len(comp) << 3))[:3]
            out += comp
        elif len(body) > 1 and len(set(body)) == 1:
            out += struct.pack("<I", last | (1 << 1) | (len(body) << 3))[:3]
            out.append(body[0])
        else:
            out += struct.pack("<I", last | (0 << 1) | (len(body) << 3))[:3]
            out += body
    if checksum:
        out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Huffman-coded literals (direct-weights description; the ratio rung above
# raw literals for text alphabets)
# ---------------------------------------------------------------------------


def _limited_lengths(freqs: dict[int, int], cap: int = 11) -> dict[int, int]:
    """Huffman code lengths with max length ``cap`` and EXACT Kraft
    equality (the zstd weight scheme needs sum 2^-l == 1): plain
    two-queue Huffman, clamp to cap, then repair Kraft by deepening the
    shallowest codes / shortening the deepest until equality."""
    import heapq

    syms = sorted(freqs)
    if len(syms) < 2:
        raise ValueError("need >= 2 symbols")
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    tick = len(heap)
    lengths = {s: 0 for s in syms}
    while len(heap) > 1:
        fa, _, a = heapq.heappop(heap)
        fb, _, b = heapq.heappop(heap)
        for s in a + b:
            lengths[s] += 1
        heapq.heappush(heap, (fa + fb, tick, a + b))
        tick += 1
    for s in lengths:
        lengths[s] = min(lengths[s], cap)
    unit = 1 << cap
    kraft = sum(unit >> lengths[s] for s in syms)
    while kraft > unit:  # over-subscribed: deepen the cheapest long code
        s = min(
            (s for s in syms if lengths[s] < cap), key=lambda s: freqs[s]
        )
        kraft -= (unit >> lengths[s]) - (unit >> (lengths[s] + 1))
        lengths[s] += 1
    while kraft < unit:  # slack: shorten the most frequent shortenable code
        cands = [
            s for s in syms
            if lengths[s] > 1 and kraft + (unit >> lengths[s]) <= unit
        ]
        if not cands:
            break
        s = max(cands, key=lambda s: freqs[s])
        kraft += unit >> lengths[s]
        lengths[s] = lengths[s] - 1
    if kraft != unit:
        raise AssertionError("Kraft repair failed")
    return lengths


class _FwdWriter:
    """Forward LSB-first bit writer (the encode mirror of _FwdBits) for
    FSE table descriptions."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _write_fse_counts(counts: list[int], alog: int) -> bytes:
    """Normalized-count stream writer (§4.1.1) — exact mirror of
    _read_fse_counts: variable-bit threshold coding with 2-bit zero-repeat
    flags, byte-padded. ``counts`` must sum to 1 << alog (no -1 entries;
    the encoder's normalizer never emits less-than-one probabilities)."""
    w = _FwdWriter()
    w.write(alog - 5, 4)
    remaining = (1 << alog) + 1
    s = 0
    while remaining > 1:
        bits = remaining.bit_length()
        low_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - remaining
        proba = counts[s]
        t = proba + 1
        if t < threshold:
            w.write(t, bits - 1)
        elif t <= low_mask:
            w.write(t, bits)
        else:
            w.write(t + threshold, bits)
        remaining -= proba
        s += 1
        if proba == 0:
            # count the zeros that follow, up to the last symbol the
            # decoder will still ask for (remaining > 1 keeps it reading)
            z = 0
            while s + z < len(counts) and counts[s + z] == 0:
                z += 1
            while True:
                rep = min(z, 3)
                w.write(rep, 2)
                z -= rep
                s += rep
                if rep < 3:
                    break
    return w.finish()


def _normalize_weight_counts(freq: dict[int, int], alog: int) -> list[int]:
    """Exact-sum normalization of weight-symbol frequencies to FSE counts:
    every present symbol gets >= 1, no count exceeds HALF the table (a
    count > size/2 creates zero-bit decoder states, which would break the
    open-ended two-state stop condition _fse_decode_open relies on), and
    the counts sum to exactly 1 << alog. Needs >= 2 distinct symbols."""
    size = 1 << alog
    cap = size >> 1
    total = sum(freq.values())
    syms = sorted(freq)
    counts = {s: min(cap, max(1, (freq[s] * size) // total)) for s in syms}
    diff = size - sum(counts.values())
    while diff > 0:
        s = max(
            (s for s in syms if counts[s] < cap),
            key=lambda s: freq[s] / counts[s],
        )
        counts[s] += 1
        diff -= 1
    while diff < 0:
        s = min(
            (s for s in syms if counts[s] > 1),
            key=lambda s: freq[s] / counts[s],
        )
        counts[s] -= 1
        diff += 1
    out = [0] * (max(syms) + 1)
    for s in syms:
        out[s] = counts[s]
    return out


def _fse_weights_desc(weights: list[int]) -> bytes | None:
    """FSE-compressed Huffman_Tree_Description payload (§4.2.1.2): the
    weight run encoded as a two-interleaved-state FSE bitstream preceded
    by its own table description. Returns the payload WITHOUT the header
    byte (the caller prepends len(payload), which must be < 128), or None
    when this form is impossible (degenerate weight alphabet) or does not
    fit the 127-byte ceiling. The decode table is built by the SAME
    _fse_from_counts the decoder uses, so encode/decode cannot drift."""
    n = len(weights)
    freq: dict[int, int] = {}
    for v in weights:
        freq[v] = freq.get(v, 0) + 1
    if n < 2 or len(freq) < 2:
        return None
    alog = 6
    counts = _normalize_weight_counts(freq, alog)
    table = _fse_from_counts(counts, alog)
    enc = _FseEncoder(table)
    states = [0] * n
    upd: list[tuple[int, int]] = [(0, 0)] * max(0, n - 2)
    for i in range(n - 1, -1, -1):
        nxt = states[i + 2] if i + 2 < n else None
        x, v, nb = enc.state_for(weights[i], nxt)
        states[i] = x
        if nxt is not None:
            upd[i] = (v, nb)
    # decoder-read order: state1, state2, then updates interleaved
    fields = [(states[0], alog), (states[1], alog)] + upd
    acc = 0
    nbits = 0
    stream = bytearray()
    for v, nb in reversed(fields):
        acc |= v << nbits
        nbits += nb
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    acc |= 1 << nbits  # sentinel
    nbits += 1
    while nbits > 0:
        stream.append(acc & 0xFF)
        acc >>= 8
        nbits -= 8
    payload = _write_fse_counts(counts, alog) + bytes(stream)
    return payload if len(payload) < 128 else None


def _huf_encode_table(
    lengths: dict[int, int],
) -> tuple[bytes, dict[int, tuple[int, int]]] | None:
    """(tree-description bytes, symbol → (code, nbits)) for the EXACT
    table the decoder reconstructs — codes are read back off
    _huf_from_weights so encode/decode can't drift. Picks the smaller of
    the direct-4-bit-weights form (symbols 0..128 only) and the
    FSE-compressed-weights form (§4.2.1.2, any byte alphabet — EXCEPT the
    degenerate single-distinct-weight-value table, where
    _fse_weights_desc returns None because an FSE table needs >= 2
    symbols; a >128-symbol alphabet whose weights all coincide therefore
    yields no candidate here and the caller falls back to raw literals);
    None when neither form can describe the table."""
    last = max(lengths)
    maxbits = max(lengths.values())
    weights = [
        (maxbits + 1 - lengths[s]) if s in lengths else 0 for s in range(last)
    ]
    candidates: list[bytes] = []
    if last <= 128:
        nw = last
        direct = bytearray([127 + nw])
        for i in range(0, nw, 2):
            hi = weights[i] << 4
            lo = weights[i + 1] if i + 1 < nw else 0
            direct.append(hi | lo)
        candidates.append(bytes(direct))
    fse_payload = _fse_weights_desc(weights)
    if fse_payload is not None:
        candidates.append(bytes([len(fse_payload)]) + fse_payload)
    if not candidates:
        return None
    desc = min(candidates, key=len)
    table = _huf_from_weights(weights)
    codes: dict[int, tuple[int, int]] = {}
    i = 0
    size = 1 << table.tlog
    while i < size:
        s, nb = table.symbol[i], table.nbits[i]
        run = 1 << (table.tlog - nb)
        codes[s] = (i >> (table.tlog - nb), nb)
        i += run
    return desc, codes


def _huf_stream(codes: dict[int, tuple[int, int]], chunk: bytes) -> bytes:
    acc = 0
    nbits = 0
    out = bytearray()
    for b in reversed(chunk):  # fields reversed = decoder reads in order
        v, nb = codes[b]
        acc |= v << nbits
        nbits += nb
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    acc |= 1 << nbits
    nbits += 1
    while nbits > 0:
        out.append(acc & 0xFF)
        acc >>= 8
        nbits -= 8
    return bytes(out)


def _enc_literals(lits: bytes) -> bytes:
    """Literals section: Huffman-compressed (type 2, direct- or
    FSE-described weights, 1- or 4-stream) when it pays, else raw."""
    regen = len(lits)
    raw = bytes(
        [0 | (3 << 2) | ((regen & 0xF) << 4), (regen >> 4) & 0xFF,
         (regen >> 12) & 0xFF]
    ) + lits
    freqs: dict[int, int] = {}
    for b in lits:
        freqs[b] = freqs.get(b, 0) + 1
    if len(freqs) < 2 or regen < 64:
        return raw
    enc_table = _huf_encode_table(_limited_lengths(freqs))
    if enc_table is None:  # degenerate weight alphabet, FSE form oversize
        return raw
    desc, codes = enc_table
    if regen <= 1023:
        stream = _huf_stream(codes, lits)
        comp = len(desc) + len(stream)
        if comp >= 1 << 10 or comp + 3 >= len(raw):
            return raw
        hdr = 2 | (0 << 2) | (regen << 4) | (comp << 14)
        return hdr.to_bytes(3, "little") + desc + stream
    per = (regen + 3) // 4
    chunks = [lits[0:per], lits[per : 2 * per], lits[2 * per : 3 * per],
              lits[3 * per :]]
    streams = [_huf_stream(codes, c) for c in chunks]
    jump = struct.pack("<HHH", len(streams[0]), len(streams[1]), len(streams[2]))
    comp = len(desc) + 6 + sum(len(t) for t in streams)
    if comp >= 1 << 18 or regen >= 1 << 18 or comp + 5 >= len(raw):
        return raw
    if any(len(t) > 0xFFFF for t in streams[:3]):
        return raw
    hdr = 2 | (3 << 2) | (regen << 4) | (comp << 22)
    return hdr.to_bytes(5, "little") + desc + jump + b"".join(streams)
