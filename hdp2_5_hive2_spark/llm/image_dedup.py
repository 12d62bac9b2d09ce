"""Perceptual image near-duplicate detection: dHash + banded pair join.

The image sibling of the text near-dedup family (`llm/dedup.py` MinHash/
SimHash): crawled image corpora are full of re-encoded / resized /
slightly-cropped duplicates that byte-level hashing misses. dHash
(difference hash — public algorithm: grayscale, shrink to (w+1)×h,
compare horizontal neighbors) is the standard cheap perceptual
fingerprint: re-encoding and mild resizing preserve most of the 64 bits,
so near-duplicates sit at small Hamming distance.

Pair generation follows the same pigeonhole discipline as SimHash
(`llm/dedup.py`): the 64 bits split into 4 bands of 16; two hashes within
Hamming distance ≤ 3·k/4-ish must agree on at least one band
(pigeonhole: d < 4 guarantees a shared band; larger thresholds trade
recall), so candidates come from a bucket JOIN on (band_idx, band_value)
— never an all-pairs product. At 100 TB: the decode+hash pass is
map-side Arrow batches (payloads never shuffle); the only shuffle is the
16-bit-key bucket join on 4 rows per image, and the Hamming filter runs
JVM-side (``bit_count(xor)``) on the candidates only.

Bands are kept as four 16-bit ints rather than one 64-bit value so every
engine (Spark, DuckDB oracles, parquet stats) handles them as small
positive integers — no signed-overflow edge at bit 63.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from hdp2_5_hive2_spark.llm.text import plan_checkpoint

__all__ = ["dhash_bands", "image_dhash", "dhash_near_dup_pairs", "hamming_matrix"]

_POP16 = None


def hamming_matrix(kept: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Hamming distances between one 4-band hash ``h`` (shape (4,)) and a
    keeper matrix (K, 4) — vectorized via a 16-bit popcount LUT (64 KB,
    built once per process), the streaming gate's per-bucket scan."""
    global _POP16
    if _POP16 is None:
        _POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)
    return _POP16[(kept ^ h).astype(np.int64)].sum(axis=1)


def dhash_bands(gray: np.ndarray) -> tuple[int, int, int, int]:
    """dHash over an 8-row × 9-column grayscale array → four 16-bit
    bands. Band i covers rows 2i and 2i+1; within a band, bit index =
    (y%2)*8 + x for the comparison gray[y,x] < gray[y,x+1]."""
    if gray.shape != (8, 9):
        raise ValueError(f"dhash_bands expects (8, 9) gray input, got {gray.shape}")
    bits = (gray[:, :-1] < gray[:, 1:]).astype(np.int64)  # (8, 8)
    weights = 1 << np.arange(8, dtype=np.int64)
    rows = bits @ weights  # (8,) row values 0..255
    return tuple(int(rows[2 * i] + (rows[2 * i + 1] << 8)) for i in range(4))


def _to_gray_9x8(payload: bytes) -> np.ndarray:
    """Decode any supported still-image payload and shrink to the dHash
    grid: integer luma (299/587/114 — the public ITU-R 601 weights, exact
    integer arithmetic so every run agrees), nearest-neighbor resample."""
    from hdp2_5_hive2_spark.llm.media_codecs import (
        _sniff, bmp_decode, gif_decode, png_decode, resize_nearest,
    )

    kind = _sniff(payload)
    if kind == "jpeg":
        from hdp2_5_hive2_spark.llm.jpeg import jpeg_decode

        px = jpeg_decode(payload)
    elif kind in ("png", "bmp", "gif"):
        px = {"png": png_decode, "bmp": bmp_decode, "gif": gif_decode}[kind](payload)
    else:
        raise ValueError(f"image_dhash: unsupported payload (sniffed {kind!r})")
    if px.ndim == 3 and px.shape[2] >= 3:
        a = px.astype(np.int64)
        gray = (a[:, :, 0] * 299 + a[:, :, 1] * 587 + a[:, :, 2] * 114) // 1000
    else:
        gray = px.reshape(px.shape[0], px.shape[1]).astype(np.int64)
    return resize_nearest(gray, 9, 8)


def image_dhash(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """(id, b0..b3) per image — one Arrow map pass, payloads never
    shuffle. Output bands are 0..65535 ints."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = {"__id": [], "b0": [], "b1": [], "b2": [], "b3": []}
            for i, payload in zip(pdf["__id"], pdf[payload_col]):
                bands = dhash_bands(_to_gray_9x8(bytes(payload)))
                out["__id"].append(i)
                for j in range(4):
                    out[f"b{j}"].append(bands[j])
            yield pd.DataFrame(out)

    return (
        df.select(F.col(id_col).alias("__id"), payload_col)
        .mapInPandas(run, "__id long, b0 int, b1 int, b2 int, b3 int")
        .withColumnRenamed("__id", id_col)
    )


def dhash_near_dup_pairs(
    hashes: DataFrame, id_col: str, max_hamming: int = 6,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, hamming) from a (id, b0..b3) frame.

    Candidates: bucket join on any shared band (explode to 4 rows/image,
    groupBy-join on (band_idx, value)); exact Hamming filter runs
    JVM-side via bit_count(xor). Recall note: pigeonhole guarantees every
    pair with hamming ≤ 3 shares a band; beyond that this is the same
    recall trade SimHash blocking makes (documented, mirrored in
    oracles). Scale: one shuffle on the 16-bit band keys; ``max_bucket``
    drops band buckets holding more than that many images (flat/boilerplate
    imagery all hashing alike — the llm_fingerprint_overlap hot-bucket
    discipline: bounds the self-join fan-out at max_bucket² per bucket,
    trading away only pairs whose EVERY shared band is degenerate)."""
    bands = hashes.select(
        F.col(id_col).alias("_id"), "b0", "b1", "b2", "b3",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band"), F.col(f"b{i}").alias("val"))
                for i in range(4)
            ])
        ).alias("bv"),
    ).select("_id", "b0", "b1", "b2", "b3", "bv.band", "bv.val").transform(
        # bands self-joins below; without materialization the entire
        # upstream (payload decode + dHash Arrow passes) is planned and
        # executed once per join side (guide §3.3).
        plan_checkpoint
    )
    if max_bucket is not None:
        from pyspark.sql import Window

        bands = (
            bands.withColumn(
                "_bn", F.count("*").over(Window.partitionBy("band", "val"))
            )
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
            *[F.col(f"a.b{i}").alias(f"a{i}") for i in range(4)],
            *[F.col(f"b.b{i}").alias(f"bb{i}") for i in range(4)],
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = sum(
        F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"bb{i}"))) for i in range(4)
    )
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
