"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Model: a multimodal asset is `binary` payload + a metadata struct
(modality, mime, width/height/duration, checksum). Decode / feature-extract
/ resize / frame-sample run as Arrow-batched `mapInPandas` transforms —
the Spark-side plumbing (schemas, batch shapes, partitioning) is real and
tested. The codec behind the `Codec` seam is REAL for
PNG/BMP/WAV/JPEG/GIF (`llm.media_codecs.PixelCodec` — from-spec decoders
incl. a baseline T.81 JPEG decoder, javax.imageio cross-parity) and for
video containers (`llm.avi` RIFF/AVI with DIB + MJPEG streams, `llm.mp4`
ISO BMFF sample tables); only compressed video bitstreams (H.264/HEVC)
stay behind the seam. `FakeCodec` remains the deterministic stand-in for
pipeline-shape tests.

Scale: payloads never enter a shuffle — all transforms are map-side; the
metadata struct is the only thing aggregations touch. Partition sizing comes
from `spark.sql.files.maxPartitionBytes`; with ~MB-scale payloads prefer
writing assets with a monotonically-bucketed key so file splits stay
balanced.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


class Codec:
    """Decode hook. Real deployments plug in PIL/ffmpeg here; this container
    has neither, so `decode` raises unless a fake is supplied."""

    def decode(self, payload: bytes, modality: str) -> object:
        raise NotImplementedError(
            "media codecs unavailable in this environment; "
            "inject a Codec with a real or fake decode()"
        )


class FakeCodec(Codec):
    """Deterministic stand-in: 'decodes' a payload to an 8-float signature
    derived from byte statistics — stable across runs, good enough to test
    the full pipeline shape."""

    def decode(self, payload: bytes, modality: str) -> list[float]:
        if not payload:
            return [0.0] * 8
        n = len(payload)
        return [
            float(n),
            float(payload[0]),
            float(payload[-1]),
            float(sum(payload) % 997),
            float(max(payload)),
            float(min(payload)),
            float(payload[n // 2]),
            float(n % 251),
        ]


def attach_asset_meta(df: DataFrame, payload_col: str, modality: str, mime: str) -> DataFrame:
    """Wrap a binary column with the typed metadata struct (checksum computed
    JVM-side)."""
    return df.withColumn(
        "asset_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.sha2(F.col(payload_col), 256).alias("sha256"),
        ),
    )


def extract_features(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    modality: str = "image",
    codec: Codec | None = None,
    batch_hint: int = 256,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    The returned plan is a single map stage: each Arrow batch of
    (id, payload) rows is decoded and emitted as FEATURE_SCHEMA rows."""
    codec = codec or Codec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                codec.decode(p if p is not None else b"", modality)
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "modality": modality,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf[payload_col]],
                    "feature": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    every_ms: int = 1000,
    codec: Codec | None = None,
) -> DataFrame:
    """Video frame sampling shape: emits one row per sampled frame. Stubbed
    decode — the fake emits max(1, floor(n_bytes / 10_000)) pseudo-frames so
    the 1→N row-explosion plumbing is real."""
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )
    codec = codec or FakeCodec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = payload or b""
                n_frames = max(1, len(payload) // 10_000)
                for i in range(n_frames):
                    rows.append(
                        (
                            int(aid),
                            i,
                            i * every_ms,
                            codec.decode(payload[i::n_frames], "video"),
                        )
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "ts_ms", "feature"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    width: int,
    height: int,
    codec: Codec | None = None,
) -> DataFrame:
    """Image resize shape: payload → payload map with refreshed metadata.
    The real deployment decodes, resizes, re-encodes inside the Arrow batch;
    the stub 'resize' deterministically re-samples the byte stream to a
    length proportional to the target area, so the payload-in/payload-out
    plumbing (binary columns through Arrow, metadata refresh, map-only plan)
    is real and testable."""
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for payload in pdf[payload_col]:
                payload = payload or b""
                target = max(1, (width * height) // 64)
                if len(payload) >= target:
                    step = max(1, len(payload) // target)
                    out_payloads.append(bytes(payload[::step][:target]))
                else:
                    reps = target // max(1, len(payload)) + 1
                    out_payloads.append((payload * reps)[:target] if payload else b"\x00" * target)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "payload": out_payloads,
                    "width": width,
                    "height": height,
                    "n_bytes": [len(p) for p in out_payloads],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def dedup_assets(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Exact asset-level dedup for binary columns: group payloads by sha256
    content hash, report copy counts and the canonical (minimum-id) keeper —
    the multimodal sibling of ``llm.dedup.exact_dedup``. The hash is
    computed MAP-SIDE so the shuffle carries a 32-byte digest per row, never
    the payload (at 100 TB of images, shuffling bytes would dominate
    everything else)."""
    return (
        df.select(id_col, F.sha2(F.col(payload_col), 256).alias("sha"))
        .groupBy("sha")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("canonical_id"),
        )
    )
