"""Distributed video-frame indexing and extraction over AVI/MP4 files.

The 100 TB shape for video ingest is a two-stage plan, both stages
map-side:

1. `video_frame_index` — each task probes its files with the seek-based
   container probes (`llm.avi.avi_probe` / `llm.mp4.mp4_probe`): only box
   headers, sample tables and the idx1/moov metadata are read (kilobytes
   per multi-GB file; see the byte-budget test), producing one row per
   frame: (path, container, codec, width, height, frame_idx, offset,
   length, ts_ms). The index is an ordinary DataFrame — filter it with
   Catalyst (every Nth frame, a time range, size outliers) BEFORE any
   payload byte moves.
2. `read_video_frames` — takes the (filtered) index and performs one
   bounded pread per surviving frame, optionally decoding DIB/MJPEG
   payloads into the shared 8-float image feature.

Like `storage.rcfile.read_rcfile_split`, stage 2 requires worker-local
`open()` (local FS / NFS / fuse mounts); an object store would swap the
pread for a ranged GET — the (offset, length) contract is already exactly
that. Files are distributed across tasks via `spark.createDataFrame` on
the path list + repartition, so a million-file corpus fans out to the
cluster; no payload ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["video_frame_index", "read_video_frames"]

_INDEX_SCHEMA = (
    "path string, container string, codec string, width int, height int, "
    "n_frames int, frame_idx int, offset bigint, length bigint, ts_ms bigint"
)


def _probe_one(path: str):
    with open(path, "rb") as fh:
        magic = fh.read(12)
        fh.seek(0)
        if magic[:4] == b"RIFF" and magic[8:12] == b"AVI ":
            from hdp2_5_hive2_spark.llm.avi import avi_probe

            st, ranges = avi_probe(fh)
            return [
                ("avi", st.compression, st.width, st.height, len(ranges),
                 i, off, ln, ts)
                for i, (off, ln, ts) in enumerate(ranges)
            ]
        if magic[4:8] == b"ftyp":
            from hdp2_5_hive2_spark.llm.mp4 import mp4_probe

            tracks = mp4_probe(fh)
            if not tracks:
                raise ValueError(f"no video track: {path}")
            t = tracks[0]
            return [
                ("mp4", t.codec, t.width, t.height, t.n_samples,
                 i, t.sample_offsets[i], t.sample_sizes[i], t.ts_ms(i))
                for i in range(t.n_samples)
            ]
        raise ValueError(f"not an AVI/MP4 container: {path}")


def video_frame_index(
    spark: SparkSession, paths: list[str], parallelism: int | None = None
) -> DataFrame:
    """One row per video frame across ``paths``, from metadata-only
    probes. Listing is the caller's job (glob, catalog, manifest) — a
    100 TB corpus hands in a manifest DataFrame's collected path column
    or calls this per-batch."""
    import pandas as pd

    pdf = spark.createDataFrame([(p,) for p in paths], "path string")
    if parallelism:
        pdf = pdf.repartition(parallelism)

    def run(batches):
        for b in batches:
            rows = []
            for path in b["path"]:
                for row in _probe_one(path):
                    rows.append((path, *row))
            yield pd.DataFrame(
                rows,
                columns=["path", "container", "codec", "width", "height",
                         "n_frames", "frame_idx", "offset", "length", "ts_ms"],
            )

    return pdf.mapInPandas(run, _INDEX_SCHEMA)


def read_video_frames(
    index: DataFrame, decode: bool = True
) -> DataFrame:
    """Ranged payload reads over a (filtered) frame index. With
    ``decode=True``, DIB and MJPEG payloads become the shared 8-float
    image feature; with ``decode=False`` the raw payload bytes are
    emitted (codec-agnostic extraction, AVC/HEVC included). One pread per
    frame, grouped by path within each Arrow batch so a file opens once
    per batch it appears in; sort the index by path first to co-locate."""
    import pandas as pd

    out_cols = (
        "path string, frame_idx int, ts_ms bigint, "
        + ("feature array<float>" if decode else "payload binary")
    )

    def run(batches):
        import numpy as np

        from hdp2_5_hive2_spark.llm.avi import _dib_decode
        from hdp2_5_hive2_spark.llm.media_codecs import _image_feature

        for b in batches:
            rows = []
            for path, grp in b.groupby("path", sort=False):
                with open(path, "rb") as fh:
                    for r in grp.itertuples():
                        fh.seek(int(r.offset))
                        payload = fh.read(int(r.length))
                        if len(payload) < int(r.length):
                            raise ValueError(
                                f"truncated frame read: {path}@{r.offset}"
                            )
                        if not decode:
                            rows.append((path, r.frame_idx, r.ts_ms, payload))
                            continue
                        codec = r.codec.upper()
                        if codec == "DIB":
                            px = _dib_decode(payload, int(r.width), int(r.height))
                        elif codec in ("MJPG", "JPEG", "MJPA"):
                            from hdp2_5_hive2_spark.llm.jpeg import jpeg_decode

                            px = jpeg_decode(payload)
                            if px.ndim == 2:
                                px = np.repeat(px[:, :, None], 3, axis=2)
                        else:
                            raise ValueError(
                                f"no from-spec decoder for codec {r.codec!r}; "
                                "use decode=False for raw extraction"
                            )
                        rows.append((path, r.frame_idx, r.ts_ms, _image_feature(px)))
            yield pd.DataFrame(
                rows,
                columns=["path", "frame_idx", "ts_ms",
                         "feature" if decode else "payload"],
            )

    cols = ["path", "codec", "width", "height", "frame_idx", "offset", "length", "ts_ms"]
    return index.select(*cols).mapInPandas(run, out_cols)
