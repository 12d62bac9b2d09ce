"""Distributed video-frame indexing and extraction over AVI/MP4/WebM files.

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

__all__ = [
    "video_frame_index",
    "read_video_frames",
    "VideoFramesDataSource",
    "read_video_frames_ds",
]

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

            tracks = [t for t in mp4_probe(fh) if t.handler == "vide"]
            if not tracks:
                raise ValueError(f"no video track: {path}")
            t = tracks[0]
            return [
                ("mp4", t.codec, t.width, t.height, t.n_samples,
                 i, t.sample_offsets[i], t.sample_sizes[i], t.ts_ms(i))
                for i in range(t.n_samples)
            ]
        if magic[:4] == b"\x1aE\xdf\xa3":
            from hdp2_5_hive2_spark.llm.webm import webm_probe

            fh.seek(0)
            t = webm_probe(fh)
            return [
                ("webm", t.codec, t.width, t.height, len(t.frames),
                 i, off, ln, t.ts_ms(i))
                for i, (off, ln, _) in enumerate(t.frames)
            ]
        raise ValueError(f"not an AVI/MP4/WebM container: {path}")


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
                        elif codec in ("MJPG", "JPEG", "MJPA", "V_MJPEG"):
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


# ---------------------------------------------------------------------------
# videoframes as a registered Spark data source (PySpark 4 Python
# DataSource API, same pattern as storage/rcfile_datasource.py)
# ---------------------------------------------------------------------------

import os as _os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _VideoFile(InputPartition):
    """One asset file (pickled to executors; probing happens there)."""

    def __init__(self, path: str):
        self.path = path


class VideoFramesDataSource(DataSource):
    """``spark.read.format("videoframes").load(path)`` — one row per video
    frame across a file or directory of AVI/MP4/WebM assets.

    Options:
      ``every_n``  keep frames with frame_idx % every_n == 0, applied at
                   the FORMAT layer: skipped frames are never pread —
                   with the seek-based probes this is the ranged-access
                   sampling path, not a post-filter
      ``decode``   "none" (default: raw ``payload`` binary column — any
                   codec) or "feature" (8-float image feature; DIB/MJPEG
                   tracks only)

    Planning emits one InputPartition per FILE; container probing happens
    on the EXECUTOR inside read(), so a million-file corpus plans without
    the driver touching any file (intra-file frame parallelism, when one
    asset dominates, is `video_frame_index`'s job). Deliberately no
    pushFilters: see rcfile_datasource.py's scan-reuse note.
    """

    @classmethod
    def name(cls):
        return "videoframes"

    def schema(self):
        tail = (
            "feature array<float>"
            if self.options.get("decode", "none") == "feature"
            else "payload binary"
        )
        return (
            "path string, container string, codec string, width int, "
            "height int, frame_idx int, ts_ms bigint, " + tail
        )

    def reader(self, schema):
        return _VideoFramesReader(schema, self.options)


class _VideoFramesReader(DataSourceReader):
    def __init__(self, schema, options):
        self._options = options

    def partitions(self):
        path = self._options["path"]
        if _os.path.isdir(path):
            files = sorted(
                p
                for f in _os.listdir(path)
                if not f.startswith((".", "_"))
                and _os.path.isfile(p := _os.path.join(path, f))
            )
        else:
            files = [path]
        return [_VideoFile(f) for f in files] or [_VideoFile("")]

    def read(self, partition):
        if not partition.path:
            return
        every_n = int(self._options.get("every_n", 1))
        decode = self._options.get("decode", "none") == "feature"
        yield from _frame_rows(partition.path, every_n, decode)


def _frame_rows(path: str, every_n: int, decode: bool):
    """Executor-side: probe one file, pread every_n-th frame, optionally
    decode into the shared image feature."""
    rows = _probe_one(path)
    with open(path, "rb") as fh:
        for (cont, cdc, w, h, _n, i, off, ln, ts) in rows:
            if i % every_n:
                continue
            fh.seek(off)
            payload = fh.read(ln)
            if len(payload) < ln:
                raise ValueError(f"truncated frame read: {path}@{off}")
            if not decode:
                yield (path, cont, cdc, w, h, i, ts, payload)
                continue
            import numpy as np

            from hdp2_5_hive2_spark.llm.media_codecs import _image_feature

            cu = cdc.upper()
            if cu == "DIB":
                from hdp2_5_hive2_spark.llm.avi import _dib_decode

                px = _dib_decode(payload, w, h)
            elif cu in ("MJPG", "JPEG", "MJPA", "V_MJPEG"):
                from hdp2_5_hive2_spark.llm.jpeg import jpeg_decode

                px = jpeg_decode(payload)
                if px.ndim == 2:
                    px = np.repeat(px[:, :, None], 3, axis=2)
            else:
                raise ValueError(
                    f"no from-spec decoder for codec {cdc!r}; use decode=none"
                )
            yield (path, cont, cdc, w, h, i, ts, _image_feature(px))


def read_video_frames_ds(
    spark: SparkSession, path: str, every_n: int = 1, decode: bool = False
) -> DataFrame:
    """Register (idempotent) + load the videoframes source."""
    try:
        spark.dataSource.register(VideoFramesDataSource)
    except Exception:
        pass  # already registered in this session
    return (
        spark.read.format("videoframes")
        .option("every_n", str(every_n))
        .option("decode", "feature" if decode else "none")
        .load(path)
    )
