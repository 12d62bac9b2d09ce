"""WebDataset-style tar shards: the PyTorch-loader exchange format.

Modern training stacks stream samples from tar shards where one SAMPLE
is a group of adjacent members sharing a basename key with different
extensions (`000017.jpg`, `000017.txt`, `000017.json`, …) — the public
WebDataset convention. A Spark-side pipeline needs both directions:

- `read_webdataset`: shard paths fan out one-task-per-shard; members
  group by key map-side into (key, {ext: payload}) rows. Keys follow
  the convention's rule: everything up to the FIRST dot is the key, the
  rest is the extension (so `a.seg.png` groups under `a` with ext
  `seg.png`). POSIX tar parsing is stdlib.
- `write_webdataset`: deterministic sharded export — rows are md5-hash
  routed to `shard-%05d.tar` files (same stable-routing discipline as
  `curation.balanced_shards`), each written by ITS OWN task via
  `partitionBy`-free foreachPartition-style mapInPandas, one tar per
  shard, members in key order for reproducible bytes (fixed mtime).

Scale: a shard is the parallelism unit exactly as the loader consumes
it; no payload ever reaches the driver, and the writer's shuffle is the
one hash-partition that routing requires. Corrupt shards raise
ValueError (stdlib ReadError converted), matching the container
contract everywhere else.
"""

from __future__ import annotations

import io
import tarfile

__all__ = ["read_webdataset", "write_webdataset", "build_shard", "parse_shard"]


def parse_shard(data: bytes) -> list[tuple[str, dict[str, bytes]]]:
    """Tar bytes → [(key, {ext: payload}), …] in first-seen key order."""
    try:
        tf = tarfile.open(fileobj=io.BytesIO(data))
        samples: dict[str, dict[str, bytes]] = {}
        order: list[str] = []
        for m in tf.getmembers():
            if not m.isfile():
                continue
            name = m.name.rsplit("/", 1)[-1]
            if "." in name:
                key, ext = name.split(".", 1)
            else:
                key, ext = name, ""
            if key not in samples:
                samples[key] = {}
                order.append(key)
            samples[key][ext] = tf.extractfile(m).read()
    except (tarfile.TarError, OSError, EOFError) as exc:
        raise ValueError(f"webdataset shard corrupt: {exc}") from None
    return [(k, samples[k]) for k in order]


def build_shard(samples: list[tuple[str, dict[str, bytes]]]) -> bytes:
    """[(key, {ext: payload})] → deterministic tar bytes (sorted members
    within each sample, zero mtime — byte-stable across runs)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for key, parts in samples:
            for ext in sorted(parts):
                name = f"{key}.{ext}" if ext else key
                info = tarfile.TarInfo(name)
                info.size = len(parts[ext])
                info.mtime = 0
                tf.addfile(info, io.BytesIO(parts[ext]))
    return buf.getvalue()


def read_webdataset(spark, paths: list[str], parallelism: int | None = None):
    """(path, key, ext, payload) rows across shards — one task per
    shard, grouped map-side. Pivot to one-row-per-sample with
    ``groupBy(key).pivot/map_from_entries`` downstream if needed; the
    long form keeps payloads out of wide rows."""
    import pandas as pd

    pdf = spark.createDataFrame([(p,) for p in paths], "path string")
    if parallelism:
        pdf = pdf.repartition(parallelism)

    def run(batches):
        for b in batches:
            rows = []
            for path in b["path"]:
                with open(path, "rb") as fh:
                    for key, parts in parse_shard(fh.read()):
                        for ext, payload in parts.items():
                            rows.append((path, key, ext, payload))
            yield pd.DataFrame(rows, columns=["path", "key", "ext", "payload"])

    return pdf.mapInPandas(
        run, "path string, key string, ext string, payload binary"
    )


def write_webdataset(
    df, out_dir: str, n_shards: int, key_col: str = "key",
    ext_col: str = "ext", payload_col: str = "payload",
):
    """Deterministic sharded export: samples route to shards by md5(key)
    (stable across runs and cluster sizes — the balanced_shards
    discipline), one output tar per shard written by the task that owns
    it. Returns (shard_path, n_samples, n_bytes) rows."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    routed = df.withColumn(
        "_shard",
        (F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
         % n_shards).cast("int"),
    ).repartition(n_shards, "_shard")

    def run(batches):
        acc: dict[int, dict[str, dict[str, bytes]]] = {}
        for b in batches:
            for shard, key, ext, payload in zip(
                b["_shard"], b[key_col], b[ext_col], b[payload_col]
            ):
                acc.setdefault(int(shard), {}).setdefault(str(key), {})[
                    str(ext)
                ] = bytes(payload)
        rows = []
        os.makedirs(out_dir, exist_ok=True)
        for shard, samples in acc.items():
            blob = build_shard(sorted(samples.items()))
            path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
            with open(path, "wb") as fh:
                fh.write(blob)
            rows.append((path, len(samples), len(blob)))
        yield pd.DataFrame(rows, columns=["shard_path", "n_samples", "n_bytes"])

    return routed.select("_shard", key_col, ext_col, payload_col).mapInPandas(
        run, "shard_path string, n_samples bigint, n_bytes bigint"
    )
