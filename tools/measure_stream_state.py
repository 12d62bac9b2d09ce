"""Measure the streaming MinHash gate's state-store footprint at sf0.1
scale (VERDICT r6 #7): land the sf0.1 documents table as .jsonl.zst shards,
drive them through the jsonlshardstream source into
streaming_minhash_dedup, and report state rows / bytes per keeper from the
query's own state-operator metrics plus the on-disk checkpoint bytes.

Usage: python tools/measure_stream_state.py [sf_dir] [--rocksdb]
Prints one JSON line per gate. --rocksdb switches the session to the
RocksDB state-store provider (rocksdbjni ships in this container) and
reports the RocksDB-specific progress metrics alongside disk bytes.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import sys
import tempfile

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _finish(q, timeout_s: int = 600):
    """Await the availableNow query and return its last progress, failing
    LOUDLY on timeout: awaitTermination(t) returns False when the query is
    still running, and lastProgress can then be None (or lack
    'stateOperators'), which would otherwise surface as an opaque
    TypeError far from the cause."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"streaming query did not finish within {timeout_s}s "
            f"(status: {q.status})"
        )
    prog = q.lastProgress
    if not prog or not prog.get("stateOperators"):
        raise RuntimeError(
            f"query finished but reported no state-operator progress: {prog}"
        )
    return prog


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    rocksdb = "--rocksdb" in sys.argv
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.llm.corpus_shards import build_jsonl_shard
    from hdp2_5_hive2_spark.llm.shards_datasource import JsonlShardsStreamSource
    from hdp2_5_hive2_spark.session import get_session
    from hdp2_5_hive2_spark.streaming.corpus import (
        resolve_dup_verdicts,
        streaming_minhash_dedup,
    )

    extra = (
        {
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            )
        }
        if rocksdb
        else None
    )
    spark = get_session(app_name="stream-state-probe", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    rows = [
        {"doc_id": int(i), "text": str(t)}
        for i, t in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    ]
    work = pathlib.Path(tempfile.mkdtemp(prefix="stream_state_"))
    try:
        land = work / "landing"
        land.mkdir()
        shard_size = 1000
        for s in range(0, len(rows), shard_size):
            (land / f"shard-{s//shard_size:04d}.jsonl.zst").write_bytes(
                build_jsonl_shard(rows[s : s + shard_size], "zstd")
            )
        spark.dataSource.register(JsonlShardsStreamSource)
        stream = (
            spark.readStream.format("jsonlshardstream")
            .load(str(land))
            .select(
                F.get_json_object("line", "$.doc_id").cast("bigint").alias("doc_id"),
                F.get_json_object("line", "$.text").alias("text"),
            )
        )
        gate = streaming_minhash_dedup(stream)
        keepers = {"n": 0, "dups": 0}

        def sink(bdf, bid):
            pdf = resolve_dup_verdicts(bdf).toPandas()
            keepers["n"] += int((~pdf.is_dup).sum())
            keepers["dups"] += int(pdf.is_dup.sum())

        ckpt = work / "ckpt"
        q = (
            gate.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        prog = _finish(q)
        op = prog["stateOperators"][0]
        disk = sum(
            f.stat().st_size for f in (ckpt / "state").rglob("*") if f.is_file()
        )
        n_keep = keepers["n"]
        bands = 8
        out = {
            "gate": "minhash_text",
            "provider": "rocksdb" if rocksdb else "hdfs",
            "sf_dir": sf_dir,
            "docs": len(rows),
            "keepers": n_keep,
            "dups_gated": keepers["dups"],
            "state_rows": op["numRowsTotal"],
            "state_memory_bytes": op["memoryUsedBytes"],
            "state_disk_bytes": disk,
            "bytes_per_keeper": round(op["memoryUsedBytes"] / max(1, n_keep), 1),
            "bytes_per_keeper_band": round(
                op["memoryUsedBytes"] / max(1, n_keep * bands), 1
            ),
            "bytes_per_10k_keepers": int(
                op["memoryUsedBytes"] / max(1, n_keep) * 10_000
            ),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)

    measure_image_gate(spark, n_images=5000, provider="rocksdb" if rocksdb else "hdfs")


def measure_image_gate(spark, n_images: int, provider: str = "hdfs") -> None:
    """Same probe for the dHash image gate (the ~40 B/keeper/band claim):
    n random 16x16 BMPs through streaming_image_dedup, one availableNow
    pass, state metrics from the query progress."""
    import numpy as np

    from hdp2_5_hive2_spark.llm.media_codecs import bmp_encode
    from hdp2_5_hive2_spark.streaming.corpus import (
        resolve_image_verdicts,
        streaming_image_dedup,
    )

    rng = np.random.default_rng(7)
    work = pathlib.Path(tempfile.mkdtemp(prefix="stream_state_img_"))
    try:
        land = work / "landing"
        land.mkdir()
        batch = [
            (int(i), bytearray(bmp_encode(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))))
            for i in range(n_images)
        ]
        spark.createDataFrame(batch, "asset_id long, payload binary").write.parquet(
            str(land / "b0.parquet")
        )
        stream = (
            spark.readStream.schema("asset_id long, payload binary")
            .option("maxFilesPerTrigger", "8")
            .parquet(str(land) + "/*.parquet")
        )
        gate = streaming_image_dedup(stream)
        keepers = {"n": 0, "dups": 0}

        def sink(bdf, bid):
            pdf = resolve_image_verdicts(bdf).toPandas()
            keepers["n"] += int((~pdf.is_dup).sum())
            keepers["dups"] += int(pdf.is_dup.sum())

        ckpt = work / "ckpt"
        q = (
            gate.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        op = _finish(q)["stateOperators"][0]
        disk = sum(
            f.stat().st_size for f in (ckpt / "state").rglob("*") if f.is_file()
        )
        n_keep = keepers["n"] or n_images
        print(
            json.dumps(
                {
                    "gate": "dhash_image",
                    "provider": provider,
                    "images": n_images,
                    "keepers": keepers["n"],
                    "dups_gated": keepers["dups"],
                    "state_rows": op["numRowsTotal"],
                    "state_memory_bytes": op["memoryUsedBytes"],
                    "state_disk_bytes": disk,
                    "disk_bytes_per_keeper_band": round(disk / (n_keep * 4), 1),
                    "bytes_per_10k_keepers_disk": int(disk / n_keep * 10_000),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
