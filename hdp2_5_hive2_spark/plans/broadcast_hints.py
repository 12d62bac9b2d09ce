"""Registry-stats broadcast hints — the SURVEY §4 "custom Catalyst work".

The reference's map-join decision reads table sizes from the metastore
(ql/optimizer/ConvertJoinMapJoin.java, MapJoinProcessor.java:186 — size
checks against `hive.auto.convert.join.noconditionaltask.size`). Spark makes
the same decision from source statistics, which exist for file-backed scans
(parquet/ORC footer+file sizes) but NOT for plan-only relations: an
RDD-backed DataFrame, a JDBC source without `sizeInBytes`, or anything
behind a barrier reports `spark.sql.defaultSizeInBytes` (Long.MaxValue), so
Catalyst will never auto-broadcast it no matter how small it really is.

SURVEY §4 budgets one deliberate piece of optimizer work for this: "a
SessionExtensions rule injecting broadcast hints from our table registry
when stats are absent". A literal `SparkSessionExtensions` rule must be a
compiled JVM class; the Spark-idiomatic equivalent from Python is to inject
the SAME logical-plan node the rule would emit — `ResolvedHint(BROADCAST)`
via `F.broadcast()` — at the table-registry boundary where every engine
query obtains its DataFrames (`catalog.load_tables`). Because hints are
advisory and Catalyst already broadcasts small file-backed scans on its own,
registering a size only ever ADDS a broadcast that the stats blackout was
suppressing; it cannot un-broadcast anything.

Usage:
    register_table_size("dim", 2_000_000)        # bytes, from your metastore
    dim = hinted(spark, rdd_backed_df, "dim")     # ResolvedHint if small
`catalog.load_tables` applies `hinted` to every table it serves, so engine
queries get the rule's effect with no per-query code.

100 TB: this is exactly the path for dimension tables that arrive from a
metastore/JDBC instead of parquet — sizes come from ANALYZE-style metadata
(`stats.column_stats`), land in the registry, and every join against them
becomes a map join without a shuffle of the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# table name -> estimated size in bytes (a metastore totalSize stand-in)
_SIZE_REGISTRY: dict[str, int] = {}


def register_table_size(name: str, size_bytes: int) -> None:
    """Record a size estimate for ``name`` (as ANALYZE TABLE would). A
    non-positive size removes the entry."""
    if size_bytes <= 0:
        _SIZE_REGISTRY.pop(name, None)
    else:
        _SIZE_REGISTRY[name] = int(size_bytes)


def registered_size(name: str) -> int | None:
    return _SIZE_REGISTRY.get(name)


def clear_registry() -> None:
    _SIZE_REGISTRY.clear()


def hinted(spark: SparkSession, df: DataFrame, name: str) -> DataFrame:
    """Return ``df`` with a broadcast hint iff the registry says ``name`` fits
    under the session's `spark.sql.autoBroadcastJoinThreshold`. The injected
    node is the same `ResolvedHint(BROADCAST)` a SessionExtensions rule would
    produce, so join planning downstream is identical."""
    size = _SIZE_REGISTRY.get(name)
    if size is None:
        return df
    threshold = _parse_bytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    )
    if 0 < size <= threshold:
        return F.broadcast(df)
    return df


def _parse_bytes(raw: str) -> int:
    """Spark byte-conf forms: '10485760', '10m', '10MB', '1g', '-1' (off)."""
    import re

    m = re.fullmatch(r"(-?\d+)\s*([kmgtp]?)b?", str(raw).strip(), re.IGNORECASE)
    if not m:
        return 10 * 1024 * 1024
    n = int(m.group(1))
    shift = {"": 0, "k": 10, "m": 20, "g": 30, "t": 40, "p": 50}[m.group(2).lower()]
    return n << shift if n > 0 else n
