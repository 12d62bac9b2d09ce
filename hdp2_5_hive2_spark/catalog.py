"""Table registry: the engine's stand-in for the Hive metastore.

The reference keeps table/partition/storage metadata in a Thrift metastore
(metastore/if/hive_metastore.thrift:294 `struct Table`, :311 `struct
Partition` — SURVEY.md §1.1). Here the catalog is parquet directories plus
Spark's own catalog: `register_views` materializes the driver's tables as
temp views so both the DataFrame and SQL APIs see them, with partition
pruning / predicate pushdown handled by the parquet source.

At 100 TB these would be real catalog tables (`saveAsTable`, partitioned by
date keys and bucketed on join keys); the query code below only depends on
view names, so that swap is config, not code.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _load_one(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Session-attached DataFrame cache: repeated load_tables/register_views
    # calls (one per corpus query) otherwise re-read parquet footers and
    # re-resolve schemas for every table each time (~4 s/query at sf0.1 once
    # all 10 tables are touched). A DataFrame is just a plan — reusing it
    # across queries in one session is free and side-effect-less.
    cache: dict[tuple[str, str], DataFrame] = getattr(spark, "_sg_table_cache", None)
    if cache is None:
        cache = {}
        spark._sg_table_cache = cache
    key = (sf_dir, name)
    if key in cache:
        return cache[key]
    df = _read_one(spark, sf_dir, name)
    cache[key] = df
    return df


def _read_one(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). Depending on the Spark
        # version the reader either rejects it unless
        # spark.sql.legacy.parquet.nanosAsLong=true reads it as epoch-nanos
        # BIGINT (<= 4.0), or reads it natively as TIMESTAMP_NTZ truncated to
        # micros (4.1+, where the legacy conf is ignored). Handle both by
        # branching on the resolved schema, normalizing to the session-zone
        # TIMESTAMP type (sessions run UTC, so the wall-clock is identical).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            # integer `div`, not `/`: epoch-nanos (~1.7e18) overflows double
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


class LazyTables(dict):
    """Mapping table-name → DataFrame that defers parquet footer reads until a
    table is actually used (queries touch 1-4 of the 10 tables)."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        super().__init__()
        self._spark = spark
        self._sf_dir = sf_dir

    def __missing__(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(name)
        df = _load_one(self._spark, self._sf_dir, name)
        # SURVEY §4 broadcast-hint injection: a no-op unless a size was
        # registered for this table (plans/broadcast_hints.py). Applied
        # outside the plan cache so registry updates take effect immediately.
        from hdp2_5_hive2_spark.plans.broadcast_hints import hinted

        df = hinted(self._spark, df, name)
        self[name] = df
        return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> LazyTables:
    """Lazy mapping of every driver table for a scale-factor directory."""
    return LazyTables(spark, sf_dir)


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register all tables as temp views (idempotent) and return the DataFrames."""
    dfs = load_tables(spark, sf_dir)
    for name in TABLES:
        dfs[name].createOrReplaceTempView(name)
    return dfs
