"""Write-path correctness corpus: every query writes through the storage
layer, reads its own output back, and aggregates — the oracle runs the same
aggregate on the ORIGINAL table, so a value-hash match proves the
write→read round trip is lossless (FileSinkOperator parity, SURVEY.md §2.1).

Round-trip safety rules:
  - parquet/orc carry exact binary doubles — any table round-trips.
  - csv/json stringify doubles, so those round trips use integer/string
    tables only (nation, region).
Outputs land under $SPARK_GRAFT_IO_DIR (default: a PER-PROCESS
/tmp/hdp2_5_hive2_spark_io_<pid>/, removed at interpreter exit) with
overwrite mode, so repeated driver runs are idempotent AND two harnesses
running concurrently (a pytest suite next to an oracle sweep) cannot
race each other's _temporary commit dirs — the r12 insurance re-run hit
exactly that chmod-on-missing-_temporary collision on the old fixed
path. Set SPARK_GRAFT_IO_DIR for a stable inspectable location.
"""

from __future__ import annotations

import atexit
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdp2_5_hive2_spark.catalog import load_tables
from hdp2_5_hive2_spark.queries.helpers import dsum
from hdp2_5_hive2_spark.queries.registry import query
from hdp2_5_hive2_spark.storage import (
    compact_files,
    insert_into,
    insert_overwrite,
    write_bucketed_table,
    write_partitioned,
)

IO_ROOT = os.environ.get("SPARK_GRAFT_IO_DIR") or (
    f"/tmp/hdp2_5_hive2_spark_io_{os.getpid()}"
)
if not os.environ.get("SPARK_GRAFT_IO_DIR"):
    # per-process default: don't litter /tmp across runs
    atexit.register(shutil.rmtree, IO_ROOT, ignore_errors=True)


@query(
    "storage_partitioned_roundtrip",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("storage", "write", "partition"),
)
def storage_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-partition write of lineitem by l_returnflag, read back from the
    partition directories, aggregate per partition value. Proves dynamic
    partitioning + partition-column reconstruction is lossless."""
    li = load_tables(spark, sf_dir)["lineitem"]
    path = f"{IO_ROOT}/partitioned_lineitem"
    write_partitioned(
        li.select("l_returnflag", "l_quantity"), path, partition_by=["l_returnflag"]
    )
    back = spark.read.parquet(path)
    return back.groupBy("l_returnflag").agg(
        dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n_rows")
    )


@query(
    "storage_orc_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n_rows
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("storage", "write", "orc"),
)
def storage_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write/read round trip (OrcSerde parity, ql/io/orc/ in the
    reference), exact doubles preserved."""
    orders = load_tables(spark, sf_dir)["orders"]
    path = f"{IO_ROOT}/orders_orc"
    insert_overwrite(orders, path, fmt="orc")
    back = spark.read.orc(path)
    return back.groupBy("o_orderstatus").agg(
        dsum("o_totalprice", "sum_price"), F.count(F.lit(1)).alias("n_rows")
    )


@query(
    "storage_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("storage", "write", "csv"),
)
def storage_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV with header write/read round trip with an explicit read schema
    (LazySimpleSerDe/OpenCSVSerde parity — schema-on-read, serde2/lazy/
    LazySimpleSerDe.java:76)."""
    nation = load_tables(spark, sf_dir)["nation"]
    path = f"{IO_ROOT}/nation_csv"
    insert_overwrite(nation, path, fmt="csv", options={"header": "true"})
    return spark.read.schema(
        "n_nationkey int, n_name string, n_regionkey int"
    ).option("header", "true").csv(path)


@query(
    "storage_json_roundtrip",
    oracle="SELECT r_regionkey, r_name FROM region",
    tags=("storage", "write", "json"),
)
def storage_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines write/read round trip (JsonSerDe parity) with explicit
    schema."""
    region = load_tables(spark, sf_dir)["region"]
    path = f"{IO_ROOT}/region_json"
    insert_overwrite(region, path, fmt="json")
    return spark.read.schema("r_regionkey int, r_name string").json(path)


@query(
    "storage_compacted_roundtrip",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer
    """,
    tags=("storage", "write", "compact"),
)
def storage_compacted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (merge-files parity): rewrite customer to a
    single file, read back, global aggregate."""
    cust = load_tables(spark, sf_dir)["customer"]
    path = f"{IO_ROOT}/customer_compact"
    compact_files(cust, path, target_files=1)
    back = spark.read.parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"), dsum("c_acctbal", "sum_bal")
    )


@query(
    "storage_bucketed_join",
    oracle="""
    SELECT o.o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderstatus
    """,
    tags=("storage", "write", "bucket", "join"),
)
def storage_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTERED BY ... INTO 8 BUCKETS on both join sides, then a join that
    reads co-located buckets with no shuffle (SMB-join parity,
    ql/exec/SMBMapJoinOperator.java:62; plan asserted shuffle-free in
    tests/test_storage.py)."""
    t = load_tables(spark, sf_dir)
    write_bucketed_table(t["orders"], "orders_bkt", ["o_custkey"], 8, sort_by=["o_custkey"])
    write_bucketed_table(t["customer"], "customer_bkt", ["c_custkey"], 8, sort_by=["c_custkey"])
    o = spark.table("orders_bkt")
    c = spark.table("customer_bkt").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "sum_price"),
        )
    )


@query(
    "storage_insert_into",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n_rows
    FROM orders WHERE o_orderkey <= 200
    GROUP BY o_orderstatus
    """,
    tags=("storage", "write", "append"),
)
def storage_insert_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT INTO (append) path (FileSinkOperator.java:92 covers overwrite
    AND append; only overwrite was exercised before): overwrite the target
    with the first 100 orders, append the next 100, read back, aggregate —
    the result must equal the oracle over the union slice, proving the
    append added files without clobbering the first write. The leading
    overwrite keeps repeated driver runs idempotent."""
    o = load_tables(spark, sf_dir)["orders"]
    path = f"{IO_ROOT}/orders_append"
    insert_overwrite(o.filter(F.col("o_orderkey") <= 100), path)
    insert_into(o.filter((F.col("o_orderkey") > 100) & (F.col("o_orderkey") <= 200)), path)
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(
        dsum("o_totalprice", "sum_price"), F.count(F.lit(1)).alias("n_rows")
    )


@query(
    "storage_union_type",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey % 2 AS INTEGER)                         AS tag,
           CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END      AS num_val,
           CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END   AS str_val
    FROM orders WHERE o_orderkey <= 300
    """,
    tags=("storage", "write", "union-type"),
)
def storage_union_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive UNION-type storage round trip (UNIONTYPE<DOUBLE, STRING>;
    ObjectInspector.java:45 UNION category, encoded per SURVEY.md §1.2 as
    struct(tag, field0, field1) via functions.hive_compat.create_union):
    build a tagged union column, write it to parquet, read it back, and
    project the tag + per-alternative values — the oracle reconstructs all
    three from the source columns, so the tagged struct must survive the
    write/read cycle losslessly (parquet doubles are exact)."""
    from hdp2_5_hive2_spark.functions.hive_compat import create_union

    o = load_tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") <= 300)
    tag = (F.col("o_orderkey") % 2).cast("int")
    u = create_union(
        tag,
        F.when(tag == 0, F.col("o_totalprice")),
        F.when(tag == 1, F.col("o_orderpriority")),
    )
    path = f"{IO_ROOT}/orders_union_type"
    insert_overwrite(o.select("o_orderkey", u.alias("u")), path)
    back = spark.read.parquet(path)
    return back.select(
        "o_orderkey",
        F.col("u.tag").alias("tag"),
        F.col("u.field0").alias("num_val"),
        F.col("u.field1").alias("str_val"),
    )


@query(
    "storage_sequencefile_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("storage", "write", "sequencefile"),
)
def storage_sequencefile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SequenceFile STORED AS round trip (the reference's default container
    for text tables; LazySimpleSerDe row layout — ctrl-A delimiters, \\N
    nulls, serde2/lazy/LazySimpleSerDe.java:76): write nation through
    storage.write_sequencefile, read it back schema-on-read, values must
    round-trip exactly. Closes the 'SequenceFile not carried' coverage row
    — Spark core reads/writes the container natively at the RDD layer."""
    from hdp2_5_hive2_spark.storage import read_sequencefile, write_sequencefile

    nation = load_tables(spark, sf_dir)["nation"].select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = f"{IO_ROOT}/nation_seq"
    write_sequencefile(nation, path)
    return read_sequencefile(
        spark, path, "n_nationkey int, n_name string, n_regionkey int"
    )


@query(
    "storage_avro_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
           CAST(o_orderdate AS DATE) AS odate,
           o_orderdate AS ots
    FROM orders WHERE o_orderkey <= 2000
    """,
    tags=("storage", "write", "avro"),
)
def storage_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STORED AS AVRO round trip (ql/io/avro/AvroContainerInputFormat.java,
    serde2/avro/AvroSerDe.java): write a typed orders slice — bigint,
    string, decimal(18,2), date, timestamp — through storage.write_avro
    (the from-spec container codec; Hive-JVM cross-parity pinned in
    tests/test_avro.py), read it back, values must round-trip exactly
    through Avro's zigzag-varint/logical-type encodings. The decimal is
    cast to DOUBLE only at the end (driver-safe result dtype); the
    roundtrip itself carries the bytes-decimal logical type."""
    from hdp2_5_hive2_spark.storage import read_avro, write_avro

    orders = load_tables(spark, sf_dir)["orders"]
    staged = orders.where(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price_dec"),
        F.col("o_orderdate").cast("date").alias("odate"),
        F.col("o_orderdate").alias("ots"),
    )
    path = f"{IO_ROOT}/orders_avro"
    write_avro(staged, path)
    back = read_avro(
        spark,
        path,
        "o_orderkey bigint, o_orderstatus string, price_dec decimal(18,2), "
        "odate date, ots timestamp",
    )
    return back.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("price_dec").cast("double").alias("price"),
        "odate",
        "ots",
    )


@query(
    "storage_upsert_delete",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM (
      SELECT o_orderkey,
             CASE WHEN o_orderkey <= 50 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
             CASE WHEN o_orderkey <= 50 THEN 0.0 ELSE o_totalprice END  AS o_totalprice
      FROM orders
      WHERE o_orderkey <= 500 AND o_orderkey % 10 <> 0
      UNION ALL
      SELECT o_orderkey + 1000000, 'N', 1.0 FROM orders
      WHERE o_orderkey <= 20 AND o_orderkey % 10 <> 0
    ) t
    GROUP BY o_orderstatus
    """,
    tags=("storage", "write", "acid"),
)
def storage_upsert_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE/MERGE + DELETE parity (the reference rewrites both into
    delta-insert + compaction — UpdateDeleteSemanticAnalyzer.java:52,
    AcidUtils.java:53; storage.upsert_by_key / delete_by_predicate are the
    plain-parquet equivalents): seed the first 500 orders, upsert 50
    updated rows plus 20 brand-new keys, delete every key divisible by 10,
    read back and aggregate — the oracle replays the same update/insert/
    delete algebra in SQL, so row counts and exact sums must agree. The
    leading overwrite keeps repeated driver runs idempotent."""
    from hdp2_5_hive2_spark.storage.writer import delete_by_predicate, upsert_by_key

    o = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = f"{IO_ROOT}/orders_upsert"
    insert_overwrite(o.filter(F.col("o_orderkey") <= 500), path)
    updates = (
        o.filter(F.col("o_orderkey") <= 50)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.lit(0.0))
    )
    new_rows = o.filter(F.col("o_orderkey") <= 20).select(
        (F.col("o_orderkey") + 1000000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
    )
    upsert_by_key(spark, path, updates.unionByName(new_rows), key_cols=["o_orderkey"])
    delete_by_predicate(spark, path, F.col("o_orderkey") % 10 == 0)
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"), dsum("o_totalprice", "sum_price")
    )


@query(
    "storage_multi_insert",
    oracle="""
    SELECT 'high' AS sink, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders WHERE o_orderkey <= 300 AND o_totalprice > 150000
    UNION ALL
    SELECT 'low' AS sink, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders WHERE o_orderkey <= 300 AND o_totalprice <= 150000
    """,
    tags=("storage", "write", "multi-insert"),
)
def storage_multi_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive multi-insert (FROM src INSERT OVERWRITE ... INSERT OVERWRITE ...;
    HiveParser.g multi-insert grammar, FileSinkOperator.java:92 as parallel
    sinks): one persisted scan of orders feeds a high-value and a low-value
    sink; both are read back and aggregated per sink, which must equal the
    oracle aggregating the source directly — proving the fan-out wrote
    disjoint, complete slices."""
    from hdp2_5_hive2_spark.storage import multi_insert

    o = load_tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") <= 300)
    hi, lo = f"{IO_ROOT}/mi_high", f"{IO_ROOT}/mi_low"
    multi_insert(
        o,
        [(hi, F.col("o_totalprice") > 150000), (lo, F.col("o_totalprice") <= 150000)],
    )
    back_hi = spark.read.parquet(hi).select(F.lit("high").alias("sink"), "o_totalprice")
    back_lo = spark.read.parquet(lo).select(F.lit("low").alias("sink"), "o_totalprice")
    return (
        back_hi.unionByName(back_lo)
        .groupBy("sink")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "sum_price"))
    )


@query(
    "storage_textfile_roundtrip",
    oracle="""
    SELECT n_nationkey,
           CASE WHEN n_regionkey = 2 THEN NULL ELSE n_name END AS n_name,
           n_regionkey
    FROM nation
    """,
    tags=("storage", "write", "textfile"),
)
def storage_textfile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STORED AS TEXTFILE round trip with LazySimpleSerDe conventions —
    Hive's DEFAULT format (serde2/lazy/LazySimpleSerDe.java:76): Ctrl-A
    field delimiter, newline records, ``\\N`` null marker. NULLs are
    injected (region-2 names) so the round trip proves the \\N marker is
    written AND read back as SQL NULL, not the literal string."""
    from hdp2_5_hive2_spark.storage import read_textfile, write_textfile

    nation = load_tables(spark, sf_dir)["nation"]
    src = nation.select(
        "n_nationkey",
        F.when(F.col("n_regionkey") == 2, F.lit(None)).otherwise(F.col("n_name")).alias("n_name"),
        "n_regionkey",
    )
    path = f"{IO_ROOT}/nation_textfile"
    write_textfile(src, path)
    return read_textfile(
        spark, path, "n_nationkey int, n_name string, n_regionkey int"
    )


@query(
    "storage_drop_partition",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders WHERE o_orderstatus <> 'F'
    GROUP BY o_orderstatus
    """,
    tags=("storage", "write", "ddl"),
)
def storage_drop_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE ... DROP PARTITION parity (DDLTask.java:3718
    dropPartitions): write orders partitioned by o_orderstatus, drop the 'F'
    partition through the Hadoop FileSystem API, read back and aggregate —
    the result must equal the source with the partition filtered out."""
    from hdp2_5_hive2_spark.storage import drop_partition

    o = load_tables(spark, sf_dir)["orders"].select(
        "o_orderstatus", "o_totalprice"
    )
    path = f"{IO_ROOT}/orders_drop_part"
    write_partitioned(o, path, partition_by=["o_orderstatus"], dynamic=False)
    drop_partition(spark, path, "o_orderstatus", "F")
    back = spark.read.parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"), dsum("o_totalprice", "sum_price")
    )


@query(
    "storage_schema_evolution",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey <= 100 THEN 0.0
                         ELSE CAST(o_totalprice AS DECIMAL(18,2)) END)
                AS DOUBLE) AS sum_price_new
    FROM orders WHERE o_orderkey <= 200
    GROUP BY o_orderstatus
    """,
    tags=("storage", "write", "schema-evolution"),
)
def storage_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read (the reference's evolved-schema contract,
    e.g. avro_evolved_schemas.q / ORC schema evolution, here on parquet):
    generation 1 writes (o_orderkey, o_orderstatus); generation 2 appends
    files that ADD o_totalprice. `mergeSchema` unions the file schemas and
    fills the missing column with NULL for old files — the aggregate
    coalesces those to 0 so the oracle can state the expected totals
    directly against the source table."""
    o = load_tables(spark, sf_dir)["orders"]
    path = f"{IO_ROOT}/orders_evolved"
    insert_overwrite(
        o.filter(F.col("o_orderkey") <= 100).select("o_orderkey", "o_orderstatus"),
        path,
    )
    insert_into(
        o.filter((F.col("o_orderkey") > 100) & (F.col("o_orderkey") <= 200)).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        ),
        path,
    )
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)), "sum_price_new"),
    )


@query(
    "storage_regex_serde",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
    FROM orders WHERE o_orderkey <= 300
    GROUP BY o_orderstatus
    """,
    tags=("storage", "serde", "regex"),
)
def storage_regex_serde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RegexSerDe round trip (serde2/RegexSerDe.java — Hive tables over raw
    log lines): orders are serialized as 'ord key=<k> status=<s>' text lines,
    read back through capture-group parsing into typed columns, and
    aggregated — the result must equal the oracle over the source table,
    proving the parse is lossless. Both directions are pure codegen string
    ops (concat on write, regexp_extract on read)."""
    from hdp2_5_hive2_spark.storage import read_regex_serde

    o = load_tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") <= 300)
    path = f"{IO_ROOT}/orders_regex_serde"
    lines = o.select(
        F.concat(
            F.lit("ord key="), F.col("o_orderkey"),
            F.lit(" status="), F.col("o_orderstatus"),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)
    back = read_regex_serde(
        spark,
        path,
        r"^ord key=(\d+) status=(\w+)$",
        [("o_orderkey", "bigint"), ("o_orderstatus", "string")],
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("o_orderkey").alias("key_checksum")
    )


@query(
    "storage_rcfile_roundtrip",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_custkey % 7 = 0 THEN NULL
                WHEN c_custkey % 5 = 0 THEN ''
                ELSE c_mktsegment END AS seg,
           c_nationkey
    FROM customer
    """,
    tags=("storage", "write", "rcfile"),
)
def storage_rcfile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STORED AS RCFILE round trip (ql/io/RCFile.java:346-496 container,
    LazyBinaryColumnarSerDe cell encoding — the format legacy HDP 2.5
    warehouses hold): write customer through storage.write_rcfile, read it
    back schema-on-read with the pure-Python format parser. NULLs (every 7th
    key) and EMPTY strings (every remaining 5th key) are injected so the
    round trip proves the zero-byte-NULL vs 0xBF-empty cell distinction
    survives — the lossiness RCFile's columnar layout is most prone to."""
    from hdp2_5_hive2_spark.storage import read_rcfile, write_rcfile

    cust = load_tables(spark, sf_dir)["customer"]
    src = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .when(F.col("c_custkey") % 5 == 0, F.lit(""))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        "c_nationkey",
    )
    path = f"{IO_ROOT}/customer_rcfile"
    write_rcfile(src.repartition(4), path)
    return read_rcfile(spark, path, "c_custkey bigint, seg string, c_nationkey int")


@query(
    "storage_parquet_metadata_audit",
    oracle="""
    SELECT CAST(row_group_id AS BIGINT) AS row_group,
           CAST(row_group_num_rows AS BIGINT) AS n_rows,
           CAST(stats_min_value AS BIGINT) AS min_doc_id,
           CAST(stats_max_value AS BIGINT) AS max_doc_id,
           CAST(stats_null_count AS BIGINT) AS null_count
    FROM parquet_metadata('/root/testdata/sf0.01/documents.parquet')
    WHERE path_in_schema = 'doc_id'
    """,
    # every oracle consumer (driver, tests, verify tool) runs at sf0.01,
    # so the footer path in the oracle is pinned to that fixture
    tags=("storage", "metadata", "data-skipping"),
)
def storage_parquet_metadata_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARQUET FOOTER INTROSPECTION — the data-skipping audit: per row
    group, the doc_id min/max/null statistics the scan planner uses to
    skip IO (the machinery behind PushedFilters actually eliding reads;
    Hive's analogue is the ORC stripe stats its SARGs consult). Footer
    metadata is KB-sized regardless of data volume, so this reads only
    footers — at 100 TB, one driver-side (or parallelized-over-files)
    metadata pass, never data pages. The oracle reads the same footers
    via DuckDB's parquet_metadata(), so a hash match proves both engines
    see identical physical statistics."""
    import pyarrow.parquet as pqt

    md = pqt.ParquetFile(f"{sf_dir}/documents.parquet").metadata
    rows = []
    for i in range(md.num_row_groups):
        rg = md.row_group(i)
        for j in range(rg.num_columns):
            c = rg.column(j)
            if c.path_in_schema == "doc_id":
                st = c.statistics
                rows.append((i, rg.num_rows, int(st.min), int(st.max), st.null_count))
    return spark.createDataFrame(
        rows,
        "row_group bigint, n_rows bigint, min_doc_id bigint, "
        "max_doc_id bigint, null_count bigint",
    )


@query(
    "storage_xml_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("storage", "write", "xml"),
)
def storage_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML write/read round trip — Spark 4's built-in XML source standing
    in for Hive's XML SerDe ecosystem (the reference reads XML via xpath
    UDFs over text tables, FunctionRegistry.java:441-446 — our fn_xpath
    covers that path; this covers the native-source path). Explicit
    schema on read: attribute/element inference is off the table for a
    round trip that must hash-match."""
    nation = load_tables(spark, sf_dir)["nation"]
    path = f"{IO_ROOT}/nation_xml"
    (
        nation.select("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite")
        .format("xml")
        .option("rootTag", "nations")
        .option("rowTag", "nation")
        .save(path)
    )
    return (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .format("xml")
        .option("rowTag", "nation")
        .load(path)
    )


@query(
    "storage_cdc_column_diff",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders
    ), v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN 'F' ELSE o_orderstatus END
               AS o_orderstatus,
             CASE WHEN o_orderkey % 53 = 0
                  THEN CAST(CAST(o_totalprice AS DECIMAL(18,2))
                            + CAST(10.00 AS DECIMAL(18,2)) AS DOUBLE)
                  ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
      FROM orders WHERE o_orderkey % 101 <> 0
      UNION ALL
      SELECT -1, 'O', 0.0, '1-URGENT'
    ), j AS (
      SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS pk,
             v1.o_orderkey IS NULL AS ins, v2.o_orderkey IS NULL AS del,
             CASE WHEN v1.o_orderkey IS NOT NULL AND v2.o_orderkey IS NOT NULL
                   AND v1.o_orderstatus IS DISTINCT FROM v2.o_orderstatus
                  THEN 1 ELSE 0 END AS c_status,
             CASE WHEN v1.o_orderkey IS NOT NULL AND v2.o_orderkey IS NOT NULL
                   AND v1.o_totalprice IS DISTINCT FROM v2.o_totalprice
                  THEN 1 ELSE 0 END AS c_price,
             CASE WHEN v1.o_orderkey IS NOT NULL AND v2.o_orderkey IS NOT NULL
                   AND v1.o_orderpriority IS DISTINCT FROM v2.o_orderpriority
                  THEN 1 ELSE 0 END AS c_prio
      FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    )
    SELECT CASE WHEN ins THEN 'insert' WHEN del THEN 'delete'
                WHEN c_status + c_price + c_prio > 0 THEN 'update'
                ELSE 'unchanged' END AS change_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(c_status) AS BIGINT) AS n_status_changes,
           CAST(SUM(c_price) AS BIGINT) AS n_price_changes,
           CAST(SUM(c_prio) AS BIGINT) AS n_priority_changes
    FROM j GROUP BY 1
    """,
    tags=("storage", "cdc", "diff"),
)
def storage_cdc_column_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA CAPTURE diff with COLUMN-LEVEL attribution — the audit
    behind every MERGE/upsert pipeline: full-outer-join two table
    versions on the key and classify each row insert / delete / update /
    unchanged, counting exactly WHICH columns changed (the null-safe
    IS DISTINCT FROM comparison, so NULL transitions count). v2 is
    synthesized deterministically from v1 (status flips, decimal-exact
    price bumps, deletes, one insert), so both engines derive identical
    versions. One key-partitioned full outer join — the same single
    shuffle a production MERGE costs; change flags aggregate map-side."""
    o = load_tables(spark, sf_dir)["orders"]
    v1 = o.select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    bump = (
        F.col("o_totalprice").cast("decimal(18,2)")
        + F.lit("10.00").cast("decimal(18,2)")
    ).cast("double")
    v2 = (
        v1.where(F.col("o_orderkey") % 101 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 97 == 0, "F")
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            F.when(F.col("o_orderkey") % 53 == 0, bump)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderpriority",
        )
        .unionAll(
            spark.createDataFrame(
                [(-1, "O", 0.0, "1-URGENT")],
                "o_orderkey long, o_orderstatus string, o_totalprice double, "
                "o_orderpriority string",
            )
        )
    )
    j = v1.alias("a").join(
        v2.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    both = F.col("a.o_orderkey").isNotNull() & F.col("b.o_orderkey").isNotNull()

    def chg(c: str):
        return F.when(
            both & ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")), 1
        ).otherwise(0)

    j = j.select(
        F.col("a.o_orderkey").isNull().alias("ins"),
        F.col("b.o_orderkey").isNull().alias("del"),
        chg("o_orderstatus").alias("c_status"),
        chg("o_totalprice").alias("c_price"),
        chg("o_orderpriority").alias("c_prio"),
    )
    ctype = (
        F.when(F.col("ins"), "insert")
        .when(F.col("del"), "delete")
        .when(F.col("c_status") + F.col("c_price") + F.col("c_prio") > 0, "update")
        .otherwise("unchanged")
    )
    return j.groupBy(ctype.alias("change_type")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("c_status").cast("bigint").alias("n_status_changes"),
        F.sum("c_price").cast("bigint").alias("n_price_changes"),
        F.sum("c_prio").cast("bigint").alias("n_priority_changes"),
    )


@query(
    "storage_merge_schema_read",
    oracle="""
    SELECT r_regionkey, r_name, CAST(NULL AS BIGINT) AS r_generation
    FROM region WHERE r_regionkey % 2 = 0
    UNION ALL
    SELECT r_regionkey, r_name, CAST(2 AS BIGINT) AS r_generation
    FROM region WHERE r_regionkey % 2 = 1
    """,
    tags=("storage", "schema-evolution", "write"),
)
def storage_merge_schema_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION ON WRITE: two parquet generations of the same
    table — v1 lacking a column that v2 added — read together with
    `mergeSchema=true`, Spark's footer-union (the counterpart to
    storage_schema_evolution's fixed-DDL read contract, and to Hive's
    ALTER TABLE ADD COLUMNS over old partitions). v1 rows surface the
    new column as NULL; no rewrite of old files, the 100 TB way to add
    a column."""
    region = load_tables(spark, sf_dir)["region"]
    path = f"{IO_ROOT}/region_generations"
    v1 = region.where(F.col("r_regionkey") % 2 == 0).select("r_regionkey", "r_name")
    v2 = region.where(F.col("r_regionkey") % 2 == 1).select(
        "r_regionkey", "r_name", F.lit(2).cast("bigint").alias("r_generation")
    )
    v1.write.mode("overwrite").parquet(f"{path}/gen=1")
    v2.write.mode("overwrite").parquet(f"{path}/gen=2")
    return (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(path)
        .select("r_regionkey", "r_name", "r_generation")
    )


@query(
    "storage_acid_lifecycle",
    oracle="""
    WITH w2state AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_orderkey <= 800
    ), current_state AS (
      SELECT k,
             CASE WHEN k <= 100 THEN 'U' ELSE st END AS st,
             CASE WHEN k <= 100 THEN CAST(0 AS DECIMAL(18,2)) ELSE price END AS price
      FROM w2state WHERE k % 7 <> 0
    )
    SELECT 'as_of_w2' AS snapshot, st AS o_orderstatus,
           COUNT(*) AS n_rows, CAST(SUM(price) AS DOUBLE) AS sum_price
    FROM w2state GROUP BY st
    UNION ALL
    SELECT 'current', st, COUNT(*), CAST(SUM(price) AS DOUBLE)
    FROM current_state GROUP BY st
    """,
    tags=("storage", "write", "acid"),
)
def storage_acid_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL Hive-ACID lifecycle (storage/acid.py — the delta-directory
    algebra of UpdateDeleteSemanticAnalyzer.java:52 / AcidUtils.java:53 /
    OrcRawRecordMerger.java:50 on parquet): two INSERT write ids, a
    DELETE (delete_delta of ROW__IDs), an UPDATE (Hive's
    delete+insert rewrite in one write id), then TWO merge-on-read
    snapshots — time travel to write id 2 (pre-delete/update state,
    AcidUtils ValidTxnList semantics) and the current state — each
    aggregated per status. A major compaction runs before the final
    read, so the current snapshot is served from the compacted
    ``base_N`` while the as-of read still resolves from history taken
    beforehand. The oracle replays the same insert/delete/update
    algebra in SQL; exact decimal sums must agree through the ROW__ID
    anti-join, the write-id bound and the compaction rewrite."""
    import shutil

    from hdp2_5_hive2_spark.storage.acid import (
        acid_compact,
        acid_delete,
        acid_insert,
        acid_read,
        acid_update,
    )

    orders = load_tables(spark, sf_dir)["orders"].select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    root = f"{IO_ROOT}/acid_orders"
    shutil.rmtree(root, ignore_errors=True)
    acid_insert(orders.where(F.col("k") <= 600).repartition(4), root)
    w2 = acid_insert(
        orders.where((F.col("k") > 600) & (F.col("k") <= 800)), root
    )
    # as-of snapshot must be AGGREGATED before compaction cleans history
    as_of = (
        acid_read(spark, root, up_to_write_id=w2)
        .groupBy("st")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").cast("double").alias("sum_price"),
        )
        .select(F.lit("as_of_w2").alias("snapshot"), "st", "n_rows", "sum_price")
        .localCheckpoint()
    )
    acid_delete(spark, root, F.col("k") % 7 == 0)
    acid_update(
        spark,
        root,
        F.col("k") <= 100,
        {"st": F.lit("U"), "price": F.lit(0).cast("decimal(18,2)")},
    )
    acid_compact(spark, root, major=True)
    current = (
        acid_read(spark, root)
        .groupBy("st")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").cast("double").alias("sum_price"),
        )
        .select(F.lit("current").alias("snapshot"), "st", "n_rows", "sum_price")
    )
    return as_of.unionByName(current).withColumnRenamed("st", "o_orderstatus")
