"""Write-path operators: INSERT OVERWRITE, dynamic partitioning, bucketing,
small-file compaction, table statistics.

Reference parity (all in /root/reference):
  - FileSinkOperator (ql/exec/FileSinkOperator.java:92): dynamic partition
    inserts, bucketed output, compression → DataFrameWriter.
  - CLUSTERED BY ... SORTED BY ... INTO n BUCKETS (HiveParser.g:1825) →
    bucketBy/sortBy + saveAsTable; a join of two tables bucketed on the join
    key runs shuffle-free (SMB-join parity, ql/exec/SMBMapJoinOperator.java:62).
  - Merge-files operators (ql/exec/AbstractFileMergeOperator.java:,
    OrcFileMergeOperator.java) → coalesce-before-write.
  - ANALYZE TABLE ... COMPUTE STATISTICS (ql/parse — feeds
    ql/optimizer/StatsOptimizer.java:97 and the CBO) →
    `ANALYZE TABLE ... COMPUTE STATISTICS [FOR ALL COLUMNS]`.

Scale notes: every writer here takes `partitions` / `partition_by` /
`bucket_by` knobs because at 100 TB the write layout IS the read plan —
partition columns drive pruning, bucketing removes the shuffle from the
next join, and target file count keeps the namenode + footer overhead sane
(the reference's merge-files operators exist for exactly that reason).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUPPORTED_FORMATS = ("parquet", "orc", "csv", "json")


def drop_table(spark: SparkSession, table: str) -> None:
    """DROP TABLE IF EXISTS, including an orphaned managed-table location:
    with an in-memory catalog (fresh session), a directory left by a previous
    process is unknown to the catalog, so a plain overwrite refuses with
    LOCATION_ALREADY_EXISTS."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        import shutil
        from urllib.parse import urlparse

        loc = urlparse(warehouse).path.rstrip("/") + "/" + table.lower()
        shutil.rmtree(loc, ignore_errors=True)


def insert_overwrite(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    options: dict[str, str] | None = None,
) -> None:
    """INSERT OVERWRITE DIRECTORY equivalent: replace `path` with `df` in the
    given format."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    writer = df.write.mode("overwrite").format(fmt)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save(path)


def insert_into(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    options: dict[str, str] | None = None,
) -> None:
    """INSERT INTO (append) equivalent: add `df`'s rows to `path` without
    touching existing files (FileSinkOperator.java:92 covers both the
    overwrite and append paths; this is the append one). Appends are
    file-level additions — no read-modify-write — so concurrent appends to
    different files are safe the same way Hive's move-task rename is."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    writer = df.write.mode("append").format(fmt)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save(path)


def multi_insert(
    df: DataFrame,
    sinks: list[tuple[str, object]],
    fmt: str = "parquet",
) -> None:
    """Hive multi-insert: FROM src INSERT OVERWRITE t1 SELECT ... WHERE p1
    INSERT OVERWRITE t2 SELECT ... WHERE p2 (HiveParser.g multi-insert
    grammar; FileSinkOperator.java:92 running as several sinks under one
    operator tree) — ONE scan of the source feeding every sink.

    Spark-first shape: persist the source (the shared subplan the
    reference's forked operator tree gives implicitly), then one write per
    sink; each write reuses the cached scan instead of re-reading the
    source. At 100 TB prefer MEMORY_AND_DISK persist and sinks partitioned
    so each write is append-only parallel file creation.
    """
    from pyspark import StorageLevel

    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        for path, pred in sinks:
            part = df.filter(pred) if pred is not None else df
            part.write.mode("overwrite").format(fmt).save(path)
    finally:
        df.unpersist()


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
    dynamic: bool = True,
) -> None:
    """Dynamic-partition INSERT OVERWRITE (FileSinkOperator's dynamic
    partitioning, ql/exec/FileSinkOperator.java:92): one output directory per
    distinct partition-column tuple; `dynamic=True` only replaces partitions
    present in `df` (Hive's nonstrict dynamic partition overwrite)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", "DYNAMIC" if dynamic else "STATIC"
    )
    try:
        df.write.mode("overwrite").format(fmt).partitionBy(*partition_by).save(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """CLUSTERED BY (cols) [SORTED BY (cols)] INTO n BUCKETS table
    (HiveParser.g:1825). Joins between tables bucketed on the same key with
    the same bucket count read co-located and skip the shuffle entirely —
    verified by the plan assertions in tests/test_storage.py."""
    drop_table(df.sparkSession, table)
    writer = df.write.mode("overwrite").format(fmt).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def compact_files(
    df: DataFrame, path: str, target_files: int, fmt: str = "parquet"
) -> None:
    """Merge-files parity (ql/exec/AbstractFileMergeOperator.java): rewrite
    to a bounded file count. Uses coalesce (no shuffle) — the reference's
    merge task is likewise a read-concatenate-write pass."""
    df.coalesce(target_files).write.mode("overwrite").format(fmt).save(path)


def analyze_table(spark: SparkSession, table: str, columns: bool = True) -> None:
    """ANALYZE TABLE ... COMPUTE STATISTICS [FOR ALL COLUMNS]: feeds
    Catalyst's CBO the same row-count/NDV/min-max stats Hive's metastore
    stats fed its join ordering and StatsOptimizer."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR ALL COLUMNS")


def upsert_by_key(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
) -> None:
    """UPDATE/MERGE parity (the reference rewrites UPDATE into insert-to-
    delta + compaction, parse/UpdateDeleteSemanticAnalyzer.java:52 and
    ql/io/AcidUtils.java:53 in /root/reference): read-modify-overwrite by
    key — existing rows with matching keys are replaced, new keys appended.

    With `partition_col`, only partitions PRESENT IN `updates` are
    rewritten (dynamic partition overwrite — the merge-on-read equivalent
    for partition-local updates); without it the whole dataset rewrites.
    At 100 TB always partition and let updates touch few partitions; for
    row-level ACID semantics use a table format (Delta/Iceberg) — this is
    the plain-parquet equivalent of Hive's base+delta compaction result.
    """
    try:
        current = spark.read.parquet(path)
    except Exception:
        current = None
    if current is not None and partition_col:
        touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
        current = current.filter(F.col(partition_col).isin(touched))
    if current is not None:
        anti = current.join(updates.select(*key_cols), key_cols, "left_anti")
        merged = anti.unionByName(updates)
    else:
        merged = updates
    # write to a staging location first: the merged plan READS `path`, and
    # overwriting a path that is also an input corrupts the read at scale
    staging = path.rstrip("/") + "._staging"
    if partition_col:
        merged.write.mode("overwrite").format("parquet").partitionBy(partition_col).save(staging)
        back = spark.read.parquet(staging)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "DYNAMIC")
        try:
            back.write.mode("overwrite").format("parquet").partitionBy(partition_col).save(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    else:
        merged.write.mode("overwrite").format("parquet").save(staging)
        spark.read.parquet(staging).write.mode("overwrite").format("parquet").save(path)


def delete_by_predicate(spark: SparkSession, path: str, predicate) -> None:
    """DELETE parity (UpdateDeleteSemanticAnalyzer.java:52): rewrite the
    dataset without rows matching `predicate` (a Column). Plain-parquet
    equivalent of delete-delta + compaction."""
    current = spark.read.parquet(path)
    staging = path.rstrip("/") + "._staging"
    current.filter(~predicate).write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("overwrite").parquet(path)


_HIVE_NULL = r"\N"  # LazySimpleSerDe default null sequence


def write_sequencefile(df: DataFrame, path: str, sep: str = "\x01") -> None:
    """Hive SequenceFile table layout: unused key, Text value holding a
    LazySimpleSerDe row — ctrl-A ('\\x01') field delimiters, ``\\N`` nulls
    (serde2/lazy/LazySimpleSerDe.java:76; SequenceFile is the reference's
    default container for STORED AS SEQUENCEFILE). Overwrite semantics match
    insert_overwrite (the target is replaced).

    Two execution paths, byte-identical output (drift-guarded in
    tests/test_storage.py):

    - **Hive-catalog session** (``spark.sql.catalogImplementation=hive``):
      INSERT OVERWRITE into an EXTERNAL ... STORED AS SEQUENCEFILE table at
      ``path`` — Hive's own FileSinkOperator route, entirely JVM-side. This
      is the 100 TB path: rows never cross into Python.
    - **In-memory-catalog fallback**: Hive serde DDL needs the Hive catalog,
      and PySpark exposes no DataFrame-level SequenceFile sink, so the
      (NullWritable, Text) wrapping rides the RDD API. The delimited line is
      still built as ONE codegen'd Column (concat_ws over
      coalesce(cast(c as string), '\\N')) — no per-row Python string
      assembly — but each row IS pickled JVM→Python→JVM for the pair
      wrapping (~2 µs/row, measured in PERF.md). NOT scale-rated: at 100 TB
      use a Hive-enabled session.
    """
    spark = df.sparkSession
    if spark.conf.get("spark.sql.catalogImplementation", "in-memory") == "hive":
        _write_sequencefile_hive(df, path, sep)
        return
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    line = F.concat_ws(
        sep,
        *[F.coalesce(F.col(c).cast("string"), F.lit(_HIVE_NULL)) for c in df.columns],
    )
    df.select(line.alias("_line")).rdd.map(lambda r: (None, r._line)).saveAsSequenceFile(
        path
    )


def _write_sequencefile_hive(df: DataFrame, path: str, sep: str = "\x01") -> None:
    """JVM-only SequenceFile sink: stage the cast-to-string projection (the
    exact strings the fallback path serializes) through an EXTERNAL Hive
    table at ``path``; DROP TABLE afterwards keeps the files (external
    semantics, verified). Spark's parser allows ROW FORMAT DELIMITED only
    for textfile, so a custom separator rides LazySimpleSerDe's field.delim
    SERDEPROPERTY (unicode-escaped so any single-char sep round-trips the
    DDL)."""
    import uuid

    spark = df.sparkSession
    tag = uuid.uuid4().hex[:12]
    table, view = f"_seq_sink_{tag}", f"_seq_src_{tag}"
    cast_cols = [F.col(c).cast("string").alias(c) for c in df.columns]
    df.select(*cast_cols).createOrReplaceTempView(view)
    cols_ddl = ", ".join(f"`{c}` string" for c in df.columns)
    sep_lit = "\\u%04X" % ord(sep)
    try:
        spark.sql(
            f"CREATE EXTERNAL TABLE {table} ({cols_ddl}) "
            "ROW FORMAT SERDE 'org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe' "
            f"WITH SERDEPROPERTIES ('field.delim'='{sep_lit}') "
            f"STORED AS SEQUENCEFILE LOCATION '{path}'"
        )
        spark.sql(f"INSERT OVERWRITE TABLE {table} SELECT * FROM {view}")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.catalog.dropTempView(view)


def _decode_serde_field(raw, data_type, null_marker: str):
    """LazySimpleSerDe per-field decode, shared by the SequenceFile and
    TEXTFILE readers: the null marker (and a missing trailing field, already
    NULL) becomes SQL NULL; everything else lazily casts to the target type.
    try_cast keeps malformed values NULL instead of aborting the job under
    Spark 4's default ANSI mode — the serde's permissive contract."""
    return (
        F.when(raw == null_marker, F.lit(None)).otherwise(raw).try_cast(data_type)
    )


def read_sequencefile(
    spark: SparkSession, path: str, schema: str, sep: str = "\x01"
) -> DataFrame:
    """Schema-on-read over a Hive-layout SequenceFile (the reverse of
    write_sequencefile): split each Text value on the field delimiter, map
    ``\\N`` back to NULL, cast to the DDL `schema` — LazySimpleSerDe's lazy
    per-field cast, done with one select of Column casts."""
    from pyspark.sql.types import StructType

    target = StructType.fromDDL(schema)
    names = [f.name for f in target.fields]
    lines = spark.sparkContext.sequenceFile(path).values()
    raw = spark.createDataFrame(
        lines.map(lambda v: tuple(v.split(sep))), ", ".join(f"{n} string" for n in names)
    )
    return raw.select(
        *[
            _decode_serde_field(F.col(f.name), f.dataType, _HIVE_NULL).alias(f.name)
            for f in target.fields
        ]
    )


def write_textfile(
    df: DataFrame,
    path: str,
    sep: str = "\x01",
    null_marker: str = "\\N",
) -> None:
    """STORED AS TEXTFILE with LazySimpleSerDe conventions — Hive's DEFAULT
    table format (serde2/lazy/LazySimpleSerDe.java:76): Ctrl-A (\\x01) field
    delimiter, newline records, ``\\N`` for NULL, and NO quoting — exactly
    the serde's layout (the csv sink would quote-escape values containing a
    quote character, which read_textfile's raw split could not invert). The
    line is built as ONE concat_ws Column over null-coalesced string casts —
    pure codegen, no per-row Python — and written through the text sink.

    LazySimpleSerDe caveat carried faithfully: values containing the field
    delimiter or a newline are not representable (Hive without
    escape.delim has the same limitation)."""
    line = F.concat_ws(
        sep,
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(null_marker))
            for c in df.columns
        ],
    )
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def read_textfile(spark: SparkSession, path: str, schema: str, sep: str = "\x01",
                  null_marker: str = "\\N") -> DataFrame:
    """Schema-on-read of a LazySimpleSerDe text directory (the read half of
    write_textfile).

    Implemented as line-read + split rather than the csv reader: Spark's csv
    source maps an unquoted empty field to NULL no matter what ``emptyValue``
    says, which would conflate ``''`` with ``\\N`` — LazySimpleSerDe keeps
    them distinct (empty field → empty string; only the marker → NULL). The
    split/element_at/when chain is pure codegen, one pass, no Python."""
    from pyspark.sql.types import StructType

    struct = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    # split with limit=-1 keeps trailing empty fields; escape the separator
    # for the Java regex engine. F.get is 0-based and returns NULL for
    # missing trailing fields (LazySimpleSerDe pads short rows with NULL;
    # element_at would throw under Spark 4's default ANSI mode).
    parts = F.split(F.col("value"), re.escape(sep), -1)
    cols = [
        _decode_serde_field(F.get(parts, i), field.dataType, null_marker).alias(
            field.name
        )
        for i, field in enumerate(struct.fields)
    ]
    return spark.read.text(path).select(*cols)


# Hive FileUtils.java charToEscape (common/src/java/.../FileUtils.java:79-99,
# non-Windows set): ASCII control chars 0x00-0x1F, DEL, and the path-special
# punctuation. Spark's ExternalCatalogUtils.escapePathName implements the
# same table; kept in pure Python so partition DDL has no JVM-internal
# dependency (and works under Spark Connect). JVM parity is drift-guarded in
# tests/test_storage.py.
_PATH_ESCAPE_CHARS = frozenset(chr(c) for c in range(0x20)) | frozenset(
    '"#%\'*/:=?\\{[]^\x7f'
)


def _escape_partition_value(value: str) -> str:
    """Escape a partition value exactly the way the writer escaped it when
    naming the directory (Hive's FileUtils.escapePathName rules) — '/', ':'
    etc. become uppercase %XX sequences in the path."""
    return "".join(
        f"%{ord(c):02X}" if c in _PATH_ESCAPE_CHARS else c for c in value
    )


def drop_partition(spark: SparkSession, path: str, col: str, value: str) -> bool:
    """ALTER TABLE ... DROP PARTITION (col=value) on a path-based partitioned
    layout (DDLTask.java:3718 dropPartitions): removes the partition
    directory through the Hadoop FileSystem API — the same abstraction Hive's
    move/drop tasks use, so it works identically on local paths, HDFS and
    object stores. The value is escaped with the SAME rules the writer used
    to name the directory (special characters like '/' and ':' are
    percent-encoded), so dropping e.g. value 'a/b' targets 'col=a%2Fb'.
    Returns True if the partition existed."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    escaped = _escape_partition_value(value)
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/{col}={escaped}")
    fs = p.getFileSystem(hconf)
    return bool(fs.delete(p, True))


def read_regex_serde(
    spark: SparkSession, path: str, pattern: str, fields: Sequence[tuple[str, str]]
) -> DataFrame:
    """RegexSerDe read path (serde2/RegexSerDe.java): parse each text line
    with a regex whose capture groups become typed columns — the standard way
    Hive tables sit over raw log files. Pure codegen: one regexp_extract per
    field + cast, no Python.

    ``fields`` is an ordered list of (name, ddl_type); group i+1 binds to
    fields[i]. Hive's RegexSerDe contract for lines that do NOT match the
    pattern is an all-NULL row (raw logs routinely contain blank/garbage
    lines), carried here by gating every extract on rlike; try_cast keeps
    a malformed capture NULL instead of aborting under ANSI mode."""
    matched = F.col("value").rlike(pattern)
    cols = [
        F.when(matched, F.regexp_extract(F.col("value"), pattern, i + 1))
        .try_cast(t)
        .alias(n)
        for i, (n, t) in enumerate(fields)
    ]
    return spark.read.text(path).select(*cols)
