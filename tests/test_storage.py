"""Write-path tests: round trips are covered by the corpus oracle gate
(tests/test_corpus.py); here we assert the PLAN properties the storage layer
exists for — bucketed joins skip the shuffle, partitioned reads prune, and
ANALYZE feeds the catalog row counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdp2_5_hive2_spark.catalog import load_tables
from hdp2_5_hive2_spark.queries.storage_corpus import IO_ROOT
from hdp2_5_hive2_spark.storage import (
    analyze_table,
    drop_table,
    write_bucketed_table,
    write_partitioned,
)
from tests.conftest import SF_CORRECT


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark):
    t = load_tables(spark, SF_CORRECT)
    write_bucketed_table(t["orders"], "orders_bkt_t", ["o_custkey"], 8, sort_by=["o_custkey"])
    write_bucketed_table(t["customer"], "customer_bkt_t", ["c_custkey"], 8, sort_by=["c_custkey"])
    o = spark.table("orders_bkt_t")
    c = spark.table("customer_bkt_t")
    joined = o.join(c.hint("merge"), o.o_custkey == c.c_custkey).select("o_orderkey", "c_name")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() > 0


def test_partitioned_read_prunes(spark):
    li = load_tables(spark, SF_CORRECT)["lineitem"]
    path = f"{IO_ROOT}/prune_lineitem"
    write_partitioned(li.select("l_returnflag", "l_quantity"), path, ["l_returnflag"])
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    plan = _plan(back)
    assert "PartitionFilters" in plan and "l_returnflag" in plan.split("PartitionFilters")[1][:200], plan
    assert back.count() > 0


def test_dynamic_partition_overwrite_replaces_only_touched(spark):
    li = load_tables(spark, SF_CORRECT)["lineitem"].select("l_returnflag", "l_quantity")
    path = f"{IO_ROOT}/dyn_overwrite"
    write_partitioned(li, path, ["l_returnflag"])
    n_all = spark.read.parquet(path).count()
    # overwrite only partition 'R' with a single row; others must survive
    one = li.sparkSession.createDataFrame([(1.0, "R")], "l_quantity double, l_returnflag string")
    write_partitioned(one, path, ["l_returnflag"], dynamic=True)
    back = spark.read.parquet(path)
    n_r = back.filter(F.col("l_returnflag") == "R").count()
    n_rest = back.filter(F.col("l_returnflag") != "R").count()
    assert n_r == 1
    assert n_rest == n_all - li.filter(F.col("l_returnflag") == "R").count() + 0


def test_analyze_table_records_stats(spark):
    t = load_tables(spark, SF_CORRECT)
    drop_table(spark, "nation_stats_t")
    t["nation"].write.mode("overwrite").saveAsTable("nation_stats_t")
    analyze_table(spark, "nation_stats_t")
    detail = spark.sql("DESCRIBE TABLE EXTENDED nation_stats_t").collect()
    stats = [r for r in detail if r.col_name == "Statistics"]
    assert stats and "rows" in stats[0].data_type


def test_upsert_by_key_partitioned(spark):
    """upsert_by_key: matching keys replaced, new keys appended, untouched
    partitions preserved byte-for-byte."""
    from hdp2_5_hive2_spark.storage.writer import upsert_by_key

    path = f"{IO_ROOT}/upsert_t"
    base = spark.createDataFrame(
        [(1, "p1", 10.0), (2, "p1", 20.0), (3, "p2", 30.0)],
        "id long, part string, v double",
    )
    base.write.mode("overwrite").partitionBy("part").parquet(path)
    updates = spark.createDataFrame(
        [(2, "p1", 99.0), (4, "p1", 40.0)], "id long, part string, v double"
    )
    upsert_by_key(spark, path, updates, key_cols=["id"], partition_col="part")
    got = {r.id: (r.part, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("p1", 10.0), 2: ("p1", 99.0), 3: ("p2", 30.0), 4: ("p1", 40.0)}


def test_delete_by_predicate(spark):
    from hdp2_5_hive2_spark.storage.writer import delete_by_predicate

    path = f"{IO_ROOT}/delete_t"
    spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, v double"
    ).write.mode("overwrite").parquet(path)
    delete_by_predicate(spark, path, F.col("id") >= 5)
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == [0, 1, 2, 3, 4]


def test_compression_codecs_roundtrip(spark):
    """Format × codec surface (orc.compress ZLIB etc. in the reference's
    perf suite, q_perf_test_init.sql:36): parquet snappy/zstd/gzip and orc
    zlib round-trip losslessly."""
    from hdp2_5_hive2_spark.storage import insert_overwrite

    nation = load_tables(spark, SF_CORRECT)["nation"]
    want = sorted(tuple(r) for r in nation.collect())
    for fmt, codec in [("parquet", "snappy"), ("parquet", "zstd"), ("parquet", "gzip"), ("orc", "zlib")]:
        path = f"{IO_ROOT}/codec_{fmt}_{codec}"
        insert_overwrite(nation, path, fmt=fmt, options={"compression": codec})
        got = sorted(tuple(r) for r in spark.read.format(fmt).load(path).collect())
        assert got == want, (fmt, codec)


def test_textfile_layout_is_lazysimpleserde(spark):
    """The written bytes must BE Hive's default TEXTFILE layout: Ctrl-A
    delimiters and a literal \\N for NULL (not an empty string, not 'null')."""
    import glob

    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.storage import read_textfile, write_textfile

    df = spark.createDataFrame(
        [(1, "alpha", 10), (2, None, 20)], "k int, name string, v int"
    )
    path = "/tmp/hdp2_5_hive2_spark_io/test_textfile_layout"
    write_textfile(df, path)
    lines = []
    for f in glob.glob(f"{path}/part-*"):
        with open(f) as fh:
            lines += [ln.rstrip("\n") for ln in fh if ln.strip()]
    assert sorted(lines) == ["1\x01alpha\x0110", "2\x01\\N\x0120"], lines
    back = read_textfile(spark, path, "k int, name string, v int")
    rows = {tuple(r) for r in back.collect()}
    assert rows == {(1, "alpha", 10), (2, None, 20)}, rows


def test_drop_partition_removes_only_target(spark):
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.storage import drop_partition, write_partitioned

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "v int, p string"
    )
    path = "/tmp/hdp2_5_hive2_spark_io/test_drop_part"
    write_partitioned(df, path, partition_by=["p"], dynamic=False)
    assert drop_partition(spark, path, "p", "a") is True
    assert drop_partition(spark, path, "p", "missing") is False
    back = spark.read.parquet(path)
    assert [tuple(r) for r in back.collect()] == [(2, "b")]


def test_partitioned_read_prunes_partitions(spark):
    """A filter on the partition column must become a PartitionFilter (prune
    directories at planning time), not a post-scan Filter — the property
    that makes partitioned layouts pay off at 100 TB."""
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.storage import write_partitioned

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(100)], "v int, p string"
    )
    path = "/tmp/hdp2_5_hive2_spark_io/test_partition_pruning"
    write_partitioned(df, path, partition_by=["p"], dynamic=False)
    q = spark.read.parquet(path).filter(F.col("p") == "a")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(p" in plan or "PartitionFilters: [(p" in plan, plan
    assert q.count() == 50


def test_textfile_quotes_roundtrip_unquoted(spark):
    """LazySimpleSerDe never quotes: a value containing a double-quote must
    round-trip verbatim (the csv sink would quote-escape it and the raw
    split reader could not invert that)."""
    from hdp2_5_hive2_spark.storage import read_textfile, write_textfile

    df = spark.createDataFrame([(1, 'he said "hi"')], "k int, s string")
    path = "/tmp/hdp2_5_hive2_spark_io/test_textfile_quotes"
    write_textfile(df, path)
    back = read_textfile(spark, path, "k int, s string")
    assert back.collect()[0].s == 'he said "hi"'


def test_textfile_short_row_pads_null(spark):
    """A row with fewer fields than the schema reads as NULL-padded (the
    LazySimpleSerDe contract), not an ANSI element_at crash."""
    import pathlib

    from hdp2_5_hive2_spark.storage import read_textfile

    path = "/tmp/hdp2_5_hive2_spark_io/test_textfile_short"
    pathlib.Path(path).mkdir(parents=True, exist_ok=True)
    pathlib.Path(f"{path}/part-0.txt").write_text("1\x01full\x0110\n2\n")
    rows = {r.k: r for r in read_textfile(spark, path, "k int, s string, v int").collect()}
    assert rows[1].s == "full" and rows[1].v == 10
    assert rows[2].s is None and rows[2].v is None


def test_regex_serde_unmatched_line_is_null_row(spark):
    """RegexSerDe contract (serde2/RegexSerDe.java): a line that does not
    match the pattern yields an all-NULL row — never a job-aborting ANSI
    cast error on the empty capture."""
    import pathlib

    from hdp2_5_hive2_spark.storage import read_regex_serde

    path = "/tmp/hdp2_5_hive2_spark_io/test_regex_garbage"
    pathlib.Path(path).mkdir(parents=True, exist_ok=True)
    pathlib.Path(f"{path}/part-0.txt").write_text("ord key=7 status=OK\n\ngarbage line\n")
    rows = read_regex_serde(
        spark, path, r"^ord key=(\d+) status=(\w+)$",
        [("k", "bigint"), ("st", "string")],
    ).collect()
    parsed = [tuple(r) for r in rows]
    assert (7, "OK") in parsed
    assert parsed.count((None, None)) == 2


def test_escape_partition_value_matches_jvm(spark):
    """Drift guard: the pure-Python FileUtils.escapePathName table must
    byte-match Spark's ExternalCatalogUtils (itself a copy of Hive
    FileUtils.java:79-99) over every ASCII char and some multibyte text —
    the escaping names real partition directories, so a divergence would
    orphan partitions."""
    from hdp2_5_hive2_spark.storage.writer import _escape_partition_value

    jvm_escape = (
        spark.sparkContext._jvm.org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.escapePathName
    )
    samples = [chr(c) for c in range(1, 128)] + [
        "a/b:c", "x=y", "100%", "done?", "utf-8 ✓ ü", "plain-value_1.2",
        "", "tab\tsep", "nl\nend",
    ]
    for s in samples:
        assert _escape_partition_value(s) == jvm_escape(s), repr(s)


def test_write_sequencefile_hive_path_parity(tmp_path):
    """The JVM-only Hive-catalog SequenceFile sink must emit byte-identical
    (value-)rows to the RDD fallback, and read back through
    read_sequencefile. Runs in a subprocess: a hive-catalog SparkSession
    cannot coexist with the in-memory-catalog test session in one JVM."""
    import subprocess
    import sys

    script = f"""
import sys
sys.path.insert(0, {repr(str(__import__('pathlib').Path(__file__).resolve().parent.parent))})
from pyspark.sql import SparkSession
d = {repr(str(tmp_path))}
spark = (SparkSession.builder.master("local[4]")
    .config("spark.sql.warehouse.dir", d + "/wh")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.hadoop.javax.jdo.option.ConnectionURL",
            "jdbc:derby:;databaseName=" + d + "/metastore_db;create=true")
    .enableHiveSupport().getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
from hdp2_5_hive2_spark.storage.writer import (
    read_sequencefile, write_sequencefile, _write_sequencefile_hive)
df = spark.createDataFrame(
    [(1, "a|b", None), (2, None, 3.5), (3, "", -0.0)],
    "k int, s string, v double")
write_sequencefile(df, d + "/hiveout")           # dispatches to the hive path
_rdd_line = None
# fallback path, forced, for byte parity
import hdp2_5_hive2_spark.storage.writer as W
from pyspark.sql import functions as F
import shutil
shutil.rmtree(d + "/rddout", ignore_errors=True)
line = F.concat_ws("\\x01", *[F.coalesce(F.col(c).cast("string"), F.lit(W._HIVE_NULL)) for c in df.columns])
df.select(line.alias("_line")).rdd.map(lambda r: (None, r._line)).saveAsSequenceFile(d + "/rddout")
a = sorted(spark.sparkContext.sequenceFile(d + "/hiveout").values().collect())
b = sorted(spark.sparkContext.sequenceFile(d + "/rddout").values().collect())
assert a == b, (a, b)
back = read_sequencefile(spark, d + "/hiveout", "k int, s string, v double")
rows = sorted(tuple(r) for r in back.collect())
assert rows == [(1, "a|b", None), (2, None, 3.5), (3, "", -0.0)], rows
# custom separator through the DDL unicode escape
_write_sequencefile_hive(df, d + "/sepout", sep="|")
vals = sorted(spark.sparkContext.sequenceFile(d + "/sepout").values().collect())
assert vals[0].startswith("1|"), vals
print("SEQ_PARITY_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=240,
        cwd=str(tmp_path),
    )
    assert "SEQ_PARITY_OK" in out.stdout, out.stdout + out.stderr


def test_zvalue_matches_python_interleave(spark):
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.storage.layout import zvalue, zorder_audit

    df = spark.range(0, 300).select(
        (F.col("id") % 17).alias("x"), (F.col("id") % 23).alias("y"), "id"
    )
    rows = df.select("x", "y", zvalue("x", "y", bits=8).alias("z")).collect()

    def interleave(x: int, y: int, bits: int = 8) -> int:
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for r in rows:
        assert r["z"] == interleave(r["x"], r["y"])

    # Z-range buckets bound BOTH dimensions: fixing the top 2k bits of the
    # key pins the top k bits of each dimension, so every bucket's span is
    # at most 2^(bits-k) per dimension.
    big = spark.range(0, 4096).select(
        (F.col("id") % 256).alias("x"), ((F.col("id") * 7) % 256).alias("y")
    )
    audit = zorder_audit(big, "x", "y", bits=8, bucket_bits=4).collect()
    assert sum(r["n_rows"] for r in audit) == 4096
    for r in audit:
        assert r["max_x"] - r["min_x"] <= 63
        assert r["max_y"] - r["min_y"] <= 63

    import pytest as _pytest

    with _pytest.raises(ValueError):
        zvalue("x", "y", bits=0)


def test_csv_permissive_malformed_rows_become_nulls(spark, tmp_path):
    """LazySimpleSerDe parity: Hive SerDes never abort on malformed cells —
    unparsable values read as NULL and short rows pad with NULL. Spark's
    PERMISSIVE CSV mode (the default) must behave identically for the
    engine's CSV surface."""
    p = tmp_path / "bad.csv"
    p.write_text("1,alpha,2.5\nnot_an_int,beta,3.5\n3,gamma\n4,delta,oops\n")
    df = spark.read.schema("a bigint, b string, c double").csv(str(p))
    rows = sorted(
        ((r["a"], r["b"], r["c"]) for r in df.collect()),
        key=lambda t: (t[0] is None, t[0] or 0, t[1] or ""),
    )
    assert rows == [
        (1, "alpha", 2.5),
        (3, "gamma", None),       # short row pads with NULL
        (4, "delta", None),       # bad double -> NULL, row survives
        (None, "beta", 3.5),      # bad bigint -> NULL, row survives
    ]


def test_parquet_and_orc_codec_matrix_roundtrip(spark, tmp_path):
    """Every compression codec the engine would use at 100 TB (zstd for
    cold, snappy/lz4 for hot, gzip for legacy) round-trips losslessly for
    both parquet and ORC, and actually produces the codec's file suffix
    (proof the option took effect, not silent fallback)."""
    import glob

    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("s"),
        (F.col("id") % 7).cast("double").alias("d"),
    )
    want = sorted((r["k"], r["s"], r["d"]) for r in df.collect())
    cases = [
        ("parquet", "zstd", ".zstd.parquet"),
        ("parquet", "snappy", ".snappy.parquet"),
        ("parquet", "gzip", ".gz.parquet"),
        ("parquet", "lz4", ".lz4hadoop.parquet"),
        ("orc", "zlib", ".zlib.orc"),
        ("orc", "snappy", ".snappy.orc"),
        ("orc", "lz4", ".lz4.orc"),
    ]
    for fmt, codec, suffix in cases:
        p = str(tmp_path / f"{fmt}_{codec}")
        df.coalesce(1).write.mode("overwrite").option("compression", codec).format(
            fmt
        ).save(p)
        files = [f for f in glob.glob(p + "/part-*") if not f.endswith(".crc")]
        assert files and files[0].endswith(suffix), (fmt, codec, files)
        back = spark.read.format(fmt).load(p)
        got = sorted((r["k"], r["s"], r["d"]) for r in back.collect())
        assert got == want, (fmt, codec)
