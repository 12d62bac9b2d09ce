"""RCFile format tests: vlong/RLE primitives, byte-level round trips (nulls,
empty strings, unicode, multi row groups, sync markers, DefaultCodec), the
DataFrame read/write API, and Hive-JVM cross-parity (subprocess)."""

from __future__ import annotations

import subprocess
import sys

import pytest

from hdp2_5_hive2_spark.storage.rcfile import (
    _decode_len_buf,
    _encode_len_buf,
    _read_vlong,
    _write_vlong,
    parse_rcfile,
    serialize_rcfile,
)


@pytest.mark.parametrize(
    "value",
    [0, 1, -1, 127, 128, -112, -113, 255, 256, 65535, 2**31 - 1, -(2**31), 10**15, -(10**15)],
)
def test_vlong_roundtrip(value):
    buf = bytearray()
    _write_vlong(buf, value)
    got, pos = _read_vlong(bytes(buf), 0)
    assert got == value
    assert pos == len(buf)
    # single byte iff in the Hadoop one-byte range
    assert (len(buf) == 1) == (-112 <= value <= 127)


def test_len_buf_rle():
    # 1,1,1,2 must encode as [1, ~2, 2] per RCFile.java:868-874
    enc = _encode_len_buf([1, 1, 1, 2])
    expect = bytearray()
    _write_vlong(expect, 1)
    _write_vlong(expect, ~2)
    _write_vlong(expect, 2)
    assert enc == bytes(expect)
    for lens in ([], [5], [3, 3], [0, 0, 0, 0], [1, 2, 3], [7] * 100 + [1]):
        assert _decode_len_buf(_encode_len_buf(lens)) == lens


ROWS = [
    ("1", "alpha", "3.5"),
    ("2", None, ""),          # NULL vs empty string must survive
    ("3", "", None),
    ("4", "héllo wörld", "-0.0"),
    ("5", "ctrl\x01sep\ttab", "x"),
    ("6", "\\N", "not-null"),  # literal backslash-N is DATA here, not a marker
]


@pytest.mark.parametrize(
    "codec",
    [None, "org.apache.hadoop.io.compress.DefaultCodec",
     "org.apache.hadoop.io.compress.GzipCodec"],
)
def test_bytes_roundtrip(codec):
    blob = serialize_rcfile(ROWS, ncols=3, codec=codec)
    assert blob[:4] == b"RCF\x01"
    assert list(parse_rcfile(blob)) == ROWS


def test_multi_row_groups_and_sync_markers():
    import struct

    rows = [(str(i), "v" * (i % 7), None if i % 5 == 0 else "") for i in range(500)]
    blob = serialize_rcfile(
        rows, ncols=3, record_interval=37, sync_interval=200
    )
    # with a 200-byte sync interval and 14 row groups there must be escapes
    assert struct.pack(">i", -1) in blob
    assert list(parse_rcfile(blob)) == rows


def test_row_group_flush_on_buffer_size():
    rows = [("k%d" % i, "x" * 100) for i in range(50)]
    blob = serialize_rcfile(rows, ncols=2, buffer_size=512)
    assert list(parse_rcfile(blob)) == rows


def test_dataframe_roundtrip(spark, tmp_path):
    from hdp2_5_hive2_spark.storage import read_rcfile, write_rcfile

    df = spark.createDataFrame(
        [(1, "a|b", None), (2, None, 3.5), (3, "", -0.0), (4, "héllo", 1.25)],
        "k int, s string, v double",
    )
    path = str(tmp_path / "rc")
    write_rcfile(df.repartition(2), path)
    back = read_rcfile(spark, path, "k int, s string, v double")
    assert sorted(tuple(r) for r in back.collect()) == [
        (1, "a|b", None),
        (2, None, 3.5),
        (3, "", -0.0),
        (4, "héllo", 1.25),
    ]


def test_dataframe_roundtrip_deflate(spark, tmp_path):
    from hdp2_5_hive2_spark.storage import read_rcfile, write_rcfile

    df = spark.range(200).selectExpr("id", "repeat('pad', 50) AS s")
    path = str(tmp_path / "rc_z")
    write_rcfile(df, path, codec="org.apache.hadoop.io.compress.DefaultCodec")
    back = read_rcfile(spark, path, "id bigint, s string")
    assert back.count() == 200
    assert back.where("s = repeat('pad', 50)").count() == 200


def test_hive_jvm_cross_parity(tmp_path):
    """Hive's own RCFileOutputFormat output must parse with the pure-Python
    reader, and the Python writer's files must read back through a Hive
    EXTERNAL RCFILE table — both directions, same rows. Runs in a
    subprocess (hive catalog cannot coexist with the in-memory test
    session's JVM)."""
    repo = str(__import__("pathlib").Path(__file__).resolve().parent.parent)
    script = f"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
d = {str(tmp_path)!r}
spark = (SparkSession.builder.master("local[4]")
    .config("spark.sql.warehouse.dir", d + "/wh")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.hadoop.javax.jdo.option.ConnectionURL",
            "jdbc:derby:;databaseName=" + d + "/metastore_db;create=true")
    .config("spark.hadoop.hive.exec.compress.output", "false")
    .enableHiveSupport().getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from hdp2_5_hive2_spark.storage.rcfile import read_rcfile, write_rcfile, parse_rcfile
df = spark.createDataFrame(
    [(1, "a|b", None), (2, None, 3.5), (3, "", -0.0), (4, "héllo", 1.25)],
    "k int, s string, v double")
expect = [(1, "a|b", None), (2, None, 3.5), (3, "", -0.0), (4, "héllo", 1.25)]

# 1) hive writes (write_rcfile dispatches to the DDL path), python parses
#    (use_jvm=False pins the pure-Python format parser)
write_rcfile(df.coalesce(1), d + "/hiveout")
back = read_rcfile(spark, d + "/hiveout", "k int, s string, v double",
                   use_jvm=False)
rows = sorted(tuple(r) for r in back.collect())
assert rows == expect, rows

# 1b) JVM read path (VERDICT r5 #4): auto-dispatch in a hive session goes
#     through CREATE EXTERNAL ... STORED AS RCFILE + spark.table; must
#     return identical rows, and column pruning must project on the scan
backj = read_rcfile(spark, d + "/hiveout", "k int, s string, v double")
assert sorted(tuple(r) for r in backj.collect()) == expect
import io, contextlib
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    backj.explain()
plan = buf.getvalue()
assert "Scan hive" in plan or "HiveTableScan" in plan, plan
pruned = read_rcfile(spark, d + "/hiveout", "k int, s string, v double",
                     select=["k", "v"])
assert sorted(tuple(r) for r in pruned.collect()) == sorted(
    (k, v) for k, _, v in expect)
# repeated reads reuse the deterministic catalog entry (IF NOT EXISTS)
again = read_rcfile(spark, d + "/hiveout", "k int, s string, v double")
assert sorted(tuple(r) for r in again.collect()) == expect

# 2) python writes (forced via codec=None fallback on a fresh df with the
#    in-memory serializer), hive EXTERNAL table reads
import hdp2_5_hive2_spark.storage.rcfile as R
R._write_rcfile_hivectx = None
staged = df.selectExpr("cast(k as string) k", "cast(s as string) s", "cast(v as string) v")
blob = R.serialize_rcfile([tuple(r) for r in staged.collect()], ncols=3)
import os
os.makedirs(d + "/pyout", exist_ok=True)
open(d + "/pyout/part-00000", "wb").write(blob)
spark.sql("CREATE EXTERNAL TABLE rc_py (k string, s string, v string) "
          "STORED AS RCFILE LOCATION '" + d + "/pyout'")
got = sorted(tuple(r) for r in spark.sql("SELECT * FROM rc_py").collect())
assert got == [("1", "a|b", None), ("2", None, "3.5"), ("3", "", "-0.0"), ("4", "héllo", "1.25")], got

# 3) hive writes COMPRESSED (DefaultCodec, then GzipCodec), python read
#    path parses — codec parity against Java's compressors, not just our
#    own writer
import glob
spark.sql("SET hive.exec.compress.output=true")
for tbl, codec in (("rc_z", "DefaultCodec"), ("rc_g", "GzipCodec")):
    spark.sql("SET mapreduce.output.fileoutputformat.compress.codec="
              "org.apache.hadoop.io.compress." + codec)
    spark.sql("CREATE EXTERNAL TABLE " + tbl + " (k string, s string) "
              "STORED AS RCFILE LOCATION '" + d + "/" + tbl + "'")
    spark.sql("INSERT OVERWRITE TABLE " + tbl +
              " SELECT cast(id AS string), repeat('pad', 20) FROM range(50)")
    zfiles = [p for p in glob.glob(d + "/" + tbl + "/*") if ".crc" not in p]
    zrows = sorted(r for p in zfiles for r in parse_rcfile(open(p, "rb").read()))
    hdr = open(zfiles[0], "rb").read()
    assert hdr[4] == 1, codec + ": hive output must actually be compressed"
    assert codec in hdr[:64].decode("utf-8", "replace"), hdr[:64]
    assert zrows == sorted((str(i), "pad" * 20) for i in range(50)), (codec, zrows[:3])
print("RC_PARITY_OK")
"""
    import os

    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": repo},  # workers import the package
    )
    assert "RC_PARITY_OK" in out.stdout, out.stdout + out.stderr


def test_parser_rejects_corruption():
    """Bad magic, unsupported versions/codecs, and sync-marker mismatch all
    fail loudly — a silently mis-framed columnar file is worse than an
    error."""
    blob = bytearray(serialize_rcfile(ROWS, ncols=3, sync_interval=50,
                                      record_interval=2))
    with pytest.raises(ValueError, match="bad magic"):
        next(parse_rcfile(b"NOPE" + bytes(blob[4:])))
    # a SEQ\x06 header whose key class is not RCFile$KeyBuffer is a true
    # SequenceFile, not a pre-0.11 RCFile
    with pytest.raises(ValueError, match="key/value classes"):
        next(parse_rcfile(b"SEQ\x06" + bytes(blob[4:])))
    with pytest.raises(ValueError, match="version"):
        next(parse_rcfile(bytes(blob[:3]) + b"\x09" + bytes(blob[4:])))
    # flip one byte inside the first mid-file sync marker
    import struct
    esc = bytes(blob).index(struct.pack(">i", -1), 60)
    corrupted = bytearray(blob)
    corrupted[esc + 4] ^= 0xFF
    with pytest.raises(ValueError, match="sync mismatch"):
        list(parse_rcfile(bytes(corrupted)))


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    _cell = st.one_of(
        st.none(),
        st.text(max_size=40),  # arbitrary unicode incl. '', '\\N', ctrl chars
    )

    @settings(max_examples=60, deadline=None)
    @given(
        rows=st.lists(st.tuples(_cell, _cell, _cell), max_size=60),
        codec=st.sampled_from([None, "org.apache.hadoop.io.compress.DefaultCodec"]),
        record_interval=st.integers(min_value=1, max_value=7),
        sync_interval=st.integers(min_value=40, max_value=400),
    )
    def test_rcfile_property_roundtrip(rows, codec, record_interval, sync_interval):
        """Any unicode/NULL/empty cell content survives the container
        byte-exactly under any row-group size, sync density, and codec.
        Newlines/ctrl chars are fine — RCFile framing is length-prefixed,
        never delimiter-based (the advantage over TEXTFILE)."""
        blob = serialize_rcfile(
            rows,
            ncols=3,
            codec=codec,
            record_interval=record_interval,
            sync_interval=sync_interval,
        )
        assert list(parse_rcfile(blob)) == [tuple(r) for r in rows]


@pytest.mark.parametrize("codec", [None, "org.apache.hadoop.io.compress.DefaultCodec"])
def test_seq_magic_header_roundtrip(codec):
    """Pre-0.11 SEQ-magic RCFiles (hive.exec.rcfile.use.explicit.header=
    false; RCFile.java:366-373,1464-1505) parse identically: SEQ\\x06
    magic, KeyBuffer/ValueBuffer class names, the extra block-compressed
    flag — record framing unchanged."""
    blob = serialize_rcfile(ROWS, ncols=3, codec=codec, use_new_magic=False)
    assert blob[:4] == b"SEQ\x06"
    assert b"RCFile$KeyBuffer" in blob[:120]
    assert list(parse_rcfile(blob)) == ROWS
    # wrong SEQ version byte and true SequenceFiles are rejected
    with pytest.raises(ValueError, match="SEQ-magic RCFile version"):
        next(parse_rcfile(b"SEQ\x05" + bytes(blob[4:])))


def test_column_pruning_skips_decode(spark, tmp_path):
    """parse_rcfile(wanted=...) must never touch unselected column bytes:
    corrupt column 1's cell bytes to invalid UTF-8 in place (same lengths,
    framing intact) — pruned reads succeed, full reads fail to decode."""
    blob = bytearray(serialize_rcfile([("k1", "alpha", "v1"), ("k2", "bravo", "v2")], ncols=3))
    for word in (b"alpha", b"bravo"):
        i = bytes(blob).index(word)
        blob[i : i + 5] = b"\xff\xfe\xff\xfe\xff"
    pruned = list(parse_rcfile(bytes(blob), wanted=[0, 2]))
    assert pruned == [("k1", "v1"), ("k2", "v2")]
    with pytest.raises(UnicodeDecodeError):
        list(parse_rcfile(bytes(blob)))

    # DataFrame layer: select= projects at the format layer
    from hdp2_5_hive2_spark.storage import read_rcfile, write_rcfile

    df = spark.createDataFrame(
        [(1, "x", 2.5), (2, "y", None)], "a int, b string, c double"
    )
    path = str(tmp_path / "rc_prune")
    write_rcfile(df.coalesce(1), path)
    got = read_rcfile(
        spark, path, "a int, b string, c double", select=["c", "a"]
    )
    assert got.columns == ["c", "a"]
    rows = sorted((tuple(r) for r in got.collect()), key=lambda t: t[1])
    assert rows == [(2.5, 1), (None, 2)]
    with pytest.raises(ValueError, match="select names"):
        read_rcfile(spark, path, "a int, b string, c double", select=["zz"])


@pytest.mark.parametrize(
    "codec",
    [
        None,
        "org.apache.hadoop.io.compress.DefaultCodec",
        "org.apache.hadoop.io.compress.SnappyCodec",
    ],
)
def test_ranged_parse_partitions_rows_exactly(tmp_path, codec):
    """Sync-aligned ranged parsing must PARTITION the file's rows across
    any split count — no duplicates, no gaps — matching the whole-file
    parse, including splits landing mid-group, on a sync, or past EOF."""
    from hdp2_5_hive2_spark.storage.rcfile import (
        _parse_header,
        parse_rcfile_range,
    )

    rows = [
        (str(i), "payload-%d" % (i % 13), None if i % 7 == 0 else "x" * (i % 29))
        for i in range(3000)
    ]
    blob = serialize_rcfile(
        rows, ncols=3, codec=codec, record_interval=23, sync_interval=256
    )
    f = tmp_path / "mono.rc"
    f.write_bytes(blob)
    header_end, ncols, compressed, sync = _parse_header(blob)
    expect = sorted(rows)
    size = len(blob)
    for n in (1, 2, 3, 7, 16, 64):
        step = (size - header_end + n - 1) // n
        got = []
        for i in range(n):
            s = header_end + i * step
            e = min(header_end + (i + 1) * step, size)
            got.extend(
                parse_rcfile_range(
                    str(f), s, e, ncols, compressed, sync, header_end
                )
            )
        assert sorted(got) == expect, (codec, n, len(got))


def test_read_rcfile_split_dataframe(spark, tmp_path):
    from hdp2_5_hive2_spark.storage.rcfile import read_rcfile_split

    rows = [(str(i), "v%d" % i) for i in range(2000)]
    blob = serialize_rcfile(rows, ncols=2, record_interval=17, sync_interval=300)
    f = tmp_path / "mono2.rc"
    f.write_bytes(blob)
    df = read_rcfile_split(spark, str(f), "k int, s string", n_splits=8)
    assert df.count() == 2000
    assert df.agg({"k": "sum"}).collect()[0][0] == sum(range(2000))
    # format-layer pruning composes with ranged reads
    pruned = read_rcfile_split(
        spark, str(f), "k int, s string", n_splits=5, select=["k"]
    )
    assert pruned.columns == ["k"]
    assert pruned.agg({"k": "sum"}).collect()[0][0] == sum(range(2000))


def test_schema_mismatch_descriptive_errors():
    """ADVICE r5: a DDL wider than the file's declared column count (or a
    selected ordinal past it) must raise a descriptive schema-mismatch
    ValueError, not an opaque KeyError mid-decode."""
    blob = serialize_rcfile([("1", "a", "x"), ("2", "b", "y")], ncols=3)
    with pytest.raises(ValueError, match="schema mismatch.*3 columns"):
        list(parse_rcfile(blob, wanted=[0, 5]))
    with pytest.raises(ValueError, match="DDL schema has 4"):
        list(parse_rcfile(blob, expect_ncols=4))
    # matching widths parse fine
    assert len(list(parse_rcfile(blob, expect_ncols=3))) == 2


def test_truncated_range_read_raises(tmp_path):
    """ADVICE r5: parse_rcfile_range must raise on EOF mid-record (a
    truncated file silently dropping rows is corruption, not success);
    EOF exactly at a record boundary stays a clean stop."""
    from hdp2_5_hive2_spark.storage.rcfile import (
        _parse_header,
        parse_rcfile_range,
    )

    rows = [(str(i), "v" * 40) for i in range(500)]
    blob = serialize_rcfile(rows, ncols=2)
    header_end, ncols, compressed, sync = _parse_header(blob)
    whole = tmp_path / "whole.rc"
    whole.write_bytes(blob)
    got = list(
        parse_rcfile_range(
            str(whole), 0, len(blob), ncols, compressed, sync, header_end
        )
    )
    assert got == rows
    cut = tmp_path / "cut.rc"
    cut.write_bytes(blob[: len(blob) - 7])  # chop mid-record
    with pytest.raises(ValueError, match="truncated record"):
        list(
            parse_rcfile_range(
                str(cut), 0, len(blob), ncols, compressed, sync, header_end
            )
        )


def test_datasource_split_parity_and_partition_count(spark, tmp_path):
    """spark.read.format('rcfile') must fan a monolithic file out across
    sync-aligned splits and reproduce the single-task read exactly."""
    import glob
    import os

    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.storage import rcfile as rc
    from hdp2_5_hive2_spark.storage.rcfile_datasource import read_rcfile_ds

    df = spark.range(0, 4000).select(
        F.col("id").alias("a"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("b"),
    )
    rc.write_rcfile(df.coalesce(1), str(tmp_path / "m"))
    f = [
        x
        for x in glob.glob(str(tmp_path / "m" / "*"))
        if os.path.getsize(x) > 0 and not x.endswith(".crc")
    ][0]
    ddl = "a bigint, b string"
    whole = sorted(tuple(r) for r in read_rcfile_ds(spark, f, ddl).collect())
    split = read_rcfile_ds(spark, f, ddl, split_size=4096)
    assert split.rdd.getNumPartitions() > 1
    assert sorted(tuple(r) for r in split.collect()) == whole
    assert len(whole) == 4000


def test_datasource_format_layer_pruning(spark, tmp_path):
    """The select option prunes at the format layer and reorders columns."""
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.storage import rcfile as rc
    from hdp2_5_hive2_spark.storage.rcfile_datasource import read_rcfile_ds

    df = spark.range(0, 50).select(
        F.col("id").alias("x"),
        (F.col("id") * 2).alias("y"),
        (F.col("id") % 5).cast("string").alias("z"),
    )
    rc.write_rcfile(df, str(tmp_path / "t"))
    got = read_rcfile_ds(
        spark, str(tmp_path / "t"), "x bigint, y bigint, z string", select=["z", "x"]
    )
    assert got.columns == ["z", "x"]
    rows = {(r["x"], r["z"]) for r in got.collect()}
    assert rows == {(i, str(i % 5)) for i in range(50)}


def test_datasource_rejects_bad_inputs(spark, tmp_path):
    """Non-string engine schemas and unknown select names fail loudly."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.storage import rcfile as rc
    from hdp2_5_hive2_spark.storage.rcfile_datasource import (
        RCFileDataSource,
        read_rcfile_ds,
    )

    df = spark.range(0, 5).select(F.col("id").alias("a"))
    rc.write_rcfile(df, str(tmp_path / "t"))
    with _pytest.raises(ValueError, match="select names"):
        read_rcfile_ds(spark, str(tmp_path / "t"), "a bigint", select=["nope"])
    spark.dataSource.register(RCFileDataSource)
    with _pytest.raises(Exception, match="emits strings"):
        (
            spark.read.format("rcfile")
            .schema("a bigint")
            .option("ddl", "a string")
            .load(str(tmp_path / "t"))
            .collect()
        )


def test_datasource_header_derived_default_schema(spark, tmp_path):
    """Without a ddl option the source derives width from the header and
    names columns c0..cN (all string)."""
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.storage import rcfile as rc
    from hdp2_5_hive2_spark.storage.rcfile_datasource import RCFileDataSource

    df = spark.range(0, 7).select(
        F.col("id").alias("p"), (F.col("id") + 1).alias("q")
    )
    rc.write_rcfile(df, str(tmp_path / "t"))
    spark.dataSource.register(RCFileDataSource)
    got = spark.read.format("rcfile").load(str(tmp_path / "t"))
    assert got.columns == ["c0", "c1"]
    assert sorted((r["c0"], r["c1"]) for r in got.collect()) == [
        (str(i), str(i + 1)) for i in range(7)
    ]


def test_datasource_predicates_engine_side(spark, tmp_path):
    """All predicate kinds evaluate engine-side above the scan with SQL
    three-valued semantics on NULL-bearing data (the source deliberately
    implements NO pushFilters — see the module docstring and
    test_filterless_reuse_returns_all_rows for why)."""
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.storage import rcfile as rc
    from hdp2_5_hive2_spark.storage.rcfile_datasource import read_rcfile_ds

    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 11 == 0, None)
        .otherwise(F.concat(F.lit("name"), (F.col("id") % 7).cast("string")))
        .alias("name"),
        (F.col("id") % 13).cast("string").alias("tag"),
    )
    rc.write_rcfile(df.coalesce(1), str(tmp_path / "t"))
    ddl = "k bigint, name string, tag string"
    got_rel = read_rcfile_ds(spark, str(tmp_path / "t"), ddl)
    for p in [
        "name = 'name3'",
        "name <> 'name3'",
        "name in ('name0', 'name6')",
        "name is null",
        "name is not null",
        "name > 'name4'",
        "name <= 'name2'",
        "name like 'name1%'",
        "name like '%5'",
        "name like '%ame3%'",
        "name = 'name3' and tag = '7'",
        "name = 'name2' and k % 2 = 0",
    ]:
        want = sorted(tuple(r) for r in df.where(p).collect())
        got = sorted(tuple(r) for r in got_rel.where(p).collect())
        assert got == want, f"results differ for {p!r}"
        assert want, f"degenerate fixture: {p!r} selects nothing"


def test_filterless_reuse_returns_all_rows(spark, tmp_path):
    """WHY the source has no pushFilters: Spark 4.1 reuses the MOST RECENT
    scan — including any consumed filters — for a later filterless plan
    over the same loaded relation, which silently drops rows. With no
    pushdown this access pattern must be exact."""
    from hdp2_5_hive2_spark.storage import rcfile as rc
    from hdp2_5_hive2_spark.storage.rcfile_datasource import read_rcfile_ds

    df = spark.range(0, 300).selectExpr(
        "cast(id as string) a", "cast(id % 3 as string) b"
    )
    rc.write_rcfile(df.coalesce(1), str(tmp_path / "t"))
    base = read_rcfile_ds(spark, str(tmp_path / "t"), "a int, b string")
    assert base.where("b = '1'").count() == 100
    assert base.count() == 300  # the exact sequence the engine bug corrupts
    assert base.where("b = '2'").count() == 100
    assert base.count() == 300


def test_datasource_filters_with_pruning_and_splits(spark, tmp_path):
    """Combining select-pruning, multi-split reads, and engine-side
    filtering must agree with the ground truth."""
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.storage import rcfile as rc
    from hdp2_5_hive2_spark.storage.rcfile_datasource import read_rcfile_ds

    df = spark.range(0, 4000).select(
        F.col("id").alias("a"),
        F.concat(F.lit("v"), (F.col("id") % 9).cast("string")).alias("b"),
        (F.col("id") % 3).cast("string").alias("c"),
    )
    rc.write_rcfile(df.coalesce(1), str(tmp_path / "t"))
    ddl = "a bigint, b string, c string"
    got = read_rcfile_ds(
        spark, str(tmp_path / "t"), ddl, select=["c", "b"], split_size=4096
    ).where("b = 'v5' and c = '2'")
    assert got.rdd.getNumPartitions() > 1
    want = sorted(
        (str(i % 3), f"v{i % 9}")
        for i in range(4000)
        if i % 9 == 5 and i % 3 == 2
    )
    assert sorted(tuple(r) for r in got.collect()) == want and want
