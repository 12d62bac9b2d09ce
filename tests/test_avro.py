"""Avro container codec: pure-Python encode/decode parity with the spec,
schema evolution on read, DataFrame read/write API, and Hive-JVM
cross-parity (subprocess) — the reference's STORED AS AVRO surface
(ql/io/avro/AvroContainerInputFormat.java, serde2/avro/AvroSerDe.java,
avro_evolved_schemas.q)."""

from __future__ import annotations

import json
import subprocess
import sys
from datetime import date, datetime
from decimal import Decimal
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.storage.avro import (
    avro_schema_of,
    parse_avro,
    read_avro,
    serialize_avro,
    spark_schema_of,
    write_avro,
)

_DDL = (
    "k int, name string, amt decimal(10,2), d date, ts timestamp, "
    "v double, fl float, ok boolean, raw binary, xs array<int>, "
    "m map<string,string>, st struct<a:int,b:string>"
)
_ROWS = [
    (
        1,
        "hé|llo",
        Decimal("12.34"),
        date(2020, 2, 29),
        datetime(2021, 1, 2, 3, 4, 5, 123000),
        -0.0,
        1.5,
        True,
        b"\x00\xff",
        [1, 2, None],
        {"a": "x", "b": None},
        (7, "z"),
    ),
    (None,) * 12,
    (
        2,
        "",
        Decimal("-0.01"),
        date(1969, 12, 31),
        datetime(1969, 12, 31, 23, 59, 59),
        3.14,
        -2.5,
        False,
        b"",
        [],
        {},
        (None, None),
    ),
]


def _schema_json():
    from pyspark.sql.types import StructType

    return avro_schema_of(StructType.fromDDL(_DDL))


def test_codec_roundtrip_all_types(spark):
    blob = serialize_avro(_ROWS, _schema_json())
    back = list(parse_avro(blob))
    assert len(back) == 3
    assert back[0][:9] == _ROWS[0][:9]
    assert back[0][9] == [1, 2, None] and back[0][10] == {"a": "x", "b": None}
    assert back[0][11] == {"a": 7, "b": "z"}  # struct decodes as dict
    assert back[1] == (None,) * 12
    assert back[2][:9] == _ROWS[2][:9]


def test_codec_null_codec_and_block_framing(spark):
    blob = serialize_avro(
        [(i, f"s{i}") for i in range(10000)],
        avro_schema_of(__import__("pyspark").sql.types.StructType.fromDDL("a int, b string")),
        codec="null",
    )
    rows = list(parse_avro(blob))  # >1 block (4096-row framing)
    assert rows == [(i, f"s{i}") for i in range(10000)]


def test_schema_evolution_on_read(spark):
    """avro_evolved_schemas.q contract: added reader field takes its
    default, dropped writer field is skipped, int promotes to long."""
    blob = serialize_avro(_ROWS, _schema_json())
    reader = json.dumps(
        {
            "type": "record",
            "name": "hive_record",
            "namespace": "default",
            "fields": [
                {"name": "k", "type": ["null", "long"], "default": None},
                {"name": "name", "type": ["null", "string"], "default": None},
                {"name": "added", "type": ["null", "string"], "default": None},
                {"name": "n_added", "type": "long", "default": 42},
            ],
        }
    )
    got = list(parse_avro(blob, reader))
    assert got == [
        (1, "hé|llo", None, 42),
        (None, None, None, 42),
        (2, "", None, 42),
    ]
    assert all(isinstance(r[0], int) or r[0] is None for r in got)


def test_missing_reader_field_without_default_raises(spark):
    blob = serialize_avro([(1,)], avro_schema_of(
        __import__("pyspark").sql.types.StructType.fromDDL("a int")))
    reader = json.dumps(
        {
            "type": "record",
            "name": "hive_record",
            "fields": [{"name": "nope", "type": "string"}],
        }
    )
    with pytest.raises(ValueError, match="no default"):
        list(parse_avro(blob, reader))


def test_corrupt_inputs_raise(spark):
    blob = serialize_avro(_ROWS, _schema_json())
    with pytest.raises(ValueError, match="bad magic"):
        list(parse_avro(b"NOPE" + blob[4:]))
    with pytest.raises(ValueError, match="truncated|sync|index"):
        list(parse_avro(blob[:-9]))  # chop inside the final sync/block


@settings(max_examples=25, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
            st.one_of(st.none(), st.text(max_size=40)),
            st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
            st.one_of(st.none(), st.binary(max_size=20)),
            st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
        ),
        max_size=60,
    ),
    codec=st.sampled_from(["null", "deflate"]),
)
def test_codec_property_roundtrip(rows, codec):
    from pyspark.sql.types import StructType

    sj = avro_schema_of(
        StructType.fromDDL("a int, s string, v double, b binary, l bigint")
    )
    assert list(parse_avro(serialize_avro(rows, sj, codec=codec))) == [
        tuple(r) for r in rows
    ]


def test_spark_roundtrip_in_memory(spark, tmp_path):
    """write_avro/read_avro on the in-memory session: pure-Python codec
    both ways, schema inferred from the file header."""
    df = spark.createDataFrame(_ROWS, _DDL)
    path = str(tmp_path / "avro_rt")
    write_avro(df, path)
    got = read_avro(spark, path)
    assert got.schema == df.schema
    assert sorted(
        (tuple(r) for r in got.drop("st").collect()),
        key=lambda t: (t[0] is None, t[0] or 0),
    ) == sorted(
        (tuple(r) for r in df.drop("st").collect()),
        key=lambda t: (t[0] is None, t[0] or 0),
    )


def test_spark_read_with_reader_schema(spark, tmp_path):
    """Evolution through the DataFrame API: reading with a wider DDL fills
    the new column with its default (NULL) and promotes int → bigint."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    path = str(tmp_path / "avro_ev")
    write_avro(df, path)
    got = read_avro(spark, path, "k bigint, s string, extra string")
    assert sorted(tuple(r) for r in got.collect()) == [
        (1, "a", None),
        (2, "b", None),
    ]
    assert got.schema.simpleString() == "struct<k:bigint,s:string,extra:string>"


def test_schema_inference_matches_writer(spark):
    from pyspark.sql.types import StructType

    target = StructType.fromDDL(_DDL)
    assert spark_schema_of(avro_schema_of(target)) == target


def test_datasource_split_partition_exactness(spark, tmp_path):
    """Sync-aligned splits must PARTITION a monolithic container's rows —
    no duplicates, no gaps — across any split size, including splits
    landing mid-block, exactly on a sync, or past EOF."""
    import os

    from hdp2_5_hive2_spark.storage.avro_datasource import read_avro_ds

    rows = [(i, f"s{i % 7}", None if i % 11 == 0 else float(i)) for i in range(20000)]
    sj = avro_schema_of(
        __import__("pyspark").sql.types.StructType.fromDDL(
            "k bigint, s string, v double"
        )
    )
    d = tmp_path / "mono"
    d.mkdir()
    (d / "part-0.avro").write_bytes(serialize_avro(rows, sj))
    size = os.path.getsize(d / "part-0.avro")
    want_sum = sum(r[0] for r in rows)
    for split in (size * 2, size // 3, 10_000, 4_096, 777):
        df = read_avro_ds(
            spark, str(d), "k bigint, s string, v double", split_size=split
        )
        assert df.count() == len(rows), split
        assert df.agg({"k": "sum"}).collect()[0][0] == want_sum, split


def test_datasource_mixed_writer_schemas(spark, tmp_path):
    """A directory whose files were written under DIFFERENT (evolved)
    writer schemas reads uniformly under one reader schema — per-file
    resolution, the avro_evolved_schemas.q contract split-parallel."""
    from hdp2_5_hive2_spark.storage.avro_datasource import read_avro_ds
    from pyspark.sql.types import StructType

    old = avro_schema_of(StructType.fromDDL("k int, s string"))
    new = avro_schema_of(StructType.fromDDL("k int, s string, score double"))
    d = tmp_path / "evolved"
    d.mkdir()
    (d / "a.avro").write_bytes(serialize_avro([(1, "a"), (2, "b")], old, seed="a"))
    (d / "b.avro").write_bytes(
        serialize_avro([(3, "c", 0.5), (4, None, None)], new, seed="b")
    )
    got = read_avro_ds(spark, str(d), "k bigint, s string, score double")
    assert sorted(tuple(r) for r in got.collect()) == [
        (1, "a", None),
        (2, "b", None),
        (3, "c", 0.5),
        (4, None, None),
    ]


def test_datasource_typed_predicates_and_filterless_reuse(spark, tmp_path):
    """Typed predicates (int range, string prefix, null tests, IN, NaN)
    evaluate engine-side above the scan and must match the same rows
    through createDataFrame; and the filtered-then-filterless access
    pattern over ONE loaded relation must stay exact — the pattern Spark
    4.1's Python-source filter pushdown silently corrupts (it reuses the
    most recent scan, consumed filters included), which is WHY this source
    implements no pushFilters."""
    import math

    from hdp2_5_hive2_spark.storage.avro_datasource import read_avro_ds
    from pyspark.sql.types import StructType

    rows = [
        (
            i,
            None if i % 13 == 0 else f"v{i % 9}",
            math.nan if i % 17 == 0 else float(i % 5),
        )
        for i in range(8000)
    ]
    sj = avro_schema_of(StructType.fromDDL("k bigint, s string, x double"))
    d = tmp_path / "push"
    d.mkdir()
    (d / "p0.avro").write_bytes(serialize_avro(rows, sj))
    ddl = "k bigint, s string, x double"
    truth = spark.createDataFrame(rows, ddl)

    def norm(rs):
        return sorted(
            tuple("NaN" if isinstance(v, float) and v != v else v for v in r)
            for r in rs
        )

    base = read_avro_ds(spark, str(d), ddl, split_size=10_000)
    assert base.rdd.getNumPartitions() > 1
    for pred in (
        "k >= 100 and k < 1000 and s = 'v5'",
        "s is null and k % 2 = 0",
        "s in ('v1','v2') and k > 7000",
        "s like 'v%' and k <= 50",
        "x = 2.0 and k < 500",
        "isnan(x)",
    ):
        got = norm(base.where(pred).collect())
        want = norm(truth.where(pred).collect())
        assert got == want and want, pred
        # the engine-bug access pattern: a filterless action right after a
        # filtered one on the same relation must still see every row
        assert base.count() == len(rows), pred


def test_hive_jvm_cross_parity(tmp_path):
    """Hive's own AvroContainerOutputFormat output must parse with the
    pure-Python reader (typed: decimal/date/timestamp-millis/array/map),
    and the Python writer's files must read back through a Hive EXTERNAL
    AVRO table — both directions, plus a deflate-compressed Hive write.
    Runs in a subprocess (hive catalog cannot coexist with the in-memory
    test session's JVM)."""
    repo = str(Path(__file__).resolve().parent.parent)
    script = f"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
d = {str(tmp_path)!r}
spark = (SparkSession.builder.master("local[4]")
    .config("spark.sql.warehouse.dir", d + "/wh")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.hadoop.javax.jdo.option.ConnectionURL",
            "jdbc:derby:;databaseName=" + d + "/metastore_db;create=true")
    .enableHiveSupport().getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from hdp2_5_hive2_spark.storage.avro import (
    write_avro, read_avro, parse_avro, _parse_header)
from datetime import date, datetime
from decimal import Decimal
import glob, json

ddl = ("k int, name string, amt decimal(10,2), d date, ts timestamp, "
       "v double, fl float, ok boolean, raw binary, xs array<int>, "
       "m map<string,string>")
rows = [
    (1, "hé|llo", Decimal("12.34"), date(2020,2,29),
     datetime(2021,1,2,3,4,5,123000), -0.0, 1.5, True,
     bytearray(b"\\x00\\xff"), [1,2,None], {{"a":"x"}}),
    (2, None, None, None, None, None, None, None, None, None, None),
]
df = spark.createDataFrame(rows, ddl)
expect = sorted((tuple(r) for r in df.collect()), key=lambda t: t[0])

# 1) hive JVM writes (write_avro dispatches to the DDL path), python parses
write_avro(df, d + "/hive_out")
fs = [f for f in glob.glob(d + "/hive_out/*") if "_SUCCESS" not in f]
got = sorted((r for f in fs for r in parse_avro(open(f, "rb").read())),
             key=lambda t: t[0])
assert got == expect, got

# 1b) hive's generated writer schema must equal our mapping field-for-field
_, meta, _ = _parse_header(open(fs[0], "rb").read())
hive_fields = json.loads(meta["avro.schema"].decode())["fields"]
from hdp2_5_hive2_spark.storage.avro import avro_schema_of
ours = json.loads(avro_schema_of(df.schema))["fields"]
assert hive_fields == ours, (hive_fields, ours)

# 2) python writes (forced), hive EXTERNAL AVRO table reads
write_avro(df, d + "/py_out", use_jvm=False)
back = read_avro(spark, d + "/py_out", ddl)  # hive session -> JVM scan
assert sorted((tuple(r) for r in back.collect()), key=lambda t: t[0]) == expect

# 2b) JVM-side evolution: read the same files with a wider reader schema
ev = read_avro(spark, d + "/py_out", "k bigint, name string, added string")
assert sorted((tuple(r) for r in ev.collect()), key=lambda t: t[0]) == [
    (1, "hé|llo", None), (2, None, None)], ev.collect()

# 3) hive writes DEFLATE-compressed, python parses (codec parity against
#    Java's deflater, not just our own writer)
spark.sql("SET hive.exec.compress.output=true")
spark.sql("SET avro.output.codec=deflate")
spark.sql("CREATE EXTERNAL TABLE av_z (k int, s string) "
          "STORED AS AVRO LOCATION '" + d + "/av_z'")
spark.sql("INSERT OVERWRITE TABLE av_z "
          "SELECT cast(id AS int), repeat('pad', 20) FROM range(500)")
zfs = [f for f in glob.glob(d + "/av_z/*") if "_SUCCESS" not in f]
_, zmeta, _ = _parse_header(open(zfs[0], "rb").read())
assert zmeta.get("avro.codec") == b"deflate", zmeta
zrows = sorted(r for f in zfs for r in parse_avro(open(f, "rb").read()))
assert zrows == sorted((i, "pad" * 20) for i in range(500)), zrows[:3]
print("AVRO_PARITY_OK")
"""
    import os

    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": repo},
    )
    assert "AVRO_PARITY_OK" in out.stdout, out.stdout + out.stderr[-4000:]
