"""Snappy codec: from-spec kernel vs snappy-java (the JVM's actual
implementation), Hadoop BlockCompressorStream framing, RCFile + Avro
snappy integration, and Hive-JVM cross-parity (subprocess)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdp2_5_hive2_spark.storage.snappy_codec import (
    hadoop_snappy_compress,
    hadoop_snappy_decompress,
    snappy_compress,
    snappy_decompress,
)

# repetitive + random mixes exercise literals, copies, and overlapping
# (RLE-style) copies
_payloads = st.one_of(
    st.binary(max_size=2000),
    st.builds(
        lambda chunk, reps, tail: chunk * reps + tail,
        st.binary(min_size=1, max_size=40),
        st.integers(1, 200),
        st.binary(max_size=30),
    ),
    st.builds(lambda b: b * 3000, st.binary(min_size=1, max_size=4)),
)


@settings(max_examples=80, deadline=None)
@given(data=_payloads)
def test_raw_roundtrip(data):
    assert snappy_decompress(snappy_compress(data)) == data


@settings(max_examples=40, deadline=None)
@given(data=_payloads)
def test_hadoop_framing_roundtrip(data):
    assert hadoop_snappy_decompress(hadoop_snappy_compress(data)) == data


def test_multi_block_framing():
    data = bytes(range(256)) * 2048  # 512 KiB → 2 hadoop blocks
    framed = hadoop_snappy_compress(data)
    assert hadoop_snappy_decompress(framed) == data


def test_corrupt_raises():
    good = snappy_compress(b"hello world" * 10)
    with pytest.raises(ValueError):
        snappy_decompress(good[:-3])
    with pytest.raises(ValueError):
        hadoop_snappy_decompress(b"\x00\x00\x00\x08\x00\x00")


def test_snappy_java_cross_parity(spark):
    """The decisive check: snappy-java (what Hive/Hadoop actually run)
    must read our streams and we must read its — on text, binary, and
    highly repetitive inputs."""
    S = spark._jvm.org.xerial.snappy.Snappy
    cases = [
        b"a",
        b"abcd" * 1000,
        bytes(range(256)) * 64,
        Path("/root/repo/SURVEY.md").read_bytes(),
        b"\x00" * 100000,
    ]
    for c in cases:
        assert snappy_decompress(bytes(S.compress(c))) == c
        assert bytes(S.uncompress(snappy_compress(c))) == c


def test_avro_snappy_roundtrip(spark):
    from pyspark.sql.types import StructType

    from hdp2_5_hive2_spark.storage.avro import (
        avro_schema_of,
        parse_avro,
        serialize_avro,
    )

    sj = avro_schema_of(StructType.fromDDL("a int, s string"))
    rows = [(i, f"repetitive padding {i % 7}") for i in range(5000)]
    blob = serialize_avro(rows, sj, codec="snappy")
    assert list(parse_avro(blob)) == rows
    # CRC must actually be validated
    bad = bytearray(blob)
    bad[-21] ^= 0xFF  # flip a byte inside the final block's payload
    with pytest.raises(ValueError):
        list(parse_avro(bytes(bad)))


def test_rcfile_snappy_python_roundtrip(spark):
    from hdp2_5_hive2_spark.storage.rcfile import (
        _SNAPPY_CODEC,
        parse_rcfile,
        serialize_rcfile,
    )

    rows = [(str(i), f"v{i % 5}" * 20, None if i % 3 else "x") for i in range(500)]
    blob = serialize_rcfile(rows, ncols=3, codec=_SNAPPY_CODEC)
    assert blob[4] == 1  # compressed flag set
    assert _SNAPPY_CODEC.encode() in blob[:80]
    assert list(parse_rcfile(blob)) == rows


def test_hive_jvm_snappy_cross_parity(tmp_path):
    """Hive writes SnappyCodec RCFile and snappy Avro → the pure-Python
    parsers read them (decoder vs snappy-java output); the Python writers'
    snappy files read back through Hive EXTERNAL tables (snappy-java vs
    our encoder). Subprocess, as the hive catalog cannot coexist with the
    in-memory test session."""
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
import glob
from hdp2_5_hive2_spark.storage.rcfile import parse_rcfile, serialize_rcfile, _SNAPPY_CODEC
from hdp2_5_hive2_spark.storage.avro import parse_avro, serialize_avro, avro_schema_of, _parse_header

# 1) hive writes SNAPPY RCFile, python parses
spark.sql("SET hive.exec.compress.output=true")
spark.sql("SET mapreduce.output.fileoutputformat.compress.codec="
          "org.apache.hadoop.io.compress.SnappyCodec")
spark.sql("CREATE EXTERNAL TABLE rc_s (k string, s string) "
          "STORED AS RCFILE LOCATION '" + d + "/rc_s'")
spark.sql("INSERT OVERWRITE TABLE rc_s "
          "SELECT cast(id AS string), repeat('pad', 20) FROM range(50)")
fs = [p for p in glob.glob(d + "/rc_s/*") if ".crc" not in p]
hdr = open(fs[0], "rb").read()
assert hdr[4] == 1 and b"SnappyCodec" in hdr[:80], hdr[:80]
rows = sorted(r for p in fs for r in parse_rcfile(open(p, "rb").read()))
assert rows == sorted((str(i), "pad" * 20) for i in range(50)), rows[:3]

# 2) python writes SNAPPY RCFile, hive reads
blob = serialize_rcfile([(str(i), "v" + str(i % 3)) for i in range(40)],
                        ncols=2, codec=_SNAPPY_CODEC)
import os
os.makedirs(d + "/rc_py", exist_ok=True)
open(d + "/rc_py/part-00000", "wb").write(blob)
spark.sql("CREATE EXTERNAL TABLE rc_py (k string, s string) "
          "STORED AS RCFILE LOCATION '" + d + "/rc_py'")
got = sorted(tuple(r) for r in spark.sql("SELECT * FROM rc_py").collect())
assert got == sorted((str(i), "v" + str(i % 3)) for i in range(40)), got[:3]

# 3) hive writes snappy AVRO, python parses
spark.sql("SET avro.output.codec=snappy")
spark.sql("CREATE EXTERNAL TABLE av_s (k int, s string) "
          "STORED AS AVRO LOCATION '" + d + "/av_s'")
spark.sql("INSERT OVERWRITE TABLE av_s "
          "SELECT cast(id AS int), repeat('pad', 20) FROM range(200)")
afs = [p for p in glob.glob(d + "/av_s/*") if "_SUCCESS" not in p]
_, meta, _ = _parse_header(open(afs[0], "rb").read())
assert meta.get("avro.codec") == b"snappy", meta
arows = sorted(r for p in afs for r in parse_avro(open(p, "rb").read()))
assert arows == sorted((i, "pad" * 20) for i in range(200)), arows[:3]

# 4) python writes snappy AVRO, hive reads
from pyspark.sql.types import StructType
sj = avro_schema_of(StructType.fromDDL("k int, s string"))
blob = serialize_avro([(i, "z" * 30) for i in range(100)], sj, codec="snappy")
os.makedirs(d + "/av_py", exist_ok=True)
open(d + "/av_py/part-00000.avro", "wb").write(blob)
spark.sql("CREATE EXTERNAL TABLE av_py (k int, s string) "
          "STORED AS AVRO LOCATION '" + d + "/av_py'")
got = sorted(tuple(r) for r in spark.sql("SELECT * FROM av_py").collect())
assert got == [(i, "z" * 30) for i in range(100)], got[:3]
print("SNAPPY_PARITY_OK")
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
    assert "SNAPPY_PARITY_OK" in out.stdout, out.stdout + out.stderr[-4000:]
