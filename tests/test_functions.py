"""Spark-side checks for the Hive function surface that DuckDB can't oracle:
libm transcendentals, Hive-specific functions (sentences, parse_url, xpath,
str_to_map, bround), and the hive_compat shims (field, create_union, $sum0).
Expected values are hand-computed from Hive 2.1 semantics
(ql/udf/, FunctionRegistry.java:170-470)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hdp2_5_hive2_spark.functions import HIVE_FUNCTIONS, hive_fn, missing_functions


def one_row(spark, expr_sql: str):
    return spark.sql(f"SELECT {expr_sql} AS v").collect()[0].v


def test_all_inventory_names_resolve(spark):
    assert missing_functions(spark) == []


def test_transcendentals(spark):
    assert one_row(spark, "ln(e())") == pytest.approx(1.0)
    assert one_row(spark, "log2(8)") == pytest.approx(3.0)
    assert one_row(spark, "log10(1000)") == pytest.approx(3.0)
    assert one_row(spark, "exp(0)") == 1.0
    assert one_row(spark, "sin(0)") == 0.0
    assert one_row(spark, "cos(0)") == 1.0
    assert one_row(spark, "atan(1)") == pytest.approx(math.pi / 4)
    assert one_row(spark, "degrees(pi())") == pytest.approx(180.0)
    assert one_row(spark, "radians(180)") == pytest.approx(math.pi)
    assert one_row(spark, "cbrt(27)") == pytest.approx(3.0)
    assert one_row(spark, "bround(2.5)") == 2  # banker's rounding (HALF_EVEN)
    assert one_row(spark, "bround(3.5)") == 4
    assert one_row(spark, "round(2.5)") == 3  # Hive round = HALF_UP


def test_hive_string_specials(spark):
    assert one_row(spark, "soundex('Robert')") == "R163"
    assert one_row(spark, "initcap('hello world')") == "Hello World"
    assert one_row(spark, "sentences('Hello there! How are you?')") == [
        ["Hello", "there"],
        ["How", "are", "you"],
    ]
    assert one_row(spark, "elt(2, 'a', 'b', 'c')") == "b"
    assert one_row(spark, "find_in_set('b', 'a,b,c')") == 2
    assert one_row(spark, "space(3)") == "   "
    assert one_row(spark, "locate('l', 'hello', 4)") == 4
    assert one_row(
        spark, "parse_url('https://example.com:8080/path?q=1#frag', 'HOST')"
    ) == "example.com"
    assert one_row(
        spark, "parse_url('https://example.com/path?q=1&r=2', 'QUERY', 'r')"
    ) == "2"
    assert one_row(spark, "str_to_map('a:1,b:2', ',', ':')") == {"a": "1", "b": "2"}
    assert one_row(spark, "translate('abcba', 'ab', 'xy')") == "xycyx"
    assert one_row(spark, "format_number(1234567.891, 2)") == "1,234,567.89"


def test_hive_hash_crypto(spark):
    assert one_row(spark, "crc32('ABC')") == 2743272264
    assert one_row(spark, "sha1('abc')") == "a9993e364706816aba3e25717850c26c9cd0d89d"
    assert (
        one_row(spark, "base64(aes_decrypt(aes_encrypt('msg', '0000111122223333'), '0000111122223333'))")
        == "bXNn"
    )
    assert one_row(spark, "hash(42)") is not None  # Murmur3, engine-internal


def test_xpath(spark):
    assert one_row(spark, "xpath_string('<a><b>bb</b></a>', 'a/b')") == "bb"
    assert one_row(spark, "xpath_int('<a><b>3</b></a>', 'a/b')") == 3
    assert one_row(spark, "xpath('<a><b>1</b><b>2</b></a>', 'a/b/text()')") == ["1", "2"]


def test_reflect(spark):
    assert one_row(spark, "reflect('java.lang.Math', 'max', 1, 2)") == "2"
    assert one_row(spark, "java_method('java.lang.String', 'valueOf', 7)") == "7"


def test_field_shim(spark):
    df = spark.range(1).select(
        hive_fn("field")(F.lit("b"), F.lit("a"), F.lit("b"), F.lit("c")).alias("f"),
        hive_fn("field")(F.lit("z"), F.lit("a"), F.lit("b")).alias("miss"),
    )
    row = df.collect()[0]
    assert row.f == 2 and row.miss == 0


def test_create_union_shim(spark):
    df = spark.range(1).select(
        hive_fn("create_union")(F.lit(1), F.lit("s"), F.lit(42)).alias("u")
    )
    row = df.collect()[0]
    assert row.u.tag == 1 and row.u.field1 == 42


def test_sum0_shim(spark):
    df = spark.range(5).filter("id > 100")  # empty
    assert df.select(hive_fn("$sum0")(F.col("id")).alias("s")).collect()[0].s == 0


def test_unsupported_raise():
    with pytest.raises(NotImplementedError):
        HIVE_FUNCTIONS["ewah_bitmap"]()


def test_udaf_statistical(spark):
    """std/variance/covar/corr family (FunctionRegistry.java:376-392)."""
    df = spark.createDataFrame([Row(x=1.0, y=2.0), Row(x=2.0, y=4.0), Row(x=3.0, y=6.0)])
    r = df.agg(
        F.stddev_pop("x").alias("sp"),
        F.stddev_samp("x").alias("ss"),
        F.var_pop("x").alias("vp"),
        F.var_samp("x").alias("vs"),
        F.covar_pop("x", "y").alias("cp"),
        F.covar_samp("x", "y").alias("cs"),
        F.corr("x", "y").alias("c"),
    ).collect()[0]
    assert r.vp == pytest.approx(2 / 3)
    assert r.vs == pytest.approx(1.0)
    assert r.sp == pytest.approx(math.sqrt(2 / 3))
    assert r.cs == pytest.approx(2.0)
    assert r.c == pytest.approx(1.0)


def test_udaf_sketches(spark):
    df = spark.range(1000).select((F.col("id") % 100).alias("x"))
    r = df.agg(
        F.percentile_approx("x", 0.5).alias("p50"),
        F.expr("percentile(x, 0.5)").alias("p50_exact"),
        F.expr("histogram_numeric(x, 5)").alias("hist"),
        F.approx_count_distinct("x").alias("acd"),
    ).collect()[0]
    assert 45 <= r.p50 <= 55
    assert r.p50_exact == pytest.approx(49.5)
    assert len(r.hist) == 5
    assert 90 <= r.acd <= 110
    s = df.agg(F.sort_array(F.collect_set("x")).alias("s")).collect()[0].s
    assert s == list(range(100))


def test_explode_family(spark):
    rows = spark.sql(
        "SELECT inline(array(struct(1, 'a'), struct(2, 'b')))"
    ).collect()
    assert len(rows) == 2
    rows = spark.sql("SELECT posexplode(map('k1', 1, 'k2', 2))").collect()
    assert len(rows) == 2
    rows = spark.sql(
        "SELECT json_tuple('{\"a\": 1, \"b\": \"x\"}', 'a', 'b')"
    ).collect()[0]
    assert rows[0] == "1" and rows[1] == "x"


def test_create_temporary_function_parity(spark):
    """CREATE [TEMPORARY] FUNCTION (ql/exec/FunctionTask.java, Registry.java)
    → spark.udf.register: a registered Python UDF is callable from SQL."""
    from pyspark.sql.types import StringType

    spark.udf.register(
        "initials", lambda s: "".join(w[0] for w in s.split("_") if w), StringType()
    )
    rows = spark.sql("SELECT initials('hello_spark_world') AS x").collect()
    assert rows[0].x == "hsw"


def test_pandas_grouped_agg_udaf(spark):
    """GenericUDAFEvaluator parity (ql/udf/generic/GenericUDAFEvaluator.java,
    4-mode partial/final) → pandas_udf GROUPED_AGG: Arrow-vectorized custom
    aggregate usable in groupBy and over a window."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(math.exp(__import__("numpy").log(v.clip(lower=1e-12)).mean()))

    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", 3.0), ("b", 27.0)], "k string, v double"
    )
    got = {r.k: round(r.g, 9) for r in df.groupBy("k").agg(geo_mean("v").alias("g")).collect()}
    assert got == {"a": 4.0, "b": 9.0}

    from pyspark.sql import Window as W

    w = W.partitionBy("k").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    over = df.withColumn("g", geo_mean("v").over(w)).collect()
    assert all(abs(r.g - got[r.k]) < 1e-9 for r in over)


def test_percentile_approx_bounded_error(spark):
    """percentile_approx (FunctionRegistry.java:394 — GK sketch in the
    reference, KLL-style in Spark): within 2 of the exact median of
    l_quantity (range 1..50) at accuracy 10000."""
    from hdp2_5_hive2_spark.catalog import load_tables
    from tests.conftest import SF_CORRECT

    li = load_tables(spark, SF_CORRECT)["lineitem"]
    exact = li.selectExpr("percentile(l_quantity, 0.5) AS p").first().p
    approx = li.selectExpr("percentile_approx(l_quantity, 0.5, 10000) AS p").first().p
    assert abs(approx - exact) <= 2, (approx, exact)


def test_legacy_grouping_id_hive21_bit_order(spark):
    """Drift guard for SURVEY §7's GROUPING__ID risk: the reference (Hive
    2.1, SemanticAnalyzer.java:3753-3766) numbers grouping-set keys with the
    leftmost key as the LEAST-significant bit and 1 = present, while Spark's
    grouping_id() is leftmost-as-MSB and 1 = aggregated. Pin both encodings
    side by side on a two-key rollup."""
    from hdp2_5_hive2_spark.functions.hive_compat import legacy_grouping_id

    df = spark.createDataFrame(
        [("r1", "a", 1), ("r1", "b", 2), ("r2", "c", 3)], "rk string, nm string, v int"
    )
    out = (
        df.rollup("rk", "nm")
        .agg(
            F.grouping_id().alias("modern"),
            legacy_grouping_id("rk", "nm").alias("hive21"),
            F.sum("v").alias("s"),
        )
        .collect()
    )
    pairs = {(r.modern, r.hive21) for r in out}
    # (rk, nm) detail rows: modern 0b00=0, hive21 0b11=3
    # rk subtotal:          modern 0b01=1, hive21 0b01=1
    # grand total:          modern 0b11=3, hive21 0b00=0
    assert pairs == {(0, 3), (1, 1), (3, 0)}


def test_mask_family_edges(spark):
    """Hive mask family edge cases: strings shorter than n, custom chars,
    NULL propagation, non-alnum chars untouched."""
    from hdp2_5_hive2_spark.functions import hive_compat as hc
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Ab3-Z",), ("x",), (None,)], "s string"
    ).select(
        hc.mask(F.col("s")).alias("m"),
        hc.mask(F.col("s"), "*", "*", "#").alias("mc"),
        hc.mask_first_n(F.col("s"), 3).alias("f3"),
        hc.mask_show_first_n(F.col("s"), 3).alias("sf3"),
        hc.mask_last_n(F.col("s"), 3).alias("l3"),
        hc.mask_show_last_n(F.col("s"), 3).alias("sl3"),
        hc.mask_hash(F.col("s")).alias("h"),
    )
    rows = df.collect()
    assert tuple(rows[0]) == (
        "Xxn-X", "**#-*", "Xxn-Z", "Ab3-X", "Abn-X", "Xx3-Z", rows[0].h
    )
    # short string: every variant masks/shows the whole thing consistently
    assert tuple(rows[1])[:6] == ("x", "*", "x", "x", "x", "x")
    assert all(v is None for v in tuple(rows[2]))


def test_mask_number_overload(spark):
    """GenericUDFMask.java:124-215 numeric transform: digit-count repunit of
    number_char, sign kept, zero stays zero (the Java digit loop never runs),
    Long.MIN_VALUE's 19 digits handled without abs() overflow."""
    from hdp2_5_hive2_spark.functions import hive_compat as hc
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0,), (7,), (123,), (-405,), (-9223372036854775808,), (None,)],
        "v long",
    ).select(
        hc.mask_number(F.col("v")).alias("m1"),
        hc.mask_number(F.col("v"), 9).alias("m9"),
        hc.mask_number(F.col("v"), 99).alias("mbad"),  # out of range -> default 1
    )
    got = [tuple(r) for r in df.collect()]
    assert got == [
        (0, 0, 0),
        (1, 9, 1),
        (111, 999, 111),
        (-111, -999, -111),
        (-1111111111111111111, None, -1111111111111111111),  # 9-repunit(19) overflows -> NULL (documented)
        (None, None, None),
    ]
    # dtype pin keeps the input's integral type
    narrow = spark.createDataFrame([(42,)], "v int").select(
        hc.mask_number(F.col("v"), 1, "int").alias("m")
    )
    assert narrow.schema["m"].dataType.simpleString() == "int"
    assert narrow.first().m == 11


def test_mask_date_overload(spark):
    """GenericUDFMask.java:220-226 date transform: java.util.Date 1900-epoch
    year and 0-based month kept verbatim; -1 retains a component; a day that
    overflows the pinned month normalizes forward exactly like new
    Date(y, m, d)."""
    import datetime

    from hdp2_5_hive2_spark.functions import hive_compat as hc
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(datetime.date(2016, 4, 15),), (None,)], "d date"
    ).select(
        hc.mask_date(F.col("d")).alias("def_"),
        hc.mask_date(F.col("d"), -1, -1, -1).alias("keep"),
        hc.mask_date(F.col("d"), 15, 5, -1).alias("md"),
        hc.mask_date(F.col("d"), -1, -1, 84).alias("y84"),
        # day=31 pinned into February of a non-leap retained year: Java's
        # new Date(115, 1, 31) normalizes to 2015-03-03
        hc.mask_date(F.col("d"), 31, 1, 115).alias("overflow"),
        # out-of-range knobs fall back to the defaults per init()'s clamps
        hc.mask_date(F.col("d"), 99, 42, 0).alias("clamped"),
    )
    rows = df.collect()
    assert tuple(rows[0]) == (
        datetime.date(1900, 1, 1),
        datetime.date(2016, 4, 15),
        datetime.date(2016, 6, 15),
        datetime.date(1984, 4, 15),
        datetime.date(2015, 3, 3),
        datetime.date(1900, 1, 1),
    )
    assert all(v is None for v in tuple(rows[1]))


def test_ewah_codec_known_vectors_and_fuzz():
    """EWAH long-array wire format (javaewah-0.3.2 writeExternal layout):
    exact known encodings, bit-63 signed-long wraparound, full-format
    decode incl. ones-runs (which the canonical encoder never emits but
    javaewah produces), and fuzzed round trips."""
    import random

    from hdp2_5_hive2_spark.functions.ewah import (
        _rlw,
        _to_signed,
        ewah_decode,
        ewah_encode,
    )

    assert ewah_encode([]) == [0, 1, 0, 0]
    # [sizeinbits, wordcount, RLW(run=0, lit=1), literal, rlwpos]
    assert ewah_encode([0]) == [1, 2, _to_signed(_rlw(0, 0, 1)), 1, 0]
    # bit 63 must serialize as a negative signed long
    enc63 = ewah_encode([63])
    assert enc63[3] == -(2**63) and ewah_decode(enc63) == [63]
    # zero-run across a word gap: RLW(run=3) then one literal
    enc = ewah_encode([200])
    assert enc == [201, 2, _to_signed(_rlw(0, 3, 1)), 1 << (200 % 64), 0]
    # ones-run decode (javaewah form)
    assert ewah_decode([128, 1, _to_signed(_rlw(1, 2, 0)), 0]) == list(range(128))
    assert ewah_decode(
        [130, 2, _to_signed(_rlw(1, 2, 1)), 0b11, 0]
    ) == list(range(130))
    rnd = random.Random(42)
    for _ in range(200):
        n = rnd.randrange(0, 250)
        ps = sorted(rnd.sample(range(100_000_000), n)) if n else []
        assert ewah_decode(ewah_encode(ps)) == ps


def test_ewah_column_ops(spark):
    """ewah_bitmap_and/or/empty through the HIVE_FUNCTIONS registry over
    real bitmap columns, including an empty intersection."""
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.functions import HIVE_FUNCTIONS, ewah

    df = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (1, 4), (2, 900)],
        "grp int, pos int",
    )
    bm = ewah.bitmap_agg(df, ["grp"], "pos")
    a = bm.filter("grp = 0").select(F.col("bitmap").alias("ba"))
    b = bm.filter("grp = 1").select(F.col("bitmap").alias("bb"))
    c = bm.filter("grp = 2").select(F.col("bitmap").alias("bc"))
    row = (
        a.crossJoin(b)
        .crossJoin(c)
        .select(
            ewah.bitmap_cardinality(
                HIVE_FUNCTIONS["ewah_bitmap_and"](F.col("ba"), F.col("bb"))
            ).alias("n_and"),
            ewah.bitmap_cardinality(
                HIVE_FUNCTIONS["ewah_bitmap_or"](F.col("ba"), F.col("bb"))
            ).alias("n_or"),
            HIVE_FUNCTIONS["ewah_bitmap_empty"](
                HIVE_FUNCTIONS["ewah_bitmap_and"](F.col("ba"), F.col("bc"))
            ).alias("disjoint_empty"),
            HIVE_FUNCTIONS["ewah_bitmap_empty"](F.col("ba")).alias("a_empty"),
        )
        .collect()[0]
    )
    assert row["n_and"] == 2 and row["n_or"] == 4
    assert row["disjoint_empty"] is True and row["a_empty"] is False


def test_ewah_run_aware_kernels():
    """VERDICT r5 #3: cardinality/empty/AND/OR must operate on the RLE
    form without materializing positions. A billion-bit all-set bitmap is
    ONE ones-run RLW — every op on it must be effectively O(1)."""
    import time

    from hdp2_5_hive2_spark.functions.ewah import (
        _rlw,
        _to_signed,
        ewah_cardinality,
        ewah_decode,
        ewah_encode,
        ewah_is_empty,
        ewah_merge,
    )

    nbits = 1 << 30  # 2^30 bits = 16,777,216 words, one RLW
    dense = [nbits, 1, _to_signed(_rlw(1, nbits // 64, 0)), 0]
    t0 = time.monotonic()
    assert ewah_cardinality(dense) == nbits
    assert ewah_is_empty(dense) is False
    both = ewah_merge(dense, dense, "and")
    assert ewah_cardinality(both) == nbits
    either = ewah_merge(dense, dense, "or")
    assert ewah_cardinality(either) == nbits
    none = ewah_merge(dense, ewah_encode([]), "and")
    assert ewah_is_empty(none) and ewah_cardinality(none) == 0
    assert time.monotonic() - t0 < 1.0, "run-aware ops must not decode bits"
    # a ones-run AND a sparse literal bitmap keeps only the sparse bits
    sparse = ewah_encode([0, 63, 64, nbits - 1, nbits + 5])
    inter = ewah_merge(dense, sparse, "and")
    assert ewah_decode(inter) == [0, 63, 64, nbits - 1]
    union = ewah_merge(dense, sparse, "or")
    assert ewah_cardinality(union) == nbits + 1


def test_ewah_merge_matches_set_algebra_fuzz():
    """Word-stream AND/OR vs plain set algebra over randomized bitmaps
    (mixed zero runs, ones runs via dense blocks, literals, unequal
    lengths)."""
    import random

    from hdp2_5_hive2_spark.functions.ewah import (
        ewah_decode,
        ewah_encode,
        ewah_merge,
    )

    rnd = random.Random(7)
    for _ in range(150):
        def mk():
            ps: set[int] = set()
            for _ in range(rnd.randrange(0, 4)):
                start = rnd.randrange(0, 5000)
                ps.update(range(start, start + rnd.randrange(1, 300)))
            ps.update(rnd.sample(range(100_000), rnd.randrange(0, 40)))
            return sorted(ps)

        a, b = mk(), mk()
        ea, eb = ewah_encode(a), ewah_encode(b)
        assert ewah_decode(ewah_merge(ea, eb, "and")) == sorted(
            set(a) & set(b)
        )
        assert ewah_decode(ewah_merge(ea, eb, "or")) == sorted(
            set(a) | set(b)
        )


def test_ewah_null_propagation(spark):
    """NULL bitmap arguments propagate NULL (Hive GenericUDF semantics,
    ADVICE r5) instead of raising in the pandas UDFs."""
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.functions import ewah
    from hdp2_5_hive2_spark.functions.ewah import ewah_encode

    df = spark.createDataFrame(
        [(0, ewah_encode([0, 5, 9]), None)],
        "id int, a array<bigint>, b array<bigint>",
    )
    row = df.select(
        ewah.bitmap_and(F.col("a"), F.col("b")).alias("x_and"),
        ewah.bitmap_or(F.col("b"), F.col("a")).alias("x_or"),
        ewah.bitmap_empty(F.col("b")).alias("x_empty"),
        ewah.bitmap_cardinality(F.col("b")).alias("x_card"),
        ewah.bitmap_cardinality(F.col("a")).alias("a_card"),
    ).collect()[0]
    assert row["x_and"] is None and row["x_or"] is None
    assert row["x_empty"] is None and row["x_card"] is None
    assert row["a_card"] == 3


def test_in_file(spark, tmp_path):
    """Hive in_file(str, filename): whole-line membership; NULL in -> NULL
    out (isin semantics); empty file -> always false."""
    from pyspark.sql import functions as F

    from hdp2_5_hive2_spark.functions import HIVE_FUNCTIONS

    f = tmp_path / "allow.txt"
    f.write_text("alpha\nbeta\n")
    df = spark.createDataFrame(
        [("alpha",), ("alp",), (None,), ("beta",)], "s string"
    )
    fn = HIVE_FUNCTIONS["in_file"]
    got = [r[0] for r in df.select(fn(F.col("s"), str(f))).collect()]
    assert got == [True, False, None, True], got
    empty = tmp_path / "empty.txt"
    empty.write_text("")
    got2 = [r[0] for r in df.select(fn(F.col("s"), str(empty))).collect()]
    assert got2 == [False, False, None, False], got2
    # BufferedReader.readLine semantics (ADVICE r5): \x0b, \x0c, \x85 and
    # U+2028 are NOT line terminators (str.splitlines would split on them);
    # \r, \n and \r\n are
    odd = tmp_path / "odd.txt"
    odd.write_bytes(
        "a\x0bb\ncr\rline\r\nlast tok".encode("utf-8")
    )
    df2 = spark.createDataFrame(
        [("a\x0bb",), ("a",), ("cr",), ("line",), ("last tok",)],
        "s string",
    )
    got3 = [r[0] for r in df2.select(fn(F.col("s"), str(odd))).collect()]
    assert got3 == [True, False, True, True, True], got3


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(max_examples=80, deadline=None)
    @given(
        positions=st.lists(
            st.integers(min_value=0, max_value=10_000_000),
            unique=True,
            max_size=200,
        )
    )
    def test_ewah_property_roundtrip(positions):
        """Any sorted distinct position set round-trips the EWAH wire
        format, and the serialized header fields stay self-consistent
        (wordCount matches, lastRLWPosition points inside the buffer)."""
        from hdp2_5_hive2_spark.functions.ewah import ewah_decode, ewah_encode

        ps = sorted(positions)
        arr = ewah_encode(ps)
        assert ewah_decode(arr) == ps
        size_in_bits, n_words = arr[0], arr[1]
        assert len(arr) == 2 + n_words + 1
        assert 0 <= arr[-1] < n_words
        assert size_in_bits == (ps[-1] + 1 if ps else 0)


def test_create_temporary_udtf_parity(spark):
    """Custom GenericUDTF parity (ql/udf/generic/GenericUDTF.java —
    user-defined TABLE functions registered via CREATE FUNCTION) →
    spark.udtf.register: a Python UDTF emits multiple rows per input and
    is callable from the SQL FROM clause (including the LATERAL form,
    Hive's LATERAL VIEW analogue)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, ngram string")
    class WordNgrams:
        def eval(self, text: str, n: int):
            toks = text.split()
            for i in range(len(toks) - n + 1):
                yield i + 1, " ".join(toks[i : i + n])

    spark.udtf.register("word_ngrams", WordNgrams)
    rows = spark.sql(
        "SELECT * FROM word_ngrams('the quick brown fox', 2)"
    ).collect()
    assert [(r.pos, r.ngram) for r in rows] == [
        (1, "the quick"),
        (2, "quick brown"),
        (3, "brown fox"),
    ]
    # LATERAL form over a table — the Hive LATERAL VIEW analogue for
    # CUSTOM table functions (built-in explode/posexplode are covered by
    # the lateral_view_* corpus queries)
    spark.createDataFrame(
        [(1, "a b c"), (2, "x y")], "id int, t string"
    ).createOrReplaceTempView("_udtf_src")
    got = spark.sql(
        "SELECT s.id, g.pos, g.ngram FROM _udtf_src s, "
        "LATERAL word_ngrams(s.t, 2) g ORDER BY s.id, g.pos"
    ).collect()
    assert [(r.id, r.pos, r.ngram) for r in got] == [
        (1, 1, "a b"),
        (1, 2, "b c"),
        (2, 1, "x y"),
    ]


def test_builtin_covar_corr_agree_with_moment_form(spark):
    """The built-in covar_pop/covar_samp/corr/var_pop/var_samp must agree
    with the exact-moment formulation used by fn_covar_corr to 1e-9
    relative — proving the corpus query computes the same statistics the
    Hive UDAFs define, just in the cross-engine-exact form."""
    import math

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(float(i % 13), float((i * 7) % 31)) for i in range(200)], "x double, y double"
    )
    b = df.agg(
        F.covar_pop("x", "y").alias("cp"),
        F.covar_samp("x", "y").alias("cs"),
        F.corr("x", "y").alias("r"),
        F.var_pop("x").alias("vp"),
        F.var_samp("x").alias("vs"),
    ).first()
    m = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).first()
    n = m.n
    cov0 = m.sxy - m.sx * m.sy / n
    varx = m.sxx - m.sx * m.sx / n
    vary = m.syy - m.sy * m.sy / n
    assert math.isclose(b.cp, cov0 / n, rel_tol=1e-9)
    assert math.isclose(b.cs, cov0 / (n - 1), rel_tol=1e-9)
    assert math.isclose(b.r, cov0 / (math.sqrt(varx) * math.sqrt(vary)), rel_tol=1e-9)
    assert math.isclose(b.vp, varx / n, rel_tol=1e-9)
    assert math.isclose(b.vs, varx / (n - 1), rel_tol=1e-9)


def test_reflect2_java_semantics(spark):
    """reflect2 shim equals Java instance-method semantics computed in
    Python: String.hashCode's 31-fold with int32 overflow (including the
    canonical "Hello World" == -862545276), trim's <= U+0020 class,
    0-based end-exclusive substring, indexOf's -1, Long.hashCode's
    v ^ (v >>> 32), and intValue's low-32 narrowing."""
    from hdp2_5_hive2_spark.functions.hive_compat import reflect2

    def jhash(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * 31 + ord(ch)) & 0xFFFFFFFF
        return h - (1 << 32) if h >= (1 << 31) else h

    def wrap32(v: int) -> int:
        v &= 0xFFFFFFFF
        return v - (1 << 32) if v >= (1 << 31) else v

    strs = ["Hello World", "", "  tab\there  ", "1-URGENT#42", "a"]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    got = {
        r.s: r
        for r in df.select(
            "s",
            reflect2(F.col("s"), "length").alias("ln"),
            reflect2(F.col("s"), "hashCode").alias("hc"),
            reflect2(F.col("s"), "trim").alias("tr"),
            reflect2(F.col("s"), "indexOf", "e").alias("io"),
            reflect2(F.col("s"), "substring", 1, 4).alias("sub"),
            reflect2(F.col("s"), "isEmpty").alias("em"),
            reflect2(F.col("s"), "startsWith", "He").alias("sw"),
            reflect2(F.col("s"), "replace", " ", "_").alias("rp"),
        ).collect()
    }
    java_space = "".join(chr(c) for c in range(0x21))
    for s in strs:
        r = got[s]
        assert r.ln == len(s)
        assert r.hc == jhash(s), s
        assert r.tr == s.strip(java_space)
        assert r.io == s.find("e")
        assert r.em == (len(s) == 0)
        assert r.sw == s.startswith("He")
        assert r.rp == s.replace(" ", "_")
        if len(s) >= 4:
            assert r.sub == s[1:4]
    assert jhash("Hello World") == -862545276  # reference anchor
    # Long.MAX/MIN rows (ADVICE r10): the old (c - INT32_LO)-then-pmod
    # wrap overflowed under ANSI for |v| >= 2^63 - 2^31, where Java's
    # intValue()/Long.hashCode() never throw.
    longs = [
        6692865316216747466,
        -5,
        4294967296,
        0,
        (1 << 63) - 1,   # Long.MAX_VALUE
        -(1 << 63),      # Long.MIN_VALUE
        (1 << 63) - (1 << 31),   # ANSI-overflow boundary of the old form
        -((1 << 63) - (1 << 31)),
    ]
    dl = spark.createDataFrame([(v,) for v in longs], "v bigint")
    got_l = {
        r.v: r
        for r in dl.select(
            "v",
            reflect2(F.col("v"), "hashCode", receiver="long").alias("hc"),
            reflect2(F.col("v"), "intValue").alias("iv"),
            reflect2(F.col("v"), "toString").alias("ts"),
        ).collect()
    }
    for v in longs:
        r = got_l[v]
        assert r.hc == wrap32(v ^ ((v % (1 << 64)) >> 32)), v
        assert r.iv == wrap32(v)
        assert r.ts == str(v)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="unsupported instance"):
        reflect2(F.col("v"), "getClass")
    with _pytest.raises(ValueError, match="take"):
        reflect2(F.col("v"), "length", 1)
    assert hive_fn("reflect2") is reflect2


def test_reflect2_fuzz_against_java_reference(spark):
    """Seeded fuzz of the reflect2 string methods against pure-Python
    Java semantics over a 300-string corpus mixing ASCII, BMP unicode,
    and the <= U+0020 control range (the trim class and the hashCode
    fold are the two places a shim could silently diverge)."""
    import random

    from hdp2_5_hive2_spark.functions.hive_compat import reflect2

    rng = random.Random(20260816)
    alphabet = (
        [chr(c) for c in range(0x01, 0x21)]          # Java-trim class
        + list("abcXYZ019 #@.")                       # ASCII mix
        + [chr(c) for c in (0x00E9, 0x4E2D, 0x203D)]  # BMP unicode
    )
    strs = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 24)))
        for _ in range(300)
    ]
    # Spark's F.split drops NUL bytes inconsistently across codepaths —
    # exclude \x00 from hashCode inputs the way Hive data never carries
    # NUL in practice; keep it for trim (regex class handles it).
    def jhash(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * 31 + ord(ch)) & 0xFFFFFFFF
        return h - (1 << 32) if h >= (1 << 31) else h

    java_space = "".join(chr(c) for c in range(0x21))
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strs)], "i int, s string"
    )
    got = {
        r.i: r
        for r in df.select(
            "i",
            reflect2(F.col("s"), "length").alias("ln"),
            reflect2(F.col("s"), "hashCode").alias("hc"),
            reflect2(F.col("s"), "trim").alias("tr"),
            reflect2(F.col("s"), "indexOf", "X").alias("io"),
            reflect2(F.col("s"), "toUpperCase").alias("up"),
        ).collect()
    }
    bad = []
    for i, s in enumerate(strs):
        r = got[i]
        want = (len(s), jhash(s), s.strip(java_space), s.find("X"), s.upper())
        have = (r.ln, r.hc, r.tr, r.io, r.up)
        if "\x00" in s:  # NUL handling differs engine-side; skip value rows
            continue
        if have != want:
            bad.append((repr(s), have, want))
    assert not bad, bad[:5]


def test_wrap_int32_fuzz_full_int64_range(spark):
    """Seeded fuzz of the overflow-free int32 wrap across the FULL int64
    range (ADVICE r10: the old form threw under ANSI for
    |v| >= 2^63 - 2^31): every value must narrow exactly like Java's
    (int) cast, computed independently via Python two's-complement."""
    import random

    from hdp2_5_hive2_spark.functions.hive_compat import _wrap_int32

    rng = random.Random(0xC0FFEE)
    vals = [0, 1, -1, (1 << 63) - 1, -(1 << 63), (1 << 31), -(1 << 31),
            (1 << 32), -(1 << 32), (1 << 62) + 12345]
    vals += [rng.randrange(-(1 << 63), 1 << 63) for _ in range(290)]

    def java_int(v: int) -> int:
        w = v & 0xFFFFFFFF
        return w - (1 << 32) if w >= (1 << 31) else w

    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    got = {
        r.v: r.w
        for r in df.select("v", _wrap_int32(F.col("v")).alias("w")).collect()
    }
    for v in vals:
        assert got[v] == java_int(v), v


def test_substring_index_fuzz_parity(spark):
    """F.substring_index must match a pure-Python MySQL-semantics splitter
    on a seeded corpus spanning the edge regimes: empty strings, leading/
    trailing/repeated delimiters, multi-char delimiters, unicode, absent
    delimiters, and counts from -6..6 plus out-of-range extremes — the
    property companion to the fn_substring_index corpus audit."""
    import random

    rng = random.Random(0xC0FFEE)
    alphabet = ["a", "b", "ab", "", "x", "δ", "0"]
    delims = [".", "ab", "δ", "--"]
    cases = []
    for _ in range(300):
        d = rng.choice(delims)
        s = "".join(
            rng.choice(alphabet + [d]) for _ in range(rng.randint(0, 12))
        )
        cases.append((s, d, rng.choice([-99, *range(-6, 7), 99])))
    cases += [("", ".", 2), ("...", ".", -2), ("a.b.c", ".", 0)]
    # Self-overlapping delimiters, pinned (ADVICE r12): Spark scans
    # occurrences advancing one position at a time, so '----' holds THREE
    # occurrences of '--' (at 0, 1, 2), not the two a split() would see.
    cases += [
        ("----", "--", 1), ("----", "--", 2), ("----", "--", 3),
        ("----", "--", -1), ("----", "--", -2), ("----", "--", -3),
        ("---", "--", 2), ("---", "--", -2), ("aaa", "aa", 2),
        ("aaaa", "aa", -2), ("δδδ", "δδ", 2),
    ]

    def ssi(s: str, delim: str, count: int) -> str:
        # Overlap-aware scan mirroring UTF8String.subStringIndex (Spark) /
        # Hive's ordinalIndexOf: each search resumes one position past the
        # PREVIOUS MATCH START, so self-overlapping delimiters ('--' in
        # '----') count every offset — not the non-overlapping occurrences
        # a split/join model sees (ADVICE r12).
        if count == 0 or not delim:
            return ""
        if count > 0:
            idx = -1
            for _ in range(count):
                idx = s.find(delim, idx + 1)
                if idx < 0:
                    return s
            return s[:idx]
        idx = len(s) - len(delim) + 1
        for _ in range(-count):
            # occurrence start must be <= idx - 1
            idx = s.rfind(delim, 0, idx - 1 + len(delim))
            if idx < 0:
                return s
        return s[idx + len(delim):]

    df = spark.createDataFrame(
        [(i, s, d, c) for i, (s, d, c) in enumerate(cases)],
        "i int, s string, d string, c int",
    )
    # the F.substring_index helper wants a literal delim/count — the SQL
    # expression form takes all three as columns, one job for every case
    got = {
        r.i: r.r
        for r in df.select(
            "i", F.expr("substring_index(s, d, c)").alias("r")
        ).collect()
    }
    want = {i: ssi(s, d, c) for i, (s, d, c) in enumerate(cases)}
    assert got == want
