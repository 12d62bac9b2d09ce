"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the documented contract: for each corpus query, run the Spark
DataFrame and the oracle SQL on the same parquet tables, then compare
row count + column names + order-insensitive values. We compare exactly
(floats bitwise after float64 normalization) because the corpus is written
to be engine-exact; any mismatch here is a bug in the query pair.
"""

from __future__ import annotations

import math

import duckdb

from hdp2_5_hive2_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def rowset(rows, columns):
    """Order-insensitive multiset of rows with columns sorted by name."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted((tuple(_norm_cell(r[i]) for i in order) for r in rows), key=repr)


def _spark_pandas_kind(dtype, has_null: bool) -> str | None:
    """Predict the numpy-dtype *kind* a Spark column takes through the
    driver's pandas bridge. Only 'i'/'f' predictions matter (see dtype_guard);
    anything else returns None (unchecked)."""
    from pyspark.sql import types as T

    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "f" if has_null else "i"
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return "f"
    return None


def dtype_guard(spark_df, srows, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    """Driver-faithful dtype discipline: the driver hashes pandas frames, so a
    column that is int64 on one side and float64 on the other hash-mismatches
    even when every value compares equal (round-1 root cause: DuckDB returns
    HUGEINT for integer SUM/factorial → float64 via pandas, while Spark stays
    int64). Also rejects list-valued cells — the driver's canonicalizer
    crashes on unhashable list values."""
    ddf = con.execute(sql).df()
    scols = spark_df.columns
    col_idx = {c: i for i, c in enumerate(scols)}
    for field in spark_df.schema.fields:
        i = col_idx[field.name]
        cells = [r[i] for r in srows]
        if any(isinstance(v, (list, tuple, dict)) for v in cells):
            raise AssertionError(
                f"{name}.{field.name}: list/map-valued result column — the driver "
                "canon cannot hash it; serialize with array_join/to_json on both sides"
            )
        if field.name not in ddf.columns:
            continue
        s_kind = _spark_pandas_kind(field.dataType, any(v is None for v in cells))
        d_kind = ddf[field.name].dtype.kind
        if s_kind is not None and {s_kind, d_kind} == {"i", "f"}:
            raise AssertionError(
                f"{name}.{field.name}: int/float dtype divergence (spark~{s_kind!r} vs "
                f"duckdb {ddf[field.name].dtype}) — driver hash will mismatch; "
                "CAST the oracle expression (e.g. AS BIGINT) or COALESCE nullable ints"
            )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    sdf = spark_df
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), (
        f"{name}: column mismatch spark={sorted(scols)} duckdb={sorted(dcols)}"
    )
    assert len(srows) == len(drows), f"{name}: rowcount spark={len(srows)} duckdb={len(drows)}"

    s_set = rowset(srows, scols)
    d_set = rowset(drows, dcols)
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")

    dtype_guard(sdf, srows, con, sql, name=name)
