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
