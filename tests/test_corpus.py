"""Correctness gate: every corpus query with an oracle must match DuckDB
exactly at sf0.01 — the same check the driver runs for CORRECTNESS_r{N}.json.
Oracle-less queries get a rows-run sanity check."""

from __future__ import annotations

import pytest

from hdp2_5_hive2_spark.queries import REGISTRY
from tests.conftest import SF_CORRECT
from tests.oracle import compare, duckdb_conn


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_CORRECT)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_vs_oracle(spark, con, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_CORRECT)
    if spec.oracle is None:
        n = df.count()
        assert n >= 0
    else:
        compare(df, con, spec.oracle, name=name)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"])
def test_fn_covar_corr_multi_scale(spark, sf_dir):
    """fn_covar_corr is the one query whose moments exceed 2^53 unscaled
    (squared prices, scale 4), where decimal→double conversion actually
    rounds — a half-ULP boundary flipped corr's last bit between engines
    at sf0.001 until the string-routed cast (r7). Pin it at the scales
    the default gate does NOT cover."""
    spec = REGISTRY["fn_covar_corr"]
    c = duckdb_conn(sf_dir)
    try:
        compare(spec.fn(spark, sf_dir), c, spec.oracle, name="fn_covar_corr")
    finally:
        c.close()
