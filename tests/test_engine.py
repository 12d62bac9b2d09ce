"""Engine facade: the CLI/HiveServer2-replacement surface (SURVEY §3)."""

from __future__ import annotations

import pytest

from hdp2_5_hive2_spark.engine import Engine
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(SF_CORRECT, spark=spark)


def test_sql_roundtrip(eng):
    rows = eng.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag"
    ).collect()
    assert {r.l_returnflag for r in rows} == {"A", "N", "R"}


def test_table_access(eng):
    assert eng.table("nation").count() == 25
    with pytest.raises(KeyError):
        eng.table("nope")


def test_explain_shows_physical_plan(eng):
    plan = eng.explain("SELECT COUNT(*) FROM lineitem WHERE l_quantity > 10")
    assert "Physical Plan" in plan and "Scan parquet" in plan
