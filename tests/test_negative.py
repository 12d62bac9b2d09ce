"""Error-path tests — the reference's clientnegative corpus (SURVEY §5: 748
error-path q-files) in miniature: malformed queries and misuse must fail
with analysis errors, not wrong results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from hdp2_5_hive2_spark.catalog import load_tables, register_views
from hdp2_5_hive2_spark.functions import hive_fn
from hdp2_5_hive2_spark.plans import salted_aggregate, salted_join
from hdp2_5_hive2_spark.storage.writer import insert_overwrite
from tests.conftest import SF_CORRECT


def test_unknown_column_rejected(spark):
    register_views(spark, SF_CORRECT)
    with pytest.raises(AnalysisException):
        spark.sql("SELECT no_such_column FROM nation").collect()


def test_unknown_table_rejected(spark):
    with pytest.raises(AnalysisException):
        spark.sql("SELECT * FROM definitely_not_a_table").collect()


def test_aggregate_in_where_rejected(spark):
    register_views(spark, SF_CORRECT)
    with pytest.raises(AnalysisException):
        spark.sql("SELECT n_regionkey FROM nation WHERE COUNT(*) > 1").collect()


def test_nonaggregated_column_rejected(spark):
    register_views(spark, SF_CORRECT)
    with pytest.raises(AnalysisException):
        spark.sql("SELECT n_name, COUNT(*) FROM nation GROUP BY n_regionkey").collect()


def test_ambiguous_column_rejected(spark):
    register_views(spark, SF_CORRECT)
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT n_nationkey FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey"
        ).collect()


def test_unknown_hive_function_rejected():
    with pytest.raises(KeyError):
        hive_fn("definitely_not_a_hive_function")


def test_bad_storage_format_rejected(spark):
    nation = load_tables(spark, SF_CORRECT)["nation"]
    with pytest.raises(ValueError):
        insert_overwrite(nation, "/tmp/hdp2_5_hive2_spark_io/bad", fmt="rcfile")


def test_salted_aggregate_rejects_nonalgebraic(spark):
    li = load_tables(spark, SF_CORRECT)["lineitem"]
    with pytest.raises(ValueError):
        salted_aggregate(
            li, ["l_returnflag"], {"a": ("avg", "l_quantity")}, "l_orderkey"
        )


def test_salted_join_rejects_outer(spark):
    t = load_tables(spark, SF_CORRECT)
    with pytest.raises(ValueError):
        salted_join(t["orders"], t["customer"], ["o_custkey"], "o_orderkey", how="full")


def test_asof_join_rejects_bad_args(spark):
    from hdp2_5_hive2_spark.timeseries import asof_join

    df = spark.createDataFrame([(1, 1)], "k bigint, ts bigint")
    with pytest.raises(ValueError, match="how"):
        asof_join(df, df, on=["k"], how="full")
    with pytest.raises(ValueError, match="direction"):
        asof_join(df, df, on=["k"], direction="nearest")


def test_range_join_rejects_bad_args(spark):
    from hdp2_5_hive2_spark.plans.range_join import bucketed_range_join

    l = spark.createDataFrame([(1, 1.0)], "id bigint, v double")
    r = spark.createDataFrame([(0, 0.0, 2.0)], "tier int, lo double, hi double")
    with pytest.raises(ValueError, match="inner"):
        bucketed_range_join(l, "v", r, "lo", "hi", 1.0, how="full")
    with pytest.raises(ValueError, match="positive"):
        bucketed_range_join(l, "v", r, "lo", "hi", 0.0)


def test_connected_components_empty_edges(spark):
    from hdp2_5_hive2_spark.llm import curation

    edges = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    assert curation.connected_components(edges).count() == 0
