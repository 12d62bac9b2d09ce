"""Top-level engine facade: the HiveServer2/CLI replacement surface.

The reference's entry points (SURVEY.md §3 — CliDriver.java:93,
HiveStatement.java:433 → ql/Driver.java) reduce to: hand the engine a SQL
string (or a table name), get rows back. This is that surface for the new
engine: one object wrapping the configured SparkSession + table registry,
so a reference user's workflow becomes

    from hdp2_5_hive2_spark.engine import Engine
    eng = Engine("/root/testdata/sf0.1")
    eng.sql("SELECT l_returnflag, count(*) FROM lineitem GROUP BY 1").show()
    eng.table("orders").filter("o_orderkey < 100").count()

Everything the engine supports beyond SQL (dedup, similarity, PTFs,
storage writers, streaming) hangs off the same session via the package
modules; `Engine` is the front door, not a wall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hdp2_5_hive2_spark.catalog import DEFAULT_SF_DIR, TABLES, register_views
from hdp2_5_hive2_spark.session import get_session


class Engine:
    """SQL + DataFrame front door over the driver's tables.

    Parameters
    ----------
    sf_dir: directory of parquet tables (defaults to $SPARK_GRAFT_SF_DIR).
    spark: bring-your-own SparkSession (e.g. the external driver's); when
        omitted a scale-configured session is built (AQE, skew join, Arrow,
        UTC — see session.get_session).
    """

    def __init__(self, sf_dir: str = DEFAULT_SF_DIR, spark: SparkSession | None = None):
        self.spark = spark or get_session()
        self.sf_dir = sf_dir
        self._tables = register_views(self.spark, sf_dir)

    def sql(self, query: str) -> DataFrame:
        """Run HiveQL-compatible SQL against the registered tables."""
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        """A registered table as a DataFrame (lazy plan, no I/O yet)."""
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; one of {TABLES}")
        return self._tables[name]

    def tables(self) -> tuple[str, ...]:
        return TABLES

    def explain(self, query: str) -> str:
        """Formatted physical plan for a SQL string (EXPLAIN parity)."""
        return (
            self.sql(query)
            ._jdf.queryExecution()
            .explainString(self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        )
