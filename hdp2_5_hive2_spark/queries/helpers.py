"""Shared helpers for the corpus: exact-decimal money math.

Both Spark and DuckDB sum DECIMAL exactly and order-independently, so every
monetary aggregate goes through `dec()` and only the FINAL value is cast to
DOUBLE — identical bytes on both engines, immune to partition ordering.
(Plain double sums would differ in final ULPs between engines/runs.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec(c: Column | str, typ: str = DEC) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(typ)


def dsum(c: Column | str, alias: str) -> Column:
    """Exact decimal sum, surfaced as DOUBLE (matches `sum_dec` in oracles)."""
    return F.sum(dec(c)).cast("double").alias(alias)


def davg(c: Column | str, alias: str) -> Column:
    """Exact decimal sum / count, surfaced as DOUBLE."""
    col = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec(col)).cast("double") / F.count(col)).alias(alias)


# SQL-side equivalents for DuckDB oracles: keep these patterns in lockstep
# with dsum/davg above.
#   dsum:  CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS alias
#   davg:  CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x) AS alias
def sql_dsum(expr: str, alias: str, typ: str = "DECIMAL(18,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, typ: str = "DECIMAL(18,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE) / COUNT({expr}) AS {alias}"
