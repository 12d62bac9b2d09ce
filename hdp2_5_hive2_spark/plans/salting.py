"""Explicit skew salting: two-phase aggregation and replicated-dimension
joins for hot keys.

When to use instead of AQE: AQE's skew handling splits oversized SHUFFLE
PARTITIONS of a sort-merge join at runtime — it does not help when (a) a
single aggregation key dominates (one reducer still owns the hot key's
final combine), or (b) the skewed side must hash-join against a build side
that can't be split. These helpers implement the classic remedies the
reference applied at compile time via SkewJoinOptimizer (union'd plans per
skewed key) — re-expressed as deterministic DataFrame rewrites:

  salted_aggregate: groupBy(key, salt) partial → groupBy(key) final.
    Identical result for any algebraic aggregate; the hot key's work spreads
    over `n_salts` reducers in phase 1 and the final combine touches only
    n_salts pre-aggregated rows per key.

  salted_join: fact side gets a random-but-deterministic salt in [0, n);
    the dimension side is replicated n times (one copy per salt value), so
    the hot key's probe rows spread across n tasks. Only valid for
    broadcast-unfriendly dimensions that are still small enough to
    replicate n-fold; inner/left joins preserved.

At 100 TB: pick n_salts ≈ (hot-key rows / target partition rows); the salt
is xxhash64-derived from a unique column so it is stable across retries
(no rand() — retried tasks must re-salt identically or shuffle files
disagree).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(unique_col: str | Column, n_salts: int) -> Column:
    col = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(col), F.lit(n_salts)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    unique_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: out_name → (agg_fn, col) with agg_fn in {sum, count, min, max}
    (the algebraic aggregates with a trivial combine; avg = sum/count at the
    caller). unique_col: any column whose values spread rows evenly (an id).
    """
    combine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn, _ in aggs.values():
        if fn not in combine:
            raise ValueError(f"non-algebraic aggregate {fn!r}")
    partial = (
        df.withColumn("_salt", _salt(unique_col, n_salts))
        .groupBy(*keys, "_salt")
        .agg(*[first[fn](c).alias(f"_p_{out}") for out, (fn, c) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[combine[fn](f"_p_{out}").alias(out) for out, (fn, _) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    unique_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dim side
    n_salts times, join on (keys + salt). Result equals fact.join(dim, on,
    how) for inner/left joins."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins")
    salted_fact = fact.withColumn("_salt", _salt(unique_col, n_salts))
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_fact.join(replicated_dim, [*on, "_salt"], how).drop("_salt")
