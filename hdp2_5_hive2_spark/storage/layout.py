"""Multi-dimensional data-layout (clustering) operators: Z-order keys and
the data-skipping audit that justifies them.

Heritage: the reference's layout levers are bucketing + sorted partitions
(HiveParser.g:1825 CLUSTERED BY ... SORTED BY, and list-bucketing under
ql/optimizer/listbucketingpruner); it has no multi-dimensional clustering.
Z-ordering is the standard lakehouse extension of that idea (Morton 1966;
the same key modern table formats use for multi-column clustering): rows
whose bit-interleaved key is close are close in EVERY interleaved dimension,
so min/max footer stats prune scans filtered on ANY of the dimensions —
single-column sorting only prunes its leading column.

Everything here is exact integer arithmetic (bit tests and shifts), so any
engine computes identical keys, and the audit tables hash-match bitwise.

Scale notes (100 TB):
  - `zvalue` is a pure map-side projection (32 codegen'd bit terms — no UDF,
    no shuffle). Writing a Z-clustered table is `df.repartitionByRange(
    zcol).sortWithinPartitions(zcol)` + the parquet writer: ONE range
    shuffle, identical cost to a plain global sort.
  - `zorder_audit` buckets by the TOP bits of the key (a fixed-width range
    split) rather than ntile, so NO global sort is needed to measure
    clustering quality: one groupBy(bucket) shuffle of bounded width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton/Z-order key of two non-negative integer columns: interleave
    the low ``bits`` bits of each (x in even positions, y in odd), yielding
    a 2*bits-bit BIGINT. Values are masked to ``bits`` bits first, so
    callers must pre-scale dimensions into [0, 2^bits).

    Pure column algebra — 2*bits AND/shift terms, fully codegen'd.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"zvalue: bits must be in [1, 31], got {bits}")
    xc = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    yc = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        xbit = F.shiftright(xc, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(yc, i).bitwiseAND(F.lit(1))
        z = z + xbit * F.lit(1 << (2 * i)) + ybit * F.lit(1 << (2 * i + 1))
    return z


def zorder_audit(
    df: DataFrame,
    x: Column | str,
    y: Column | str,
    bits: int = 16,
    bucket_bits: int = 4,
) -> DataFrame:
    """The data-skipping audit for a Z-ordered layout: split the keyspace
    into 2^bucket_bits fixed-width Z-ranges (the files a Z-clustered write
    would produce) and report each range's row count and per-dimension
    min/max span — exactly the parquet footer stats a scan with a filter
    on x OR y would prune against. Tight spans on BOTH dimensions are the
    point of Z-ordering; a single-column sort shows tight x spans but
    full-range y spans.

    Output: (bucket, n_rows, min_x, max_x, min_y, max_y), all BIGINT.
    Bucketing is a shift of the key's top bits — no global sort, one
    bounded groupBy shuffle."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("bigint").alias("_zx")
    yc = (F.col(y) if isinstance(y, str) else y).cast("bigint").alias("_zy")
    base = df.select(xc, yc)
    z = zvalue("_zx", "_zy", bits=bits)
    bucket = F.shiftright(z, 2 * bits - bucket_bits).alias("bucket")
    return (
        base.select(bucket, "_zx", "_zy")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_zx").alias("min_x"),
            F.max("_zx").alias("max_x"),
            F.min("_zy").alias("min_y"),
            F.max("_zy").alias("max_y"),
        )
    )
