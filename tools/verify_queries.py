"""Driver-sim verification: run named corpus queries in a bare session and
hash-compare them against their DuckDB oracles, exactly like the external
driver does (rows + column names + order-insensitive values + dtype guard).

Usage: python tools/verify_queries.py name1 name2 ...   (plain names)
       python tools/verify_queries.py --all-new          (names not in any
                                                          CORRECTNESS file)
       python tools/verify_queries.py --all-new extra1 … (union of both —
                                                          explicit names no
                                                          longer get dropped)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    from hdp2_5_hive2_spark.queries.driver_order import green_union
    from tests.oracle import dtype_guard, duckdb_conn, rowset

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    qmap = {k.split("_", 1)[1]: v for k, v in entry.queries().items()}
    omap = {k.split("_", 1)[1]: v for k, v in entry.oracle_sql().items()}
    if "--all-new" in sys.argv:
        args = sorted((set(qmap) - green_union()) | set(args))
    sf = "/root/testdata/sf0.01"
    # BARE session on purpose — the external driver builds its own, so repo
    # code must self-configure (the verify skill's core gotcha).
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(sf)
    failures = 0
    for name in args:
        try:
            df = qmap[name](spark, sf)
            srows = df.collect()
            if name not in omap:
                print(f"{name}: rows-only ({len(srows)} rows)")
                continue
            sql = omap[name]
            dtype_guard(df, srows, con, sql, name)
            orows = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
            a = rowset([tuple(r) for r in srows], df.columns)
            b = rowset(orows, ocols)
            if sorted(df.columns) != sorted(ocols):
                print(f"{name}: SCHEMA MISMATCH {sorted(df.columns)} vs {sorted(ocols)}")
                failures += 1
            elif a == b:
                print(f"{name}: MATCH ({len(a)} rows)")
            else:
                failures += 1
                print(f"{name}: VALUE MISMATCH spark={len(a)} oracle={len(b)}")
                shown = 0
                bset = set(map(repr, b))
                for r in a:
                    if repr(r) not in bset and shown < 3:
                        print("  spark-only:", r)
                        shown += 1
                aset = set(map(repr, a))
                shown = 0
                for r in b:
                    if repr(r) not in aset and shown < 3:
                        print("  oracle-only:", r)
                        shown += 1
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
