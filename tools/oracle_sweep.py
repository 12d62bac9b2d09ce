"""Multi-scale full-corpus oracle sweep — the round-end insurance step
that compares EVERY registry query against its DuckDB oracle at scales
the driver gate does not check (the gate runs sf0.01 only; decimal→double
rounding and empty-group edges are scale-dependent — this sweep caught
fn_covar_corr's last-ULP bug in round 7 before the driver could).

Usage: python tools/oracle_sweep.py [sf_dir ...]
Defaults to BOTH /root/testdata/sf0.001 and /root/testdata/sf0.01.
Runs in a bare session (the driver builds its own, so repo code must
self-configure). Exit 1 on any mismatch or error.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qs, os_ = entry.queries(), entry.oracle_sql()
    bad = 0
    for sf in sf_dirs:
        con = duckdb.connect()
        for t in _TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        fails: list[str] = []
        errs: list[tuple[str, str]] = []
        for name in sorted(qs):
            plain = re.sub(r"^\d+_", "", name)
            try:
                sdf = qs[name](spark, sf)
                srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
                if name in os_:
                    cur = con.execute(os_[name])
                    drows = sorted(
                        tuple(str(x) for x in r) for r in cur.fetchall()
                    )
                    scols = sorted(sdf.columns)
                    dcols = sorted(d[0] for d in cur.description)
                    if srows != drows or scols != dcols:
                        fails.append(plain)
            except Exception as e:  # noqa: BLE001 — sweep must finish
                errs.append((plain, str(e)[:160]))
        print(f"{sf}: {len(qs)} run, FAILS {len(fails)} {fails}, "
              f"ERRORS {len(errs)} {errs[:5]}")
        bad += len(fails) + len(errs)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
