"""Full-registry structural sweep at sf0.1.

Runs EVERY registry query sequentially against $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[32] and prints per-query wall
time. This is the once-per-round structural check (PERF.md) that catches
quadratic shapes the sf0.01 oracles cannot see (it found cte_reuse's
2.08M-row self-join in round 5).

Usage: python tools/sweep_sf01.py [--only name1 name2 ...]
Output: one line per query `name seconds rows`, then a sorted slowest-10
summary and a single total line.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1 :])
    import bench as _bench

    print(f"host calibration (start): {_bench._host_calibration()}", flush=True)
    qmap = {k.split("_", 1)[1]: v for k, v in entry.queries().items()}
    timings: list[tuple[str, float, int]] = []
    errors = 0
    for name in sorted(qmap):
        if only is not None and name not in only:
            continue
        t0 = time.monotonic()
        try:
            n = qmap[name](spark, sf).count()
            dt = time.monotonic() - t0
            timings.append((name, dt, n))
            print(f"{name} {dt:.2f}s {n} rows", flush=True)
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            errors += 1
            print(f"{name} ERROR {type(exc).__name__}: {exc}", flush=True)
    print("--- slowest 10 ---")
    for name, dt, n in sorted(timings, key=lambda t: -t[1])[:10]:
        print(f"{name} {dt:.2f}s {n} rows")
    total = sum(t[1] for t in timings)
    print(f"host calibration (end): {_bench._host_calibration()}")
    print(f"TOTAL {len(timings)} queries {total:.1f}s, {errors} errors")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
