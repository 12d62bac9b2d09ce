"""Golden-plan regeneration for the TPC-H suite.

The reference ships its performance suite as an EXPLAIN-PLAN regression
harness (TestPerfCliDriver over 60 TPC-DS queries — plans diffed against
golden files, no timings; BASELINE.md row 1,
data/scripts/q_perf_test_init.sql:36). This is the same harness for this
engine: the NORMALIZED Catalyst optimized plan of every TPC-H query is
checked into tests/golden_plans/ and tests/test_plan_goldens.py diffs the
live plan against it — so a lost filter pushdown, a dropped broadcast
hint, a widened scan schema, or a join-order change fails CI loudly
instead of surfacing as a 100 TB regression.

Normalization strips run-varying noise (expression ids, file paths,
plan ids, stats) and keeps everything structural: operators, join types
and hints, pushed filters, pruned relation schemas, aggregate exprs.

Usage: python tools/plan_goldens.py [--check]   (regenerate | diff only)
"""

from __future__ import annotations

import pathlib
import re
import sys

sys.path.insert(0, ".")

GOLDEN_DIR = pathlib.Path(__file__).resolve().parents[1] / "tests" / "golden_plans"
SF_DIR = "/root/testdata/sf0.001"


def normalize(plan: str) -> str:
    plan = re.sub(r"#\d+L?", "#N", plan)
    plan = re.sub(r"file:[^\],\s]+", "PATH", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
    plan = re.sub(r"Statistics\([^)]*\)", "STATS", plan)
    plan = re.sub(r"cachedrdd-\d+", "cachedrdd-N", plan)
    return plan.rstrip() + "\n"


def golden_names() -> list[str]:
    from hdp2_5_hive2_spark.queries import REGISTRY

    return sorted(n for n in REGISTRY if re.match(r"q\d+_", n))


def live_plan(spark, name: str) -> str:
    from hdp2_5_hive2_spark.queries import REGISTRY

    df = REGISTRY[name].fn(spark, SF_DIR)
    return normalize(df._jdf.queryExecution().optimizedPlan().toString())


def main() -> int:
    from pyspark.sql import SparkSession

    check = "--check" in sys.argv
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    GOLDEN_DIR.mkdir(exist_ok=True)
    bad = []
    for name in golden_names():
        got = live_plan(spark, name)
        path = GOLDEN_DIR / f"{name}.txt"
        if check:
            want = path.read_text() if path.exists() else ""
            status = "OK" if got == want else "DIFF"
            if status == "DIFF":
                bad.append(name)
            print(f"{name}: {status}")
        else:
            path.write_text(got)
            print(f"{name}: wrote {len(got.splitlines())} lines")
    if check and bad:
        print(f"PLAN DRIFT in {len(bad)}: {bad}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
