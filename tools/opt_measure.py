"""Optimization-round measurement harness (guide §1).

Captures, for a set of registry queries at $SPARK_GRAFT_SF_DIR:
  - the physical plan (`explain formatted`) to plans/<round>/<name>_<tag>.txt
  - wall time per query, best-of-N, timed with the noop sink (computes every
    column of every row without sink cost — guide §1.4) and optionally with
    the bench's historical `count()` action for comparability.

Usage:
  python tools/opt_measure.py --tag before [--names n1 n2 ...] \
      [--runs 3] [--plans-dir plans/r13] [--no-time] [--count-action]

Prints one line per query `name  noop_sec [count_sec]  n_exchanges n_python`
then a total. Plans are only written when --plans-dir is given.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_DEFAULT: list[str] | None = None  # resolved from bench.HEADLINE + bench tags


def _plan_string(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def _plan_counts(plan: str) -> tuple[int, int]:
    n_ex = len(re.findall(r"^\s*\S*\s*Exchange", plan, flags=re.M))
    n_py = len(
        re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow|PythonMapInArrow", plan)
    )
    return n_ex, n_py


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument("--count-action", action="store_true",
                    help="also time the bench's historical count() action")
    args = ap.parse_args()

    from hdp2_5_hive2_spark.queries import REGISTRY
    from hdp2_5_hive2_spark.session import get_session

    import bench as _bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="opt-measure")
    spark.sparkContext.setLogLevel("ERROR")

    names = args.names
    if not names:
        names = [n for n in _bench.HEADLINE if n in REGISTRY]
        names += [
            n
            for n in REGISTRY
            if n not in names and REGISTRY[n].tags and "bench" in REGISTRY[n].tags
        ]

    # Same warmup as bench.py so timings are comparable.
    if not args.no_time:
        REGISTRY["q6_forecast_revenue"].fn(spark, sf_dir).count()
        spark.range(64).repartition(32).mapInPandas(lambda it: it, "id bigint").count()
        for tbl in ("documents", "embeddings", "orders", "customer", "events"):
            try:
                spark.read.parquet(f"{sf_dir}/{tbl}.parquet").count()
            except Exception:
                pass
        print(f"calib: {_bench._host_calibration()}", flush=True)

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    total = 0.0
    for name in names:
        fn = REGISTRY[name].fn
        df = fn(spark, sf_dir)
        plan = _plan_string(df)
        n_ex, n_py = _plan_counts(plan)
        if args.plans_dir:
            with open(f"{args.plans_dir}/{name}_{args.tag}.txt", "w") as f:
                f.write(plan)
        line = f"{name}"
        if not args.no_time:
            spark.sparkContext.setJobDescription(f"{name} [{args.tag}]")
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            line += f"  noop={best:.3f}"
            total += best
            if args.count_action:
                bc = float("inf")
                for _ in range(args.runs):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).count()
                    bc = min(bc, time.perf_counter() - t0)
                line += f"  count={bc:.3f}"
            spark.sparkContext.setJobDescription(None)
        print(f"{line}  exchanges={n_ex} python={n_py}", flush=True)
    if not args.no_time:
        print(f"TOTAL noop={total:.3f}  calib_after={_bench._host_calibration()}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
