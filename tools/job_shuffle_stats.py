"""Load-independent structural metrics per query: JOB COUNT and SHUFFLE
BYTES WRITTEN, via the Spark UI REST API (guide §7.1 — the UI's numbers,
scripted). Wall-clock on this host swings 2-10x under co-tenant storms
(PERF.md), but the number of jobs a query submits and the bytes its
exchanges shuffle are properties of the PLAN — byte-stable across load.

Usage:
  python tools/job_shuffle_stats.py name1 name2 ...

Prints, per query:  name  n_jobs  shuffle_write_bytes  (+ a total line).
The query runs once with the noop sink (computes every column/row).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    from hdp2_5_hive2_spark.queries import REGISTRY
    from hdp2_5_hive2_spark.session import get_session

    spark = get_session(
        app_name="job-shuffle-stats", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    # Warm pools so the measured run is steady-state (same as bench.py).
    REGISTRY["q6_forecast_revenue"].fn(spark, sf_dir).count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id bigint").count()

    print(f"# app {app_id} ui {ui}")
    total_jobs = 0
    total_shuffle = 0
    for name in names:
        before_jobs = {j["jobId"] for j in _get(base, "/jobs")}
        before_stage_ids = {s["stageId"] for s in _get(base, "/stages")}
        sc.setJobDescription(f"stats:{name}")
        df = REGISTRY[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        sc.setJobDescription(None)
        time.sleep(0.3)  # let the UI store catch up
        jobs = [j for j in _get(base, "/jobs") if j["jobId"] not in before_jobs]
        stages = [
            s
            for s in _get(base, "/stages?status=COMPLETE")
            if s["stageId"] not in before_stage_ids
        ]
        shuffle_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        shuffle_r = sum(s.get("shuffleReadBytes", 0) for s in stages)
        n_jobs = len(jobs)
        total_jobs += n_jobs
        total_shuffle += shuffle_w
        print(
            f"{name}  n_jobs={n_jobs}  shuffle_write={shuffle_w}  "
            f"shuffle_read={shuffle_r}  n_stages={len(stages)}"
        )
    print(f"TOTAL n_jobs={total_jobs} shuffle_write={total_shuffle}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
