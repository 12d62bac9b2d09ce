"""Calibration-bracketed warm re-measure of the round-10 bench residuals
(VERDICT r10 #2): `llm_bigram_lm_score` and `llm_chunk_dedup_keep_first`
flagged >1.3x vs r9 in the judge's best window while 14 sibling flags
cleared. Protocol (VERDICT r10 next-round #2):

- same-process warm best-of-7, bench.py's exact warmup;
- q9_product_profit and q10_returned_items as same-window controls;
- the window COUNTS only if both controls read within 1.15x of their r9
  numbers (q9 0.349 s, q10 0.305 s) — otherwise the host is hot and the
  sample is recorded but non-probative;
- host_calibration brackets before/after.

Run it opportunistically (takes ~90 s); append each JSON line to
PERF.md's round-11 section. A VALIDATED window with either residual
still >1.3x ==> treat as a real regression and bisect session-conf
drift (both modules are pre-r10 code with byte-identical plans).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R9 = {
    "q9_product_profit": 0.349,
    "q10_returned_items": 0.305,
    "llm_bigram_lm_score": 0.98,
    "llm_chunk_dedup_keep_first": 0.28,
}
CONTROLS = ("q9_product_profit", "q10_returned_items")


def main() -> None:
    """One measurement window; with ``--until-validated N`` retry up to N
    windows (sleeping 5 min between attempts) and stop at the first whose
    controls validate — one JSON line per attempt either way."""
    from bench import _host_calibration
    from hdp2_5_hive2_spark.queries import REGISTRY
    from hdp2_5_hive2_spark.session import get_session

    attempts = 1
    if "--until-validated" in sys.argv:
        attempts = int(sys.argv[sys.argv.index("--until-validated") + 1])

    sf_dir = "/root/testdata/sf0.1"
    spark = get_session(app_name="residual-remeasure")
    REGISTRY["q6_forecast_revenue"].fn(spark, sf_dir).count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id bigint").count()
    for tbl in ("documents", "embeddings", "orders", "customer", "events"):
        spark.read.parquet(f"{sf_dir}/{tbl}.parquet").count()

    for attempt in range(attempts):
        cb = _host_calibration()
        out: dict[str, dict] = {}
        for name in R9:
            best = float("inf")
            samples = []
            for _ in range(7):
                t0 = time.perf_counter()
                REGISTRY[name].fn(spark, sf_dir).count()
                dt = time.perf_counter() - t0
                samples.append(round(dt, 3))
                best = min(best, dt)
            out[name] = {
                "best": round(best, 3),
                "ratio_vs_r9": round(best / R9[name], 3),
                "samples": samples,
            }
        ca = _host_calibration()
        validated = all(out[c]["ratio_vs_r9"] <= 1.15 for c in CONTROLS)
        print(
            json.dumps(
                {
                    "attempt": attempt,
                    "validated_window": validated,
                    "calib_before": cb,
                    "calib_after": ca,
                    "timings": out,
                }
            ),
            flush=True,
        )
        if validated or attempt == attempts - 1:
            break
        time.sleep(300)


if __name__ == "__main__":
    main()
