"""Calibration-bracketed warm re-measure of flagged bench residuals
against their r9 anchors (VERDICT r10 #2; generalized per VERDICT r12 #1
and #7 to take query names on the command line). Protocol:

- same-process warm best-of-7, bench.py's exact warmup;
- q9_product_profit and q10_returned_items as same-window controls,
  measured BEFORE AND AFTER the probes (r13 hardening: attempt 19 of the
  r13 hunt opened quiet — q10 hit its r9 anchor exactly — then a
  co-tenant burst landed mid-window and the late probes read 3-11x while
  the opening controls had already "validated" the window; a window now
  COUNTS only if BOTH control passes read within 1.15x of r9, closing
  that blind spot);
- host_calibration brackets before/after.

Usage:
    python tools/residual_remeasure.py [--until-validated N]
        [--names q1,q2,...] [--anchors q1=SEC,q2=SEC,...]

Defaults re-measure the three r12 driver-shot risers (VERDICT r12 #1)
against their r9 anchors: llm_semantic_dedup_lsh 2.109 s,
llm_chunk_dedup_keep_first 0.28 s, llm_quantized_ann_recall 0.563 s.
``--names`` picks probes whose anchors are already known (below);
``--anchors`` adds or overrides anchor seconds for new probes. A probe
still >1.3x inside a VALIDATED window ==> treat as a real regression and
bisect session-conf drift.

Run it opportunistically (takes ~2 min/window); append each JSON line to
PERF.md's current-round section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# r9-anchor seconds for every probe this tool has ever adjudicated
# (BENCH_r09.json values; the chain every later round compares against).
ANCHORS = {
    "q9_product_profit": 0.349,
    "q10_returned_items": 0.305,
    "llm_bigram_lm_score": 0.98,
    "llm_chunk_dedup_keep_first": 0.28,
    "llm_semantic_dedup_lsh": 2.109,
    "llm_quantized_ann_recall": 0.563,
}
CONTROLS = ("q9_product_profit", "q10_returned_items")
DEFAULT_PROBES = (
    "llm_semantic_dedup_lsh",
    "llm_chunk_dedup_keep_first",
    "llm_quantized_ann_recall",
)


def main() -> None:
    """One measurement window; with ``--until-validated N`` retry up to N
    windows (sleeping 5 min between attempts) and stop at the first whose
    controls validate — one JSON line per attempt either way."""
    from bench import _host_calibration
    from hdp2_5_hive2_spark.queries import REGISTRY
    from hdp2_5_hive2_spark.session import get_session

    attempts = 1
    probes = list(DEFAULT_PROBES)
    anchors = dict(ANCHORS)
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--until-validated":
            attempts = int(argv[i + 1])
            i += 2
        elif argv[i] == "--names":
            probes = [n for n in argv[i + 1].split(",") if n]
            i += 2
        elif argv[i] == "--anchors":
            for kv in argv[i + 1].split(","):
                k, v = kv.split("=", 1)
                anchors[k] = float(v)
            i += 2
        else:
            raise SystemExit(f"unknown arg {argv[i]!r}\n\n{__doc__}")
    names = list(CONTROLS) + [p for p in probes if p not in CONTROLS]
    missing = [n for n in names if n not in anchors]
    if missing:
        raise SystemExit(f"no anchor for {missing}; pass --anchors")

    sf_dir = "/root/testdata/sf0.1"
    spark = get_session(app_name="residual-remeasure")
    REGISTRY["q6_forecast_revenue"].fn(spark, sf_dir).count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id bigint").count()
    for tbl in ("documents", "embeddings", "orders", "customer", "events"):
        spark.read.parquet(f"{sf_dir}/{tbl}.parquet").count()

    def warm_best(name: str, n: int = 7) -> tuple[float, list[float]]:
        best = float("inf")
        samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            samples.append(round(dt, 3))
            best = min(best, dt)
        return best, samples

    for attempt in range(attempts):
        cb = _host_calibration()
        out: dict[str, dict] = {}
        for name in names:
            best, samples = warm_best(name)
            out[name] = {
                "best": round(best, 3),
                "ratio_vs_anchor": round(best / anchors[name], 3),
                "samples": samples,
            }
        # close the window with a SECOND control pass: the opening
        # controls prove the window started quiet, the closing ones that
        # it stayed quiet through the probes (r13 attempt-19 lesson)
        post: dict[str, dict] = {}
        for name in CONTROLS:
            best, samples = warm_best(name, 5)
            post[name] = {
                "best": round(best, 3),
                "ratio_vs_anchor": round(best / anchors[name], 3),
                "samples": samples,
            }
        ca = _host_calibration()
        validated = all(
            out[c]["ratio_vs_anchor"] <= 1.15
            and post[c]["ratio_vs_anchor"] <= 1.15
            for c in CONTROLS
        )
        print(
            json.dumps(
                {
                    "attempt": attempt,
                    "validated_window": validated,
                    "calib_before": cb,
                    "calib_after": ca,
                    "timings": out,
                    "post_controls": post,
                }
            ),
            flush=True,
        )
        if validated or attempt == attempts - 1:
            break
        time.sleep(300)


if __name__ == "__main__":
    main()
