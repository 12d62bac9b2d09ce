"""Bench-riser adjudication (VERDICT r8 #6): re-measure every flagged
riser warm, best-of-N, in a dedicated session.

The whole-suite bench runs 40+ queries back to back; under co-tenant load
its small queries inflate uniformly and cold single shots flag phantom
regressions (the r8 llm_dsir_weights lesson — the judge's warm best-of-3
showed the driver's 1.45x "riser" was noise). This tool is the close-out
step that settles every flag with a number:

    python tools/riser_check.py BENCH_r08.json [current.json] [--factor 1.3]

- Reads the previous round's bench record (driver wrapper or raw line)
  and the current run (default: runs `python bench.py` fresh).
- For every shared query where current > factor × previous (and > 0.3 s),
  re-measures warm best-of-5 in THIS dedicated session and prints the
  verdict: `noise` (warm within the factor) or `REGRESSION` (warm still
  above) — the latter is the only case worth a code look.

Host-speed scaling (round 10): bench.py embeds fixed-work calibration
probes (calib_before/calib_after) in its JSON line. When the PREVIOUS
record carries them, both the flagging threshold and the warm verdicts
are scaled by the measured host-speed ratio (prev/suite-time for flags,
prev/now re-probed for verdicts) — round 10's host swung 20-40% on
fixed work between consecutive minutes, which made raw ratios
uninterpretable. Records without calibration (r9 and earlier) behave
exactly as before.

Exit code 1 iff any REGRESSION stands.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")


def _load(path: str) -> dict:
    d = json.load(open(path))
    if "parsed" in d:  # the driver's wrapper
        d = d["parsed"]
    return d


def _calib_hps(rec: dict) -> float | None:
    """Best single-core md5 reading recorded in a bench line (bench.py
    embeds calib_before/calib_after since round 10). Best-of: the
    less-degraded of the two brackets is the closer estimate of the
    host's own speed band."""
    readings = [
        c["md5_hps"]
        for k in ("calib_before", "calib_after")
        if isinstance(c := rec.get(k), dict) and "md5_hps" in c
    ]
    return max(readings) if readings else None


def main() -> int:
    argv = sys.argv[1:]
    args: list[str] = []
    factor = 1.3
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--factor"):
            if "=" in a:
                factor = float(a.split("=", 1)[1])
            else:  # space-separated form: consume the value token too
                factor = float(argv[i + 1])
                i += 1
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    if not args:
        print(__doc__)
        return 2
    prev_rec = _load(args[0])
    prev = prev_rec["queries"]
    if len(args) > 1:
        cur_rec = _load(args[1])
    else:
        out = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True
        )
        cur_rec = json.loads(out.stdout.strip().splitlines()[-1])
    cur = cur_rec["queries"]
    shared = sorted(set(prev) & set(cur))
    sp, sc = sum(prev[q] for q in shared), sum(cur[q] for q in shared)
    print(f"shared {len(shared)} queries: prev {sp:.2f}s -> cur {sc:.2f}s "
          f"ratio {sc / sp:.3f}")
    # Host-speed scaling (PERF.md round 10): when both records carry the
    # embedded calibration, a slower host inflates every timing — the
    # speed-scaled ratio is the code signal, the raw ratio is not.
    hp, hc = _calib_hps(prev_rec), _calib_hps(cur_rec)
    flag_scale = 1.0
    if hp and hc:
        flag_scale = hp / hc  # >1 means the current-suite host was slower
        print(f"host calibration: prev {hp:,.0f} -> cur {hc:,.0f} md5/s; "
              f"speed-scaled suite ratio {sc / sp / flag_scale:.3f} "
              f"(raw {sc / sp:.3f}, host slowdown {flag_scale:.3f}x)")
    flagged = [
        q for q in shared
        if cur[q] > prev[q] * factor * flag_scale and cur[q] > 0.3
    ]
    if not flagged:
        print("no risers flagged; nothing to adjudicate")
        return 0

    from pyspark.sql import functions as F  # noqa: F401  (session warm-up)

    from hdp2_5_hive2_spark.queries import REGISTRY
    from hdp2_5_hive2_spark.session import get_session

    # Re-probe at adjudication time: the warm loop runs minutes after the
    # suite, and round 10 measured 20-40% host swings on that timescale —
    # prev-vs-NOW is the right scaling for the warm verdicts, not
    # prev-vs-suite-time.
    verdict_scale = 1.0
    if hp:
        import bench as _bench

        now = _bench._host_calibration()["md5_hps"]
        verdict_scale = hp / now
        print(f"host calibration at adjudication: {now:,.0f} md5/s; "
              f"warm verdicts scaled by {verdict_scale:.3f}x")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="riser-check")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["q6_forecast_revenue"].fn(spark, sf_dir).count()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id bigint").count()
    regressions = 0
    for q in flagged:
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            REGISTRY[q].fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        verdict = (
            "REGRESSION" if best > prev[q] * factor * verdict_scale else "noise"
        )
        if verdict == "REGRESSION":
            regressions += 1
        print(
            f"{q}: prev {prev[q]:.3f}s suite {cur[q]:.3f}s "
            f"warm-best-of-5 {best:.3f}s -> {verdict}"
        )
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
