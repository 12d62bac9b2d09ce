"""Independent references for the round-10 pipeline2 corpus: each test
recomputes a registered query's answer a THIRD way — pure Python/numpy
from the raw parquet rows, sharing no code with either the Spark
implementation or its DuckDB oracle — so a conceptual error the two
engines could share (same formula transcribed twice) cannot hide behind
a hash match. The r9 precedent: power-iteration/centroid-drift numpy
references, contamination-span Python scan."""

from __future__ import annotations

import hashlib

from hdp2_5_hive2_spark.catalog import load_tables
from tests.conftest import SF_CORRECT


def _docs(spark):
    return {
        r.doc_id: (r.source, r.text.strip().split())
        for r in load_tables(spark, SF_CORRECT)["documents"]
        .select("doc_id", "source", "text")
        .collect()
    }


def _trunc_div(a: int, b: int) -> int:
    """Truncation toward zero — Spark `div` / DuckDB `//` semantics,
    which differ from Python's floor `//` for negative numerators."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_ppswor_sample_matches_hashlib(spark):
    """The stratified bottom-5-by-md5-priority sample equals a hashlib
    recomputation of the same priority keys."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    want = set()
    by_src: dict[str, list[tuple[str, int]]] = {}
    for did, (src, _) in _docs(spark).items():
        pri = hashlib.md5(f"{did}:smp".encode()).hexdigest()
        by_src.setdefault(src, []).append((pri, did))
    for src, rows in by_src.items():
        for rk, (_, did) in enumerate(sorted(rows)[:5], start=1):
            want.add((src, rk, did))
    got = {
        (r.source, r.rk, r.doc_id)
        for r in REGISTRY["llm_ppswor_sample"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_mixture_interleave_matches_python_wfq(spark):
    """The realized schedule equals a pure-Python weighted-fair-queueing
    fold (md5 per-source shuffle, finish-time keys i·(6/w), global order),
    and every schedule prefix tracks the 3:2:1 ratio within one item."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    wts = {"src0": 3, "src1": 2, "src2": 1}
    keyed = []
    by_src: dict[str, list[tuple[str, int]]] = {}
    for did, (src, _) in _docs(spark).items():
        if src in wts:
            pri = hashlib.md5(f"{did}:ord".encode()).hexdigest()
            by_src.setdefault(src, []).append((pri, did))
    for src, rows in by_src.items():
        for i, (_, did) in enumerate(sorted(rows), start=1):
            keyed.append((i * (6 // wts[src]), src, did))
    sched = sorted(keyed)[:30]
    want = [(pos, s, d, v) for pos, (v, s, d) in enumerate(sched, start=1)]
    got = sorted(
        (r.pos, r.source, r.doc_id, r.vkey)
        for r in REGISTRY["llm_mixture_interleave"].fn(spark, SF_CORRECT).collect()
    )
    assert got == want
    # WFQ fairness: in every prefix of length L, a weight-w source has
    # emitted within one item of L·w/6 (the finish-time guarantee the
    # docstring promises data loaders).
    seen = {s: 0 for s in wts}
    for pos, src, _, _ in got:
        seen[src] += 1
        for s, w in wts.items():
            assert abs(seen[s] - pos * w / 6.0) <= 1.0, (pos, s, seen)


def test_temperature_sweep_matches_python_bitwise(spark):
    """Every w_rel double equals the same fixed IEEE chain (one division,
    then sqrt / sqrt∘sqrt) computed in Python — bitwise, not approx —
    and the integer quotas equal floor(w·1000)."""
    import math

    from hdp2_5_hive2_spark.queries import REGISTRY

    counts: dict[str, int] = {}
    for _, (src, toks) in _docs(spark).items():
        counts[src] = counts.get(src, 0) + len(toks)
    n_max = max(counts.values())
    want = {}
    for src, n in counts.items():
        r = n / n_max
        for lab, w in (("t100", r), ("t050", math.sqrt(r)),
                       ("t025", math.sqrt(math.sqrt(r)))):
            want[(lab, src)] = (n, w, int(math.floor(w * 1000.0)))
    got = {
        (r.t_label, r.source): (r.n_tokens, r.w_rel, r.quota_per_1k_of_max)
        for r in REGISTRY["llm_temperature_sweep"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want  # exact float equality is the point


def test_span_dedup_mask_union_matches_position_sets(spark):
    """The least(8, gap) window-union formula equals a literal union of
    masked-position SETS — the strongest check on the interval
    arithmetic, since both engines use the formula and neither
    materializes positions."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = {d: toks for d, (_, toks) in _docs(spark).items()}
    ev = set()
    for did, toks in docs.items():
        if did % 29 == 0:
            for i in range(len(toks) - 7):
                ev.add(" ".join(toks[i : i + 8]))
    want = {}
    for did, toks in docs.items():
        if did % 29 == 0:
            continue
        masked: set[int] = set()
        hit = False
        for i in range(len(toks) - 7):
            if " ".join(toks[i : i + 8]) in ev:
                hit = True
                masked.update(range(i, i + 8))
        if hit:
            n = len(toks)
            want[did] = (n, len(masked), (n - len(masked)) * 1000 // n)
    got = {
        r.doc_id: (r.n_tokens, r.masked_tokens, r.retained_milli)
        for r in REGISTRY["llm_span_dedup_mask"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_dedup_threshold_sweep_matches_python_sets(spark):
    """The threshold curve equals exact Jaccard over Python 8-gram SETS
    on the same planted corpus (drop-last and three-quarter truncation
    bands), enumerating candidate pairs the slow way."""
    from itertools import combinations

    from hdp2_5_hive2_spark.queries import REGISTRY

    base = {d: toks for d, (_, toks) in _docs(spark).items() if d < 120}
    corpus = dict(base)
    for d, toks in base.items():
        if d < 40 and len(toks) >= 10:
            corpus[d + 2000000] = toks[:-1]
        if d < 40 and len(toks) >= 16:
            corpus[d + 4000000] = toks[: (3 * len(toks)) // 4]
    grams = {
        d: {" ".join(t[i : i + 8]) for i in range(len(t) - 7)}
        for d, t in corpus.items()
    }
    grams = {d: g for d, g in grams.items() if g}
    want = {70: 0, 80: 0, 90: 0}
    for da, db in combinations(sorted(grams), 2):
        i = len(grams[da] & grams[db])
        if not i:
            continue
        u = len(grams[da]) + len(grams[db]) - i
        for thr in want:
            if i * 100 >= thr * u:
                want[thr] += 1
    got = {
        r.thr_pct: r.n_pairs
        for r in REGISTRY["llm_dedup_threshold_sweep"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want
    # the planted bands must actually separate the thresholds
    assert got[70] > got[90], got


def test_rank_stability_matches_python_kendall(spark):
    """The Kendall-tau audit equals a pure-Python recomputation: both
    saturated-impact runs, top-15 cuts, concordant/discordant pair scan,
    truncating thousandths."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    wa = {"spark": 3, "join": 2, "window": 2, "table": 1, "query": 1}
    wb = {"query": 3, "table": 2, "merge": 2, "spark": 1, "join": 1}
    terms = set(wa) | set(wb)
    tf: dict[int, dict[str, int]] = {}
    for did, (_, toks) in _docs(spark).items():
        for t in toks:
            if t in terms:
                tf.setdefault(did, {})[t] = tf.setdefault(did, {}).get(t, 0) + 1

    def top15(w: dict[str, int]) -> dict[int, int]:
        scored = []
        for did, cnts in tf.items():
            s = sum(w.get(t, 0) * min(c, 5) for t, c in cnts.items())
            if s > 0:
                scored.append((-s, did))
        return {did: r for r, (_, did) in enumerate(sorted(scored)[:15], start=1)}

    ra, rb = top15(wa), top15(wb)
    common = sorted(set(ra) & set(rb))
    conc = disc = 0
    for i, x in enumerate(common):
        for y in common[i + 1 :]:
            if (ra[x] - ra[y]) * (rb[x] - rb[y]) > 0:
                conc += 1
            else:
                disc += 1
    tau = _trunc_div((conc - disc) * 1000, conc + disc) if conc + disc else 0
    [row] = REGISTRY["llm_rank_stability"].fn(spark, SF_CORRECT).collect()
    assert (row.n_common, row.concordant, row.discordant, row.tau_milli) == (
        len(common), conc, disc, tau,
    )


def test_opq_rotation_audit_matches_numpy(spark):
    """The before/after bucket-occupancy stats equal a numpy bitmask
    computation with hashlib-derived permutation and signs; the signed
    permutation must preserve total vector count and cannot worsen
    nothing (sanity: both variants cover all vectors)."""
    import collections

    import numpy as np

    from hdp2_5_hive2_spark.queries import REGISTRY

    emb = load_tables(spark, SF_CORRECT)["embeddings"]
    Q = np.floor(
        np.asarray(
            [r.embedding for r in emb.orderBy("vec_id").collect()], np.float64
        )
        * 1024
    ).astype(np.int64)
    h = [int(hashlib.md5(f"perm:{j}".encode()).hexdigest()[:8], 16)
         for j in range(64)]
    sgn = np.array(
        [1 if int(hashlib.md5(f"sign:{j}".encode()).hexdigest()[:8], 16) % 2 == 0
         else -1 for j in range(64)],
        np.int64,
    )
    order = sorted(range(64), key=lambda j: (h[j], j))
    pos = np.empty(64, np.int64)
    for p, j in enumerate(order):
        pos[j] = p
    raw = ((Q[:, :8] > 0) * (1 << np.arange(8))).sum(axis=1)
    rot = np.zeros(len(Q), np.int64)
    for j in range(64):
        if pos[j] < 8:
            rot += ((sgn[j] * Q[:, j]) > 0).astype(np.int64) << int(pos[j])
    want = {}
    for variant, buckets in (("raw", raw), ("rotated", rot)):
        cnt = collections.Counter(buckets.tolist())
        want[variant] = (
            sum(cnt.values()), len(cnt), max(cnt.values()),
            sum(c * c for c in cnt.values()),
        )
    got = {
        r.variant: (r.n_vecs, r.n_buckets, r.max_bucket, r.sum_sq)
        for r in REGISTRY["llm_opq_rotation_audit"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want
    assert got["raw"][0] == got["rotated"][0] == len(Q)


def test_mmr_diversify_matches_numpy_greedy(spark):
    """The MMR schedule equals a numpy greedy fold over quantized dots
    (pool = top-12 by relevance vs query 0, 3·MMR = 2·rel − max-sim,
    ties to the smaller id), and the picks are 6 distinct pool members
    led by the pure-relevance argmax."""
    import numpy as np

    from hdp2_5_hive2_spark.queries import REGISTRY

    emb = load_tables(spark, SF_CORRECT)["embeddings"]
    rows = emb.select("vec_id", "embedding").collect()
    Q = {r.vec_id: np.floor(np.asarray(r.embedding, np.float64) * 1024)
         .astype(np.int64) for r in rows}
    q0 = Q[0]
    rel_all = sorted(
        ((int(v @ q0), -vid) for vid, v in Q.items() if vid >= 8), reverse=True
    )
    pool = [-nvid for _, nvid in rel_all[:12]]
    rel = {vid: int(Q[vid] @ q0) for vid in pool}
    chosen: list[int] = []
    want = []
    for step in range(1, 7):
        cands = []
        for p in pool:
            if p in chosen:
                continue
            pen = max(int(Q[p] @ Q[c]) for c in chosen) if chosen else 0
            cands.append((2 * rel[p] - pen, -p))
        m, np_ = max(cands)
        want.append((step, -np_, m))
        chosen.append(-np_)
    got = sorted(
        (r.step, r.vec_id, r.mmr)
        for r in REGISTRY["llm_mmr_diversify"].fn(spark, SF_CORRECT).collect()
    )
    assert got == sorted(want)
    picks = [v for _, v, _ in want]
    assert len(set(picks)) == 6 and set(picks) <= set(pool)
    assert picks[0] == max(pool, key=lambda p: (rel[p], -p))
