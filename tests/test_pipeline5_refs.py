"""Independent references for the round-13 pipeline5 corpus: each test
recomputes a registered query's answer a THIRD way — pure Python/numpy
from the raw parquet rows, sharing no code with either the Spark
implementation or its DuckDB oracle — so a conceptual error the two
engines could share (same formula transcribed twice) cannot hide behind
a hash match. Same discipline as tests/test_pipeline{2,3,4}_refs*.py."""

from __future__ import annotations

import calendar
import math
from collections import Counter, defaultdict

import numpy as np

from hdp2_5_hive2_spark.catalog import load_tables
from tests.conftest import SF_CORRECT


def _docs(spark):
    return {
        r.doc_id: (r.source, r.text.strip().split())
        for r in load_tables(spark, SF_CORRECT)["documents"]
        .select("doc_id", "source", "text")
        .collect()
    }


def _events(spark):
    return (
        load_tables(spark, SF_CORRECT)["events"]
        .select("event_id", "ts", "user_id", "event_type", "value")
        .collect()
    )


def _embs(spark):
    rows = (
        load_tables(spark, SF_CORRECT)["embeddings"]
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.asarray([r.vec_id for r in rows], dtype=np.int64)
    order = np.argsort(ids)
    mat = np.asarray([rows[i].embedding for i in order], dtype=np.float64)
    return ids[order], mat


def test_positional_boilerplate_matches_python(spark):
    """Per-position top terms and shares equal a pure-Python Counter
    recount over the 16-token heads."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = _docs(spark)
    by_pos = defaultdict(Counter)
    n_docs = 0
    for _, (_, toks) in docs.items():
        if len(toks) < 16:
            continue
        n_docs += 1
        for i in range(16):
            by_pos[i + 1][toks[i]] += 1
    want = set()
    for pos, cnt in by_pos.items():
        term, n = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        want.add((pos, n_docs, term, n, n * 1000 // n_docs))
    got = {
        (r.pos, r.n_docs, r.top_term, r.top_n, r.share_milli)
        for r in REGISTRY["llm_positional_boilerplate"]
        .fn(spark, SF_CORRECT)
        .collect()
    }
    assert got == want
    assert len(got) == 16
    # signal check: the synthetic corpus has no dominant template, so no
    # position's top term owns a majority of documents
    assert all(w[4] < 500 for w in want)


def test_session_gap_sweep_matches_python(spark):
    """Session counts per threshold equal a pure-Python recount over
    (ts, event_id)-sorted per-user epoch-second gaps."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    per_user = defaultdict(list)
    for r in _events(spark):
        per_user[r.user_id].append(
            (calendar.timegm(r.ts.timetuple()), r.event_id)
        )
    gaps = []
    for evs in per_user.values():
        evs.sort()
        gaps.extend(b[0] - a[0] for a, b in zip(evs, evs[1:]))
    n_users = len(per_user)
    want = {
        (thr, sum(1 for g in gaps if g > thr), n_users,
         n_users + sum(1 for g in gaps if g > thr))
        for thr in (1800, 3600, 7200)
    }
    got = {
        (r.thr, r.n_gaps_over, r.n_users, r.n_sessions)
        for r in REGISTRY["events_session_gap_sweep"]
        .fn(spark, SF_CORRECT)
        .collect()
    }
    assert got == want
    # the sweep must actually sweep: session counts strictly ordered by thr
    by_thr = sorted(want)
    assert by_thr[0][3] > by_thr[1][3] > by_thr[2][3], (
        "fixture gaps must separate the three thresholds"
    )


def test_diurnal_profile_matches_python(spark):
    """Hour-of-day counts and the peak-to-mean index equal a pure-Python
    recount over the raw UTC timestamps."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    cnt = Counter(r.ts.hour for r in _events(spark))
    total = sum(cnt.values())
    peak = max(cnt.values())
    want = {
        (hr, n, n * 24000 // total, peak * 24000 // total)
        for hr, n in cnt.items()
    }
    got = {
        (r.hr, r.n_events, r.load_milli, r.peak_mean_milli)
        for r in REGISTRY["events_diurnal_profile"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want
    assert len(got) == 24, "fixture must cover every hour of the day"


def test_windowed_ttr_matches_python(spark):
    """Per-source window counts and distinct sums equal a pure-Python fold
    over disjoint 50-token windows."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = _docs(spark)
    agg = defaultdict(lambda: [0, 0])  # n_windows, sum_distinct
    for _, (src, toks) in docs.items():
        for s in range(0, len(toks) - 49, 50):
            agg[src][0] += 1
            agg[src][1] += len(set(toks[s : s + 50]))
    want = {
        (src, a[0], a[1], a[1] * 1000 // (a[0] * 50)) for src, a in agg.items()
    }
    got = {
        (r.source, r.n_windows, r.sum_distinct, r.ttr_milli)
        for r in REGISTRY["llm_windowed_ttr"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want
    # diversity signal: windowed TTR must sit strictly inside (0, 1000) —
    # all-repeat and all-distinct windows would both be fixture bugs
    assert all(0 < w[3] < 1000 for w in want)


def test_ann_staleness_recall_matches_numpy(spark):
    """Recall@10 under every-5th-deleted equals a numpy re-ranking, and
    deleting index vectors can only remove hits (recall <= 1000)."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    ids, mat = _embs(spark)
    q = np.floor(mat * 1024).astype(np.int64)
    corpus_ids, corpus = ids[ids >= 8], q[ids >= 8]
    keep = corpus_ids % 5 != 0
    stale_ids, stale = corpus_ids[keep], corpus[keep]
    query_ids, queries = ids[ids < 8], q[ids < 8]

    def top10(dots, cand_ids):
        order = sorted(range(len(cand_ids)), key=lambda i: (-dots[i], cand_ids[i]))
        return [cand_ids[i] for i in order[:10]]

    want = set()
    for qid, qv in zip(query_ids, queries):
        exact = top10(corpus @ qv, list(corpus_ids))
        approx = set(top10(stale @ qv, list(stale_ids)))
        hits = sum(1 for v in exact if v in approx)
        want.add((int(qid), hits, hits * 100))
    got = {
        (r.query_id, r.n_hits, r.recall_milli)
        for r in REGISTRY["llm_ann_staleness_recall"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want
    assert all(w[1] <= 10 for w in want)
    # staleness signal: with 20% of the index gone, SOME query must lose a
    # true neighbor, and none may lose them all
    assert any(w[1] < 10 for w in want)
    assert all(w[1] > 0 for w in want)


def test_value_pareto_matches_python(spark):
    """Top-decile value share equals a pure-Python cents-quantized sort;
    the decile cut is nearest-rank ceil(n/10)."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    cents = defaultdict(int)
    for r in _events(spark):
        cents[r.user_id] += math.floor(r.value * 100)
    ranked = sorted(cents.items(), key=lambda kv: (-kv[1], kv[0]))
    n_users = len(ranked)
    k = (n_users + 9) // 10
    top_cents = sum(c for _, c in ranked[:k])
    total = sum(cents.values())
    want = (n_users, k, top_cents, total, top_cents * 1000 // total)
    rows = REGISTRY["events_value_pareto"].fn(spark, SF_CORRECT).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_users, r.top_users, r.top_cents, r.total_cents,
            r.pareto_milli) == want
    # concentration is bounded: top decile holds >= its uniform share and
    # never everything
    assert 100 <= r.pareto_milli < 1000


def test_type_mix_drift_matches_python(spark):
    """Half-vs-half type-mix L1 equals a pure-Python cross-multiplied
    recount with the exact int64 midpoint."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    events = _events(spark)
    m = (max(r.event_id for r in events) + 1) // 2
    c0, c1 = Counter(), Counter()
    for r in events:
        (c0 if r.event_id < m else c1)[r.event_type] += 1
    types = sorted(set(c0) | set(c1))
    n0, n1 = sum(c0.values()), sum(c1.values())
    l1 = sum(abs(c0[t] * n1 - c1[t] * n0) for t in types)
    rows = REGISTRY["events_type_mix_drift"].fn(spark, SF_CORRECT).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.l1_cross, r.n0, r.n1, r.n_types) == (l1, n0, n1, len(types))
    # the event_id split must actually halve the stream
    assert abs(n0 - n1) <= 1
