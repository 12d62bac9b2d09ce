"""Independent references, batch 3 — completes the set: every round-10
pipeline2 query now has a third-way recomputation. The 2-core reference
is deliberately a DIFFERENT algorithm (peel to the true fixpoint, not 12
synchronized rounds) so it also re-proves the convergence claim the
synchronized oracle relies on."""

from __future__ import annotations

import collections

from hdp2_5_hive2_spark.catalog import load_tables
from tests.conftest import SF_CORRECT


def test_dup_graph_2core_matches_fixpoint_peel(spark):
    """The 12-round synchronized peel equals a pure-Python peel run to
    the TRUE fixpoint (repeat until no degree-<2 node remains) over
    independently derived rare-16-gram edges — verifying both the edge
    derivation and that 12 rounds suffice at this scale."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = {
        r.doc_id: r.text.strip().split()
        for r in load_tables(spark, SF_CORRECT)["documents"].collect()
    }
    by_gram: dict[str, list[int]] = {}
    for did, toks in docs.items():
        for g in {" ".join(toks[i : i + 16]) for i in range(len(toks) - 15)}:
            by_gram.setdefault(g, []).append(did)
    edges = set()
    for ids in by_gram.values():
        if 1 < len(ids) <= 100:
            ids = sorted(ids)
            for i, a in enumerate(ids):
                for b in ids[i + 1 :]:
                    edges.add((a, b))
    while True:
        deg: collections.Counter = collections.Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        keep = {n for n, d in deg.items() if d >= 2}
        nxt = {(a, b) for a, b in edges if a in keep and b in keep}
        if nxt == edges:
            break
        edges = nxt
    want: collections.Counter = collections.Counter()
    for a, b in edges:
        want[a] += 1
        want[b] += 1
    got = {
        r.doc_id: r.core_deg
        for r in REGISTRY["llm_dup_graph_2core"].fn(spark, SF_CORRECT).collect()
    }
    assert got == dict(want)
    assert got, "2-core unexpectedly empty at sf0.01"


def test_packing_contamination_matches_python(spark):
    """The exposure audit equals a pure-Python recomputation: 8-gram
    contamination set, greedy 512-token packing per 64-doc chunk in
    doc_id order, mixed-bin and exposed-doc counts."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = {
        r.doc_id: r.text.strip().split()
        for r in load_tables(spark, SF_CORRECT)["documents"].collect()
    }
    ev = set()
    for did, toks in docs.items():
        if did % 29 == 0:
            for i in range(len(toks) - 7):
                ev.add(" ".join(toks[i : i + 8]))
    contam = {
        did
        for did, toks in docs.items()
        if did % 29 != 0
        and any(" ".join(toks[i : i + 8]) in ev for i in range(len(toks) - 7))
    }
    bins: dict[tuple[int, int], list[int]] = {}
    by_chunk: dict[int, list[int]] = {}
    for did in sorted(docs):
        by_chunk.setdefault(did // 64, []).append(did)
    for chunk, ids in by_chunk.items():
        bin_idx = fill = ndocs = 0
        for did in ids:
            t = len(docs[did])
            if ndocs > 0 and fill + t > 512:
                bin_idx, fill, ndocs = bin_idx + 1, 0, 0
            bins.setdefault((chunk, bin_idx), []).append(did)
            fill += t
            ndocs += 1
    want: dict[int, list[int]] = {}
    for (chunk, _), members in bins.items():
        bad = sum(1 for d in members if d in contam)
        ok = len(members) - bad
        nb, nm, ne = want.get(chunk, (0, 0, 0))
        want[chunk] = (
            nb + 1,
            nm + (1 if bad > 0 and ok > 0 else 0),
            ne + (ok if bad > 0 else 0),
        )
    got = {
        r.chunk: (r.n_bins, r.n_mixed_bins, r.n_exposed_docs)
        for r in REGISTRY["llm_packing_contamination"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_compaction_stream_matches_python_fold(spark):
    """The batch compaction accounting equals a pure-Python fold over the
    raw events in (ts, event_id) arrival order."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    ev = load_tables(spark, SF_CORRECT)["events"].select(
        "user_id", "ts", "event_id"
    ).collect()
    hist: dict[int, list[tuple]] = {}
    for r in ev:
        hist.setdefault(r.user_id, []).append((r.ts, r.event_id))
    want = {}
    for uid, rows in hist.items():
        fill = comp = total = 0
        rows.sort()
        for _, eid in rows:
            b = (eid % 997) + 64
            total += b
            fill += b
            if fill >= 4096:
                comp += 1
                fill = 0
        want[uid] = (len(rows), total, comp, fill)
    got = {
        r.user_id: (r.n_files, r.total_bytes, r.n_compactions, r.residual_bytes)
        for r in REGISTRY["llm_compaction_stream"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want
