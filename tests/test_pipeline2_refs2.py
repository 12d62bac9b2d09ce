"""Independent references, batch 2: the remaining round-10 pipeline2
queries with enough logic to hide a shared transcription error — the
consistent-hash ring, the IVF recall curve, union-find cluster sizes,
the positional heatmap, and the per-source vocabulary audits. Same
discipline as test_pipeline2_refs: pure Python/numpy from the raw rows,
no shared code with either engine."""

from __future__ import annotations

import collections
import hashlib
import re

from hdp2_5_hive2_spark.catalog import load_tables
from tests.conftest import SF_CORRECT


def _docs(spark):
    return {
        r.doc_id: (r.source, r.text)
        for r in load_tables(spark, SF_CORRECT)["documents"]
        .select("doc_id", "source", "text")
        .collect()
    }


def test_consistent_hash_moves_matches_python_ring(spark):
    """The 8→9-shard rebalance audit equals a pure-Python md5 ring walk
    (first vnode at or after the key, wrapping to the ring minimum),
    and the only-to-new invariant actually holds on this corpus."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    ring = {
        s: sorted(
            (hashlib.md5(f"shard:{s}:v:{v}".encode()).hexdigest(), s)
            for v in range(64)
        )
        for s in range(9)
    }

    def owner(h: str, n_shards: int) -> int:
        nodes = sorted(x for s in range(n_shards) for x in ring[s])
        for vh, s in nodes:
            if vh >= h:
                return s
        return nodes[0][1]

    moved = n = 0
    only_new = True
    for did in _docs(spark):
        h = hashlib.md5(str(did).encode()).hexdigest()
        s8, s9 = owner(h, 8), owner(h, 9)
        n += 1
        if s8 != s9:
            moved += 1
            if s9 != 8:
                only_new = False
    [row] = REGISTRY["llm_consistent_hash_moves"].fn(spark, SF_CORRECT).collect()
    assert (row.n_docs, row.n_moved, row.moved_ppm, row.moves_only_to_new) == (
        n, moved, moved * 1000000 // n, only_new,
    )
    assert only_new  # the 1/K-churn guarantee the query exists to audit


def test_recall_curve_matches_numpy(spark):
    """The single-probe IVF recall@{1,5,10} equals a numpy recomputation:
    argmax-dot cell assignment (ties to the smaller centroid id), exact
    vs in-cell rankings under the (dot desc, id) order."""
    import numpy as np

    from hdp2_5_hive2_spark.queries import REGISTRY

    emb = load_tables(spark, SF_CORRECT)["embeddings"]
    rows = emb.select("vec_id", "embedding").collect()
    Q = {r.vec_id: np.floor(np.asarray(r.embedding, np.float64) * 1024)
         .astype(np.int64) for r in rows}
    corpus = sorted(v for v in Q if v >= 8)
    queries = sorted(v for v in Q if v < 8)
    cents = [v for v in corpus if v % 17 == 8]

    def cell(vid: int) -> int:
        return max(cents, key=lambda c: (int(Q[vid] @ Q[c]), -c))

    c_cell = {v: cell(v) for v in corpus}
    q_cell = {q: cell(q) for q in queries}
    want = {}
    for q in queries:
        exact = sorted(corpus, key=lambda v: (-int(Q[v] @ Q[q]), v))[:10]
        cand = [v for v in corpus if c_cell[v] == q_cell[q]]
        approx = sorted(cand, key=lambda v: (-int(Q[v] @ Q[q]), v))[:10]
        for k in (1, 5, 10):
            hits = len(set(exact[:k]) & set(approx[:k]))
            want[(q, k)] = (hits, hits / k)
    got = {
        (r.query_id, r.k): (r.n_hits, r.recall)
        for r in REGISTRY["llm_recall_curve"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_cluster_size_powerlaw_matches_union_find(spark):
    """The power-of-two cluster-size histogram equals a pure-Python
    union-find over the same rare-16-gram edges (df ≤ 100), with the
    bucket computed via bit_length instead of the engines' bin()."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = {d: t.strip().split() for d, (_, t) in _docs(spark).items()}
    by_gram: dict[str, list[int]] = {}
    for did, toks in docs.items():
        for g in {" ".join(toks[i : i + 16]) for i in range(len(toks) - 15)}:
            by_gram.setdefault(g, []).append(did)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for g, ids in by_gram.items():
        if len(ids) > 100:
            continue
        if len(ids) > 1:
            for d in ids:
                parent.setdefault(d, d)
            r0 = find(ids[0])
            for d in ids[1:]:
                parent[find(d)] = r0
    sizes = collections.Counter(find(d) for d in parent)
    want: dict[int, list[int]] = {}
    for sz in sizes.values():
        b = sz.bit_length() - 1
        n_cl, n_docs = want.get(b, (0, 0))
        want[b] = (n_cl + 1, n_docs + sz)
    got = {
        r.bucket: (r.n_clusters, r.n_docs)
        for r in REGISTRY["llm_cluster_size_powerlaw"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_contamination_position_matches_python(spark):
    """The decile heatmap equals a pure-Python positional scan (0-based
    hit position × 10 // n_positions)."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = {d: t.strip().split() for d, (_, t) in _docs(spark).items()}
    ev = set()
    for did, toks in docs.items():
        if did % 29 == 0:
            for i in range(len(toks) - 7):
                ev.add(" ".join(toks[i : i + 8]))
    n_hits: collections.Counter = collections.Counter()
    docs_at: dict[int, set[int]] = {}
    for did, toks in docs.items():
        if did % 29 == 0:
            continue
        n_pos = len(toks) - 7
        for p in range(n_pos):
            if " ".join(toks[p : p + 8]) in ev:
                dec = p * 10 // n_pos
                n_hits[dec] += 1
                docs_at.setdefault(dec, set()).add(did)
    want = {d: (n_hits[d], len(docs_at[d])) for d in n_hits}
    got = {
        r.decile: (r.n_hits, r.n_docs)
        for r in REGISTRY["llm_contamination_position"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_vocab_audits_match_python_counters(spark):
    """hapax_audit, burstiness, ngram_coverage_curve, fertility, and
    token_budget_alloc all equal plain Counter recomputations (with
    bitwise-equal single-division doubles where the query emits one)."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = _docs(spark)
    # --- hapax_audit ---
    cf: dict[str, collections.Counter] = {}
    for _, (src, text) in docs.items():
        cf.setdefault(src, collections.Counter()).update(text.strip().split())
    want_h = {}
    for src, c in cf.items():
        n_tok, n_typ = sum(c.values()), len(c)
        n_hap = sum(1 for v in c.values() if v == 1)
        want_h[src] = (n_tok, n_typ, n_hap, n_hap / n_typ, n_typ / n_tok)
    got_h = {
        r.source: (r.n_tokens, r.n_types, r.n_hapax, r.hapax_share,
                   r.type_token_ratio)
        for r in REGISTRY["llm_hapax_audit"].fn(spark, SF_CORRECT).collect()
    }
    assert got_h == want_h
    # --- burstiness (top-20 by ppm desc, term asc) ---
    tot: collections.Counter = collections.Counter()
    df: collections.Counter = collections.Counter()
    for _, (_, text) in docs.items():
        toks = text.strip().split()
        tot.update(toks)
        df.update(set(toks))
    rows = sorted(
        (-(c * 1000000 // df[t]), t, df[t], c)
        for t, c in tot.items() if c >= 30
    )[:20]
    want_b = [(t, d, c, -ppm) for ppm, t, d, c in rows]
    got_b = [
        (r.term, r.df, r.cf, r.burst_ppm)
        for r in REGISTRY["llm_burstiness"].fn(spark, SF_CORRECT).collect()
    ]
    assert sorted(got_b) == sorted(want_b)
    # --- ngram_coverage_curve ---
    gc: collections.Counter = collections.Counter()
    for _, (_, text) in docs.items():
        toks = text.strip().split()
        gc.update(" ".join(toks[i : i + 8]) for i in range(len(toks) - 7))
    total = sum(gc.values())
    by_rank = sorted(gc.items(), key=lambda kv: (-kv[1], kv[0]))
    want_c = {}
    for k in (10, 100, 1000):
        cov = sum(c for _, c in by_rank[:k])
        want_c[k] = (cov, total, cov / total)
    got_c = {
        r.n_top: (r.covered, r.total, r.coverage)
        for r in REGISTRY["llm_ngram_coverage_curve"].fn(spark, SF_CORRECT).collect()
    }
    assert got_c == want_c
    # --- fertility_by_source ---
    pat = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]")
    words: collections.Counter = collections.Counter()
    sub: collections.Counter = collections.Counter()
    for _, (src, text) in docs.items():
        words[src] += len(text.strip().split())
        sub[src] += len(pat.findall(text))
    want_f = {
        s: (words[s], sub[s], sub[s] * 1000 // words[s]) for s in words
    }
    got_f = {
        r.source: (r.n_words, r.n_subtok, r.fertility_milli)
        for r in REGISTRY["llm_fertility_by_source"].fn(spark, SF_CORRECT).collect()
    }
    assert got_f == want_f
    # --- token_budget_alloc ---
    n_by_src = {s: 0 for s, _ in cf.items()}
    for _, (src, text) in docs.items():
        n_by_src[src] += len(text.strip().split())
    tot_n = sum(n_by_src.values())
    want_t = {}
    for model, ktok in (("m125", 2500), ("m350", 7000), ("m1300", 26000)):
        for s, n in n_by_src.items():
            alloc = ktok * 1000 * n // tot_n
            want_t[(model, s)] = (n, alloc, alloc * 1000 // n, alloc > n)
    got_t = {
        (r.model, r.source): (r.n_tokens, r.alloc_tokens, r.epochs_milli,
                              r.repeats)
        for r in REGISTRY["llm_token_budget_alloc"].fn(spark, SF_CORRECT).collect()
    }
    assert got_t == want_t
