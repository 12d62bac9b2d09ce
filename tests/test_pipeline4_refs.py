"""Independent references for the round-12 pipeline4 corpus: each test
recomputes a registered query's answer a THIRD way — pure Python/numpy
from the raw parquet rows, sharing no code with either the Spark
implementation or its DuckDB oracle — so a conceptual error the two
engines could share (same formula transcribed twice) cannot hide behind
a hash match. Same discipline as tests/test_pipeline{2,3}_refs*.py."""

from __future__ import annotations

import calendar
import hashlib
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


def test_jaccard_containment_gap_matches_python(spark):
    """Per-pair intersection, Jaccard, containment, and the asymmetry flag
    equal a pure-Python set recount over rare-8-gram candidate pairs."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = _docs(spark)
    grams = {
        did: {tuple(toks[i : i + 8]) for i in range(len(toks) - 7)}
        for did, (_, toks) in docs.items()
    }
    df = Counter()
    for gs in grams.values():
        for g in gs:
            df[g] += 1
    cand = set()
    docs_of = defaultdict(set)
    for did, gs in grams.items():
        for g in gs:
            if df[g] <= 20:
                docs_of[g].add(did)
    for ds in docs_of.values():
        s = sorted(ds)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                cand.add((a, b))
    want = set()
    for a, b in cand:
        i = len(grams[a] & grams[b])
        jac = i * 1000 // len(grams[a] | grams[b])
        con = i * 1000 // min(len(grams[a]), len(grams[b]))
        want.add((a, b, i, jac, con, 1 if con >= 800 and jac < 800 else 0))
    got = {
        (r.da, r.db, r.inter_grams, r.jaccard_milli, r.containment_milli,
         r.is_asymmetric)
        for r in REGISTRY["llm_jaccard_containment_gap"]
        .fn(spark, SF_CORRECT)
        .collect()
    }
    assert got == want
    assert want, "fixture must produce candidate pairs"


def test_md5_draw_uniformity_matches_hashlib(spark):
    """Bucket histogram stats equal a hashlib recount of the same draw."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = _docs(spark)
    buckets = Counter(
        int(hashlib.md5(f"draw:{did}".encode()).hexdigest()[:8], 16) % 64
        for did in docs
    )
    n = sum(buckets.values())
    cs = list(buckets.values())
    want = (
        len(buckets),
        n,
        sum(abs(c * 64 - n) for c in cs),
        max(cs) * 64000 // n,
        min(cs) * 64000 // n,
    )
    row = REGISTRY["llm_md5_draw_uniformity"].fn(spark, SF_CORRECT).collect()[0]
    assert (
        row.n_buckets, row.n_draws, row.l1_cross,
        row.max_bucket_milli, row.min_bucket_milli,
    ) == want


def test_ivf_probe_sweep_matches_numpy(spark):
    """Recall@10 at nprobe 1/2/4 equals a numpy IVF re-run, and recall is
    monotone non-decreasing in the probe count for every query."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    ids, mat = _embs(spark)
    q = np.floor(mat * 1024).astype(np.int64)
    is_corpus = ids >= 8
    cids = ids[is_corpus & (ids % 17 == 8)]
    cmat = q[np.isin(ids, cids)]
    corpus_ids, corpus = ids[is_corpus], q[is_corpus]
    query_ids, queries = ids[~is_corpus], q[~is_corpus]

    def ranked(dots, cand_ids):
        # (dot desc, id asc) total order
        order = sorted(range(len(cand_ids)), key=lambda i: (-dots[i], cand_ids[i]))
        return [cand_ids[i] for i in order]

    # corpus cell assignment: argmax dot, smallest cid on ties
    c_cell = {}
    for vid, v in zip(corpus_ids, corpus):
        dots = cmat @ v
        c_cell[vid] = ranked(dots, list(cids))[0]
    cell_members = defaultdict(list)
    for vid, cell in c_cell.items():
        cell_members[cell].append(vid)

    want = set()
    for qid, qv in zip(query_ids, queries):
        probe_order = ranked(cmat @ qv, list(cids))
        exact = ranked(corpus @ qv, list(corpus_ids))[:10]
        prev = -1
        for p in (1, 2, 4):
            cand = sorted(
                {v for cell in probe_order[:p] for v in cell_members[cell]}
            )
            dots = np.asarray([corpus[list(corpus_ids).index(v)] @ qv for v in cand])
            approx = set(ranked(dots, cand)[:10])
            hits = sum(1 for v in exact if v in approx)
            assert hits >= prev, "recall must be monotone in nprobe"
            prev = hits
            want.add((int(qid), p, hits, hits * 100))
    got = {
        (r.query_id, r.p, r.n_hits, r.recall_milli)
        for r in REGISTRY["llm_ivf_probe_sweep"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_interarrival_burstiness_matches_python(spark):
    """Per-user sufficient statistics and the burstiness verdict equal a
    pure-Python recount over (ts, event_id)-sorted per-user gaps."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    rows = (
        load_tables(spark, SF_CORRECT)["events"]
        .select("user_id", "ts", "event_id")
        .collect()
    )
    per_user = defaultdict(list)
    for r in rows:
        per_user[r.user_id].append(
            (calendar.timegm(r.ts.timetuple()), r.event_id)
        )
    want = set()
    for uid, evs in per_user.items():
        evs.sort()
        gaps = [b[0] - a[0] for a, b in zip(evs, evs[1:])]
        n, s1, s2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
        if n < 10 or s1 <= 0:
            continue
        want.add(
            (uid, n, s1, s2, (n * s2 - s1 * s1) * 1000 // (s1 * s1),
             1 if n * s2 > 2 * s1 * s1 else 0)
        )
    got = {
        (r.user_id, r.n_gaps, r.s1, r.s2, r.cov2_milli, r.is_bursty)
        for r in REGISTRY["events_interarrival_burstiness"]
        .fn(spark, SF_CORRECT)
        .collect()
    }
    assert got == want
    assert any(w[5] == 1 for w in want), "fixture must contain bursty users"


def test_prefix_echo_matches_python(spark):
    """Per-source echo counts equal a pure-Python bigram-set recount."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = _docs(spark)
    agg = defaultdict(lambda: [0, 0, 0])  # n_docs, n_echo_docs, n_echo_grams
    for _, (src, toks) in docs.items():
        if len(toks) < 32:
            continue
        head = {(toks[i], toks[i + 1]) for i in range(15)}
        tail = {(toks[i], toks[i + 1]) for i in range(16, len(toks) - 1)}
        n_echo = len(head & tail)
        a = agg[src]
        a[0] += 1
        a[1] += 1 if n_echo else 0
        a[2] += n_echo
    want = {
        (src, a[0], a[1], a[2], a[1] * 1000 // a[0]) for src, a in agg.items()
    }
    got = {
        (r.source, r.n_docs, r.n_echo_docs, r.n_echo_grams, r.echo_doc_milli)
        for r in REGISTRY["llm_prefix_echo"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want
    assert any(w[2] > 0 for w in want), "fixture must contain echo docs"
    assert any(w[2] < w[1] for w in want), "echo must not saturate"


def test_length_bands_matches_python(spark):
    """Nearest-rank percentiles equal a pure-Python sorted recount."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = _docs(spark)
    by_src = defaultdict(list)
    for did, (src, toks) in docs.items():
        by_src[src].append((len(toks), did))
    want = set()
    for src, ls in by_src.items():
        ls.sort()
        m = len(ls)
        band = lambda p: ls[(m * p + 99) // 100 - 1][0]  # noqa: E731
        want.add((src, m, band(10), band(50), band(90)))
    got = {
        (r.source, r.n_docs, r.p10, r.p50, r.p90)
        for r in REGISTRY["llm_length_bands"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_front_coding_gain_matches_python(spark):
    """Saved chars equal a pure-Python LCP walk over the sorted vocab."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = _docs(spark)
    vocab = sorted({t for _, toks in docs.values() for t in toks})

    def lcp(a: str, b: str) -> int:
        k = 0
        for x, y in zip(a, b):
            if x != y:
                break
            k += 1
        return k

    saved = sum(lcp(a, b) for a, b in zip(vocab, vocab[1:]))
    total = sum(len(t) for t in vocab)
    row = REGISTRY["llm_front_coding_gain"].fn(spark, SF_CORRECT).collect()[0]
    assert (row.n_terms, row.total_chars, row.saved_chars, row.gain_milli) == (
        len(vocab), total, saved, saved * 1000 // total,
    )
    assert saved > 0, "fixture vocab must share prefixes"


def test_substring_index_matches_python(spark):
    """Every output column equals a pure-Python MySQL-semantics splitter."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    def ssi(s: str, delim: str, count: int) -> str:
        parts = s.split(delim)
        if count == 0:
            return ""
        if count > 0:
            return delim.join(parts[:count])
        return delim.join(parts[count:])

    rows = (
        load_tables(spark, SF_CORRECT)["customer"]
        .filter("c_custkey < 400")
        .select("c_custkey", "c_name", "c_mktsegment")
        .collect()
    )
    want = {
        (
            r.c_custkey,
            ssi(r.c_name, "0", 2),
            ssi(r.c_name, "0", -1),
            ssi(r.c_name, "0", -3),
            ssi(r.c_name, "0", 99),
            ssi(r.c_name, "0", 0),
            ssi(r.c_mktsegment, "#", 2),
        )
        for r in rows
    }
    got = {
        (r.c_custkey, r.head2, r.tail1, r.tail3, r.over_pos, r.zero_cnt,
         r.no_delim)
        for r in REGISTRY["fn_substring_index"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_front_coding_synthetic_vocab_exercises_internal_folds(spark):
    """The fixture vocab (31 terms over 32 range shards) exercises mostly
    the BOUNDARY stitching; this synthetic 3000-term vocabulary packs many
    terms per shard so the per-shard Arrow LCP fold (including the
    prev-carry across Arrow batches) is proven against a pure-Python walk
    of the fully sorted list — shard-split-invariance is the whole
    contract of the distributed sorted-adjacency shape."""
    from hdp2_5_hive2_spark.queries.pipeline4_corpus import front_coding_gain

    terms = sorted(
        {
            f"{p}{i:04d}{'x' * (i % 7)}"
            for p in ("alpha", "alp", "beta", "b", "gamma_long_prefix")
            for i in range(600)
        }
    )

    def lcp(a: str, b: str) -> int:
        k = 0
        for x, y in zip(a, b):
            if x != y:
                break
            k += 1
        return k

    saved = sum(lcp(a, b) for a, b in zip(terms, terms[1:]))
    total = sum(len(t) for t in terms)
    v = spark.createDataFrame([(t,) for t in terms], "term string")
    row = front_coding_gain(v).collect()[0]
    assert (row.n_terms, row.total_chars, row.saved_chars, row.gain_milli) == (
        len(terms), total, saved, saved * 1000 // total,
    )
    assert saved > total // 2, "synthetic vocab must be prefix-heavy"


def test_front_coding_gain_empty_vocab_counters_read_zero(spark):
    """ADVICE r12: an empty vocabulary must read n_terms/total_chars/
    saved_chars = 0 (matching the oracle's count(*) semantics) with
    gain_milli NULL — not a row of NULL counters from the sum-over-zero-
    rows aggregate."""
    from hdp2_5_hive2_spark.queries.pipeline4_corpus import front_coding_gain

    v = spark.createDataFrame([], "term string")
    row = front_coding_gain(v).collect()[0]
    assert (row.n_terms, row.total_chars, row.saved_chars) == (0, 0, 0)
    assert row.gain_milli is None
