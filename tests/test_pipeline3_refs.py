"""Independent references for the round-11 pipeline3 corpus: each test
recomputes a registered query's answer a THIRD way — pure Python/numpy
from the raw parquet rows, sharing no code with either the Spark
implementation or its DuckDB oracle — so a conceptual error the two
engines could share (same formula transcribed twice) cannot hide behind
a hash match. Same discipline as tests/test_pipeline2_refs{,2,3}.py."""

from __future__ import annotations

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


def _capped_edges(docs, n=16, max_df=100, cap=64):
    gram_docs: dict[tuple, set] = defaultdict(set)
    for did, (_, toks) in docs.items():
        for i in range(len(toks) - n + 1):
            gram_docs[tuple(toks[i : i + n])].add(did)
    edges = set()
    for ds in gram_docs.values():
        if len(ds) <= max_df:
            s = sorted(ds)
            for i, a in enumerate(s):
                for b in s[i + 1 :]:
                    edges.add((a, b))
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    return {(a, b) for a, b in edges if deg[a] <= cap and deg[b] <= cap}


def test_triangle_closure_matches_python_graph(spark):
    """2-path and closed-triangle counts equal a pure-Python recount over
    the capped rare-16-gram edge set."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    keep = _capped_edges(_docs(spark))
    out_edges = defaultdict(list)
    for a, b in keep:
        out_edges[a].append(b)
    n_paths = n_closed = 0
    for a, bs in out_edges.items():
        for b in bs:
            for c in out_edges.get(b, ()):
                n_paths += 1
                if (a, c) in keep:
                    n_closed += 1
    row = (
        REGISTRY["llm_dup_triangle_closure"].fn(spark, SF_CORRECT).collect()[0]
    )
    assert (row.n_2paths, row.n_closed) == (n_paths, n_closed)
    assert n_paths > 0, "fixture must exercise the path join"


def test_ivf_cell_balance_matches_numpy(spark):
    """Cell populations equal a numpy argmax-int-dot assignment."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    ids, mat = _embs(spark)
    q = np.floor(mat * 1024).astype(np.int64)
    cents = q[ids < 4]
    cent_ids = ids[ids < 4]
    rest, rest_ids = q[ids >= 4], ids[ids >= 4]
    dots = rest @ cents.T
    best = cent_ids[np.argmax(dots, axis=1)]  # cent_ids sorted asc
    sizes = Counter(int(c) for c in best)
    total, k = sum(sizes.values()), len(sizes)
    want = {
        (cid, sz, sz * 1000 * k // total) for cid, sz in sizes.items()
    }
    got = {
        (r.cid, r.sz, r.occupancy_milli)
        for r in REGISTRY["llm_ivf_cell_balance"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_vocab_half_drift_matches_python(spark):
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = _docs(spark)
    mid = (max(docs) + 1) // 2
    cf = Counter()
    for _, toks in docs.values():
        cf.update(toks)
    top = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:16]
    basket = [t for t, _ in top]
    c0, c1 = Counter(), Counter()
    for did, (_, toks) in docs.items():
        tgt = c0 if did < mid else c1
        for t in toks:
            if t in set(basket):
                tgt[t] += 1
    n0, n1 = sum(c0[t] for t in basket), sum(c1[t] for t in basket)
    l1 = sum(abs(c0[t] * n1 - c1[t] * n0) for t in basket)
    row = REGISTRY["llm_vocab_half_drift"].fn(spark, SF_CORRECT).collect()[0]
    assert (row.l1_cross, row.n0, row.n1) == (l1, n0, n1)


def test_simpson_collision_matches_python(spark):
    from hdp2_5_hive2_spark.queries import REGISTRY

    per_src: dict[str, Counter] = defaultdict(Counter)
    for _, (src, toks) in _docs(spark).items():
        per_src[src].update(toks)
    want = set()
    for src, cf in per_src.items():
        coll = sum(c * (c - 1) for c in cf.values())
        n = sum(cf.values())
        want.add((src, coll, n, coll * 1000000 // (n * (n - 1))))
    got = {
        (r.source, r.collision_mass, r.n_tokens, r.simpson_micro)
        for r in REGISTRY["llm_simpson_collision"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_shard_skew_matches_hashlib(spark):
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = _docs(spark)
    mxp1 = max(docs) + 1
    schemes = {"hash": Counter(), "range": Counter()}
    for did, (_, toks) in docs.items():
        n = len(toks)
        h = int(hashlib.md5(f"{did}:shard".encode()).hexdigest()[:8], 16) % 16
        schemes["hash"][h] += n
        schemes["range"][did * 16 // mxp1] += n
    want = set()
    for scheme, shards in schemes.items():
        total, k, mx = sum(shards.values()), len(shards), max(shards.values())
        l1 = sum(abs(tok * k - total) for tok in shards.values())
        want.add((scheme, l1, mx, mx * 1000 * k // total))
    got = {
        (r.scheme, r.l1_cross, r.max_tok, r.max_over_mean_milli)
        for r in REGISTRY["llm_shard_skew_audit"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_zipf_ratio_matches_python(spark):
    from hdp2_5_hive2_spark.queries import REGISTRY

    cf = Counter()
    for _, (_, toks) in _docs(spark).items():
        cf.update(toks)
    top = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:16]
    f1 = top[0][1]
    want = {
        (r, t, f, f * r * 1000 // f1)
        for r, (t, f) in enumerate(top, start=1)
    }
    got = {
        (r.r, r.term, r.f, r.zipf_milli)
        for r in REGISTRY["llm_zipf_ratio_curve"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_header_boilerplate_matches_python(spark):
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = _docs(spark)
    df = Counter()
    for _, (_, toks) in docs.items():
        grams = {tuple(toks[i : i + 8]) for i in range(len(toks) - 7)}
        df.update(grams)
    per = defaultdict(lambda: [0, 0])
    for _, (src, toks) in docs.items():
        if len(toks) < 8:
            continue
        per[src][0] += 1
        if df[tuple(toks[:8])] > 1:
            per[src][1] += 1
    want = {
        (src, nd, ns, ns * 1000 // nd) for src, (nd, ns) in per.items()
    }
    got = {
        (r.source, r.n_docs, r.n_shared_header, r.shared_milli)
        for r in REGISTRY["llm_header_boilerplate"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_quant_scale_ablation_matches_numpy(spark):
    from hdp2_5_hive2_spark.queries import REGISTRY

    ids, mat = _embs(spark)
    qmask, cmask = ids < 8, ids >= 8
    tops: dict[tuple[int, int], set] = {}
    for scale in (256, 1024, 4096):
        q = np.floor(mat * scale).astype(np.int64)
        for qid, qv in zip(ids[qmask], q[qmask]):
            dots = q[cmask] @ qv
            # rank by (-dot, neighbor_id); corpus ids are sorted asc
            order = np.lexsort((ids[cmask], -dots))
            tops[(scale, int(qid))] = set(
                int(x) for x in ids[cmask][order[:10]]
            )
    want = set()
    for (scale, qid), s in tops.items():
        want.add((scale, qid, len(s & tops[(1024, qid)])))
    got = {
        (r.scale, r.qid, r.overlap10)
        for r in REGISTRY["llm_quant_scale_ablation"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want
    assert any(ov < 10 for sc, _, ov in got if sc == 256), (
        "the 256 rung should visibly degrade at fixture scale"
    )


def _winnow(toks, w):
    grams = [
        hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()[:8]
        for i in range(len(toks) - 2)
    ]
    if not grams:
        return 0, 0
    if len(grams) < w:
        return len(grams), 1
    fps = {min(grams[j : j + w]) for j in range(len(grams) - w + 1)}
    return len(grams), len(fps)


def test_winnowing_density_matches_python(spark):
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = _docs(spark)
    want = set()
    for w in (4, 8, 16):
        kg = fp = 0
        for _, (_, toks) in docs.items():
            a, b = _winnow(toks, w)
            kg += a
            fp += b
        want.add((w, kg, fp, fp * 1000 // kg, 2000 // (w + 1)))
    got = {
        (r.w, r.n_kgrams, r.n_fps, r.density_milli, r.bound_milli)
        for r in REGISTRY["llm_winnowing_density"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_survivorship_policy_matches_python(spark):
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = _docs(spark)
    corpus = {did: toks for did, (_, toks) in docs.items()}
    for did, (_, toks) in docs.items():
        if did % 6 == 0 and len(toks) >= 12:
            corpus[did + 4000000] = toks[: max(8, (2 * len(toks)) // 3)]
    clusters: dict[tuple, list] = defaultdict(list)
    for did, toks in corpus.items():
        if len(toks) >= 8:
            clusters[tuple(toks[:8])].append((did, len(toks)))
    newest = longest = ncl = 0
    for members in clusters.values():
        if len(members) < 2:
            continue
        ncl += 1
        newest += max(members)[1]
        longest += max(members, key=lambda m: (m[1], -m[0]))[1]
    row = REGISTRY["llm_survivorship_policy"].fn(spark, SF_CORRECT).collect()[0]
    assert (row.n_clusters, row.keep_newest_tokens, row.keep_longest_tokens) == (
        ncl, newest, longest
    )
    assert newest < longest, "planted truncations must expose a policy delta"


def test_cross_source_grams_matches_python(spark):
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = {d: v for d, v in _docs(spark).items() if d % 5 == 0}
    gram_docs: dict[tuple, list] = defaultdict(list)
    for did, (src, toks) in docs.items():
        for g in {tuple(toks[i : i + 4]) for i in range(len(toks) - 3)}:
            gram_docs[g].append((did, src))
    pairs = set()
    for members in gram_docs.values():
        if len(members) > 64:
            continue
        members.sort()
        for i, (da, sa) in enumerate(members):
            for db, sb in members[i + 1 :]:
                pairs.add((da, db, sa, sb))
    cells = Counter()
    for da, db, sa, sb in pairs:
        cells[(min(sa, sb), max(sa, sb))] += 1
    want = {(a, b, n) for (a, b), n in cells.items()}
    got = {
        (r.src_a, r.src_b, r.n_pairs)
        for r in REGISTRY["llm_cross_source_grams"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_pii_cooccurrence_matches_python(spark):
    import re

    from hdp2_5_hive2_spark.queries import REGISTRY

    per = defaultdict(lambda: [0, set()])
    for did, (src, toks) in _docs(spark).items():
        toks = list(toks)
        if did % 17 == 0:
            toks += (
                [f"555{did % 10000}", "ref", "code", "alpha", "beta",
                 "gamma", "delta", f"user{did}@example.com"]
            )
        elif did % 23 == 3:
            toks += ["contact", f"user{did}@example.com"]
        elif did % 29 == 5:
            toks += ["id", f"9{did % 1000}"]
        dig = [i for i, t in enumerate(toks) if re.fullmatch(r"[0-9]{3,}", t)]
        eml = [i for i, t in enumerate(toks) if "@" in t]
        hits = sum(1 for i in dig for j in eml if abs(i - j) <= 16)
        if hits:
            per[src][0] += hits
            per[src][1].add(did)
    want = {(src, h, len(ds)) for src, (h, ds) in per.items()}
    got = {
        (r.source, r.n_cooc_pairs, r.n_docs_cooc)
        for r in REGISTRY["llm_pii_cooccurrence"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want
    assert want, "planting must produce hits"


def test_heaps_vocab_growth_matches_python(spark):
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = _docs(spark)
    m = max(docs) + 1
    want = set()
    for pct in (25, 50, 100):
        seen_docs, ntok, types = set(), 0, set()
        for did, (_, toks) in docs.items():
            if did * 100 < pct * m:
                seen_docs.add(did)
                ntok += len(toks)
                types.update(toks)
        want.add((pct, len(seen_docs), ntok, len(types)))
    got = {
        (r.pct, r.n_docs, r.n_tokens, r.n_types)
        for r in REGISTRY["llm_heaps_vocab_growth"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_length_gini_matches_python(spark):
    from hdp2_5_hive2_spark.queries import REGISTRY

    per: dict[str, list] = defaultdict(list)
    for did, (src, toks) in _docs(spark).items():
        per[src].append((len(toks), did))
    want = set()
    for src, rows in per.items():
        rows.sort()
        n = len(rows)
        tot = sum(x for x, _ in rows)
        num = sum((2 * i - n - 1) * x for i, (x, _) in enumerate(rows, start=1))
        want.add((src, n, tot, num * 1000000 // (n * tot)))
    got = {
        (r.source, r.n_docs, r.n_tokens, r.gini_micro)
        for r in REGISTRY["llm_length_gini"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_novelty_decay_matches_python(spark):
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = _docs(spark)
    m = max(docs) + 1
    first: dict[tuple, int] = {}
    inc = Counter()
    for did in sorted(docs):
        _, toks = docs[did]
        grams = {tuple(toks[i : i + 8]) for i in range(len(toks) - 7)}
        inc[did * 10 // m] += len(grams)
        for g in grams:
            first.setdefault(g, did)
    new = Counter(fd * 10 // m for fd in first.values())
    want = {
        (dec, new[dec], inc[dec], new[dec] * 1000 // inc[dec])
        for dec in inc
    }
    got = {
        (r.decile, r.n_new, r.n_incidences, r.novelty_milli)
        for r in REGISTRY["llm_novelty_decay"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_embedding_norm_audit_matches_numpy(spark):
    from hdp2_5_hive2_spark.queries import REGISTRY

    _, mat = _embs(spark)
    q = np.floor(mat * 1024).astype(np.int64)
    sqn = (q * q).sum(axis=1)
    buckets = defaultdict(list)
    for v in sqn:
        buckets[int(v).bit_length() - 1 if v > 0 else 0].append(int(v))
    want = {
        (b, len(vs), min(vs), max(vs)) for b, vs in buckets.items()
    }
    got = {
        (r.bucket, r.n_vecs, r.min_sqn, r.max_sqn)
        for r in REGISTRY["llm_embedding_norm_audit"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_kmeans_inertia_matches_numpy(spark):
    """The inertia curve equals a numpy Lloyd run AND is non-increasing."""
    from hdp2_5_hive2_spark.queries import REGISTRY

    ids, mat = _embs(spark)
    q = np.floor(mat * 1024).astype(np.int64)
    cent = q[:4].copy()  # ids sorted asc -> 4 lowest-id seeds
    curve = []
    for it in range(3):
        d2 = (
            (q * q).sum(axis=1, keepdims=True)
            - 2 * (q @ cent.T)
            + (cent * cent).sum(axis=1)[None, :]
        )
        cid = d2.argmin(axis=1)
        inertia = int(d2[np.arange(len(q)), cid].sum())
        curve.append((it, len(q), inertia))
        if it < 2:
            nxt = cent.copy()
            for c in range(4):
                members = q[cid == c]
                if len(members):
                    nxt[c] = members.sum(axis=0) // len(members)
            cent = nxt
    got = sorted(
        (r.iter, r.n_points, r.inertia)
        for r in REGISTRY["llm_kmeans_inertia"].fn(spark, SF_CORRECT).collect()
    )
    assert got == curve
    inertias = [i for _, _, i in got]
    assert inertias[0] >= inertias[1] >= inertias[2], "Lloyd must descend"


def test_packing_waste_sweep_matches_python(spark):
    from hdp2_5_hive2_spark.queries import REGISTRY

    docs = _docs(spark)
    chunks: dict[int, list] = defaultdict(list)
    for did in sorted(docs):
        chunks[did // 64].append(len(docs[did][1]))
    want = set()
    for cap in (128, 256, 512):
        fills = []
        for lens in chunks.values():
            fill, ndocs = 0, 0
            for t in lens:
                if ndocs > 0 and fill + t > cap:
                    fills.append(fill)
                    fill, ndocs = 0, 0
                fill += t
                ndocs += 1
            if ndocs:
                fills.append(fill)
        nb = len(fills)
        want.add(
            (
                cap,
                nb,
                sum(fills),
                sum(1 for f in fills if f > cap),
                sum(max(0, cap - f) for f in fills) * 1000 // (nb * cap),
            )
        )
    got = {
        (r.capacity, r.n_bins, r.n_tokens, r.n_overflow_bins, r.waste_milli)
        for r in REGISTRY["llm_packing_waste_sweep"].fn(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_interleave_schedule_matches_python_wfq(spark):
    from hdp2_5_hive2_spark.queries import REGISTRY

    rows = (
        load_tables(spark, SF_CORRECT)["events"]
        .select("event_type", "event_id", "ts")
        .collect()
    )
    per: dict[str, list] = defaultdict(list)
    for r in rows:
        per[r.event_type].append((r.ts, r.event_id))
    keyed = []
    for et, items in per.items():
        wt = {"purchase": 3, "click": 2}.get(et, 1)
        for i, (_, eid) in enumerate(sorted(items), start=1):
            keyed.append((i * (6 // wt), et, eid))
    keyed.sort()
    want = [
        (pos, et, eid, vk)
        for pos, (vk, et, eid) in enumerate(keyed[:30], start=1)
    ]
    got = [
        (r.pos, r.event_type, r.event_id, r.vkey)
        for r in REGISTRY["events_interleave_schedule"]
        .fn(spark, SF_CORRECT)
        .orderBy("pos")
        .collect()
    ]
    assert got == want
    # WFQ fairness: five streams at weights 3:2:1:1:1 (total 8) — the
    # 30-item schedule must give purchase ~30*3/8, click ~30*2/8, every
    # other stream ~30/8, each within one virtual-time round (one item).
    counts = Counter(et for _, et, _, _ in want)
    others = [c for et, c in counts.items() if et not in ("purchase", "click")]
    assert abs(counts["purchase"] - 30 * 3 / 8) <= 1.5
    assert abs(counts["click"] - 30 * 2 / 8) <= 1.5
    assert others and all(abs(c - 30 / 8) <= 1.5 for c in others)
    assert counts["purchase"] > counts["click"] > max(others) - 1
