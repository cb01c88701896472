"""Differential tests for the round-4 operators: seeded-random inputs
checked against independent pure-Python references that implement the
same spec (not the same code path) — duplicated-span island merging,
PQ/ADC encode + ranking (including the exact integer quantization), and
domain-relevance ppm scoring. The DuckDB oracle equivalence for the
registered queries lives in test_queries_oracle.py; these cover the
operator parameter space beyond the single registered configuration.
"""

from __future__ import annotations

import hashlib
import math
import random

from pyspark.sql import functions as F


# ------------------------------------------------------------ helpers


def _py_duplicated_spans(docs: dict, w: int, min_docs: int) -> dict:
    """Reference: dict id -> (n_windows, n_dup_windows, n_dup_spans,
    dup_span_words, max_span_words); only ids with >= 1 window."""
    grams = {}
    for i, text in docs.items():
        ws = text.strip().lower().split()
        grams[i] = [" ".join(ws[p : p + w]) for p in range(len(ws) - w + 1)]
    by_gram = {}
    for i, gs in grams.items():
        for g in set(gs):
            by_gram.setdefault(g, set()).add(i)
    dup = {g for g, ids in by_gram.items() if len(ids) >= min_docs}
    out = {}
    for i, gs in grams.items():
        if not gs:
            continue
        pos = [p + 1 for p, g in enumerate(gs) if g in dup]
        spans = []
        for p in pos:
            if spans and p - spans[-1][1] <= w:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        dup_words = sum(e - s + w for s, e in spans)
        mx = max((e - s + w for s, e in spans), default=0)
        out[i] = (len(gs), len(pos), len(spans), dup_words, mx)
    return out


def test_duplicated_spans_random_corpora(spark):
    from redshift_avro_spark.operators.scrub import duplicated_spans

    rng = random.Random(42)
    vocab = [f"w{k}" for k in range(12)]
    for trial in range(3):
        w = rng.choice([2, 3, 4])
        docs = {
            i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))
            for i in range(30)
        }
        expect = _py_duplicated_spans(docs, w, 2)
        df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
        got = {
            r.doc_id: (
                r.n_windows,
                r.n_dup_windows,
                r.n_dup_spans,
                r.dup_span_words,
                r.max_span_words,
            )
            for r in duplicated_spans(df, w=w, min_docs=2).collect()
        }
        assert got == expect, f"trial={trial} w={w}"


def _sub_l2q(a, b, scale=1e6) -> int:
    acc = 0.0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return int(math.floor(acc * scale + 0.5))


def _py_pq_adc(vectors: dict, query_ids, k, m, ks, dim):
    sub = dim // m
    order = sorted(vectors, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cb = {}  # (j, cw) -> subvec
    for cw, vid in enumerate(order[:ks], start=1):
        for j in range(m):
            cb[(j, cw)] = vectors[vid][j * sub : (j + 1) * sub]
    codes = {}
    for vid, v in vectors.items():
        codes[vid] = [
            min(
                range(1, min(ks, len(order)) + 1),
                key=lambda cw: (_sub_l2q(v[j * sub : (j + 1) * sub], cb[(j, cw)]), cw),
            )
            for j in range(m)
        ]
    out = {}
    for q in query_ids:
        qv = vectors[q]
        lut = {
            (j, cw): _sub_l2q(qv[j * sub : (j + 1) * sub], cb[(j, cw)])
            for (j, cw) in cb
        }
        scored = [
            (sum(lut[(j, codes[n][j])] for j in range(m)), n)
            for n in vectors
            if n != q
        ]
        scored.sort()
        out[q] = [(r + 1, n, d) for r, (d, n) in enumerate(scored[:k])]
    return out


def test_pq_adc_random_vectors(spark):
    from redshift_avro_spark.operators.similarity import pq_adc_topk

    rng = random.Random(7)
    dim, m, ks, k = 8, 4, 4, 3
    vectors = {
        i: [round(rng.uniform(-1, 1), 3) for _ in range(dim)] for i in range(20)
    }
    expect = _py_pq_adc(vectors, [0, 1, 2], k, m, ks, dim)
    df = spark.createDataFrame(
        [(i, v) for i, v in vectors.items()], "vec_id long, embedding array<double>"
    )
    got = {}
    rows = pq_adc_topk(
        df, df.where("vec_id < 3"), "vec_id", "embedding", k=k, m=m, ks=ks, dim=dim
    ).collect()
    for r in rows:
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.adist_q))
    got = {q: sorted(v) for q, v in got.items()}
    assert got == expect


def _py_domain_relevance(corpus: dict, target: dict, top_n: int):
    def words(text):
        return text.strip().lower().split()

    t_counts, t_tot = {}, 0
    for text in target.values():
        for w in words(text):
            t_counts[w] = t_counts.get(w, 0) + 1
            t_tot += 1
    r_counts, r_tot = {}, 0
    for text in corpus.values():
        for w in words(text):
            r_counts[w] = r_counts.get(w, 0) + 1
            r_tot += 1
    wt = {
        w: (c * 1_000_000) // t_tot - (r_counts.get(w, 0) * 1_000_000) // r_tot
        for w, c in t_counts.items()
    }
    scores = {}
    for i, text in corpus.items():
        sc = ns = 0
        for w in words(text):
            if w in wt:
                sc += wt[w]
                ns += 1
        if ns:
            scores[i] = (sc, ns)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:top_n]
    return [(r + 1, i, sc, ns) for r, (i, (sc, ns)) in enumerate(ranked)]


def test_domain_relevance_random_corpora(spark):
    from redshift_avro_spark.operators.training import domain_relevance

    rng = random.Random(99)
    vocab = [f"t{k}" for k in range(30)]
    corpus = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 15)))
        for i in range(40)
    }
    target = {
        1000 + i: " ".join(rng.choice(vocab[:10]) for _ in range(rng.randint(3, 12)))
        for i in range(5)
    }
    expect = _py_domain_relevance(corpus, target, top_n=10)
    cdf = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    tdf = spark.createDataFrame(list(target.items()), ["doc_id", "text"])
    rows = domain_relevance(cdf, tdf, top_n=10).collect()
    got = sorted((r.rel_rank, r.doc_id, r.rel_score, r.n_scored) for r in rows)
    assert got == expect
