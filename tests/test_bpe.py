"""Unit tests for BPE merge learning against a pure-Python replica.

The q105 oracle pins Spark-vs-DuckDB equality on the testdata; these
tests pin the algorithm itself on crafted corpora where the answers
are derivable by hand — including the adversarial overlapping-pair
case ("x x x x") where leftmost non-overlapping replace semantics and
overlapping pair COUNTS deliberately differ.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pytest

from redshift_avro_spark.operators.bpe import learn_bpe_merges


def _tok(w: str) -> str:
    return hashlib.md5(w.encode()).hexdigest()[:8]


def _ref(texts, rounds):
    corpus = []
    for t in texts:
        # mirror the engines: regex split of a trimmed empty string
        # yields [''] — a 1-token doc, not a dropped one
        ws = re.split(r"\s+", t.strip().lower())
        if ws:
            corpus.append("[" + "][".join(_tok(w) for w in ws) + "]")
    out = []
    for k in range(1, rounds + 1):
        counts = Counter()
        for s in corpus:
            toks = s[1:-1].split("][")
            for a, b in zip(toks, toks[1:]):
                counts[f"[{a}][{b}]"] += 1
        pattern, _ = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = pattern.replace("][", "+")
        corpus = [s.replace(pattern, merged) for s in corpus]
        tokens_after = sum(len(s[1:-1].split("][")) for s in corpus)
        out.append((k, pattern, merged, counts[pattern], tokens_after))
    return out


def _run(spark, texts, rounds):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = learn_bpe_merges(df, id_col="doc_id", text_col="text", rounds=rounds).collect()
    return sorted(
        (r.merge_round, r.pattern, r.merged, r.pair_count, r.tokens_after) for r in rows
    )


def test_simple_corpus_matches_replica(spark):
    texts = ["the cat sat", "the cat ran", "the dog sat", "a cat sat here"]
    assert _run(spark, texts, 3) == _ref(texts, 3)


def test_overlapping_pairs_counted_but_merged_nonoverlapping(spark):
    # "x x x x" has 3 overlapping (x,x) pairs but leftmost
    # non-overlapping replace merges only 2 → tokens 4 → 2
    texts = ["x x x x", "x x"]
    got = _run(spark, texts, 1)
    want = _ref(texts, 1)
    assert got == want
    (_, pattern, _, pair_count, tokens_after) = got[0]
    tx = _tok("x")
    assert pattern == f"[{tx}][{tx}]"
    assert pair_count == 4  # 3 overlapping in doc0 + 1 in doc1
    assert tokens_after == 3  # doc0: 2 merged tokens, doc1: 1


def test_merged_symbol_participates_in_later_rounds(spark):
    # after merging (a,b), round 2 must see the fused token as a unit
    texts = ["a b c"] * 5 + ["a b"] * 2
    got = _run(spark, texts, 2)
    want = _ref(texts, 2)
    assert got == want
    ta, tb, tc = _tok("a"), _tok("b"), _tok("c")
    assert got[0][1] == f"[{ta}][{tb}]"
    assert got[1][1] == f"[{ta}+{tb}][{tc}]"


def test_single_word_and_empty_docs_are_safe(spark):
    texts = ["lonely", "  ", "pair pair", "pair pair"]
    got = _run(spark, texts, 1)
    # whitespace-only doc: split yields [''] (1 token, no pairs) —
    # replica and operator must agree on that too
    assert got == _ref(texts, 1)


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="rounds"):
        learn_bpe_merges(df, id_col="doc_id", text_col="text", rounds=0)
    with pytest.raises(ValueError, match="not in docs"):
        learn_bpe_merges(df, id_col="nope", text_col="text", rounds=1)


def _ref_encode(texts, rounds):
    merges = _ref(texts, rounds)
    out = {}
    for i, t in enumerate(texts):
        ws = re.split(r"\s+", t.strip().lower())
        s = "[" + "][".join(_tok(w) for w in ws) + "]"
        before = len(s[1:-1].split("]["))
        for _, pattern, merged, _, _ in merges:
            s = s.replace(pattern, merged)
        toks = s[1:-1].split("][")
        out[i] = (
            before,
            len(toks),
            sum(1 for x in toks if "+" in x),
            (before - len(toks)) * 1_000_000 // before,
        )
    return out


def test_apply_matches_replica_and_learner_chain(spark):
    from redshift_avro_spark.operators.bpe import apply_bpe_merges

    texts = ["the cat sat", "the cat ran", "the dog sat", "a cat sat here", "cat cat cat"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = learn_bpe_merges(df, id_col="doc_id", text_col="text", rounds=3).select(
        "merge_round", "pattern", "merged"
    )
    got = {
        r.doc_id: (r.tokens_before, r.tokens_after, r.n_merged, r.saved_ppm)
        for r in apply_bpe_merges(df, merges, id_col="doc_id", text_col="text").collect()
    }
    assert got == _ref_encode(texts, 3)


def test_apply_validation(spark):
    from redshift_avro_spark.operators.bpe import apply_bpe_merges

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    merges = df.selectExpr(
        "1 as merge_round", "'[x][y]' as pattern", "'[x+y]' as merged"
    )
    with pytest.raises(ValueError, match="not in docs"):
        apply_bpe_merges(df, merges, id_col="nope", text_col="text")
    with pytest.raises(ValueError, match="not in merges"):
        apply_bpe_merges(df, merges.drop("pattern"), id_col="doc_id", text_col="text")
