"""Training-data operator invariants (operators/training.py): packing
covers every document within its budget window, splits are group-aware,
sampling is deterministic, rebalancing hits targets without upsampling
— plus plan-shape checks (sampling stays narrow, rebalance joins
broadcast)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshift_avro_spark.operators.training import (
    hash_sample,
    mixture_rebalance,
    pack_sequences,
    stratified_sample,
    train_test_split,
    uniform_hash,
)

BUDGET = 1000


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"lang{i % 3}", 50 + (i * 37) % 400)  # tokens 50..449
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, toks long")


class TestPackSequences:
    def test_budget_window_invariant(self, docs):
        """Each doc's seq_id is exactly floor(preceding-cumsum/budget)."""
        packed = pack_sequences(
            docs, "toks", "doc_id", BUDGET, partition_cols=["lang"]
        ).collect()
        by_lang: dict[str, list] = {}
        for r in sorted(packed, key=lambda r: (r.lang, r.doc_id)):
            by_lang.setdefault(r.lang, []).append(r)
        n_total = 0
        for lang, rows in by_lang.items():
            cum = 0
            for r in rows:
                assert r.seq_id == cum // BUDGET, (lang, r.doc_id)
                cum += r.toks
                n_total += 1
        assert n_total == 300  # every doc assigned exactly once

    def test_sequences_fill_in_order(self, docs):
        packed = pack_sequences(docs, "toks", "doc_id", BUDGET, partition_cols=["lang"])
        agg = (
            packed.groupBy("lang", "seq_id")
            .agg(F.sum("toks").alias("t"), F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
            .collect()
        )
        # doc-id ranges of consecutive sequences never interleave
        for lang in {r.lang for r in agg}:
            rows = sorted((r for r in agg if r.lang == lang), key=lambda r: r.seq_id)
            for a, b in zip(rows, rows[1:]):
                assert a.hi < b.lo


class TestSplitAndSample:
    def test_split_is_group_aware(self, spark):
        df = spark.createDataFrame(
            [(i, f"content-{i % 20}") for i in range(200)], "doc_id long, text string"
        )
        out = train_test_split(df, key_col=F.md5("text"), test_fraction=0.3).collect()
        sides: dict[str, set] = {}
        for r in out:
            sides.setdefault(r.text, set()).add(r.split)
        assert all(len(s) == 1 for s in sides.values())  # no group straddles
        assert {r.split for r in out} == {"train", "test"}

    def test_hash_sample_deterministic_subset(self, docs):
        a = {r.doc_id for r in hash_sample(docs, 0.4, "doc_id").collect()}
        b = {r.doc_id for r in hash_sample(docs, 0.4, "doc_id").collect()}
        full = {r.doc_id for r in hash_sample(docs, 1.0, "doc_id").collect()}
        assert a == b and a < full and len(full) == 300
        # fraction is monotone: a 0.2 sample is a subset of the 0.4 one
        c = {r.doc_id for r in hash_sample(docs, 0.2, "doc_id").collect()}
        assert c < a

    def test_stratified_rates(self, docs):
        out = stratified_sample(
            docs, "lang", {"lang0": 1.0, "lang1": 0.5, "lang2": 0.0}, key_col="doc_id"
        )
        got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert got.get("lang0") == 100  # rate 1.0 keeps everything
        assert "lang2" not in got  # rate 0 drops everything
        assert 20 < got.get("lang1", 0) < 80

    def test_sampling_plan_is_narrow(self, docs):
        plan = hash_sample(docs, 0.4, "doc_id")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # no shuffle: pure scan+filter


class TestMixtureRebalance:
    def test_targets_and_binding_stratum(self, docs):
        # counts are 100 each; targets 60/20/20 -> lang0 binds (100/.6)
        out = mixture_rebalance(
            docs, "lang", {"lang0": 0.6, "lang1": 0.2, "lang2": 0.2}, key_col="doc_id"
        )
        got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        before = {"lang0": 100, "lang1": 100, "lang2": 100}
        assert got["lang0"] == 100  # binding stratum keeps everything
        assert all(got[k] <= before[k] for k in got)
        total = sum(got.values())
        shares = {k: v / total for k, v in got.items()}
        for k, t in {"lang0": 0.6, "lang1": 0.2, "lang2": 0.2}.items():
            assert abs(shares[k] - t) < 0.08, (k, shares[k])

    def test_rebalance_joins_broadcast(self, docs):
        plan = (
            mixture_rebalance(docs, "lang", {"lang0": 0.5, "lang1": 0.5}, key_col="doc_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan  # the corpus never shuffles


def test_uniform_hash_range_and_salt(spark):
    df = spark.range(1000).select(
        uniform_hash("id").alias("u"), uniform_hash("id", "other").alias("v")
    )
    row = df.agg(
        F.min("u").alias("lo"),
        F.max("u").alias("hi"),
        F.count(F.when(F.col("u") == F.col("v"), 1)).alias("collide"),
        F.avg("u").alias("mean"),
    ).collect()[0]
    assert 0.0 <= row.lo and row.hi < 1.0
    assert row.collide <= 2  # different salts decorrelate
    assert 0.4 < row.mean < 0.6


def test_length_bucket_stats_exact(spark):
    from redshift_avro_spark.operators.training import length_bucket_stats

    # tokens 10, 16 → bucket 16; 17 → 32; 100 → 128; huge → capped.
    df = spark.createDataFrame(
        [(10,), (16,), (17,), (100,), (3_000_000,)], "n_tok long"
    )
    out = {r.bucket: r for r in length_bucket_stats(df, "n_tok").collect()}
    assert set(out) == {16, 32, 128, 1 << 20}
    b16 = out[16]
    assert b16.n_docs == 2 and b16.sum_tokens == 26
    assert b16.padded_tokens == 32
    assert b16.waste_ppm == (32 - 26) * 1_000_000 // 32
    assert out[1 << 20].sum_tokens == 3_000_000  # cap keeps the doc
    # per-bucket padded >= sum always
    assert all(r.padded_tokens >= r.sum_tokens for r in out.values() if r.bucket != 1 << 20)


def test_domain_relevance_prefers_target_vocab(spark):
    from redshift_avro_spark.operators.training import domain_relevance

    target = spark.createDataFrame(
        [(100, "alpha beta alpha gamma")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha"),   # pure target vocab: top score
            (2, "alpha noise noise noise"),  # one target word
            (3, "noise junk filler words"),  # nothing scored: absent
        ],
        ["doc_id", "text"],
    )
    rows = domain_relevance(corpus, target, top_n=3).collect()
    by_rank = sorted(rows, key=lambda r: r.rel_rank)
    assert [r.doc_id for r in by_rank] == [1, 2]  # doc 3 joins nothing
    assert by_rank[0].rel_score > by_rank[1].rel_score
    assert by_rank[0].n_scored == 4 and by_rank[1].n_scored == 1


def test_pow2_bucket_sql_validates_range():
    import pytest
    from redshift_avro_spark.operators.training import pow2_bucket_sql

    with pytest.raises(ValueError):
        pow2_bucket_sql("x", lo=1 << 20, hi=1 << 20)
    with pytest.raises(ValueError):
        pow2_bucket_sql("x", lo=0)
