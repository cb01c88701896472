"""Unit tests for incremental ingest screening
(operators/dedup.py:incremental_dedup_status).

The full oracle equivalence runs in test_queries_oracle.py (q70);
these isolate the status semantics on a crafted corpus where each
classification is known by construction.
"""

from __future__ import annotations

from redshift_avro_spark.operators.dedup import (
    incremental_dedup_status,
    minhash_band_keys_df,
)

_BASE = "the quick brown fox jumps over the lazy dog near the river bank today"


def _statuses(spark, existing_rows, incoming_rows):
    existing = spark.createDataFrame(existing_rows, ["doc_id", "text"])
    incoming = spark.createDataFrame(incoming_rows, ["doc_id", "text"])
    out = incremental_dedup_status(existing, incoming, "doc_id", "text")
    return {r.doc_id: r.status for r in out.collect()}


def test_exact_near_novel_classification(spark):
    existing = [(1, _BASE), (2, "completely different words entirely here now")]
    incoming = [
        (10, _BASE),  # byte-identical → exact_dup
        (11, _BASE + " extra"),  # one appended word: shares most shingles → near_dup
        (12, "zero overlap vocabulary xyzzy plugh quux foo bar baz qux corge"),  # novel
    ]
    got = _statuses(spark, existing, incoming)
    assert got[10] == "exact_dup"
    assert got[11] == "near_dup"
    assert got[12] == "novel"


def test_exact_wins_over_near(spark):
    # an exact duplicate necessarily also collides in every band;
    # precedence must still report exact_dup
    got = _statuses(spark, [(1, _BASE)], [(10, _BASE)])
    assert got == {10: "exact_dup"}


def test_short_incoming_doc_cannot_be_near_dup(spark):
    # <3 words → no shingles → no band keys → never near_dup, but the
    # doc must still be classified (novel), not dropped
    got = _statuses(spark, [(1, _BASE)], [(10, "two words")])
    assert got == {10: "novel"}


def test_band_keys_match_batch_pipeline(spark):
    # the extracted band-key builder must agree with itself across the
    # two call sites: identical text ⇒ identical band-key sets
    df_a = spark.createDataFrame([(1, _BASE)], ["doc_id", "text"])
    df_b = spark.createDataFrame([(2, _BASE)], ["doc_id", "text"])
    keys_a = {r.band_key for r in minhash_band_keys_df(df_a, "doc_id", "text").collect()}
    keys_b = {r.band_key for r in minhash_band_keys_df(df_b, "doc_id", "text").collect()}
    assert keys_a and keys_a == keys_b
