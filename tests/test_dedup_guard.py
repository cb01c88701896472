"""Hot-band guard tests for MinHash-LSH candidate generation.

A flood of byte-identical documents puts every copy in the same band
buckets; without a cap the per-bucket pair explosion is quadratic in
the flood size. The guard drops over-cap bands (exact dedup upstream is
the right tool for identical text), keeping pair fan-out and per-group
collected-list memory bounded."""

from __future__ import annotations

import pytest

from redshift_avro_spark.operators.dedup import (
    DEFAULT_BAND_CAP,
    minhash_candidate_pairs,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """600 byte-identical docs + 4 distinct docs, two of them near-dups."""
    flood = [(i, "the same viral text repeated everywhere again and again") for i in range(600)]
    near_a = (1000, "a quick brown fox jumps over the lazy dog near the river bank")
    near_b = (1001, "a quick brown fox jumps over the lazy dog near the river bend")
    distinct = [
        (1002, "completely unrelated content about spark physical planning"),
        (1003, "another document body with no overlap whatsoever to others here"),
    ]
    return spark.createDataFrame(flood + [near_a, near_b] + distinct, "doc_id long, text string")


class TestHotBandGuard:
    def test_flood_band_is_dropped_but_normal_pairs_survive(self, corpus):
        pairs = minhash_candidate_pairs(
            corpus, "doc_id", "text", 12, 3, 3, band_cap=100
        ).collect()
        ids = {(r.id_a, r.id_b) for r in pairs}
        # no pair from the 600-doc flood (its bands exceed the cap) —
        # fan-out stays bounded instead of ~180k pairs
        assert not any(a < 1000 and b < 1000 for a, b in ids)
        # the legitimate near-dup pair outside the flood still surfaces
        assert (1000, 1001) in ids

    def test_cap_inactive_on_small_groups_is_identity(self, corpus):
        """With the flood under the cap, capped == uncapped output."""
        small = corpus.where("doc_id >= 590")  # 10 identical + 4 distinct
        capped = {
            (r.id_a, r.id_b)
            for r in minhash_candidate_pairs(small, "doc_id", "text", 12, 3, 3, band_cap=DEFAULT_BAND_CAP).collect()
        }
        uncapped = {
            (r.id_a, r.id_b)
            for r in minhash_candidate_pairs(small, "doc_id", "text", 12, 3, 3, band_cap=10**9).collect()
        }
        assert capped == uncapped
        assert (590, 591) in capped  # identical docs below cap still pair


def test_band_pairs_from_index_matches_batch_path(spark):
    # The streaming index verdict (band_pairs_from_index over a stored
    # (__id, band_key) ledger) must produce EXACTLY the batch
    # candidates for the same corpus — the q151 ≡ q31 contract.
    from redshift_avro_spark.operators.dedup import (
        band_pairs_from_index,
        minhash_band_keys_df,
        minhash_candidate_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words appear in this one text"),
            (4, "the quick brown fox jumps over the lazy dog"),
        ],
        ["doc_id", "text"],
    )
    batch = sorted(
        (r.id_a, r.id_b)
        for r in minhash_candidate_pairs(docs, "doc_id", "text").collect()
    )
    index = minhash_band_keys_df(docs, "doc_id", "text")
    from_index = sorted(
        (r.id_a, r.id_b) for r in band_pairs_from_index(index).collect()
    )
    assert from_index == batch and len(batch) >= 2  # 1-2, 1-4, 2-4 expected


def test_band_pairs_idempotent_under_replayed_ledger(spark):
    # q151's at-least-once foreachBatch can append a batch's band keys
    # twice; after distinct() the verdict must equal the clean index's
    # (no self-pairs, no spurious cap overflow).
    from redshift_avro_spark.operators.dedup import (
        band_pairs_from_index,
        minhash_band_keys_df,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
        ],
        ["doc_id", "text"],
    )
    index = minhash_band_keys_df(docs, "doc_id", "text")
    clean = sorted((r.id_a, r.id_b) for r in band_pairs_from_index(index).collect())
    replayed = index.unionAll(index).distinct()
    dup = sorted((r.id_a, r.id_b) for r in band_pairs_from_index(replayed).collect())
    assert dup == clean
    assert all(a < b for a, b in dup)
