"""Shard-planning invariants for operators/compaction.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshift_avro_spark.operators.compaction import plan_shards

TARGET = 1000


@pytest.fixture(scope="module")
def sized(spark):
    # deterministic ragged sizes 50..449 bytes
    return spark.range(400).select(
        F.col("id").alias("doc_id"),
        (F.lit(50) + (F.col("id") * 37) % 400).alias("nbytes"),
    )


class TestPlanShards:
    def test_every_row_lands_in_exactly_one_shard(self, sized):
        plan = plan_shards(sized, "doc_id", F.col("nbytes"), TARGET, n_buckets=8)
        rows = plan.collect()
        assert sum(r.n_docs for r in rows) == 400
        total = sized.agg(F.sum("nbytes")).collect()[0][0]
        assert sum(r.total_bytes for r in rows) == total

    def test_overfill_bounded_by_one_row(self, sized):
        """First-fit-by-offset: a shard exceeds the target only by its
        final row, so total - max_row_bytes < target for every shard."""
        plan = plan_shards(sized, "doc_id", F.col("nbytes"), TARGET, n_buckets=8)
        max_row = 449
        for r in plan.collect():
            assert r.total_bytes - max_row < TARGET

    def test_shards_are_contiguous_per_bucket(self, sized):
        plan = plan_shards(sized, "doc_id", F.col("nbytes"), TARGET, n_buckets=8).collect()
        by_bucket: dict[int, list] = {}
        for r in plan:
            by_bucket.setdefault(r.bucket, []).append(r)
        for rows in by_bucket.values():
            rows.sort(key=lambda r: r.shard)
            # shard ids dense from 0 and id-ranges non-overlapping in order
            assert [r.shard for r in rows] == list(range(len(rows)))
            for a, b in zip(rows, rows[1:]):
                assert a.last_id < b.first_id
