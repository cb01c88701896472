"""Round-5 operators: JL projection, cluster cards, leakage-safe split.

The query-level value checks live in test_queries_oracle (every
registered query replays against its DuckDB oracle); these tests pin
the operator-level semantics the oracles can't see — the sign-matrix
construction, the split invariant, and the driver/distributed
equivalence of the centroid trainer.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from redshift_avro_spark.operators.similarity import (
    _centers_list,
    ivf_train_centroids,
    jl_project,
)


class TestJLProject:
    def test_projection_matches_hand_computed_signs(self, spark):
        dim = 4
        vec = [1.0, 2.0, 3.0, 4.0]
        df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<double>")
        out = jl_project(df, k=2, dim=dim, plane_offset=100).collect()[0]
        for j in range(2):
            signs = [
                1.0
                if int(hashlib.md5(f"p{100 + j}|{d}".encode()).hexdigest()[:15], 16) & 1
                else -1.0
                for d in range(dim)
            ]
            expected = 0.0
            for d in range(dim):
                expected += vec[d] * signs[d]
            assert out[f"p{j}"] == expected

    def test_distortion_concentrates_near_one(self, spark):
        # JL guarantee: E[|Pa-Pb|^2 / k] = |a-b|^2; with k=8 the mean
        # ratio over many pairs should land well inside [0.5, 1.5]
        import random

        rnd = random.Random(7)
        rows = [
            (i, [rnd.gauss(0.0, 1.0) for _ in range(16)]) for i in range(30)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        proj = jl_project(df, k=8, dim=16, plane_offset=100)
        joined = (
            df.join(proj, "vec_id")
            .select(
                "vec_id",
                "embedding",
                F.array(*[F.col(f"p{j}") for j in range(8)]).alias("p"),
            )
        )
        a = joined.select(
            F.col("vec_id").alias("ia"), F.col("embedding").alias("va"), F.col("p").alias("pa")
        )
        b = joined.select(
            F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"), F.col("p").alias("pb")
        )
        l2 = (
            "aggregate(zip_with({x}, {y}, (u, v) -> (u - v) * (u - v)),"
            " CAST(0 AS DOUBLE), (acc, t) -> acc + t)"
        )
        pairs = (
            a.join(b, F.col("ia") < F.col("ib"))
            .select(
                (F.expr(l2.format(x="pa", y="pb")) / 8.0
                 / F.expr(l2.format(x="va", y="vb"))).alias("ratio")
            )
            .agg(F.avg("ratio").alias("m"))
            .collect()[0]["m"]
        )
        assert 0.5 < pairs < 1.5

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError):
            jl_project(df, k=0, dim=1)
        with pytest.raises(ValueError):
            jl_project(df, id_col="nope", dim=1)


class TestLeakageSafeSplit:
    def test_no_component_straddles_the_boundary(self, spark):
        from redshift_avro_spark.queries import load_all

        out = (
            load_all()["q156_leakage_safe_split"]
            .fn(spark, SF_SMOKE)
            .groupBy("split_group")
            .agg(F.countDistinct("split").alias("n_sides"))
            .agg(F.max("n_sides").alias("mx"))
            .collect()[0]["mx"]
        )
        assert out == 1

    def test_every_document_is_covered(self, spark):
        from redshift_avro_spark.queries import load_all

        df = load_all()["q156_leakage_safe_split"].fn(spark, SF_SMOKE)
        n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
        assert df.count() == n_docs
        assert df.where(~F.col("split").isin("train", "test")).count() == 0


class TestDriverTrainEquivalence:
    def test_driver_and_distributed_centroids_are_bit_identical(self, spark):
        from redshift_avro_spark.operators import similarity as sim

        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        fast = _centers_list(ivf_train_centroids(emb, n_centroids=4, lloyd_iters=2))
        cap = sim.TRAIN_DRIVER_CAP
        try:
            sim.TRAIN_DRIVER_CAP = 0  # force the distributed path
            slow = _centers_list(ivf_train_centroids(emb, n_centroids=4, lloyd_iters=2))
        finally:
            sim.TRAIN_DRIVER_CAP = cap
        assert sorted(fast) == sorted(slow)


class TestCurationFunnel:
    def test_funnel_is_monotone_and_matches_q49(self, spark):
        from redshift_avro_spark.queries import load_all

        reg = load_all()
        rows = {
            r["stage"]: (r["n_in"], r["n_out"], r["n_dropped"])
            for r in reg["q157_curation_funnel"].fn(spark, SF_SMOKE).collect()
        }
        order = ["language", "quality", "min_words", "exact_dedup", "near_dup"]
        assert list(rows) == order or set(rows) == set(order)
        for stage in order:
            n_in, n_out, n_dropped = rows[stage]
            assert 0 <= n_out <= n_in and n_dropped == n_in - n_out
        # stages chain: each stage's n_in is the previous stage's n_out
        for prev, cur in zip(order, order[1:]):
            assert rows[cur][0] == rows[prev][1]
        # the funnel's final survivor count IS q49's result size
        q49_n = reg["q49_curation_pipeline"].fn(spark, SF_SMOKE).count()
        assert rows["near_dup"][1] == q49_n
