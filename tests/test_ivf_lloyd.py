"""Lloyd-refined IVF: recall on a clustered synthetic where the naive
first-N centroid seed is pathological (all seeds land in one cluster
because ids sort that way), so refinement must visibly help."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from redshift_avro_spark.operators.similarity import ivf_topk, lloyd_step, topk_neighbors

DIM = 8
PER_CLUSTER = 30


def _vec(center: int, j: int) -> list[float]:
    """Member j of cluster `center`: a tight deterministic cloud around
    one of three orthogonal-ish base directions."""
    base = [0.0] * DIM
    base[center] = 10.0
    base[center + 3] = 5.0
    return [
        round(b + 0.01 * ((j * (d + 7) * 2654435761) % 97 - 48) / 48.0, 6)
        for d, b in enumerate(base)
    ]


@pytest.fixture(scope="module")
def clustered(spark):
    # ids 0..29 cluster 0, 30..59 cluster 1, 60..89 cluster 2 — the
    # first-8-by-id seed puts every centroid in cluster 0
    rows = [
        (c * PER_CLUSTER + j, _vec(c, j))
        for c in range(3)
        for j in range(PER_CLUSTER)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _recall(approx, exact) -> float:
    a = {(r.query_id, r.neighbor_id) for r in approx}
    e = {(r.query_id, r.neighbor_id) for r in exact}
    return len(a & e) / len(e)


class TestLloydRecall:
    def test_lloyd_refinement_beats_first_n_seed(self, clustered):
        queries = clustered.where(F.col("vec_id").isin([5, 35, 65]))
        exact = topk_neighbors(clustered, queries, k=5).collect()
        # n_probe=1 exposes list quality: with the degenerate all-in-
        # cluster-0 seed, a single probed inverted list splits every
        # cluster arbitrarily; Lloyd-refined centroids align lists with
        # the cluster structure
        base = ivf_topk(
            clustered, queries, k=5, n_centroids=8, n_probe=1, lloyd_iters=0,
            dim=DIM, seed="first",
        ).collect()
        refined = ivf_topk(
            clustered, queries, k=5, n_centroids=8, n_probe=1, lloyd_iters=2,
            dim=DIM, seed="first",
        ).collect()
        r_base, r_refined = _recall(base, exact), _recall(refined, exact)
        assert r_refined > r_base
        assert r_refined >= 0.85

    def test_maximin_seed_beats_first_n_seed(self, spark):
        """Farthest-point init shines when n_centroids ≈ #clusters: on
        8 tight clusters with cluster-contiguous ids, first-8-by-id
        puts every seed in cluster 0 and even 2 Lloyd iterations can't
        fully recover (k-means from a degenerate seed loses clusters),
        while maximin covers all 8 clusters by construction and hits
        perfect n_probe=1 recall. (With #centroids ≫ #clusters the
        comparison genuinely flips — maximin then splits real clusters
        across lists — which is why this test pins the matched-k
        geometry rather than reusing the 3-cluster fixture.)"""
        dim, nc, per = 16, 8, 15

        def vec8(c, j):
            base = [0.0] * dim
            base[c] = 10.0
            base[(c + 5) % dim] = 4.0
            return [
                round(b + 0.01 * ((j * (d + 7) * 2654435761) % 97 - 48) / 48.0, 6)
                for d, b in enumerate(base)
            ]

        rows = [(c * per + j, vec8(c, j)) for c in range(nc) for j in range(per)]
        data = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        queries = data.where(F.col("vec_id").isin([c * per + 3 for c in range(nc)]))
        exact = topk_neighbors(data, queries, k=5).collect()
        first = ivf_topk(
            data, queries, k=5, n_centroids=nc, n_probe=1, lloyd_iters=2,
            dim=dim, seed="first",
        ).collect()
        mm = ivf_topk(
            data, queries, k=5, n_centroids=nc, n_probe=1, lloyd_iters=2,
            dim=dim, seed="maximin",
        ).collect()
        r_first, r_mm = _recall(first, exact), _recall(mm, exact)
        assert r_mm > r_first, (r_mm, r_first)
        assert r_mm == 1.0

    def test_maximin_seed_spreads_and_is_deterministic(self, clustered):
        from redshift_avro_spark.operators.similarity import maximin_seed

        c = clustered.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cvec")
        )
        seeds_a = maximin_seed(c, 6)
        seeds_b = maximin_seed(c, 6)
        assert seeds_a == seeds_b  # fully deterministic
        assert len({cid for cid, _ in seeds_a}) == 6  # never repeats a point
        # the first 3 picks must cover all 3 true clusters (ids are
        # cluster-contiguous: 0-29, 30-59, 60-89)
        first3_clusters = {cid // PER_CLUSTER for cid, _ in seeds_a[:3]}
        assert first3_clusters == {0, 1, 2}

    def test_oversample_seed_matches_maximin_recall(self, spark):
        """VERDICT r3 #5: the two-action oversampling seed must keep
        the perfect matched-k recall that exact maximin achieves on the
        8-cluster geometry (it sees every distance stratum via bands,
        then runs the same farthest-point rule over the candidates)."""
        dim, nc, per = 16, 8, 15

        def vec8(c, j):
            base = [0.0] * dim
            base[c] = 10.0
            base[(c + 5) % dim] = 4.0
            return [
                round(b + 0.01 * ((j * (d + 7) * 2654435761) % 97 - 48) / 48.0, 6)
                for d, b in enumerate(base)
            ]

        rows = [(c * per + j, vec8(c, j)) for c in range(nc) for j in range(per)]
        data = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        queries = data.where(F.col("vec_id").isin([c * per + 3 for c in range(nc)]))
        exact = topk_neighbors(data, queries, k=5).collect()
        ov = ivf_topk(
            data, queries, k=5, n_centroids=nc, n_probe=1, lloyd_iters=2,
            dim=dim, seed="oversample",
        ).collect()
        assert _recall(ov, exact) == 1.0

    def test_oversample_seed_spreads_and_is_deterministic(self, clustered):
        from redshift_avro_spark.operators.similarity import oversample_seed

        c = clustered.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cvec")
        )
        seeds_a = oversample_seed(c, 6)
        seeds_b = oversample_seed(c, 6)
        assert seeds_a == seeds_b  # fully deterministic
        assert len({cid for cid, _ in seeds_a}) == 6  # never repeats a point
        # the first 3 picks must cover all 3 true clusters, exactly as
        # exact maximin does (ids are cluster-contiguous)
        first3_clusters = {cid // PER_CLUSTER for cid, _ in seeds_a[:3]}
        assert first3_clusters == {0, 1, 2}

    def test_lloyd_step_is_exact_mean(self, spark):
        assign = spark.createDataFrame(
            [(1, [1.0, 2.0], 7), (2, [3.0, 5.0], 7), (3, [10.0, 20.0], 9)],
            "neighbor_id long, cvec array<double>, cid long",
        )
        cents = {r.cid: r.centvec for r in lloyd_step(assign, dim=2).collect()}
        assert cents[7] == [2.0, 3.5]
        assert cents[9] == [10.0, 20.0]


def test_semantic_dedup_finds_planted_duplicates(spark):
    """Planted near-duplicates (same direction, tiny jitter) must land
    in one component with the min-id keeper; singletons keep
    themselves. Cross-cluster pairs are out of scope by design (the
    cell bound is the scale trade) — verify none are claimed."""
    from pyspark.sql import functions as F

    from redshift_avro_spark.operators.similarity import semantic_dedup

    def vec(c, eps):
        base = [0.0] * DIM
        base[c] = 10.0
        base[c + 3] = 5.0
        return [b + eps * (d + 1) / DIM for d, b in enumerate(base)]

    rows = []
    vid = 0
    planted = []
    for c in range(3):
        group = []
        for j in range(4):  # 4 near-identical copies per cluster
            rows.append((vid, vec(c, 0.001 * j)))
            group.append(vid)
            vid += 1
        planted.append(group)
        rows.append((vid, [x * -1 for x in vec(c, 0.5)]))  # opposite dir: singleton
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            df, "vec_id", "embedding", threshold=0.99, n_centroids=3,
            lloyd_iters=1, dim=DIM,
        ).collect()
    }
    assert len(out) == vid  # one row per vector
    for group in planted:
        comps = {out[v].component_id for v in group}
        assert comps == {min(group)}, (group, comps)
        keepers = [v for v in group if out[v].is_keeper]
        assert keepers == [min(group)]
        assert all(out[v].n_dups == len(group) for v in group)
    singles = [v for v in out if all(v not in g for g in planted)]
    for v in singles:
        assert out[v].component_id == v and out[v].is_keeper and out[v].n_dups == 1


def test_ivf_add_retrieves_planted_new_vector(spark):
    # A new batch containing a near-copy of the query must surface at
    # rank 1 tagged 'new' — without retraining the base centroids.
    from redshift_avro_spark.operators.similarity import ivf_add_topk
    from pyspark.sql import functions as F

    dim = 8
    base_rows = []
    for i in range(12):
        v = [1.0 + 0.02 * i] + [0.02 * i] * (dim - 1)
        base_rows.append((i, [float(x) for x in v]))
    for i in range(12, 24):
        v = [-1.0 - 0.02 * i] + [0.0] * (dim - 2) + [0.02 * i]
        base_rows.append((i, [float(x) for x in v]))
    base = spark.createDataFrame(base_rows, "vec_id long, embedding array<double>")
    # near-copy of vec 0, plus a far vector
    new = spark.createDataFrame(
        [
            (1000, [1.001] + [0.0] * (dim - 1)),
            (1001, [0.0] * (dim - 1) + [9.9]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = ivf_add_topk(
        base, new, base.where(F.col("vec_id") == 0),
        k=3, n_centroids=2, n_probe=1, lloyd_iters=1, dim=dim,
    ).collect()
    top = min(out, key=lambda r: r.rank)
    assert top.neighbor_id == 1000 and top.origin == "new"
    # base members still retrievable alongside
    assert any(r.origin == "base" for r in out)


def test_ivf_add_upserts_overlapping_ids(spark):
    # An id shipped in BOTH base and new must resolve to the NEW vector
    # (upsert), never silently drop one of the two rows.
    from redshift_avro_spark.operators.similarity import ivf_add_topk
    from pyspark.sql import functions as F

    dim = 4
    base = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0, 0.0]),   # will be re-shipped pointing away
            (2, [0.95, 0.05, 0.0, 0.0]),
            (3, [0.0, 0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    new = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0, 1.0])],  # upsert: vec 1 moves far from vec 0
        "vec_id long, embedding array<double>",
    )
    out = ivf_add_topk(
        base, new, base.where(F.col("vec_id") == 0),
        k=4, n_centroids=2, n_probe=2, lloyd_iters=1, dim=dim,
    ).collect()
    rows = {r.neighbor_id: r for r in out}
    # vec 1 appears exactly once, tagged 'new', and no longer ranks as
    # vec 0's nearest neighbor (its old base vector is gone)
    assert rows[1].origin == "new"
    assert sum(1 for r in out if r.neighbor_id == 1) == 1
    assert min(out, key=lambda r: r.rank).neighbor_id == 2
