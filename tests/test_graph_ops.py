"""Unit tests for the integer-exact PageRank operator.

q102's DuckDB oracle already replays the iterations at testdata
scale; these tests pin the operator contract against an independent
pure-Python replica on crafted graphs — including dangling nodes,
hubs, zero iterations, and validation errors.
"""

from __future__ import annotations

from collections import Counter

import pytest

from redshift_avro_spark.operators.graph import TOTAL_MASS, pagerank


def _ref(edges, iters):
    nodes = sorted({u for e in edges for u in e})
    out = Counter(u for u, _ in edges)
    n = len(nodes)
    r = {v: TOTAL_MASS // n for v in nodes}
    base = (15 * TOTAL_MASS) // (100 * n)
    for _ in range(iters):
        inc = {v: 0 for v in nodes}
        for u, v in edges:
            inc[v] += (85 * r[u]) // (100 * out[u])
        r = {v: base + inc[v] for v in nodes}
    return r, out


EDGES = [
    (1, 2), (2, 1), (2, 3), (3, 2),   # symmetric path
    (4, 2), (5, 2), (6, 2),           # hub in-links
    (2, 7),                           # 7 is dangling (no out-edges)
]


def _spark_edges(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


@pytest.mark.parametrize("iters", [0, 1, 3, 5])
def test_matches_pure_python_replica(spark, iters):
    got = {
        r.node: (r.outdeg, r.rank_fp)
        for r in pagerank(_spark_edges(spark, EDGES), iterations=iters).collect()
    }
    want_r, want_out = _ref(EDGES, iters)
    assert set(got) == set(want_r)
    for v in want_r:
        assert got[v] == (want_out.get(v, 0), want_r[v]), f"node {v}"


def test_symmetric_graph_conserves_mass_within_floor_loss(spark):
    sym = [(u, v) for u, v in EDGES if u != 7 and v != 7]
    sym = sym + [(v, u) for u, v in sym if (v, u) not in sym]
    out = pagerank(_spark_edges(spark, sym), iterations=5).collect()
    total = sum(r.rank_fp for r in out)
    # every integral division floors away < 1 unit per edge per round,
    # plus < 1 per node for the base term
    assert TOTAL_MASS - 5 * (len(sym) + len(out)) <= total <= TOTAL_MASS


def test_hub_outranks_leaves(spark):
    ranks = {r.node: r.rank_fp for r in pagerank(_spark_edges(spark, EDGES), iterations=5).collect()}
    assert ranks[2] == max(ranks.values())
    assert ranks[7] > min(ranks.values())  # dangling node still receives mass


def test_validation(spark):
    e = _spark_edges(spark, EDGES)
    with pytest.raises(ValueError, match="iterations"):
        pagerank(e, iterations=-1)
    with pytest.raises(ValueError, match="edge columns"):
        pagerank(e.withColumnRenamed("dst", "to"))


def test_triangle_count_k4_plus_pendant(spark):
    from redshift_avro_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} -> 4 triangles, each node in 3; pendant 4-5 adds none
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.deg, r.n_triangles) for r in triangle_count(df).collect()}
    assert got == {1: (3, 3), 2: (3, 3), 3: (3, 3), 4: (4, 3)}


def test_triangle_count_triangle_free_bipartite(spark):
    from redshift_avro_spark.operators.graph import triangle_count

    # complete bipartite K2,3 has no odd cycles -> zero triangles
    edges = [(a, b) for a in (1, 2) for b in (10, 11, 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert triangle_count(df).count() == 0


def test_triangle_count_hub(spark):
    from redshift_avro_spark.operators.graph import triangle_count

    # star hub + one rim edge: exactly one triangle (hub, 1, 2)
    edges = [(100, i) for i in range(1, 9)] + [(1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == {100: 1, 1: 1, 2: 1}


def test_triangle_count_huge_and_negative_ids(spark):
    """ADVICE r3: the (deg, node) total order must be a real struct
    comparison, not `deg * 2^32 + node` arithmetic — ids >= 2^32 or
    negative ids would silently mis-orient and miscount."""
    from redshift_avro_spark.operators.graph import triangle_count

    big = 1 << 40
    # K4 on {-2, -1, big, big+1} -> 4 triangles, every node in 3
    nodes = [-2, -1, big, big + 1]
    edges = [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.deg, r.n_triangles) for r in triangle_count(df).collect()}
    assert got == {n: (3, 3) for n in nodes}
