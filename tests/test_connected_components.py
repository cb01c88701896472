"""Connected-components operator (dedup clustering).

Min-label propagation must produce component_id = min node id of the
component regardless of edge direction, partitioning, or diameter —
a chain forces multiple propagation rounds, so convergence (not just
one round of neighbor-min) is what these tests pin down.
"""

from __future__ import annotations

from redshift_avro_spark.operators.dedup import connected_components


def _components(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df, "id_a", "id_b")
    return {r.id: r.component_id for r in out.collect()}


class TestConnectedComponents:
    def test_chain_needs_multiple_rounds(self, spark):
        # path 1-2-3-...-9: diameter 8, min label must travel end to end
        edges = [(i, i + 1) for i in range(1, 9)]
        got = _components(spark, edges)
        assert got == {i: 1 for i in range(1, 10)}

    def test_two_components_and_direction_invariance(self, spark):
        edges = [(5, 2), (2, 7), (30, 10), (10, 20)]  # reversed-edge mix
        got = _components(spark, edges)
        assert got == {2: 2, 5: 2, 7: 2, 10: 10, 20: 10, 30: 10}

    def test_clique_with_bridge(self, spark):
        clique = [(a, b) for a in (3, 4, 5) for b in (3, 4, 5) if a < b]
        got = _components(spark, clique + [(5, 6), (8, 9)])
        assert got == {3: 3, 4: 3, 5: 3, 6: 3, 8: 8, 9: 8}

    def test_max_iter_caps_rounds(self, spark):
        # one round of closed-neighborhood min on a path moves labels
        # at most one hop: node 3 sees 2's initial label (=2), not 1
        edges = [(1, 2), (2, 3), (3, 4)]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r.id: r.component_id
            for r in connected_components(df, "id_a", "id_b", max_iter=1).collect()
        }
        assert got[1] == 1 and got[2] == 1
        assert got[3] == 2  # propagation truncated by max_iter
