"""Unit tests: z-order interleave vs a Python reference, and kNN-graph
recall on planted clusters."""

from __future__ import annotations

import pytest

from redshift_avro_spark.operators.layout import BITS, interleave_sql, zone_map_layout


def _interleave_ref(xu: int, yu: int) -> int:
    z = 0
    for b in range(BITS):
        z |= ((xu >> b) & 1) << (2 * b + 1)
        z |= ((yu >> b) & 1) << (2 * b)
    return z


def test_interleave_matches_python_reference(spark):
    cases = [(0, 0), (1, 0), (0, 1), (65535, 0), (0, 65535), (43690, 21845), (513, 1027)]
    df = spark.createDataFrame(cases, "xu long, yu long")
    got = [r.z for r in df.selectExpr(f"({interleave_sql('xu', 'yu')}) AS z").collect()]
    assert got == [_interleave_ref(x, y) for x, y in cases]


def test_zone_map_layout_constant_dimension(spark):
    # degenerate: one distinct x value -> code 0 everywhere, no crash
    df = spark.createDataFrame([(5, i) for i in range(100)], "x long, y long")
    out = zone_map_layout(df, x_col="x", y_col="y", n_files=4)
    rows = out.collect()
    assert {r.layout for r in rows} == {"zorder", "linear"}
    assert sum(r.n_rows for r in rows if r.layout == "zorder") == 100
    with pytest.raises(ValueError, match="n_files"):
        zone_map_layout(df, x_col="x", y_col="y", n_files=0)
    with pytest.raises(ValueError, match="not in df"):
        zone_map_layout(df, x_col="nope", y_col="y")


def test_knn_graph_planted_clusters(spark):
    from redshift_avro_spark.operators.similarity import knn_graph

    dim = 16
    rows = []
    # two tight antipodal clusters of 6 vectors each
    for i in range(6):
        v = [1.0 + 0.01 * i] + [0.01 * i] * (dim - 1)
        rows.append((i, [float(x) for x in v]))
    for i in range(6, 12):
        v = [-1.0 - 0.01 * i] + [0.0] * (dim - 2) + [0.01 * i]
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = knn_graph(df, k=3, n_planes=4, n_bands=3, dim=dim).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.query_id, []).append(r.neighbor_id)
    # every discovered neighbor stays within the source's cluster
    for src, neighbors in by_src.items():
        same = set(range(6)) if src < 6 else set(range(6, 12))
        assert set(neighbors) <= same - {src}, (src, neighbors)
    # at least the first cluster is fully discovered (antipodal planes
    # always separate the two clusters, so recall within is high)
    assert set(by_src).issuperset(set(range(6)))

    with pytest.raises(ValueError, match="k, n_planes, n_bands"):
        knn_graph(df, k=0)


def test_pq_adc_recovers_planted_nearest(spark):
    # 8-dim, m=2 subspaces, ks=4 codewords (every vector donates its
    # subvectors, so codes are exact). Vectors 1/2 are near-copies of
    # vector 0's pattern; vector 3 is far. ADC must rank 1 and 2 above
    # 3 for query 0, despite scoring only codes. (With ks=2 the sampled
    # codebook holds only base-like codewords — vector 3 then collapses
    # onto a near codeword and ranks arbitrarily: representative
    # codebooks are the PQ recall knob, which is the point.)
    from redshift_avro_spark.operators.similarity import pq_adc_topk

    base = [1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0]
    far = [0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0]
    rows = [
        (0, base),
        (1, [v + 0.01 for v in base]),
        (2, [v + 0.02 for v in base]),
        (3, far),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pq_adc_topk(
        df, df.where("vec_id = 0"), "vec_id", "embedding", k=3, m=2, ks=4, dim=8
    ).collect()
    order = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert order[-1] == 3  # the far vector ranks last
    assert set(order[:2]) == {1, 2}
    # distances are integer-quantized and monotone
    dists = [r.adist_q for r in sorted(out, key=lambda r: r.rank)]
    assert dists == sorted(dists)
    assert all(isinstance(d, int) for d in dists)


def test_hard_negatives_excludes_same_label(spark):
    from redshift_avro_spark.operators.similarity import hard_negatives
    from pyspark.sql import functions as F

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.1], 0),   # same label: must never appear
        (2, [0.9, 0.2], 1),    # different label, very close: top negative
        (3, [0.0, 1.0], 1),    # different label, far
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = hard_negatives(
        df, "vec_id", "embedding", "label", k=2,
        anchors_filter=F.col("vec_id") == 0,
    ).collect()
    ids = [r.negative_id for r in sorted(out, key=lambda r: r.rank)]
    assert ids == [2, 3]  # hard negative first, same-label 1 excluded


def test_pq_adc_validates_params(spark):
    import pytest
    from redshift_avro_spark.operators.similarity import pq_adc_topk

    df = spark.createDataFrame([(0, [1.0] * 8)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        pq_adc_topk(df, df, m=3, dim=64)  # 64 % 3 != 0
    with pytest.raises(ValueError):
        pq_adc_topk(df, df, ks=0, m=2, dim=8)
