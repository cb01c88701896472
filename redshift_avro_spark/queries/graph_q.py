"""Graph query: integer-exact PageRank (q102) over the customer–
supplier trade graph.

The graph is derived deterministically from the TPC-H fact tables:
one undirected edge per distinct (customer, supplier) trading pair in
lineitem⋈orders, with node ids disjointified as ``custkey·2`` /
``suppkey·2+1``. Symmetrizing the bipartite edges gives every node an
out-edge, so the sink simplification in
:func:`..operators.graph.pagerank` never loses mass here.

The oracle replays all five iterations as UNROLLED CTEs — the same
trick q45 uses for Lloyd's algorithm — which only works because the
operator's fixed-point integer arithmetic is associative and
division-exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_table, register
from ..operators.graph import pagerank

_ITERS = 5


def _iter_cte(k: int) -> str:
    return f"""r{k} AS (
      SELECT nd.node, (b.b + COALESCE(s.inc, 0)) AS rank
      FROM nodes nd CROSS JOIN base b
      LEFT JOIN (
        SELECT e.dst AS node, SUM((85 * r.rank) // (100 * e.outdeg)) AS inc
        FROM ew e JOIN r{k - 1} r ON e.src = r.node GROUP BY e.dst
      ) s USING (node)
    )"""


@register(
    "q102_pagerank",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT CAST(o.o_custkey * 2 AS BIGINT) AS c,
                      CAST(l.l_suppkey * 2 + 1 AS BIGINT) AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges),
    outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes),
    base AS (SELECT (15000000000000 // (100 * n_nodes)) AS b FROM n),
    ew AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN outdeg d ON e.src = d.src),
    r0 AS (SELECT node, (1000000000000 // n.n_nodes) AS rank FROM nodes, n),
    {", ".join(_iter_cte(k) for k in range(1, _ITERS + 1))}
    SELECT nd.node AS node_id, nd.node % 2 = 1 AS is_supplier,
           CAST(COALESCE(d.outdeg, 0) AS BIGINT) AS outdeg,
           CAST(r.rank AS BIGINT) AS rank_fp
    FROM nodes nd
    JOIN r{_ITERS} r USING (node)
    LEFT JOIN outdeg d ON nd.node = d.src
    ORDER BY node_id
    """,
)
def q102_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five rounds of fixed-point PageRank (damping 85/100, total mass
    10¹², every division integral) over the symmetrized customer–
    supplier trade graph — influence ranking as the second iterative
    graph shape next to q63's connected components.

    Each round is one edge⋈rank equi-join (uniform node key) + one
    dst aggregation; lineage is cut per round. Exact BIGINT
    arithmetic makes the result independent of partitioning and
    engine, so the oracle's unrolled-CTE replay hash-matches. 100 TB:
    O(E) per round, the rank vector is O(V); a power-law hub is
    ordinary AQE-splittable key skew."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("c"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    pr = pagerank(edges, iterations=_ITERS)
    return pr.select(
        F.col("node").alias("node_id"),
        (F.col("node") % 2 == 1).alias("is_supplier"),
        "outdeg",
        "rank_fp",
    ).orderBy("node_id")
