"""Iterative graph algorithms — integer-exact PageRank.

Complements the min-label-propagation connected components in
:mod:`.dedup` (q63): PageRank is the other canonical iterative
dataflow, and together they cover the two shapes every distributed
graph engine must handle (fixpoint label flooding vs fixed-round
value propagation). The reference delegates all post-decode
processing to Redshift SQL (README.md:13-17); recursive SQL can't
express damping, so this is a genuinely Spark-side operator.

Determinism contract: ranks are BIGINT fixed-point (total mass 10¹²,
damping 85/100) and every division is integral (`div`), so the result
is bit-identical regardless of partitioning, accumulation order or
engine — which is what lets a DuckDB oracle replay the iterations as
unrolled CTEs (q102) and hash-match.

100 TB story: each iteration is one equi-join of the edge list with
the current rank vector (shuffle on the uniform node key) plus one
aggregation on dst — O(E) per round, no driver-side state beyond the
loop counter. Lineage is cut per round with ``localCheckpoint`` (the
q63 pattern) so the plan stays flat at any iteration count. A
power-law hub is ordinary key skew: AQE skew-join handles the join
side, and the dst aggregation map-side combines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOTAL_MASS = 1_000_000_000_000  # 10^12 fixed-point units across all nodes


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-round PageRank over a directed edge list.

    Returns one row per node — ``(node, outdeg, rank_fp)`` — where
    ``rank_fp`` is the BIGINT fixed-point rank after ``iterations``
    rounds of ``r'(v) = (15·M) div (100·N) + Σ_{u→v} (85·r(u)) div
    (100·outdeg(u))`` with M = 10¹² total mass.

    Nodes are the union of both endpoint columns. A dangling node
    (no out-edges) keeps receiving the base mass but contributes
    nothing — the standard sink simplification; pre-symmetrize the
    edge list (add reverse edges) if mass conservation matters, as
    q102 does.
    """
    if iterations < 0:
        raise ValueError(f"pagerank: iterations must be >= 0, got {iterations}")
    missing = [c for c in (src, dst) if c not in edges.columns]
    if missing:
        raise ValueError(f"pagerank: edge columns {missing} not in edges")

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    outdeg = e.groupBy("src").agg(F.count("*").cast("long").alias("outdeg"))
    # edge list annotated with the source's out-degree, computed once
    # and reused every round
    ew = e.join(outdeg, "src")
    n_df = F.broadcast(nodes.agg(F.count("*").cast("long").alias("n_nodes")))

    base = F.expr(f"({15 * TOTAL_MASS} div (100 * n_nodes))")
    ranks = nodes.crossJoin(n_df).select(
        "node", F.expr(f"({TOTAL_MASS} div n_nodes)").cast("long").alias("rank_fp")
    )
    if checkpoint:
        ew = ew.localCheckpoint()
        ranks = ranks.localCheckpoint()
    for _ in range(iterations):
        inc = (
            ew.join(ranks, ew.src == ranks.node)
            .select("dst", F.expr("(85 * rank_fp) div (100 * outdeg)").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("inc"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            nodes.join(inc, "node", "left")
            .crossJoin(n_df)
            .select(
                "node",
                (base + F.coalesce(F.col("inc"), F.lit(0))).cast("long").alias("rank_fp"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint()
    return (
        ranks.join(outdeg, ranks.node == outdeg.src, "left")
        .select("node", F.coalesce("outdeg", F.lit(0)).cast("long").alias("outdeg"), "rank_fp")
    )
