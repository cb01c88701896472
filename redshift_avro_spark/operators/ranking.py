"""Distributed exact global ranking — the scale-safe replacement for
a partition-less window.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY funnels the
whole dataset into ONE task in Spark; fine in an oracle, fatal at
100 TB. The standard fix is two-phase: histogram the rows into value
buckets (one map-side-combining count), turn the tiny bucket-count
table into cumulative offsets, then rank WITHIN each bucket (bounded
windows) and add the offset. The result is bit-identical to the
single window because bucketing is monotone in the sort key.

Used by the multi-signal blending query (q170); reusable for any
exact corpus-wide rank/percentile.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["distributed_rank"]


def distributed_rank(
    df: DataFrame,
    value_col: str,
    id_col: str,
    *,
    rank_name: str = "rank",
    n_buckets: int = 32,
    domain: int = 1_000_000,
) -> DataFrame:
    """Append an exact ascending ``rank_name`` column: the 1-based
    position of each row under ``ORDER BY value_col, id_col`` (the id
    tiebreak makes the order total, so ranks are deterministic).

    ``value_col`` must be integral in [0, ``domain``] (the repo's ppm
    convention). Bucket = value · n_buckets div (domain + 1) — a
    monotone map, so within-bucket order + cross-bucket offsets
    reproduce the global order exactly.

    Scale shape: one map-side-combining bucket count, one window over
    the ≤ n_buckets count rows for offsets, one broadcast join, one
    within-bucket window (each sorts only its own bucket). No stage
    sees more than one bucket's rows in one task."""
    if value_col not in df.columns or id_col not in df.columns:
        raise ValueError(f"distributed_rank: need {value_col!r} and {id_col!r} in df")
    if n_buckets < 1 or domain < 1:
        raise ValueError(
            f"distributed_rank: n_buckets and domain must be >= 1, got {n_buckets}, {domain}"
        )
    bucket: Column = F.expr(
        f"CAST({value_col} * {n_buckets} div {domain + 1} AS BIGINT)"
    ).alias("__bucket")
    with_bucket = df.withColumn("__bucket", bucket)
    counts = with_bucket.groupBy("__bucket").agg(F.count("*").alias("__n"))
    w_off = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )  # window over <= n_buckets rows
    offsets = counts.select(
        "__bucket",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__offset"),
    )
    w_in = Window.partitionBy("__bucket").orderBy(F.asc(value_col), F.asc(id_col))
    return (
        with_bucket.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            rank_name,
            (F.col("__offset") + F.row_number().over(w_in)).cast("long"),
        )
        .drop("__bucket", "__offset")
    )
