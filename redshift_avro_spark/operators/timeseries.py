"""Hypertable rollup — multi-resolution time-bucket aggregates.

TimescaleDB-style continuous aggregates: the event stream is bucketed
at the finest resolution once, and every coarser resolution is
computed FROM the finer partials, never from the raw rows again. The
reference delegates this shape to Redshift SQL (SURVEY §2.6); Spark
has ``date_trunc`` but no hierarchical-reuse operator.

Why this is the 100 TB plan: the raw table is scanned and shuffled
exactly once (on the finest bucket — a uniform key); each coarser
level aggregates the previous level's output, whose cardinality is
bounded by the time span / resolution, not by the data volume. A
100 TB day re-aggregates ~1440 minute-rows into 24 hour-rows for
free. This only works for decomposable aggregates (count/sum/min/max
— here count + an exact decimal sum, so the hierarchical sums are
bit-equal to direct grouping, which is what the q101 oracle checks).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# date_trunc units ordered finest → coarsest (the supported ladder).
_UNITS = ("second", "minute", "hour", "day", "week", "month", "quarter", "year")


def hypertable_rollup(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    resolutions: Sequence[str] = ("minute", "hour", "day"),
) -> DataFrame:
    """Rollup ``df`` to every resolution in ``resolutions`` (finest
    first), computing each coarser level from the previous level's
    partial aggregates.

    Returns one row per (resolution, window start) with ``n`` (row
    count, BIGINT) and ``total`` (sum of ``value_col`` — pass an exact
    decimal column so hierarchical addition is associative).
    """
    if not resolutions:
        raise ValueError("hypertable_rollup: resolutions must be non-empty")
    order = [r.lower() for r in resolutions]
    unknown = [r for r in order if r not in _UNITS]
    if unknown:
        raise ValueError(f"hypertable_rollup: unknown resolutions {unknown}; use {_UNITS}")
    ranks = [_UNITS.index(r) for r in order]
    if ranks != sorted(ranks) or len(set(ranks)) != len(ranks):
        raise ValueError(
            f"hypertable_rollup: resolutions must be strictly finest→coarsest, got {list(resolutions)}"
        )

    finest = order[0]
    level = (
        df.select(
            F.date_trunc(finest, F.col(ts_col)).alias("w_start"),
            F.col(value_col).alias("__v"),
        )
        .groupBy("w_start")
        .agg(F.count("*").cast("long").alias("n"), F.sum("__v").alias("total"))
    )
    out = level.select(F.lit(finest).alias("resolution"), "w_start", "n", "total")
    for res in order[1:]:
        # re-aggregate the FINER level's partials — the raw table is
        # never touched again (sum-of-counts / sum-of-sums).
        level = (
            level.select(F.date_trunc(res, F.col("w_start")).alias("w_start"), "n", "total")
            .groupBy("w_start")
            .agg(F.sum("n").cast("long").alias("n"), F.sum("total").alias("total"))
        )
        out = out.unionByName(level.select(F.lit(res).alias("resolution"), "w_start", "n", "total"))
    return out
