"""Range (interval-overlap) join — points matched to covering intervals.

The reference delegates all relational processing to Redshift SQL
(README.md:13-17); a time-range join there is a non-equi ``JOIN ON ts
BETWEEN start AND stop``, which a distributed engine must not execute
as a broadcast-nested-loop over the full corpus. This module provides
the scalable composition: quantize the time axis into fixed-width
buckets, explode each interval onto every bucket it covers, equi-join
points to intervals on the bucket key, then apply the exact bounds as
a post-filter.

Why this is the 100 TB plan:

- The only shuffle is a hash partition on the uniform bucket key (time
  is uniform by construction at any scale); no candidate explosion
  beyond ``ceil(len/width)+1`` bucket replicas per interval.
- Each (point, interval) pair meets in EXACTLY one bucket — the
  point's own — so no post-join dedup is needed.
- Cost is tunable: ``bucket_width_s`` ≈ the typical interval length
  keeps interval replication ≤2× while each bucket's point×interval
  product stays local to one task. AQE handles a temporally skewed
  bucket (a flash-crowd hour) via skew-join splitting.

Spark ships no interval join (Structured Streaming's stream-stream
interval join is the streaming cousin — see queries/streaming_q.py
q76); DuckDB's plain ``BETWEEN`` join is the oracle (q98).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORK_COLS = ("__bucket", "__p_us", "__s_us", "__e_us")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_width_s: int,
    max_interval_s: Optional[int] = None,
) -> DataFrame:
    """Inner-join every ``points`` row to every ``intervals`` row whose
    ``[start_ts, end_ts]`` (inclusive both ends) contains ``point_ts``.

    Timestamps are compared at exact microsecond precision. The two
    inputs must have disjoint column names (the result carries all of
    both). Intervals with ``end_ts < start_ts`` match nothing.

    ``max_interval_s`` (optional) asserts an upper bound on interval
    length at plan level: a malformed open-ended interval would
    otherwise explode onto the whole time axis. Violations are
    excluded (matching nothing) rather than silently exploded.
    """
    if bucket_width_s <= 0:
        raise ValueError(f"range_join: bucket_width_s must be positive, got {bucket_width_s}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"range_join: inputs share column names {sorted(overlap)}; "
            "rename one side first (the result carries all columns of both)"
        )
    for side, cols in (("points", points.columns), ("intervals", intervals.columns)):
        bad = [c for c in cols if c in _WORK_COLS]
        if bad:
            raise ValueError(f"range_join: {side} uses reserved working columns {bad}")
    if point_ts not in points.columns:
        raise ValueError(f"range_join: point_ts column {point_ts!r} not in points")
    missing = [c for c in (start_ts, end_ts) if c not in intervals.columns]
    if missing:
        raise ValueError(f"range_join: interval columns {missing} not in intervals")

    width_us = F.lit(int(bucket_width_s) * 1_000_000)
    p = points.withColumn("__p_us", F.unix_micros(F.col(point_ts).cast("timestamp"))).withColumn(
        "__bucket", F.floor(F.col("__p_us") / width_us)
    )
    i = intervals.withColumn(
        "__s_us", F.unix_micros(F.col(start_ts).cast("timestamp"))
    ).withColumn("__e_us", F.unix_micros(F.col(end_ts).cast("timestamp")))
    valid = F.col("__e_us") >= F.col("__s_us")
    if max_interval_s is not None:
        valid = valid & (
            F.col("__e_us") - F.col("__s_us") <= F.lit(int(max_interval_s) * 1_000_000)
        )
    # Invalid intervals match nothing: empty bucket array → explode drops
    # the row (inner-join semantics, no silent full-axis explosion).
    i = i.withColumn(
        "__bucket",
        F.explode(
            F.when(
                valid,
                F.sequence(
                    F.floor(F.col("__s_us") / width_us), F.floor(F.col("__e_us") / width_us)
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ),
    )
    return (
        p.join(i, "__bucket")
        .where((F.col("__p_us") >= F.col("__s_us")) & (F.col("__p_us") <= F.col("__e_us")))
        .drop(*_WORK_COLS)
    )
