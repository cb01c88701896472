"""Unit tests for the batch range join and the hypertable rollup.

The q98/q101 oracles already pin the operators against DuckDB on the
testdata; these tests pin the operator CONTRACTS on crafted corpora —
equivalence to the naive nested-loop semantics across bucket widths,
inclusive bounds, degenerate intervals, validation errors, and the
hierarchical-rollup equivalence to direct grouping.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from redshift_avro_spark.operators.rangejoin import range_join
from redshift_avro_spark.operators.timeseries import hypertable_rollup


def _ts(minute, second=0, micro=0):
    return datetime.datetime(2024, 3, 1, 10, minute, second, micro)


@pytest.fixture(scope="module")
def frames(spark):
    # Points every 40 s over ~20 min; intervals of assorted lengths,
    # including zero-length, inverted (invalid) and boundary-touching.
    points = spark.createDataFrame(
        [(i, _ts(i // 2, (i % 2) * 40, 123456 * (i % 3))) for i in range(30)],
        "pid long, pts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts(0), _ts(5)),            # wide
            (101, _ts(3, 40, 123456), _ts(3, 40, 123456)),  # zero-length, exactly on point pid=7
            (102, _ts(7), _ts(6)),            # inverted → matches nothing
            (103, _ts(9, 59), _ts(12, 1)),    # straddles bucket edges
            (104, _ts(50), _ts(55)),          # beyond all points
        ],
        "iid long, s timestamp, e timestamp",
    )
    return points, intervals


def _naive(points, intervals):
    return (
        points.crossJoin(intervals)
        .where((F.col("pts") >= F.col("s")) & (F.col("pts") <= F.col("e")))
        .select("pid", "iid")
    )


@pytest.mark.parametrize("width_s", [7, 60, 300, 3600])
def test_matches_naive_semantics_any_bucket_width(spark, frames, width_s):
    points, intervals = frames
    got = sorted(
        range_join(
            points, intervals, point_ts="pts", start_ts="s", end_ts="e", bucket_width_s=width_s
        )
        .select("pid", "iid")
        .collect()
    )
    want = sorted(_naive(points, intervals).collect())
    assert got == want and len(want) > 0


def test_no_duplicate_pairs(spark, frames):
    points, intervals = frames
    out = range_join(
        points, intervals, point_ts="pts", start_ts="s", end_ts="e", bucket_width_s=60
    ).select("pid", "iid")
    assert out.count() == out.distinct().count()


def test_bounds_inclusive_and_microsecond_exact(spark):
    p = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 0, 0, 0, 1)), (2, datetime.datetime(2024, 1, 1, 0, 0, 1))],
        "pid long, pts timestamp",
    )
    i = spark.createDataFrame(
        [(9, datetime.datetime(2024, 1, 1, 0, 0, 0, 1), datetime.datetime(2024, 1, 1, 0, 0, 0, 999999))],
        "iid long, s timestamp, e timestamp",
    )
    rows = range_join(p, i, point_ts="pts", start_ts="s", end_ts="e", bucket_width_s=60).collect()
    # start bound inclusive at 1 µs precision; 0:00:01 is past the end
    assert [(r.pid, r.iid) for r in rows] == [(1, 9)]


def test_max_interval_guard_excludes_runaway(spark, frames):
    points, intervals = frames
    out = range_join(
        points,
        intervals,
        point_ts="pts",
        start_ts="s",
        end_ts="e",
        bucket_width_s=60,
        max_interval_s=120,  # drops the 5-min interval 100 and 103
    )
    assert sorted({r.iid for r in out.select("iid").collect()}) == [101]


def test_validation_errors(spark, frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="bucket_width_s"):
        range_join(points, intervals, point_ts="pts", start_ts="s", end_ts="e", bucket_width_s=0)
    with pytest.raises(ValueError, match="share column names"):
        range_join(
            points.withColumnRenamed("pid", "iid"),
            intervals,
            point_ts="pts",
            start_ts="s",
            end_ts="e",
            bucket_width_s=60,
        )
    with pytest.raises(ValueError, match="not in points"):
        range_join(points, intervals, point_ts="nope", start_ts="s", end_ts="e", bucket_width_s=60)
    with pytest.raises(ValueError, match="not in intervals"):
        range_join(points, intervals, point_ts="pts", start_ts="s", end_ts="nope", bucket_width_s=60)
    with pytest.raises(ValueError, match="reserved"):
        range_join(
            points.withColumn("__bucket", F.lit(1)),
            intervals,
            point_ts="pts",
            start_ts="s",
            end_ts="e",
            bucket_width_s=60,
        )


@pytest.fixture(scope="module")
def raw_events(spark):
    rows = []
    for i in range(500):
        # spread over ~42 hours so day/hour/minute levels all collapse rows
        rows.append((i, datetime.datetime(2024, 5, 1) + datetime.timedelta(minutes=i * 5, seconds=i % 60), i % 7))
    return spark.createDataFrame(rows, "id long, ts timestamp, v long").select(
        "ts", F.col("v").cast("decimal(18,2)").alias("v")
    )


def test_rollup_levels_match_direct_grouping(spark, raw_events):
    out = hypertable_rollup(raw_events, ts_col="ts", value_col="v").collect()
    by_res = {}
    for r in out:
        by_res.setdefault(r.resolution, []).append((r.w_start, r.n, r.total))
    for res in ("minute", "hour", "day"):
        direct = (
            raw_events.groupBy(F.date_trunc(res, "ts").alias("w_start"))
            .agg(F.count("*").cast("long").alias("n"), F.sum("v").alias("total"))
            .collect()
        )
        assert sorted(by_res[res]) == sorted((r.w_start, r.n, r.total) for r in direct)
    # counts conserve across levels
    assert sum(n for _, n, _ in by_res["minute"]) == sum(n for _, n, _ in by_res["day"]) == 500


def test_rollup_single_scan_after_aqe(spark, raw_events):
    df = hypertable_rollup(raw_events, ts_col="ts", value_col="v")
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split("Initial Plan")[0]
    # hour reuses the minute exchange, day reuses hour's — the
    # continuous-aggregate sharing comes from AQE exchange reuse
    assert final.count("Reused") >= 2


def test_rollup_validation(spark, raw_events):
    with pytest.raises(ValueError, match="non-empty"):
        hypertable_rollup(raw_events, ts_col="ts", value_col="v", resolutions=())
    with pytest.raises(ValueError, match="unknown resolutions"):
        hypertable_rollup(raw_events, ts_col="ts", value_col="v", resolutions=("fortnight",))
    with pytest.raises(ValueError, match="finest"):
        hypertable_rollup(raw_events, ts_col="ts", value_col="v", resolutions=("day", "minute"))
    with pytest.raises(ValueError, match="finest"):
        hypertable_rollup(raw_events, ts_col="ts", value_col="v", resolutions=("hour", "hour"))
