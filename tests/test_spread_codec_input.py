"""spread_codec_input / _parquet_file_count: the codec-stage
partitioning guard must repartition ONLY small-split inputs (cores/4
target) and leave real multi-split input untouched (no shuffle at
scale)."""

from __future__ import annotations

from conftest import SF_SMOKE

from redshift_avro_spark.queries import (
    _parquet_file_count,
    load_table,
    spread_codec_input,
)


def test_file_count_single_file():
    assert _parquet_file_count(SF_SMOKE, "events") == 1


def test_file_count_missing_table_defaults_to_one():
    assert _parquet_file_count(SF_SMOKE, "no_such_table") == 1


def test_small_input_is_spread(spark):
    df = load_table(spark, SF_SMOKE, "events")
    out = spread_codec_input(df, spark, input_splits=1)
    target = max(2, spark.sparkContext.defaultParallelism // 4)
    assert out.rdd.getNumPartitions() == target
    assert "Exchange" in out._jdf.queryExecution().executedPlan().toString()


def test_multi_split_input_keeps_partitioning(spark):
    df = load_table(spark, SF_SMOKE, "events")
    big = spark.sparkContext.defaultParallelism  # >= target
    out = spread_codec_input(df, spark, input_splits=big)
    # identical plan object — no repartition node added
    assert out is df


def test_unknown_split_count_assumes_small(spark):
    df = load_table(spark, SF_SMOKE, "events")
    out = spread_codec_input(df, spark)
    assert out is not df
