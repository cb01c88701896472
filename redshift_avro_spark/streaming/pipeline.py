"""Streaming building blocks (composable, source-agnostic).

Every function takes and returns a DataFrame, so the same chain works
on any streaming source — ``spark.readStream.format("kafka")`` (where
``value`` is already binary and the reference's hex hop S1 disappears),
a Kinesis connector, or a file stream in tests. All stateful operators
carry explicit watermarks: unbounded state is the streaming version of
the 100 TB shuffle-that-kills-you.

Reference parity: the decode chain is SURVEY §3.3's envelope fusion
(hex → KPL → Spring headers → Avro datum) expressed as column
transforms; the reference's all-or-nothing batch failure envelope
(avro-file-udf/lambda_function.py:9-30) becomes per-row PERMISSIVE
nulls so one poison record cannot fail an entire micro-batch.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.columns import from_avro, from_hex


def read_binary_file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """File-based binary stream (parquet directory of payload rows) —
    the test/replay source; swap for Kafka in production."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def decode_avro_stream(
    stream: DataFrame,
    payload_col: str,
    schema: Union[str, dict],
    *,
    hex_encoded: bool = False,
    reader_schema: Union[str, dict, None] = None,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Decode a binary (or hex-string) Avro payload column into typed
    columns, keeping every other input column (e.g. arrival
    timestamps). Narrow map stage — no shuffle, no state."""
    payload: Column = F.col(payload_col)
    if hex_encoded:
        payload = from_hex(payload)
    decoded = stream.withColumn(
        "__decoded", from_avro(payload, schema, reader_schema=reader_schema, mode=mode)
    )
    keep = [c for c in stream.columns if c != payload_col]
    return decoded.select(*keep, "__decoded.*")


def windowed_agg(
    stream: DataFrame,
    ts_col: str,
    watermark: str,
    window_duration: str,
    slide: Optional[str] = None,
    group_cols: Sequence[str] = (),
    aggs: Optional[Sequence[Column]] = None,
) -> DataFrame:
    """Tumbling (or sliding) windowed aggregation with a watermark so
    state for closed windows is evicted. Late rows inside the watermark
    still update their window; beyond it they are dropped — the
    per-row, bounded-state answer to the reference's no-late-data
    story."""
    aggs = list(aggs) if aggs else [F.count("*").alias("n")]
    win = F.window(ts_col, window_duration, slide) if slide else F.window(ts_col, window_duration)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sessionized(
    stream: DataFrame,
    ts_col: str,
    watermark: str,
    gap: str,
    group_cols: Sequence[str],
    aggs: Optional[Sequence[Column]] = None,
) -> DataFrame:
    """Session windows: rows within ``gap`` of each other merge into one
    session per group key. State is bounded by the watermark."""
    aggs = list(aggs) if aggs else [F.count("*").alias("n")]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), *group_cols)
        .agg(*aggs)
        .withColumn("session_start", F.col("s.start"))
        .withColumn("session_end", F.col("s.end"))
        .drop("s")
    )


def dedup_within_watermark(
    stream: DataFrame, key_cols: Sequence[str], ts_col: str, watermark: str
) -> DataFrame:
    """Drop duplicate records (same business key) arriving within the
    watermark horizon — at-least-once sources made effectively-once
    with bounded state (state evicts as the watermark advances)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(key_cols))


def foreach_batch_sink(
    stream: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """foreachBatch sink: each micro-batch arrives as a normal batch
    DataFrame for JDBC/Redshift-style targets that have no native
    streaming writer (the landing half of the reference's streaming
    option). Returns the started StreamingQuery."""
    writer = stream.writeStream.foreachBatch(batch_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
