"""Structured Streaming pipeline tests.

Strategy: land deterministic rows (events slice, Avro-encoded payloads)
as parquet, readStream from the directory with availableNow triggers
into a memory sink, and compare against the batch-mode answer on the
same rows — the streaming plan must converge to the batch result once
every file is consumed.
"""

from __future__ import annotations

import json
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from conftest import SF_SMOKE

from redshift_avro_spark.queries import load_table
from redshift_avro_spark.sources.columns import to_avro, to_hex
from redshift_avro_spark.streaming import (
    decode_avro_stream,
    dedup_within_watermark,
    foreach_batch_sink,
    read_binary_file_stream,
    sessionized,
    windowed_agg,
)

EVENT_SCHEMA = {
    "type": "record",
    "name": "Event",
    "namespace": "engine.events",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "user_id", "type": "long"},
        {"name": "event_type", "type": "string"},
        {"name": "value", "type": "double"},
    ],
}

PAYLOAD_STRUCT = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


@pytest.fixture(scope="module")
def landed(spark, tmp_path_factory):
    """events slice → (ts, avro-binary payload) parquet landing dir."""
    path = str(tmp_path_factory.mktemp("stream-in"))
    e = load_table(spark, SF_SMOKE, "events").limit(600)
    (
        e.select(
            "ts",
            to_avro(
                F.struct("event_id", "user_id", "event_type", "value"), EVENT_SCHEMA
            ).alias("payload"),
        ).write.mode("overwrite").parquet(path)
    )
    return path


def _run_to_memory(spark, stream_df, name: str, output_mode: str = "append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_decode_matches_batch(spark, landed):
    stream = read_binary_file_stream(spark, landed, PAYLOAD_STRUCT, max_files_per_trigger=2)
    decoded = decode_avro_stream(stream, "payload", EVENT_SCHEMA)
    name = f"decoded_{uuid.uuid4().hex[:8]}"
    got = _run_to_memory(spark, decoded, name)
    batch = load_table(spark, SF_SMOKE, "events").limit(600)
    assert got.count() == 600
    assert sorted(got.columns) == ["event_id", "event_type", "ts", "user_id", "value"]
    s = got.agg(F.sum("event_id"), F.sum(F.col("value").cast("decimal(18,4)"))).collect()[0]
    b = batch.agg(F.sum("event_id"), F.sum(F.col("value").cast("decimal(18,4)"))).collect()[0]
    assert s == b


def test_stream_windowed_agg_matches_batch(spark, landed):
    stream = read_binary_file_stream(spark, landed, PAYLOAD_STRUCT)
    decoded = decode_avro_stream(stream, "payload", EVENT_SCHEMA)
    winagg = windowed_agg(
        decoded,
        "ts",
        watermark="1 hour",
        window_duration="1 hour",
        group_cols=["event_type"],
        aggs=[F.count("*").alias("n")],
    )
    name = f"winagg_{uuid.uuid4().hex[:8]}"
    got = _run_to_memory(spark, winagg, name, output_mode="append")

    batch = (
        load_table(spark, SF_SMOKE, "events")
        .limit(600)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    # availableNow consumed everything, so with append mode all windows
    # whose watermark passed are emitted; final watermark = max(ts) - 1h,
    # so the LAST window may be withheld — compare on the closed set.
    got_rows = {
        (r.window_start, r.event_type): r.n
        for r in got.select("window_start", "event_type", "n").collect()
    }
    batch_rows = {(r.window_start, r.event_type): r.n for r in batch.collect()}
    assert got_rows  # something was emitted
    for k, v in got_rows.items():
        assert batch_rows[k] == v


def test_stream_session_windows(spark, landed):
    stream = read_binary_file_stream(spark, landed, PAYLOAD_STRUCT)
    decoded = decode_avro_stream(stream, "payload", EVENT_SCHEMA)
    sess = sessionized(
        decoded,
        "ts",
        watermark="2 hours",
        gap="30 minutes",
        group_cols=["user_id"],
        aggs=[F.count("*").alias("n_events")],
    )
    name = f"sess_{uuid.uuid4().hex[:8]}"
    got = _run_to_memory(spark, sess, name, output_mode="append")
    rows = got.collect()
    assert rows
    for r in rows:
        assert r.session_end > r.session_start
        assert r.n_events >= 1


def test_stream_dedup_within_watermark(spark, landed, tmp_path):
    # duplicate the landing data → exactly 2 copies of every event_id
    dup_path = str(tmp_path / "dup-in")
    src = spark.read.parquet(landed)
    src.unionAll(src).write.mode("overwrite").parquet(dup_path)
    stream = read_binary_file_stream(spark, dup_path, PAYLOAD_STRUCT)
    decoded = decode_avro_stream(stream, "payload", EVENT_SCHEMA)
    deduped = dedup_within_watermark(decoded, ["event_id"], "ts", "1 hour")
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    got = _run_to_memory(spark, deduped, name)
    assert got.count() == 600
    assert got.select("event_id").distinct().count() == 600


def test_foreach_batch_sink(spark, landed, tmp_path):
    out_dir = str(tmp_path / "sink-out")
    ckpt = str(tmp_path / "ckpt")
    stream = read_binary_file_stream(spark, landed, PAYLOAD_STRUCT)
    decoded = decode_avro_stream(stream, "payload", EVENT_SCHEMA)
    seen_batches: list[int] = []

    def land(batch_df, batch_id: int) -> None:
        seen_batches.append(batch_id)
        batch_df.write.mode("append").parquet(out_dir)

    q = foreach_batch_sink(decoded, land, ckpt)
    q.awaitTermination(120)
    assert seen_batches
    assert spark.read.parquet(out_dir).count() == 600


def test_stateful_running_totals(spark, landed):
    """applyInPandasWithState: per-key accumulators across micro-batches.
    Final emission per key must equal the batch groupBy answer."""
    from redshift_avro_spark.streaming.stateful import running_totals

    stream = read_binary_file_stream(spark, landed, PAYLOAD_STRUCT, max_files_per_trigger=1)
    decoded = decode_avro_stream(stream, "payload", EVENT_SCHEMA)
    # NoTimeout — availableNow replays never terminate with an armed
    # processing-time timer (stateful.running_totals docstring)
    totals = running_totals(decoded, "event_type", "value", idle_timeout_ms=None)
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        totals.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stateful availableNow query must terminate"
    got = spark.table(name).toPandas()
    assert not got.empty
    # running emissions are monotone per key; the max is the final state
    final = got.groupby("key")["n_events"].max().to_dict()
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .limit(600)
        .groupBy("event_type")
        .count()
        .collect()
    )
    for r in batch:
        assert final[r["event_type"]] == r["count"], r


def test_interval_join_state_eviction(spark):
    """q76's production shape: with time-ordered landing and a bounded
    2-hour watermark, the stream-stream join must (a) still produce the
    exact batch answer and (b) actually EVICT join state as the
    watermark advances — the total state rows at the end must be far
    below the number of error+signup rows that passed through."""
    from redshift_avro_spark.queries.streaming_q import interval_join_pipeline

    df, q = interval_join_pipeline(spark, SF_SMOKE, watermark="2 hours")
    e = load_table(spark, SF_SMOKE, "events")
    batch = (
        e.where(F.col("event_type") == "error")
        .alias("e")
        .join(
            e.where(F.col("event_type") == "signup").alias("s"),
            (F.col("e.user_id") == F.col("s.user_id"))
            & (F.col("s.ts") >= F.col("e.ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("s.ts") <= F.col("e.ts")),
        )
        .count()
    )
    assert df.count() == batch
    sides = e.where(F.col("event_type").isin("error", "signup")).count()
    progresses = [p for p in q.recentProgress if p and p.get("stateOperators")]
    assert progresses, "no state-operator progress recorded"
    final_state = progresses[-1]["stateOperators"][0]["numRowsTotal"]
    removed = sum(
        p["stateOperators"][0].get("numRowsRemoved", 0) for p in progresses
    )
    assert removed > 0, "watermark advanced but no state rows were evicted"
    assert final_state < sides, (final_state, sides)


def test_running_totals_eviction_branch():
    """The ProcessingTimeTimeout eviction path can't be driven end to
    end under availableNow (the drain loop never terminates with a
    live timer — see stateful.running_totals), so the update function's
    timeout/accumulate/re-arm contract is checked directly."""
    import pandas as pd

    from redshift_avro_spark.streaming.stateful import make_running_totals_update

    class FakeState:
        def __init__(self, existing=None, timed_out=False):
            self._v = existing
            self.hasTimedOut = timed_out
            self.removed = False
            self.timeout_set = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self.removed = True
            self._v = None

        def setTimeoutDuration(self, ms):
            self.timeout_set = ms

    update = make_running_totals_update("value", idle_timeout_ms=60_000)

    # timed-out key: state removed, nothing emitted
    st = FakeState(existing=(3, 1.5), timed_out=True)
    assert list(update(("click",), iter([]), st)) == []
    assert st.removed

    # live key: accumulates onto existing state and re-arms the timer
    st = FakeState(existing=(2, 10.0))
    batches = iter([pd.DataFrame({"value": [1.0, 2.0]}), pd.DataFrame({"value": [4.0]})])
    [out] = list(update(("click",), batches, st))
    assert st._v == (5, 17.0)
    assert st.timeout_set == 60_000
    assert out.iloc[0]["n_events"] == 5 and out.iloc[0]["total_value"] == 17.0

    # NoTimeout variant must never arm a timer
    update_nt = make_running_totals_update("value", idle_timeout_ms=None)
    st = FakeState()
    [out] = list(update_nt(("view",), iter([pd.DataFrame({"value": [2.5]})]), st))
    assert st.timeout_set is None and st._v == (1, 2.5)


def test_socket_stream_decode(spark):
    """S8 over a REAL NETWORK source: events stream in as
    hex(Avro-datum) lines over a TCP socket (Spark's socket source),
    through the same hex→unhex→decode chain the file/Kafka paths use —
    demonstrating the decode chain is genuinely connector-agnostic
    beyond file replay (the sandbox has no Kafka jar; the socket source
    is a true network ingest with the same unbounded-stream contract)."""
    import socket
    import threading
    import time as _time

    from redshift_avro_spark.avroio.binary import encode_datum
    from redshift_avro_spark.avroio.schema_model import parse_schema

    rows = load_table(spark, SF_SMOKE, "events").limit(40).collect()
    schema = parse_schema(json.dumps(EVENT_SCHEMA))
    lines = [
        encode_datum(
            schema,
            {
                "event_id": r.event_id,
                "user_id": r.user_id,
                "event_type": r.event_type,
                "value": r.value,
            },
        ).hex()
        for r in rows
    ]

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        conn, _ = srv.accept()
        try:
            conn.sendall(("\n".join(lines) + "\n").encode())
            while not stop.is_set():  # keep the stream open until test end
                _time.sleep(0.1)
        finally:
            conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    name = f"socket_{uuid.uuid4().hex[:8]}"
    q = None
    try:
        stream = (
            spark.readStream.format("socket")
            .option("host", "127.0.0.1")
            .option("port", str(port))
            .load()
            .withColumnRenamed("value", "payload")
        )
        decoded = decode_avro_stream(stream, "payload", EVENT_SCHEMA, hex_encoded=True)
        q = (
            decoded.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        deadline = _time.time() + 90
        while _time.time() < deadline:
            if spark.table(name).count() >= len(lines):
                break
            _time.sleep(0.5)
        got = spark.table(name)
        assert got.count() == len(lines), "socket stream did not deliver all rows"
        s = got.agg(
            F.sum("event_id"), F.sum(F.col("value").cast("decimal(18,4)"))
        ).collect()[0]
        want_ids = sum(r.event_id for r in rows)
        assert s[0] == want_ids
    finally:
        stop.set()
        if q is not None:
            q.stop()
        srv.close()


def test_streaming_cdc_snapshot_maintenance(spark, tmp_path):
    """Continuous table maintenance: a stream of CDC batches applied to
    a persisted snapshot via foreachBatch + merge_upsert (q109's
    operator) — one micro-batch per landed file — must produce the
    same final table as applying the batches serially in batch mode.
    The production shape for keeping a 100 TB table current from a
    change feed without recomputing it."""
    import os

    from redshift_avro_spark.operators.cdc import merge_upsert

    feed_dir = str(tmp_path / "cdc-feed")
    ckpt = str(tmp_path / "cdc-ckpt")
    snap_root = str(tmp_path / "snapshots")
    os.makedirs(feed_dir)

    base = spark.createDataFrame(
        [(i, f"name_{i}", float(i * 10)) for i in range(1, 21)],
        "id long, name string, bal double",
    )
    batches = [
        # batch 0: update a few balances
        [(2, "upsert", None, 99.0), (5, "upsert", None, 55.0)],
        # batch 1: delete one, insert one
        [(3, "delete", None, None), (100, "upsert", "new_100", 1.0)],
        # batch 2: update the inserted row, delete an updated one
        [(100, "upsert", None, 2.0), (5, "delete", None, None)],
    ]
    ch_schema = "id long, op string, name string, bal double"
    import glob
    import time

    mt = time.time() - 3600
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, ch_schema).coalesce(1).write.parquet(
            f"{feed_dir}/batch={i}"
        )
        # FileStreamSource batches oldest-mtime-first; stamp the files
        # so batch order is deterministic, not write-latency luck
        for part in glob.glob(f"{feed_dir}/batch={i}/*.parquet"):
            os.utime(part, (mt + i * 10, mt + i * 10))

    base.write.parquet(f"{snap_root}/v0")
    state = {"current": f"{snap_root}/v0"}

    def apply_batch(batch_df, batch_id: int) -> None:
        snap = spark.read.parquet(state["current"])
        merged = merge_upsert(snap, batch_df, key="id").drop("action")
        new_path = f"{snap_root}/v{batch_id + 1}"
        merged.write.parquet(new_path)
        state["current"] = new_path

    stream = (
        spark.readStream.schema(ch_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir + "/batch=*")
    )
    q = foreach_batch_sink(stream, apply_batch, ckpt)
    assert q.awaitTermination(120)

    got = {
        r.id: (r.name, r.bal)
        for r in spark.read.parquet(state["current"]).collect()
    }
    # serial batch-mode reference
    want_df = base
    for rows in batches:
        want_df = merge_upsert(
            want_df, spark.createDataFrame(rows, ch_schema), key="id"
        ).drop("action")
    want = {r.id: (r.name, r.bal) for r in want_df.collect()}
    assert got == want
    assert got[2] == ("name_2", 99.0) and got[100] == ("new_100", 2.0)
    assert 3 not in got and 5 not in got
