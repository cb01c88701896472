"""Kafka wire-protocol client vs an in-process broker.

The broker here implements the same PUBLIC v0 frames (Metadata,
ListOffsets, Fetch) from the spec — the Spring/Glue in-process-server
pattern applied to Kafka — so the client's framing, CRC verification,
offset arithmetic and executor-side range consumption are exercised
end to end over real TCP, without a Kafka installation.
"""

from __future__ import annotations

import socket
import struct
import threading

import pytest

from redshift_avro_spark.sources.kafka_wire import (
    EARLIEST,
    LATEST,
    KafkaWireClient,
    KafkaWireError,
    decode_message_set,
    encode_message_set,
    plan_offset_ranges,
    read_kafka_ranges,
)


class FakeBroker:
    """Single-node broker: {(topic, partition): [(key, value), ...]}."""

    def __init__(self, topics):
        self.topics = topics  # dict[(topic, partition)] -> list[(key, value)]
        self.server = socket.create_server(("127.0.0.1", 0))
        self.port = self.server.getsockname()[1]
        self._stop = False
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def close(self):
        self._stop = True
        self.server.close()

    # -- framing helpers ----------------------------------------------
    @staticmethod
    def _recv_exact(conn, n):
        out = bytearray()
        while len(out) < n:
            part = conn.recv(n - len(out))
            if not part:
                raise ConnectionError
            out += part
        return bytes(out)

    def _serve(self):
        while not self._stop:
            try:
                conn, _ = self.server.accept()
            except OSError:
                return
            threading.Thread(target=self._session, args=(conn,), daemon=True).start()

    def _session(self, conn):
        try:
            while True:
                (length,) = struct.unpack(">i", self._recv_exact(conn, 4))
                frame = self._recv_exact(conn, length)
                resp = self._handle(frame)
                conn.sendall(struct.pack(">i", len(resp)) + resp)
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()

    def _handle(self, frame):
        pos = 0
        api_key, api_version, corr = struct.unpack(">hhi", frame[pos:pos + 8])
        pos += 8
        (cid_len,) = struct.unpack(">h", frame[pos:pos + 2])
        pos += 2 + max(0, cid_len)
        body = frame[pos:]
        out = struct.pack(">i", corr)
        if api_key == 3:  # Metadata v0
            out += self._metadata(body)
        elif api_key == 2:  # ListOffsets v0
            out += self._list_offsets(body)
        elif api_key == 1:  # Fetch v0
            out += self._fetch(body)
        else:
            raise AssertionError(f"unsupported api_key {api_key}")
        return out

    @staticmethod
    def _read_str(buf, pos):
        (n,) = struct.unpack(">h", buf[pos:pos + 2])
        pos += 2
        s = buf[pos:pos + n].decode()
        return s, pos + n

    def _metadata(self, body):
        (n_topics,) = struct.unpack(">i", body[:4])
        pos = 4
        names = []
        for _ in range(n_topics):
            s, pos = self._read_str(body, pos)
            names.append(s)
        out = struct.pack(">i", 1)  # brokers
        out += struct.pack(">i", 0)  # node_id
        out += struct.pack(">h", 9) + b"127.0.0.1"
        out += struct.pack(">i", self.port)
        out += struct.pack(">i", len(names))
        for name in names:
            parts = sorted(p for (t, p) in self.topics if t == name)
            err = 0 if parts else 3  # UNKNOWN_TOPIC_OR_PARTITION
            out += struct.pack(">h", err)
            out += struct.pack(">h", len(name)) + name.encode()
            out += struct.pack(">i", len(parts))
            for p in parts:
                out += struct.pack(">hii", 0, p, 0)  # err, partition, leader
                out += struct.pack(">i", 1) + struct.pack(">i", 0)  # replicas
                out += struct.pack(">i", 1) + struct.pack(">i", 0)  # isr
        return out

    def _list_offsets(self, body):
        pos = 4  # replica_id
        (n_topics,) = struct.unpack(">i", body[pos:pos + 4]); pos += 4
        topic, pos = self._read_str(body, pos)
        (n_parts,) = struct.unpack(">i", body[pos:pos + 4]); pos += 4
        partition, when, _maxn = struct.unpack(">iqi", body[pos:pos + 16])
        msgs = self.topics.get((topic, partition), [])
        offset = 0 if when == EARLIEST else len(msgs)
        out = struct.pack(">i", 1)
        out += struct.pack(">h", len(topic)) + topic.encode()
        out += struct.pack(">i", 1)
        out += struct.pack(">ih", partition, 0)
        out += struct.pack(">i", 1) + struct.pack(">q", offset)
        return out

    def _fetch(self, body):
        pos = 12  # replica_id, max_wait, min_bytes
        (n_topics,) = struct.unpack(">i", body[pos:pos + 4]); pos += 4
        topic, pos = self._read_str(body, pos)
        (n_parts,) = struct.unpack(">i", body[pos:pos + 4]); pos += 4
        partition, offset, max_bytes = struct.unpack(">iqi", body[pos:pos + 16])
        msgs = self.topics.get((topic, partition), [])
        # serve at most 3 messages per fetch so range consumption needs
        # several round-trips; truncate the set to max_bytes mid-message
        # occasionally by construction of small max_bytes in tests
        window = msgs[offset:offset + 3]
        ms = encode_message_set(window, base_offset=offset)[:max_bytes]
        out = struct.pack(">i", 1)
        out += struct.pack(">h", len(topic)) + topic.encode()
        out += struct.pack(">i", 1)
        out += struct.pack(">ihq", partition, 0, len(msgs))
        out += struct.pack(">i", len(ms)) + ms
        return out


@pytest.fixture()
def broker():
    msgs_p0 = [(None, f"v{i}".encode()) for i in range(10)]
    msgs_p1 = [(f"k{i}".encode(), f"w{i}".encode()) for i in range(5)]
    b = FakeBroker({("ticks", 0): msgs_p0, ("ticks", 1): msgs_p1})
    yield b
    b.close()


def test_message_set_roundtrip_and_crc():
    ms = encode_message_set([(b"k", b"v"), (None, b"x" * 100)], base_offset=7)
    got = decode_message_set(ms)
    assert got == [(7, b"k", b"v"), (8, None, b"x" * 100)]
    # flip a payload byte -> CRC failure
    bad = bytearray(ms)
    bad[-1] ^= 0xFF
    with pytest.raises(KafkaWireError, match="CRC"):
        decode_message_set(bytes(bad))
    # partial trailing message is skipped, not an error
    assert decode_message_set(ms[:-3]) == [(7, b"k", b"v")]


def test_metadata_offsets_fetch(broker):
    with KafkaWireClient("127.0.0.1", broker.port) as c:
        parts = c.metadata("ticks")
        assert [p.partition for p in parts] == [0, 1]
        assert c.list_offset("ticks", 0, EARLIEST) == 0
        assert c.list_offset("ticks", 0, LATEST) == 10
        hw, msgs = c.fetch("ticks", 0, 0)
        assert hw == 10 and [m[0] for m in msgs] == [0, 1, 2]
        # unknown topic is loud
        with pytest.raises(KafkaWireError, match="no partitions|error"):
            c.metadata("nope")


def test_consume_range_spans_multiple_fetches(broker):
    with KafkaWireClient("127.0.0.1", broker.port) as c:
        got = list(c.consume_range("ticks", 0, 2, 9))
        assert [o for o, _, _ in got] == list(range(2, 9))
        assert got[0][2] == b"v2" and got[-1][2] == b"v8"


def test_plan_and_spark_read(spark, broker):
    assert plan_offset_ranges("127.0.0.1", broker.port, "ticks") == [(0, 0, 10), (1, 0, 5)]
    df = read_kafka_ranges(spark, "127.0.0.1", broker.port, "ticks")
    rows = df.collect()
    assert len(rows) == 15
    by_part = {}
    for r in rows:
        by_part.setdefault(r.partition, []).append((r.offset, bytes(r.value)))
    assert sorted(by_part[0]) == [(i, f"v{i}".encode()) for i in range(10)]
    assert sorted(by_part[1]) == [(i, f"w{i}".encode()) for i in range(5)]


def test_kafka_to_avro_decode_chain(spark, broker):
    """The point of the connector: Kafka value bytes flow into the
    SAME decode chain as every other source."""
    import json

    from redshift_avro_spark.avroio.binary import encode_datum
    from redshift_avro_spark.avroio.schema_model import parse_schema
    from redshift_avro_spark.sources.columns import from_avro

    schema = parse_schema(
        {"type": "record", "name": "T",
         "fields": [{"name": "n", "type": "long"}, {"name": "s", "type": "string"}]}
    )
    payloads = [(None, encode_datum(schema, {"n": i, "s": f"row{i}"})) for i in range(6)]
    b = FakeBroker({("avro", 0): payloads})
    try:
        df = read_kafka_ranges(spark, "127.0.0.1", b.port, "avro")
        decoded = df.select(
            "offset", from_avro("value", json.dumps(schema.to_json())).alias("rec")
        ).selectExpr("offset", "rec.n AS n", "rec.s AS s")
        rows = sorted((r.offset, r.n, r.s) for r in decoded.collect())
        assert rows == [(i, i, f"row{i}") for i in range(6)]
    finally:
        b.close()


def test_streaming_source_resumes_from_checkpoint(spark, tmp_path):
    """The connector-complete form: offsets live in the checkpoint log;
    a restart consumes exactly the newly produced suffix."""
    from redshift_avro_spark.sources.kafka_wire import read_kafka_stream

    store = {("s", 0): [(None, f"a{i}".encode()) for i in range(6)]}
    b = FakeBroker(store)
    ckpt = str(tmp_path / "ckpt")
    out: list = []

    def run_once(max_records=None):
        df = read_kafka_stream(
            spark, "127.0.0.1", b.port, "s", max_records_per_batch=max_records
        )
        q = (
            df.writeStream.foreachBatch(
                lambda bdf, bid: out.extend(
                    (r.partition, r.offset, bytes(r.value)) for r in bdf.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish"

    try:
        # first run drains everything available (the first batch of a
        # run is uncapped by construction — see KafkaWireStreamReader)
        run_once(max_records=4)
        assert sorted(out) == [(0, i, f"a{i}".encode()) for i in range(6)]
        # produce more, restart: only the suffix arrives
        store[("s", 0)].extend((None, f"b{i}".encode()) for i in range(3))
        before = len(out)
        run_once()
        assert sorted(out[before:]) == [(0, 6 + i, f"b{i}".encode()) for i in range(3)]
    finally:
        b.close()


def test_consume_range_grows_window_for_oversized_message(broker):
    """A single message larger than the fetch window must not abort:
    consume_range doubles max_bytes on a no-progress fetch (ADVICE r3)."""
    big = b"x" * (2 * 1024 * 1024)  # > default 1 MiB window
    b = FakeBroker({("big", 0): [(None, b"small"), (None, big), (None, b"tail")]})
    try:
        with KafkaWireClient("127.0.0.1", b.port) as c:
            got = list(c.consume_range("big", 0, 0, 3))
        assert [o for o, _, _ in got] == [0, 1, 2]
        assert got[1][2] == big and got[2][2] == b"tail"
    finally:
        b.close()


def test_streaming_restart_with_cap_no_redelivery_no_stall(spark, tmp_path):
    """ADVICE r3 (high): restarting a capped stream must resume after the
    checkpointed prefix — not re-deliver committed offsets and not stall
    at earliest+cap. The first planning call of each run skips the cap
    (true LATEST is always >= the checkpointed start)."""
    from redshift_avro_spark.sources.kafka_wire import read_kafka_stream

    store = {("rc", 0): [(None, f"m{i}".encode()) for i in range(10)]}
    b = FakeBroker(store)
    ckpt = str(tmp_path / "ckpt")
    out: list = []

    def run_once(max_records):
        df = read_kafka_stream(
            spark, "127.0.0.1", b.port, "rc", max_records_per_batch=max_records
        )
        q = (
            df.writeStream.foreachBatch(
                lambda bdf, bid: out.extend(
                    (r.partition, r.offset, bytes(r.value)) for r in bdf.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish"

    try:
        run_once(max_records=4)
        assert sorted(out) == [(0, i, f"m{i}".encode()) for i in range(10)]
        # produce a suffix, restart WITH the cap still set: the broken
        # cap floored at EARLIEST and planned end=4 < checkpointed
        # start=10, re-reading committed offsets (or stalling). The fix
        # must deliver exactly the suffix, once.
        store[("rc", 0)].extend((None, f"n{i}".encode()) for i in range(3))
        run_once(max_records=4)
        assert sorted(out) == (
            [(0, i, f"m{i}".encode()) for i in range(10)]
            + [(0, 10 + i, f"n{i}".encode()) for i in range(3)]
        ), "restart with cap re-delivered or stalled"
        assert len(out) == len(set(out)), "duplicate redelivery after restart"
    finally:
        b.close()


def test_streaming_cap_applies_after_first_batch(spark, tmp_path):
    """In a continuous (processingTime) run, batches after the first are
    capped at maxRecordsPerBatch per partition."""
    import time

    from redshift_avro_spark.sources.kafka_wire import read_kafka_stream

    store = {("cp", 0): [(None, f"a{i}".encode()) for i in range(2)]}
    b = FakeBroker(store)
    batches: list = []

    def sink(bdf, bid):
        rows = sorted(r.offset for r in bdf.collect())
        if rows:
            batches.append(rows)

    try:
        df = read_kafka_stream(
            spark, "127.0.0.1", b.port, "cp", max_records_per_batch=3
        )
        q = (
            df.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="300 milliseconds")
            .start()
        )
        deadline = time.time() + 60
        while not batches and time.time() < deadline:
            time.sleep(0.2)
        assert batches and batches[0] == [0, 1], "first (uncapped) batch missing"
        store[("cp", 0)].extend((None, f"b{i}".encode()) for i in range(8))
        while sum(len(x) for x in batches) < 10 and time.time() < deadline:
            time.sleep(0.2)
        q.stop()
        assert sorted(o for rows in batches for o in rows) == list(range(10))
        assert all(len(x) <= 3 for x in batches[1:]), (
            f"cap violated after first batch: {batches}"
        )
        assert len(batches) >= 4  # 8 extra records under cap 3 → >= 3 batches
    finally:
        b.close()


def test_streaming_kafka_avro_window_chain(spark, tmp_path):
    """Connector-complete streaming path: wire-protocol source →
    from_avro decode → aggregation, all inside Spark's streaming
    engine — the reference's Stream-Ingest diagram end to end."""
    import json

    from pyspark.sql import functions as F
    from redshift_avro_spark.avroio.binary import encode_datum
    from redshift_avro_spark.avroio.schema_model import parse_schema
    from redshift_avro_spark.sources.columns import from_avro
    from redshift_avro_spark.sources.kafka_wire import read_kafka_stream

    schema = parse_schema(
        {"type": "record", "name": "E",
         "fields": [{"name": "etype", "type": "string"}, {"name": "v", "type": "long"}]}
    )
    payloads = [
        (None, encode_datum(schema, {"etype": "click" if i % 2 else "view", "v": i}))
        for i in range(10)
    ]
    b = FakeBroker({("ev", 0): payloads})
    agg: dict = {}

    def sink(bdf, bid):
        rows = (
            bdf.select(from_avro("value", json.dumps(schema.to_json())).alias("r"))
            .groupBy("r.etype")
            .agg(F.count("*").alias("n"), F.sum("r.v").alias("s"))
            .collect()
        )
        for r in rows:
            n, s = agg.get(r.etype, (0, 0))
            agg[r.etype] = (n + r.n, s + r.s)

    try:
        df = read_kafka_stream(spark, "127.0.0.1", b.port, "ev")
        q = (
            df.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        assert agg == {"view": (5, 0 + 2 + 4 + 6 + 8), "click": (5, 1 + 3 + 5 + 7 + 9)}
    finally:
        b.close()


def test_client_survives_connection_drops():
    """Brokers reap idle/rolling connections; every client request is
    an idempotent read, so a dropped connection retries once on a fresh
    socket instead of failing the task."""

    class DroppyBroker(FakeBroker):
        def _session(self, conn):
            # serve exactly ONE response per connection, then hang up
            try:
                (length,) = struct.unpack(">i", self._recv_exact(conn, 4))
                frame = self._recv_exact(conn, length)
                resp = self._handle(frame)
                conn.sendall(struct.pack(">i", len(resp)) + resp)
            except (ConnectionError, OSError):
                pass
            finally:
                conn.close()

    b = DroppyBroker({("d", 0): [(None, b"x%d" % i) for i in range(7)]})
    try:
        with KafkaWireClient("127.0.0.1", b.port) as c:
            # metadata + 2 offsets + several fetches, each on its own
            # connection after the previous one was dropped
            assert [p.partition for p in c.metadata("d")] == [0]
            assert c.list_offset("d", 0, EARLIEST) == 0
            assert c.list_offset("d", 0, LATEST) == 7
            got = list(c.consume_range("d", 0, 0, 7))
            assert [v for _, _, v in got] == [b"x%d" % i for i in range(7)]
    finally:
        b.close()


def test_streaming_starting_offsets_latest(spark, tmp_path):
    """startingOffsets=latest: a fresh query skips the existing backlog
    and delivers only records produced after it started — bounding the
    (uncapped) first batch on a huge topic."""
    from redshift_avro_spark.sources.kafka_wire import read_kafka_stream

    store = {("lt", 0): [(None, b"old%d" % i) for i in range(5)]}
    b = FakeBroker(store)
    ckpt = str(tmp_path / "ckpt")
    out: list = []

    def run_once():
        df = read_kafka_stream(
            spark, "127.0.0.1", b.port, "lt", starting_offsets="latest"
        )
        q = (
            df.writeStream.foreachBatch(
                lambda bdf, bid: out.extend(
                    (r.offset, bytes(r.value)) for r in bdf.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish"

    try:
        run_once()
        assert out == []  # backlog skipped
        store[("lt", 0)].extend((None, b"new%d" % i) for i in range(2))
        run_once()
        assert sorted(out) == [(5, b"new0"), (6, b"new1")]
    finally:
        b.close()
