"""Minimal Kafka wire-protocol consumer — Metadata/ListOffsets/Fetch.

The reference's architecture is Kafka-centric (README.md:54-58
Stream-Ingest), but the sandbox has neither a broker nor the
spark-sql-kafka jar, which left S8's ingest leg file/socket-based.
This module removes the CLIENT side of that gap the same way the Glue
registry gap was closed (sources/registry.py::GlueHttpClient): speak
the PUBLIC wire protocol directly — no kafka library — against any
broker, and prove the framing against an in-process broker that
implements the same spec (tests/test_kafka_wire.py).

Scope is the minimal bounded-consumer surface, pinned to the oldest
stable versions because they are the simplest and every broker still
speaks them:

- **Metadata v0** (api_key 3): topic → partitions + leaders;
- **ListOffsets v0** (api_key 2): earliest (-2) / latest (-1) offsets;
- **Fetch v0** (api_key 1): MessageSet v0 — [offset INT64, size
  INT32, crc INT32, magic INT8=0, attributes INT8=0, key BYTES,
  value BYTES], CRC32 verified over magic..value, partial trailing
  messages (a Fetch may cut one mid-frame) skipped per spec.

Scale shape (:func:`read_kafka_ranges`): the DRIVER does one
Metadata + two ListOffsets round-trips per partition to plan
``(partition, start, end)`` offset ranges; EXECUTORS each open their
own connection and fetch only their range — the same
partition-per-task topology every real Kafka connector uses, here in
``mapInPandas`` with Arrow-batched output rows of
(partition, offset, key, value).

Unsupported (and loudly so): compressed message sets (attributes
codec bits), record-batch magic v2, SASL/TLS. A production deployment
swaps this client for the Kafka jar; every downstream decode stage is
byte-identical either way.
"""

from __future__ import annotations

import binascii
import socket
import struct
from dataclasses import dataclass
from typing import Iterator, Optional

__all__ = [
    "KafkaWireError",
    "KafkaWireClient",
    "plan_offset_ranges",
    "read_kafka_ranges",
]

EARLIEST = -2
LATEST = -1


class KafkaWireError(RuntimeError):
    """Framing/CRC/broker-error failures — always loud, never garbage."""


# ------------------------------------------------------------ primitives
class _Writer:
    def __init__(self) -> None:
        self.buf = bytearray()

    def i8(self, v: int) -> "_Writer":
        self.buf += struct.pack(">b", v)
        return self

    def i16(self, v: int) -> "_Writer":
        self.buf += struct.pack(">h", v)
        return self

    def i32(self, v: int) -> "_Writer":
        self.buf += struct.pack(">i", v)
        return self

    def i64(self, v: int) -> "_Writer":
        self.buf += struct.pack(">q", v)
        return self

    def string(self, s: Optional[str]) -> "_Writer":
        if s is None:
            return self.i16(-1)
        raw = s.encode("utf-8")
        self.i16(len(raw))
        self.buf += raw
        return self

    def bytes_(self, b: Optional[bytes]) -> "_Writer":
        if b is None:
            return self.i32(-1)
        self.i32(len(b))
        self.buf += b
        return self


class _Reader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise KafkaWireError(
                f"truncated frame: need {n} bytes at {self.pos}, have {len(self.data)}"
            )
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def i8(self) -> int:
        return struct.unpack(">b", self._take(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self._take(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self._take(8))[0]

    def string(self) -> Optional[str]:
        n = self.i16()
        if n == -1:
            return None
        return self._take(n).decode("utf-8")

    def bytes_(self) -> Optional[bytes]:
        n = self.i32()
        if n == -1:
            return None
        return self._take(n)

    def remaining(self) -> int:
        return len(self.data) - self.pos


def encode_message_set(messages: list, base_offset: int = 0) -> bytes:
    """MessageSet v0 for a list of (key, value) byte pairs — used by
    the in-process test broker AND by any test that needs golden
    bytes; offsets are sequential from ``base_offset``."""
    out = bytearray()
    for i, (key, value) in enumerate(messages):
        body = _Writer().i8(0).i8(0).bytes_(key).bytes_(value).buf
        crc = binascii.crc32(bytes(body)) & 0xFFFFFFFF
        msg = struct.pack(">i", crc - (1 << 32) if crc >= (1 << 31) else crc) + bytes(body)
        out += struct.pack(">q", base_offset + i) + struct.pack(">i", len(msg)) + msg
    return bytes(out)


def decode_message_set(data: bytes) -> list:
    """Parse MessageSet v0 → [(offset, key, value)]; verifies each CRC;
    a partial trailing message (Fetch cut it mid-frame) is skipped per
    the spec; any other malformation raises."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 12:
            break  # partial trailing header
        offset, size = struct.unpack(">qi", data[pos:pos + 12])
        if size < 14:
            raise KafkaWireError(f"message size {size} too small at offset {offset}")
        if pos + 12 + size > n:
            break  # partial trailing message
        msg = data[pos + 12:pos + 12 + size]
        (crc,) = struct.unpack(">i", msg[:4])
        body = msg[4:]
        actual = binascii.crc32(body) & 0xFFFFFFFF
        if (crc & 0xFFFFFFFF) != actual:
            raise KafkaWireError(f"CRC mismatch at offset {offset}")
        r = _Reader(body)
        magic = r.i8()
        if magic != 0:
            raise KafkaWireError(f"unsupported message magic {magic} (want 0)")
        attributes = r.i8()
        if attributes & 0x07:
            raise KafkaWireError("compressed message sets are not supported")
        key = r.bytes_()
        value = r.bytes_()
        out.append((offset, key, value))
        pos += 12 + size
    return out


# ------------------------------------------------------------ client
@dataclass
class PartitionMeta:
    partition: int
    leader: int


class KafkaWireClient:
    """One broker connection speaking the v0 request/response frames."""

    def __init__(self, host: str, port: int, client_id: str = "redshift-avro-spark"):
        self.host = host
        self.port = port
        self.client_id = client_id
        self._sock: Optional[socket.socket] = None
        self._corr = 0

    # -- connection ---------------------------------------------------
    def _conn(self) -> socket.socket:
        if self._sock is None:
            self._sock = socket.create_connection((self.host, self.port), timeout=30)
        return self._sock

    def close(self) -> None:
        if self._sock is not None:
            self._sock.close()
            self._sock = None

    def __enter__(self) -> "KafkaWireClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- framing ------------------------------------------------------
    def _roundtrip(self, api_key: int, api_version: int, body: bytes) -> _Reader:
        """One request/response exchange. Metadata, ListOffsets and
        Fetch are all idempotent reads, so a connection dropped by the
        broker (idle reap, rebalance, rolling restart) is retried ONCE
        on a fresh socket before surfacing."""
        try:
            return self._roundtrip_once(api_key, api_version, body)
        except (KafkaWireError, OSError) as first:
            if isinstance(first, KafkaWireError) and "closed mid-frame" not in str(first):
                raise
            self.close()
            try:
                return self._roundtrip_once(api_key, api_version, body)
            except (KafkaWireError, OSError):
                raise first from None

    def _roundtrip_once(self, api_key: int, api_version: int, body: bytes) -> _Reader:
        self._corr += 1
        header = (
            _Writer().i16(api_key).i16(api_version).i32(self._corr).string(self.client_id).buf
        )
        frame = struct.pack(">i", len(header) + len(body)) + bytes(header) + body
        sock = self._conn()
        try:
            sock.sendall(frame)
            raw_len = self._recv_exact(sock, 4)
        except OSError:
            self.close()
            raise
        (resp_len,) = struct.unpack(">i", raw_len)
        if resp_len <= 0 or resp_len > 64 * 1024 * 1024:
            raise KafkaWireError(f"implausible response length {resp_len}")
        resp = _Reader(self._recv_exact(sock, resp_len))
        corr = resp.i32()
        if corr != self._corr:
            raise KafkaWireError(f"correlation id mismatch: sent {self._corr}, got {corr}")
        return resp

    @staticmethod
    def _recv_exact(sock: socket.socket, n: int) -> bytes:
        chunks = bytearray()
        while len(chunks) < n:
            part = sock.recv(n - len(chunks))
            if not part:
                raise KafkaWireError("connection closed mid-frame")
            chunks += part
        return bytes(chunks)

    # -- APIs ---------------------------------------------------------
    def metadata(self, topic: str) -> list:
        """Metadata v0 for one topic → [PartitionMeta] (leader ids)."""
        body = _Writer().i32(1).string(topic).buf
        r = self._roundtrip(3, 0, bytes(body))
        n_brokers = r.i32()
        for _ in range(n_brokers):
            r.i32()  # node_id
            r.string()  # host
            r.i32()  # port
        n_topics = r.i32()
        parts: list = []
        for _ in range(n_topics):
            t_err = r.i16()
            name = r.string()
            n_parts = r.i32()
            for _ in range(n_parts):
                p_err = r.i16()
                pid = r.i32()
                leader = r.i32()
                for _ in range(r.i32()):
                    r.i32()  # replicas
                for _ in range(r.i32()):
                    r.i32()  # isr
                if name == topic:
                    if p_err:
                        raise KafkaWireError(f"partition {pid} error {p_err}")
                    parts.append(PartitionMeta(partition=pid, leader=leader))
            if name == topic and t_err:
                raise KafkaWireError(f"topic {topic!r} error {t_err}")
        if not parts:
            raise KafkaWireError(f"topic {topic!r} has no partitions (unknown topic?)")
        return sorted(parts, key=lambda p: p.partition)

    def list_offset(self, topic: str, partition: int, when: int) -> int:
        """ListOffsets v0: ``when`` is EARLIEST (-2) or LATEST (-1)."""
        body = (
            _Writer().i32(-1).i32(1).string(topic).i32(1).i32(partition).i64(when).i32(1).buf
        )
        r = self._roundtrip(2, 0, bytes(body))
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()  # partition id
                err = r.i16()
                if err:
                    raise KafkaWireError(f"ListOffsets error {err}")
                n_off = r.i32()
                offs = [r.i64() for _ in range(n_off)]
                if not offs:
                    raise KafkaWireError("ListOffsets returned no offsets")
                return offs[0]
        raise KafkaWireError("empty ListOffsets response")

    def fetch(
        self, topic: str, partition: int, offset: int, max_bytes: int = 1 << 20
    ) -> tuple:
        """Fetch v0 → (high_watermark, [(offset, key, value)])."""
        body = (
            _Writer()
            .i32(-1)
            .i32(500)  # max_wait_ms
            .i32(1)  # min_bytes
            .i32(1)
            .string(topic)
            .i32(1)
            .i32(partition)
            .i64(offset)
            .i32(max_bytes)
            .buf
        )
        r = self._roundtrip(1, 0, bytes(body))
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()  # partition id
                err = r.i16()
                hw = r.i64()
                msgset = r.bytes_() or b""
                if err:
                    raise KafkaWireError(f"Fetch error {err}")
                return hw, decode_message_set(msgset)
        raise KafkaWireError("empty Fetch response")

    def consume_range(
        self, topic: str, partition: int, start: int, end: int, max_bytes: int = 1 << 20
    ) -> Iterator[tuple]:
        """Yield (offset, key, value) for offsets in [start, end) —
        repeated Fetches, each resuming after the last full message.

        A message larger than the fetch window comes back truncated and
        is skipped by ``decode_message_set``; on such a no-progress
        fetch the window is doubled (up to 64 MiB, the frame sanity
        bound) instead of aborting, so oversized records are consumable.
        """
        offset = start
        cur_max = max_bytes
        while offset < end:
            _, msgs = self.fetch(topic, partition, offset, max_bytes=cur_max)
            progressed = False
            for o, k, v in msgs:
                if o < offset:
                    continue  # broker may return from an earlier batch boundary
                if o >= end:
                    return
                yield o, k, v
                offset = o + 1
                progressed = True
            if progressed:
                cur_max = max_bytes
            elif cur_max < 64 * 1024 * 1024:
                cur_max *= 2
            else:
                raise KafkaWireError(
                    f"no progress at offset {offset} (partition {partition}) "
                    f"even at max_bytes={cur_max}; "
                    f"broker returned {len(msgs)} messages"
                )


# ------------------------------------------------------------ Spark side
def plan_offset_ranges(host: str, port: int, topic: str) -> list:
    """Driver-side planning: (partition, start, end) per partition —
    three tiny metadata round-trips, no payload bytes move."""
    with KafkaWireClient(host, port) as c:
        out = []
        for pm in c.metadata(topic):
            start = c.list_offset(topic, pm.partition, EARLIEST)
            end = c.list_offset(topic, pm.partition, LATEST)
            out.append((pm.partition, start, end))
        return out


def read_kafka_ranges(spark, host: str, port: int, topic: str):
    """Bounded read of a whole topic as a DataFrame of
    (partition, offset, key, value) — executors fetch their own
    ranges over their own connections (partition-per-task, the real
    connector topology), Arrow-batched out of ``mapInPandas``."""
    import pandas as pd
    from pyspark.sql import types as T

    ranges = plan_offset_ranges(host, port, topic)
    schema = T.StructType(
        [
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
        ]
    )
    plan_df = spark.createDataFrame(ranges, "partition int, start long, end long").repartition(
        max(1, len(ranges))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                with KafkaWireClient(host, port) as c:
                    msgs = list(c.consume_range(topic, row.partition, row.start, row.end))
                yield pd.DataFrame(
                    {
                        "partition": [row.partition] * len(msgs),
                        "offset": [m[0] for m in msgs],
                        "key": [m[1] for m in msgs],
                        "value": [m[2] for m in msgs],
                    }
                )

    return plan_df.mapInPandas(run, schema)


# ------------------------------------------------------------ streaming
def _streaming_classes():
    """Deferred import: pyspark's datasource API lives in the driver
    process; keeping it out of module import lets executors unpickle
    splits without the registry machinery."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )
    from pyspark.sql import types as T

    class KafkaRangeSplit(InputPartition):
        def __init__(self, host, port, topic, partition, start, end):
            self.host = host
            self.port = port
            self.topic = topic
            self.partition = partition
            self.start = start
            self.end = end

    class KafkaWireStreamReader(DataSourceStreamReader):
        """Micro-batch streaming over the wire client: offsets are the
        per-partition next-to-consume positions ``{"0": n0, "1": n1}``
        — exactly what the real Kafka connector checkpoints — so a
        restart resumes precisely after the consumed prefix.
        ``maxRecordsPerBatch`` bounds each partition's advance per
        micro-batch from the SECOND batch of a run onward (per-run
        ReadLimit, like the Avro landing-zone source). The first batch
        of each run is uncapped by construction: the Python datasource
        API gives ``latestOffset()`` no view of the checkpointed start,
        so any first-call cap could regress below it after a restart."""

        def __init__(self, options: dict) -> None:
            self.host = options.get("host", "127.0.0.1")
            self.port = int(options["port"])
            self.topic = options["topic"]
            self.max_records = int(options.get("maxrecordsperbatch", 0)) or None
            start = options.get("startingoffsets", "earliest").lower()
            if start not in ("earliest", "latest"):
                raise ValueError(
                    f"startingOffsets must be earliest|latest, got {start!r}"
                )
            self.start_latest = start == "latest"
            self._planned: dict = {}
            self._committed: dict = {}

        def initialOffset(self) -> dict:
            # `latest` bounds a fresh query's FIRST batch (which is
            # otherwise uncapped — see latestOffset) to new data only,
            # like the real connector's startingOffsets option
            when = LATEST if self.start_latest else EARLIEST
            with KafkaWireClient(self.host, self.port) as c:
                return {
                    str(p.partition): c.list_offset(self.topic, p.partition, when)
                    for p in c.metadata(self.topic)
                }

        def latestOffset(self) -> dict:
            with KafkaWireClient(self.host, self.port) as c:
                parts = c.metadata(self.topic)
                latest = {
                    str(p.partition): c.list_offset(self.topic, p.partition, LATEST)
                    for p in parts
                }
                if self.max_records is not None:
                    if not self._planned and not self._committed:
                        # First planning call of this run. The consumed
                        # prefix lives only in Spark's offset log, which
                        # the Python datasource API never hands back
                        # before latestOffset (unlike Scala's
                        # SupportsAdmissionControl.latestOffset(start,
                        # limit)), so a cap computed from EARLIEST could
                        # land BELOW the checkpointed start and regress
                        # the recorded end (re-delivering committed
                        # offsets, or stalling availableNow). Skip the
                        # cap exactly once: true LATEST is always >= the
                        # consumed prefix, so the first batch is correct
                        # (merely uncapped); every later call floors at
                        # this planned point.
                        self._planned = dict(latest)
                        return latest
                    # per-run ReadLimit: advance each partition at most
                    # max_records past the furthest planned/committed
                    # point, floored at EARLIEST so a compacted topic
                    # can never plan an end below its start
                    for p in parts:
                        k = str(p.partition)
                        earliest = c.list_offset(self.topic, p.partition, EARLIEST)
                        floor = max(
                            self._planned.get(k, 0), self._committed.get(k, 0), earliest
                        )
                        latest[k] = min(latest[k], floor + self.max_records)
                    self._planned = dict(latest)
            return latest

        def partitions(self, start: dict, end: dict) -> list:
            # the offset-log start is the authoritative consumed prefix:
            # fold it into the cap floor so later capped plans can never
            # fall below what Spark has already recorded
            for k, s in start.items():
                if s > self._committed.get(k, 0):
                    self._committed[k] = s
            return [
                KafkaRangeSplit(self.host, self.port, self.topic, int(k), start.get(k, 0), e)
                for k, e in end.items()
                if e > start.get(k, 0)
            ] or [KafkaRangeSplit(self.host, self.port, self.topic, -1, 0, 0)]

        def read(self, split) -> Iterator[tuple]:
            if split.partition < 0:
                return iter(())
            with KafkaWireClient(split.host, split.port) as c:
                return iter(
                    [
                        (split.partition, o, k, v)
                        for o, k, v in c.consume_range(
                            split.topic, split.partition, split.start, split.end
                        )
                    ]
                )

        def commit(self, end: dict) -> None:
            self._committed = dict(end)

        def stop(self) -> None:
            pass

    class KafkaWireDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "kafka_wire"

        def schema(self) -> str:
            return "partition int, offset long, key binary, value binary"

        def streamReader(self, schema):  # noqa: ARG002
            return KafkaWireStreamReader(self.options)

    return KafkaWireDataSource


def register_kafka_wire_datasource(spark) -> None:
    spark.dataSource.register(_streaming_classes())


def read_kafka_stream(
    spark,
    host: str,
    port: int,
    topic: str,
    max_records_per_batch=None,
    starting_offsets: str = "earliest",
):
    """Checkpointed micro-batch stream of (partition, offset, key,
    value) over the wire client — the connector-complete form of
    :func:`read_kafka_ranges`. ``starting_offsets="latest"`` makes a
    fresh query begin at the topic tip (new data only), bounding the
    otherwise-uncapped first batch."""
    register_kafka_wire_datasource(spark)
    reader = (
        spark.readStream.format("kafka_wire")
        .option("host", host)
        .option("port", str(port))
        .option("topic", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_records_per_batch is not None:
        reader = reader.option("maxRecordsPerBatch", str(max_records_per_batch))
    return reader.load()
