"""Kinesis-shape wire source — GetRecords paging over the PUBLIC
Kinesis Data Streams JSON API shape.

The reference's streaming arm names Kinesis next to Kafka (reference
README.md:12, Stream-Ingest diagram) but only ever touches the
*payload* layer (KPL aggregate / Spring-header unwrapping, covered by
:mod:`.envelopes` and q24); the transport client itself lives outside
its tree. This module completes that arm the way
:mod:`.kafka_wire` completed Kafka: a from-scratch client speaking the
service's public wire protocol — here the documented HTTP/JSON shape
(``POST`` with ``Content-Type: application/x-amz-json-1.1`` and
``X-Amz-Target: Kinesis_20131202.<Action>``; ``ListShards``,
``GetShardIterator``, ``GetRecords`` with base64 ``Data``; error
bodies carrying ``__type``) — proven end to end against an in-process
fake server in tests/test_kinesis_wire.py, chained into the SAME
KPL → Spring → Avro decode pipeline as every other source.

Offset model: Kinesis sequence numbers are OPAQUE per-shard strings;
checkpoints store the last processed sequence per shard and resume
with ``AFTER_SEQUENCE_NUMBER`` iterators — exactly the KCL checkpoint
contract. The public API has NO current-tip query (``DescribeStream``
carries an ``EndingSequenceNumber`` only for closed shards), so a
micro-batch cannot plan ``(start, end]`` ranges without reading; the
streaming source therefore implements Spark's
``SimpleDataSourceStreamReader`` contract — the documented pattern
for sources whose protocol discovers the end offset *by reading* —
where ``read(start)`` drains each shard (rate-capped) on the driver
and returns records together with the end offset, and
``readBetweenOffsets`` replays a committed range deterministically
after restart.

100 TB story: the BOUNDED reader is shard-per-task — the shard is
Kinesis's own parallelism unit, so 1000 shards fan out to 1000
executor tasks over their own HTTP connections, and the driver only
ever sees shard ids. The streaming path is rate-capped
(``maxRecordsPerBatch``) and sized for the reference's per-stream
rates; past that, Kinesis enhanced fan-out (SubscribeToShard push) or
the Kafka wire source are the scale arms — a limitation of the
service API's pull model, not of this client.
"""

from __future__ import annotations

import base64
import json
import urllib.error
import urllib.request
from typing import Iterator, Optional

__all__ = [
    "KinesisWireError",
    "KinesisHttpClient",
    "read_kinesis_shards",
    "read_kinesis_stream",
    "register_kinesis_wire_datasource",
]

_TARGET_PREFIX = "Kinesis_20131202."
_MAX_EMPTY_PAGES = 1000


class KinesisWireError(RuntimeError):
    """Transport or service error; ``error_type`` carries the service's
    ``__type`` (e.g. ``ResourceNotFoundException``) when present."""

    def __init__(self, message: str, error_type: Optional[str] = None) -> None:
        super().__init__(message)
        self.error_type = error_type


class KinesisHttpClient:
    """Minimal Kinesis Data Streams client over the public JSON shape."""

    def __init__(self, endpoint: str, timeout: float = 30.0) -> None:
        self.endpoint = endpoint.rstrip("/")
        self.timeout = timeout

    def _call(self, action: str, payload: dict) -> dict:
        """One API call. Every action this client issues (ListShards,
        GetShardIterator, GetRecords) is an idempotent read, so a
        transport-level failure (reset, timeout — the service's load
        balancers recycle connections) retries once before surfacing."""
        req = urllib.request.Request(
            self.endpoint + "/",
            data=json.dumps(payload).encode("utf-8"),
            headers={
                "Content-Type": "application/x-amz-json-1.1",
                "X-Amz-Target": _TARGET_PREFIX + action,
            },
            method="POST",
        )
        try:
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except (urllib.error.URLError, TimeoutError, ConnectionError) as first:
                if isinstance(first, urllib.error.HTTPError):
                    raise  # service error, not transport — no retry
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            body = e.read().decode("utf-8", "replace")
            try:
                err = json.loads(body)
                raise KinesisWireError(
                    f"{action}: {err.get('message', body)}",
                    error_type=err.get("__type"),
                ) from None
            except ValueError:
                raise KinesisWireError(f"{action}: HTTP {e.code}: {body}") from None
        except urllib.error.URLError as e:
            raise KinesisWireError(f"{action}: {e.reason}") from None

    # -- API ----------------------------------------------------------
    def list_shards(self, stream: str) -> list:
        r = self._call("ListShards", {"StreamName": stream})
        shards = sorted(s["ShardId"] for s in r.get("Shards", []))
        if not shards:
            raise KinesisWireError(f"stream {stream!r} has no shards")
        return shards

    def get_shard_iterator(
        self,
        stream: str,
        shard_id: str,
        iterator_type: str = "TRIM_HORIZON",
        starting_sequence_number: Optional[str] = None,
    ) -> str:
        payload = {
            "StreamName": stream,
            "ShardId": shard_id,
            "ShardIteratorType": iterator_type,
        }
        if starting_sequence_number is not None:
            payload["StartingSequenceNumber"] = starting_sequence_number
        return self._call("GetShardIterator", payload)["ShardIterator"]

    def get_records(self, shard_iterator: str, limit: Optional[int] = None) -> tuple:
        """→ ([(sequence_number, partition_key, data bytes)], next_iterator
        or None, millis_behind_latest)."""
        payload: dict = {"ShardIterator": shard_iterator}
        if limit is not None:
            payload["Limit"] = int(limit)
        r = self._call("GetRecords", payload)
        recs = [
            (
                rec["SequenceNumber"],
                rec.get("PartitionKey", ""),
                base64.b64decode(rec["Data"]),
            )
            for rec in r.get("Records", [])
        ]
        return recs, r.get("NextShardIterator"), int(r.get("MillisBehindLatest", 0))

    def consume_shard(
        self,
        stream: str,
        shard_id: str,
        after: Optional[str] = None,
        max_records: Optional[int] = None,
    ) -> Iterator[tuple]:
        """Yield (sequence_number, partition_key, data) from one shard —
        TRIM_HORIZON when ``after`` is None, else strictly after that
        sequence — until caught up (MillisBehindLatest == 0 with an
        empty page; a closed shard ends via a null NextShardIterator),
        or until ``max_records``."""
        if after is None:
            it = self.get_shard_iterator(stream, shard_id)
        else:
            it = self.get_shard_iterator(
                stream, shard_id, "AFTER_SEQUENCE_NUMBER", after
            )
        got = 0
        empty_pages = 0
        while it:
            recs, it, behind = self.get_records(it)
            for seq, pk, data in recs:
                yield seq, pk, data
                got += 1
                if max_records is not None and got >= max_records:
                    return
            if recs:
                empty_pages = 0
            else:
                if behind == 0:
                    return
                empty_pages += 1
                if empty_pages > _MAX_EMPTY_PAGES:
                    raise KinesisWireError(
                        f"shard {shard_id}: {empty_pages} empty pages while "
                        f"{behind} ms behind — no progress"
                    )


# ------------------------------------------------------------ Spark side
def read_kinesis_shards(spark, endpoint: str, stream: str):
    """Bounded snapshot of a whole stream as a DataFrame of
    (shard_id, sequence_number, partition_key, data) — shard-per-task:
    the driver lists shard ids only; each executor task drains its own
    shard over its own connection until caught up (the real
    connector topology, mirroring :func:`..kafka_wire.read_kafka_ranges`)."""
    import pandas as pd
    from pyspark.sql import types as T

    shards = KinesisHttpClient(endpoint).list_shards(stream)
    schema = T.StructType(
        [
            T.StructField("shard_id", T.StringType()),
            T.StructField("sequence_number", T.StringType()),
            T.StructField("partition_key", T.StringType()),
            T.StructField("data", T.BinaryType()),
        ]
    )
    plan_df = spark.createDataFrame(
        [(stream, s) for s in shards], "stream string, shard_id string"
    ).repartition(max(1, len(shards)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                recs = list(
                    KinesisHttpClient(endpoint).consume_shard(row.stream, row.shard_id)
                )
                yield pd.DataFrame(
                    {
                        "shard_id": [row.shard_id] * len(recs),
                        "sequence_number": [r[0] for r in recs],
                        "partition_key": [r[1] for r in recs],
                        "data": [r[2] for r in recs],
                    }
                )

    return plan_df.mapInPandas(run, schema)


# ------------------------------------------------------------ streaming
def _streaming_classes():
    """Deferred import (driver-side datasource registry), the
    :mod:`.kafka_wire` pattern."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class KinesisSimpleStreamReader(SimpleDataSourceStreamReader):
        """Checkpointed micro-batches over the wire client. Offsets are
        ``{shard_id: last_processed_sequence}`` ("" = nothing yet, i.e.
        TRIM_HORIZON) — the KCL checkpoint shape. ``read`` drains each
        shard from its floor (capped at ``maxRecordsPerBatch`` per
        shard per batch) and plans the end offset from what it read;
        ``readBetweenOffsets`` replays exactly a committed range after
        restart. Shards existing at query start are tracked; resharding
        mid-query is out of scope (as in the bounded reader)."""

        def __init__(self, options: dict) -> None:
            self.endpoint = options["endpoint"]
            self.stream = options["stream"]
            self.max_records = int(options.get("maxrecordsperbatch", 0)) or None

        def _client(self) -> KinesisHttpClient:
            return KinesisHttpClient(self.endpoint)

        def initialOffset(self) -> dict:
            return {s: "" for s in self._client().list_shards(self.stream)}

        def read(self, start: dict) -> tuple:
            c = self._client()
            rows = []
            end = dict(start)
            for shard, seq in sorted(start.items()):
                for s, pk, data in c.consume_shard(
                    self.stream, shard, after=seq or None, max_records=self.max_records
                ):
                    rows.append((shard, s, pk, data))
                    end[shard] = s
            return iter(rows), end

        def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
            c = self._client()
            rows = []
            for shard, seq in sorted(start.items()):
                stop = end.get(shard, seq)
                if stop == seq:
                    continue
                found = False
                for s, pk, data in c.consume_shard(
                    self.stream, shard, after=seq or None
                ):
                    rows.append((shard, s, pk, data))
                    if s == stop:
                        found = True
                        break
                if not found:
                    raise KinesisWireError(
                        f"shard {shard}: committed end sequence {stop!r} not "
                        f"reachable on replay (stream trimmed?)"
                    )
            return iter(rows)

        def commit(self, end: dict) -> None:
            pass

    class KinesisWireDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "kinesis_wire"

        def schema(self) -> str:
            return (
                "shard_id string, sequence_number string, "
                "partition_key string, data binary"
            )

        def simpleStreamReader(self, schema):  # noqa: ARG002
            return KinesisSimpleStreamReader(self.options)

    return KinesisWireDataSource


def register_kinesis_wire_datasource(spark) -> None:
    spark.dataSource.register(_streaming_classes())


def read_kinesis_stream(
    spark, endpoint: str, stream: str, max_records_per_batch=None
):
    """Checkpointed micro-batch stream of (shard_id, sequence_number,
    partition_key, data) — the connector-complete form of
    :func:`read_kinesis_shards`."""
    register_kinesis_wire_datasource(spark)
    reader = (
        spark.readStream.format("kinesis_wire")
        .option("endpoint", endpoint)
        .option("stream", stream)
    )
    if max_records_per_batch is not None:
        reader = reader.option("maxRecordsPerBatch", str(max_records_per_batch))
    return reader.load()
