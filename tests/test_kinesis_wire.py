"""Kinesis wire client vs an in-process fake service.

The fake speaks the PUBLIC Kinesis Data Streams JSON shape (X-Amz-Target
``Kinesis_20131202.<Action>`` over application/x-amz-json-1.1, base64
``Data``, ``__type`` error bodies) — the Spring/Glue in-process-server
pattern applied to Kinesis, mirroring tests/test_kafka_wire.py — so the
client's paging, iterator arithmetic, and executor-side shard
consumption are exercised end to end over real HTTP, and the payloads
flow into the SAME KPL → Spring → Avro chain as every other source.
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from redshift_avro_spark.sources.kinesis_wire import (
    KinesisHttpClient,
    KinesisWireError,
    read_kinesis_shards,
)

PAGE = 2  # records per GetRecords page — forces pagination


class FakeKinesis:
    """{(stream, shard_id): [(partition_key, data bytes), ...]}; sequence
    numbers are zero-padded per-shard indexes (opaque to the client).

    Round 6: models RESHARDING with real hash-range semantics —
    SplitShard / MergeShards close the parent shard(s) and create
    children carrying ParentShardId / AdjacentParentShardId;
    ListShards returns closed shards with an EndingSequenceNumber;
    GetRecords on a drained CLOSED shard returns a null
    NextShardIterator (SHARD_END); PutRecord routes by the md5 hash of
    the partition key into the open shard covering that hash range."""

    HASH_SPACE = 1 << 128

    def __init__(self, topics):
        self.topics = topics
        # error injection: expire the next N GetRecords iterators /
        # throttle the next N GetRecords calls
        self.expire_next = 0
        self.throttle_next = 0
        # per-shard metadata; initial shards split the hash space
        # evenly, in sorted order per stream
        self.meta = {}
        streams = {}
        for (t, s) in topics:
            streams.setdefault(t, []).append(s)
        for t, shards in streams.items():
            shards.sort()
            width = self.HASH_SPACE // len(shards)
            for i, s in enumerate(shards):
                hi = self.HASH_SPACE - 1 if i == len(shards) - 1 else (i + 1) * width - 1
                self.meta[(t, s)] = {
                    "closed": False,
                    "parent": None,
                    "adj": None,
                    "range": (i * width, hi),
                }
        self._next_id = {t: len(s) for t, s in streams.items()}
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: A003
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                action = (self.headers.get("X-Amz-Target") or "").rsplit(".", 1)[-1]
                try:
                    out = outer._dispatch(action, body)
                    code = 200
                except _ServiceError as e:
                    out = {"__type": e.error_type, "message": str(e)}
                    code = 400
                data = json.dumps(out).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/x-amz-json-1.1")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.server.server_address[1]
        self.endpoint = f"http://127.0.0.1:{self.port}"
        threading.Thread(target=self.server.serve_forever, daemon=True).start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()

    @staticmethod
    def _seq(i: int) -> str:
        return "%020d" % i

    # ---- reshard control (also reachable via the API actions) -------
    def _new_shard(self, stream, lo, hi, parent=None, adj=None):
        sid = "shardId-%012d" % self._next_id[stream]
        self._next_id[stream] += 1
        self.topics[(stream, sid)] = []
        self.meta[(stream, sid)] = {
            "closed": False,
            "parent": parent,
            "adj": adj,
            "range": (lo, hi),
        }
        return sid

    def split(self, stream, shard_id, new_starting_hash_key=None):
        return self._dispatch(
            "SplitShard",
            {
                "StreamName": stream,
                "ShardToSplit": shard_id,
                **(
                    {"NewStartingHashKey": str(new_starting_hash_key)}
                    if new_starting_hash_key is not None
                    else {}
                ),
            },
        )

    def merge(self, stream, a, b):
        return self._dispatch(
            "MergeShards",
            {"StreamName": stream, "ShardToMerge": a, "AdjacentShardToMerge": b},
        )

    def put(self, stream, pk, data):
        return self._dispatch(
            "PutRecord",
            {
                "StreamName": stream,
                "PartitionKey": pk,
                "Data": base64.b64encode(data).decode(),
            },
        )

    def _dispatch(self, action, body):
        if action == "ListShards":
            stream = body.get("StreamName")
            shards = sorted(s for (t, s) in self.topics if t == stream)
            if not shards:
                raise _ServiceError(
                    "ResourceNotFoundException", f"Stream {stream} not found"
                )
            out = []
            for s in shards:
                m = self.meta[(stream, s)]
                d = {
                    "ShardId": s,
                    "HashKeyRange": {
                        "StartingHashKey": str(m["range"][0]),
                        "EndingHashKey": str(m["range"][1]),
                    },
                    "SequenceNumberRange": {"StartingSequenceNumber": self._seq(0)},
                }
                if m["parent"]:
                    d["ParentShardId"] = m["parent"]
                if m["adj"]:
                    d["AdjacentParentShardId"] = m["adj"]
                if m["closed"]:
                    d["SequenceNumberRange"]["EndingSequenceNumber"] = self._seq(
                        max(len(self.topics[(stream, s)]) - 1, 0)
                    )
                out.append(d)
            return {"Shards": out}
        if action == "SplitShard":
            stream, shard = body["StreamName"], body["ShardToSplit"]
            m = self.meta.get((stream, shard))
            if m is None:
                raise _ServiceError(
                    "ResourceNotFoundException", f"Shard {shard} not found"
                )
            if m["closed"]:
                raise _ServiceError(
                    "InvalidArgumentException", f"Shard {shard} is closed"
                )
            lo, hi = m["range"]
            k = int(body.get("NewStartingHashKey", (lo + hi) // 2 + 1))
            if not (lo < k <= hi):
                raise _ServiceError(
                    "InvalidArgumentException", f"hash key {k} outside ({lo}, {hi}]"
                )
            m["closed"] = True
            self._new_shard(stream, lo, k - 1, parent=shard)
            self._new_shard(stream, k, hi, parent=shard)
            return {}
        if action == "MergeShards":
            stream = body["StreamName"]
            a, b = body["ShardToMerge"], body["AdjacentShardToMerge"]
            ma, mb = self.meta.get((stream, a)), self.meta.get((stream, b))
            if ma is None or mb is None:
                raise _ServiceError("ResourceNotFoundException", "shard not found")
            if ma["closed"] or mb["closed"]:
                raise _ServiceError("InvalidArgumentException", "shard is closed")
            ra, rb = ma["range"], mb["range"]
            if ra[1] + 1 != rb[0] and rb[1] + 1 != ra[0]:
                raise _ServiceError(
                    "InvalidArgumentException", "shards are not adjacent"
                )
            ma["closed"] = mb["closed"] = True
            self._new_shard(
                stream, min(ra[0], rb[0]), max(ra[1], rb[1]), parent=a, adj=b
            )
            return {}
        if action == "PutRecord":
            import hashlib

            stream, pk = body["StreamName"], body["PartitionKey"]
            h = int(hashlib.md5(pk.encode("utf-8")).hexdigest(), 16)
            for (t, s), m in sorted(self.meta.items()):
                if t == stream and not m["closed"] and m["range"][0] <= h <= m["range"][1]:
                    self.topics[(t, s)].append((pk, base64.b64decode(body["Data"])))
                    return {
                        "ShardId": s,
                        "SequenceNumber": self._seq(len(self.topics[(t, s)]) - 1),
                    }
            raise _ServiceError("ResourceNotFoundException", f"Stream {stream}")
        if action == "GetShardIterator":
            stream, shard = body["StreamName"], body["ShardId"]
            if (stream, shard) not in self.topics:
                raise _ServiceError(
                    "ResourceNotFoundException", f"Shard {shard} not found"
                )
            t = body["ShardIteratorType"]
            if t == "TRIM_HORIZON":
                idx = 0
            elif t == "AFTER_SEQUENCE_NUMBER":
                idx = int(body["StartingSequenceNumber"]) + 1
            elif t == "AT_SEQUENCE_NUMBER":
                idx = int(body["StartingSequenceNumber"])
            elif t == "LATEST":
                idx = len(self.topics[(stream, shard)])
            else:
                raise _ServiceError("InvalidArgumentException", f"type {t}")
            tok = base64.b64encode(
                json.dumps({"s": stream, "h": shard, "i": idx}).encode()
            ).decode()
            return {"ShardIterator": tok}
        if action == "GetRecords":
            if self.throttle_next > 0:
                self.throttle_next -= 1
                raise _ServiceError(
                    "ProvisionedThroughputExceededException", "slow down"
                )
            if self.expire_next > 0:
                self.expire_next -= 1
                raise _ServiceError(
                    "ExpiredIteratorException", "Iterator expired"
                )
            tok = json.loads(base64.b64decode(body["ShardIterator"]))
            stream, shard, idx = tok["s"], tok["h"], tok["i"]
            msgs = self.topics[(stream, shard)]
            limit = min(int(body.get("Limit", PAGE)), PAGE)
            window = msgs[idx:idx + limit]
            new_idx = idx + len(window)
            out = {
                "Records": [
                    {
                        "SequenceNumber": self._seq(idx + k),
                        "PartitionKey": pk,
                        "Data": base64.b64encode(data).decode(),
                    }
                    for k, (pk, data) in enumerate(window)
                ],
                "MillisBehindLatest": (len(msgs) - new_idx) * 1000,
            }
            # a drained CLOSED shard ends: null NextShardIterator is
            # the service's SHARD_END signal
            if not (self.meta[(stream, shard)]["closed"] and new_idx >= len(msgs)):
                out["NextShardIterator"] = base64.b64encode(
                    json.dumps({"s": stream, "h": shard, "i": new_idx}).encode()
                ).decode()
            return out
        raise _ServiceError("UnknownOperationException", action)


class _ServiceError(Exception):
    def __init__(self, error_type, message):
        super().__init__(message)
        self.error_type = error_type


@pytest.fixture()
def fake():
    f = FakeKinesis(
        {
            ("ticks", "shardId-000000000000"): [
                ("pk%d" % i, b"v%d" % i) for i in range(7)
            ],
            ("ticks", "shardId-000000000001"): [
                ("qk%d" % i, b"w%d" % i) for i in range(3)
            ],
        }
    )
    yield f
    f.close()


def test_list_shards_and_paged_consume(fake):
    c = KinesisHttpClient(fake.endpoint)
    assert c.list_shards("ticks") == ["shardId-000000000000", "shardId-000000000001"]
    got = list(c.consume_shard("ticks", "shardId-000000000000"))
    assert [d for _, _, d in got] == [b"v%d" % i for i in range(7)]
    assert got[0][0] == "%020d" % 0 and got[-1][0] == "%020d" % 6
    assert got[3][1] == "pk3"


def test_consume_after_sequence(fake):
    c = KinesisHttpClient(fake.endpoint)
    got = list(c.consume_shard("ticks", "shardId-000000000000", after="%020d" % 4))
    assert [d for _, _, d in got] == [b"v5", b"v6"]
    assert list(c.consume_shard("ticks", "shardId-000000000000", after="%020d" % 6)) == []


def test_error_shapes(fake):
    c = KinesisHttpClient(fake.endpoint)
    with pytest.raises(KinesisWireError) as ei:
        c.list_shards("nope")
    assert ei.value.error_type == "ResourceNotFoundException"
    with pytest.raises(KinesisWireError) as ei:
        c.get_shard_iterator("ticks", "shardId-999999999999")
    assert ei.value.error_type == "ResourceNotFoundException"


def test_bounded_spark_read(spark, fake):
    df = read_kinesis_shards(spark, fake.endpoint, "ticks")
    rows = df.collect()
    assert len(rows) == 10
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append((r.sequence_number, bytes(r.data)))
    assert sorted(by_shard["shardId-000000000000"]) == [
        ("%020d" % i, b"v%d" % i) for i in range(7)
    ]
    assert sorted(by_shard["shardId-000000000001"]) == [
        ("%020d" % i, b"w%d" % i) for i in range(3)
    ]


def test_e2e_kinesis_kpl_spring_avro_agg(spark):
    """The reference's full Kinesis arm (README.md:12): stream records
    are KPL aggregates of Spring-embedded-header Avro payloads; the
    wire source feeds the SAME unwrap chain as q24, ending in an
    aggregation."""
    from pyspark.sql import functions as F

    from redshift_avro_spark.avroio.binary import encode_datum
    from redshift_avro_spark.avroio.schema_model import parse_schema
    from redshift_avro_spark.sources.envelopes import (
        KplAggregate,
        KplRecord,
        build_spring_message,
        encode_kpl_aggregate,
        unwrap_kpl_spring_avro,
    )

    schema = parse_schema(
        {"type": "record", "name": "M",
         "fields": [{"name": "grp", "type": "string"}, {"name": "v", "type": "long"}]}
    )
    schema_json = json.dumps(schema.to_json())

    def kpl_blob(rows):
        agg = KplAggregate(partition_key_table=["pk"])
        for r in rows:
            body = encode_datum(schema, r)
            msg = build_spring_message({"contentType": "application/avro"}, body)
            agg.records.append(KplRecord(partition_key_index=0, data=msg))
        return encode_kpl_aggregate(agg)

    blobs0 = [
        kpl_blob([{"grp": "a", "v": 1}, {"grp": "b", "v": 2}]),
        kpl_blob([{"grp": "a", "v": 3}]),
    ]
    blobs1 = [kpl_blob([{"grp": "b", "v": 10}, {"grp": "b", "v": 20}])]
    f = FakeKinesis(
        {
            ("ev", "shardId-000000000000"): [("p", b) for b in blobs0],
            ("ev", "shardId-000000000001"): [("p", b) for b in blobs1],
        }
    )
    try:
        df = read_kinesis_shards(spark, f.endpoint, "ev")
        recs = unwrap_kpl_spring_avro(df, "data", schema_json)
        got = {
            r.grp: (r.n, r.s)
            for r in recs.groupBy("grp")
            .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
            .collect()
        }
        assert got == {"a": (2, 4), "b": (3, 32)}
    finally:
        f.close()


def test_streaming_resumes_from_checkpoint(spark, tmp_path):
    """Checkpointed micro-batches: a restart consumes exactly the newly
    produced suffix (sequence offsets, AFTER_SEQUENCE_NUMBER resume)."""
    from redshift_avro_spark.sources.kinesis_wire import read_kinesis_stream

    store = {("s", "shardId-000000000000"): [("p%d" % i, b"a%d" % i) for i in range(5)]}
    f = FakeKinesis(store)
    ckpt = str(tmp_path / "ckpt")
    out: list = []

    def run_once():
        df = read_kinesis_stream(spark, f.endpoint, "s")
        q = (
            df.writeStream.foreachBatch(
                lambda bdf, bid: out.extend(
                    (r.shard_id, r.sequence_number, bytes(r.data))
                    for r in bdf.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish"

    try:
        run_once()
        assert sorted(out) == [
            ("shardId-000000000000", "%020d" % i, b"a%d" % i) for i in range(5)
        ]
        store[("s", "shardId-000000000000")].extend(
            ("p", b"b%d" % i) for i in range(3)
        )
        before = len(out)
        run_once()
        assert sorted(out[before:]) == [
            ("shardId-000000000000", "%020d" % (5 + i), b"b%d" % i) for i in range(3)
        ]
        assert len(out) == len(set(out)), "duplicate redelivery"
    finally:
        f.close()


class TestResharding:
    """Round-6: shard split/merge with SHARD_END → child takeover."""

    def _run_stream(self, spark, endpoint, stream, ckpt, out):
        from redshift_avro_spark.sources.kinesis_wire import read_kinesis_stream

        df = read_kinesis_stream(spark, endpoint, stream)
        q = (
            df.writeStream.foreachBatch(
                lambda bdf, bid: out.extend(
                    (r.shard_id, r.sequence_number, bytes(r.data))
                    for r in bdf.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish"

    def test_split_shard_end_and_child_takeover(self, spark, tmp_path):
        """Split mid-query: the parent drains to SHARD_END, children
        start only after the commit, no record is lost or duplicated
        across a restart, and every parent record is delivered before
        any child record."""
        store = {
            ("rs", "shardId-000000000000"): [
                ("p%d" % i, b"a%d" % i) for i in range(5)
            ]
        }
        f = FakeKinesis(store)
        ckpt = str(tmp_path / "ckpt")
        out: list = []
        try:
            self._run_stream(spark, f.endpoint, "rs", ckpt, out)
            assert len(out) == 5
            # reshard: split the only shard, then produce into children
            f.split("rs", "shardId-000000000000")
            children = sorted(
                s
                for (t, s), m in f.meta.items()
                if t == "rs" and m["parent"] == "shardId-000000000000"
            )
            assert len(children) == 2
            payloads = [b"c%d" % i for i in range(6)]
            routed = {f.put("rs", "k%d" % i, p)["ShardId"] for i, p in enumerate(payloads)}
            assert routed <= set(children) and len(routed) == 2, (
                "puts should spread over both children"
            )
            # run until drained: first run commits the parent's
            # SHARD_END (children gate on the COMMITTED state, so they
            # start a later batch/run), subsequent runs drain children
            for _ in range(3):
                self._run_stream(spark, f.endpoint, "rs", ckpt, out)
                if len(out) == 11:
                    break
            datas = [d for (_, _, d) in out]
            assert sorted(datas) == sorted(
                [b"a%d" % i for i in range(5)] + payloads
            )
            assert len(out) == len(set(out)), "duplicate redelivery"
            # parent-before-child ordering
            last_parent = max(
                i for i, (s, _, _) in enumerate(out) if s == "shardId-000000000000"
            )
            first_child = min(
                (i for i, (s, _, _) in enumerate(out) if s in children),
                default=len(out),
            )
            assert last_parent < first_child
            # more records to the children after a restart: still exactly-once
            f.put("rs", "late", b"z9")
            before = len(out)
            self._run_stream(spark, f.endpoint, "rs", ckpt, out)
            assert [d for (_, _, d) in out[before:]] == [b"z9"]
        finally:
            f.close()

    def test_merge_gates_on_both_parents(self, spark, tmp_path):
        """Merge: the child starts only after BOTH parents reach a
        committed SHARD_END."""
        store = {
            ("ms", "shardId-000000000000"): [("p", b"l%d" % i) for i in range(3)],
            ("ms", "shardId-000000000001"): [("q", b"r%d" % i) for i in range(2)],
        }
        f = FakeKinesis(store)
        ckpt = str(tmp_path / "ckpt")
        out: list = []
        try:
            self._run_stream(spark, f.endpoint, "ms", ckpt, out)
            assert len(out) == 5
            f.merge("ms", "shardId-000000000000", "shardId-000000000001")
            child = sorted(
                s for (t, s), m in f.meta.items() if t == "ms" and m["parent"]
            )[0]
            f.put("ms", "anykey", b"merged0")
            f.put("ms", "other", b"merged1")
            for _ in range(3):
                self._run_stream(spark, f.endpoint, "ms", ckpt, out)
                if len(out) == 7:
                    break
            assert sorted(d for (_, _, d) in out[5:]) == [b"merged0", b"merged1"]
            assert {s for (s, _, _) in out[5:]} == {child}
            assert len(out) == len(set(out))
        finally:
            f.close()

    def test_bounded_read_covers_parents_and_children(self, spark):
        """read_kinesis_shards over a resharded stream: parent +
        children drained exactly once (closed shards end at the null
        NextShardIterator)."""
        store = {
            ("bs", "shardId-000000000000"): [("p%d" % i, b"o%d" % i) for i in range(4)]
        }
        f = FakeKinesis(store)
        try:
            f.split("bs", "shardId-000000000000")
            for i in range(5):
                f.put("bs", "pk%d" % i, b"n%d" % i)
            rows = read_kinesis_shards(spark, f.endpoint, "bs").collect()
            datas = sorted(bytes(r.data) for r in rows)
            assert datas == sorted(
                [b"o%d" % i for i in range(4)] + [b"n%d" % i for i in range(5)]
            )
            assert len(rows) == 9
        finally:
            f.close()

    def test_drain_shard_reports_shard_end(self):
        f = FakeKinesis({("ds", "shardId-000000000000"): [("p", b"x")]})
        try:
            c = KinesisHttpClient(f.endpoint)
            recs, ended = c.drain_shard("ds", "shardId-000000000000")
            assert [d for _, _, d in recs] == [b"x"] and ended is False
            last_seq = recs[-1][0]
            f.split("ds", "shardId-000000000000")
            # resuming after the last consumed sequence on the closed
            # shard: nothing left, SHARD_END reported
            recs, ended = c.drain_shard("ds", "shardId-000000000000", after=last_seq)
            assert recs == [] and ended is True
            # a fresh drain of the now-closed shard sees records + end
            recs, ended = c.drain_shard("ds", "shardId-000000000000", after=None)
            assert [d for _, _, d in recs] == [b"x"] and ended is True
            detail = c.list_shards_detail("ds")
            closed = [d for d in detail if d["closed"]]
            assert closed and closed[0]["shard_id"] == "shardId-000000000000"
            kids = [d for d in detail if d["parents"] == ["shardId-000000000000"]]
            assert len(kids) == 2
        finally:
            f.close()


class TestServiceErrors:
    """Round-6 production-fidelity error handling: iterator expiry
    (5-minute lifetime) and per-shard read throttling."""

    def test_expired_iterator_reacquires_positionally(self):
        f = FakeKinesis(
            {("es", "shardId-000000000000"): [("p%d" % i, b"v%d" % i) for i in range(7)]}
        )
        try:
            c = KinesisHttpClient(f.endpoint)
            # expire mid-consumption: first page reads 2 records, then
            # the iterator dies; recovery must resume AFTER the last
            # consumed sequence — no loss, no redelivery
            it = iter(c.consume_shard("es", "shardId-000000000000"))
            got = [next(it), next(it)]
            f.expire_next = 1
            got += list(it)
            assert [d for _, _, d in got] == [b"v%d" % i for i in range(7)]
            assert len(got) == len(set(got))
        finally:
            f.close()

    def test_expired_before_first_record(self):
        f = FakeKinesis({("es2", "shardId-000000000000"): [("p", b"x")]})
        try:
            f.expire_next = 2
            c = KinesisHttpClient(f.endpoint)
            recs, ended = c.drain_shard("es2", "shardId-000000000000")
            assert [d for _, _, d in recs] == [b"x"] and ended is False
        finally:
            f.close()

    def test_persistent_expiry_raises(self):
        f = FakeKinesis({("es3", "shardId-000000000000"): [("p", b"x")]})
        try:
            f.expire_next = 99
            c = KinesisHttpClient(f.endpoint)
            with pytest.raises(KinesisWireError) as ei:
                c.drain_shard("es3", "shardId-000000000000")
            assert ei.value.error_type == "ExpiredIteratorException"
        finally:
            f.close()

    def test_throughput_throttle_backs_off(self):
        f = FakeKinesis(
            {("th", "shardId-000000000000"): [("p%d" % i, b"w%d" % i) for i in range(3)]}
        )
        try:
            f.throttle_next = 3  # under the 6-attempt backoff cap
            c = KinesisHttpClient(f.endpoint)
            got = list(c.consume_shard("th", "shardId-000000000000"))
            assert [d for _, _, d in got] == [b"w0", b"w1", b"w2"]
        finally:
            f.close()

    def test_persistent_throttle_raises(self):
        f = FakeKinesis({("th2", "shardId-000000000000"): [("p", b"x")]})
        try:
            f.throttle_next = 99
            c = KinesisHttpClient(f.endpoint)
            with pytest.raises(KinesisWireError) as ei:
                list(c.consume_shard("th2", "shardId-000000000000"))
            assert ei.value.error_type == "ProvisionedThroughputExceededException"
        finally:
            f.close()


def test_client_retries_transport_failure_once():
    """Load balancers recycle connections; every call is an idempotent
    read, so one transport failure retries instead of failing."""

    class FlakyKinesis(FakeKinesis):
        def __init__(self, topics):
            self.fail_next = False
            super().__init__(topics)

        def _dispatch(self, action, body):
            if self.fail_next:
                self.fail_next = False
                raise _Abort
            return super()._dispatch(action, body)

    class _Abort(Exception):
        pass

    f = FlakyKinesis({("t", "shardId-000000000000"): [("p", b"v")]})
    # patch the handler to hard-close the socket on _Abort
    orig = f.server.RequestHandlerClass.do_POST

    def do_POST(self):  # noqa: N802
        try:
            orig(self)
        except Exception:
            self.connection.close()

    f.server.RequestHandlerClass.do_POST = do_POST
    try:
        c = KinesisHttpClient(f.endpoint)
        f.fail_next = True  # first ListShards attempt dies mid-request
        assert c.list_shards("t") == ["shardId-000000000000"]
        f.fail_next = True
        got = list(c.consume_shard("t", "shardId-000000000000"))
        assert [d for _, _, d in got] == [b"v"]
    finally:
        f.close()

def _stream_reader(endpoint, stream, max_records=None):
    """Driver-level reader (the exact object Spark's datasource API
    drives) — lets the offset/gating edge cases run without a
    streaming query."""
    from redshift_avro_spark.sources.kinesis_wire import _streaming_classes

    opts = {"endpoint": endpoint, "stream": stream}
    if max_records is not None:
        opts["maxrecordsperbatch"] = str(max_records)
    return _streaming_classes()(opts).simpleStreamReader(None)


class TestReshardingEdgeCases:
    """Round-7 (ADVICE r6): pre-resharded start gating and tracked
    shards that age out of the listing."""

    def test_initial_offset_excludes_listed_children(self):
        """A query started on an ALREADY-resharded stream must not seed
        children whose parent is still listed — seeding them with ""
        bypasses read()'s parent-before-child gate."""
        f = FakeKinesis(
            {("pr", "shardId-000000000000"): [("p%d" % i, b"a%d" % i) for i in range(5)]}
        )
        try:
            f.split("pr", "shardId-000000000000")
            r = _stream_reader(f.endpoint, "pr")
            start = r.initialOffset()
            assert start == {"shardId-000000000000": ""}
        finally:
            f.close()

    def test_pre_resharded_start_parent_before_child(self):
        """With maxRecordsPerBatch smaller than the parent's backlog, a
        fresh query on a pre-split stream must still deliver EVERY
        parent record in an earlier batch than any child record."""
        f = FakeKinesis(
            {("pr2", "shardId-000000000000"): [("p%d" % i, b"a%d" % i) for i in range(5)]}
        )
        try:
            f.split("pr2", "shardId-000000000000")
            children = sorted(
                s for (t, s), m in f.meta.items()
                if t == "pr2" and m["parent"] == "shardId-000000000000"
            )
            for i in range(4):
                f.put("pr2", "k%d" % i, b"c%d" % i)
            r = _stream_reader(f.endpoint, "pr2", max_records=2)
            start = r.initialOffset()
            batches = []
            for _ in range(10):
                rows, end = r.read(start)
                rows = list(rows)
                if rows:
                    batches.append(rows)
                if end == start:
                    break
                start = end
            flat = [row for b in batches for row in b]
            datas = sorted(row[3] for row in flat)
            assert datas == sorted(
                [b"a%d" % i for i in range(5)] + [b"c%d" % i for i in range(4)]
            )
            assert len(flat) == len(set(flat)), "duplicate delivery"
            last_parent = max(
                i for i, row in enumerate(flat) if row[0] == "shardId-000000000000"
            )
            first_child = min(
                (i for i, row in enumerate(flat) if row[0] in children),
                default=len(flat),
            )
            assert last_parent < first_child, (
                "a capped parent's records were overtaken by child records"
            )
        finally:
            f.close()

    def test_aged_out_tracked_shard_commits_shard_trimmed(self):
        """A tracked shard that vanishes from ListShards (retention)
        must commit the SHARD_TRIMMED sentinel instead of wedging the
        query with ResourceNotFoundException every batch — and the
        trim-committed range must replay to zero rows, while a
        DRAINED SHARD_END range that becomes unreachable stays a loud
        error (those records were real)."""
        f = FakeKinesis(
            {
                ("ao", "shardId-000000000000"): [("p", b"x%d" % i) for i in range(3)],
                ("ao", "shardId-000000000001"): [("q", b"y0")],
            }
        )
        try:
            r = _stream_reader(f.endpoint, "ao")
            start = r.initialOffset()
            rows, end = r.read(start)
            assert len(list(rows)) == 4
            # shard 0 ages out of retention with a sequence offset tracked
            seq_before_trim = end["shardId-000000000000"]
            del f.topics[("ao", "shardId-000000000000")]
            del f.meta[("ao", "shardId-000000000000")]
            f.topics[("ao", "shardId-000000000001")].append(("q2", b"y1"))
            rows2, end2 = r.read(end)
            rows2 = list(rows2)
            assert end2["shardId-000000000000"] == "SHARD_TRIMMED"
            assert [row[3] for row in rows2] == [b"y1"]
            # the trim-committed range replays to zero rows, not an error
            replayed = list(
                r.readBetweenOffsets(
                    {"shardId-000000000000": seq_before_trim,
                     "shardId-000000000001": end["shardId-000000000001"]},
                    end2,
                )
            )
            assert [row[3] for row in replayed] == [b"y1"]
            # steady state: the trimmed shard stays finished
            rows3, end3 = r.read(end2)
            assert list(rows3) == [] and end3 == end2
        finally:
            f.close()

    def test_drained_shard_end_replay_is_loud_after_trim(self):
        """The asymmetry contract: a SHARD_END committed by a real
        drain replays loudly (ResourceNotFoundException surfaces) if
        the shard later ages out — unlike SHARD_TRIMMED, its range
        held real records."""
        from redshift_avro_spark.sources.kinesis_wire import KinesisWireError

        f = FakeKinesis(
            {("ld", "shardId-000000000000"): [("p", b"x%d" % i) for i in range(2)],
             ("ld", "shardId-000000000001"): [("q", b"y0")]}
        )
        try:
            f.split("ld", "shardId-000000000000")
            r = _stream_reader(f.endpoint, "ld")
            start = r.initialOffset()
            rows, end = r.read(start)
            assert len(list(rows)) == 3
            assert end["shardId-000000000000"] == "SHARD_END"  # drained close
            del f.topics[("ld", "shardId-000000000000")]
            del f.meta[("ld", "shardId-000000000000")]
            with pytest.raises(KinesisWireError):
                list(r.readBetweenOffsets(start, end))
        finally:
            f.close()
