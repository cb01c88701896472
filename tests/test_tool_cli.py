"""CLI surface: python -m redshift_avro_spark.tool (dump/schema/meta)."""

from __future__ import annotations

import json

import pytest

from redshift_avro_spark.avroio import write_container
from redshift_avro_spark.tool import main

SCHEMA = {
    "type": "record",
    "name": "U",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
    ],
}


@pytest.fixture()
def avro_file(tmp_path):
    blob = write_container(
        [{"a": i, "s": None if i % 2 else f"x{i}"} for i in range(5)],
        SCHEMA,
        codec="deflate",
    )
    p = tmp_path / "t.avro"
    p.write_bytes(blob)
    return str(p)


class TestToolCli:
    def test_dump_repr_lines(self, avro_file, capsys):
        assert main(["dump", avro_file]) == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert len(lines) == 5
        assert lines[0] == "{'a': 0, 's': 'x0'}"

    def test_dump_json_and_limit(self, avro_file, capsys):
        assert main(["dump", avro_file, "--json", "--limit", "2"]) == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert len(lines) == 2
        assert json.loads(lines[1]) == {"a": 1, "s": None}

    def test_schema(self, avro_file, capsys):
        assert main(["schema", avro_file]) == 0
        sch = json.loads(capsys.readouterr().out)
        assert sch["name"] == "U" and [f["name"] for f in sch["fields"]] == ["a", "s"]

    def test_meta(self, avro_file, capsys):
        assert main(["meta", avro_file]) == 0
        meta = json.loads(capsys.readouterr().out)
        assert meta["codec"] == "deflate"
        assert meta["records"] == 5
        assert meta["schema_name"] == "U"


def test_kafka_dump_cli(capsys):
    from tests.test_kafka_wire import FakeBroker

    b = FakeBroker({("t", 0): [(b"k0", b"\x01\x02"), (None, b"vv")]})
    try:
        assert main(["kafka-dump", "--port", str(b.port), "--topic", "t"]) == 0
        lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
        assert lines == [
            {"partition": 0, "offset": 0, "key": "6b30", "value": "0102"},
            {"partition": 0, "offset": 1, "key": None, "value": "7676"},
        ]
        assert main(
            ["kafka-dump", "--port", str(b.port), "--topic", "t", "--limit", "1"]
        ) == 0
        assert len(capsys.readouterr().out.strip().splitlines()) == 1
    finally:
        b.close()


def test_kinesis_dump_cli(capsys):
    from tests.test_kinesis_wire import FakeKinesis

    f = FakeKinesis({("s", "shardId-000000000000"): [("pk", b"\xaa\xbb")]})
    try:
        assert main(["kinesis-dump", "--endpoint", f.endpoint, "--stream", "s"]) == 0
        lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
        assert lines == [
            {
                "shard_id": "shardId-000000000000",
                "sequence_number": "%020d" % 0,
                "partition_key": "pk",
                "data": "aabb",
            }
        ]
    finally:
        f.close()
