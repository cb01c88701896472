"""Spark column codec tests: from_avro/to_avro/decode_container over a
real SparkSession (Arrow-batched pandas UDFs)."""

from __future__ import annotations

import datetime as dt
import json
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from redshift_avro_spark.avroio import parse_schema, write_container
from redshift_avro_spark.sources import (
    decode_container,
    decode_container_json,
    from_avro,
    from_hex,
    to_avro,
)

USER_SCHEMA_JSON = {
    "type": "record",
    "name": "User",
    "namespace": "example.avro",
    "fields": [
        {"name": "name", "type": "string"},
        {"name": "favorite_number", "type": ["int", "null"]},
        {"name": "favorite_color", "type": ["string", "null"]},
    ],
}


@pytest.fixture(scope="module")
def user_binary_df(spark):
    """DataFrame with a binary column of raw Avro datums."""
    from redshift_avro_spark.avroio import encode_datum

    schema = parse_schema(USER_SCHEMA_JSON)
    rows = [
        ("Alyssa", 256, None),
        ("Ben", 7, "red"),
        ("Moiraine", 4, "Blue"),
        ("Nobody", None, None),
    ]
    data = [
        (i, encode_datum(schema, {"name": n, "favorite_number": f, "favorite_color": c}))
        for i, (n, f, c) in enumerate(rows)
    ]
    return spark.createDataFrame(data, "id int, avro binary")


class TestFromAvro:
    def test_decode_struct(self, spark, user_binary_df):
        out = (
            user_binary_df.select("id", from_avro("avro", USER_SCHEMA_JSON).alias("u"))
            .select("id", "u.*")
            .orderBy("id")
            .collect()
        )
        assert [r.name for r in out] == ["Alyssa", "Ben", "Moiraine", "Nobody"]
        assert [r.favorite_number for r in out] == [256, 7, 4, None]
        assert out[1].favorite_color == "red"

    def test_hex_pipeline(self, spark, user_binary_df):
        """S1+S3: the Redshift shape — hex varchar in, struct out."""
        hexed = user_binary_df.select("id", F.lower(F.hex("avro")).alias("hexstr"))
        out = (
            hexed.select("id", from_avro(from_hex("hexstr"), USER_SCHEMA_JSON).alias("u"))
            .select("u.name")
            .orderBy("id")
            .collect()
        )
        assert out[0].name == "Alyssa"

    def test_reader_schema_evolution(self, spark, user_binary_df):
        reader = {
            "type": "record",
            "name": "User",
            "namespace": "example.avro",
            "fields": [
                {"name": "name", "type": "string"},
                {"name": "tier", "type": "string", "default": "free"},
            ],
        }
        out = (
            user_binary_df.select(from_avro("avro", USER_SCHEMA_JSON, reader_schema=reader).alias("u"))
            .select("u.*")
            .collect()
        )
        assert all(r.tier == "free" for r in out)
        assert {r.name for r in out} == {"Alyssa", "Ben", "Moiraine", "Nobody"}

    def test_permissive_mode(self, spark):
        df = spark.createDataFrame([(b"\x02",), (None,)], "avro binary")
        out = df.select(from_avro("avro", USER_SCHEMA_JSON, mode="PERMISSIVE").alias("u")).collect()
        assert all(r.u is None or r.u.name is None for r in out)


class TestToAvro:
    def test_roundtrip_via_spark(self, spark, user_binary_df):
        decoded = user_binary_df.select(
            "id", from_avro("avro", USER_SCHEMA_JSON).alias("u")
        )
        reencoded = decoded.select("id", to_avro("u", USER_SCHEMA_JSON).alias("avro2"))
        joined = (
            user_binary_df.alias("a")
            .join(reencoded.alias("b"), "id")
            .select("a.avro", "b.avro2")
            .collect()
        )
        for r in joined:
            assert bytes(r.avro) == bytes(r.avro2)

    def test_derived_schema(self, spark):
        df = spark.createDataFrame(
            [(1, "x", 2.5), (2, "y", None)], "a long, b string, c double"
        ).select(F.struct("a", "b", "c").alias("s"))
        enc = df.select(to_avro("s", df=df).alias("bin"))
        rows = enc.collect()
        assert all(isinstance(bytes(r.bin), bytes) and len(r.bin) > 0 for r in rows)

    def test_typed_roundtrip(self, spark):
        """date / timestamp / decimal / array / map survive the trip."""
        schema = T.StructType(
            [
                T.StructField("d", T.DateType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("dec", T.DecimalType(10, 2)),
                T.StructField("arr", T.ArrayType(T.LongType())),
                T.StructField("m", T.MapType(T.StringType(), T.DoubleType())),
            ]
        )
        rows = [
            (
                dt.date(2024, 2, 29),
                dt.datetime(2024, 6, 1, 12, 30, 0, 250000),
                Decimal("12345.67"),
                [1, 2, 3],
                {"a": 1.5},
            )
        ]
        df = spark.createDataFrame(rows, schema).select(F.struct(*schema.names).alias("s"))
        avro_schema = {
            "type": "record",
            "name": "Typed",
            "fields": [
                {"name": "d", "type": {"type": "int", "logicalType": "date"}},
                {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
                {"name": "dec", "type": {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2}},
                {"name": "arr", "type": {"type": "array", "items": "long"}},
                {"name": "m", "type": {"type": "map", "values": "double"}},
            ],
        }
        enc = df.select(to_avro("s", avro_schema).alias("bin"))
        dec = enc.select(from_avro("bin", avro_schema).alias("s")).select("s.*").collect()[0]
        assert dec.d == dt.date(2024, 2, 29)
        assert dec.ts == dt.datetime(2024, 6, 1, 12, 30, 0, 250000)
        assert dec.dec == Decimal("12345.67")
        assert dec.arr == [1, 2, 3]
        assert dec.m == {"a": 1.5}


class TestContainerColumn:
    @pytest.fixture(scope="class")
    def container_df(self, spark):
        schema = parse_schema(USER_SCHEMA_JSON)
        cells = []
        for i in range(3):
            rows = [
                {"name": f"u{i}_{j}", "favorite_number": j, "favorite_color": None}
                for j in range(4)
            ]
            cells.append((i, write_container(rows, schema, sync_marker=bytes([i]) * 16)))
        return spark.createDataFrame(cells, "id int, cell binary")

    def test_decode_container_explode(self, spark, container_df):
        exploded = (
            container_df.select("id", F.explode(decode_container("cell", USER_SCHEMA_JSON)).alias("r"))
            .select("id", "r.*")
        )
        assert exploded.count() == 12
        got = exploded.where(F.col("id") == 1).select("name").orderBy("name").collect()
        assert [r.name for r in got] == ["u1_0", "u1_1", "u1_2", "u1_3"]

    def test_decode_container_infer(self, spark, container_df):
        out = container_df.select(
            F.explode(decode_container("cell", df=container_df)).alias("r")
        )
        assert out.count() == 12

    def test_decode_container_json_contract(self, spark, container_df):
        out = container_df.select("id", decode_container_json("cell").alias("js")).orderBy("id").collect()
        parsed = json.loads(out[0].js)
        assert parsed[0] == {"name": "u0_0", "favorite_number": 0, "favorite_color": None}

    def test_reference_golden_cell(self, spark):
        from tests.test_avroio_codec import GOLDEN_CONTAINER_HEX

        df = spark.createDataFrame([(GOLDEN_CONTAINER_HEX,)], "hexcell string")
        out = df.select(
            F.explode(decode_container(from_hex("hexcell"), USER_SCHEMA_JSON)).alias("r")
        ).select("r.*").collect()
        assert [(r.name, r.favorite_number, r.favorite_color) for r in out] == [
            ("Alyssa", 256, None),
            ("Ben", 7, "red"),
        ]


class TestKitchenSinkSparkPath:
    """enum / fixed / uuid / time-millis / time-micros / general union
    through the COLUMN codecs (the §1.2 rows not already covered by
    test_typed_roundtrip)."""

    SCHEMA = {
        "type": "record",
        "name": "Sink",
        "fields": [
            {"name": "color", "type": {"type": "enum", "name": "Color", "symbols": ["RED", "GREEN", "BLUE"]}},
            {"name": "mac", "type": {"type": "fixed", "name": "Mac", "size": 6}},
            {"name": "uid", "type": {"type": "string", "logicalType": "uuid"}},
            {"name": "t_ms", "type": {"type": "int", "logicalType": "time-millis"}},
            {"name": "t_us", "type": {"type": "long", "logicalType": "time-micros"}},
            {"name": "id_or_name", "type": ["long", "string"]},
        ],
    }

    def test_roundtrip(self, spark):
        from pyspark.sql import functions as F

        from redshift_avro_spark.sources.columns import from_avro, to_avro

        rows = [
            ("RED", bytearray(b"\x01\x02\x03\x04\x05\x06"), "f47ac10b-58cc-4372-a567-0e02b2c3d479", 1000, 2000, (7, None)),
            ("BLUE", bytearray(b"\xff\xee\xdd\xcc\xbb\xaa"), "00000000-0000-0000-0000-000000000000", 86399999, 86399999999, (None, "alice")),
        ]
        df = spark.createDataFrame(
            rows,
            "color string, mac binary, uid string, t_ms int, t_us long, "
            "id_or_name struct<member0: long, member1: string>",
        )
        enc = df.select(to_avro(F.struct(*df.columns), self.SCHEMA).alias("p"))
        dec = enc.select(from_avro("p", self.SCHEMA).alias("r")).select("r.*")
        got = sorted([tuple(r) for r in dec.collect()])
        want = sorted(
            [
                (c, bytes(m), u, tms, tus, (m0, m1))
                for c, m, u, tms, tus, (m0, m1) in [
                    (r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows
                ]
            ]
        )
        assert [(g[0], bytes(g[1]), g[2], g[3], g[4], tuple(g[5])) for g in got] == want


class TestErrorChannelAndStreaming:
    SCHEMA = {
        "type": "record",
        "name": "Ev",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "event_type", "type": "string"},
        ],
    }

    def test_from_avro_with_errors(self, spark):
        from pyspark.sql import functions as F

        from redshift_avro_spark.avroio.binary import BinaryWriter, compile_encoder
        from redshift_avro_spark.avroio.schema_model import parse_schema
        import json as _json

        from redshift_avro_spark.sources.columns import from_avro_with_errors

        enc = compile_encoder(parse_schema(_json.dumps(self.SCHEMA)))
        good = []
        for i in range(3):
            w = BinaryWriter()
            enc(w, {"event_id": i, "event_type": "click"})
            good.append(w.getvalue())
        rows = [(bytearray(good[0]),), (bytearray(b"\xff\xff\xff\xff\xff"),), (bytearray(good[2]),), (None,)]
        df = spark.createDataFrame(rows, "p binary")
        out = df.select(from_avro_with_errors("p", self.SCHEMA).alias("r")).select(
            "r.record.*", "r._error"
        )
        got = out.collect()
        assert len(got) == 4
        oks = [r for r in got if r._error is None]
        bads = [r for r in got if r._error is not None]
        assert len(oks) == 2 and {r.event_id for r in oks} == {0, 2}
        assert len(bads) == 2  # poison bytes + null cell, whole batch survives

    def test_explode_containers_matches_decode_container(self, spark):
        import json as _json

        from pyspark.sql import functions as F

        from redshift_avro_spark.avroio.container import write_container
        from redshift_avro_spark.sources.columns import decode_container, explode_containers

        cells = []
        for b in range(4):
            rows = [{"event_id": b * 100 + i, "event_type": f"t{i % 3}"} for i in range(50)]
            cells.append((b, bytearray(write_container(rows, _json.dumps(self.SCHEMA)))))
        df = spark.createDataFrame(cells, "bucket int, cell binary")

        via_explode = (
            df.select("bucket", F.explode(decode_container("cell", self.SCHEMA)).alias("ev"))
            .select("bucket", "ev.*")
        )
        via_stream = explode_containers(df, "cell", self.SCHEMA, keep_cols=["bucket"])
        assert via_stream.count() == 200
        assert via_explode.exceptAll(via_stream).count() == 0
        assert via_stream.exceptAll(via_explode).count() == 0

    def test_explode_containers_reader_reorders_fields(self, spark):
        """Evolution read where the reader schema REORDERS the writer's
        fields (resolver emits dicts in writer order — columns must be
        filled by name, not position)."""
        import json as _json

        from redshift_avro_spark.avroio.container import write_container
        from redshift_avro_spark.sources.columns import explode_containers

        reader = {
            "type": "record",
            "name": "Ev",
            "fields": [
                {"name": "event_type", "type": "string"},
                {"name": "event_id", "type": "long"},
            ],
        }
        rows = [{"event_id": i, "event_type": f"t{i % 3}"} for i in range(20)]
        cell = bytearray(write_container(rows, _json.dumps(self.SCHEMA)))
        df = spark.createDataFrame([(cell,)], "cell binary")
        got = explode_containers(df, "cell", self.SCHEMA, reader_schema=reader).collect()
        assert len(got) == 20
        assert sorted((r.event_id, r.event_type) for r in got) == [
            (i, f"t{i % 3}") for i in range(20)
        ]


class TestMultimodalPlumbing:
    def test_resize_and_frame_sample(self, spark):
        from pyspark.sql import functions as F

        from redshift_avro_spark.operators.multimodal import resize_images, sample_frames

        df = spark.createDataFrame(
            [(i, bytearray(bytes(range(256)) * 2)) for i in range(10)], "doc_id long, payload binary"
        )
        resized = resize_images(df, width=64, height=64).collect()
        assert len(resized) == 10
        assert all(r.out_width == 64 and len(r.resized) > 0 for r in resized)

        frames = sample_frames(df, every_n_bytes=64, max_frames=4)
        got = frames.groupBy("doc_id").count().collect()
        assert all(r["count"] == 4 for r in got)
        one = frames.where("doc_id = 0 AND frame_index = 1").collect()[0]
        assert bytes(one.frame) == bytes(range(64, 128))

    def test_kafka_shaped_decode_chain(self, spark):
        """The production stream shape: (key, value binary, topic,
        timestamp) — the reference's hex hop S1 disappears because
        Kafka's value is already binary (SURVEY §2.1 S8)."""
        import json as _json

        from pyspark.sql import functions as F

        from redshift_avro_spark.avroio.binary import encode_datum
        from redshift_avro_spark.avroio.schema_model import parse_schema
        from redshift_avro_spark.sources.columns import from_avro

        SCHEMA = {"type": "record", "name": "E", "fields": [
            {"name": "event_id", "type": "long"}, {"name": "event_type", "type": "string"}]}
        s = parse_schema(_json.dumps(SCHEMA))
        rows = [
            (str(i).encode(), bytearray(encode_datum(s, {"event_id": i, "event_type": "t"})), "events", i)
            for i in range(20)
        ]
        kafka_shaped = spark.createDataFrame(
            rows, "key binary, value binary, topic string, offset long"
        )
        out = kafka_shaped.select(
            "topic", "offset", from_avro("value", SCHEMA).alias("ev")
        ).select("topic", "offset", "ev.*")
        got = out.orderBy("offset").collect()
        assert len(got) == 20 and got[5].event_id == 5 and got[0].topic == "events"
