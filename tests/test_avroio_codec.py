"""Pure-Python codec tests: no SparkSession needed.

Test strategy follows the reference's two workable patterns (SURVEY §5):
write-then-read round-trips through our own encoder, and golden
byte-level fixtures with exact equality — the golden hex below is the
reference's own Redshift batch fixture
(/root/reference/avro-file-udf/payload.json), whose container decodes to
the Alyssa/Ben rows (SURVEY §5)."""

from __future__ import annotations

import datetime as dt
import io
import json
from decimal import Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from redshift_avro_spark.avroio import (
    ContainerWriter,
    SchemaResolutionError,
    UnsupportedCodec,
    canonical_form,
    compile_resolver,
    decode_datum,
    encode_datum,
    fingerprint64,
    get_codec,
    iter_container,
    parse_schema,
    read_header,
    write_container,
)
from redshift_avro_spark.avroio.binary import BinaryReader, compile_decoder, compile_skipper, validate
from redshift_avro_spark.avroio.container import iter_file_split
from redshift_avro_spark.avroio.schema_model import IgnoredLogicalType, SchemaParseError

USER_SCHEMA = parse_schema(
    {
        "type": "record",
        "name": "User",
        "namespace": "example.avro",
        "fields": [
            {"name": "name", "type": "string"},
            {"name": "favorite_number", "type": ["int", "null"]},
            {"name": "favorite_color", "type": ["string", "null"]},
        ],
    }
)

# /root/reference/avro-file-udf/payload.json arguments[0][0]
GOLDEN_CONTAINER_HEX = (
    "4f626a0104146176726f2e636f646563086e756c6c166176726f2e736368656d61ba037b2274797065223a2022"
    "7265636f7264222c20226e616d65223a202255736572222c20226e616d657370616365223a20226578616d706c"
    "652e6176726f222c20226669656c6473223a205b7b2274797065223a2022737472696e67222c20226e616d6522"
    "3a20226e616d65227d2c207b2274797065223a205b22696e74222c20226e756c6c225d2c20226e616d65223a20"
    "226661766f726974655f6e756d626572227d2c207b2274797065223a205b22737472696e67222c20226e756c6c"
    "225d2c20226e616d65223a20226661766f726974655f636f6c6f72227d5d7d009eeefde491b1497c504abe61a8"
    "cc79c1042c0c416c79737361008004020642656e000e00067265649eeefde491b1497c504abe61a8cc79c1"
)

KITCHEN_SINK = parse_schema(
    {
        "type": "record",
        "name": "Everything",
        "namespace": "test.types",
        "fields": [
            {"name": "f_null", "type": "null"},
            {"name": "f_bool", "type": "boolean"},
            {"name": "f_int", "type": "int"},
            {"name": "f_long", "type": "long"},
            {"name": "f_float", "type": "float"},
            {"name": "f_double", "type": "double"},
            {"name": "f_bytes", "type": "bytes"},
            {"name": "f_string", "type": "string"},
            {"name": "f_fixed", "type": {"type": "fixed", "name": "F16", "size": 16}},
            {"name": "f_enum", "type": {"type": "enum", "name": "Color", "symbols": ["RED", "GREEN", "BLUE"]}},
            {"name": "f_array", "type": {"type": "array", "items": "long"}},
            {"name": "f_map", "type": {"type": "map", "values": "double"}},
            {
                "name": "f_nested",
                "type": {
                    "type": "record",
                    "name": "Inner",
                    "fields": [{"name": "x", "type": "int"}, {"name": "y", "type": "string"}],
                },
            },
            {"name": "f_union", "type": ["null", "string", "long"]},
            {"name": "f_dec_bytes", "type": {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2}},
            {
                "name": "f_dec_fixed",
                "type": {"type": "fixed", "name": "D8", "size": 8, "logicalType": "decimal", "precision": 18, "scale": 4},
            },
            {"name": "f_date", "type": {"type": "int", "logicalType": "date"}},
            {"name": "f_time_ms", "type": {"type": "int", "logicalType": "time-millis"}},
            {"name": "f_time_us", "type": {"type": "long", "logicalType": "time-micros"}},
            {"name": "f_ts_ms", "type": {"type": "long", "logicalType": "timestamp-millis"}},
            {"name": "f_ts_us", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "f_uuid", "type": {"type": "string", "logicalType": "uuid"}},
            {"name": "f_defaulted", "type": "string", "default": "dflt"},
        ],
    }
)

KITCHEN_SINK_DATUM = {
    "f_null": None,
    "f_bool": True,
    "f_int": -42,
    "f_long": 1 << 40,
    "f_float": 2.5,
    "f_double": -1.25e100,
    "f_bytes": b"\x00\xffhi",
    "f_string": "héllo ☃",
    "f_fixed": bytes(range(16)),
    "f_enum": "GREEN",
    "f_array": [1, -2, 3_000_000_000],
    "f_map": {"a": 1.5, "b": -2.25},
    "f_nested": {"x": 7, "y": "inner"},
    "f_union": "chosen",
    "f_dec_bytes": Decimal("12345.67"),
    "f_dec_fixed": Decimal("-9999.1234"),
    "f_date": dt.date(2024, 2, 29),
    "f_time_ms": dt.time(23, 59, 59, 123000),
    "f_time_us": dt.time(0, 0, 1, 1),
    "f_ts_ms": dt.datetime(2020, 6, 1, 12, 30, 0, 250000, tzinfo=dt.timezone.utc),
    "f_ts_us": dt.datetime(1969, 12, 31, 23, 59, 59, 999999, tzinfo=dt.timezone.utc),
    "f_uuid": "123e4567-e89b-12d3-a456-426614174000",
    "f_defaulted": "not-default",
}


class TestGoldenFixture:
    def test_reference_payload_decodes(self):
        data = bytes.fromhex(GOLDEN_CONTAINER_HEX)
        rows = list(iter_container(data))
        assert rows == [
            {"name": "Alyssa", "favorite_number": 256, "favorite_color": None},
            {"name": "Ben", "favorite_number": 7, "favorite_color": "red"},
        ]

    def test_reference_header(self):
        header = read_header(bytes.fromhex(GOLDEN_CONTAINER_HEX))
        assert header.codec == "null"
        assert header.schema.fullname == "example.avro.User"

    def test_reencode_roundtrip_matches_golden_rows(self):
        rows = [
            {"name": "Alyssa", "favorite_number": 256, "favorite_color": None},
            {"name": "Ben", "favorite_number": 7, "favorite_color": "red"},
        ]
        blob = write_container(rows, USER_SCHEMA, sync_marker=b"\x01" * 16)
        assert list(iter_container(blob)) == rows

    def test_single_datum_golden(self):
        # glue-schema-per-stream-udf/lambda_function.py:84-95 golden
        datum = {"name": "Moiraine", "favorite_number": 4, "favorite_color": "Blue"}
        raw = encode_datum(USER_SCHEMA, datum)
        assert decode_datum(USER_SCHEMA, raw) == datum
        assert (
            json.dumps(decode_datum(USER_SCHEMA, raw))
            == '{"name": "Moiraine", "favorite_number": 4, "favorite_color": "Blue"}'
        )


class TestKitchenSink:
    def test_roundtrip(self):
        raw = encode_datum(KITCHEN_SINK, KITCHEN_SINK_DATUM)
        assert decode_datum(KITCHEN_SINK, raw) == KITCHEN_SINK_DATUM

    def test_skipper_consumes_exactly(self):
        raw = encode_datum(KITCHEN_SINK, KITCHEN_SINK_DATUM)
        r = BinaryReader(raw)
        compile_skipper(KITCHEN_SINK)(r)
        assert r.at_end()

    def test_validate(self):
        assert validate(KITCHEN_SINK, KITCHEN_SINK_DATUM)
        bad = dict(KITCHEN_SINK_DATUM, f_int="nope")
        assert not validate(KITCHEN_SINK, bad)

    def test_default_filled_on_encode(self):
        datum = dict(KITCHEN_SINK_DATUM)
        del datum["f_defaulted"]
        raw = encode_datum(KITCHEN_SINK, datum)
        assert decode_datum(KITCHEN_SINK, raw)["f_defaulted"] == "dflt"

    def test_unknown_logical_type_falls_back(self):
        with pytest.warns(IgnoredLogicalType):
            s = parse_schema({"type": "string", "logicalType": "no-such-thing"})
        assert s.logical_type is None
        assert decode_datum(s, encode_datum(s, "x")) == "x"


class TestZigzagEdges:
    @pytest.mark.parametrize("v", [0, -1, 1, 63, 64, -64, -65, (1 << 31) - 1, -(1 << 31)])
    def test_int_boundaries(self, v):
        s = parse_schema('"int"')
        assert decode_datum(s, encode_datum(s, v)) == v

    @pytest.mark.parametrize("v", [(1 << 63) - 1, -(1 << 63), 1 << 62])
    def test_long_boundaries(self, v):
        s = parse_schema('"long"')
        assert decode_datum(s, encode_datum(s, v)) == v

    def test_long_overflow_rejected(self):
        s = parse_schema('"long"')
        with pytest.raises(Exception):
            encode_datum(s, 1 << 63)

    @given(st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1))
    @settings(max_examples=300, deadline=None)
    def test_long_roundtrip_property(self, v):
        s = parse_schema('"long"')
        assert decode_datum(s, encode_datum(s, v)) == v


@given(
    st.lists(
        st.tuples(
            st.text(max_size=20),
            st.one_of(st.none(), st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1)),
            st.one_of(st.none(), st.text(max_size=10)),
        ),
        max_size=30,
    )
)
@settings(max_examples=50, deadline=None)
def test_container_roundtrip_property(rows):
    datums = [
        {"name": n, "favorite_number": num, "favorite_color": c} for (n, num, c) in rows
    ]
    blob = write_container(datums, USER_SCHEMA, sync_marker=b"\x02" * 16)
    assert list(iter_container(blob)) == datums


class TestCodecs:
    @pytest.mark.parametrize("codec", ["null", "deflate", "bzip2"])
    def test_roundtrip_each_codec(self, codec):
        rows = [{"name": f"u{i}", "favorite_number": i, "favorite_color": None} for i in range(500)]
        blob = write_container(rows, USER_SCHEMA, codec=codec, sync_marker=b"\x03" * 16)
        assert read_header(blob).codec == codec
        assert list(iter_container(blob)) == rows

    def test_unknown_codec_raises(self):
        with pytest.raises(UnsupportedCodec):
            get_codec("lzo-nope")

    def test_deflate_is_raw(self):
        import zlib

        c = get_codec("deflate")
        out = c.compress(b"hello hello hello")
        # raw deflate: zlib.decompress with -15 accepts it, plain doesn't
        assert zlib.decompress(out, -15) == b"hello hello hello"
        with pytest.raises(zlib.error):
            zlib.decompress(out)


class TestMultiBlockAndSplits:
    def _blob(self, n=5000):
        rows = [{"name": f"user{i}", "favorite_number": i % 1000, "favorite_color": "c" + str(i)} for i in range(n)]
        # small sync interval → many blocks
        return rows, write_container(rows, USER_SCHEMA, sync_interval=1000, sync_marker=b"\x04" * 16)

    def test_multiblock_roundtrip(self):
        rows, blob = self._blob()
        assert list(iter_container(blob)) == rows

    def test_split_reading_covers_exactly_once(self, tmp_path):
        rows, blob = self._blob()
        p = tmp_path / "multi.avro"
        p.write_bytes(blob)
        total = len(blob)
        for n_splits in (1, 2, 3, 7):
            step = total // n_splits + 1
            got = []
            for s in range(0, total, step):
                got.extend(iter_file_split(str(p), s, min(s + step, total)))
            assert got == rows, f"splits={n_splits}"


class TestSchemaEvolution:
    def test_writer_extra_field_skipped(self):
        writer = parse_schema(
            {"type": "record", "name": "R", "fields": [
                {"name": "a", "type": "int"}, {"name": "zap", "type": "string"}, {"name": "b", "type": "long"}]}
        )
        reader = parse_schema(
            {"type": "record", "name": "R", "fields": [
                {"name": "a", "type": "int"}, {"name": "b", "type": "long"}]}
        )
        raw = encode_datum(writer, {"a": 1, "zap": "gone", "b": 2})
        assert decode_datum(writer, raw, reader) == {"a": 1, "b": 2}

    def test_reader_default_filled(self):
        writer = parse_schema({"type": "record", "name": "R", "fields": [{"name": "a", "type": "int"}]})
        reader = parse_schema(
            {"type": "record", "name": "R", "fields": [
                {"name": "a", "type": "int"},
                {"name": "b", "type": "string", "default": "dee"},
                {"name": "c", "type": ["null", "long"], "default": None}]}
        )
        raw = encode_datum(writer, {"a": 5})
        assert decode_datum(writer, raw, reader) == {"a": 5, "b": "dee", "c": None}

    def test_reader_missing_default_errors(self):
        writer = parse_schema({"type": "record", "name": "R", "fields": [{"name": "a", "type": "int"}]})
        reader = parse_schema(
            {"type": "record", "name": "R", "fields": [
                {"name": "a", "type": "int"}, {"name": "b", "type": "string"}]}
        )
        with pytest.raises(SchemaResolutionError):
            compile_resolver(writer, reader)

    @pytest.mark.parametrize(
        "wt,rt,val,expected",
        [
            ("int", "long", 7, 7),
            ("int", "float", 7, 7.0),
            ("int", "double", -7, -7.0),
            ("long", "float", 1 << 30, float(1 << 30)),
            ("long", "double", -(1 << 40), float(-(1 << 40))),
            ("float", "double", 2.5, 2.5),
            ("string", "bytes", "héllo", "héllo".encode()),
            ("bytes", "string", "héllo".encode(), "héllo"),
        ],
    )
    def test_promotions(self, wt, rt, val, expected):
        writer, reader = parse_schema(f'"{wt}"'), parse_schema(f'"{rt}"')
        out = decode_datum(writer, encode_datum(writer, val), reader)
        assert out == expected and type(out) is type(expected)

    def test_enum_resolution(self):
        writer = parse_schema({"type": "enum", "name": "E", "symbols": ["A", "B", "C"]})
        reader_sub = parse_schema({"type": "enum", "name": "E", "symbols": ["A", "B"]})
        assert decode_datum(writer, encode_datum(writer, "B"), reader_sub) == "B"
        with pytest.raises(SchemaResolutionError):
            decode_datum(writer, encode_datum(writer, "C"), reader_sub)
        reader_dflt = parse_schema(
            {"type": "enum", "name": "E", "symbols": ["A", "B", "UNKNOWN"], "default": "UNKNOWN"}
        )
        assert decode_datum(writer, encode_datum(writer, "C"), reader_dflt) == "UNKNOWN"

    def test_union_writer_to_nonunion_reader(self):
        writer = parse_schema(["int", "null"])
        reader = parse_schema('"long"')
        assert decode_datum(writer, encode_datum(writer, 3), reader) == 3
        with pytest.raises(Exception):
            decode_datum(writer, encode_datum(writer, None), reader)

    def test_nonunion_writer_to_union_reader(self):
        writer = parse_schema('"int"')
        reader = parse_schema(["null", "long"])
        assert decode_datum(writer, encode_datum(writer, 9), reader) == 9

    def test_field_alias(self):
        writer = parse_schema({"type": "record", "name": "R", "fields": [{"name": "old", "type": "int"}]})
        reader = parse_schema(
            {"type": "record", "name": "R", "fields": [{"name": "new", "type": "int", "aliases": ["old"]}]}
        )
        raw = encode_datum(writer, {"old": 11})
        assert decode_datum(writer, raw, reader) == {"new": 11}

    def test_spark_mode_resolver_general_union_member_struct(self):
        """spark-mode resolver must produce the same member0..N structs the
        spark-mode decoder does (avro_to_spark_type declares a struct for
        general unions, so a bare branch value would break Arrow)."""
        sch = parse_schema(
            {"type": "record", "name": "R", "fields": [{"name": "u", "type": ["long", "string", "null"]}]}
        )
        res = compile_resolver(sch, sch, mode="spark")
        dec = compile_decoder(sch, mode="spark")
        for v in [{"u": 5}, {"u": "hi"}, {"u": None}]:
            raw = encode_datum(sch, v)
            got_res = res(BinaryReader(raw))
            got_dec = dec(BinaryReader(raw))
            assert got_res == got_dec
        assert res(BinaryReader(encode_datum(sch, {"u": 5}))) == {"u": {"member0": 5, "member1": None}}

    def test_spark_mode_resolver_union_evolution_remaps_to_reader_branches(self):
        """member slots follow the READER's branch order, not the writer's."""
        writer = parse_schema(
            {"type": "record", "name": "R", "fields": [{"name": "u", "type": ["int", "string"]}]}
        )
        reader = parse_schema(
            {"type": "record", "name": "R", "fields": [{"name": "u", "type": ["string", "long"]}]}
        )
        res = compile_resolver(writer, reader, mode="spark")
        # writer int 42 → reader long = member1; writer string → reader string = member0
        assert res(BinaryReader(encode_datum(writer, {"u": 42}))) == {"u": {"member0": None, "member1": 42}}
        assert res(BinaryReader(encode_datum(writer, {"u": "x"}))) == {"u": {"member0": "x", "member1": None}}


class TestRecursiveSchema:
    LINKED = {
        "type": "record",
        "name": "Node",
        "fields": [
            {"name": "value", "type": "int"},
            {"name": "next", "type": ["null", "Node"], "default": None},
        ],
    }

    def test_recursive_roundtrip(self):
        s = parse_schema(self.LINKED)
        datum = {"value": 1, "next": {"value": 2, "next": {"value": 3, "next": None}}}
        assert decode_datum(s, encode_datum(s, datum)) == datum

    def test_canonical_form_terminates(self):
        s = parse_schema(self.LINKED)
        cf = canonical_form(s)
        assert '"Node"' in cf  # recursive reference by name


class TestSchemaModel:
    def test_canonical_form_strips_extras(self):
        a = parse_schema(
            {"type": "record", "name": "X", "namespace": "ns", "doc": "d",
             "fields": [{"name": "f", "type": "int", "doc": "dd", "default": 0}]}
        )
        b = parse_schema(
            {"type": "record", "name": "ns.X", "fields": [{"name": "f", "type": "int"}]}
        )
        assert canonical_form(a) == canonical_form(b)
        assert fingerprint64(a) == fingerprint64(b)

    def test_fingerprint_known_value(self):
        # CRC-64-AVRO of '"string"' is a spec-documented test vector family;
        # assert stability across runs instead of a hardcoded constant,
        # plus difference between types.
        s1, s2 = parse_schema('"string"'), parse_schema('"int"')
        assert fingerprint64(s1) == fingerprint64(parse_schema('"string"'))
        assert fingerprint64(s1) != fingerprint64(s2)

    @pytest.mark.parametrize(
        "bad",
        [
            {"type": "record", "name": "9bad", "fields": []},
            {"type": "record", "name": "R"},  # no fields
            {"type": "enum", "name": "E", "symbols": ["a", "a"]},
            {"type": "fixed", "name": "F"},  # no size
            ["int", "int"],  # duplicate union branch
            [["int"], "string"],  # nested union
            {"type": "map"},  # no values
            {"type": "array"},  # no items
        ],
    )
    def test_invalid_schemas_rejected(self, bad):
        with pytest.raises(SchemaParseError):
            parse_schema(bad)

    def test_namespace_inheritance(self):
        s = parse_schema(
            {"type": "record", "name": "Outer", "namespace": "com.ex",
             "fields": [{"name": "inner", "type": {"type": "record", "name": "Inner",
                                                   "fields": [{"name": "x", "type": "int"}]}}]}
        )
        inner = s.fields[0].schema
        assert inner.fullname == "com.ex.Inner"

    def test_union_writer_picks_first_matching_branch(self):
        # spec behavior, NOT the reference port's last-match bug
        # (io.py:1313-1317, SURVEY Appendix A)
        s = parse_schema(["long", "double", "string"])
        raw = encode_datum(s, 5)
        r = BinaryReader(raw)
        assert r.read_long() == 0  # branch index 0 (long), not 1 (double)


class TestContainerWriterBehavior:
    def test_block_structure_and_sync_interval(self):
        rows = [{"name": "x" * 50, "favorite_number": i, "favorite_color": None} for i in range(100)]
        blob = write_container(rows, USER_SCHEMA, sync_interval=500, sync_marker=b"\x05" * 16)
        header = read_header(blob)
        from redshift_avro_spark.avroio.container import iter_raw_blocks

        blocks = list(iter_raw_blocks(blob, header.header_len, header.sync))
        assert len(blocks) > 5  # small interval → many blocks
        assert sum(c for c, _ in blocks) == 100

    def test_streaming_writer_to_file(self, tmp_path):
        p = tmp_path / "x.avro"
        with open(p, "wb") as fh:
            with ContainerWriter(fh, USER_SCHEMA, codec="deflate") as w:
                for i in range(10):
                    w.append({"name": str(i), "favorite_number": i, "favorite_color": None})
        data = p.read_bytes()
        assert len(list(iter_container(data))) == 10

    def test_empty_container(self):
        blob = write_container([], USER_SCHEMA)
        assert list(iter_container(blob)) == []
