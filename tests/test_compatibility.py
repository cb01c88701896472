"""Compatibility checker tests (reference compatibility.py:140-319
semantics, SURVEY FIXTURES.md §A6 evolution pairs)."""

from __future__ import annotations

import pytest

from redshift_avro_spark.avroio import check_reader_writer, is_compatible, parse_schema
from redshift_avro_spark.avroio.compat import (
    FIXED_SIZE_MISMATCH,
    MISSING_ENUM_SYMBOLS,
    MISSING_UNION_BRANCH,
    READER_FIELD_MISSING_DEFAULT_VALUE,
    TYPE_MISMATCH,
)


def rec(fields, name="R"):
    return parse_schema({"type": "record", "name": name, "fields": fields})


class TestPrimitives:
    @pytest.mark.parametrize(
        "writer,reader,ok",
        [
            ("int", "int", True),
            ("int", "long", True),
            ("int", "float", True),
            ("int", "double", True),
            ("long", "double", True),
            ("long", "float", True),
            ("float", "double", True),
            ("double", "float", False),
            ("long", "int", False),
            ("string", "bytes", True),
            ("bytes", "string", True),
            ("string", "int", False),
            ("boolean", "boolean", True),
        ],
    )
    def test_promotion_matrix(self, writer, reader, ok):
        assert is_compatible(parse_schema(f'"{reader}"'), parse_schema(f'"{writer}"')) is ok


class TestRecords:
    def test_writer_extra_field_ok(self):
        w = rec([{"name": "a", "type": "int"}, {"name": "extra", "type": "string"}])
        r = rec([{"name": "a", "type": "int"}])
        assert is_compatible(r, w)

    def test_reader_extra_needs_default(self):
        w = rec([{"name": "a", "type": "int"}])
        r_no = rec([{"name": "a", "type": "int"}, {"name": "b", "type": "string"}])
        r_yes = rec([{"name": "a", "type": "int"}, {"name": "b", "type": "string", "default": "x"}])
        res = check_reader_writer(r_no, w)
        assert not res.compatible
        assert res.incompatibilities[0].kind == READER_FIELD_MISSING_DEFAULT_VALUE
        assert "fields/1" in res.incompatibilities[0].location
        assert is_compatible(r_yes, w)

    def test_field_alias_matches(self):
        w = rec([{"name": "old", "type": "int"}])
        r = rec([{"name": "new", "type": "int", "aliases": ["old"]}])
        assert is_compatible(r, w)

    def test_nested_field_location(self):
        w = rec([{"name": "a", "type": "string"}])
        r = rec([{"name": "a", "type": "int"}])
        res = check_reader_writer(r, w)
        assert not res.compatible
        assert res.incompatibilities[0].kind == TYPE_MISMATCH
        assert res.incompatibilities[0].location.endswith("/fields/0/type")


class TestEnumFixedUnion:
    def test_enum_subset_and_default(self):
        w = parse_schema({"type": "enum", "name": "E", "symbols": ["A", "B", "C"]})
        r_sub = parse_schema({"type": "enum", "name": "E", "symbols": ["A", "B"]})
        res = check_reader_writer(r_sub, w)
        assert not res.compatible and res.incompatibilities[0].kind == MISSING_ENUM_SYMBOLS
        r_dflt = parse_schema({"type": "enum", "name": "E", "symbols": ["A", "UNK"], "default": "UNK"})
        assert is_compatible(r_dflt, w)

    def test_fixed_size(self):
        w = parse_schema({"type": "fixed", "name": "F", "size": 8})
        r_ok = parse_schema({"type": "fixed", "name": "F", "size": 8})
        r_bad = parse_schema({"type": "fixed", "name": "F", "size": 4})
        assert is_compatible(r_ok, w)
        res = check_reader_writer(r_bad, w)
        assert not res.compatible and res.incompatibilities[0].kind == FIXED_SIZE_MISMATCH

    def test_union_expansion(self):
        # writer int → reader [null, int]: ok; reverse: not
        w, r = parse_schema('"int"'), parse_schema(["null", "int"])
        assert is_compatible(r, w)
        res = check_reader_writer(w, r)
        assert not res.compatible
        assert any(i.kind in (MISSING_UNION_BRANCH, TYPE_MISMATCH) for i in res.incompatibilities)

    def test_union_branch_promotion(self):
        w = parse_schema(["int", "null"])
        r = parse_schema(["null", "long"])
        assert is_compatible(r, w)


class TestRecursive:
    def test_recursive_schema_terminates(self):
        node = {
            "type": "record",
            "name": "Node",
            "fields": [
                {"name": "v", "type": "int"},
                {"name": "next", "type": ["null", "Node"], "default": None},
            ],
        }
        r, w = parse_schema(node), parse_schema(node)
        assert is_compatible(r, w)
