"""Reader/writer schema compatibility checker.

Fresh implementation of the verdict the reference's checker produces
(/root/reference/python-udf/avro/compatibility.py:140-319): given a
reader and a writer schema, decide whether every datum written with the
writer can be decoded with the reader, and if not, say why and where
(incompatibility kind + JSON-pointer-ish location). Handles recursive
schemas via an in-progress memo (compatibility.py:146-164), field
aliases (compatibility.py:384-395), enum defaults
(compatibility.py:349-363) and the full promotion matrix including
string↔bytes (compatibility.py:251-258).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from .schema_model import (
    ArraySchema,
    AvroSchema,
    EnumSchema,
    FixedSchema,
    MapSchema,
    PrimitiveSchema,
    RecordSchema,
    UnionSchema,
)

# incompatibility kinds (taxonomy mirrors upstream Avro's SchemaCompatibility)
TYPE_MISMATCH = "type_mismatch"
NAME_MISMATCH = "name_mismatch"
FIXED_SIZE_MISMATCH = "fixed_size_mismatch"
MISSING_ENUM_SYMBOLS = "missing_enum_symbols"
READER_FIELD_MISSING_DEFAULT_VALUE = "reader_field_missing_default_value"
MISSING_UNION_BRANCH = "missing_union_branch"

_PROMOTABLE = {
    ("int", "long"),
    ("int", "float"),
    ("int", "double"),
    ("long", "float"),
    ("long", "double"),
    ("float", "double"),
    ("string", "bytes"),
    ("bytes", "string"),
}


@dataclass(frozen=True)
class Incompatibility:
    kind: str
    location: str
    message: str


@dataclass
class CompatibilityResult:
    compatible: bool
    incompatibilities: list[Incompatibility] = field(default_factory=list)

    def merged(self, other: "CompatibilityResult") -> "CompatibilityResult":
        return CompatibilityResult(
            self.compatible and other.compatible,
            self.incompatibilities + other.incompatibilities,
        )


_OK = CompatibilityResult(True)


class _Checker:
    def __init__(self) -> None:
        # memo maps (id(reader), id(writer)) -> result or None (in progress);
        # in-progress pairs are assumed compatible, which terminates
        # recursion on self-referential schemas.
        self._memo: dict[tuple[int, int], Optional[CompatibilityResult]] = {}

    def check(self, reader: AvroSchema, writer: AvroSchema, loc: str) -> CompatibilityResult:
        key = (id(reader), id(writer))
        if key in self._memo:
            memoized = self._memo[key]
            return memoized if memoized is not None else _OK
        self._memo[key] = None
        result = self._check(reader, writer, loc)
        self._memo[key] = result
        return result

    def _check(self, reader: AvroSchema, writer: AvroSchema, loc: str) -> CompatibilityResult:
        # writer union: every branch must be readable
        if isinstance(writer, UnionSchema):
            out = _OK
            for i, b in enumerate(writer.branches):
                out = out.merged(self.check(reader, b, f"{loc}/{i}"))
            return out
        # reader union (writer is not): some branch must accept the writer
        if isinstance(reader, UnionSchema):
            for b in reader.branches:
                if self.check(b, writer, loc).compatible:
                    return _OK
            return _fail(
                MISSING_UNION_BRANCH,
                loc,
                f"reader union has no branch accepting writer {writer.type}",
            )

        rt, wt = reader.type, writer.type
        if isinstance(reader, PrimitiveSchema) and isinstance(writer, PrimitiveSchema):
            if rt == wt or (wt, rt) in _PROMOTABLE:
                return _OK
            return _fail(TYPE_MISMATCH, loc, f"reader {rt} cannot read writer {wt}")

        if rt != wt:
            # promotions only exist between primitives
            if isinstance(reader, PrimitiveSchema) and (wt, rt) in _PROMOTABLE:
                return _OK
            return _fail(TYPE_MISMATCH, loc, f"reader {rt} cannot read writer {wt}")

        if isinstance(reader, FixedSchema) and isinstance(writer, FixedSchema):
            if not _name_ok(reader, writer):
                return _fail(NAME_MISMATCH, loc, f"{reader.fullname} vs {writer.fullname}")
            if reader.size != writer.size:
                return _fail(
                    FIXED_SIZE_MISMATCH,
                    loc,
                    f"fixed size {reader.size} != {writer.size}",
                )
            return _OK

        if isinstance(reader, EnumSchema) and isinstance(writer, EnumSchema):
            if not _name_ok(reader, writer):
                return _fail(NAME_MISMATCH, loc, f"{reader.fullname} vs {writer.fullname}")
            missing = set(writer.symbols) - set(reader.symbols)
            if missing and reader.default is None:
                return _fail(
                    MISSING_ENUM_SYMBOLS,
                    f"{loc}/symbols",
                    f"reader enum lacks writer symbols {sorted(missing)} and has no default",
                )
            return _OK

        if isinstance(reader, ArraySchema) and isinstance(writer, ArraySchema):
            return self.check(reader.items, writer.items, f"{loc}/items")

        if isinstance(reader, MapSchema) and isinstance(writer, MapSchema):
            return self.check(reader.values, writer.values, f"{loc}/values")

        if isinstance(reader, RecordSchema) and isinstance(writer, RecordSchema):
            if not _name_ok(reader, writer):
                return _fail(NAME_MISMATCH, loc, f"{reader.fullname} vs {writer.fullname}")
            out = _OK
            writer_fields = writer.field_map()
            for i, rf in enumerate(reader.fields):
                wf = writer_fields.get(rf.name)
                if wf is None:
                    for alias in rf.aliases:
                        wf = writer_fields.get(alias)
                        if wf is not None:
                            break
                floc = f"{loc}/fields/{i}"
                if wf is None:
                    if not rf.has_default:
                        out = out.merged(
                            _fail(
                                READER_FIELD_MISSING_DEFAULT_VALUE,
                                floc,
                                f"reader field {rf.name!r} absent from writer and has no default",
                            )
                        )
                else:
                    out = out.merged(self.check(rf.schema, wf.schema, f"{floc}/type"))
            return out

        return _fail(TYPE_MISMATCH, loc, f"reader {rt} cannot read writer {wt}")


def _name_ok(reader: AvroSchema, writer: AvroSchema) -> bool:
    if reader.fullname == writer.fullname:
        return True
    if writer.fullname in getattr(reader, "aliases", ()):
        return True
    # lenient unqualified-name match (upstream allows unqualified matches
    # when namespaces differ only by nesting)
    return getattr(reader, "name", None) == getattr(writer, "name", None)


def _fail(kind: str, loc: str, message: str) -> CompatibilityResult:
    return CompatibilityResult(False, [Incompatibility(kind, loc or "/", message)])


def check_reader_writer(reader: AvroSchema, writer: AvroSchema) -> CompatibilityResult:
    """Full compatibility verdict: can `reader` read data written by `writer`?"""
    return _Checker().check(reader, writer, "")


def is_compatible(reader: AvroSchema, writer: AvroSchema) -> bool:
    return check_reader_writer(reader, writer).compatible
