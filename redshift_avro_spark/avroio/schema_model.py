"""Avro schema model: parse / validate / canonicalize.

Spec-based replacement for the reference's schema layer
(/root/reference/python-udf/avro/schema.py:172-1402 and name.py:33-200).
The in-memory representation here is a small tree of frozen dataclasses
(the reference uses a class hierarchy mirroring upstream Apache Avro);
semantics follow the Avro 1.12 specification:

- primitives: null boolean int long float double bytes string
- named: record enum fixed (dotted fullnames, enclosing-namespace
  inheritance, per-segment name regex, duplicate / reserved rejection)
- composite: array map union (no immediate nested unions, no duplicate
  unnamed branch types, string-keyed maps)
- logical types: decimal (bytes|fixed), date, time-millis, time-micros,
  timestamp-millis, timestamp-micros, uuid — unknown/invalid logicalType
  annotations warn and fall back to the base type
  (reference schema.py:1226-1246).
- Parsing Canonical Form + CRC-64-AVRO fingerprint
  (reference schema.py:224-235).
"""

from __future__ import annotations

import json
import math
import re
import warnings
from dataclasses import dataclass, field
from typing import Any, Iterator, Optional, Union

PRIMITIVE_TYPES = frozenset(
    {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}
)
NAMED_TYPES = frozenset({"record", "enum", "fixed", "error"})
COMPOSITE_TYPES = frozenset({"array", "map", "union"})
RESERVED_TYPE_NAMES = PRIMITIVE_TYPES | NAMED_TYPES | COMPOSITE_TYPES

_NAME_SEGMENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

LOGICAL_TYPES = frozenset(
    {
        "decimal",
        "date",
        "time-millis",
        "time-micros",
        "timestamp-millis",
        "timestamp-micros",
        "uuid",
    }
)

# logical type -> allowed base types
_LOGICAL_BASES = {
    "decimal": {"bytes", "fixed"},
    "date": {"int"},
    "time-millis": {"int"},
    "time-micros": {"long"},
    "timestamp-millis": {"long"},
    "timestamp-micros": {"long"},
    "uuid": {"string"},
}


class SchemaParseError(ValueError):
    """Raised when a schema document is structurally invalid."""


class IgnoredLogicalType(UserWarning):
    """Unknown or invalid logicalType annotation: fall back to base type."""


def _validate_name_segment(segment: str) -> str:
    if not _NAME_SEGMENT_RE.match(segment):
        raise SchemaParseError(f"invalid Avro name segment: {segment!r}")
    return segment


def split_fullname(name: str, namespace: Optional[str], enclosing: Optional[str]) -> tuple[str, Optional[str]]:
    """Resolve (name, namespace, enclosing namespace) -> (simple name, namespace).

    A dot in ``name`` overrides any namespace attribute; an explicit
    ``namespace`` overrides the enclosing namespace.
    """
    if "." in name:
        namespace, _, name = name.rpartition(".")
    elif namespace is None:
        namespace = enclosing
    _validate_name_segment(name)
    if namespace:
        for seg in namespace.split("."):
            _validate_name_segment(seg)
    else:
        namespace = None
    return name, namespace


def make_fullname(name: str, namespace: Optional[str]) -> str:
    return f"{namespace}.{name}" if namespace else name


# ---------------------------------------------------------------------------
# Schema node types
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AvroSchema:
    """Base class for all schema nodes."""

    type: str

    @property
    def logical_type(self) -> Optional[str]:
        return None

    @property
    def fullname(self) -> str:
        return self.type

    def to_json(self) -> Any:
        """Re-serialize to an Avro JSON schema document (round-trippable)."""
        return _to_json(self, set())

    def __str__(self) -> str:  # pragma: no cover - debugging aid
        return json.dumps(self.to_json())


@dataclass(frozen=True)
class PrimitiveSchema(AvroSchema):
    logical: Optional[str] = None
    precision: int = 0
    scale: int = 0

    @property
    def logical_type(self) -> Optional[str]:
        return self.logical


# Named types use identity eq/hash: recursive records (e.g. linked lists)
# would send structural equality into infinite recursion. Use
# canonical_form() for semantic comparison.
@dataclass(frozen=True, eq=False)
class FixedSchema(AvroSchema):
    name: str = ""
    namespace: Optional[str] = None
    size: int = 0
    aliases: tuple[str, ...] = ()
    logical: Optional[str] = None
    precision: int = 0
    scale: int = 0

    @property
    def logical_type(self) -> Optional[str]:
        return self.logical

    @property
    def fullname(self) -> str:
        return make_fullname(self.name, self.namespace)


@dataclass(frozen=True, eq=False)
class EnumSchema(AvroSchema):
    name: str = ""
    namespace: Optional[str] = None
    symbols: tuple[str, ...] = ()
    default: Optional[str] = None
    aliases: tuple[str, ...] = ()
    doc: Optional[str] = None

    @property
    def fullname(self) -> str:
        return make_fullname(self.name, self.namespace)


@dataclass(frozen=True)
class Field:
    name: str
    schema: AvroSchema
    # default is stored in Avro-JSON form; _NO_DEFAULT sentinel when absent
    default: Any = None
    has_default: bool = False
    order: Optional[str] = None  # ascending | descending | ignore
    aliases: tuple[str, ...] = ()
    doc: Optional[str] = None


@dataclass(frozen=True, eq=False)
class RecordSchema(AvroSchema):
    name: str = ""
    namespace: Optional[str] = None
    fields: tuple[Field, ...] = ()
    aliases: tuple[str, ...] = ()
    doc: Optional[str] = None

    @property
    def fullname(self) -> str:
        return make_fullname(self.name, self.namespace)

    def field_map(self) -> dict[str, Field]:
        return {f.name: f for f in self.fields}


@dataclass(frozen=True)
class ArraySchema(AvroSchema):
    items: AvroSchema = field(default=None)  # type: ignore[assignment]


@dataclass(frozen=True)
class MapSchema(AvroSchema):
    values: AvroSchema = field(default=None)  # type: ignore[assignment]


@dataclass(frozen=True)
class UnionSchema(AvroSchema):
    branches: tuple[AvroSchema, ...] = ()

    @property
    def is_nullable_single(self) -> bool:
        """True for the common [null, T] / [T, null] shape."""
        non_null = [b for b in self.branches if b.type != "null"]
        return len(non_null) == 1 and len(self.branches) <= 2

    def non_null_branches(self) -> list[AvroSchema]:
        return [b for b in self.branches if b.type != "null"]


NamedSchema = Union[RecordSchema, EnumSchema, FixedSchema]


# ---------------------------------------------------------------------------
# Parsing
# ---------------------------------------------------------------------------


def parse_schema(source: Union[str, bytes, dict, list]) -> AvroSchema:
    """Parse an Avro schema from JSON text or an already-loaded document."""
    if isinstance(source, (str, bytes)):
        text = source.decode() if isinstance(source, bytes) else source
        stripped = text.strip()
        # bare primitive name shorthand: `"string"` or even `string`
        if stripped and not stripped[0] in "[{\"":
            doc: Any = stripped
        else:
            try:
                doc = json.loads(text)
            except json.JSONDecodeError as exc:
                raise SchemaParseError(f"schema is not valid JSON: {exc}") from exc
    else:
        doc = source
    names: dict[str, NamedSchema] = {}
    return _parse_node(doc, None, names)


def parse_schema_file(path: str) -> AvroSchema:
    """Parse a ``.avsc`` file (reference schema.py:1397-1402)."""
    with open(path, "r", encoding="utf-8") as fh:
        return parse_schema(fh.read())


def _parse_node(doc: Any, enclosing_ns: Optional[str], names: dict[str, NamedSchema]) -> AvroSchema:
    if isinstance(doc, str):
        if doc in PRIMITIVE_TYPES:
            return PrimitiveSchema(type=doc)
        # named-type reference: resolve against enclosing namespace
        name, ns = split_fullname(doc, None, enclosing_ns)
        for candidate in (make_fullname(name, ns), doc):
            if candidate in names:
                return names[candidate]
        raise SchemaParseError(f"unknown named type: {doc!r}")
    if isinstance(doc, list):
        return _parse_union(doc, enclosing_ns, names)
    if not isinstance(doc, dict):
        raise SchemaParseError(f"schema node must be str/list/dict, got {type(doc).__name__}")

    type_ = doc.get("type")
    if isinstance(type_, (dict, list)):
        # {"type": {...}} wrapper is legal
        return _parse_node(type_, enclosing_ns, names)
    if not isinstance(type_, str):
        raise SchemaParseError(f"missing or invalid 'type' in {doc!r}")

    if type_ in PRIMITIVE_TYPES:
        return _with_logical(PrimitiveSchema(type=type_), doc)
    if type_ == "array":
        if "items" not in doc:
            raise SchemaParseError("array schema requires 'items'")
        return ArraySchema(type="array", items=_parse_node(doc["items"], enclosing_ns, names))
    if type_ == "map":
        if "values" not in doc:
            raise SchemaParseError("map schema requires 'values'")
        return MapSchema(type="map", values=_parse_node(doc["values"], enclosing_ns, names))
    if type_ in ("record", "error"):
        return _parse_record(doc, enclosing_ns, names)
    if type_ == "enum":
        return _parse_enum(doc, enclosing_ns, names)
    if type_ == "fixed":
        return _parse_fixed(doc, enclosing_ns, names)
    # a dict whose type is a named reference, e.g. {"type": "my.Record"}
    if type_ not in RESERVED_TYPE_NAMES:
        return _parse_node(type_, enclosing_ns, names)
    raise SchemaParseError(f"unsupported schema type: {type_!r}")


def _parse_union(doc: list, enclosing_ns: Optional[str], names: dict[str, NamedSchema]) -> UnionSchema:
    branches = tuple(_parse_node(b, enclosing_ns, names) for b in doc)
    seen: set[str] = set()
    for b in branches:
        if isinstance(b, UnionSchema):
            raise SchemaParseError("unions may not immediately contain other unions")
        key = b.fullname if isinstance(b, (RecordSchema, EnumSchema, FixedSchema)) else b.type
        if key in seen:
            raise SchemaParseError(f"union has duplicate branch type: {key}")
        seen.add(key)
    return UnionSchema(type="union", branches=branches)


def _register(schema: NamedSchema, names: dict[str, NamedSchema]) -> None:
    fn = schema.fullname
    if schema.name in RESERVED_TYPE_NAMES:
        raise SchemaParseError(f"name is reserved: {schema.name!r}")
    if fn in names:
        raise SchemaParseError(f"duplicate named type: {fn}")
    names[fn] = schema


def _parse_aliases(doc: dict, namespace: Optional[str]) -> tuple[str, ...]:
    aliases = doc.get("aliases", ())
    out = []
    for a in aliases:
        if "." in a:
            out.append(a)
        else:
            out.append(make_fullname(a, namespace))
    return tuple(out)


def _parse_record(doc: dict, enclosing_ns: Optional[str], names: dict[str, NamedSchema]) -> RecordSchema:
    if "name" not in doc:
        raise SchemaParseError("record schema requires 'name'")
    name, ns = split_fullname(doc["name"], doc.get("namespace"), enclosing_ns)
    raw_fields = doc.get("fields")
    if not isinstance(raw_fields, list):
        raise SchemaParseError(f"record {name!r} requires a 'fields' list")
    # Two-phase: register a placeholder so recursive references resolve.
    # Frozen dataclasses can't be mutated, so register, parse fields, then
    # replace the registered entry with the completed record.
    placeholder = RecordSchema(type="record", name=name, namespace=ns)
    _register(placeholder, names)
    fields: list[Field] = []
    field_names: set[str] = set()
    for fdoc in raw_fields:
        if not isinstance(fdoc, dict) or "name" not in fdoc or "type" not in fdoc:
            raise SchemaParseError(f"invalid record field: {fdoc!r}")
        fname = fdoc["name"]
        _validate_name_segment(fname)
        if fname in field_names:
            raise SchemaParseError(f"duplicate field name: {fname}")
        field_names.add(fname)
        fschema = _parse_node(fdoc["type"], ns, names)
        order = fdoc.get("order")
        if order is not None and order not in ("ascending", "descending", "ignore"):
            raise SchemaParseError(f"invalid field order: {order!r}")
        fields.append(
            Field(
                name=fname,
                schema=fschema,
                default=fdoc.get("default"),
                has_default="default" in fdoc,
                order=order,
                aliases=tuple(fdoc.get("aliases", ())),
                doc=fdoc.get("doc"),
            )
        )
    record = RecordSchema(
        type="record",
        name=name,
        namespace=ns,
        fields=tuple(fields),
        aliases=_parse_aliases(doc, ns),
        doc=doc.get("doc"),
    )
    names[record.fullname] = record
    _patch_placeholder(record, placeholder)
    return record


def _patch_placeholder(record: RecordSchema, placeholder: RecordSchema) -> None:
    """Make the placeholder (already embedded in recursive fields) complete.

    Recursive schemas parse fields against a placeholder record; once the
    real field tuple is known we backfill it so identity-recursive nodes
    (e.g. a linked list) share one object.
    """
    object.__setattr__(placeholder, "fields", record.fields)
    object.__setattr__(placeholder, "aliases", record.aliases)
    object.__setattr__(placeholder, "doc", record.doc)


def _parse_enum(doc: dict, enclosing_ns: Optional[str], names: dict[str, NamedSchema]) -> EnumSchema:
    if "name" not in doc:
        raise SchemaParseError("enum schema requires 'name'")
    name, ns = split_fullname(doc["name"], doc.get("namespace"), enclosing_ns)
    symbols = doc.get("symbols")
    if not isinstance(symbols, list) or not all(isinstance(s, str) for s in symbols):
        raise SchemaParseError(f"enum {name!r} requires a list of string symbols")
    if len(set(symbols)) != len(symbols):
        raise SchemaParseError(f"enum {name!r} has duplicate symbols")
    for s in symbols:
        _validate_name_segment(s)
    default = doc.get("default")
    if default is not None and default not in symbols:
        raise SchemaParseError(f"enum default {default!r} not in symbols")
    enum = EnumSchema(
        type="enum",
        name=name,
        namespace=ns,
        symbols=tuple(symbols),
        default=default,
        aliases=_parse_aliases(doc, ns),
        doc=doc.get("doc"),
    )
    _register(enum, names)
    return enum


def _parse_fixed(doc: dict, enclosing_ns: Optional[str], names: dict[str, NamedSchema]) -> FixedSchema:
    if "name" not in doc:
        raise SchemaParseError("fixed schema requires 'name'")
    name, ns = split_fullname(doc["name"], doc.get("namespace"), enclosing_ns)
    size = doc.get("size")
    if not isinstance(size, int) or isinstance(size, bool) or size < 0:
        raise SchemaParseError(f"fixed {name!r} requires a non-negative integer size")
    fixed = FixedSchema(
        type="fixed",
        name=name,
        namespace=ns,
        size=size,
        aliases=_parse_aliases(doc, ns),
    )
    fixed = _with_logical(fixed, doc)
    _register(fixed, names)
    return fixed


def _with_logical(schema: Union[PrimitiveSchema, FixedSchema], doc: dict) -> Any:
    """Attach a logical type if valid; warn-and-fallback otherwise
    (reference schema.py:1226-1246, errors.py:55-57)."""
    lt = doc.get("logicalType")
    if lt is None:
        return schema
    base = schema.type

    def _fallback(reason: str):
        warnings.warn(f"ignoring logicalType {lt!r} on {base}: {reason}", IgnoredLogicalType)
        return schema

    if lt not in LOGICAL_TYPES:
        return _fallback("unknown logical type")
    if base not in _LOGICAL_BASES[lt]:
        return _fallback(f"not valid on base type {base}")
    if lt == "decimal":
        precision = doc.get("precision")
        scale = doc.get("scale", 0)
        if not isinstance(precision, int) or isinstance(precision, bool) or precision <= 0:
            return _fallback("decimal requires positive integer precision")
        if not isinstance(scale, int) or isinstance(scale, bool) or scale < 0 or scale > precision:
            return _fallback("decimal scale must satisfy 0 <= scale <= precision")
        if isinstance(schema, FixedSchema):
            # max precision representable in `size` bytes two's-complement
            max_prec = int(math.floor(math.log10(2) * (8 * schema.size - 1)))
            if precision > max_prec:
                return _fallback(f"precision {precision} too large for fixed({schema.size})")
            return FixedSchema(
                type="fixed",
                name=schema.name,
                namespace=schema.namespace,
                size=schema.size,
                aliases=schema.aliases,
                logical="decimal",
                precision=precision,
                scale=scale,
            )
        return PrimitiveSchema(type=base, logical="decimal", precision=precision, scale=scale)
    if isinstance(schema, FixedSchema):
        return _fallback("only decimal is valid on fixed")
    return PrimitiveSchema(type=base, logical=lt)


# ---------------------------------------------------------------------------
# Re-serialization (to_json)
# ---------------------------------------------------------------------------


def _to_json(schema: AvroSchema, seen: set[str]) -> Any:
    if isinstance(schema, PrimitiveSchema):
        if schema.logical is None:
            return schema.type
        out: dict[str, Any] = {"type": schema.type, "logicalType": schema.logical}
        if schema.logical == "decimal":
            out["precision"] = schema.precision
            out["scale"] = schema.scale
        return out
    if isinstance(schema, UnionSchema):
        return [_to_json(b, seen) for b in schema.branches]
    if isinstance(schema, ArraySchema):
        return {"type": "array", "items": _to_json(schema.items, seen)}
    if isinstance(schema, MapSchema):
        return {"type": "map", "values": _to_json(schema.values, seen)}
    if isinstance(schema, (RecordSchema, EnumSchema, FixedSchema)):
        if schema.fullname in seen:
            return schema.fullname
        seen.add(schema.fullname)
        out = {"type": schema.type, "name": schema.name}
        if schema.namespace:
            out["namespace"] = schema.namespace
        if isinstance(schema, FixedSchema):
            out["size"] = schema.size
            if schema.logical:
                out["logicalType"] = schema.logical
                if schema.logical == "decimal":
                    out["precision"] = schema.precision
                    out["scale"] = schema.scale
        elif isinstance(schema, EnumSchema):
            out["symbols"] = list(schema.symbols)
            if schema.default is not None:
                out["default"] = schema.default
        else:
            fields = []
            for f in schema.fields:
                fd: dict[str, Any] = {"name": f.name, "type": _to_json(f.schema, seen)}
                if f.has_default:
                    fd["default"] = f.default
                if f.order:
                    fd["order"] = f.order
                if f.aliases:
                    fd["aliases"] = list(f.aliases)
                fields.append(fd)
            out["fields"] = fields
        return out
    raise TypeError(f"unexpected schema node: {schema!r}")


# ---------------------------------------------------------------------------
# Parsing Canonical Form + fingerprint
# ---------------------------------------------------------------------------


def canonical_form(schema: AvroSchema) -> str:
    """Parsing Canonical Form per the Avro spec: fullnames, fixed key
    order, and only the attributes that affect the binary encoding
    (reference schema.py:224-235)."""
    return json.dumps(_canonical(schema, set()), separators=(",", ":"))


def _canonical(schema: AvroSchema, seen: set[str]) -> Any:
    if isinstance(schema, PrimitiveSchema):
        return schema.type
    if isinstance(schema, UnionSchema):
        return [_canonical(b, seen) for b in schema.branches]
    if isinstance(schema, ArraySchema):
        return {"type": "array", "items": _canonical(schema.items, seen)}
    if isinstance(schema, MapSchema):
        return {"type": "map", "values": _canonical(schema.values, seen)}
    if isinstance(schema, (RecordSchema, EnumSchema, FixedSchema)):
        if schema.fullname in seen:
            return schema.fullname
        seen.add(schema.fullname)
        out: dict[str, Any] = {"name": schema.fullname, "type": schema.type}
        if isinstance(schema, FixedSchema):
            out["size"] = schema.size
        elif isinstance(schema, EnumSchema):
            out["symbols"] = list(schema.symbols)
        else:
            out["fields"] = [
                {"name": f.name, "type": _canonical(f.schema, seen)} for f in schema.fields
            ]
        # PCF key order: name, type, fields, symbols, items, values, size
        order = ["name", "type", "fields", "symbols", "items", "values", "size"]
        return {k: out[k] for k in order if k in out}
    raise TypeError(f"unexpected schema node: {schema!r}")


_EMPTY64 = 0xC15D213AA4D7A795  # CRC-64-AVRO empty value (Avro spec)
_FP_TABLE: list[int] = []


def _fp_table() -> list[int]:
    if not _FP_TABLE:
        for i in range(256):
            fp = i
            for _ in range(8):
                fp = (fp >> 1) ^ (_EMPTY64 & -(fp & 1))
            _FP_TABLE.append(fp)
    return _FP_TABLE


def fingerprint64(schema: AvroSchema) -> int:
    """CRC-64-AVRO fingerprint of the Parsing Canonical Form (Avro spec)."""
    table = _fp_table()
    fp = _EMPTY64
    for byte in canonical_form(schema).encode("utf-8"):
        fp = (fp >> 8) ^ table[(fp ^ byte) & 0xFF]
    return fp


# ---------------------------------------------------------------------------
# Traversal helper
# ---------------------------------------------------------------------------


def walk(schema: AvroSchema) -> Iterator[AvroSchema]:
    """Yield every node of the schema tree once (cycle-safe)."""
    seen: set[int] = set()

    def go(node: AvroSchema) -> Iterator[AvroSchema]:
        if id(node) in seen:
            return
        seen.add(id(node))
        yield node
        if isinstance(node, RecordSchema):
            for f in node.fields:
                yield from go(f.schema)
        elif isinstance(node, ArraySchema):
            yield from go(node.items)
        elif isinstance(node, MapSchema):
            yield from go(node.values)
        elif isinstance(node, UnionSchema):
            for b in node.branches:
                yield from go(b)

    return go(schema)
