"""Datum ↔ JSON conversion.

Covers two reference behaviors:

1. The UDF output contract K1 — ``json.dumps`` of the decoded datum
   (reference avro-file-udf/lambda_function.py:15-21,
   glue-schema-per-stream-udf/lambda_function.py:42, python-udf/udf.py:9).
   ``datum_to_json`` reproduces that, with well-defined conversions for
   the typed values the reference never exercised (bytes → ISO-8859-1
   text per the Avro JSON spec, temporal → ISO strings, Decimal → number
   when lossless else string).

2. Default-value materialization C7 — Avro-JSON default → typed value
   (reference io.py:1045-1100): ``jsonable_to_datum``.
"""

from __future__ import annotations

import datetime as dt
import json
import math
from decimal import Decimal
from typing import Any

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

_EPOCH_UTC = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
_EPOCH_DATE = dt.date(1970, 1, 1)


def datum_to_jsonable(value: Any) -> Any:
    """Decoded datum → JSON-serializable structure (schema-free)."""
    if value is None or isinstance(value, (bool, int, str)):
        return value
    if isinstance(value, float):
        if math.isnan(value) or math.isinf(value):
            return str(value)
        return value
    if isinstance(value, (bytes, bytearray)):
        # Avro JSON encoding: bytes as ISO-8859-1 text
        return bytes(value).decode("iso-8859-1")
    if isinstance(value, Decimal):
        f = float(value)
        return f if Decimal(str(f)) == value else str(value)
    if isinstance(value, dt.datetime):
        return value.isoformat()
    if isinstance(value, (dt.date, dt.time)):
        return value.isoformat()
    if isinstance(value, dict):
        return {k: datum_to_jsonable(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [datum_to_jsonable(v) for v in value]
    return str(value)


def datum_to_json(value: Any, **dumps_kwargs: Any) -> str:
    """The reference's K1 contract: decoded datum as a JSON string."""
    return json.dumps(datum_to_jsonable(value), **dumps_kwargs)


def jsonable_to_datum(schema: AvroSchema, value: Any) -> Any:
    """Avro-JSON value (e.g. a field default) → typed in-memory datum."""
    if isinstance(schema, PrimitiveSchema):
        t, lt = schema.type, schema.logical
        if t == "null":
            return None
        if t == "boolean":
            return bool(value)
        if lt == "decimal":
            # spec: decimal default over bytes is an ISO-8859-1 string
            if isinstance(value, str):
                unscaled = int.from_bytes(value.encode("iso-8859-1"), "big", signed=True)
                return Decimal(unscaled).scaleb(-schema.scale)
            return Decimal(str(value))
        if lt == "date":
            return _EPOCH_DATE + dt.timedelta(days=int(value))
        if lt == "time-millis":
            return _ms_time(int(value))
        if lt == "time-micros":
            return _us_time(int(value))
        if lt == "timestamp-millis":
            return _EPOCH_UTC + dt.timedelta(milliseconds=int(value))
        if lt == "timestamp-micros":
            return _EPOCH_UTC + dt.timedelta(microseconds=int(value))
        if t in ("int", "long"):
            return int(value)
        if t in ("float", "double"):
            return float(value)
        if t == "bytes":
            return value.encode("iso-8859-1") if isinstance(value, str) else bytes(value)
        return str(value)  # string / uuid
    if isinstance(schema, FixedSchema):
        if schema.logical == "decimal" and not isinstance(value, str):
            return Decimal(str(value))
        raw = value.encode("iso-8859-1") if isinstance(value, str) else bytes(value)
        if schema.logical == "decimal":
            unscaled = int.from_bytes(raw, "big", signed=True)
            return Decimal(unscaled).scaleb(-schema.scale)
        return raw
    if isinstance(schema, EnumSchema):
        return str(value)
    if isinstance(schema, ArraySchema):
        return [jsonable_to_datum(schema.items, v) for v in (value or [])]
    if isinstance(schema, MapSchema):
        return {k: jsonable_to_datum(schema.values, v) for k, v in (value or {}).items()}
    if isinstance(schema, UnionSchema):
        # defaults validate against the FIRST branch (Avro spec)
        return jsonable_to_datum(schema.branches[0], value)
    if isinstance(schema, RecordSchema):
        out = {}
        value = value or {}
        for f in schema.fields:
            if f.name in value:
                out[f.name] = jsonable_to_datum(f.schema, value[f.name])
            elif f.has_default:
                out[f.name] = jsonable_to_datum(f.schema, f.default)
            else:
                out[f.name] = None
        return out
    raise TypeError(f"unexpected schema node: {schema!r}")


def _ms_time(ms: int) -> dt.time:
    s, ms = divmod(ms, 1000)
    m, s = divmod(s, 60)
    h, m = divmod(m, 60)
    return dt.time(h, m, s, ms * 1000)


def _us_time(us: int) -> dt.time:
    s, us = divmod(us, 1_000_000)
    m, s = divmod(s, 60)
    h, m = divmod(m, 60)
    return dt.time(h, m, s, us)
