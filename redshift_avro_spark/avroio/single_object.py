"""Avro single-object encoding — fingerprint-framed messages.

The Avro specification's third framing (next to container files and
raw datums): a message = 2-byte marker ``C3 01`` + 8-byte
little-endian CRC-64-AVRO fingerprint of the writer schema's Parsing
Canonical Form + the binary-encoded datum. It is the standard wire
format for schema-registry-less streams: the reader resolves the
writer schema from the embedded fingerprint instead of a stream name
(reference glue-schema-per-stream-udf/lambda_function.py:14-27) or a
contentType header (springcloud lambda_function.py:18-69) — the
missing member of the registry-keying family those two cover.

Reuses the repo's canonical-form fingerprint (schema_model.py,
CRC-64-AVRO known-value-tested) and the compiled codecs (binary.py);
``SchemaStore`` is the fingerprint-keyed analogue of the
registry-backed caches in sources/registry.py, including reader-schema
evolution on decode.
"""

from __future__ import annotations

import struct
from typing import Any, Optional

from .binary import AvroDecodeError, decode_datum, encode_datum
from .schema_model import AvroSchema, fingerprint64, parse_schema

V1_MARKER = b"\xc3\x01"
HEADER_LEN = 10  # marker + 8-byte little-endian fingerprint


def single_object_fingerprint(schema: AvroSchema) -> bytes:
    """The 8 little-endian fingerprint bytes for ``schema``."""
    return struct.pack("<Q", fingerprint64(schema))


def encode_single_object(schema: AvroSchema, datum: Any) -> bytes:
    """Frame ``datum`` as an Avro single-object message."""
    return V1_MARKER + single_object_fingerprint(schema) + encode_datum(schema, datum)


def read_single_object_header(data: bytes) -> int:
    """Validate the framing and return the embedded fingerprint."""
    if len(data) < HEADER_LEN:
        raise AvroDecodeError(
            f"single-object message truncated: {len(data)} bytes < {HEADER_LEN}-byte header"
        )
    if data[:2] != V1_MARKER:
        raise AvroDecodeError(
            f"bad single-object marker {data[:2].hex()} (want {V1_MARKER.hex()})"
        )
    return struct.unpack("<Q", data[2:HEADER_LEN])[0]


def decode_single_object(
    schema: AvroSchema, data: bytes, reader_schema: Optional[AvroSchema] = None
) -> Any:
    """Decode a message whose writer schema is known out of band;
    the embedded fingerprint must match ``schema``'s."""
    fp = read_single_object_header(data)
    want = fingerprint64(schema)
    if fp != want:
        raise AvroDecodeError(
            f"single-object fingerprint {fp:#018x} does not match "
            f"writer schema fingerprint {want:#018x}"
        )
    return decode_datum(schema, data[HEADER_LEN:], reader_schema=reader_schema)


class SchemaStore:
    """Fingerprint-keyed writer-schema lookup — the registry-less
    counterpart of sources/registry.py's stream-name/contentType
    caches. Register every schema version a stream may carry; decode
    resolves the writer by embedded fingerprint and (optionally)
    evolves to ``reader_schema``."""

    def __init__(self) -> None:
        self._by_fp: dict[int, AvroSchema] = {}

    def register(self, schema) -> int:
        if isinstance(schema, (str, dict)):
            schema = parse_schema(schema)
        fp = fingerprint64(schema)
        self._by_fp[fp] = schema
        return fp

    def get(self, fp: int) -> AvroSchema:
        try:
            return self._by_fp[fp]
        except KeyError:
            raise AvroDecodeError(
                f"unknown writer schema fingerprint {fp:#018x}: "
                f"{len(self._by_fp)} registered"
            ) from None

    def decode(self, data: bytes, reader_schema: Optional[AvroSchema] = None) -> Any:
        writer = self.get(read_single_object_header(data))
        return decode_datum(writer, data[HEADER_LEN:], reader_schema=reader_schema)
