"""The Redshift scalar-UDF invocation protocol (SURVEY §1.1, §2.7).

Redshift ships UDF calls as JSON batches::

    {"request_id": ..., "num_records": N, "arguments": [[arg, ...], ...]}

and expects ``{"success": true, "num_records": N, "results": [...]}`` or
``{"success": false, "error_msg": ...}`` (avro-file-udf/
lambda_function.py:9-30, payload.json:1-10).

This module provides drop-in handlers with the same envelope, so a user
of the reference's Lambda functions can point Redshift at these (or run
them anywhere) — each is ~the reference handler re-implemented over our
codec:

- :func:`container_file_handler` — avro-file-udf/lambda_function.py:8-30
  (each cell = hex container file → JSON list of records). The reference
  returns the JSON string wrapped in ``list()`` by accident (Appendix
  A.7 — a list of single characters); this returns the JSON string.
- :func:`registry_datum_handler` — glue-schema-per-stream-udf/
  lambda_function.py:45-56 (cell = [stream_name, hex raw datum], schema
  from a registry). Returns a JSON *string* envelope like the original.
- :func:`make_lambda_handler` — generic: plug any per-row decode.

Error semantics: the whole batch fails with ``success: false``, matching
the reference's all-or-nothing try/except. (The Spark pipeline improves
on this with PERMISSIVE per-row nulls; this module is the protocol-
compatibility surface.)
"""

from __future__ import annotations

import json
from typing import Any, Callable, Optional, Union

from ..avroio.binary import BinaryReader, compile_decoder
from ..avroio.container import iter_container
from ..avroio.jsonio import datum_to_jsonable
from .registry import SchemaRegistry


def _success(results: list, num_records: int) -> dict:
    return {"success": True, "num_records": num_records, "results": results}


def _failure(error: Exception) -> dict:
    return {"success": False, "error_msg": f"Error processing Lambda event. Error: {error}"}


def make_lambda_handler(
    decode_row: Callable[[list], Any], as_json_string: bool = False
) -> Callable[[dict, Any], Union[dict, str]]:
    """Build a Redshift-batch handler from a per-row decode function.

    ``decode_row`` receives the row's argument list and returns the
    result value for that row."""

    def handler(event: dict, context: Any = None) -> Union[dict, str]:
        try:
            results = [decode_row(args) for args in event["arguments"]]
            envelope = _success(results, event["num_records"])
        except Exception as exc:  # all-or-nothing batch, like the reference
            envelope = _failure(exc)
        return json.dumps(envelope) if as_json_string else envelope

    return handler


def container_file_handler(event: dict, context: Any = None) -> dict:
    """Cell = hex-encoded Avro container file → JSON string of the
    record list (reference avro-file-udf/lambda_function.py:8-30,
    minus its list() bug)."""

    def decode_row(args: list) -> str:
        data = bytes.fromhex(args[0])
        return json.dumps([datum_to_jsonable(d) for d in iter_container(data)])

    return make_lambda_handler(decode_row)(event, context)  # type: ignore[return-value]


def registry_datum_handler(
    registry: SchemaRegistry,
) -> Callable[[dict, Any], str]:
    """Cell = [stream_name, hex raw datum]; schema fetched from the
    registry by stream name (reference glue-schema-per-stream-udf/
    lambda_function.py:30-56). Returns the JSON-string envelope like the
    original."""
    decoders: dict[str, Callable] = {}

    def decode_row(args: list) -> str:
        stream_name, hex_data = args[0], args[1]
        fn = decoders.get(stream_name)
        if fn is None:
            fn = compile_decoder(registry.get_schema(stream_name))
            decoders[stream_name] = fn
        datum = fn(BinaryReader(bytes.fromhex(hex_data)))
        return json.dumps(datum_to_jsonable(datum))

    return make_lambda_handler(decode_row, as_json_string=True)


def spring_kpl_handler(
    registry: SchemaRegistry,
) -> Callable[[dict, Any], str]:
    """Cell = hex(KPL aggregate of Spring-headered Avro datums); the
    three-envelope unwrap of SURVEY §3.3 (springcloud-lambda-udf/
    lambda_function.py:209-215)."""
    from .envelopes import kpl_sub_payloads, parse_spring_message

    decoders: dict[str, Callable] = {}

    def decode_row(args: list) -> str:
        records = []
        for sub in kpl_sub_payloads(bytes.fromhex(args[0])):
            headers, body = parse_spring_message(sub)
            content_type = headers["contentType"]
            fn = decoders.get(content_type)
            if fn is None:
                fn = compile_decoder(registry.get_schema(content_type))
                decoders[content_type] = fn
            records.append(datum_to_jsonable(fn(BinaryReader(body))))
        return json.dumps(records)

    return make_lambda_handler(decode_row, as_json_string=True)
