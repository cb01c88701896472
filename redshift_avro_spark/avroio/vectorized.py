"""Vectorized (numpy) Avro batch decoder for flat record schemas.

The exec-generated per-datum decoder (:mod:`codegen`) costs ~2.9 µs/row
on a realistic mixed schema, and profiling shows ~60 % of that is the
pure Python *offset walk* (byte-at-a-time varint loops + slicing), not
object construction (strings decode at ~80 ns/row; pandas/Arrow
conversion is ~0). So the next win is not "bulk strings" but removing
the per-row walk entirely.

This module decodes WHOLE BLOB BATCHES with numpy array passes (the
raw-datum path: one Avro datum per cell — the reference's Redshift
streaming-ingestion shape, README.md:12):

- All blobs are joined into one contiguous ``uint8`` buffer; per-row
  cursors live in an int64 ``pos`` array.
- Varints decode as an iterative frontier: each pass reads ONE byte for
  every still-continuing row (``arr[pos]``), accumulates ``(b & 0x7f)
  << shift`` and advances — a 1-byte varint costs one vector pass, so a
  field costs ~max-encoded-length passes over ever-shrinking frontiers
  instead of n Python byte loops.
- Strings/bytes gather their scattered value runs with ONE fancy-index
  (``repeat(starts, lens) + ramp``) into a contiguous values buffer and
  become Arrow ``StringArray``/``BinaryArray`` via ``from_buffers`` —
  no per-value Python object anywhere; pandas gets zero-copy ArrowDtype
  columns that Spark's pandas-UDF serializer converts straight back to
  Arrow.
- Doubles/floats gather ``pos[:, None] + arange(width)`` and
  reinterpret the bytes.

Anything the vector path can't express — nested types, logical types
other than raw-int timestamps, multi-branch unions, malformed or
invalid-UTF-8 input (caught by Arrow's full validation), timestamps
outside datetime's range — raises :class:`VectorFallback` and the
caller re-decodes the batch with the generated per-datum decoder,
which owns exact per-row error semantics (PERMISSIVE nulls, typed
errors). A vector-path surprise therefore degrades to slower, never to
wrong — the same safety ladder codegen sits on (codegen → closures).

Measured on the 6-field Event schema (3 varints, ts, string, double,
nullable string), 100k rows: generated decoder ~2.9 µs/row end-to-end
vs vectorized ~0.3 µs/row; differential correctness pins live in
tests/test_vectorized_decoder.py.
"""

from __future__ import annotations

import json  # noqa: F401  (kept for parity with sibling codec modules)
from functools import lru_cache
from typing import Optional

import numpy as np

from .schema_model import (
    AvroSchema,
    PrimitiveSchema,
    RecordSchema,
    UnionSchema,
    parse_schema,
)

__all__ = ["VectorFallback", "VectorizedBlobDecoder", "get_vector_decoder"]

_TS_MIN_US = -62135596800000000
_TS_MAX_US = 253402300799999999

_SIMPLE = {"boolean", "int", "long", "float", "double", "bytes", "string"}


class VectorFallback(Exception):
    """Batch can't be vector-decoded (unsupported shape or anomalous
    data); caller must use the per-datum path."""


def _field_plan(s: AvroSchema):
    """(kind, nullable, null_branch_index) or None if unsupported.

    kind ∈ {boolean,int,long,float,double,bytes,string,ts_us,ts_ms}."""
    nullable = False
    null_idx = -1
    if isinstance(s, UnionSchema):
        branches = s.branches
        if len(branches) != 2:
            return None
        kinds = [getattr(b, "type", None) for b in branches]
        if "null" not in kinds:
            return None
        null_idx = kinds.index("null")
        s = branches[1 - null_idx]
        nullable = True
    if not isinstance(s, PrimitiveSchema):
        return None
    if s.logical == "timestamp-micros":
        kind = "ts_us"
    elif s.logical == "timestamp-millis":
        kind = "ts_ms"
    elif s.logical is None and s.type in _SIMPLE:
        kind = s.type
    else:
        return None
    if nullable and kind in ("ts_us", "ts_ms"):
        # nullable raw-int ts would need null weaving through the M8
        # view; rare enough to leave to the generated path
        return None
    return kind, nullable, null_idx


class VectorizedBlobDecoder:
    """Vector decoder for one eligible flat record schema. Stateless —
    all cursor state is threaded explicitly, so instances are safe to
    share across tasks/threads (they are lru-cached per schema)."""

    def __init__(self, fields) -> None:
        self.fields = fields  # [(name, kind, nullable, null_idx), ...]
        self.names = [f[0] for f in fields]

    # -- primitives (all take/return explicit cursor state) -----------

    @staticmethod
    def _varint(arr, pos, ends, sel):
        """Zigzag varint for rows in index array ``sel``; returns
        (int64 values aligned with sel, advanced full pos array)."""
        m = len(sel)
        val = np.zeros(m, dtype=np.uint64)
        shift = np.zeros(m, dtype=np.uint64)
        p = pos[sel].copy()
        row_end = ends[sel]
        frontier = np.arange(m)
        while frontier.size:
            pf = p[frontier]
            if (pf >= row_end[frontier]).any():
                raise VectorFallback("truncated varint")
            b = arr[pf].astype(np.uint64)
            val[frontier] |= (b & np.uint64(0x7F)) << shift[frontier]
            shift[frontier] += np.uint64(7)
            p[frontier] += 1
            frontier = frontier[(b & np.uint64(0x80)) != 0]
            if frontier.size and int(shift[frontier].max()) > 70:
                raise VectorFallback("varint too long")
        x = (val >> np.uint64(1)) ^ (np.uint64(0) - (val & np.uint64(1)))
        out = x.view(np.int64)
        new_pos = pos.copy()
        new_pos[sel] = p
        return out, new_pos

    @staticmethod
    def _fixed(arr, pos, ends, sel, width, dtype):
        p = pos[sel]
        if ((p + width) > ends[sel]).any():
            raise VectorFallback("truncated fixed-width")
        idx = p[:, None] + np.arange(width, dtype=np.int64)
        vals = np.ascontiguousarray(arr[idx]).view(dtype).ravel()
        new_pos = pos.copy()
        new_pos[sel] = p + width
        return vals, new_pos

    @classmethod
    def _length_delimited(cls, arr, pos, ends, sel):
        """Returns (starts, lens aligned with sel, advanced pos)."""
        lens, pos = cls._varint(arr, pos, ends, sel)
        if len(lens) and (lens < 0).any():
            raise VectorFallback("negative length")
        starts = pos[sel]
        if len(lens) and ((starts + lens) > ends[sel]).any():
            raise VectorFallback("truncated bytes/string")
        new_pos = pos.copy()
        new_pos[sel] = starts + lens
        return starts, lens, new_pos

    @staticmethod
    def _gather_runs(arr, starts, lens):
        """Concatenate value runs [starts[i], starts[i]+lens[i]) into
        one contiguous buffer + int32 offsets — fully vectorized.

        Output position k inside run i maps to source index
        ``starts[i] + (k - offsets[i])``, so the whole gather index is
        ONE repeat of the per-run bias (starts − offsets) plus one
        global ramp — two total-size allocations instead of three."""
        total = int(lens.sum()) if len(lens) else 0
        offsets = np.zeros(len(lens) + 1, dtype=np.int32)
        if len(lens):
            np.cumsum(lens, out=offsets[1:])
        if total == 0:
            return offsets, np.empty(0, dtype=np.uint8)
        bias = starts - offsets[:-1].astype(np.int64)
        idx = np.repeat(bias, lens)
        idx += np.arange(total, dtype=np.int64)
        return offsets, arr[idx]

    # -- per-column ----------------------------------------------------

    def _decode_value(self, pa, arr, pos, ends, sel, kind, n):
        """Decode one value per row in ``sel``; returns (pa.Array of
        length n with nulls off-sel, advanced pos)."""

        def scatter(vals_sel, pa_type, np_dtype):
            full = np.zeros(n, dtype=np_dtype)
            full[sel] = vals_sel
            mask = np.zeros(n, dtype=bool)
            mask[sel] = True
            return pa.array(full, type=pa_type, mask=~mask)

        if kind in ("int", "long", "ts_us", "ts_ms"):
            vals, pos = self._varint(arr, pos, ends, sel)
            if kind == "int":
                if len(vals) and (
                    (vals > 2147483647) | (vals < -2147483648)
                ).any():
                    raise VectorFallback("int out of range")
                return scatter(vals, pa.int32(), np.int64), pos
            if kind == "long":
                return scatter(vals, pa.int64(), np.int64), pos
            lo, hi = (
                (_TS_MIN_US, _TS_MAX_US)
                if kind == "ts_us"
                else (_TS_MIN_US // 1000, _TS_MAX_US // 1000)
            )
            if len(vals) and (int(vals.min()) < lo or int(vals.max()) > hi):
                raise VectorFallback("timestamp outside datetime range")
            unit = "us" if kind == "ts_us" else "ms"
            return scatter(vals, pa.timestamp(unit), np.int64), pos
        if kind == "boolean":
            p = pos[sel]
            if len(p) and (p >= ends[sel]).any():
                raise VectorFallback("truncated boolean")
            vals = arr[p] > 0
            new_pos = pos.copy()
            new_pos[sel] = p + 1
            return scatter(vals, pa.bool_(), bool), new_pos
        if kind == "float":
            vals, pos = self._fixed(arr, pos, ends, sel, 4, "<f4")
            return scatter(vals, pa.float32(), np.float32), pos
        if kind == "double":
            vals, pos = self._fixed(arr, pos, ends, sel, 8, "<f8")
            return scatter(vals, pa.float64(), np.float64), pos
        if kind in ("bytes", "string"):
            starts, lens_sel, pos = self._length_delimited(arr, pos, ends, sel)
            offsets, values = self._gather_runs(arr, starts, lens_sel)
            typ = pa.utf8() if kind == "string" else pa.binary()
            dense = pa.Array.from_buffers(
                typ,
                len(sel),
                [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(values.tobytes())],
            )
            if kind == "string":
                try:
                    dense.validate(full=True)  # UTF-8 parity with .decode
                except pa.ArrowInvalid as exc:
                    raise VectorFallback(f"invalid utf-8: {exc}") from None
            # re-expand the dense (valid-rows-only) child to length n
            take_idx = np.full(n, 0, dtype=np.int64)
            take_idx[sel] = np.arange(len(sel), dtype=np.int64)
            mask = np.ones(n, dtype=bool)
            mask[sel] = False
            idx_arr = pa.array(take_idx, type=pa.int64(), mask=mask)
            return dense.take(idx_arr), pos
        raise VectorFallback(f"unsupported kind {kind}")  # pragma: no cover

    # -- whole batch ---------------------------------------------------

    def decode_blobs_arrow(self, blobs, null_mask=None):
        """blobs (sequence of bytes-like / None) → dict name →
        pyarrow.Array (length n; None blobs → null in every column).
        ``null_mask`` (bool array, True = null cell) skips the
        per-blob None scan when the caller already has one (pandas
        ``Series.isna()`` computes it at C speed).

        Raises VectorFallback on anything the vector path can't decode
        exactly."""
        import pyarrow as pa

        n = len(blobs)
        if null_mask is None:
            null_mask = np.fromiter(
                (b is None for b in blobs), dtype=bool, count=n
            )
        present = ~null_mask
        if null_mask.any():
            parts = [b for b, ok in zip(blobs, present) if ok]
            lens = np.zeros(n, dtype=np.int64)
            lens[present] = np.fromiter(
                map(len, parts), dtype=np.int64, count=len(parts)
            )
        else:
            parts = blobs if isinstance(blobs, list) else list(blobs)
            lens = np.fromiter(map(len, parts), dtype=np.int64, count=n)
        data = b"".join(parts)
        arr = np.frombuffer(data, dtype=np.uint8)
        ends = np.zeros(n, dtype=np.int64)
        np.cumsum(lens, out=ends)
        pos = ends - lens  # per-row start offsets (empty span if None)
        live = np.flatnonzero(present)

        out = {}
        for name, kind, nullable, null_idx in self.fields:
            sel = live
            if nullable:
                branch, pos = self._varint(arr, pos, ends, sel)
                nn = 1 - null_idx
                if len(branch) and (
                    ~((branch == null_idx) | (branch == nn))
                ).any():
                    raise VectorFallback("unknown union branch")
                sel = sel[branch == nn]
            out[name], pos = self._decode_value(pa, arr, pos, ends, sel, kind, n)
        return out

    def decode_blobs_to_pandas(self, blobs, null_mask=None):
        """blobs → dict name → pandas Series with EXACTLY the dtypes
        the generated decoder's ``to_pandas`` produces (numpy
        int64/float/bool and M8 for non-null columns, object-with-None
        for anything nullable, object str/bytes for text): downstream
        consumers — including a chained re-encode UDF — must not be
        able to tell which decode path ran. ArrowDtype output was
        measured marginally faster but leaks pd.NA into consumers."""
        import pandas as pd

        arrays = self.decode_blobs_arrow(blobs, null_mask)
        kinds = {f[0]: (f[1], f[2]) for f in self.fields}
        out = {}
        for name, a in arrays.items():
            kind, nullable = kinds[name]
            has_null = a.null_count > 0
            if kind in ("string", "bytes"):
                # object array of str/bytes with None — same as the
                # per-datum path's .decode()/slice output
                out[name] = pd.Series(a.to_pandas(), dtype=object)
            elif has_null or nullable:
                # exact values with None (to_numpy would go float64 and
                # lose int precision past 2^53)
                out[name] = pd.Series(a.to_pylist(), dtype=object)
            else:
                out[name] = pd.Series(a.to_numpy(zero_copy_only=False))
        return out


def _build(schema: AvroSchema) -> Optional[VectorizedBlobDecoder]:
    if not isinstance(schema, RecordSchema) or not schema.fields:
        return None
    plans = []
    for f in schema.fields:
        p = _field_plan(f.schema)
        if p is None:
            return None
        plans.append((f.name, *p))
    return VectorizedBlobDecoder(plans)


@lru_cache(maxsize=256)
def get_vector_decoder(schema_json: str) -> Optional[VectorizedBlobDecoder]:
    """Vector decoder for an eligible flat record schema, else None
    (caller uses the generated per-datum decoder)."""
    try:
        return _build(parse_schema(schema_json))
    except Exception:  # noqa: BLE001 — never break the decode path
        return None
