"""Multimodal columns: image/audio/video as opaque binary + metadata.

The Spark-side plumbing is real and tested — binary payload columns,
typed metadata structs, Arrow-batched feature extraction over
``mapInPandas`` with stable batch shapes — while the actual media
decode is STUBBED: the container has no image/audio libraries, so
:func:`decode_image_stub` raises ``NotImplementedError`` unless a
deterministic fake is requested. At 100 TB the pattern is: payloads
stay in binary columns (never exploded into Python objects), metadata
travels in sibling struct columns for pruning/filtering, and decode
happens once per batch inside Arrow workers.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "attach_payload_metadata",
    "decode_image_stub",
    "extract_payload_features",
    "PAYLOAD_FEATURE_SCHEMA",
]


def attach_payload_metadata(df: DataFrame, payload_col: str) -> DataFrame:
    """Sibling metadata struct for a binary payload column: size, magic
    prefix, and a content digest — all JVM-side, so filters on metadata
    prune without touching payload bytes."""
    return df.withColumn(
        f"{payload_col}_meta",
        F.struct(
            F.length(payload_col).alias("n_bytes"),
            F.hex(F.substring(payload_col, 1, 4)).alias("magic_hex"),
            F.md5(payload_col).alias("digest"),
        ),
    )


def decode_image_stub(data: bytes, fake: bool = False) -> dict:
    """Decode an image payload. STUB: no image libraries in this
    runtime (by design — see module doc). With ``fake=True`` returns a
    deterministic fake decode so pipelines can be tested end-to-end."""
    if not fake:
        raise NotImplementedError(
            "image decode needs an imaging library not present in this "
            "runtime; pass fake=True for the deterministic test double"
        )
    h = data[:8].ljust(8, b"\x00")
    return {
        "width": 1 + h[0] % 64,
        "height": 1 + h[1] % 64,
        "channels": 1 + h[2] % 4,
        "mean_pixel": (sum(data) / len(data)) if data else 0.0,
    }


PAYLOAD_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def extract_payload_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", fake: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The mapInPandas shape is the real production pattern (batch in,
    batch out, no row-at-a-time serde); only the inner decode is the
    stub. Output partitioning follows the input — a narrow map stage."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_stub(bytes(b), fake=fake) for b in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "n_bytes", [len(bytes(b)) for b in pdf[payload_col]])
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out[[f.name for f in PAYLOAD_FEATURE_SCHEMA.fields]]

    return df.select(id_col, payload_col).mapInPandas(extract, PAYLOAD_FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    width: int = 224,
    height: int = 224,
    fake: bool = True,
) -> DataFrame:
    """Image resize over binary payloads (mapInPandas batch shape).

    STUB decode/resample (no imaging libs in this runtime): the fake
    produces a deterministic digest-stamped payload of the target size
    metadata so the pipeline shape — batch in, binary batch out, narrow
    stage — is fully exercised."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for b in pdf[payload_col]:
                if not fake:
                    raise NotImplementedError("imaging library not present in runtime")
                raw = bytes(b)
                out_payloads.append(raw[: width * height % max(len(raw), 1)] or raw[:1])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "resized": out_payloads,
                    "out_width": width,
                    "out_height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n_bytes: int = 64,
    max_frames: int = 8,
    fake: bool = True,
) -> DataFrame:
    """Frame sampling from a video-like binary payload: one output ROW
    per sampled frame (fan-out inside mapInPandas — the U4 'one cell →
    N records' shape applied to media). The fake 'codec' slices the
    payload at fixed strides; a real decoder would seek keyframes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf[id_col], pdf[payload_col]):
                if not fake:
                    raise NotImplementedError("video codec not present in runtime")
                raw = bytes(b)
                for i in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(raw[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_index": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(run, FRAME_SCHEMA)


SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("seg_index", T.IntegerType()),
        T.StructField("start_frame", T.IntegerType()),
        T.StructField("end_frame", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("energy", T.LongType()),
    ]
)


def segment_audio(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    frame_bytes: int = 32,
    threshold: int = 96,
) -> DataFrame:
    """VAD-style segmentation of audio payloads: frame the byte stream
    (``frame_bytes`` samples/frame, uint8 PCM stand-in — real decode is
    env-stubbed like the image path), mark frames whose mean amplitude
    reaches ``threshold`` as active (exact integer compare:
    ``energy >= threshold * frame_len``), and merge consecutive active
    frames into segments — the silence-trimming prep an audio training
    pipeline runs before feature extraction.

    Whole pipeline is one narrow ``mapInPandas`` stage: framing is a
    numpy reshape, energies one vectorized row-sum, and the
    gaps-and-islands merge is per-document (numpy diff on active
    indices) — segmentation never needs a shuffle because segments
    cannot cross document boundaries. 100 TB: scales with input bytes,
    zero exchanges."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "seg_index", "start_frame", "end_frame", "n_frames", "energy")}
            for doc_id, raw in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(raw or b"")
                if not raw:
                    continue
                a = np.frombuffer(raw, dtype=np.uint8)
                n_frames = -(-len(a) // frame_bytes)
                padded = np.zeros(n_frames * frame_bytes, dtype=np.int64)
                padded[: len(a)] = a
                energies = padded.reshape(n_frames, frame_bytes).sum(axis=1)
                flens = np.full(n_frames, frame_bytes, dtype=np.int64)
                flens[-1] = len(a) - (n_frames - 1) * frame_bytes
                active = np.flatnonzero(energies >= threshold * flens)
                if len(active) == 0:
                    continue
                # split runs of consecutive active frame indices
                cuts = np.flatnonzero(np.diff(active) > 1) + 1
                for si, run_ix in enumerate(np.split(active, cuts), start=1):
                    out["doc_id"].append(doc_id)
                    out["seg_index"].append(si)
                    out["start_frame"].append(int(run_ix[0]))
                    out["end_frame"].append(int(run_ix[-1]))
                    out["n_frames"].append(len(run_ix))
                    out["energy"].append(int(energies[run_ix].sum()))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, SEGMENT_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("sig", T.LongType())]
)

# 4-point Hadamard matrix (±1) — the Walsh-Hadamard transform replaces
# pHash's DCT so every coefficient is an exact ±sum of pixel bytes
# (integer, engine-portable; cos() would be libm-dependent)
_H4 = ((1, 1, 1, 1), (1, -1, 1, -1), (1, 1, -1, -1), (1, -1, -1, 1))


def perceptual_hash(data: bytes) -> int:
    """15-bit perceptual signature of a binary payload.

    A 4×4 'pixel' block is sampled at the strided byte offsets
    (k+1)·n div 17 (spread over the WHOLE payload, so shared prefixes
    don't collide), transformed with the integer Walsh-Hadamard
    transform, and the 15 AC coefficients contribute one sign bit
    each (coefficient > 0). Pure integer arithmetic — the DuckDB
    oracle rebuilds the identical 256-term ±byte sums."""
    n = len(data)
    px = [data[(k + 1) * n // 17] if n else 0 for k in range(16)]
    sig = 0
    for i in range(4):
        for j in range(4):
            if i == 0 and j == 0:
                continue
            c = 0
            for x in range(4):
                for y in range(4):
                    c += _H4[i][x] * _H4[j][y] * px[4 * x + y]
            if c > 0:
                sig |= 1 << (4 * i + j - 1)
    return sig


def perceptual_hash_signatures(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, sig) via Arrow-batched ``mapInPandas`` — the image-hash
    shape of the multimodal decode pattern (batch in, batch out,
    narrow stage; a real deployment swaps :func:`perceptual_hash` for
    a pHash over decoded pixels — same plumbing, same key)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "sig": [perceptual_hash(bytes(b)) for b in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, PHASH_SCHEMA)
