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
