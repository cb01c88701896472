"""Multimodal-column queries: binary payloads + typed metadata.

q40 exercises the JVM-side metadata path (filters/pruning never touch
payload bytes) with a full DuckDB oracle; q41 exercises the
Arrow-batched ``mapInPandas`` feature-extraction plumbing with the
deterministic fake decoder (media libs absent by design — SURVEY §7.4),
so it has no SQL oracle and takes the driver's rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_table, register
from ..operators.multimodal import attach_payload_metadata, extract_payload_features


@register(
    "q40_payload_metadata",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS n_bytes,
           hex(substring(text, 1, 4)) AS magic_hex,
           md5(text) AS digest
    FROM documents ORDER BY doc_id
    """,
)
def q40_payload_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column (UTF-8 document bytes standing in for
    image/audio blobs) + sibling metadata struct computed JVM-side:
    size, magic prefix, content digest."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    with_meta = attach_payload_metadata(docs, "payload")
    return with_meta.select(
        "doc_id",
        F.col("payload_meta.n_bytes").alias("n_bytes"),
        F.col("payload_meta.magic_hex").alias("magic_hex"),
        F.col("payload_meta.digest").alias("digest"),
    ).orderBy("doc_id")


@register(
    "q41_payload_features",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS n_bytes,
           CAST(1 + (CASE WHEN length(text) >= 1 THEN ascii(substring(text, 1, 1)) ELSE 0 END) % 64 AS INTEGER) AS width,
           CAST(1 + (CASE WHEN length(text) >= 2 THEN ascii(substring(text, 2, 1)) ELSE 0 END) % 64 AS INTEGER) AS height,
           CAST(1 + (CASE WHEN length(text) >= 3 THEN ascii(substring(text, 3, 1)) ELSE 0 END) % 4 AS INTEGER) AS channels,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE list_aggregate(list_transform(generate_series(1, length(text)),
                       i -> ascii(substring(text, i, 1))), 'sum') / CAST(length(text) AS DOUBLE)
           END AS mean_pixel
    FROM documents ORDER BY doc_id
    """,
)
def q41_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the real 100 TB decode pattern (batch in, batch
    out, narrow map stage); inner decode is the deterministic fake,
    whose byte arithmetic the DuckDB oracle replicates with ascii()
    over the same (ASCII) document text — upgrading q41 from the
    rows-only check to a full value-hash row. The integer byte sum is
    exact in both engines, so the single float division is bit-stable."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return extract_payload_features(docs, "doc_id", "payload", fake=True).orderBy("doc_id")
