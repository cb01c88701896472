"""q58: compaction shard planning over the documents table.

The DuckDB oracle replays the identical deterministic packing: same
md5-derived bucket, same per-bucket id-ordered cumulative byte sum,
same first-fit shard assignment — integer arithmetic end to end, so the
value hash is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_table, register
from ..operators.compaction import plan_shards

_TARGET = 8 * 1024  # small target so sf0.01 produces several shards per bucket
_BUCKETS = 16


@register(
    "q58_compaction_plan",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS b,
             CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % {_BUCKETS} AS bucket
      FROM documents
    ),
    placed AS (
      SELECT doc_id, b, bucket,
             SUM(b) OVER (PARTITION BY bucket ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS e,
             CAST(floor((SUM(b) OVER (PARTITION BY bucket ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - b) / {_TARGET}) AS BIGINT) AS shard
      FROM sized
    )
    SELECT bucket, shard, COUNT(*) AS n_docs,
           CAST(SUM(b) AS BIGINT) AS total_bytes,
           MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
    FROM placed
    GROUP BY bucket, shard
    ORDER BY bucket, shard
    """,
)
def q58_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan ~8 KiB output shards for the documents table: uniform md5
    bucket shuffle, per-bucket id-ordered cumulative sum, first-fit
    shard ids — the deterministic write-sizing pass that precedes a
    large-scale sink (shard over-fills by at most one row)."""
    docs = load_table(spark, sf_dir, "documents")
    return plan_shards(
        docs, "doc_id", F.length("text"), target_bytes=_TARGET, n_buckets=_BUCKETS
    )
