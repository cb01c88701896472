"""Compaction planning: bin-pack rows into target-size output shards.

The write-side primitive a 100 TB pipeline needs next to its operators:
parquet/Avro sinks degrade badly when output files are tiny (NameNode/
listing pressure, per-file open cost) or huge (no read parallelism), so
a writer plans shards of ~``target_bytes`` before `partitionBy`-free
writes. The plan here is fully deterministic and engine-portable, so it
carries an exact DuckDB oracle:

1. hash rows into ``n_buckets`` uniform buckets (md5 of the id — no
   skew, mirrors the LSH/band-key trick used across this repo);
2. inside each bucket, order by id and run a cumulative byte sum
   (one shuffle on bucket, per-bucket sort — never a global sort);
3. a row's shard is ``floor(start_offset / target_bytes)`` — the
   classic first-fit-by-offset packing, which over-fills a shard by at
   most one row.

At 1000 executors each bucket packs independently; ``n_buckets``
bounds per-task sort size, and the emitted (bucket, shard) pair is the
write task's natural partition key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["bucket_key", "plan_shards"]


def bucket_key(id_col: str, n_buckets: int) -> Column:
    """Uniform md5-derived bucket for an id column (portable: DuckDB
    derives the identical value from the same hex prefix)."""
    return F.expr(
        f"CAST(conv(substring(md5(CAST({id_col} AS STRING)), 1, 8), 16, 10) AS BIGINT) % {n_buckets}"
    )


def plan_shards(
    df: DataFrame,
    id_col: str,
    bytes_col: Column,
    target_bytes: int,
    n_buckets: int = 16,
) -> DataFrame:
    """Shard plan: one row per (bucket, shard) with packing stats.

    ``bytes_col`` is the per-row payload size (any integer expression).
    Returns (bucket, shard, n_docs, total_bytes, first_id, last_id)
    where ``shard`` numbers first-fit bins of ``target_bytes`` within
    the bucket's id-ordered stream."""
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = df.select(
        F.col(id_col),
        bytes_col.cast("bigint").alias("__bytes"),
        bucket_key(id_col, n_buckets).alias("bucket"),
    )
    placed = sized.withColumn("__end", F.sum("__bytes").over(w)).withColumn(
        "shard", F.floor((F.col("__end") - F.col("__bytes")) / F.lit(target_bytes))
    )
    return (
        placed.groupBy("bucket", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__bytes").alias("total_bytes"),
            F.min(id_col).alias("first_id"),
            F.max(id_col).alias("last_id"),
        )
        .orderBy("bucket", "shard")
    )
