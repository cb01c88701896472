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
from ..operators.layout import BITS, N_FILES, interleave_sql

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


@register(
    "q117_zorder_layout",
    oracle=f"""
    WITH e AS (SELECT CAST(user_id AS BIGINT) AS x, epoch_us(ts) AS y FROM events),
    st AS (
      SELECT CAST(MIN(x) AS BIGINT) AS xmin, CAST(MAX(x) AS BIGINT) AS xmax,
             CAST(MIN(y) AS BIGINT) AS ymin, CAST(MAX(y) AS BIGINT) AS ymax
      FROM e
    ),
    coded AS (
      SELECT x, y, xmin, xmax,
             CASE WHEN xmax = xmin THEN 0 ELSE (x - xmin) * 65535 // (xmax - xmin) END AS xu,
             CASE WHEN ymax = ymin THEN 0 ELSE (y - ymin) * 65535 // (ymax - ymin) END AS yu
      FROM e, st
    ),
    zed AS (
      SELECT x, y, xmin, xmax,
             ({interleave_sql("xu", "yu", div_op="//")}) * {N_FILES} // {1 << (2 * BITS)} AS zfile,
             yu * {N_FILES} // {1 << BITS} AS lfile
      FROM coded
    ),
    layouts AS (
      SELECT 'zorder' AS layout, zfile AS file_id, x, y, xmin, xmax FROM zed
      UNION ALL
      SELECT 'linear' AS layout, lfile AS file_id, x, y, xmin, xmax FROM zed
    ),
    zm AS (
      SELECT layout, CAST(file_id AS BIGINT) AS file_id,
             CAST(count(*) AS BIGINT) AS n_rows,
             MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y,
             MIN(xmin) AS xmin, MAX(xmax) AS xmax
      FROM layouts GROUP BY 1, 2
    )
    SELECT layout, file_id, n_rows, min_x, max_x, min_y, max_y,
           NOT (max_x < (xmin + (xmax - xmin) * 2 // 5)
                OR min_x > (xmin + (xmax - xmin) * 9 // 20)) AS hit
    FROM zm ORDER BY layout, file_id
    """,
)
def q117_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout planning with zone-map pruning
    (:func:`..operators.layout.zone_map_layout`): quantize (user_id,
    ts) to 16-bit codes against the global min/max, bit-interleave
    them into z-values (32 unrolled div/%/× terms — no engine bit-op
    dialects), assign files as even z-ranges, and emit each file's
    zone map plus whether a middle-5%-of-user-range predicate would
    have to open it — side by side with the same rows laid out in
    single-dimension (ts) order, quantifying what Z-ordering buys.

    Integer-exact end to end. Scale: the min/max agg is one broadcast
    row; codes and z-values are a narrow map; zone maps are one agg on
    the uniform file key — layout planning costs one pass, and a real
    writer materializes it with repartitionByRange(zval)."""
    from ..operators.layout import zone_map_layout

    # ts is TIMESTAMP_NTZ; the session TZ is pinned UTC, so the cast is
    # the identity and unix_micros matches DuckDB's epoch_us exactly
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("ts_us")
    )
    return zone_map_layout(ev, x_col="user_id", y_col="ts_us").orderBy("layout", "file_id")
