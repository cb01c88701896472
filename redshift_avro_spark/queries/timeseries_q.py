"""Time-series queries: batch range join (q98) + hypertable rollup (q101).

Both shapes are delegated by the reference to Redshift SQL
(README.md:13-17, SURVEY §2.6): a non-equi ``BETWEEN`` join and a
multi-resolution time-bucket rollup. The Spark implementations are the
scalable compositions in :mod:`..operators.rangejoin` (time-bucketed
equi-join, no nested loop) and :mod:`..operators.timeseries`
(hierarchical partial-aggregate reuse); the oracles are the direct
declarative forms DuckDB can execute exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.staging import materialize
from . import load_table, register
from ..operators.rangejoin import range_join
from ..operators.timeseries import hypertable_rollup


@register(
    "q98_range_join",
    oracle="""
    WITH incidents AS (
      SELECT event_id AS incident_id,
             ts AS start_ts,
             make_timestamp(epoch_us(ts) + 60000000 * (1 + event_id % 10)) AS end_ts
      FROM events WHERE event_type = 'error'
    ),
    clicks AS (
      SELECT event_id AS click_id, ts AS click_ts,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events WHERE event_type = 'click'
    )
    SELECT i.incident_id, i.start_ts, i.end_ts,
           CAST(count(c.click_id) AS BIGINT) AS n_clicks,
           CAST(coalesce(SUM(c.v), 0) AS DOUBLE) AS click_value
    FROM incidents i LEFT JOIN clicks c
      ON c.click_ts >= i.start_ts AND c.click_ts <= i.end_ts
    GROUP BY i.incident_id, i.start_ts, i.end_ts
    ORDER BY i.incident_id
    """,
)
def q98_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap range join WITHOUT an equi-key: every 'error'
    event opens an incident window of 1–10 minutes (length derived
    from event_id, so the fixture is deterministic); count and sum the
    'click' events — any user's — falling inside each window.

    The oracle is the naive non-equi LEFT JOIN ... BETWEEN (exact, and
    fine on DuckDB's single node); the Spark side MUST NOT execute
    that plan at scale (BroadcastNestedLoopJoin over the corpus).
    Instead :func:`range_join` quantizes time into 600 s buckets (= the
    max interval length, so each interval lands on ≤2 buckets),
    equi-joins on the bucket key and post-filters the exact bounds —
    one uniform-key shuffle, each (click, incident) pair met exactly
    once in the click's own bucket. Zero-match incidents are restored
    by a co-keyed left join of the aggregate back onto the interval
    set. 100 TB: cost is (clicks per bucket) × (intervals per bucket)
    per task — tune bucket width to interval length; AQE splits a
    flash-crowd bucket."""
    e = load_table(spark, sf_dir, "events")
    incidents = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("start_ts"),
        F.timestamp_micros(
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.lit(60_000_000) * (F.lit(1) + F.col("event_id") % 10)
        ).alias("end_ts"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    pairs = range_join(
        clicks,
        incidents,
        point_ts="click_ts",
        start_ts="start_ts",
        end_ts="end_ts",
        bucket_width_s=600,
        max_interval_s=600,
    )
    hits = pairs.groupBy("incident_id").agg(
        F.count("click_id").alias("n_hits"), F.sum("v").alias("sum_v")
    )
    return (
        incidents.join(hits, "incident_id", "left")
        .select(
            "incident_id",
            "start_ts",
            "end_ts",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_clicks"),
            F.coalesce(F.col("sum_v"), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("click_value"),
        )
        .orderBy("incident_id")
    )


@register(
    "q101_hypertable_rollup",
    oracle="""
    WITH base AS (
      SELECT date_trunc('minute', ts) AS m, CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    )
    SELECT 'minute' AS resolution, m AS w_start,
           CAST(count(*) AS BIGINT) AS n, CAST(SUM(v) AS DOUBLE) AS total
    FROM base GROUP BY m
    UNION ALL
    SELECT 'hour' AS resolution, date_trunc('hour', m) AS w_start,
           CAST(count(*) AS BIGINT) AS n, CAST(SUM(v) AS DOUBLE) AS total
    FROM base GROUP BY date_trunc('hour', m)
    UNION ALL
    SELECT 'day' AS resolution, date_trunc('day', m) AS w_start,
           CAST(count(*) AS BIGINT) AS n, CAST(SUM(v) AS DOUBLE) AS total
    FROM base GROUP BY date_trunc('day', m)
    ORDER BY resolution, w_start
    """,
)
def q101_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup: event counts + exact-decimal value totals at
    minute / hour / day resolution in one result.

    The oracle groups the raw table at each resolution independently
    (the semantic spec). The Spark side scans and shuffles the raw
    table ONCE (minute buckets — a uniform key), then each coarser
    level re-aggregates the finer level's partials
    (:func:`hypertable_rollup` — sum/count are decomposable and the
    decimal sums associative, so the hierarchy is bit-equal to direct
    grouping). 100 TB: hour/day levels cost O(minutes in the time
    span), independent of data volume — the continuous-aggregate
    pattern."""
    e = load_table(spark, sf_dir, "events")
    rolled = hypertable_rollup(
        e.select("ts", F.col("value").cast("decimal(18,2)").alias("v")),
        ts_col="ts",
        value_col="v",
        resolutions=("minute", "hour", "day"),
    )
    return rolled.select(
        "resolution", "w_start", "n", F.col("total").cast("double").alias("total")
    ).orderBy("resolution", "w_start")


@register(
    "q140_gapfill_locf",
    oracle="""
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM b),
    grid AS (
      SELECT t.event_type, g.bucket
      FROM (SELECT DISTINCT event_type FROM events) t,
           (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
            FROM bounds) g
    ),
    joined AS (
      SELECT g.event_type, g.bucket,
             CAST(COALESCE(b.n, 0) AS BIGINT) AS n, b.cents
      FROM grid g LEFT JOIN b USING (event_type, bucket)
    )
    SELECT event_type, bucket, n, cents,
           LAST_VALUE(cents IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket
             ROWS UNBOUNDED PRECEDING) AS locf_cents,
           CAST(CASE WHEN n = 0 THEN 1 ELSE 0 END AS INTEGER) AS is_gap
    FROM joined ORDER BY event_type, bucket
    """,
)
def q140_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series with last-observation-carried-forward —
    the TimescaleDB ``time_bucket_gapfill`` + ``locf`` shape: bucket
    events per (type, hour) in exact cents, densify against the full
    hour grid (sequence between the global min/max bucket), and fill
    empty hours by carrying the last non-null value per type
    (``last(..., ignorenulls=True)`` ≡ LAST_VALUE IGNORE NULLS).

    Scale shape: one bucket agg (uniform composite key), a broadcast
    2-row bounds agg exploded into the dense grid, a co-keyed left
    join, one per-type ordered window (a type's series is a bounded
    partition; at many-series scale the key is (series, day-slice) —
    the asof salting pattern)."""
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.groupBy(
            "event_type", F.expr("date_trunc('hour', ts)").alias("bucket")
        ).agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .cast("long")
            .alias("cents"),
        )
    )
    b = materialize(b, label="ts_buckets", default="checkpoint")  # bounds + grid join
    bounds = b.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.expr("sequence(lo, hi, INTERVAL 1 HOUR)")).alias("bucket"),
    )
    joined = grid.join(b, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        "cents",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "bucket",
        "n",
        "cents",
        F.last("cents", ignorenulls=True).over(w).alias("locf_cents"),
        (F.col("n") == 0).cast("int").alias("is_gap"),
    ).orderBy("event_type", "bucket")
