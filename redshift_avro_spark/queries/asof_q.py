"""As-of join query (q73) — point-in-time enrichment over events.

DuckDB ships a native ASOF JOIN, so the oracle is the genuine article:
the Spark side must reproduce, value-for-value, what a purpose-built
as-of implementation returns — tie semantics (``right.ts <= left.ts``)
and equal-timestamp dedup included. The Spark implementation is the
union+window composition in :mod:`..operators.asof`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_table, register
from ..operators.asof import asof_join


@register(
    "q73_asof_join",
    oracle="""
    WITH signups AS (
      SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'signup'
      QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ),
    errors AS (
      SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'error'
    )
    SELECT e.event_id, e.ts, e.user_id, e.value,
           s.ts AS ts_asof, s.event_id AS event_id_asof, s.value AS value_asof
    FROM errors e ASOF LEFT JOIN signups s
      ON e.user_id = s.user_id AND s.ts <= e.ts
    ORDER BY e.event_id
    """,
)
def q73_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every 'error' event, the most recent 'signup' at-or-before
    it by the same user (timestamp, event_id and value attached; NULLs
    when no prior signup exists).

    Scale shape: one shuffle on user_id for the window — no range-join
    candidate explosion, no per-key buffering beyond the running
    last() struct. The same composition handles trade→quote or
    config-change enrichment at any SF; a pathologically hot key would
    use the salting pattern in operators/skew.py."""
    e = load_table(spark, sf_dir, "events")
    errors = e.where(F.col("event_type") == "error").select("event_id", "ts", "user_id", "value")
    signups = e.where(F.col("event_type") == "signup").select("user_id", "ts", "event_id", "value")
    return asof_join(
        errors,
        signups,
        on=["user_id"],
        ts_col="ts",
        value_cols=["event_id", "value"],
    ).orderBy("event_id")


@register(
    "q74_trailing_window_counts",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW
           ) - 1 AS BIGINT) AS n_prev_10m
    FROM events
    ORDER BY event_id
    """,
)
def q74_trailing_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing time-range window: for every event, how many OTHER
    events the same user produced in the preceding 10 minutes
    (inclusive) — the rate-limit / burst-detection shape.

    This is a RANGE frame (value-based, not row-based): Spark needs a
    numeric ordering column, so ts is projected to epoch MICROseconds
    (exact — the testdata carries no sub-microsecond components) and
    the frame is [-600e6, 0]; DuckDB orders by the timestamp itself
    with an INTERVAL frame. Both engines include equal-ts peers in the
    frame, so the self-exclusion is the same −1 on each side. One
    shuffle on user_id; frame state is a count, not a buffer."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us"))
        .rangeBetween(-600_000_000, 0)
    )
    return (
        # ts is TIMESTAMP_NTZ; the session pins UTC, so the cast to
        # (tz-aware) TIMESTAMP that unix_micros demands is an identity
        e.select(
            "event_id", "user_id", "ts",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )
        .withColumn("n_prev_10m", (F.count("*").over(w) - F.lit(1)).cast("long"))
        .select("event_id", "user_id", "ts", "n_prev_10m")
        .orderBy("event_id")
    )
