"""Behavioral-analytics queries over the ``events`` table: funnel
conversion (q120) and cohort retention (q121).

The two canonical product-analytics shapes a warehouse serves on an
event stream — both pure aggregations over uniform keys, both exactly
SQL-expressible, so they carry full value-hash oracles.

100 TB story: every stage is a (user_id)-keyed aggregation or join —
the natural partitioning of an event store — followed by tiny
stage-count / cohort-size reductions that broadcast. No window over
an unbounded partition, no driver collect, integer ppm arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import materialize
from . import load_table, register


@register(
    "q120_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, MIN(ts) AS t2
      FROM events e JOIN v USING (user_id)
      WHERE event_type = 'click' AND ts >= t1 GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, MIN(ts) AS t3
      FROM events e JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND ts >= t2 GROUP BY 1
    ),
    n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    n2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
    n3 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p)
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type, n1.n AS n_users,
             CAST(1000000 AS BIGINT) AS conv_ppm FROM n1
      UNION ALL
      SELECT 2, 'click', n2.n, n2.n * 1000000 // n1.n FROM n1, n2
      UNION ALL
      SELECT 3, 'purchase', n3.n, n3.n * 1000000 // n2.n FROM n2, n3
    ) ORDER BY stage
    """,
)
def q120_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel view → click → purchase: a user converts a
    stage only with an event AT OR AFTER their first event of the
    previous stage (first-touch semantics via MIN(ts) per stage).
    Output: per-stage user counts and step conversion in exact ppm.

    Scale shape: each stage is one filter + one (user_id)-keyed agg +
    one co-keyed join with the previous stage; the stage totals are
    three 1-row aggregates cross-joined — nothing wide, nothing
    driver-side."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t1"))
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1 = v.agg(F.count("*").cast("long").alias("n1"))
    n2 = c.agg(F.count("*").cast("long").alias("n2"))
    n3 = p.agg(F.count("*").cast("long").alias("n3"))
    # one row; materialize so the three stage projections don't each
    # replay the whole funnel chain
    ns = materialize(
        n1.crossJoin(n2).crossJoin(n3), label="funnel_counts", default="checkpoint"
    )
    s1 = ns.select(
        F.lit(1).cast("long").alias("stage"),
        F.lit("view").alias("event_type"),
        F.col("n1").alias("n_users"),
        F.lit(1000000).cast("long").alias("conv_ppm"),
    )
    s2 = ns.select(
        F.lit(2).cast("long").alias("stage"),
        F.lit("click").alias("event_type"),
        F.col("n2").alias("n_users"),
        F.expr("n2 * 1000000 div n1").alias("conv_ppm"),
    )
    s3 = ns.select(
        F.lit(3).cast("long").alias("stage"),
        F.lit("purchase").alias("event_type"),
        F.col("n3").alias("n_users"),
        F.expr("n3 * 1000000 div n2").alias("conv_ppm"),
    )
    return s1.unionByName(s2).unionByName(s3).orderBy("stage")


@register(
    "q121_cohort_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort FROM events GROUP BY 1
    ),
    act AS (
      SELECT DISTINCT e.user_id, f.cohort, date_trunc('week', e.ts) AS wk
      FROM events e JOIN f USING (user_id)
    ),
    sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size FROM f GROUP BY 1),
    grid AS (
      SELECT cohort,
             CAST(date_diff('day', CAST(cohort AS DATE), CAST(wk AS DATE)) // 7 AS BIGINT)
               AS week_offset,
             CAST(count(*) AS BIGINT) AS n_users
      FROM act GROUP BY 1, 2
    )
    SELECT g.cohort AS cohort_week, g.week_offset, s.cohort_size, g.n_users,
           g.n_users * 1000000 // s.cohort_size AS retained_ppm
    FROM grid g JOIN sz s USING (cohort)
    ORDER BY cohort_week, week_offset
    """,
)
def q121_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the Monday week
    of their FIRST event (any type); each later active week counts
    them once; retention is exact ppm of the cohort size per week
    offset — the classic retention triangle.

    Scale shape: first-seen = one (user_id) agg; activity grid = one
    distinct on (user, cohort, week) then a (cohort, offset) agg;
    cohort sizes are a tiny broadcast join. Week truncation is
    Monday-based in both engines, offsets are exact day-diffs div 7."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    f = ev.groupBy("user_id").agg(F.expr("date_trunc('week', MIN(ts))").alias("cohort"))
    act = (
        ev.join(f, "user_id")
        .select("user_id", "cohort", F.expr("date_trunc('week', ts)").alias("wk"))
        .distinct()
    )
    sz = f.groupBy("cohort").agg(F.count("*").cast("long").alias("cohort_size"))
    grid = act.groupBy(
        "cohort",
        F.expr("CAST(datediff(CAST(wk AS DATE), CAST(cohort AS DATE)) div 7 AS BIGINT)").alias(
            "week_offset"
        ),
    ).agg(F.count("*").cast("long").alias("n_users"))
    return (
        grid.join(F.broadcast(sz), "cohort")
        .select(
            F.col("cohort").alias("cohort_week"),
            "week_offset",
            "cohort_size",
            "n_users",
            F.expr("n_users * 1000000 div cohort_size").alias("retained_ppm"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "q137_event_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_type, ts, event_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    ),
    trans AS (
      SELECT LAG(event_type) OVER w2 AS from_type, event_type AS to_type
      FROM sess
      WINDOW w2 AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
    ),
    counts AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM trans WHERE from_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS prob_ppm
    FROM counts ORDER BY from_type, to_type
    """,
)
def q137_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition mining over sessionized event paths: sessions
    re-derived with q47's 30-minute-gap rule ((ts, event_id) total
    order), within-session transitions taken with LAG, and the
    transition matrix emitted as exact counts + integer-ppm row
    probabilities — the path-analysis view of the same stream the
    funnel (q120) summarizes. Session boundaries matter: a
    cross-session pair is NOT a transition.

    Scale shape: two windows over the uniform user key (session
    assignment, then transition lag), one (from, to) agg over a
    25-cell key space, and a 5-partition window for the row sums —
    nothing wide."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.expr(
            "CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
            " > INTERVAL 30 MINUTE"
            " OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL"
            " THEN 1 ELSE 0 END"
        ).alias("new_sess"),
    )
    sess = ordered.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    w2 = W.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    trans = sess.select(
        F.lag("event_type").over(w2).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    counts = trans.groupBy("from_type", "to_type").agg(F.count("*").cast("long").alias("n"))
    tot = counts.groupBy("from_type").agg(F.sum("n").cast("long").alias("tot"))
    return (
        counts.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("n * 1000000 div tot").alias("prob_ppm"),
        )
        .orderBy("from_type", "to_type")
    )
