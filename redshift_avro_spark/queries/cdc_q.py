"""CDC merge query (q109) — apply a change feed to the customer
snapshot.

The change batch is derived deterministically from the orders table
(each customer's latest order by (o_orderdate, o_orderkey) DESC):
every 7th customer key is a DELETE, every remaining 3rd an UPDATE of
the account balance to that order's total (a partial update — name
and segment fall back to the snapshot), and every 13th key also
yields an INSERT under a fresh key (custkey + 10,000,000). The oracle
is the equivalent FULL OUTER JOIN MERGE in plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load_table, register
from ..operators.cdc import merge_upsert


@register(
    "q109_cdc_merge",
    oracle="""
    WITH latest AS (
      SELECT o_custkey, o_totalprice FROM (
        SELECT o_custkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1
    ),
    changes AS (
      SELECT o_custkey AS k, 'delete' AS op, CAST(NULL AS DOUBLE) AS c_acctbal,
             CAST(NULL AS VARCHAR) AS c_name, CAST(NULL AS VARCHAR) AS c_mktsegment
      FROM latest WHERE o_custkey % 7 = 0
      UNION ALL
      SELECT o_custkey, 'upsert', CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE),
             CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
      FROM latest WHERE o_custkey % 7 <> 0 AND o_custkey % 3 = 0
      UNION ALL
      SELECT o_custkey + 10000000, 'upsert',
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE),
             concat('new_customer_', CAST(o_custkey AS VARCHAR)), 'MERGED'
      FROM latest WHERE o_custkey % 13 = 0
    ),
    base AS (
      SELECT c_custkey AS k, c_name, c_mktsegment,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal
      FROM customer
    )
    SELECT COALESCE(b.k, c.k) AS c_custkey,
           COALESCE(c.c_name, b.c_name) AS c_name,
           COALESCE(c.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
           COALESCE(c.c_acctbal, b.c_acctbal) AS c_acctbal,
           CASE WHEN c.k IS NULL THEN 'kept'
                WHEN b.k IS NULL THEN 'inserted' ELSE 'updated' END AS action
    FROM base b FULL OUTER JOIN changes c ON b.k = c.k
    WHERE c.op IS NULL OR c.op <> 'delete'
    ORDER BY c_custkey
    """,
)
def q109_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE a deterministic change feed (delete / partial-update /
    insert, derived from each customer's latest order) into the
    customer snapshot via :func:`merge_upsert` — the warehouse
    UPSERT shape over plain columnar data, with per-row action
    provenance.

    One shuffle each for the latest-order window (o_custkey) and the
    merge join (primary key); at scale the snapshot is bucketed on
    the key so only the change sliver moves. Partial updates work by
    NULL-column fallback, exercised here: updates carry only the new
    balance, names/segments survive from the snapshot."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    latest = (
        orders.select("o_custkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    price = F.col("o_totalprice").cast("decimal(18,2)").cast("double")
    deletes = latest.where(F.col("o_custkey") % 7 == 0).select(
        F.col("o_custkey").alias("c_custkey"),
        F.lit("delete").alias("op"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("string").alias("c_mktsegment"),
    )
    updates = latest.where(
        (F.col("o_custkey") % 7 != 0) & (F.col("o_custkey") % 3 == 0)
    ).select(
        F.col("o_custkey").alias("c_custkey"),
        F.lit("upsert").alias("op"),
        price.alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("string").alias("c_mktsegment"),
    )
    inserts = latest.where(F.col("o_custkey") % 13 == 0).select(
        (F.col("o_custkey") + 10_000_000).alias("c_custkey"),
        F.lit("upsert").alias("op"),
        price.alias("c_acctbal"),
        F.concat(F.lit("new_customer_"), F.col("o_custkey").cast("string")).alias("c_name"),
        F.lit("MERGED").alias("c_mktsegment"),
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.col("c_acctbal").cast("decimal(18,2)").cast("double").alias("c_acctbal"),
    )
    return merge_upsert(base, changes, key="c_custkey").orderBy("c_custkey")


@register(
    "q111_scd2_history",
    oracle="""
    WITH u AS (
      SELECT c_custkey AS k, TIMESTAMP '1990-01-01 00:00:00' AS vf,
             CAST(-1 AS BIGINT) AS tb,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
      FROM customer
      UNION ALL
      SELECT o_custkey, o_orderdate, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
      FROM orders
    )
    SELECT k AS c_custkey,
           CAST(row_number() OVER w AS INTEGER) AS version_seq,
           vf AS valid_from,
           lead(vf) OVER w AS valid_to,
           bal,
           (lead(vf) OVER w IS NULL) AS is_current
    FROM u
    WINDOW w AS (PARTITION BY k ORDER BY vf, tb)
    ORDER BY c_custkey, version_seq
    """,
)
def q111_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history of customer balances:
    the snapshot row (stamped 1990-01-01, before every order) plus one
    version per order (the order's total becomes the balance at
    o_orderdate, orderkey tie-breaking same-day orders), interval-
    versioned per key via :func:`scd2_history` — valid_from /
    valid_to / is_current, with NULL valid_to marking the current row.

    One shuffle on the key for the interval window; downstream, an
    as-of join (q73's operator) against valid_from gives point-in-
    time-correct enrichment — the feature-store pattern. At scale the
    history is partitioned on the key and each CDC batch only
    re-closes the previous current row per changed key."""
    from ..operators.cdc import scd2_history

    snap = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").cast("decimal(18,2)").cast("double").alias("bal"),
    )
    ch = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("bal"),
    )
    return (
        scd2_history(
            snap,
            ch,
            key="c_custkey",
            ts_col="ts",
            tiebreak_col="seq",
            snapshot_ts="1990-01-01 00:00:00",
        )
        .withColumn("version_seq", F.col("version_seq").cast("int"))
        .select(
            "c_custkey", "version_seq", "valid_from", "valid_to", "bal", "is_current"
        )
        .orderBy("c_custkey", "version_seq")
    )


@register(
    "q127_point_in_time_enrich",
    oracle="""
    WITH u AS (
      SELECT c_custkey AS k, TIMESTAMP '1990-01-01 00:00:00' AS vf,
             CAST(-1 AS BIGINT) AS tb,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
      FROM customer
      UNION ALL
      SELECT o_custkey, o_orderdate, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
      FROM orders
    ),
    hist AS (
      SELECT k, CAST(row_number() OVER w AS INTEGER) AS version_seq,
             vf AS valid_from, lead(vf) OVER w AS valid_to, bal
      FROM u WINDOW w AS (PARTITION BY k ORDER BY vf, tb)
    ),
    probe AS (
      SELECT o_custkey AS k, CAST(l_shipdate AS TIMESTAMP) AS ts
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    m AS (
      SELECT h.version_seq, h.bal
      FROM probe p JOIN hist h
        ON p.k = h.k AND h.valid_from <= p.ts
       AND (h.valid_to IS NULL OR p.ts < h.valid_to)
    )
    SELECT CAST(version_seq AS BIGINT) AS version_seq,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(floor(bal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS bal_cents_sum
    FROM m GROUP BY version_seq ORDER BY version_seq
    """,
)
def q127_point_in_time_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct enrichment — the feature-store pattern
    that prevents label leakage: every lineitem SHIP event looks up
    the customer-balance version that was valid AT SHIP TIME from the
    q111 SCD2 history, via :func:`..operators.asof.asof_join`
    (union+window composition, tiebreak on version_seq so same-day
    versions resolve exactly like the interval semantics).

    The oracle answers the same question as a disjoint-INTERVAL join
    (valid_from ≤ ts < valid_to) — a different algorithm entirely, so
    agreement pins the as-of tie/dedup semantics, not just
    self-consistency. Output aggregates per matched version (exact
    cents), keeping the result bounded.

    Scale shape: history build is one key-window; the probe⋈orders
    join and the as-of union+window shuffle on the uniform customer
    key; the salting hook (salt_interval_s) covers a hot key."""
    from ..operators.asof import asof_join
    from ..operators.cdc import scd2_history

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE)").alias("bal"),
    )
    orders = load_table(spark, sf_dir, "orders")
    changes = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("timestamp").alias("chg_ts"),
        F.col("o_orderkey").alias("chg_seq"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)").alias("bal"),
    )
    hist = scd2_history(
        cust, changes, key="k", ts_col="chg_ts", tiebreak_col="chg_seq",
        snapshot_ts="1990-01-01 00:00:00",
    ).select("k", F.col("valid_from").alias("ts"), "version_seq", "bal")

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    probe = li.join(
        orders.select("o_orderkey", F.col("o_custkey").alias("k")),
        li.l_orderkey == F.col("o_orderkey"),
    ).select("k", F.col("l_shipdate").cast("timestamp").alias("ts"))

    enriched = asof_join(
        probe, hist, on=["k"], ts_col="ts",
        value_cols=["bal", "version_seq"], tiebreak_col="version_seq",
    )
    return (
        enriched.groupBy(F.col("version_seq_asof").cast("long").alias("version_seq"))
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.expr("CAST(floor(bal_asof * 100 + 0.5) AS BIGINT)")).cast("long").alias(
                "bal_cents_sum"
            ),
        )
        .orderBy("version_seq")
    )
