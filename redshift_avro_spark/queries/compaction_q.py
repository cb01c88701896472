"""q58: compaction shard planning over the documents table.

The DuckDB oracle replays the identical deterministic packing: same
md5-derived bucket, same per-bucket id-ordered cumulative byte sum,
same first-fit shard assignment — integer arithmetic end to end, so the
value hash is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import materialize
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


@register(
    "q125_snapshot_table",
    oracle="""
    WITH st AS (
      SELECT CAST(MIN(l_orderkey) AS BIGINT) AS mn, CAST(MAX(l_orderkey) AS BIGINT) AS mx
      FROM lineitem
    ),
    b AS (
      SELECT mn, mx, mn + (mx - mn) // 2 AS mid, mn + (mx - mn) // 10 AS low,
             mn + (mx - mn) * 2 // 5 AS lo, mn + (mx - mn) * 9 // 20 AS hi
      FROM st
    )
    SELECT 'v0_rows' AS part, (SELECT CAST(count(*) AS BIGINT) FROM lineitem, b WHERE l_orderkey <= mid) AS n,
           CAST(NULL AS BIGINT) AS revenue_cents
    UNION ALL
    SELECT 'v1_rows', (SELECT CAST(count(*) AS BIGINT) FROM lineitem), CAST(NULL AS BIGINT)
    UNION ALL
    SELECT 'v2_rows', (SELECT CAST(count(*) AS BIGINT) FROM lineitem, b WHERE l_orderkey <= low),
           CAST(NULL AS BIGINT)
    UNION ALL
    SELECT 'pruned_agg', (SELECT CAST(count(*) AS BIGINT) FROM lineitem, b WHERE l_orderkey BETWEEN lo AND hi),
           (SELECT CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
            FROM lineitem, b WHERE l_orderkey BETWEEN lo AND hi)
    ORDER BY part
    """,
)
def q125_snapshot_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-table layer end to end
    (:class:`..sources.snapshots.SnapshotTable`): commit lineitem's
    lower half as v0 (overwrite, 8 range-partitioned files with
    l_orderkey zone maps), append the upper half as v1, overwrite with
    the lowest decile as v2 — then answer time-travel row counts for
    all three versions plus a revenue aggregate over a narrow orderkey
    interval read from v1 WITH file pruning (files whose stored
    [min,max] miss the interval are never opened; the residual exact
    BETWEEN filter runs inside the surviving files).

    The oracle recomputes every number from the raw table — so the
    manifest bookkeeping (append = old files + new, overwrite =
    replace, stats collection, prune-then-filter) must be exactly
    right for the hash to match. Scale: commits are normal distributed
    writes + one O(files) stats agg; reads open only surviving files."""
    import atexit
    import shutil
    import tempfile

    from ..sources.snapshots import SnapshotTable

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").alias("cents")
    )
    st = li.agg(
        F.min("l_orderkey").cast("long").alias("mn"), F.max("l_orderkey").cast("long").alias("mx")
    )
    b = F.broadcast(
        materialize(
            st.selectExpr(
                "mn",
                "mx",
                "mn + (mx - mn) div 2 AS mid",
                "mn + (mx - mn) div 10 AS low",
                "mn + (mx - mn) * 2 div 5 AS lo",
                "mn + (mx - mn) * 9 div 20 AS hi",
            ),
            label="compaction_bounds",
            default="checkpoint",
        )
    )

    root = tempfile.mkdtemp(prefix="snaptbl-")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    t = SnapshotTable(root)
    lower = li.crossJoin(b).where("l_orderkey <= mid").select("l_orderkey", "cents")
    upper = li.crossJoin(b).where("l_orderkey > mid").select("l_orderkey", "cents")
    decile = li.crossJoin(b).where("l_orderkey <= low").select("l_orderkey", "cents")
    t.commit(lower.repartitionByRange(8, "l_orderkey"), mode="overwrite", stats_cols=("l_orderkey",))
    t.commit(upper.repartitionByRange(8, "l_orderkey"), mode="append", stats_cols=("l_orderkey",))
    t.commit(decile.repartitionByRange(2, "l_orderkey"), mode="overwrite", stats_cols=("l_orderkey",))

    bounds = b.select("lo", "hi").collect()[0]  # two ints for the prune interval
    pruned = (
        t.read(spark, version=1, prune=("l_orderkey", bounds.lo, bounds.hi))
        .where(F.col("l_orderkey").between(bounds.lo, bounds.hi))
        .agg(F.count("*").cast("long").alias("n"), F.sum("cents").cast("long").alias("revenue_cents"))
    )
    rows = []
    for name, version in (("v0_rows", 0), ("v1_rows", 1), ("v2_rows", 2)):
        rows.append(
            t.read(spark, version=version)
            .agg(F.count("*").cast("long").alias("n"))
            .select(F.lit(name).alias("part"), "n", F.lit(None).cast("long").alias("revenue_cents"))
        )
    rows.append(pruned.select(F.lit("pruned_agg").alias("part"), "n", "revenue_cents"))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("part")


_BJ_BUCKETS = 8


@register(
    "q145_bucketed_colocated_join",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
)
def q145_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join: orders and lineitem are WRITTEN
    as bucketed tables (``bucketBy(8, orderkey).sortBy``, the
    SCALING.md "repeat joins pay zero shuffles" claim made concrete),
    then joined WITHOUT any shuffle on either side — the bucket spec in
    the catalog lets Catalyst plan a SortMergeJoin whose children are
    bare bucketed scans (tests/test_plans.py::
    test_q145_bucketed_join_no_shuffle asserts the join subtree has no
    Exchange; the only exchange in the whole plan is the final 5-row
    priority aggregation).

    The oracle recomputes the aggregate from the raw tables, so the
    bucketed write→read→join path must be lossless for the hash to
    match. 100 TB: this is THE pattern for fact-fact joins too big to
    broadcast — pay the bucketed write once, then every subsequent
    join on the bucket key is shuffle-free; bucket count picks join
    parallelism (here 8, in production thousands)."""
    import atexit
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="bucketed-")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    for name, df, key in (("bj_orders", o, "o_orderkey"), ("bj_lineitem", li, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(_BJ_BUCKETS, key)
            .sortBy(key)
            .option("path", f"{root}/{name}")
            .mode("overwrite")
            .saveAsTable(name)
        )
    bo = spark.table("bj_orders")
    bl = spark.table("bj_lineitem")
    joined = bo.hint("merge").join(bl, bo.o_orderkey == bl.l_orderkey)
    return (
        joined.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("priority")
    )


# --------------------------------------------------------------- q173
# Rendezvous (highest-random-weight) repartition plan: assign every
# document to one of N workers by argmax of md5(doc|worker), then
# measure exactly which documents MOVE when a 9th worker joins — the
# minimal-movement property (only ~1/(N+1) of keys relocate, all TO
# the new worker) that makes consistent placement the way a 100 TB
# store scales, vs mod-N hashing where nearly everything moves.

_RV_N = 8


@register(
    "q173_rendezvous_plan",
    oracle=f"""
    WITH cand AS (
      SELECT doc_id, t.w AS w,
             CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR), '|',
               CAST(t.w AS VARCHAR))), 1, 15)) AS BIGINT) AS h
      FROM documents, unnest(generate_series(0, {_RV_N})) AS t(w)
    ),
    a AS (
      SELECT doc_id,
             (max(CASE WHEN w < {_RV_N} THEN struct_pack(h := h, w := w) END)).w AS w_old,
             (max(struct_pack(h := h, w := w))).w AS w_new
      FROM cand GROUP BY doc_id
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM a)
    SELECT CAST(w_old AS BIGINT) AS worker,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN w_old <> w_new THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
           CAST(SUM(CASE WHEN w_old <> w_new AND w_new <> {_RV_N} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_moved_sideways,
           CAST(SUM(CASE WHEN w_old <> w_new THEN 1 ELSE 0 END) * 1000000
             // count(*) AS BIGINT) AS moved_ppm,
           CAST(count(*) * 1000000 // (SELECT n_total FROM tot) AS BIGINT) AS share_ppm
    FROM a GROUP BY w_old ORDER BY worker
    """,
)
def q173_rendezvous_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-worker rendezvous-hashing report for scaling 8 → 9 workers:
    current doc count and corpus share, how many docs move under the
    new ring, and — the correctness property of HRW — how many move
    ANYWHERE BUT the new worker (must be 0: a doc relocates only if
    the new worker wins its argmax, never between old workers).

    Scale shape: one 9× narrow fan-out (md5 per (doc, worker)), ONE
    map-side-combining per-doc argmax aggregation computing both rings
    from the same pass (the old ring is the CASE-filtered max), one
    tiny per-worker aggregation. Nothing shuffles twice."""
    docs = load_table(spark, sf_dir, "documents")
    cand = docs.select(
        "doc_id", F.explode(F.expr(f"sequence(0, {_RV_N})")).alias("w")
    ).withColumn(
        "h",
        F.expr(
            "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '|',"
            " CAST(w AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        ),
    )
    a = cand.groupBy("doc_id").agg(
        F.expr(
            f"max(CASE WHEN w < {_RV_N} THEN named_struct('h', h, 'w', w) END).w"
        ).alias("w_old"),
        F.expr("max(named_struct('h', h, 'w', w)).w").alias("w_new"),
    )
    tot = a.agg(F.count("*").cast("long").alias("n_total"))
    return (
        a.groupBy(F.col("w_old").cast("long").alias("worker"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("w_old") != F.col("w_new"), 1).otherwise(0))
            .cast("long")
            .alias("n_moved"),
            F.sum(
                F.when(
                    (F.col("w_old") != F.col("w_new")) & (F.col("w_new") != _RV_N), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_moved_sideways"),
        )
        .withColumn("moved_ppm", F.expr("n_moved * 1000000 div n_docs"))
        .crossJoin(F.broadcast(tot))
        .withColumn("share_ppm", F.expr("n_docs * 1000000 div n_total"))
        .drop("n_total")
        .select(
            "worker", "n_docs", "n_moved", "n_moved_sideways",
            "moved_ppm", "share_ppm",
        )
        .orderBy("worker")
    )
