"""Count-min sketch query (q75) — the mergeable heavy-hitter sketch.

A CMS is the canonical "novel sketch" operator for streaming/OLAP
engines: per (lane, bucket) integer counts, point estimates by min
over lanes, mergeable by simple addition. Everything here is exact
integer arithmetic (md5-derived buckets, COUNT, MIN), so unlike
float-based sketches the whole construction has a bit-exact DuckDB
oracle — same reason q46 uses fixed-threshold sketches and q56 a
log-free idf.

Sizing for the demo: depth 4 × width 64 against ~150 distinct users
guarantees real collisions, so the estimates genuinely overcount
(estimate >= exact, with equality only when all four buckets are
collision-free) — the machinery is exercised, not vacuously exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.staging import materialize
from . import load_table, register

_DEPTH = 4
_WIDTH = 64
_TOP = 20

# lane buckets: four 32-bit words of ONE md5 of the key, each mod width
_SPARK_BUCKET = "CAST(conv(substring(__h, {start}, 8), 16, 10) AS BIGINT) % {w}"
_DUCK_BUCKET = "CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), {start}, 8)) AS BIGINT) % {w}"


@register(
    "q75_count_min_sketch",
    oracle=f"""
    WITH stacked AS (
      SELECT lane,
             CASE lane
               {' '.join(f"WHEN {i} THEN {_DUCK_BUCKET.format(start=1 + 8 * i, w=_WIDTH)}" for i in range(_DEPTH))}
             END AS bucket
      FROM events, unnest([{', '.join(str(i) for i in range(_DEPTH))}]) AS t(lane)
    ),
    sketch AS (
      SELECT lane, bucket, count(*) AS c FROM stacked GROUP BY lane, bucket
    ),
    exact AS (
      SELECT user_id, count(*) AS exact_n FROM events
      GROUP BY user_id ORDER BY exact_n DESC, user_id LIMIT {_TOP}
    ),
    probes AS (
      SELECT user_id, exact_n, lane,
             CASE lane
               {' '.join(f"WHEN {i} THEN {_DUCK_BUCKET.format(start=1 + 8 * i, w=_WIDTH)}" for i in range(_DEPTH))}
             END AS bucket
      FROM exact, unnest([{', '.join(str(i) for i in range(_DEPTH))}]) AS t(lane)
    )
    SELECT user_id, CAST(exact_n AS BIGINT) AS exact_n,
           CAST(min(c) AS BIGINT) AS cms_estimate
    FROM probes JOIN sketch USING (lane, bucket)
    GROUP BY user_id, exact_n
    ORDER BY exact_n DESC, user_id
    """,
)
def q75_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over event user_ids (depth 4 × width 64), with
    the top-{_TOP} heavy hitters reported as (exact, estimate) pairs —
    estimate >= exact always, equality iff no bucket collisions.

    Scale shape: the sketch aggregation map-side combines down to at
    most depth×width rows no matter the corpus size (THE point of a
    CMS — mergeable fixed-size state, the same property that makes it
    a streaming-friendly aggregate); the probe set is {_TOP} keys and
    broadcasts. Exact counts here exist only to grade the estimates."""
    e = load_table(spark, sf_dir, "events").select("user_id")
    hashed = e.withColumn("__h", F.md5(F.col("user_id").cast("string")))
    lanes = ", ".join(
        f"named_struct('lane', {i}, 'bucket', {_SPARK_BUCKET.format(start=1 + 8 * i, w=_WIDTH)})"
        for i in range(_DEPTH)
    )
    sketch = (
        hashed.select(F.explode(F.expr(f"array({lanes})")).alias("lb"))
        .select("lb.lane", "lb.bucket")
        .groupBy("lane", "bucket")
        .agg(F.count("*").alias("c"))
    )
    exact = (
        e.groupBy("user_id")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("user_id"))
        .limit(_TOP)
    )
    probes = (
        exact.withColumn("__h", F.md5(F.col("user_id").cast("string")))
        .select("user_id", "exact_n", F.explode(F.expr(f"array({lanes})")).alias("lb"))
        .select("user_id", "exact_n", "lb.lane", "lb.bucket")
    )
    return (
        probes.join(sketch, ["lane", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").alias("cms_estimate"))
        .orderBy(F.desc("exact_n"), F.asc("user_id"))
    )


_BF_K = 4
_BF_M = 16  # bits per lane — small on purpose so false positives occur
# (per-lane fill ≈ 1-(1-1/16)^16 ≈ 64% at 16 members → FP ≈ 0.64^4 ≈ 17%)
_BF_TOP = 16


@register(
    "q77_bloom_filter",
    oracle=f"""
    WITH members AS (
      SELECT user_id FROM events WHERE event_type = 'error'
      GROUP BY user_id ORDER BY count(*) DESC, user_id LIMIT {_BF_TOP}
    ),
    bits AS (
      SELECT DISTINCT lane,
             CASE lane
               {' '.join(f"WHEN {i} THEN {_DUCK_BUCKET.format(start=1 + 8 * i, w=_BF_M)}" for i in range(_BF_K))}
             END AS bit
      FROM members, unnest([{', '.join(str(i) for i in range(_BF_K))}]) AS t(lane)
    ),
    probes AS (
      SELECT u.user_id, t.lane,
             CASE t.lane
               {' '.join(f"WHEN {i} THEN {_DUCK_BUCKET.format(start=1 + 8 * i, w=_BF_M)}" for i in range(_BF_K))}
             END AS bit
      FROM (SELECT DISTINCT user_id FROM events) u,
           unnest([{', '.join(str(i) for i in range(_BF_K))}]) AS t(lane)
    ),
    hits AS (
      SELECT p.user_id, count(*) AS n_hits
      FROM probes p JOIN bits b ON p.lane = b.lane AND p.bit = b.bit
      GROUP BY p.user_id
    )
    SELECT u.user_id,
           (m.user_id IS NOT NULL) AS is_member,
           (coalesce(h.n_hits, 0) = {_BF_K}) AS bloom_positive
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN members m ON u.user_id = m.user_id
    LEFT JOIN hits h ON u.user_id = h.user_id
    ORDER BY u.user_id
    """,
)
def q77_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership sketch: the top-{_BF_TOP} error-heavy
    users populate a {_BF_K}-lane × {_BF_M}-bit filter; every distinct
    user probes it. Output is (user_id, is_member, bloom_positive) —
    the filter must never miss a member (bloom_positive ⊇ is_member)
    and, at this deliberately small width, DOES produce false
    positives, so the estimate column differs from ground truth and
    the oracle check is non-vacuous.

    Scale shape: the bit set is ≤ k×m rows regardless of member count
    and broadcasts to the probe side — the same shape Spark itself
    uses for runtime bloom-filter join pruning; membership is a
    broadcast join + count, never a shuffle of the probed corpus."""
    e = load_table(spark, sf_dir, "events")
    members = (
        e.where(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(_BF_TOP)
        .select("user_id")
    )
    lanes = ", ".join(
        f"named_struct('lane', {i}, 'bit', {_SPARK_BUCKET.format(start=1 + 8 * i, w=_BF_M)})"
        for i in range(_BF_K)
    )
    def _lanes(df):
        return (
            df.withColumn("__h", F.md5(F.col("user_id").cast("string")))
            .select("user_id", F.explode(F.expr(f"array({lanes})")).alias("lb"))
            .select("user_id", "lb.lane", "lb.bit")
        )

    bits = _lanes(members).select("lane", "bit").distinct()
    users = e.select("user_id").distinct()
    hits = (
        _lanes(users)
        .join(F.broadcast(bits), ["lane", "bit"])
        .groupBy("user_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        users.join(members.withColumn("__m", F.lit(True)), "user_id", "left")
        .join(hits, "user_id", "left")
        .select(
            "user_id",
            F.coalesce("__m", F.lit(False)).alias("is_member"),
            (F.coalesce("n_hits", F.lit(0)) == _BF_K).alias("bloom_positive"),
        )
        .orderBy("user_id")
    )


_HLL_M = 256          # registers (2^8)
_HLL_RHO_CAP = 40     # cap leading-zero rank so Σ 2^-M stays a dyadic
                      # rational on ≤ 48 mantissa bits → the double sum
                      # is EXACT and order-independent in both engines
_HLL_ALPHA_M2 = "47072.71267120224"  # repr(0.7213/(1+1.079/256)*256*256)

# 60-bit hash from 15 md5 hex chars; low 8 bits pick the register, the
# remaining 52 feed the leading-zero rank
_HLL_DUCK_H = "CAST(concat('0x', substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT)"
_HLL_SPARK_H = "CAST(conv(substring(md5(CAST(o_custkey AS STRING)), 1, 15), 16, 10) AS BIGINT)"


@register(
    "q104_hyperloglog",
    oracle=f"""
    WITH hashed AS (
      SELECT o_orderpriority, {_HLL_DUCK_H} AS h FROM orders
    ),
    regs AS (
      SELECT o_orderpriority, h % {_HLL_M} AS idx,
             MAX(CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_RHO_CAP}
                 ELSE LEAST(instr(lpad(bin(h // {_HLL_M}), 52, '0'), '1'), {_HLL_RHO_CAP})
                 END) AS m
      FROM hashed GROUP BY o_orderpriority, h % {_HLL_M}
    ),
    per_group AS (
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n_registers,
             SUM(pow(2.0, -m)) AS s_present,
             md5(string_agg(concat(CAST(idx AS VARCHAR), ':', CAST(m AS VARCHAR)), ','
                 ORDER BY idx)) AS reg_digest
      FROM regs GROUP BY o_orderpriority
    ),
    exact AS (
      SELECT o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
      FROM orders GROUP BY o_orderpriority
    )
    SELECT p.o_orderpriority, e.n_exact, p.n_registers,
           CAST(floor(CAST('{_HLL_ALPHA_M2}' AS DOUBLE)
                / (({_HLL_M} - p.n_registers) + p.s_present)) AS BIGINT) AS hll_floor,
           CAST((CAST(floor(CAST('{_HLL_ALPHA_M2}' AS DOUBLE)
                / (({_HLL_M} - p.n_registers) + p.s_present)) AS BIGINT) - e.n_exact)
                * 1000000 // e.n_exact AS BIGINT) AS err_ppm,
           p.reg_digest
    FROM per_group p JOIN exact e USING (o_orderpriority)
    ORDER BY o_orderpriority
    """,
)
def q104_hyperloglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-customer estimates per order priority —
    the third mergeable sketch (CMS counts q75, Bloom membership q77,
    HLL cardinality here), built so the FLOAT estimate is bit-exact
    across engines: register ranks are capped at {_HLL_RHO_CAP} so
    every 2^-M term and every partial sum is a dyadic rational on
    ≤ 48 mantissa bits — double addition is then EXACT and
    order-independent, and the single α·m²/S division is one IEEE op
    on identical inputs. The register table itself is also digested
    (md5 over idx:rank pairs) so the oracle pins the sketch STATE,
    not just the estimate.

    Scale shape: state is ≤ {_HLL_M} registers per group regardless of
    corpus size, built by one map-side-combining MAX aggregation —
    the same property that makes HLL a streaming/rollup-mergeable
    aggregate (register-wise MAX). Production small-range correction
    (linear counting) needs ln(), which is libm-dependent and would
    break the cross-engine hash — documented trade, same reason q56
    uses a log-free idf."""
    o = load_table(spark, sf_dir, "orders").select("o_orderpriority", "o_custkey")
    hashed = o.select("o_orderpriority", F.expr(_HLL_SPARK_H).alias("h"))
    regs = (
        hashed.groupBy("o_orderpriority", (F.col("h") % _HLL_M).alias("idx"))
        .agg(
            F.max(
                F.expr(
                    f"CASE WHEN h div {_HLL_M} = 0 THEN {_HLL_RHO_CAP} "
                    f"ELSE LEAST(instr(lpad(bin(h div {_HLL_M}), 52, '0'), '1'), {_HLL_RHO_CAP}) END"
                )
            ).alias("m")
        )
    )
    per_group = regs.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("s_present"),
        F.md5(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(idx, m))),"
                " x -> concat(CAST(x.idx AS STRING), ':', CAST(x.m AS STRING))), ',')"
            )
        ).alias("reg_digest"),
    )
    exact = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").cast("long").alias("n_exact")
    )
    est = F.floor(
        F.expr(f"CAST('{_HLL_ALPHA_M2}' AS DOUBLE)")
        / ((F.lit(_HLL_M) - F.col("n_registers")) + F.col("s_present"))
    ).cast("long")
    return (
        per_group.join(exact, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_exact",
            "n_registers",
            est.alias("hll_floor"),
            F.expr(
                f"CAST((CAST(floor(CAST('{_HLL_ALPHA_M2}' AS DOUBLE)"
                f" / (({_HLL_M} - n_registers) + s_present)) AS BIGINT) - n_exact)"
                f" * 1000000 div n_exact AS BIGINT)"
            ).alias("err_ppm"),
            "reg_digest",
        )
        .orderBy("o_orderpriority")
    )


_HQ_BINS = 64


@register(
    "q122_histogram_quantiles",
    oracle=f"""
    WITH v AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    ),
    st AS (SELECT MIN(cents) AS mn, MAX(cents) AS mx FROM v),
    binned AS (
      SELECT flag,
             LEAST((cents - mn) * {_HQ_BINS} // (mx - mn + 1), {_HQ_BINS - 1}) AS bin
      FROM v, st
    ),
    hist AS (
      SELECT flag, bin, CAST(count(*) AS BIGINT) AS cnt
      FROM binned GROUP BY 1, 2
    ),
    cum AS (
      SELECT flag, bin, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY flag ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM hist
    ),
    tot AS (SELECT flag, CAST(SUM(cnt) AS BIGINT) AS n FROM hist GROUP BY 1),
    qs AS (SELECT 50 AS q_pct UNION ALL SELECT 95),
    hit AS (
      SELECT c.flag, q.q_pct, t.n, MIN(c.bin) AS bin
      FROM cum c JOIN tot t USING (flag) CROSS JOIN qs q
      WHERE c.cum >= (t.n * q.q_pct + 99) // 100
      GROUP BY 1, 2, 3
    )
    SELECT h.flag AS l_returnflag, CAST(h.q_pct AS BIGINT) AS q_pct, h.n,
           CAST(h.bin AS BIGINT) AS bin,
           st.mn + h.bin * (st.mx - st.mn + 1) // {_HQ_BINS} AS bin_lo_cents,
           c.cum
    FROM hit h JOIN cum c ON h.flag = c.flag AND h.bin = c.bin, st
    ORDER BY l_returnflag, q_pct
    """,
)
def q122_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bin histogram quantile sketch — the quantile
    member of the sketch family (CMS = frequency, Bloom = membership,
    HLL = cardinality): per return flag, a {_HQ_BINS}-bin equi-width
    histogram over exact price cents answers p50/p95 as the first bin
    whose cumulative count reaches ⌈q·n⌉, with the bin's left edge as
    the estimate (error ≤ one bin width by construction).

    The state is ≤ {_HQ_BINS} counters per group — mergeable by
    addition across partitions/days exactly like the other sketches,
    which is what a 100 TB rollup stores instead of raw values.
    Integer-exact end to end: prices become cents via floor(x·100+0.5)
    (both engines' IEEE doubles agree), bins are integer div, the
    cumsum window runs over ≤ {_HQ_BINS} rows per group. One shuffle
    builds the histogram; everything after is broadcast-sized."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    st = li.agg(F.min("cents").alias("mn"), F.max("cents").alias("mx"))
    binned = li.crossJoin(F.broadcast(st)).select(
        "flag",
        F.expr(
            f"LEAST((cents - mn) * {_HQ_BINS} div (mx - mn + 1), {_HQ_BINS - 1})"
        ).alias("bin"),
    )
    hist = binned.groupBy("flag", "bin").agg(F.count("*").cast("long").alias("cnt"))
    w = (
        Window.partitionBy("flag")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = materialize(
        hist.select("flag", "bin", "cnt", F.sum("cnt").over(w).alias("cum")),
        label="quantile_hist_cum",
        default="checkpoint",
    )
    tot = hist.groupBy("flag").agg(F.sum("cnt").cast("long").alias("n"))
    qs = cum.sparkSession.range(1).selectExpr("50 AS q_pct").union(
        cum.sparkSession.range(1).selectExpr("95 AS q_pct")
    )
    hit = (
        cum.join(F.broadcast(tot), "flag")
        .crossJoin(F.broadcast(qs))
        .where(F.expr("cum >= (n * q_pct + 99) div 100"))
        .groupBy("flag", "q_pct", "n")
        .agg(F.min("bin").alias("bin"))
    )
    return (
        hit.join(cum.select("flag", "bin", "cum"), ["flag", "bin"])
        .crossJoin(F.broadcast(st))
        .select(
            F.col("flag").alias("l_returnflag"),
            F.col("q_pct").cast("long").alias("q_pct"),
            "n",
            F.col("bin").cast("long").alias("bin"),
            F.expr(f"mn + bin * (mx - mn + 1) div {_HQ_BINS}").alias("bin_lo_cents"),
            "cum",
        )
        .orderBy("l_returnflag", "q_pct")
    )
