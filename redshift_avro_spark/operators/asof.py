"""As-of (point-in-time) join — an operator Spark has no built-in for.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` for the same key (the standard time-series
enrichment: trade→quote, event→last-config-change, error→last-signup).

Implementation is the scalable union+window composition, NOT a range
join: tag both sides, union them, and run ``last(..., ignorenulls)``
over a window ordered by (ts, side) per key. One shuffle on the key,
state per row is a single struct — no per-key buffering beyond the
window frame, no quadratic candidate expansion.

A pathologically hot key (one user producing a large share of the
corpus) would serialize its window partition; ``salt_interval_s``
switches to a two-level plan that splits each key's timeline into
fixed time slices, windows within (key, slice) in parallel, and
carries the latest payload across slice boundaries via a tiny
per-(key, slice) summary — parallelism becomes #slices even for a
single dominant key. See :func:`asof_join`.

DuckDB implements ASOF JOIN natively, which gives the oracle for free
and pins the semantics: ties (right.ts == left.ts) match, and among
equal right timestamps the LAST one in (ts, tiebreak) order wins —
the union puts right rows before left rows at equal ts so ``last``
sees them, and a deterministic tiebreak column makes equal-ts right
rows unambiguous in both engines.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]

_RESERVED = ("__side", "__payload", "__match", "__rn", "__slice", "__carry")


def _validate(left: DataFrame, right: DataFrame, on, ts_col, value_cols) -> None:
    if not value_cols:
        raise ValueError(
            "asof_join: value_cols must name at least one right-side column to "
            "attach (it also provides the default equal-ts tiebreak)"
        )
    for side, df in (("left", left), ("right", right)):
        clash = [c for c in df.columns if c in _RESERVED]
        if clash:
            raise ValueError(
                f"asof_join: {side} input contains reserved working column(s) "
                f"{clash}; rename them (the composition uses {_RESERVED} internally)"
            )
    for c in (*on, ts_col):
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"asof_join: key/ts column {c!r} must exist on both sides")
    missing = [c for c in value_cols if c not in right.columns]
    if missing:
        raise ValueError(f"asof_join: value_cols {missing} not in right side")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    tiebreak_col: Optional[str] = None,
    suffix: str = "_asof",
    salt_interval_s: Optional[int] = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``value_cols`` (and
    the timestamp, as ``{ts_col}{suffix}``) from the latest ``right``
    row at-or-before it on ``ts_col``, matched on key columns ``on``.

    ``tiebreak_col`` (default: first of ``value_cols``) makes the
    choice among right rows sharing (key, ts) deterministic: the max
    tiebreak wins, mirroring a ``row_number() ... ORDER BY ts DESC,
    tiebreak DESC`` dedup in SQL.

    ``salt_interval_s`` enables the hot-key-safe two-level plan: rows
    are sliced into ``floor(epoch_seconds / interval)`` time buckets,
    the as-of window runs within (key, slice), and rows with no
    within-slice predecessor take the carried last-payload of all
    EARLIER slices (computed on a per-(key, slice) summary that is
    tiny regardless of skew, then joined back). Results are identical
    to the unsalted plan (test_asof.py proves equality on a
    single-dominant-key corpus); cost is one extra small shuffle."""
    _validate(left, right, on, ts_col, value_cols)
    tiebreak = tiebreak_col or value_cols[0]
    # right side first deduped to one row per (key, ts): keep max tiebreak
    w_dedup = Window.partitionBy(*on, ts_col).orderBy(F.desc(tiebreak))
    r = (
        right.withColumn("__rn", F.row_number().over(w_dedup))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    payload = F.struct(F.col(ts_col).alias(f"{ts_col}{suffix}"), *[F.col(c) for c in value_cols])
    left_cols = left.columns
    tagged_r = r.select(
        *[F.col(c) for c in on],
        F.col(ts_col),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in on and c != ts_col],
    )
    tagged_l = left.select(
        *[F.col(c) for c in on],
        F.col(ts_col),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tagged_r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in left_cols if c not in on and c != ts_col],
    )
    unioned = tagged_l.unionByName(tagged_r)
    out_cols = (
        [F.col(c) for c in left_cols]
        + [F.col(f"__match.{ts_col}{suffix}").alias(f"{ts_col}{suffix}")]
        + [F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in value_cols]
    )

    if salt_interval_s is None:
        # right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
        # right row at exactly left.ts is visible to it — ASOF's `<=`
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        enriched = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        return enriched.where(F.col("__side") == 1).select(*out_cols)

    # ---- two-level (hot-key-safe) plan -----------------------------
    # slice by a pure function of ts, identical on both sides, so the
    # shuffle key (key, slice) splits a dominant key across tasks
    from pyspark.sql import types as T

    ts_type = unioned.schema[ts_col].dataType
    if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        slice_expr = F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp")) / (salt_interval_s * 1_000_000)
        )
    else:  # numeric event time (epoch seconds / logical ticks)
        slice_expr = F.floor(F.col(ts_col) / salt_interval_s)
    sliced = unioned.withColumn("__slice", slice_expr)
    w_in = (
        Window.partitionBy(*on, "__slice")
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = sliced.withColumn("__match", F.last("__payload", ignorenulls=True).over(w_in))
    # per-(key, slice) summary: the last right payload of the slice.
    # ≤ one row per (key, slice) regardless of skew, so the cross-slice
    # carry window below is over a tiny frame.
    summary = (
        sliced.where(F.col("__side") == 0)
        .groupBy(*on, "__slice")
        .agg(F.max_by("__payload", F.struct(F.col(ts_col), F.lit(0))).alias("__last_in_slice"))
    )
    # carry(key, slice) = last right payload over all EARLIER slices,
    # computed on the complete (key, slice) grid (slices with no right
    # rows must still inherit the carry of the nearest earlier slice
    # that has one — joining the summary onto the grid FIRST makes the
    # strictly-preceding frame see it)
    all_slices = sliced.select(*on, "__slice").distinct()
    w_carry = (
        Window.partitionBy(*on)
        .orderBy(F.col("__slice").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_full = (
        all_slices.join(summary, [*on, "__slice"], "left")
        .withColumn("__carry", F.last("__last_in_slice", ignorenulls=True).over(w_carry))
        .select(*on, "__slice", "__carry")
    )
    enriched = (
        within.join(carry_full, [*on, "__slice"], "left")
        .withColumn("__match", F.coalesce("__match", "__carry"))
    )
    return enriched.where(F.col("__side") == 1).select(*out_cols)
