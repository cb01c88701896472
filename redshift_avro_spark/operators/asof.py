"""As-of (point-in-time) join — an operator Spark has no built-in for.

For each left row, attach the most recent right row with
``right.ts <= left.ts`` for the same key (the standard time-series
enrichment: trade→quote, event→last-config-change, error→last-signup).

Implementation is the scalable union+window composition, NOT a range
join: tag both sides, union them, and run ``last(..., ignorenulls)``
over a window ordered by (ts, side) per key. One shuffle on the key,
state per row is a single struct — no per-key buffering beyond the
window frame, no quadratic candidate expansion, and skewed keys behave
exactly like any window (salt if a single key dominates).

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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    tiebreak_col: Optional[str] = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``value_cols`` (and
    the timestamp, as ``{ts_col}{suffix}``) from the latest ``right``
    row at-or-before it on ``ts_col``, matched on key columns ``on``.

    ``tiebreak_col`` (default: first of ``value_cols``) makes the
    choice among right rows sharing (key, ts) deterministic: the max
    tiebreak wins, mirroring a ``row_number() ... ORDER BY ts DESC,
    tiebreak DESC`` dedup in SQL."""
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
    # right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    # right row at exactly left.ts is visible to it — ASOF's `<=`
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = tagged_l.unionByName(tagged_r).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out_cols = (
        [F.col(c) for c in left_cols]
        + [F.col(f"__match.{ts_col}{suffix}").alias(f"{ts_col}{suffix}")]
        + [F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in value_cols]
    )
    return enriched.where(F.col("__side") == 1).select(*out_cols)
