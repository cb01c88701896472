"""CDC merge (UPSERT/DELETE) — apply a change feed to a snapshot.

The MERGE INTO shape every warehouse pipeline runs to maintain a
mutable table from an append-only change stream. Spark's native MERGE
needs a v2 catalog table (Delta/Iceberg); over plain columnar
snapshots the operator is this composition: full-outer join the
snapshot with the keyed change batch, drop deleted keys, and let
non-null change values override snapshot values (partial updates:
a NULL change column falls back to the snapshot).

Why this is the 100 TB plan: the join is one shuffle on the uniform
primary key — and in production the snapshot is bucketed/partitioned
by that key, so only the change batch (the sliver) moves. The
full-outer side-ness is required: inserts exist only in the change
feed, kept rows only in the snapshot. Action provenance
('kept'/'updated'/'inserted') is emitted per row so downstream
incremental consumers (e.g. the q70 dedup-index maintainer) can react
to exactly the changed sliver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Apply ``changes`` (columns: ``key``, ``op_col``, plus any subset
    of ``base``'s value columns) to ``base``.

    Rows whose ``op_col`` equals ``delete_op`` remove the key; every
    other change row upserts — matched keys take the change's non-null
    column values (MERGE WHEN MATCHED UPDATE), unmatched keys insert
    (WHEN NOT MATCHED INSERT). Returns ``base``'s schema plus an
    ``action`` column ('kept' | 'updated' | 'inserted').
    """
    if key not in base.columns or key not in changes.columns:
        raise ValueError(f"merge_upsert: key {key!r} must be in both inputs")
    if op_col not in changes.columns:
        raise ValueError(f"merge_upsert: op column {op_col!r} not in changes")
    if "action" in base.columns:
        raise ValueError("merge_upsert: base already has an 'action' column")
    change_vals = [c for c in changes.columns if c not in (key, op_col)]
    unknown = [c for c in change_vals if c not in base.columns]
    if unknown:
        raise ValueError(f"merge_upsert: change columns {unknown} not in base")

    b = base.select(
        F.col(key).alias("__bk"),
        *[F.col(c).alias(f"__b_{c}") for c in base.columns if c != key],
    )
    ch = changes.select(
        F.col(key).alias("__ck"),
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(f"__c_{c}") for c in change_vals],
    )
    joined = b.join(ch, b["__bk"] == ch["__ck"], "full_outer").where(
        F.col("__op").isNull() | (F.col("__op") != delete_op)
    )
    out_cols = [F.coalesce("__bk", "__ck").alias(key)]
    for c in base.columns:
        if c == key:
            continue
        if c in change_vals:
            out_cols.append(F.coalesce(f"__c_{c}", f"__b_{c}").alias(c))
        else:
            out_cols.append(F.col(f"__b_{c}").alias(c))
    out_cols.append(
        F.when(F.col("__ck").isNull(), "kept")
        .when(F.col("__bk").isNull(), "inserted")
        .otherwise("updated")
        .alias("action")
    )
    return joined.select(*out_cols)


def scd2_history(
    snapshot: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    ts_col: str,
    tiebreak_col: str,
    snapshot_ts: str,
) -> DataFrame:
    """Build a Type-2 slowly-changing-dimension history: the snapshot
    row (stamped ``snapshot_ts``, which must precede every change)
    plus one row per change, interval-versioned per key.

    ``changes`` must carry ``key``, ``ts_col``, ``tiebreak_col`` (a
    unique-ordering column for same-timestamp changes) and the same
    value columns as ``snapshot``. Output adds ``version_seq``
    (1-based per key), ``valid_from``, ``valid_to`` (NULL = current)
    and ``is_current``. Pair the result with
    :func:`..asof.asof_join` for point-in-time-correct enrichment —
    the feature-store pattern.

    One shuffle on the key for the interval window; at scale the
    history table is partitioned on the key and appended per batch
    (only the previous current row per changed key is re-closed).
    """
    for side, df, cols in (
        ("snapshot", snapshot, (key,)),
        ("changes", changes, (key, ts_col, tiebreak_col)),
    ):
        missing = [c for c in cols if c not in df.columns]
        if missing:
            raise ValueError(f"scd2_history: {side} lacks columns {missing}")
    value_cols = [c for c in snapshot.columns if c != key]
    missing = [c for c in value_cols if c not in changes.columns]
    if missing:
        raise ValueError(f"scd2_history: changes lack snapshot value columns {missing}")

    from pyspark.sql import Window

    snap = snapshot.select(
        key,
        F.lit(snapshot_ts).cast("timestamp").alias("__vf"),
        F.lit(-1).cast("long").alias("__tb"),
        *value_cols,
    )
    ch = changes.select(
        key,
        F.col(ts_col).cast("timestamp").alias("__vf"),
        F.col(tiebreak_col).cast("long").alias("__tb"),
        *value_cols,
    )
    w = Window.partitionBy(key).orderBy("__vf", "__tb")
    return (
        snap.unionByName(ch)
        .withColumn("version_seq", F.row_number().over(w))
        .withColumn("valid_to", F.lead("__vf").over(w))
        .select(
            key,
            "version_seq",
            F.col("__vf").alias("valid_from"),
            "valid_to",
            *value_cols,
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
