"""Data-layout planning — Z-order clustering with zone-map pruning.

The read-side complement of :mod:`.compaction` (which sizes output
shards): HOW rows are ordered across files decides how many files a
selective scan must open. A single-column sort serves one predicate
dimension; Z-ORDER interleaves the bits of several dimensions so
files stay simultaneously narrow in all of them — the standard
lakehouse ``OPTIMIZE ZORDER BY`` primitive — and per-file min/max
ZONE MAPS then let a scan prune files without opening them (what
parquet row-group stats / Delta file stats do at 100 TB).

Everything here is integer-exact and engine-portable:

- dimension codes quantize each value to 16 bits against the GLOBAL
  min/max — ``(v − min)·65535 div (max − min)`` — exact BIGINT ops
  (the ts span in micros × 65535 stays far under 2⁶³);
- the z-value is an UNROLLED 32-term bit interleave using only
  div/%/× with literal powers of two (no engine bit-op dialects);
- file assignment divides the code space evenly — files are z-ranges,
  so the plan needs NO sort at all to be demonstrated; a real writer
  materializes it with ``repartitionByRange(zval)`` + sortWithin.

The pruning DEMO compares the same selective predicate against two
layouts of the same rows — z-order vs single-dimension — so the
output quantifies the benefit: the fraction of files whose zone map
overlaps the predicate.

100 TB story: codes and z-values are a narrow map (global min/max is
one tiny broadcast agg); zone maps are one aggregation on the uniform
file key. Nothing shuffles except that one agg — layout planning
costs one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interleave_sql", "zone_map_layout", "N_FILES", "BITS"]

BITS = 16
N_FILES = 32


def interleave_sql(xu: str, yu: str, *, div_op: str = "div", bits: int = BITS) -> str:
    """Bit-interleave two ``bits``-wide codes (x gets the odd bit
    positions). ``div_op`` is ``div`` for Spark SQL, ``//`` for
    DuckDB — the only dialect difference; every term uses literal
    powers of two so no engine bit-operators are involved."""
    terms = []
    for b in range(bits):
        terms.append(f"((({xu}) {div_op} {1 << b}) % 2) * {1 << (2 * b + 1)}")
        terms.append(f"((({yu}) {div_op} {1 << b}) % 2) * {1 << (2 * b)}")
    return " + ".join(terms)


def zone_map_layout(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    n_files: int = N_FILES,
) -> DataFrame:
    """Plan two file layouts of the same rows and their zone maps.

    ``x_col``/``y_col`` are BIGINT dimension columns (cast timestamps
    to epoch micros first). Returns one row per (layout, file_id) —
    layout 'zorder' (bit-interleaved codes) or 'linear' (y-only
    order) — with the file's zone map (min/max of both dims), row
    count, and ``hit``: whether a fixed selective x-range predicate
    (the middle 5% of the x span) overlaps the zone map, i.e. whether
    a pruning scan must open the file.
    """
    for c in (x_col, y_col):
        if c not in df.columns:
            raise ValueError(f"zone_map_layout: column {c!r} not in df")
    if n_files < 1:
        raise ValueError(f"zone_map_layout: n_files must be >= 1, got {n_files}")

    stats = df.agg(
        F.min(x_col).cast("long").alias("xmin"),
        F.max(x_col).cast("long").alias("xmax"),
        F.min(y_col).cast("long").alias("ymin"),
        F.max(y_col).cast("long").alias("ymax"),
    )
    top = (1 << BITS) - 1
    coded = df.crossJoin(F.broadcast(stats)).select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        F.expr(
            f"CASE WHEN xmax = xmin THEN 0 ELSE (CAST({x_col} AS BIGINT) - xmin) * {top} div (xmax - xmin) END"
        ).alias("xu"),
        F.expr(
            f"CASE WHEN ymax = ymin THEN 0 ELSE (CAST({y_col} AS BIGINT) - ymin) * {top} div (ymax - ymin) END"
        ).alias("yu"),
        "xmin",
        "xmax",
    )
    z_span = 1 << (2 * BITS)
    zed = coded.select(
        "x",
        "y",
        "xmin",
        "xmax",
        F.expr(f"({interleave_sql('xu', 'yu')}) * {n_files} div {z_span}").alias("zfile"),
        F.expr(f"yu * {n_files} div {1 << BITS}").alias("lfile"),
    )
    both = zed.select(
        F.lit("zorder").alias("layout"), F.col("zfile").alias("file_id"), "x", "y", "xmin", "xmax"
    ).unionByName(
        zed.select(
            F.lit("linear").alias("layout"), F.col("lfile").alias("file_id"), "x", "y", "xmin", "xmax"
        )
    )
    # predicate: the middle 5% of the x span — [40%, 45%) of the range
    zm = both.groupBy("layout", "file_id").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        F.first("xmin").alias("xmin"),
        F.first("xmax").alias("xmax"),
    )
    lo = "xmin + (xmax - xmin) * 2 div 5"
    hi = "xmin + (xmax - xmin) * 9 div 20"
    return zm.select(
        "layout",
        F.col("file_id").cast("long").alias("file_id"),
        "n_rows",
        "min_x",
        "max_x",
        "min_y",
        "max_y",
        F.expr(f"NOT (max_x < ({lo}) OR min_x > ({hi}))").alias("hit"),
    )
