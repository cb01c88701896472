"""Deduplication operators.

Every function is built from Catalyst expressions (md5, higher-order
array functions, joins) so the plan codegens and distributes; the only
shuffles are the ones the algorithm requires (group-by content hash,
LSH bucket join). Hash-function choice (md5 prefixes) is deliberately
SQL-portable so each operator has an exact DuckDB oracle.

Scale notes (100 TB):
- exact dedup shuffles once on a 128-bit content hash — uniform keys,
  no skew.
- MinHash LSH: signature computation is a narrow map; the candidate
  join shuffles on (band index ++ band key) — band keys are uniform by
  construction. Pair verification only touches candidates.
- SimHash uses explode + two grouped aggregations (vote then pack) —
  pure shuffle-based, no per-row Python, no O(n²) stage.
- n-gram Jaccard is O(n²) by nature: gate it behind a prefilter and use
  it as the VERIFY stage after LSH, never as the discovery stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "content_hash",
    "exact_dup_groups",
    "minhash_signature",
    "lsh_band_keys",
    "minhash_candidate_pairs",
    "simhash_fingerprints",
    "ngram_jaccard_pairs",
]


def _words(text_col: str) -> str:
    """Normalized word array (SQL fragment shared with oracles)."""
    return f"split(trim(lower({text_col})), '\\\\s+')"


def content_hash(col) -> Column:
    """128-bit content hash for exact dedup (uniform shuffle key)."""
    return F.md5(col)


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups: hash-groupBy on content hash.

    Returns (content_h, n_dups, keeper_id) for groups with >1 member —
    the keeper is the smallest id (deterministic survivor policy)."""
    return (
        df.groupBy(content_hash(F.col(text_col)).alias("content_h"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .where(F.col("n_dups") > 1)
    )


def minhash_signature(text_col: str, n_hashes: int = 12, shingle_k: int = 3) -> Column:
    """MinHash signature as array<string> of length ``n_hashes``.

    Shingles are ``shingle_k``-word windows; hash_i(s) = md5('i|' || s);
    the minimum hex string per seed is a valid minhash (md5 is uniform
    over strings, lexicographic min == numeric min of the hex). Pure
    Catalyst expression: transform + array_min.

    Docs with fewer than ``shingle_k`` words get a NULL signature (the
    sequence guard matters: Spark's sequence(1, n) DESCENDS for n<1)."""
    words = _words(text_col)
    shingles = (
        f"transform(sequence(1, size({words}) - {shingle_k - 1}), "
        f"i -> array_join(slice({words}, i, {shingle_k}), ' '))"
    )
    seeds = ", ".join(f"'{i}'" for i in range(n_hashes))
    return F.when(
        F.expr(f"size({words})") >= shingle_k,
        F.expr(
            f"transform(array({seeds}), "
            f"seed -> array_min(transform({shingles}, s -> md5(concat(seed, '|', s)))))"
        ),
    ).otherwise(F.lit(None))


def lsh_band_keys(sig_col: str, n_hashes: int = 12, rows_per_band: int = 3) -> Column:
    """Band keys: concat ``rows_per_band`` consecutive minhashes per
    band, prefixed with the band index so one equi-join key suffices."""
    n_bands = n_hashes // rows_per_band
    keys = [
        f"concat('{b}:', " + ", ".join(f"{sig_col}[{b * rows_per_band + r}]" for r in range(rows_per_band)) + ")"
        for b in range(n_bands)
    ]
    return F.expr(f"array({', '.join(keys)})")


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 12,
    shingle_k: int = 3,
    rows_per_band: int = 3,
) -> DataFrame:
    """MinHash-LSH near-duplicate CANDIDATE pairs (id_a < id_b).

    shingle → minhash → band → bucket self-join: two docs pair iff they
    collide in ≥1 band. The join key is uniform (md5-derived), so the
    shuffle has no skew; distinct() collapses multi-band collisions.

    The signature computation is staged through explicit projections
    (words → shingles → signature) with a repartition first: a single
    small input file would otherwise evaluate the whole md5 workload on
    one core, and the staging keeps each array materialized once per
    row instead of re-derived inside every seed's lambda."""
    n_part = df.sparkSession.sparkContext.defaultParallelism * 2
    words = _words("__text")
    shingles = (
        f"transform(sequence(1, size(__w) - {shingle_k - 1}), "
        f"i -> array_join(slice(__w, i, {shingle_k}), ' '))"
    )
    seeds = ", ".join(f"'{i}'" for i in range(n_hashes))
    sig = (
        f"transform(array({seeds}), "
        f"seed -> array_min(transform(__sh, s -> md5(concat(seed, '|', s)))))"
    )
    sigs = (
        df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))
        .repartition(n_part, "__id")
        .select("__id", F.expr(words).alias("__w"))
        .where(F.size("__w") >= shingle_k)
        .select("__id", F.expr(shingles).alias("__sh"))
        .select("__id", F.expr(sig).alias("sig"))
    )
    banded = sigs.select(
        "__id", F.explode(lsh_band_keys("sig", n_hashes, rows_per_band)).alias("band_key")
    )
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(right, (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a.__id") < F.col("b.__id")))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """SimHash fingerprint per document, shuffle-based (scales to any
    doc length — no nested higher-order lambdas):

    1. explode distinct words; token hash = first 60 md5 bits as BIGINT
    2. cross join bit positions 0..bits-1; vote +1/−1 per (doc, bit)
    3. pack winning bits into one BIGINT fingerprint
    """
    words = F.expr(f"array_distinct({_words(text_col)})")
    tokens = df.select(F.col(id_col).alias("__id"), F.explode(words).alias("w")).withColumn(
        "h", F.expr("CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT)")
    )
    bits_df = df.sparkSession.range(bits).select(F.col("id").cast("int").alias("b"))
    votes = (
        tokens.crossJoin(F.broadcast(bits_df))
        .groupBy("__id", "b")
        .agg(F.sum(F.expr("2 * ((h >> b) & 1) - 1")).alias("vote"))
    )
    return (
        votes.groupBy("__id")
        .agg(F.sum(F.expr("CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END")).alias("simhash"))
        .select(F.col("__id").alias(id_col), "simhash")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact character-n-gram Jaccard similarity for pairs.

    With ``candidates`` (id_a, id_b — e.g. LSH output) this is the
    verify stage and touches only candidate pairs; without, it
    cross-joins (quadratic — only for small/filtered inputs)."""
    grams = F.expr(
        f"array_distinct(transform(sequence(1, length({text_col}) - {n - 1}), "
        f"i -> substring({text_col}, i, {n})))"
    )
    g = df.select(F.col(id_col).alias("__id"), grams.alias("grams")).where(
        F.expr(f"length({text_col})") >= n
    )
    if candidates is not None:
        pairs = (
            candidates.join(g.withColumnRenamed("__id", "id_a").withColumnRenamed("grams", "grams_a"), "id_a")
            .join(g.withColumnRenamed("__id", "id_b").withColumnRenamed("grams", "grams_b"), "id_b")
        )
    else:
        a = g.select(F.col("__id").alias("id_a"), F.col("grams").alias("grams_a"))
        b = g.select(F.col("__id").alias("id_b"), F.col("grams").alias("grams_b"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size("grams_a") + F.size("grams_b") - inter
    return (
        pairs.select(
            "id_a",
            "id_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
