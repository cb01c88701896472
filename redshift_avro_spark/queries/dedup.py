"""Deduplication queries over the ``documents`` table.

Each query pairs an operator from :mod:`..operators.dedup` with a DuckDB
oracle that replicates the exact same hash/shingle/band construction —
both engines derive every hash from ``md5`` over identical strings, so
results match value-for-value:

  q30: exact dedup on a normalized content key (hash-groupBy)
  q31: MinHash+LSH near-dup candidate discovery (shingle → minhash →
       band → bucket self-join)
  q32: SimHash 32-bit fingerprints (explode → bit votes → pack)
  q33: LSH discovery + exact n-gram-Jaccard verify (the production
       two-stage shape: quadratic work only on candidates)
  q34: embedding-cosine near-dup pairs

Spark↔DuckDB dialect mapping used by the oracles (1-based lists in
DuckDB, 0-based arrays in Spark; ``conv(hex,16,10)`` ↔
``CAST('0x'||hex AS BIGINT)``; ``aggregate`` ↔ ``list_reduce`` with a
prepended init element; ``SUM(int)`` is HUGEINT in DuckDB so packed
fingerprints cast back to BIGINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import load_table, register
from ..operators.dedup import (
    _MH_COEFFS,
    _MH_P,
    DEFAULT_BAND_CAP,
    connected_components,
    exact_dup_groups,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from ..operators.staging import materialize

# normalized content key: sorted distinct lowercased words — catches
# reordered/repeated-word duplicates that byte-exact hashing misses
_NORM_SPARK = "array_join(array_sort(array_distinct(split(trim(lower(text)), '\\\\s+'))), ' ')"
_NORM_DUCK = (
    "array_to_string(list_sort(list_distinct("
    "regexp_split_to_array(trim(lower(text)), '\\s+'))), ' ')"
)

_WORDS_DUCK = "regexp_split_to_array(trim(lower(text)), '\\s+')"

# DuckDB CTE replicating minhash_candidate_pairs(n_hashes=12, shingle_k=3,
# rows_per_band=3) — shared by q31/q33 (over ``documents``) and q49
# (over the curation pipeline's survivor CTE)


def minhash_cte(source: str, band_cap: int = DEFAULT_BAND_CAP, prefix: str = "") -> str:
    """CTE chain sigs→banded→candidates over ``source`` (must expose
    doc_id + text), replicating minhash_candidate_pairs(12, 3, 3):
    one md5 per shingle, two 32-bit digest lanes, 12 universal-hash
    combos mod P, ':'-separated band keys, and the hot-band cap
    (bands with more than ``band_cap`` members drop out of candidate
    generation — semantically identical to the Spark operator's
    capped per-band pair explosion). ``prefix`` renames the CTEs
    (``{prefix}sigs`` …) so two instantiations can share one WITH
    clause (the incremental q70 oracle needs the chain per side)."""
    coeffs = ", ".join(f"[{a}, {b}]" for a, b in _MH_COEFFS)
    return f"""
    {prefix}sigs AS (
      SELECT id,
             list_transform([{coeffs}],
               c -> list_aggregate(
                 list_transform(list_zip(h1, h2),
                   p -> (c[1] * p[1] + c[2] * p[2]) % {_MH_P}), 'min')) AS sig
      FROM (
        SELECT id,
               list_transform(hx, x -> CAST(concat('0x', substring(x, 1, 8)) AS BIGINT)) AS h1,
               list_transform(hx, x -> CAST(concat('0x', substring(x, 9, 8)) AS BIGINT)) AS h2
        FROM (
          SELECT doc_id AS id, list_transform(shingles, s -> md5(s)) AS hx
          FROM (
            SELECT doc_id,
                   list_transform(generate_series(1, len(words) - 2),
                     i -> array_to_string(list_slice(words, i, i + 2), ' ')) AS shingles
            FROM (SELECT doc_id, {_WORDS_DUCK} AS words FROM {source})
            WHERE len(words) >= 3
          )
        )
      )
    ),
    {prefix}banded AS (
      SELECT id,
             unnest(list_transform(generate_series(0, 3),
               b -> concat(b, ':', sig[b*3 + 1], ':', sig[b*3 + 2], ':', sig[b*3 + 3]))) AS band_key
      FROM {prefix}sigs
    ),
    {prefix}candidates AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM {prefix}banded a
      JOIN {prefix}banded b ON a.band_key = b.band_key AND a.id < b.id
      JOIN (SELECT band_key FROM {prefix}banded GROUP BY band_key
            HAVING COUNT(*) <= {band_cap}) ok
        ON a.band_key = ok.band_key
    )
"""


_MINHASH_CTE = minhash_cte("documents")


@register(
    "q30_exact_dedup",
    oracle=f"""
    SELECT md5({_NORM_DUCK}) AS content_h,
           COUNT(*) AS n_dups,
           MIN(doc_id) AS keeper_id
    FROM documents
    GROUP BY content_h
    HAVING COUNT(*) > 1
    ORDER BY content_h
    """,
)
def q30_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy on a normalized content key. One
    shuffle on a uniform 128-bit hash — no skew at any scale; survivor
    policy is deterministic (min id)."""
    docs = load_table(spark, sf_dir, "documents").withColumn("norm_text", F.expr(_NORM_SPARK))
    return exact_dup_groups(docs, "doc_id", "norm_text").orderBy("content_h")


@register(
    "q31_minhash_lsh_candidates",
    oracle=f"""
    WITH {_MINHASH_CTE}
    SELECT id_a, id_b FROM candidates ORDER BY id_a, id_b
    """,
)
def q31_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: 12 minhashes over 3-word shingles,
    4 bands × 3 rows. The only shuffle is the band-key self-join, and
    band keys are md5-derived (uniform, no skew)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_candidate_pairs(
        docs, "doc_id", "text", n_hashes=12, shingle_k=3, rows_per_band=3
    ).orderBy("id_a", "id_b")


@register(
    "q32_simhash",
    oracle=f"""
    WITH tokens AS (
      SELECT doc_id, unnest(list_distinct({_WORDS_DUCK})) AS w FROM documents
    ),
    votes AS (
      SELECT doc_id, bits.b AS b,
             SUM(2 * ((CAST(concat('0x', substring(md5(w), 1, 15)) AS BIGINT) >> bits.b) & 1) - 1) AS vote
      FROM tokens CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) bits
      GROUP BY doc_id, bits.b
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN vote > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id ORDER BY doc_id
    """,
)
def q32_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document — explode + two grouped aggregations,
    no per-row Python, no quadratic stage."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_fingerprints(docs, "doc_id", "text", bits=32).orderBy("doc_id")


@register(
    "q33_lsh_jaccard_verify",
    oracle=f"""
    WITH {_MINHASH_CTE},
    grams AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(generate_series(1, length(text) - 2),
               i -> substring(text, i, 3))) AS g
      FROM documents WHERE length(text) >= 3
    )
    SELECT c.id_a, c.id_b,
           len(list_intersect(a.g, b.g)) / CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS DOUBLE) AS jaccard
    FROM candidates c
    JOIN grams a ON a.id = c.id_a
    JOIN grams b ON b.id = c.id_b
    WHERE len(list_intersect(a.g, b.g)) / CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS DOUBLE) >= 0.5
    ORDER BY id_a, id_b
    """,
)
def q33_lsh_jaccard_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production near-dup shape: LSH discovers candidates (linear
    shuffle), exact character-3-gram Jaccard verifies ONLY those pairs —
    quadratic work never touches the full corpus."""
    docs = load_table(spark, sf_dir, "documents")
    # the candidate subplan feeds the verify stage's member semi-join
    # AND its pair join; the eager lineage cut stops the whole band
    # aggregation from evaluating twice (same fix as q49 — measured
    # 3.37->2.58 s there at sf0.1)
    cands = materialize(
        minhash_candidate_pairs(docs, "doc_id", "text", 12, 3, 3),
        label="lsh_candidates",  # candidate sliver → checkpoint default
        default="checkpoint",
    )
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, candidates=cands
    ).orderBy("id_a", "id_b")


_JACCARD_DUCK = (
    "len(list_intersect(a.g, b.g)) / "
    "CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS DOUBLE)"
)


@register(
    "q63_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_CTE},
    grams AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(generate_series(1, length(text) - 2),
               i -> substring(text, i, 3))) AS g
      FROM documents WHERE length(text) >= 3
    ),
    verified AS (
      SELECT c.id_a, c.id_b
      FROM candidates c
      JOIN grams a ON a.id = c.id_a
      JOIN grams b ON b.id = c.id_b
      WHERE {_JACCARD_DUCK} >= 0.5
    ),
    sym AS (
      SELECT id_a AS u, id_b AS v FROM verified
      UNION
      SELECT id_b AS u, id_a AS v FROM verified
    ),
    reach AS (
      SELECT u AS src, u AS dst FROM sym
      UNION
      SELECT r.src, s.v AS dst FROM reach r JOIN sym s ON r.dst = s.u
    ),
    comp AS (SELECT src AS doc_id, MIN(dst) AS component_id FROM reach GROUP BY src),
    sizes AS (SELECT component_id, COUNT(*) AS cluster_size FROM comp GROUP BY component_id)
    SELECT c.doc_id, c.component_id, s.cluster_size,
           c.doc_id = c.component_id AS is_keeper
    FROM comp c JOIN sizes s USING (component_id)
    ORDER BY doc_id
    """,
)
def q63_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step after q33 that a real dedup pipeline needs: verified
    near-dup PAIRS folded into duplicate CLUSTERS via connected
    components (min-label propagation), so survivor selection is
    globally consistent (a~b, b~c keeps exactly one of {a,b,c}).
    Component id = min doc id in the cluster — deterministic, so the
    oracle replicates it with a recursive-CTE transitive closure
    (affordable for DuckDB at oracle scale; the Spark side propagates
    labels in O(diameter) shuffle rounds over the edge set only)."""
    docs = load_table(spark, sf_dir, "documents")
    # the candidate subplan feeds the verify stage's member semi-join
    # AND its pair join; the eager lineage cut stops the whole band
    # aggregation from evaluating twice (same fix as q49 — measured
    # 3.37->2.58 s there at sf0.1)
    cands = materialize(
        minhash_candidate_pairs(docs, "doc_id", "text", 12, 3, 3),
        label="lsh_candidates",  # candidate sliver → checkpoint default
        default="checkpoint",
    )
    verified = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, candidates=cands
    )
    comp = connected_components(verified, "id_a", "id_b").select(
        F.col("id").alias("doc_id"), "component_id"
    )
    sizes = comp.groupBy("component_id").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "component_id")
        .select(
            "doc_id",
            "component_id",
            "cluster_size",
            (F.col("doc_id") == F.col("component_id")).alias("is_keeper"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------- q160
# Edit-distance verification — the strictest verify tier: LSH discovers,
# Jaccard/containment screen cheaply, Levenshtein confirms character-
# exactly. Both engines implement the classic unit-cost DP, proven
# value-identical (tests/test_dedup_ops.py), so the oracle is exact.

_LEV_THRESHOLD_PPM = 200_000


@register(
    "q160_edit_distance_verify",
    oracle=f"""
    WITH {_MINHASH_CTE},
    t AS (
      SELECT c.id_a, c.id_b,
             CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
             CAST(greatest(length(a.text), length(b.text), 1) AS BIGINT) AS max_len
      FROM candidates c
      JOIN documents a ON a.doc_id = c.id_a
      JOIN documents b ON b.doc_id = c.id_b
    )
    SELECT id_a, id_b, lev, max_len,
           CAST(lev * 1000000 // max_len AS BIGINT) AS lev_ppm,
           CAST(CASE WHEN lev * 1000000 // max_len <= {_LEV_THRESHOLD_PPM}
                THEN 1 ELSE 0 END AS INTEGER) AS is_dup
    FROM t ORDER BY id_a, id_b
    """,
)
def q160_edit_distance_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein verification of every MinHash-LSH candidate pair:
    exact edit distance, the max-length normalizer, distance in exact
    integer ppm of the longer text, and the ≤20% verdict flag.

    The O(|a|·|b|) DP is the most expensive verify there is — the
    whole design point is that it only ever touches the banded
    candidate sliver (139 pairs at sf0.1, never the corpus), joined
    back to the text by two broadcast id equi-joins; the kernel is
    JVM-side ``levenshtein`` inside whole-stage codegen."""
    from ..operators.dedup import edit_distance_pairs

    docs = load_table(spark, sf_dir, "documents")
    # the candidate list feeds the pair join AND the b-side id probe
    # inside edit_distance_pairs — stage it like the other verifies
    cands = materialize(
        minhash_candidate_pairs(docs, "doc_id", "text", 12, 3, 3),
        label="lsh_candidates",
        default="checkpoint",
    )
    return edit_distance_pairs(
        docs, "doc_id", "text", cands, threshold_ppm=_LEV_THRESHOLD_PPM
    ).orderBy("id_a", "id_b")


_COS_DUCK = (
    "(list_aggregate(list_transform(list_zip(a.embedding, b.embedding),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum'))"
    " / (sqrt(list_aggregate(list_transform(a.embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    " * sqrt(list_aggregate(list_transform(b.embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))"
)


@register(
    "q34_embedding_near_dup",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_COS_DUCK}, 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_COS_DUCK} >= 0.45
    ORDER BY id_a, id_b
    """,
)
def q34_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.45). Quadratic
    candidate space — at 100 TB this runs per LSH bucket (q36's keys),
    shown here in full for the exactness oracle."""
    from ..operators.similarity import embedding_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.45, dim=64).orderBy(
        "id_a", "id_b"
    )


# ---------------------------------------------------------------- q70
# Incremental corpus ingest: screen an incoming batch (doc_id % 5 = 0)
# against the existing corpus (the rest) — exact content hash first,
# then LSH band-key probe against the corpus "index". The continuous
# corpus-building shape: each crawl checks against the accumulated
# index instead of re-deduping the world.

_INC_SRC = "(SELECT * FROM documents WHERE doc_id % 5 = 0) AS inc_src"
_EX_SRC = "(SELECT * FROM documents WHERE doc_id % 5 <> 0) AS ex_src"


@register(
    "q70_incremental_dedup",
    oracle=f"""
    WITH {minhash_cte(_INC_SRC, prefix="i_")},
    {minhash_cte(_EX_SRC, prefix="e_")},
    exact AS (
      SELECT DISTINCT i.doc_id
      FROM documents i
      WHERE i.doc_id % 5 = 0
        AND md5(i.text) IN (SELECT md5(e.text) FROM documents e WHERE e.doc_id % 5 <> 0)
    ),
    near AS (
      SELECT DISTINCT a.id AS doc_id
      FROM i_banded a
      WHERE a.band_key IN (SELECT band_key FROM e_banded)
    )
    SELECT d.doc_id,
           CASE WHEN exact.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN near.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'novel' END AS status
    FROM documents d
    LEFT JOIN exact ON d.doc_id = exact.doc_id
    LEFT JOIN near ON d.doc_id = near.doc_id
    WHERE d.doc_id % 5 = 0
    ORDER BY d.doc_id
    """,
)
def q70_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: status (exact_dup | near_dup | novel) for
    every incoming document probed against the existing corpus's
    content-hash and LSH band-key indexes.

    Scale shape: both probes are semi-joins on uniform md5-derived
    keys; the existing side's hash/band sets are exactly what a
    production pipeline persists as its dedup index, so only the
    incoming sliver is recomputed per ingest. See
    operators/dedup.py:incremental_dedup_status."""
    from ..operators.dedup import incremental_dedup_status

    docs = load_table(spark, sf_dir, "documents")
    incoming = docs.where(F.col("doc_id") % 5 == 0)
    existing = docs.where(F.col("doc_id") % 5 != 0)
    return incremental_dedup_status(existing, incoming, "doc_id", "text").orderBy("doc_id")


@register(
    "q123_containment_verify",
    oracle=f"""
    WITH {_MINHASH_CTE},
    grams AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(generate_series(1, length(text) - 2),
               i -> substring(text, i, 3))) AS g
      FROM documents WHERE length(text) >= 3
    )
    SELECT c.id_a, c.id_b,
           CAST(len(list_intersect(a.g, b.g)) AS BIGINT) AS n_inter,
           CAST(len(a.g) AS BIGINT) AS n_a,
           CAST(len(b.g) AS BIGINT) AS n_b,
           CAST(len(list_intersect(a.g, b.g)) AS BIGINT) * 1000000 // len(a.g) AS cont_a_ppm,
           CAST(len(list_intersect(a.g, b.g)) AS BIGINT) * 1000000 // len(b.g) AS cont_b_ppm,
           GREATEST(CAST(len(list_intersect(a.g, b.g)) AS BIGINT) * 1000000 // len(a.g),
                    CAST(len(list_intersect(a.g, b.g)) AS BIGINT) * 1000000 // len(b.g))
             AS max_cont_ppm
    FROM candidates c
    JOIN grams a ON a.id = c.id_a
    JOIN grams b ON b.id = c.id_b
    ORDER BY id_a, id_b
    """,
)
def q123_containment_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment verify over the LSH candidate pairs
    (:func:`..operators.dedup.ngram_containment_pairs`): |A∩B|/|A| and
    |A∩B|/|B| in exact integer ppm for every q31 candidate — the
    directional check that catches a short document quoted whole
    inside a long one, which symmetric Jaccard (q33) under-scores.
    Same scale shape as the Jaccard verify: grams materialize only for
    pair members, quadratic work never sees the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    # the candidate subplan feeds the verify stage's member semi-join
    # AND its pair join; the eager lineage cut stops the whole band
    # aggregation from evaluating twice (same fix as q49 — measured
    # 3.37->2.58 s there at sf0.1)
    cands = materialize(
        minhash_candidate_pairs(docs, "doc_id", "text", 12, 3, 3),
        label="lsh_candidates",  # candidate sliver → checkpoint default
        default="checkpoint",
    )
    from ..operators.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        docs, "doc_id", "text", n=3, candidates=cands
    ).orderBy("id_a", "id_b")


# --------------------------------------------------------------- q156
# Leakage-safe train/test split keyed on the NEAR-dup component: q61
# splits on the exact-content hash (byte-variant duplicates stay
# together), but a test document whose near-copy — reworded, truncated,
# re-wrapped — sits in train still leaks. Keying the split on the
# q63 connected component closes that hole: every document in a
# near-dup cluster lands on the same side, singletons key on their own
# id. The standard eval-hygiene step before holding out a corpus slice.


@register(
    "q156_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_CTE},
    grams AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(generate_series(1, length(text) - 2),
               i -> substring(text, i, 3))) AS g
      FROM documents WHERE length(text) >= 3
    ),
    verified AS (
      SELECT c.id_a, c.id_b
      FROM candidates c
      JOIN grams a ON a.id = c.id_a
      JOIN grams b ON b.id = c.id_b
      WHERE {_JACCARD_DUCK} >= 0.5
    ),
    sym AS (
      SELECT id_a AS u, id_b AS v FROM verified
      UNION
      SELECT id_b AS u, id_a AS v FROM verified
    ),
    reach AS (
      SELECT u AS src, u AS dst FROM sym
      UNION
      SELECT r.src, s.v AS dst FROM reach r JOIN sym s ON r.dst = s.u
    ),
    comp AS (SELECT src AS doc_id, MIN(dst) AS component_id FROM reach GROUP BY src),
    grouped AS (
      SELECT d.doc_id, COALESCE(c.component_id, d.doc_id) AS split_group
      FROM documents d LEFT JOIN comp c USING (doc_id)
    )
    SELECT doc_id, split_group,
           CASE WHEN (CAST(CAST('0x' || substring(md5('split' || CAST(split_group AS VARCHAR)), 1, 8) AS BIGINT)
                      AS DOUBLE) / 4294967296.0) < 0.1
                THEN 'test' ELSE 'train' END AS split
    FROM grouped ORDER BY doc_id
    """,
)
def q156_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/10 split keyed on the near-dup cluster id: LSH candidates →
    Jaccard verify → connected components (q63's trajectory), then the
    deterministic md5 draw on the component id, so a cluster can never
    straddle the train/test boundary. Singleton documents key on their
    own id — the whole corpus is covered. One left join against the
    sliver-sized component map; the split itself is a narrow map. See
    operators/training.py:train_test_split."""
    from ..operators.training import train_test_split

    docs = load_table(spark, sf_dir, "documents")
    # the candidate list feeds the verify stage's member semi-join AND
    # its pair join — same lineage cut as q33/q63/q123
    cands = materialize(
        minhash_candidate_pairs(docs, "doc_id", "text", 12, 3, 3),
        label="lsh_candidates",
        default="checkpoint",
    )
    verified = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, candidates=cands
    )
    comp = connected_components(verified, "id_a", "id_b").select(
        F.col("id").alias("doc_id"), "component_id"
    )
    grouped = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component_id", "doc_id").alias("split_group"),
        )
    )
    return (
        train_test_split(grouped, key_col=F.col("split_group"), test_fraction=0.1)
        .select("doc_id", "split_group", "split")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------- q175
# MinHash-estimator calibration: the LSH index's 12-lane signatures
# IMPLY a Jaccard estimate (matched lanes / 12, the classic unbiased
# MinHash estimator over the word-shingle sets the signatures hash);
# this query scores that estimate against the exact shingle-set
# Jaccard for every candidate pair. The calibration check a pipeline
# runs before trusting signature-only dedup decisions (e.g. the q151
# streaming ledger, which never re-grams the corpus).


@register(
    "q175_minhash_calibration",
    oracle=f"""
    WITH {_MINHASH_CTE},
    g AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(generate_series(1, len(words) - 2),
               i -> array_to_string(list_slice(words, i, i + 2), ' '))) AS g
      FROM (SELECT doc_id, {_WORDS_DUCK} AS words FROM documents)
      WHERE len(words) >= 3
    )
    SELECT c.id_a, c.id_b,
      CAST(list_aggregate(list_transform(list_zip(sa.sig, sb.sig),
           z -> CASE WHEN z[1] = z[2] THEN 1 ELSE 0 END), 'sum') AS BIGINT) AS n_matched,
      CAST(list_aggregate(list_transform(list_zip(sa.sig, sb.sig),
           z -> CASE WHEN z[1] = z[2] THEN 1 ELSE 0 END), 'sum') * 1000000 // 12 AS BIGINT) AS est_ppm,
      CAST(len(list_intersect(a.g, b.g)) AS BIGINT) AS n_inter,
      CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS BIGINT) AS n_union,
      CAST(len(list_intersect(a.g, b.g)) * 1000000
           // (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS BIGINT) AS exact_ppm,
      CAST(list_aggregate(list_transform(list_zip(sa.sig, sb.sig),
           z -> CASE WHEN z[1] = z[2] THEN 1 ELSE 0 END), 'sum') * 1000000 // 12
         - len(list_intersect(a.g, b.g)) * 1000000
           // (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS BIGINT) AS err_ppm
    FROM candidates c
    JOIN sigs sa ON sa.id = c.id_a
    JOIN sigs sb ON sb.id = c.id_b
    JOIN g a ON a.id = c.id_a
    JOIN g b ON b.id = c.id_b
    ORDER BY id_a, id_b
    """,
)
def q175_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature-implied Jaccard estimate (matched minhash lanes / 12,
    in exact ppm) vs the exact word-3-shingle-set Jaccard, per LSH
    candidate pair, with the signed estimator error.

    Scale shape: signatures and shingle sets materialize only for
    candidate-pair MEMBERS (broadcast id probes of the corpus — the
    candidate list is a band-capped sliver) through the STAGED
    signature projections (the signature COLUMN form re-evaluates its
    nested lambdas per lane — measured ~12 ms/doc, the round-6 budget
    regression); the member feature frame feeds BOTH pair sides, so it
    is materialized once. Lane matching and the set intersection are
    JVM zip_with/array kernels; everything is exact integer
    arithmetic, so the oracle replays the estimator bit for bit."""
    from ..operators.dedup import minhash_signatures_df

    docs = load_table(spark, sf_dir, "documents")
    cands = materialize(
        minhash_candidate_pairs(docs, "doc_id", "text", 12, 3, 3),
        label="lsh_candidates",
        default="checkpoint",
    )
    member_a = cands.select(F.col("id_a").alias("doc_id")).distinct()
    member_b = cands.select(F.col("id_b").alias("doc_id")).distinct()
    members = member_a.unionByName(member_b).distinct()
    member_docs = docs.join(F.broadcast(members), "doc_id", "left_semi")
    sigs = minhash_signatures_df(member_docs, "doc_id", "text", 12, 3).select(
        F.col("__id").alias("doc_id"), "sig"
    )
    shingles = (
        "array_distinct(transform(sequence(1, size(__w) - 2), "
        "i -> array_join(slice(__w, i, 3), ' ')))"
    )
    grams = (
        member_docs.select(
            "doc_id", F.expr("split(trim(lower(text)), '\\\\s+')").alias("__w")
        )
        .where(F.size("__w") >= 3)
        .select("doc_id", F.expr(shingles).alias("g"))
    )
    feats = materialize(
        sigs.join(grams, "doc_id"),
        label="calibration_features",  # feeds both pair sides
        default="checkpoint",
    )
    fa = feats.select(
        F.col("doc_id").alias("id_a"), F.col("sig").alias("sa"), F.col("g").alias("ga")
    )
    fb = feats.select(
        F.col("doc_id").alias("id_b"), F.col("sig").alias("sb"), F.col("g").alias("gb")
    )
    matched = (
        "aggregate(zip_with(sa, sb, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    inter = "CAST(size(array_intersect(ga, gb)) AS BIGINT)"
    union = "CAST(size(ga) + size(gb) AS BIGINT) - " + inter
    return (
        F.broadcast(cands)
        .join(fa, "id_a")
        .join(fb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.expr(matched).alias("n_matched"),
            F.expr(f"({matched}) * 1000000 div 12").alias("est_ppm"),
            F.expr(inter).alias("n_inter"),
            F.expr(union).alias("n_union"),
            F.expr(f"({inter}) * 1000000 div ({union})").alias("exact_ppm"),
            F.expr(
                f"({matched}) * 1000000 div 12"
                f" - ({inter}) * 1000000 div ({union})"
            ).alias("err_ppm"),
        )
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------------------- q177
# Survivor-selection policy: q63 (and q49) keep the MIN-ID document
# per near-dup cluster — deterministic but quality-blind. A production
# pipeline keeps the BEST document per cluster; this query scores
# every cluster member and elects the (quality desc, doc_id) argmax,
# reporting per member whether the policy keeps it and what token
# mass the decision keeps/drops. The policy layer between clustering
# (q63) and corpus assembly (q88).


def _q177_oracle() -> str:
    from .text import _N_WORDS, _SCORE

    return f"""
    WITH RECURSIVE {_MINHASH_CTE},
    grams AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(generate_series(1, length(text) - 2),
               i -> substring(text, i, 3))) AS g
      FROM documents WHERE length(text) >= 3
    ),
    verified AS (
      SELECT c.id_a, c.id_b
      FROM candidates c
      JOIN grams a ON a.id = c.id_a
      JOIN grams b ON b.id = c.id_b
      WHERE {_JACCARD_DUCK} >= 0.5
    ),
    sym AS (
      SELECT id_a AS u, id_b AS v FROM verified
      UNION
      SELECT id_b AS u, id_a AS v FROM verified
    ),
    reach AS (
      SELECT u AS src, u AS dst FROM sym
      UNION
      SELECT r.src, s.v AS dst FROM reach r JOIN sym s ON r.dst = s.u
    ),
    comp AS (SELECT src AS doc_id, MIN(dst) AS component_id FROM reach GROUP BY src),
    feat AS (
      SELECT doc_id,
             CAST(floor({_SCORE} * 1000000 + 0.5) AS BIGINT) AS qs6,
             CAST(greatest({_N_WORDS}, CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS n_tok
      FROM documents
    ),
    m AS (
      SELECT c.doc_id, c.component_id, f.qs6, f.n_tok
      FROM comp c JOIN feat f USING (doc_id)
    ),
    k AS (
      SELECT component_id, doc_id AS keeper_id FROM (
        SELECT component_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY component_id
                                  ORDER BY qs6 DESC, doc_id) AS rn
        FROM m
      ) WHERE rn = 1
    ),
    s AS (SELECT component_id, CAST(count(*) AS BIGINT) AS cluster_size FROM m GROUP BY component_id)
    SELECT m.doc_id, m.component_id, s.cluster_size, m.qs6, m.n_tok, k.keeper_id,
           CAST(CASE WHEN m.doc_id = k.keeper_id THEN 1 ELSE 0 END AS INTEGER) AS is_kept
    FROM m JOIN k USING (component_id) JOIN s USING (component_id)
    ORDER BY doc_id
    """


@register("q177_survivor_policy", oracle=_q177_oracle())
def q177_survivor_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-quality survivor election per near-dup cluster: q63's
    clusters (LSH candidates → Jaccard verify → connected components)
    scored with the q37 composite quality (exact 1e6-quantized ppm),
    keeper = (quality DESC, doc_id) argmax, one row per cluster MEMBER
    with its token mass and the keep/drop verdict.

    Scale shape: quality/token features join only the cluster-member
    sliver (components are a sliver of the corpus); the keeper
    election and cluster-size windows partition on component_id
    (cluster-sized groups — near-dup clusters are small by
    construction, band-capped upstream). The oracle replays the
    recursive closure and the same argmax."""
    from ..operators.text import quality_features, token_count

    docs = load_table(spark, sf_dir, "documents")
    cands = materialize(
        minhash_candidate_pairs(docs, "doc_id", "text", 12, 3, 3),
        label="lsh_candidates",
        default="checkpoint",
    )
    verified = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, candidates=cands
    )
    comp = connected_components(verified, "id_a", "id_b").select(
        F.col("id").alias("doc_id"), "component_id"
    )
    # quality/token features ONLY for cluster members: the component
    # map is a sliver of the corpus, so the broadcast semi-join prunes
    # the regex-heavy feature projection to member docs instead of a
    # full corpus pass nothing downstream reads
    member_docs = docs.join(
        F.broadcast(comp.select("doc_id")), "doc_id", "left_semi"
    )
    feat = (
        member_docs.select(
            "doc_id",
            quality_features("text").alias("q"),
            token_count("text").alias("t"),
        )
        .select(
            "doc_id",
            F.expr("CAST(floor(q.quality_score * 1000000 + 0.5) AS BIGINT)").alias("qs6"),
            F.col("t.n_tokens_est").cast("long").alias("n_tok"),
        )
    )
    m = comp.join(feat, "doc_id")
    # keeper = the (qs6 DESC, doc_id) argmax per component. first_value
    # over the full ordered frame computes it in the SAME window pass
    # as the cluster size — the former rn=1 filter + broadcast
    # self-join re-evaluated the whole feature-join-window subplan for
    # each join side (guide §2.4: two operations keyed the same way
    # share one exchange; value-identical, pinned by the oracle)
    w_rank = Window.partitionBy("component_id").orderBy(F.desc("qs6"), F.asc("doc_id"))
    w_full = w_rank.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_size = Window.partitionBy("component_id")
    ranked = m.withColumn(
        "cluster_size", F.count("*").over(w_size).cast("long")
    ).withColumn("keeper_id", F.first("doc_id").over(w_full))
    return (
        ranked
        .select(
            "doc_id",
            "component_id",
            "cluster_size",
            "qs6",
            "n_tok",
            "keeper_id",
            (F.col("doc_id") == F.col("keeper_id")).cast("int").alias("is_kept"),
        )
        .orderBy("doc_id")
    )
