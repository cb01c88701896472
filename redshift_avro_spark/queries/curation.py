"""q49: the end-to-end training-data curation pipeline.

Composes the individually-verified stages (q37 language/quality, q30
exact dedup, q31 LSH discovery, q33 Jaccard verify, q38 token stats)
into the single shape a 100 TB pretraining pipeline actually runs:

    filter (lang == 'en', quality ≥ 0.68, ≥ 20 words)
      → exact dedup   (keep min doc_id per normalized-content hash)
      → near-dup drop (LSH candidates, 3-gram Jaccard ≥ 0.5, drop id_b)
      → per-doc token budget

Scale shape: the filter and feature projection are narrow (no
shuffle); exact dedup is one window shuffle on a uniform md5 key; LSH
is linear in docs with a uniform band-key join; Jaccard only touches
LSH candidates. Nothing quadratic ever sees the full corpus, so each
stage's cost is the same as its standalone query — composition adds no
new shuffle boundary beyond the anti-join at the end.

The DuckDB oracle rebuilds every stage from the same md5-derived
formulas (fragments shared with q30-q39), so the driver hash-checks
the whole pipeline end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import _parquet_file_count, load_table, register, spread_codec_input
from .dedup import _NORM_DUCK, _NORM_SPARK, minhash_cte
from .text import _LANG_PRED, _N_WORDS, _SCORE
from ..operators.dedup import minhash_candidate_pairs, ngram_jaccard_pairs
from ..operators.staging import materialize
from ..operators.text import language_id, quality_features, token_count

_MIN_SCORE = 0.68
_MIN_WORDS = 20

# survivors feeds three consumers (LSH signatures, Jaccard grams, final
# anti-join); without staging, its filter + md5-window subplan — shuffle
# included — recomputes once per consumer. Materialization boundaries
# route through operators/staging.py::materialize (modes checkpoint |
# parquet | none; measurements live in ONE place: SCALING.md's q49
# entry — best-of-3 at sf0.1, parquet fastest and also the 100 TB shape
# for this corpus-scale frame, since parquet blocks survive executor
# loss where localCheckpoint's storage blocks do not).


@register(
    "q49_curation_pipeline",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, text, {_LANG_PRED} AS lang_pred,
             CAST({_N_WORDS} AS INTEGER) AS n_words,
             CAST(greatest({_N_WORDS}, CAST(ceil(length(text) / 4.0) AS BIGINT)) AS INTEGER) AS n_tokens_est,
             {_SCORE} AS quality_score
      FROM documents
    ),
    kept AS (
      SELECT * FROM feat
      WHERE lang_pred = 'en' AND quality_score >= {_MIN_SCORE} AND n_words >= {_MIN_WORDS}
    ),
    survivors AS (
      SELECT doc_id, text, n_words, n_tokens_est, quality_score FROM (
        SELECT k.*, MIN(doc_id) OVER (PARTITION BY md5({_NORM_DUCK})) AS keeper
        FROM kept k
      ) WHERE doc_id = keeper
    ),
    {minhash_cte("survivors")},
    grams AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(generate_series(1, length(text) - 2),
               i -> substring(text, i, 3))) AS g
      FROM survivors WHERE length(text) >= 3
    ),
    dropped AS (
      SELECT DISTINCT c.id_b FROM candidates c
      JOIN grams a ON a.id = c.id_a
      JOIN grams b ON b.id = c.id_b
      WHERE len(list_intersect(a.g, b.g))
            / CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS DOUBLE) >= 0.5
    )
    SELECT doc_id, n_words, n_tokens_est, quality_score
    FROM survivors
    WHERE doc_id NOT IN (SELECT id_b FROM dropped)
    ORDER BY doc_id
    """,
)
def q49_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter → exact-dedup → near-dup-drop → token stats, end to end."""
    # spread the regex-heavy feature projection when the input arrives
    # as a single small file split (real multi-split input keeps its
    # partitioning — no shuffle at scale; the md5 window below shuffles
    # anyway, so no extra boundary is added). cores/4 like the codec
    # stages: all-cores left ~3k rows per task and measured ~0.5 s
    # SLOWER at sf0.1 than cores/4 — tiny-stage scheduling overhead
    # compounds across this pipeline's many stages.
    docs = spread_codec_input(
        load_table(spark, sf_dir, "documents"),
        spark,
        _parquet_file_count(sf_dir, "documents"),
    )
    feat = docs.select(
        "doc_id",
        "text",
        language_id("text").alias("lang_pred"),
        quality_features("text").alias("q"),
        token_count("text").alias("t"),
    ).select(
        "doc_id",
        "text",
        "lang_pred",
        F.col("q.n_words").alias("n_words"),
        F.col("t.n_tokens_est").alias("n_tokens_est"),
        F.col("q.quality_score").alias("quality_score"),
    )
    kept = feat.where(
        (F.col("lang_pred") == "en")
        & (F.col("quality_score") >= _MIN_SCORE)
        & (F.col("n_words") >= _MIN_WORDS)
    )
    # Stage the three-consumer survivors subplan (persist() measured
    # slower than recompute in round 1 — repeated invocations leak
    # never-unpersisted cache blocks — so the staging is a lineage cut,
    # not a cache). Corpus-scale frame → parquet default
    # (executor-loss-safe); SPARK_GRAFT_Q49_MATERIALIZE kept as the
    # legacy override key.
    survivors = materialize(
        kept.withColumn(
            "keeper",
            F.min("doc_id").over(Window.partitionBy(F.md5(F.expr(_NORM_SPARK)))),
        )
        .where(F.col("doc_id") == F.col("keeper"))
        .drop("keeper"),
        label="q49_survivors",
        default="parquet",
        extra_env="SPARK_GRAFT_Q49_MATERIALIZE",
    )
    # the candidate list is a sliver of the corpus but feeds two
    # consumers inside the verify stage (member semi-join + pair
    # join); without a lineage cut the whole band-aggregation
    # subplan evaluates twice (measured 3.37→2.58 s best-of-3 at
    # sf0.1 — exchange reuse does not cover it across the two
    # join sides). Production pipelines materialize the candidate
    # list between discovery and verify for the same reason.
    # Candidate-sliver frame → checkpoint default (cheap recompute
    # on executor loss).
    cands = materialize(
        minhash_candidate_pairs(survivors, "doc_id", "text", 12, 3, 3),
        label="q49_candidates",
        default="checkpoint",
    )
    verified = ngram_jaccard_pairs(
        survivors, "doc_id", "text", n=3, threshold=0.5, candidates=cands
    )
    dropped = verified.select(F.col("id_b").alias("doc_id")).distinct()
    return (
        survivors.join(dropped, "doc_id", "left_anti")
        .select("doc_id", "n_words", "n_tokens_est", "quality_score")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------- q157
# Pipeline observability: the attrition funnel for q49's curation
# chain. A 100 TB pipeline is tuned by WHERE documents die, not just
# by what survives — per stage: rows entering, rows surviving, rows
# dropped. Same fragments and thresholds as q49, so the two queries
# can never drift apart silently.


@register(
    "q157_curation_funnel",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id, text, {_LANG_PRED} AS lang_pred,
             CAST({_N_WORDS} AS INTEGER) AS n_words,
             {_SCORE} AS quality_score
      FROM documents
    ),
    s_lang AS (SELECT * FROM feat WHERE lang_pred = 'en'),
    s_quality AS (SELECT * FROM s_lang WHERE quality_score >= {_MIN_SCORE}),
    s_words AS (SELECT * FROM s_quality WHERE n_words >= {_MIN_WORDS}),
    survivors AS (
      SELECT doc_id, text FROM (
        SELECT k.doc_id, k.text,
               MIN(doc_id) OVER (PARTITION BY md5({_NORM_DUCK})) AS keeper
        FROM s_words k
      ) WHERE doc_id = keeper
    ),
    {minhash_cte("survivors")},
    grams AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(generate_series(1, length(text) - 2),
               i -> substring(text, i, 3))) AS g
      FROM survivors WHERE length(text) >= 3
    ),
    dropped AS (
      SELECT DISTINCT c.id_b FROM candidates c
      JOIN grams a ON a.id = c.id_a
      JOIN grams b ON b.id = c.id_b
      WHERE len(list_intersect(a.g, b.g))
            / CAST(len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) AS DOUBLE) >= 0.5
    ),
    counts AS (
      SELECT (SELECT COUNT(*) FROM feat) AS n_total,
             (SELECT COUNT(*) FROM s_lang) AS n_lang,
             (SELECT COUNT(*) FROM s_quality) AS n_quality,
             (SELECT COUNT(*) FROM s_words) AS n_words_ok,
             (SELECT COUNT(*) FROM survivors) AS n_exact,
             (SELECT COUNT(*) FROM survivors) - (SELECT COUNT(*) FROM dropped) AS n_final
    )
    SELECT stage, n_in, n_out, n_in - n_out AS n_dropped FROM (
      SELECT 1 AS ord, 'language' AS stage, n_total AS n_in, n_lang AS n_out FROM counts
      UNION ALL
      SELECT 2, 'quality', n_lang, n_quality FROM counts
      UNION ALL
      SELECT 3, 'min_words', n_quality, n_words_ok FROM counts
      UNION ALL
      SELECT 4, 'exact_dedup', n_words_ok, n_exact FROM counts
      UNION ALL
      SELECT 5, 'near_dup', n_exact, n_final FROM counts
    ) ORDER BY ord
    """,
)
def q157_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-by-stage attrition for the q49 pipeline: language gate →
    quality gate → min-words gate → exact dedup → near-dup drop, one
    row per stage with (n_in, n_out, n_dropped). Counts are exact
    integers; every stage reuses q49's fragments verbatim (same
    predicates, same md5 window, same LSH + Jaccard chain), so this
    funnel IS q49's attrition, not a reimplementation that can drift.
    The stage frames are narrow filters over one scan; only the dedup
    stages shuffle, on the same uniform md5/band keys as q49."""
    docs = load_table(spark, sf_dir, "documents")
    feat = docs.select(
        "doc_id",
        "text",
        language_id("text").alias("lang_pred"),
        quality_features("text").alias("q"),
    ).select(
        "doc_id",
        "text",
        "lang_pred",
        F.col("q.n_words").alias("n_words"),
        F.col("q.quality_score").alias("quality_score"),
    )
    s_lang = feat.where(F.col("lang_pred") == "en")
    s_quality = s_lang.where(F.col("quality_score") >= _MIN_SCORE)
    s_words = s_quality.where(F.col("n_words") >= _MIN_WORDS)
    survivors = materialize(
        s_words.withColumn(
            "keeper",
            F.min("doc_id").over(Window.partitionBy(F.md5(F.expr(_NORM_SPARK)))),
        )
        .where(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "text"),
        label="q157_survivors",
        default="parquet",  # corpus-scale, same trade as q49_survivors
    )
    cands = materialize(
        minhash_candidate_pairs(survivors, "doc_id", "text", 12, 3, 3),
        label="q157_candidates",
        default="checkpoint",  # same double-evaluation cut as q49
    )
    verified = ngram_jaccard_pairs(
        survivors, "doc_id", "text", n=3, threshold=0.5, candidates=cands
    )
    n_total = feat.count()
    n_lang = s_lang.count()
    n_quality = s_quality.count()
    n_words_ok = s_words.count()
    n_exact = survivors.count()
    n_dropped_near = verified.select("id_b").distinct().count()
    rows = [
        ("language", n_total, n_lang),
        ("quality", n_lang, n_quality),
        ("min_words", n_quality, n_words_ok),
        ("exact_dedup", n_words_ok, n_exact),
        ("near_dup", n_exact, n_exact - n_dropped_near),
    ]
    return spark.createDataFrame(
        [(s, a, b, a - b) for s, a, b in rows],
        "stage string, n_in long, n_out long, n_dropped long",
    )


# --------------------------------------------------------------- q178
# Corpus release diff: change detection between two corpus versions —
# the derive side of incremental maintenance (q109's CDC merge is the
# apply side). Version 2 is a deterministic transformation of the
# documents table (drop doc_id%7==0, revise text of the %5==0
# remainder, add a %11==0-keyed batch under shifted ids), so both
# engines build the identical pair of versions and the diff itself is
# the operator under test: full-outer join on the id, md5 content
# compare, per-status doc/token mass.


@register(
    "q178_release_diff",
    oracle="""
    WITH v1 AS (SELECT doc_id, text FROM documents),
    v2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END AS text
      FROM documents WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT doc_id + 1000000000 AS doc_id, text || ' new' AS text
      FROM documents WHERE doc_id % 11 = 0
    ),
    j AS (
      SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
             a.text AS t1, b.text AS t2,
             CASE WHEN a.doc_id IS NULL THEN 'added'
                  WHEN b.doc_id IS NULL THEN 'removed'
                  WHEN md5(a.text) <> md5(b.text) THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM v1 a FULL OUTER JOIN v2 b USING (doc_id)
    ),
    t AS (
      SELECT status, doc_id,
             CAST(greatest(
               len(regexp_split_to_array(trim(lower(COALESCE(t2, t1))), '\\s+')),
               CAST(ceil(length(COALESCE(t2, t1)) / 4.0) AS BIGINT)) AS BIGINT) AS n_tok
      FROM j
    )
    SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
    FROM t GROUP BY status ORDER BY status
    """,
)
def q178_release_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two corpus releases: per change status (added / removed /
    changed / unchanged) the document count, token mass (of the newer
    side where it exists), and the id range.

    Scale shape: one full-outer sort-merge join on the uniform id key
    (the ONLY shuffle besides the 4-row output sort), md5 content
    compare inside the join projection, map-side-combining status
    aggregation. At 100 TB both versions would be snapshot-table reads
    (sources/snapshots.py time travel) — the diff plan is identical."""
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.select("doc_id", F.col("text").alias("t1"))
    v2 = (
        docs.where(F.expr("doc_id % 7 <> 0"))
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END"
            ).alias("t2"),
        )
        .unionByName(
            docs.where(F.expr("doc_id % 11 = 0")).select(
                (F.col("doc_id") + F.lit(1000000000)).alias("doc_id"),
                F.expr("text || ' new'").alias("t2"),
            )
        )
    )
    j = v1.join(v2, "doc_id", "full_outer").select(
        "doc_id",
        F.expr(
            "CASE WHEN t1 IS NULL THEN 'added'"
            " WHEN t2 IS NULL THEN 'removed'"
            " WHEN md5(t1) <> md5(t2) THEN 'changed'"
            " ELSE 'unchanged' END"
        ).alias("status"),
        F.expr("COALESCE(t2, t1)").alias("t"),
    )
    t = j.select(
        "status",
        "doc_id",
        F.expr(
            "CAST(greatest(size(split(trim(lower(t)), '\\\\s+')),"
            " CAST(ceil(length(t) / 4.0) AS BIGINT)) AS BIGINT)"
        ).alias("n_tok"),
    )
    return (
        t.groupBy("status")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("status")
    )
