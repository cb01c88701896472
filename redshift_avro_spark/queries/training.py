"""Training-data assembly queries over ``documents``: deterministic
sampling, leakage-safe splits, mixture rebalancing, sequence packing
(:mod:`..operators.training`).

Portability notes (driver hash-compares vs DuckDB):

- The uniform draw is ``md5``-derived; its first 8 hex chars divided by
  2^32 is a power-of-two float division — bit-exact in both engines
  (``conv(hex,16,10)`` ↔ ``CAST('0x'||hex AS BIGINT)``).
- Ratios are emitted as exact integer parts-per-million
  (``x * 1000000 DIV y``) — BIGINT arithmetic both sides — rather than
  ROUND(double) whose decimal ties are representation-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import load_table, register
from .dedup import _NORM_DUCK, _NORM_SPARK
from .text import _N_WORDS
from ..operators.text import token_count
from ..operators.training import (
    mixture_rebalance,
    pack_sequences,
    stratified_sample,
    train_test_split,
    uniform_hash,
)

_TOKS_DUCK = (
    f"CAST(greatest({_N_WORDS}, CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT)"
)


def _u_duck(key_expr: str, salt: str) -> str:
    return (
        f"(CAST(CAST('0x' || substring(md5('{salt}' || {key_expr}), 1, 8) AS BIGINT) "
        f"AS DOUBLE) / 4294967296.0)"
    )


_PACK_BUDGET = 2048

_SAMPLE_RATES = {"en": 0.5, "es": 0.75, "de": 0.25, "fr": 0.1, "zh": 1.0}

_MIX_TARGETS = {"en": 0.40, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}


@register(
    "q59_sequence_packing",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, {_TOKS_DUCK} AS toks FROM documents
    ),
    cum AS (
      SELECT lang, doc_id, toks,
             CAST(SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      FROM tok
    )
    SELECT lang,
           CAST(FLOOR((CAST(cum AS DOUBLE) - toks) / {_PACK_BUDGET}.0) AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS seq_tokens,
           CAST(SUM(toks) AS BIGINT) * 1000000 // {_PACK_BUDGET} AS fill_ppm
    FROM cum
    GROUP BY lang, seq_id
    ORDER BY lang, seq_id
    """,
)
def q59_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into {_PACK_BUDGET}-token training sequences per
    language shard (running-total window → budget division — see
    ``pack_sequences`` for why packing is per-shard at scale), then
    summarize each sequence."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", "doc_id", token_count("text")["n_tokens_est"].cast("long").alias("toks")
    )
    packed = pack_sequences(
        toks, token_col="toks", order_col="doc_id", budget=_PACK_BUDGET,
        partition_cols=["lang"],
    )
    return (
        packed.groupBy("lang", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("seq_tokens"),
        )
        .withColumn(
            "fill_ppm",
            F.expr(f"seq_tokens * 1000000 div {_PACK_BUDGET}"),
        )
        .orderBy("lang", "seq_id")
    )


_RATE_DUCK = (
    "CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.75 WHEN 'de' THEN 0.25 "
    "WHEN 'fr' THEN 0.1 WHEN 'zh' THEN 1.0 ELSE 0.0 END"
)


@register(
    "q60_stratified_sample",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, {_TOKS_DUCK} AS toks FROM documents
    ),
    samp AS (
      SELECT lang, doc_id, toks FROM tok
      WHERE {_u_duck("CAST(doc_id AS VARCHAR)", "strat")} < {_RATE_DUCK}
    )
    SELECT t.lang,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COALESCE(s.n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST(COALESCE(s.sampled_tokens, 0) AS BIGINT) AS sampled_tokens
    FROM tok t
    LEFT JOIN (
      SELECT lang, COUNT(*) AS n_sampled, SUM(toks) AS sampled_tokens
      FROM samp GROUP BY lang
    ) s USING (lang)
    GROUP BY t.lang, s.n_sampled, s.sampled_tokens
    ORDER BY t.lang
    """,
)
def q60_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic Bernoulli sampling at explicit rates
    (keep all zh, half of en, a tenth of fr ...): the md5 draw makes the
    sample reproducible across retries and engines. Narrow scan — the
    only shuffles are the two tiny per-language aggregates."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", "doc_id", token_count("text")["n_tokens_est"].cast("long").alias("toks")
    )
    total = toks.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    sampled = (
        stratified_sample(toks, "lang", _SAMPLE_RATES, key_col="doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("toks").alias("sampled_tokens"),
        )
    )
    return (
        total.join(sampled, "lang", "left")
        .select(
            "lang",
            "n_total",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            F.coalesce("sampled_tokens", F.lit(0)).alias("sampled_tokens"),
        )
        .orderBy("lang")
    )


@register(
    "q61_train_test_split",
    oracle=f"""
    WITH keyed AS (
      SELECT lang, {_TOKS_DUCK} AS toks,
             CASE WHEN {_u_duck(f"md5({_NORM_DUCK})", "split")} < 0.1
                  THEN 'test' ELSE 'train' END AS split
      FROM documents
    )
    SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS total_tokens
    FROM keyed
    GROUP BY split, lang
    ORDER BY split, lang
    """,
)
def q61_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 90/10 split keyed on the md5 of NORMALIZED content
    (the q30 exact-dedup key): byte-identical and
    whitespace/case-variant duplicates always land on the same side, so
    the test set can't leak training near-copies. Narrow map + one
    aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = train_test_split(
        docs.select(
            "lang",
            token_count("text")["n_tokens_est"].cast("long").alias("toks"),
            F.md5(F.expr(_NORM_SPARK)).alias("__k"),
        ),
        key_col=F.col("__k"),
        test_fraction=0.1,
    )
    return (
        keyed.groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("toks").alias("total_tokens"))
        .orderBy("split", "lang")
    )


_SHARE_DUCK = (
    "CASE lang WHEN 'en' THEN 0.40 WHEN 'de' THEN 0.15 WHEN 'es' THEN 0.15 "
    "WHEN 'fr' THEN 0.15 WHEN 'zh' THEN 0.15 ELSE 0.0 END"
)


@register(
    "q62_mixture_rebalance",
    oracle=f"""
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n, {_SHARE_DUCK} AS share
      FROM documents GROUP BY lang
    ),
    feasible AS (
      SELECT MIN(CAST(n AS DOUBLE) / share) AS m FROM counts
    ),
    keep AS (
      SELECT lang, n, least(1.0, m * share / CAST(n AS DOUBLE)) AS keep_frac
      FROM counts, feasible
    ),
    kept AS (
      SELECT d.lang FROM documents d JOIN keep k USING (lang)
      WHERE {_u_duck("CAST(doc_id AS VARCHAR)", "mix")} < k.keep_frac
    ),
    after AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_after FROM kept GROUP BY lang
    )
    SELECT c.lang, c.n AS n_before,
           CAST(COALESCE(a.n_after, 0) AS BIGINT) AS n_after,
           CAST(COALESCE(a.n_after, 0) AS BIGINT) * 1000000
             // CAST((SELECT SUM(n_after) FROM after) AS BIGINT) AS share_ppm
    FROM counts c LEFT JOIN after a USING (lang)
    ORDER BY c.lang
    """,
)
def q62_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample languages to a target mixture (40% en / 15% each
    other) keeping as much data as the binding stratum allows — the
    domain-weighting step of a pretraining data recipe. The corpus
    itself never shuffles: per-stratum counts aggregate partial-first,
    the keep-fractions broadcast back, and the filter is a narrow
    md5-hash map."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("lang", "doc_id")
    before = base.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    after = (
        mixture_rebalance(base, "lang", _MIX_TARGETS, key_col="doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    joined = (
        before.join(after, "lang", "left")
        .select(
            "lang",
            "n_before",
            F.coalesce("n_after", F.lit(0)).alias("n_after"),
        )
    )
    total_after = joined.agg(F.sum("n_after").alias("__tot"))
    return (
        joined.crossJoin(F.broadcast(total_after))
        .select(
            "lang",
            "n_before",
            "n_after",
            F.expr("n_after * 1000000 div __tot").alias("share_ppm"),
        )
        .orderBy("lang")
    )


_CHUNK_W = 64
_CHUNK_OV = 16
_CHUNK_ST = _CHUNK_W - _CHUNK_OV


@register(
    "q96_doc_chunking",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ws,
             trim(text) AS t
      FROM documents
    ),
    e AS (
      SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) > 0 AND t != ''
    )
    SELECT doc_id,
           CAST(k AS INTEGER) AS chunk_index,
           CAST(k * {_CHUNK_ST} AS INTEGER) AS start_word,
           CAST(least({_CHUNK_W}, n - k * {_CHUNK_ST}) AS INTEGER) AS n_words,
           array_to_string(list_slice(ws, k * {_CHUNK_ST} + 1,
                                      k * {_CHUNK_ST} + {_CHUNK_W}), ' ') AS chunk_text
    FROM e,
         unnest(generate_series(0, CAST(ceil(n / {_CHUNK_ST}.0) AS BIGINT) - 1)) AS t(k)
    ORDER BY doc_id, chunk_index
    """,
)
def q96_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking of every document (64-word windows,
    16-word overlap): the RAG-indexing / long-document prep fan-out,
    with stable positional chunk identity. One narrow map, no shuffle;
    the oracle replicates the window arithmetic with 1-based inclusive
    list_slice vs Spark's (start, length) slice. See
    operators/training.py::chunk_documents."""
    from ..operators.training import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(
        docs, "doc_id", "text", window=_CHUNK_W, overlap=_CHUNK_OV
    ).orderBy("doc_id", "chunk_index")


@register(
    "q128_quota_sample",
    oracle="""
    WITH ranked AS (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc, CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM ranked WHERE rn <= 25
    GROUP BY lang ORDER BY lang
    """,
)
def q128_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sampling — the fixed-k companion to
    q60's Bernoulli rate sampling: EXACTLY 25 documents per language,
    drawn by the md5(doc_id) order (a deterministic 'random' permutation
    that is resumable and engine-portable, doc_id tiebreak for md5
    collisions). A mixture builder uses this when the recipe demands
    exact per-source counts rather than rates.

    Scale shape: one window per stratum on the uniform lang key — the
    per-stratum sort is bounded by stratum size; for huge strata the
    same quota comes from a TakeOrdered per stratum (heap of k). The
    output aggregates the sample for a bounded result."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        docs.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 25)
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("sampled_chars"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
        .orderBy("lang")
    )


@register(
    "q133_training_schedule",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY source) AS n_src
      FROM documents
    ),
    sched AS (
      SELECT source, doc_id, rk,
             (rk * 1000000 - 500000) // n_src AS pos
      FROM ranked
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY pos, source, rk) AS BIGINT) AS seq,
           pos, source, doc_id
    FROM sched ORDER BY seq LIMIT 40
    """,
)
def q133_training_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stride-scheduled training order: each source's
    documents are shuffled by the md5 permutation, ranked, and given
    the fixed-point position (rk·10⁶ − 5·10⁵) div n_src — classic
    stride scheduling, so sources interleave PROPORTIONALLY to their
    sizes from the very first batch (no giant-source prefix) and the
    whole order is resumable from any offset. First 40 schedule slots
    shown; ties break on (source, rank).

    Scale shape: one per-source window (uniform source key; a
    per-stratum sort bound), a narrow position map, and a TakeOrdered
    prefix — a full materialization writes the schedule
    range-partitioned by pos with no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    ranked = docs.select(
        "source",
        "doc_id",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("source")).alias("n_src"),
    )
    sched = ranked.select(
        "source", "doc_id", "rk", F.expr("(rk * 1000000 - 500000) div n_src").alias("pos")
    )
    w2 = Window.orderBy("pos", "source", "rk")
    return (
        sched.orderBy("pos", "source", "rk")
        .limit(40)
        .select(F.row_number().over(w2).cast("long").alias("seq"), "pos", "source", "doc_id")
        .orderBy("seq")
    )


@register(
    "q143_pps_sample",
    oracle="""
    WITH mx AS (SELECT CAST(MAX(n_chars) AS BIGINT) AS max_chars FROM documents),
    draws AS (
      SELECT lang, doc_id, n_chars,
             CAST(concat('0x', substring(md5(concat('pps|', CAST(doc_id AS VARCHAR))), 1, 8))
                  AS BIGINT) AS u
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
    FROM draws, mx
    WHERE u * mx.max_chars < 4294967296 * n_chars / 2
    GROUP BY lang ORDER BY lang
    """,
)
def q143_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size sampling — the third sampling
    mode next to the uniform Bernoulli rate (q60) and the exact quota
    (q128): each document is accepted with probability
    0.5 · n_chars / max_chars, so long documents (which carry more
    training tokens) are proportionally more likely to survive a
    token-budget cut. The accept draw is the md5-derived 32-bit
    uniform compared in EXACT INTEGER cross-multiplied form
    (u · max < 2³² · chars / 2 — no float thresholds), keyed by
    doc_id so the sample is resumable and engine-portable.

    Scale shape: one tiny max broadcast + a narrow map + one
    per-stratum agg; zero corpus shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    mx = docs.agg(F.max("n_chars").cast("long").alias("max_chars"))
    draws = docs.select(
        "lang",
        "n_chars",
        F.expr(
            "CAST(conv(substring(md5(concat('pps|', CAST(doc_id AS STRING))), 1, 8), 16, 10)"
            " AS BIGINT)"
        ).alias("u"),
    )
    return (
        draws.crossJoin(F.broadcast(mx))
        .where(F.expr("u * max_chars < 4294967296 * n_chars div 2"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("sampled_chars"),
        )
        .orderBy("lang")
    )


@register(
    "q144_temperature_weights",
    oracle="""
    WITH counts AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
    ),
    s AS (
      SELECT lang, n, CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(30,15)) AS w
      FROM counts
    ),
    tot AS (SELECT SUM(w) AS t FROM s)
    SELECT lang, n,
           CAST(floor(CAST(w AS DOUBLE) * 1000000.0 / CAST(t AS DOUBLE)) AS BIGINT) AS weight_ppm,
           CAST(n * 1000000 // (SELECT SUM(n) FROM counts) AS BIGINT) AS natural_ppm
    FROM s, tot ORDER BY lang
    """,
)
def q144_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (α = 0.5): the multilingual
    sampling recipe (mT5-style) that upweights low-resource sources —
    w_l = √n_l / Σ √n_l in truncated ppm, next to each language's
    natural share. √ is IEEE-correctly-rounded (engine-stable,
    unlike ln/exp); the √ terms sum as exact DECIMAL(30,15) so the
    5-way total is accumulation-order-proof; the final ppm is one
    fixed double tree floored explicitly (CAST(double AS BIGINT)
    truncates in Spark but ROUNDS in DuckDB — floor() is the portable
    spelling).

    Scale shape: one per-lang count agg; everything after runs on
    5 rows."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").cast("long").alias("n"))
    s = counts.select(
        "lang", "n", F.expr("CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(30,15))").alias("w")
    )
    tot = s.agg(F.sum("w").alias("t"))
    natural = counts.agg(F.sum("n").cast("long").alias("tot_n"))
    return (
        s.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(natural))
        .select(
            "lang",
            "n",
            F.expr(
                "CAST(floor(CAST(w AS DOUBLE) * 1000000.0 / CAST(t AS DOUBLE)) AS BIGINT)"
            ).alias("weight_ppm"),
            F.expr("CAST(n * 1000000 div tot_n AS BIGINT)").alias("natural_ppm"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------- q149
# Batch-geometry report: documents grouped into power-of-2 token-length
# buckets with the padding waste a pad-to-bucket batch assembler pays
# per bucket — the measurement that justifies (or not) running q59's
# sequence packing. The bucket ladder is a shared CASE string (no
# log2 — engine-variant float math is banned by the oracle rules), so
# both engines branch identically on exact integers.

def _bucket_ladder_duck() -> str:
    from ..operators.training import pow2_bucket_sql

    return pow2_bucket_sql("n_tok")


@register(
    "q149_length_buckets",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_DUCK} AS n_tok FROM documents
    ), b AS (
      SELECT doc_id, n_tok, {_bucket_ladder_duck()} AS bucket FROM t
    ), agg AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS sum_tokens
      FROM b GROUP BY bucket
    )
    SELECT bucket, n_docs, sum_tokens,
           CAST(bucket * n_docs AS BIGINT) AS padded_tokens,
           CAST(((bucket * n_docs - sum_tokens) * 1000000) // (bucket * n_docs) AS BIGINT) AS waste_ppm
    FROM agg ORDER BY bucket
    """,
)
def q149_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-2 sequence-length bucket histogram with per-bucket
    padding waste (exact integer ppm) — the batch-geometry view of the
    corpus a fixed-shape trainer pads into. One narrow bucket
    projection + one O(buckets) aggregation with map-side combine.
    See operators/training.py:length_bucket_stats."""
    from ..operators.training import length_bucket_stats

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", token_count("text")["n_tokens_est"].cast("bigint").alias("n_tok")
    )
    return length_bucket_stats(toks, "n_tok").orderBy("bucket")


# --------------------------------------------------------------- q150
# Importance-based data selection (the DSIR shape): score every
# non-target document by the exact integer ppm-frequency-gap word
# weights of a target domain (source = 'src0') and keep the top 30.
# Log-ratio importance weights are the textbook form; the ppm gap is
# the same rank-by-target-likeness signal in pure BIGINT arithmetic
# (ln() is banned by the oracle hash-stability rules).

# --------------------------------------------------------------- q167
# Output-shard planning: assign each document (in deterministic
# doc_id order within its source) to a token-budgeted output shard —
# the write-side geometry step that turns a curated corpus into
# uniformly-sized training files. A doc lands in the shard where its
# running total BEGINS, so shard boundaries are stable under append.

_SHARD_BUDGET = 1000


@register(
    "q167_shard_plan",
    oracle=f"""
    WITH per_doc AS (
      SELECT source, doc_id, CAST({_N_WORDS} AS BIGINT) AS tok
      FROM documents
    ),
    cum AS (
      SELECT source, doc_id, tok,
             CAST(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
      FROM per_doc
    )
    SELECT source,
           CAST((cum_tok - tok) // {_SHARD_BUDGET} AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS shard_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc,
           CAST(CAST(sum(tok) AS BIGINT) * 1000000 // {_SHARD_BUDGET} AS BIGINT)
             AS fill_ppm
    FROM cum
    GROUP BY source, shard
    ORDER BY source, shard
    """,
)
def q167_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted output shards per source: deterministic doc_id
    order, running token total, shard = floor(start/budget); per
    (source, shard) the doc count, token mass, id range and fill
    ratio in exact ppm (can exceed 10⁶ when a document straddles its
    shard boundary — the doc belongs to the shard where it starts).

    Scale shape: ONE window over PARTITION BY source (each source's
    running sum is independent — the global-order trap is avoided by
    sharding within the natural output partitioning, exactly how a
    100 TB corpus is written) and one map-side-combining aggregation
    on (source, shard)."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        "doc_id",
        F.expr("size(split(trim(lower(text)), '\\\\s+'))").cast("long").alias("tok"),
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_doc.withColumn("cum_tok", F.sum("tok").over(w).cast("long"))
    return (
        cum.select(
            "source",
            F.expr(f"(cum_tok - tok) div {_SHARD_BUDGET}").alias("shard"),
            "doc_id",
            "tok",
        )
        .groupBy("source", "shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("tok").cast("long").alias("shard_tokens"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
        .withColumn(
            "fill_ppm", F.expr(f"shard_tokens * 1000000 div {_SHARD_BUDGET}")
        )
        .orderBy("source", "shard")
    )


_DR_TARGET = "src0"
_DR_TOP = 30
_DR_WORDS = "regexp_split_to_array(trim(lower(text)), '\\s+')"


@register(
    "q150_domain_relevance",
    oracle=f"""
    WITH w_t AS (
      SELECT unnest({_DR_WORDS}) AS word
      FROM documents WHERE source = '{_DR_TARGET}'
    ), tgt AS (
      SELECT word,
             CAST((count(*) * 1000000) // (SELECT count(*) FROM w_t) AS BIGINT) AS ppm_t
      FROM w_t GROUP BY word
    ), w_r AS (
      SELECT doc_id, unnest({_DR_WORDS}) AS word
      FROM documents WHERE source != '{_DR_TARGET}'
    ), rest AS (
      SELECT word,
             CAST((count(*) * 1000000) // (SELECT count(*) FROM w_r) AS BIGINT) AS ppm_r
      FROM w_r GROUP BY word
    ), wt AS (
      SELECT t.word, t.ppm_t - COALESCE(r.ppm_r, 0) AS weight
      FROM tgt t LEFT JOIN rest r USING (word)
    ), dc AS (
      SELECT doc_id, word, count(*) AS c FROM w_r GROUP BY 1, 2
    ), scores AS (
      SELECT doc_id,
             CAST(SUM(c * weight) AS BIGINT) AS rel_score,
             CAST(SUM(c) AS BIGINT) AS n_scored
      FROM dc JOIN wt USING (word) GROUP BY doc_id
    ), ranked AS (
      SELECT doc_id, rel_score, n_scored,
             CAST(ROW_NUMBER() OVER (ORDER BY rel_score DESC, doc_id) AS INTEGER) AS rel_rank
      FROM scores
    )
    SELECT doc_id, rel_rank, rel_score, n_scored
    FROM ranked WHERE rel_rank <= {_DR_TOP} ORDER BY rel_rank
    """,
)
def q150_domain_relevance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 non-target documents by target-domain relevance: word
    weights are the exact integer ppm-frequency gap between the
    src0 target model and the rest-corpus model; doc score is the
    weighted word-count sum (BIGINT end to end). Weight table is
    target-vocab-sized and broadcast; the corpus never shuffles except
    the (doc, word) count; final top-n is TakeOrdered. See
    operators/training.py:domain_relevance."""
    from ..operators.training import domain_relevance

    docs = load_table(spark, sf_dir, "documents")
    return domain_relevance(
        docs.where(F.col("source") != _DR_TARGET),
        docs.where(F.col("source") == _DR_TARGET),
        "doc_id",
        "text",
        top_n=_DR_TOP,
    ).orderBy("rel_rank")


# --------------------------------------------------------------- q199
# Data-constrained epoch allocation (Muennighoff et al. 2023, "Scaling
# Data-Constrained Language Models"): given a token budget B = 2x the
# corpus and a repeat cap of 4 epochs per language, water-fill the
# budget across languages proportionally to the q144 temperature
# weights, capping any language at 4 epochs and redistributing its
# surplus to the uncapped rest — the allocation table a mixture
# builder trains from when the corpus, not compute, is the binding
# constraint. EXACT integer tokens end to end: the proportional share
# is computed in the overflow-safe split form
# (r // sw) * w + ((r % sw) * w) // sw  ==  r * w // sw
# (the naive product r*w overflows BIGINT once r reaches ~1e13 tokens
# — the 100 TB regime — while the split form never exceeds ~5e18),
# and the fixed-point iteration is replayed as 6 unrolled SQL steps
# (>= langs + 1, enough for every cap to fire plus the final
# proportional assignment; floor remainders < |uncapped| tokens stay
# unallocated and are reported as leftover_tokens).

_EPOCH_CAP = 4
_BUDGET_MULT = 2


def _q199_frames(spark: SparkSession, sf_dir: str) -> dict:
    """The q199 stage frame (the one corpus-scale per-lang token
    aggregation joined to the q144 weights) — exposed to
    tools/dump_plans.py (VERDICT r10 #7)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.groupBy("lang").agg(
        F.sum(token_count("text")["n_tokens_est"].cast("long"))
        .cast("long")
        .alias("t")
    )
    tw = q144_temperature_weights(spark, sf_dir).select("lang", "weight_ppm")
    return {"per_lang_tokens": toks.join(tw, "lang")}


@register(
    "q199_epoch_allocation",
    oracle=None,  # set below — composes the q144 member oracle
)
def q199_epoch_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token allocation under budget B = 2x corpus tokens
    and a 4-epoch repeat cap: n_tokens, q144 weight_ppm, cap_tokens,
    the water-filled alloc_tokens, epochs_ppm (exact integer ppm of
    one epoch), the cap flag, and the global budget/leftover. The
    corpus pays one per-lang token aggregation (bounded at |langs|
    rows); the fixed-point loop runs driver-side over those <= 5 rows
    — the q189 bounded-collect pattern — and is replayed by the
    oracle as 6 unrolled relational steps."""
    from ..operators.training import epoch_allocation

    shares = [
        (r["lang"], r["t"], r["weight_ppm"])
        for r in _q199_frames(spark, sf_dir)["per_lang_tokens"].collect()
    ]
    budget = _BUDGET_MULT * sum(t for _, t, _w in shares)
    rows, r = epoch_allocation(shares, budget, epoch_cap=_EPOCH_CAP)
    out = [
        (
            lang,
            s["t"],
            s["w"],
            s["cap"],
            s["alloc"],
            (s["alloc"] // s["t"]) * 1_000_000
            + ((s["alloc"] % s["t"]) * 1_000_000) // s["t"],
            s["capped"],
            budget,
            r,
        )
        for lang, s in sorted(rows.items())
    ]
    return spark.createDataFrame(
        out,
        "lang string, n_tokens long, weight_ppm long, cap_tokens long, "
        "alloc_tokens long, epochs_ppm long, is_capped boolean, "
        "budget_tokens long, leftover_tokens long",
    ).orderBy("lang")


def _q199_oracle() -> str:
    from . import REGISTRY

    q144 = REGISTRY["q144_temperature_weights"].oracle
    steps = []
    prev = "s0"
    for k in range(1, 7):
        steps.append(f"""
    x{k} AS (
      SELECT lang, t, w, cap, alloc, capped, r, fin,
             CASE WHEN NOT capped AND NOT fin AND sw > 0 AND r > 0
                  THEN (r // sw) * w + ((r % sw) * w) // sw
                  ELSE CAST(0 AS BIGINT) END AS p
      FROM (
        SELECT *, COALESCE(SUM(CASE WHEN NOT capped THEN w END)
                 OVER (), 0) AS sw
        FROM {prev}
      )
    ),
    y{k} AS (
      SELECT *,
             (NOT capped AND NOT fin AND alloc + p >= cap) AS wc,
             MAX(CASE WHEN NOT capped AND NOT fin AND alloc + p >= cap
                      THEN 1 ELSE 0 END) OVER () AS wc_any,
             COALESCE(SUM(CASE WHEN NOT capped AND NOT fin AND alloc + p >= cap
                      THEN cap - alloc END) OVER (), 0) AS cap_assigned,
             COALESCE(SUM(CASE WHEN NOT fin THEN p END) OVER (), 0) AS p_sum
      FROM x{k}
    ),
    s{k} AS (
      SELECT lang, t, w, cap,
             CASE WHEN fin OR capped THEN alloc
                  WHEN wc_any = 1 THEN alloc
                  ELSE alloc + p END
               + CASE WHEN NOT fin AND wc THEN cap - alloc ELSE 0 END AS alloc,
             capped OR (NOT fin AND wc) AS capped,
             CASE WHEN fin THEN r
                  WHEN wc_any = 1 THEN r - cap_assigned
                  ELSE r - p_sum END AS r,
             fin OR wc_any = 0 AS fin
      FROM y{k}
    )""")
        prev = f"s{k}"
    steps_sql = ",".join(steps)
    return f"""
    WITH toks AS (
      SELECT lang, CAST(SUM({_TOKS_DUCK}) AS BIGINT) AS t
      FROM documents GROUP BY lang
    ),
    budget AS (SELECT CAST({_BUDGET_MULT} * SUM(t) AS BIGINT) AS b FROM toks),
    s0 AS (
      SELECT tw.lang, tk.t, tw.weight_ppm AS w,
             CAST({_EPOCH_CAP} * tk.t AS BIGINT) AS cap,
             CAST(0 AS BIGINT) AS alloc, FALSE AS capped,
             (SELECT b FROM budget) AS r, FALSE AS fin
      FROM (SELECT lang, weight_ppm FROM ({q144})) tw
      JOIN toks tk USING (lang)
    ),{steps_sql}
    SELECT lang, t AS n_tokens, w AS weight_ppm, cap AS cap_tokens,
           CAST(alloc AS BIGINT) AS alloc_tokens,
           CAST((alloc // t) * 1000000 + ((alloc % t) * 1000000) // t
             AS BIGINT) AS epochs_ppm,
           capped AS is_capped,
           (SELECT b FROM budget) AS budget_tokens,
           CAST(r AS BIGINT) AS leftover_tokens
    FROM s6 ORDER BY lang
    """


from . import REGISTRY as _REG199  # noqa: E402

_REG199["q199_epoch_allocation"].oracle = _q199_oracle()


# --------------------------------------------------------------- q203
# Context-length sweep — the table behind the "what context length do
# we train at" decision: for each candidate budget B, what the corpus
# costs under the naive pad-to-B policy (every doc chunked to
# ceil(toks/B) sequences, last chunk padded) versus the packed lower
# bound (per-lang ceil(total/B) — what q59's packing approaches).
# Exact integers: ceil is the (t + B - 1) DIV B integer form, never
# float division; the waste ratios ride HUGEINT in the oracle (the
# waste x 1e6 product passes int64 at ~9e12 corpus tokens) and
# exact Python ints driver-side. ONE corpus scan feeds a per-lang aggregation
# (bounded at |langs| rows); the per-budget reshape happens
# driver-side over those <= 5 rows (the q189/q199 bounded-collect
# pattern) — the sweep never rescans the corpus per budget.

_CTX_BUDGETS = (512, 1024, 2048, 4096, 8192)


def _q203_frames(spark: SparkSession, sf_dir: str) -> dict:
    """The q203 stage frame (one corpus scan → per-lang conditional
    aggregation over every context budget) — exposed to
    tools/dump_plans.py (VERDICT r10 #7)."""
    docs = load_table(spark, sf_dir, "documents")
    aggs = [
        F.count("*").cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("total_toks"),
    ] + [
        F.sum(F.expr(f"(toks + {b} - 1) DIV {b}")).cast("long").alias(f"s{b}")
        for b in _CTX_BUDGETS
    ]
    return {
        "per_lang_budget_agg": docs.select(
            "lang", token_count("text")["n_tokens_est"].cast("long").alias("toks")
        )
        .groupBy("lang")
        .agg(*aggs)
    }


@register(
    "q203_context_length_sweep",
    oracle=f"""
    WITH t AS (
      SELECT lang, {_TOKS_DUCK} AS toks FROM documents
    ),
    per_lang AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(toks) AS BIGINT) AS total_toks,
             {", ".join(
               f"CAST(SUM((toks + {b} - 1) // {b}) AS BIGINT) AS s{b}"
               for b in _CTX_BUDGETS
             )}
      FROM t GROUP BY lang
    )
    {" UNION ALL ".join(
      f'''SELECT CAST({b} AS BIGINT) AS budget,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(total_toks) AS BIGINT) AS total_tokens,
           CAST(SUM(s{b}) AS BIGINT) AS pad_seqs,
           CAST(SUM(s{b}) * {b} AS BIGINT) AS pad_tokens,
           CAST(CAST(SUM(s{b}) * {b} - SUM(total_toks) AS HUGEINT) * 1000000
             // CAST(SUM(s{b}) * {b} AS HUGEINT) AS BIGINT) AS pad_waste_ppm,
           CAST(SUM((total_toks + {b} - 1) // {b}) AS BIGINT) AS packed_seqs_lb,
           CAST(SUM((total_toks + {b} - 1) // {b}) * {b} AS BIGINT)
             AS packed_tokens_lb,
           CAST(CAST(SUM((total_toks + {b} - 1) // {b}) * {b}
                 - SUM(total_toks) AS HUGEINT) * 1000000
             // CAST(SUM((total_toks + {b} - 1) // {b}) * {b} AS HUGEINT)
             AS BIGINT) AS packed_waste_lb_ppm
         FROM per_lang''' for b in _CTX_BUDGETS
    )}
    ORDER BY budget
    """,
)
def q203_context_length_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per candidate context budget: corpus doc/token mass, the
    pad-to-budget sequence count + padded-token mass + waste ppm, and
    the per-lang packed lower bound (sequence count, token mass,
    waste ppm) q59's packing approaches — all exact integer
    arithmetic, one corpus scan, driver-side reshape over the <= 5
    per-lang rows."""
    per_lang = _q203_frames(spark, sf_dir)["per_lang_budget_agg"].collect()
    out = []
    for b in _CTX_BUDGETS:
        n_docs = sum(r["n_docs"] for r in per_lang)
        total = sum(r["total_toks"] for r in per_lang)
        pad_seqs = sum(r[f"s{b}"] for r in per_lang)
        pad_tokens = pad_seqs * b
        packed_seqs = sum((r["total_toks"] + b - 1) // b for r in per_lang)
        packed_tokens = packed_seqs * b
        out.append(
            (
                b,
                n_docs,
                total,
                pad_seqs,
                pad_tokens,
                (pad_tokens - total) * 1_000_000 // pad_tokens,
                packed_seqs,
                packed_tokens,
                (packed_tokens - total) * 1_000_000 // packed_tokens,
            )
        )
    return spark.createDataFrame(
        out,
        "budget long, n_docs long, total_tokens long, pad_seqs long, "
        "pad_tokens long, pad_waste_ppm long, packed_seqs_lb long, "
        "packed_tokens_lb long, packed_waste_lb_ppm long",
    ).orderBy("budget")


# --------------------------------------------------------------- q204
# Shard manifest — the release artifact a downstream consumer verifies
# a downloaded shard against: q167's token-budgeted shard plan grain
# (same deterministic doc_id-order assignment, same budget) extended
# with an order-independent per-shard CONTENT digest — BIT_XOR over a
# 60-bit md5 lane of (doc_id : md5(text) : tok). XOR is the right
# fold at 100 TB: commutative (no per-shard sort to digest), exact,
# and overflow-free where a SUM of lanes would blow int64; doc_id
# uniqueness means elements never pairwise cancel. q204 ≡ q167 on the
# shared columns (pinned by test) — the manifest IS the plan plus
# verifiability.


@register(
    "q204_shard_manifest",
    oracle=f"""
    WITH per_doc AS (
      SELECT source, doc_id, CAST({_N_WORDS} AS BIGINT) AS tok,
             CAST(concat('0x', substring(md5(concat(
               CAST(doc_id AS VARCHAR), ':', md5(text), ':',
               CAST({_N_WORDS} AS VARCHAR))), 1, 15)) AS BIGINT) AS lane
      FROM documents
    ),
    cum AS (
      SELECT source, doc_id, tok, lane,
             CAST(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
      FROM per_doc
    )
    SELECT source,
           CAST((cum_tok - tok) // {_SHARD_BUDGET} AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS shard_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc,
           CAST(bit_xor(lane) AS BIGINT) AS content_digest
    FROM cum
    GROUP BY source, shard
    ORDER BY source, shard
    """,
)
def q204_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, shard): q167's plan columns plus the
    order-independent BIT_XOR content digest a consumer recomputes to
    verify a shard download — one window per source partition, one
    map-side-combining aggregation, digests on the 8-byte md5 lane."""
    docs = load_table(spark, sf_dir, "documents")
    tok_e = "size(split(trim(lower(text)), '\\\\s+'))"
    per_doc = docs.select(
        "source",
        "doc_id",
        F.expr(tok_e).cast("long").alias("tok"),
        F.expr(
            f"CAST(conv(substring(md5(concat("
            f"CAST(doc_id AS STRING), ':', md5(text), ':',"
            f"CAST({tok_e} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        ).alias("lane"),
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_doc.withColumn("cum_tok", F.sum("tok").over(w).cast("long"))
    return (
        cum.select(
            "source",
            F.expr(f"(cum_tok - tok) div {_SHARD_BUDGET}").alias("shard"),
            "doc_id",
            "tok",
            "lane",
        )
        .groupBy("source", "shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("tok").cast("long").alias("shard_tokens"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
            F.expr("bit_xor(lane)").cast("long").alias("content_digest"),
        )
        .orderBy("source", "shard")
    )
