"""Corpus-scrubbing operators for training-data pipelines.

The reference engine stops at decode (README.md:13-17 — downstream
processing is delegated to SQL on the decoded rows); these are the
standard curation passes a large-scale training pipeline runs on that
decoded corpus, each expressed as pure Catalyst so the hot path stays
JVM-side and Catalyst can prune/pushdown around it:

- benchmark decontamination: n-gram overlap between the corpus and an
  evaluation set (the standard 13-gram/5-gram exact-match protocol from
  the GPT-3 / PaLM appendices), as a broadcast semi-join against the
  benchmark gram set
- PII scrubbing: regex redaction (emails / phone numbers / IPv4) with
  per-row redaction counts — patterns restricted to syntax that parses
  identically under Java regex (Spark) and RE2 (DuckDB oracle)
- repetition metrics: Gopher-style duplicate n-gram fraction and
  top-gram share for quality filtering
- line-level dedup: C4-style drop of sentences that repeat too often
  across the corpus, reassembling documents in original sentence order

Scale notes (100 TB): every pass is one narrow projection plus at most
one aggregation shuffle; the benchmark gram set broadcasts (eval sets
are tiny relative to the corpus); line-dedup shuffles on the sentence
hash, which is md5-uniform — no skew. Nothing here is quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_ngrams",
    "decontaminate_candidates",
    "PII_PATTERNS",
    "scrub_pii",
    "repetition_metrics",
    "duplicated_spans",
]

_WORDS = "split(trim(lower({c})), '\\\\s+')"


def word_ngrams(text_col: str, n: int, distinct: bool = True) -> Column:
    """Array of space-joined word ``n``-grams of ``text_col``.

    The sequence guard matters: Spark's ``sequence(1, k)`` DESCENDS for
    k < 1, so short documents must short-circuit to an empty array.

    The split is bound once via the single-element-array lambda (round
    10): interpreted HOF lambdas get no CSE, so the former inline form
    re-ran the O(L) split per n-gram — O(L²)/doc. Round 11 moves the
    short-document guard INSIDE the binding: the outer when() evaluated
    its own split for the size check, so every row still paid the split
    twice. CASE on size(__ws) inside the lambda is value-identical (a
    NULL split array makes the CASE condition NULL → the empty-array
    ELSE, exactly what the otherwise() produced)."""
    words = _WORDS.format(c=text_col)
    grams = (
        f"transform(sequence(1, size(__ws) - {n - 1}), "
        f"i -> array_join(slice(__ws, i, {n}), ' '))"
    )
    if distinct:
        grams = f"array_distinct({grams})"
    return F.expr(
        f"transform(array({words}), __ws -> "
        f"CASE WHEN size(__ws) >= {n} THEN {grams} "
        f"ELSE CAST(array() AS array<string>) END)[0]"
    )


def decontaminate_candidates(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Documents whose text shares at least one word ``n``-gram with the
    benchmark set: (id, n_hit_grams) per contaminated document.

    The benchmark side is reduced to its DISTINCT gram set and
    broadcast — eval suites are O(MB) against an O(TB) corpus, so the
    corpus never shuffles; the only exchange is the per-doc count
    aggregation. Corpus grams are de-duplicated per document first, so
    n_hit_grams counts distinct contaminated grams.
    """
    bench_grams = (
        benchmark.select(F.explode(word_ngrams(text_col, n)).alias("gram")).distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("gram")
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_grams"))
    )


# Redaction patterns — the exact same source strings compile under
# Java regex and RE2 (no backrefs, no lookaround, bounded reps only).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-z0-9._%+#-]+@[a-z0-9.-]+\.[a-z]{2,}", "[EMAIL]"),
    ("phone", r"\d{2}-\d{3}-\d{3}-\d{4}", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def scrub_pii(text_col: str) -> Column:
    """Struct of (scrubbed, n_email, n_phone, n_ip): the text with every
    PII pattern replaced by its tag, plus per-pattern match counts.

    Counts are taken BEFORE any replacement and patterns are applied in
    declaration order, so an email containing a digit-run can't be
    double-counted by a later pattern after redaction.

    Spark SQL string literals strip unknown backslash escapes ('\\d' →
    'd'), so pattern backslashes are doubled here; the DuckDB oracle
    uses the raw pattern text unchanged."""
    counts = {
        name: f"size(regexp_extract_all({text_col}, '{pat.replace(chr(92), chr(92) * 2)}', 0))"
        for name, pat, _ in PII_PATTERNS
    }
    scrubbed = text_col
    for _, pat, tag in PII_PATTERNS:
        scrubbed = f"regexp_replace({scrubbed}, '{pat.replace(chr(92), chr(92) * 2)}', '{tag}')"
    return F.expr(
        f"named_struct("
        f"'scrubbed', {scrubbed}, "
        f"'n_email', {counts['email']}, "
        f"'n_phone', {counts['phone']}, "
        f"'n_ip', {counts['ipv4']})"
    )


def _duplicated_window_hits(
    df: DataFrame, id_col: str, text_col: str, w: int, min_docs: int
) -> DataFrame:
    """(id, pos) of every ``w``-word window that also occurs in at
    least ``min_docs − 1`` other documents — the shared discovery half
    of :func:`duplicated_spans` (reporting) and
    :func:`scrub_duplicated_spans` (removal).

    The gram rides as xxhash64(window text) from birth: the window
    string exists only inside the projection lambda, so the w×
    fan-out explodes, shuffles and joins 8-byte keys instead of
    ~w-word strings (the fan-out exchange is this operator's largest).
    Deterministic; a 64-bit collision (p ≈ n²/2⁶⁵, ~10⁻⁶ at 10⁷
    windows) could only over-mark one window as duplicated."""
    words = _WORDS.format(c=text_col)
    # split bound once (round 10) — the inline form re-split per window
    grams = (
        f"transform(array({words}), __ws -> "
        f"transform(sequence(1, size(__ws) - {w - 1}), "
        f"i -> xxhash64(array_join(slice(__ws, i, {w}), ' '))))[0]"
    )
    wins = (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.when(F.expr(f"size({words})") >= w, F.expr(grams)).otherwise(
                    F.expr("CAST(array() AS array<bigint>)")
                )
            ).alias("pos0", "gram"),
        )
        .select(F.col(id_col), (F.col("pos0") + 1).alias("pos"), "gram")
    )
    if min_docs == 2:
        # "≥ 2 distinct docs" ≡ min(doc) != max(doc): ONE map-side-
        # combining aggregation instead of distinct + countDistinct
        # (saves a full (gram, doc) exchange — the fan-out's largest).
        dup = (
            wins.groupBy("gram")
            .agg(F.min(id_col).alias("__lo"), F.max(id_col).alias("__hi"))
            .where(F.col("__lo") != F.col("__hi"))
            .select("gram")
        )
    else:
        dup = (
            wins.select("gram", id_col)
            .distinct()
            .groupBy("gram")
            .agg(F.count("*").alias("nd"))
            .where(F.col("nd") >= min_docs)
            .select("gram")
        )
    return wins.join(dup, "gram").select(id_col, "pos")


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 6,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicated-SPAN detection: the overlapping
    sliding-window form of substring dedup (the protocol of "Deduplicating
    Training Data Makes Language Models Better" — find every ``w``-word
    window that also occurs in at least ``min_docs − 1`` OTHER documents,
    then merge overlapping/adjacent duplicated windows into maximal
    spans). Distinct from the disjoint-chunk corpus-frequency pass
    (:func:`~..queries.scrub.q68_passage_dedup`): stride-1 windows catch
    duplicated text at ANY word offset, and the island merge reports the
    true extent of each copied passage rather than chunk-aligned pieces.

    Returns one row per document that has at least one window (≥ ``w``
    words): (id, n_windows, n_dup_windows, n_dup_spans, dup_span_words,
    max_span_words) — all exact integers. A window at position p covers
    words [p, p+w−1]; windows merge into one span while the gap between
    consecutive duplicated positions is ≤ w (their coverage is
    contiguous), and a span covering [s ..e] duplicates e − s + w words.

    Scale shape (100 TB): the window fan-out is a narrow projection
    (w× amplification, no shuffle); the duplicated-gram set is one
    (gram, doc) distinct + count aggregation on the uniform gram key
    with map-side combine; the join back is on the same uniform key;
    the island merge is a window over PARTITION BY doc — bounded by a
    single document's windows. Nothing quadratic, no skew: gram keys
    are near-unique except for the duplicates being hunted, and a
    pathological corpus-wide gram caps at one row per (gram, doc).
    """
    from pyspark.sql.window import Window

    words = _WORDS.format(c=text_col)
    hits = _duplicated_window_hits(df, id_col, text_col, w, min_docs)
    by_pos = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        hits.withColumn("prev", F.lag("pos").over(by_pos))
        .withColumn(
            "ni",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > w), 1
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("ni").over(by_pos.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    spans = islands.groupBy(id_col, "island").agg(
        F.min("pos").alias("s"), F.max("pos").alias("e"), F.count("*").alias("nw")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + w).cast("int").alias("dup_span_words"),
        F.max(F.col("e") - F.col("s") + w).cast("int").alias("max_span_words"),
        F.sum("nw").cast("int").alias("n_dup_windows"),
    )
    # n_windows is size(words) − w + 1 — a narrow projection off the
    # source, NOT a third evaluation of the exploded fan-out (which dup
    # and hits already each consume once): saves a full fan-out pass
    # plus its per-doc aggregation exchange.
    totals = df.select(
        F.col(id_col),
        (F.expr(f"size({words})") - (w - 1)).cast("int").alias("n_windows"),
    ).where(F.col("n_windows") >= 1)
    return totals.join(per_doc, id_col, "left").select(
        F.col(id_col),
        "n_windows",
        F.coalesce("n_dup_windows", F.lit(0)).cast("int").alias("n_dup_windows"),
        F.coalesce("n_dup_spans", F.lit(0)).cast("int").alias("n_dup_spans"),
        F.coalesce("dup_span_words", F.lit(0)).cast("int").alias("dup_span_words"),
        F.coalesce("max_span_words", F.lit(0)).cast("int").alias("max_span_words"),
    )


def scrub_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 6,
    min_docs: int = 2,
) -> DataFrame:
    """REMOVE cross-document duplicated spans from the text — the
    output half of exact-substring dedup (:func:`duplicated_spans`
    reports the spans; this rewrites the corpus without them, the
    "deduplicate training data" protocol's actual deliverable).

    A word position is scrubbed iff it is covered by ANY duplicated
    ``w``-word window (a window at pos p covers [p, p+w−1]). Returns
    one row per document: (id, n_words, n_scrubbed, scrubbed_text)
    where scrubbed_text is the whitespace-normalized lowercased text
    with covered words removed (normalization matches the window
    hashing, so what is detected is exactly what is removed).

    Scale shape: discovery is the shared hits sliver; covered indices
    explode only from hits (≤ w× the duplicated sliver, never the
    corpus) and collapse to one bounded array per affected doc; the
    rebuild is one narrow projection over the corpus with a left join
    against the per-doc covered arrays (AQE broadcasts the sliver)."""
    hits = _duplicated_window_hits(df, id_col, text_col, w, min_docs)
    cov = (
        hits.select(F.col(id_col), F.explode(F.expr(f"sequence(pos, pos + {w - 1})")).alias("p"))
        .distinct()
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("p")).alias("__cov"))
    )
    words = _WORDS.format(c=text_col)
    base = df.select(F.col(id_col), F.expr(words).alias("__w"))
    kept = "filter(sequence(1, size(__w)), p -> __cov IS NULL OR NOT array_contains(__cov, p))"
    return (
        base.join(cov, id_col, "left")
        .select(
            F.col(id_col),
            F.size("__w").cast("int").alias("n_words"),
            F.when(F.col("__cov").isNull(), F.lit(0))
            .otherwise(F.size("__cov"))
            .cast("int")
            .alias("n_scrubbed"),
            F.expr(
                f"array_join(transform({kept}, p -> element_at(__w, p)), ' ')"
            ).alias("scrubbed_text"),
        )
    )


def repetition_metrics(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2) -> DataFrame:
    """Gopher-style repetition metrics per document: total word
    ``n``-grams, duplicate-gram fraction (1 − distinct/total) and the
    share of the single most frequent gram.

    The top-gram share needs a per-(doc, gram) count — that is one
    explode + one aggregation keyed on (id, gram) and a second tiny agg
    on id, both map-side-combining; per-doc gram counts are bounded by
    document length, so no group ever exceeds one document's grams."""
    grams = df.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n, distinct=False)).alias("gram")
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
    return per_gram.groupBy(id_col).agg(
        F.sum("cnt").cast("int").alias("n_grams"),
        F.round(
            F.lit(1.0) - F.count("*") / F.sum("cnt").cast("double"), 6
        ).alias("dup_gram_fraction"),
        F.round(F.max("cnt") / F.sum("cnt").cast("double"), 6).alias("top_gram_share"),
    )
