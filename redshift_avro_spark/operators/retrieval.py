"""Corpus retrieval operators — BM25 ranked search.

The reference delegates all post-decode analytics to Redshift SQL
(README.md:13-17); full-text relevance ranking over a decoded corpus
is the retrieval step an LLM-data pipeline runs to mine domain
documents, so it gets a first-class distributed implementation here.

Determinism contract (what lets a DuckDB oracle value-hash-match):
BM25's usual ``ln``-based idf is libm-dependent, so the idf keeps the
RATIONAL Robertson form (N − df + 0.5)/(df + 0.5) — a monotone
transform of the log with the identical ranking — and every double is
produced by one fixed tree of IEEE mult/div/add over integer inputs
(bit-deterministic in any engine). Per-term scores are cast to
DECIMAL(28,12) BEFORE summing so Spark's partial-aggregation order
can't flip low bits (the registry-wide hash-stability rule).

100 TB story: two uniform-key aggregations build the postings stats
(term frequency per doc, document frequency per term), the derived
query-term table is tiny and broadcast, and scoring touches only the
postings of the query terms (the broadcast semi-join prunes everything
else before the doc-length join). No corpus-wide shuffle survives into
the scoring stage; top-k is a TakeOrdered, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .staging import materialize

__all__ = ["bm25_topk", "bm25_eval", "bm25_query_terms", "BM25_TSCORE_SQL"]

# One fixed expression tree for the per-(doc, term) BM25 score with
# k1=1.2, b=0.75: idf_rational * tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl)),
# avgdl expanded as sum_dl/n_docs so every input is an exact integer.
# The oracle (queries/text.py q113) embeds this same string — one copy
# of the formula, two engines.
BM25_TSCORE_SQL = (
    "CAST(((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))"
    " / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))"
    " * ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))"
    " / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)"
    " + CAST(0.75 AS DOUBLE) * (CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)"
    " / CAST(sum_dl AS DOUBLE))))) AS DECIMAL(28,12))"
)


def bm25_query_terms(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_query_terms: int = 8,
) -> DataFrame:
    """The corpus-derived query: the ``n_query_terms`` most
    document-frequent informative terms (2 ≤ df ≤ N/2 — present enough
    to match, absent from half the corpus so they discriminate), with
    the unique (df DESC, term) order making the selection
    reproducible. Shared by :func:`bm25_topk` (which derives it
    internally when not given one) and callers that need the SAME
    terms for a downstream stage (q166's cross-encoder rerank) —
    extract + ``materialize`` it once rather than paying the corpus
    dfreq pass twice. Returns (term, df)."""
    if n_query_terms < 1:
        raise ValueError(f"bm25_query_terms: n_query_terms must be >= 1, got {n_query_terms}")
    words = F.expr(f"split(trim(lower({text_col})), '\\\\s+')")
    toks = docs.select(F.col(id_col).alias("doc_id"), F.explode(words).alias("term"))
    dfreq = (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("__tf"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )
    n = docs.agg(F.count("*").cast("long").alias("n_docs"))
    return (
        dfreq.crossJoin(F.broadcast(n))
        .where((F.col("df") * 2 <= F.col("n_docs")) & (F.col("df") >= 2))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(n_query_terms)
        .select("term", "df")
    )


def bm25_topk(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_query_terms: int = 8,
    k: int = 10,
    query_terms: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents by BM25 relevance to a derived query.

    The query is :func:`bm25_query_terms` (derived here when
    ``query_terms`` is None); a caller with its own terms — real query
    terms, or a pre-``materialize``d shared derivation — passes a
    (term, df) frame and the scoring plan is identical.

    Returns ``(rank, doc_id, dl, n_terms, score)`` — rank 1..k by
    (score DESC, doc_id), dl the document's token length, n_terms how
    many query terms matched.
    """
    if n_query_terms < 1 or k < 1:
        raise ValueError(f"bm25_topk: n_query_terms and k must be >= 1, got {n_query_terms}, {k}")
    words = F.expr(f"split(trim(lower({text_col})), '\\\\s+')")
    toks = docs.select(F.col(id_col).alias("doc_id"), F.explode(words).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    n = docs.agg(F.count("*").cast("long").alias("n_docs"))
    s = dl.agg(F.sum("dl").cast("long").alias("sum_dl"))

    qt = (
        bm25_query_terms(
            docs, id_col=id_col, text_col=text_col, n_query_terms=n_query_terms
        )
        if query_terms is None
        else query_terms.select("term", "df")
    )

    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(s))
        .select("doc_id", F.expr(BM25_TSCORE_SQL).alias("tscore"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_terms"),
        F.round(F.sum("tscore").cast("double"), 6).alias("score"),
    )
    top = agg.join(dl, "doc_id").orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    # rank the k survivors (window over k rows, not the corpus)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        "dl",
        "n_terms",
        "score",
    )


def bm25_eval(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_query_terms: int = 8,
    k: int = 10,
    salt_buckets: int = 64,
) -> DataFrame:
    """Retrieval-quality evaluation: pair the corpus's top
    ``n_query_terms`` eligible terms into two-term queries, rank each
    with BM25, and score the ranking against the exact AND-relevance
    set (documents containing EVERY query term) — hits@k, precision@k,
    recall@k, first relevant rank and MRR@k, all exact integer ppm
    (reciprocal rank is rational, so no log-based nDCG is needed for
    an oracle-exact metric).

    Per-query top-k is the salted two-phase window: rank within
    (query, xxhash64(doc) % ``salt_buckets``) first — each partition
    sorts only its own sliver — then rank the ≤ buckets·k survivors
    per query. A query term may match half the corpus (df ≤ N/2), so
    a single per-query sort window would funnel half the corpus into
    one partition at 100 TB; the two-phase result is identical because
    the (score DESC, doc_id) order is a total order.

    Returns one row per query: (query_id, n_query_terms_q, n_relevant,
    hits_at_k, p_at_k_ppm, recall_at_k_ppm, first_rel_rank, mrr_ppm)
    with first_rel_rank = 0 when no relevant doc reaches the top k."""
    if n_query_terms < 2 or k < 1:
        raise ValueError(
            f"bm25_eval: need n_query_terms >= 2 and k >= 1, got {n_query_terms}, {k}"
        )
    words = F.expr(f"split(trim(lower({text_col})), '\\\\s+')")
    toks = docs.select(F.col(id_col).alias("doc_id"), F.explode(words).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n = docs.agg(F.count("*").cast("long").alias("n_docs"))
    s = dl.agg(F.sum("dl").cast("long").alias("sum_dl"))

    # qt is n_query_terms rows but derives from a full corpus pass
    # (dfreq) and feeds two consumers (scored + nq); scored is the
    # postings sliver every downstream frame (ranking, relevance,
    # metrics) reuses. Eager lineage cuts keep the whole postings
    # pipeline to ONE evaluation — without them the pre-execution plan
    # replays tf/dl/dfreq per consumer (41 enumerated exchanges).
    qt = (
        dfreq.crossJoin(F.broadcast(n))
        .where((F.col("df") * 2 <= F.col("n_docs")) & (F.col("df") >= 2))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(n_query_terms)
        .select(
            "term",
            "df",
            F.expr(
                "CAST((row_number() OVER (ORDER BY df DESC, term) + 1) div 2 AS BIGINT)"
            ).alias("query_id"),
        )
    )
    qt = materialize(qt, label="bm25_query_terms", default="checkpoint")
    nq = qt.groupBy("query_id").agg(F.count("*").cast("long").alias("nq"))

    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(s))
        .select("query_id", "doc_id", F.expr(BM25_TSCORE_SQL).alias("tscore"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.round(F.sum("tscore").cast("double"), 6).alias("score"),
        )
    )
    # postings sliver feeding ranking AND relevance → checkpoint
    # default (query-terms-matched rows only; cheap to rebuild)
    scored = materialize(scored, label="bm25_postings", default="checkpoint")
    # phase 1: local top-k inside (query, salt) — bounded partitions
    w1 = Window.partitionBy(
        "query_id", F.expr(f"pmod(xxhash64(doc_id), {salt_buckets})")
    ).orderBy(F.desc("score"), F.asc("doc_id"))
    # phase 2: global top-k per query over <= salt_buckets * k rows
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = (
        scored.withColumn("r1", F.row_number().over(w1))
        .where(F.col("r1") <= k)
        .withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "n_terms", "rank")
    )

    rel = scored.join(nq, "query_id").where(F.col("n_terms") == F.col("nq"))
    relc = rel.groupBy("query_id").agg(F.count("*").cast("long").alias("n_relevant"))
    hits = ranked.join(
        rel.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_semi"
    )
    hm = hits.groupBy("query_id").agg(
        F.count("*").cast("long").alias("hits_at_k"),
        F.min("rank").cast("long").alias("first_rel_rank"),
    )
    return (
        nq.join(relc, "query_id", "left")
        .join(hm, "query_id", "left")
        .select(
            "query_id",
            F.col("nq").alias("n_query_terms_q"),
            F.coalesce("n_relevant", F.lit(0)).cast("long").alias("n_relevant"),
            F.coalesce("hits_at_k", F.lit(0)).cast("long").alias("hits_at_k"),
            F.expr(f"coalesce(hits_at_k, 0) * 1000000 div {k}").alias("p_at_k_ppm"),
            F.expr(
                "coalesce(hits_at_k, 0) * 1000000 div greatest(coalesce(n_relevant, 0), 1)"
            ).alias("recall_at_k_ppm"),
            F.coalesce("first_rel_rank", F.lit(0)).cast("long").alias("first_rel_rank"),
            F.expr(
                "CASE WHEN first_rel_rank IS NULL THEN CAST(0 AS BIGINT)"
                " ELSE 1000000 div first_rel_rank END"
            ).alias("mrr_ppm"),
        )
        .orderBy("query_id")
    )
