"""Batched model-inference plumbing — the execution pattern for
running a scoring model over a candidate sliver at corpus scale.

A 100 TB pipeline reranks retrieval candidates (or quality-scores
documents) with a learned model. The Spark-side shape that makes this
viable is fixed regardless of the model: candidates only (never the
corpus), `mapInPandas` so batches arrive as Arrow frames, the model
WEIGHTS shipped to executors once as a Spark broadcast variable, and
the model constructed ONCE PER PARTITION inside the iterator — not
per row, not per batch.

The default model is a real (if small) one: a linear cross-encoder
over hashed query-term × document-word interaction features, using
the same weight formula as the q95 hashed-bigram quality classifier —
w(b) = (b · 2654435761) mod 2003 − 1001 over 1024 buckets — but here
MATERIALIZED as an int64 weight table that flows through
``sparkContext.broadcast`` exactly as real model weights would
(swap :func:`ce_weight_table` for a trained array and nothing else
changes). Scoring is exact integer arithmetic, so a DuckDB oracle
replays it bit-for-bit. The round-5 md5 fake is kept behind
``model="fake"`` for the plumbing-only tests.

Reference: the reference engine delegates all post-decode analytics
to SQL (README.md:13-17) and has no inference stage; this is part of
the beyond-reference training-data surface.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "rerank_with_model",
    "ce_weight_table",
    "ce_score",
    "fake_ce_score",
    "CE_N_BUCKETS",
    "CE_MAX_DOC_WORDS",
]

CE_N_BUCKETS = 1024
CE_MAX_DOC_WORDS = 32


def ce_weight_table():
    """The linear cross-encoder's weight table: w[b] =
    (b · 2654435761) mod 2003 − 1001 for b in [0, 1024) — the q95
    hashed-feature weight formula (operators/text.py::
    quality_classifier_score), materialized as an actual int64 array
    so it ships executor-side as a broadcast variable rather than
    being re-derived inline. A trained model drops in by replacing
    this array."""
    import numpy as np

    b = np.arange(CE_N_BUCKETS, dtype=np.int64)
    return (b * 2654435761) % 2003 - 1001


def _ce_bucket(term: str, word: str) -> int:
    """Feature hash for one (query term, doc word) interaction: first
    32 md5 bits of "<term> <word>" mod the bucket count — identical in
    Spark (conv(substring(md5(..),1,8),16,10)) and DuckDB."""
    h = hashlib.md5(f"{term} {word}".encode("utf-8")).hexdigest()[:8]
    return int(h, 16) % CE_N_BUCKETS


def ce_score(weights, terms: Sequence[str], words: Sequence[str]) -> int:
    """Exact integer cross-encoder logit: sum of weights over every
    (query term × doc word) interaction feature."""
    acc = 0
    for t in terms:
        for w in words:
            acc += int(weights[_ce_bucket(t, w)])
    return acc


def fake_ce_score(doc_id: int, text: str) -> int:
    """Round-5 deterministic fake (kept behind ``model="fake"``): the
    first 15 hex digits of md5("<doc_id>|<first 64 chars of text>") as
    a BIGINT. Stands in for a model logit with zero feature
    engineering; exactly replicable in any engine with md5."""
    payload = f"{doc_id}|{(text or '')[:64]}".encode("utf-8")
    return int(hashlib.md5(payload).hexdigest()[:15], 16)


class _LinearCrossEncoder:
    """Model with the lifecycle of a real one: constructed once per
    partition FROM THE BROADCAST (weights land on the executor once
    per JVM, not once per task), then called per Arrow batch."""

    def __init__(self, broadcast_state) -> None:
        self.weights, self.terms = broadcast_state.value

    def score_batch(self, word_lists: pd.Series) -> pd.Series:
        return pd.Series(
            [ce_score(self.weights, self.terms, ws) for ws in word_lists],
            dtype="int64",
        )


class _FakeCrossEncoder:
    """Stub counterpart (``model="fake"``), same lifecycle."""

    def __init__(self) -> None:
        self.loads = 1

    def score_batch(self, doc_ids: pd.Series, texts: pd.Series) -> pd.Series:
        return pd.Series(
            [fake_ce_score(int(i), t) for i, t in zip(doc_ids, texts)],
            dtype="int64",
        )


def rerank_with_model(
    candidates: DataFrame,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    rank_col: str = "rank",
    query_terms: DataFrame | None = None,
    model: str = "linear_ce",
) -> DataFrame:
    """Rerank a (rank, doc_id, …) candidate frame with the batched
    model: joins the candidate sliver back to its text (broadcast id
    equi-join, explicit hint — the corpus is scanned once, never
    shuffled), scores it through ``mapInPandas`` with the
    once-per-partition model, and windows the scored sliver into the
    new order.

    ``model="linear_ce"`` (default) scores hashed (query term × doc
    word) interaction features against the broadcast weight table;
    ``query_terms`` (a (term, df) frame, e.g.
    :func:`..retrieval.bm25_query_terms`) is required and its ≤
    n_query_terms rows are collected once on the driver (a bounded
    collect) to ride the broadcast with the weights. The document's
    word array is computed JVM-side (same split the retrieval stage
    uses) and capped at ``CE_MAX_DOC_WORDS``, so Python never
    re-tokenizes — no tokenizer-divergence class between engines.
    ``model="fake"`` keeps the round-5 md5 stub.

    Returns (doc_id, bm25_rank, ce_score, ce_rank, rank_delta) where
    rank_delta = bm25_rank − ce_rank (positive = the model promoted
    the document)."""
    for c in (rank_col, id_col):
        if c not in candidates.columns:
            raise ValueError(f"rerank_with_model: column {c!r} not in candidates")
    if id_col not in docs.columns or text_col not in docs.columns:
        raise ValueError(f"rerank_with_model: docs needs {id_col!r} and {text_col!r}")
    if model not in ("linear_ce", "fake"):
        raise ValueError(f"rerank_with_model: unknown model {model!r}")

    if model == "linear_ce":
        if query_terms is None:
            raise ValueError("rerank_with_model: linear_ce needs query_terms")
        terms = [
            r["term"]
            for r in query_terms.orderBy(F.desc("df"), F.asc("term")).collect()
        ]
        bc = candidates.sparkSession.sparkContext.broadcast(
            (ce_weight_table(), terms)
        )
        words = F.expr(
            f"slice(split(trim(lower({text_col})), '\\\\s+'), 1, {CE_MAX_DOC_WORDS})"
        )
        # NULL text → NULL word array. The DuckDB oracle's
        # unnest(NULL ws) yields zero feature rows, dropping the doc
        # from the rerank entirely — match that here (JVM-side filter)
        # instead of letting ce_score iterate None (ADVICE r6 #3).
        sliver = candidates.select(
            F.col(id_col).alias("doc_id"), F.col(rank_col).alias("bm25_rank")
        ).join(
            F.broadcast(
                F.broadcast(candidates.select(F.col(id_col).alias("doc_id"))).join(
                    docs.select(F.col(id_col).alias("doc_id"), words.alias("__words"))
                    .where(F.col("__words").isNotNull()),
                    "doc_id",
                )
            ),
            "doc_id",
        )

        def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            m = _LinearCrossEncoder(bc)  # once per partition
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "bm25_rank": pdf["bm25_rank"],
                        "ce_score": m.score_batch(pdf["__words"]),
                    }
                )

    else:
        sliver = candidates.select(
            F.col(id_col).alias("doc_id"), F.col(rank_col).alias("bm25_rank")
        ).join(
            F.broadcast(
                F.broadcast(candidates.select(F.col(id_col).alias("doc_id"))).join(
                    docs.select(
                        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
                    ),
                    "doc_id",
                )
            ),
            "doc_id",
        )

        def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            m = _FakeCrossEncoder()  # once per partition
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "bm25_rank": pdf["bm25_rank"],
                        "ce_score": m.score_batch(pdf["doc_id"], pdf["__text"]),
                    }
                )

    scored = sliver.mapInPandas(
        score, schema="doc_id long, bm25_rank long, ce_score long"
    )
    w = Window.orderBy(F.desc("ce_score"), F.asc("doc_id"))
    return scored.select(
        "doc_id",
        "bm25_rank",
        "ce_score",
        F.row_number().over(w).cast("long").alias("ce_rank"),
    ).withColumn("rank_delta", F.col("bm25_rank") - F.col("ce_rank"))
