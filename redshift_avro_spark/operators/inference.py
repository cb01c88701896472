"""Batched model-inference plumbing — the execution pattern for
running a scoring model over a candidate sliver at corpus scale.

A 100 TB pipeline reranks retrieval candidates (or quality-scores
documents) with a learned model. The Spark-side shape that makes this
viable is fixed regardless of the model: candidates only (never the
corpus), `mapInPandas` so batches arrive as Arrow frames, and the
model loaded ONCE PER PARTITION inside the iterator — not per row,
not per batch. Real model weights aren't available in this
environment (same policy as the media codecs in
:mod:`.multimodal`), so the model here is a deterministic fake — the
md5-derived integer score a DuckDB oracle can replicate exactly —
behind the same loading/batching plumbing a real cross-encoder would
use; swap :class:`_FakeCrossEncoder` for a real model and nothing
else changes.

Reference: the reference engine delegates all post-decode analytics
to SQL (README.md:13-17) and has no inference stage; this is part of
the beyond-reference training-data surface.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rerank_with_model", "fake_ce_score"]


def fake_ce_score(doc_id: int, text: str) -> int:
    """Deterministic fake cross-encoder: the first 15 hex digits of
    md5("<doc_id>|<first 64 chars of text>") as a BIGINT. Stands in
    for a model logit; exactly replicable in any engine with md5."""
    payload = f"{doc_id}|{(text or '')[:64]}".encode("utf-8")
    return int(hashlib.md5(payload).hexdigest()[:15], 16)


class _FakeCrossEncoder:
    """Model stub with the lifecycle of a real one: constructed once
    per partition (weights load, device placement), then called per
    Arrow batch with vectorized inputs."""

    def __init__(self) -> None:
        self.loads = 1  # a real model would read weights here

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
) -> DataFrame:
    """Rerank a (rank, doc_id, …) candidate frame with the batched
    model: joins the candidate sliver back to its text (broadcast id
    equi-join — the corpus is scanned once, never shuffled), scores it
    through ``mapInPandas`` with the once-per-partition model, and
    windows the scored sliver into the new order.

    Returns (doc_id, bm25_rank, ce_score, ce_rank, rank_delta) where
    rank_delta = bm25_rank − ce_rank (positive = the model promoted
    the document)."""
    for c in (rank_col, id_col):
        if c not in candidates.columns:
            raise ValueError(f"rerank_with_model: column {c!r} not in candidates")
    if id_col not in docs.columns or text_col not in docs.columns:
        raise ValueError(f"rerank_with_model: docs needs {id_col!r} and {text_col!r}")

    sliver = candidates.select(
        F.col(id_col).alias("doc_id"), F.col(rank_col).alias("bm25_rank")
    ).join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")),
        "doc_id",
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _FakeCrossEncoder()  # once per partition
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "bm25_rank": pdf["bm25_rank"],
                    "ce_score": model.score_batch(pdf["doc_id"], pdf["__text"]),
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
