"""Vocabulary-induction query: BPE merge learning (q105).

The iterative tokenizer-training step (see
:mod:`..operators.bpe`). The oracle UNROLLS the five merge rounds as
CTE chains — pair counting, unique-keyed argmax, literal-replace merge
application, re-tokenization — which is only possible because every
step of the operator is deterministic string/integer work with
identical semantics in Spark (Java ``replace``) and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import load_table, register
from ..operators.bpe import apply_bpe_merges, learn_bpe_merges

_ROUNDS = 5

# shared oracle header: the bracket-wrapped md5-prefix tokenization
# (must mirror operators.bpe.corpus_strings exactly)
_BASE_CTES = """w AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ws FROM documents
    ),
    c0 AS (
      SELECT doc_id,
             concat('[', array_to_string(list_transform(ws, x -> substring(md5(x), 1, 8)), ']['), ']') AS s
      FROM w WHERE len(ws) >= 1
    )"""


def _round_cte(k: int) -> str:
    return f"""tok{k} AS (
      SELECT doc_id, string_split(substring(s, 2, length(s) - 2), '][') AS t FROM c{k - 1}
    ),
    p{k} AS (
      SELECT concat('[', t[i], '][', t[i + 1], ']') AS pattern,
             CAST(count(*) AS BIGINT) AS pair_count
      FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM tok{k})
      GROUP BY 1
    ),
    t{k} AS (
      SELECT pattern, replace(pattern, '][', '+') AS merged, pair_count
      FROM p{k} ORDER BY pair_count DESC, pattern LIMIT 1
    ),
    c{k} AS (SELECT c.doc_id, replace(c.s, t.pattern, t.merged) AS s FROM c{k - 1} c, t{k} t),
    n{k} AS (
      SELECT CAST(SUM(len(string_split(substring(s, 2, length(s) - 2), ']['))) AS BIGINT)
             AS tokens_after
      FROM c{k}
    )"""


@register(
    "q105_bpe_merges",
    oracle=f"""
    WITH {_BASE_CTES},
    {", ".join(_round_cte(k) for k in range(1, _ROUNDS + 1))}
    SELECT * FROM (
      {" UNION ALL ".join(
          f"SELECT {k} AS merge_round, pattern, merged, pair_count, n{k}.tokens_after FROM t{k}, n{k}"
          for k in range(1, _ROUNDS + 1)
      )}
    ) ORDER BY merge_round
    """,
)
def q105_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the corpus's top-5 BPE merges: per round, the most
    frequent adjacent token pair (unique (count DESC, pattern) argmax)
    is fused corpus-wide by literal leftmost non-overlapping replace,
    and the next round counts pairs of the NEW tokenization.

    Scale shape (per round): one narrow re-tokenization, one
    uniform-key pair aggregation, a 1-row TakeOrdered whose winner
    rides back in as a broadcast — no driver collect; corpus
    localCheckpoint keeps the plan flat. Production BPE trainers run
    hundreds of rounds on a SAMPLED subset — the sample size is a
    knob on the same plan, not a redesign."""
    docs = load_table(spark, sf_dir, "documents")
    return learn_bpe_merges(docs, id_col="doc_id", text_col="text", rounds=_ROUNDS).orderBy(
        "merge_round"
    )


@register(
    "q114_bpe_encode",
    oracle=f"""
    WITH {_BASE_CTES},
    {", ".join(_round_cte(k) for k in range(1, _ROUNDS + 1))},
    enc AS (
      SELECT c0.doc_id,
             CAST(len(string_split(substring(c0.s, 2, length(c0.s) - 2), '][')) AS BIGINT)
               AS tokens_before,
             string_split(substring(c{_ROUNDS}.s, 2, length(c{_ROUNDS}.s) - 2), '][') AS t
      FROM c0 JOIN c{_ROUNDS} USING (doc_id)
    )
    SELECT doc_id, tokens_before,
           CAST(len(t) AS BIGINT) AS tokens_after,
           CAST(len(list_filter(t, x -> contains(x, '+'))) AS BIGINT) AS n_merged,
           CAST((tokens_before - len(t)) * 1000000 // tokens_before AS BIGINT) AS saved_ppm
    FROM enc ORDER BY doc_id
    """,
)
def q114_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the learned BPE merge table — the scale
    half of tokenization: q105 trains on a sample once, this pass runs
    over the FULL corpus. The merge table collapses to one broadcast
    array and each document folds the merges in round order with
    ``aggregate(..., replace)`` — a single narrow projection, no
    shuffle, no Python, no driver collect. Per doc: token counts
    before/after, fused-symbol count, ppm tokens saved.

    The oracle replays the same five merges per document via the q105
    CTE chain (sequential corpus-wide replace ≡ the per-doc fold,
    because each round's replace is literal and leftmost)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, id_col="doc_id", text_col="text", rounds=_ROUNDS).select(
        "merge_round", "pattern", "merged"
    )
    return apply_bpe_merges(docs, merges, id_col="doc_id", text_col="text").orderBy("doc_id")
