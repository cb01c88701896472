"""Training-data assembly operators: deterministic sampling, splits,
mixture rebalancing, and sequence packing.

The reference delegates all post-decode processing to warehouse SQL
(README.md:13-17), so these — like :mod:`dedup` and :mod:`text` — are
the large-pipeline surface this engine adds on top of the reference's
ingest path. Everything here is a pure Catalyst expression plan:

- Randomness is md5-derived (``uniform_hash``), never ``rand()``: the
  same row always draws the same uniform, so samples are reproducible
  across retries, stages, and engines — a training-data pipeline
  requirement (resumable jobs must not resample) and what makes these
  operators oracle-checkable.
- Nothing here shuffles except ``mixture_rebalance``'s tiny per-stratum
  count aggregate (broadcast back) and ``pack_sequences``'s per-shard
  window — sampling and splitting are narrow maps that scan-prune and
  scale embarrassingly.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "chunk_documents",
    "uniform_hash",
    "hash_sample",
    "stratified_sample",
    "train_test_split",
    "mixture_rebalance",
    "pack_sequences",
    "length_bucket_stats",
    "pow2_bucket_sql",
    "domain_relevance",
    "epoch_allocation",
]


def epoch_allocation(
    shares: Sequence[tuple[str, int, int]],
    budget: int,
    epoch_cap: int = 4,
    max_steps: int = 6,
) -> tuple[dict[str, dict], int]:
    """Capped water-filling of an integer token ``budget`` across
    groups (Muennighoff et al. 2023's data-constrained repeat regime):
    each ``(key, n_tokens, weight)`` group receives budget
    proportionally to ``weight``, capped at ``epoch_cap * n_tokens``;
    a capped group's surplus redistributes to the uncapped rest, one
    cap wave per step, until a step fires no cap (then the final
    proportional assignment happens and the loop stops). Pure integer
    driver-side math over the ALREADY-AGGREGATED per-group rows (the
    q189 bounded-collect pattern — inputs are |groups| rows, never the
    corpus): the proportional share uses the overflow-safe split form
    ``(r // sw) * w + ((r % sw) * w) // sw == r * w // sw`` (the naive
    product overflows int64 once r reaches ~1e13 tokens — the 100 TB
    regime). Floor remainders (< |uncapped| tokens per assignment)
    stay unallocated and are returned as leftover.

    Returns ``({key: {t, w, cap, alloc, capped}}, leftover)``. The
    q199 oracle replays this loop as ``max_steps`` unrolled relational
    steps, so ``max_steps`` must be >= |groups| + 1."""
    if len(shares) + 1 > max_steps:
        # each step resolves at most one cap wave; fewer steps than
        # groups + 1 can strand budget as phantom "leftover" — and the
        # q199 oracle unrolls exactly max_steps, so a silent shortfall
        # would agree across engines while being WRONG
        raise ValueError(
            f"epoch_allocation needs max_steps >= len(shares) + 1 "
            f"({len(shares) + 1}), got {max_steps}"
        )
    rows = {
        key: {"t": t, "w": w, "cap": epoch_cap * t, "alloc": 0, "capped": False}
        for key, t, w in shares
    }
    r, fin = budget, False
    for _ in range(max_steps):
        sw = sum(s["w"] for s in rows.values() if not s["capped"])
        ps = {
            key: (
                (r // sw) * s["w"] + ((r % sw) * s["w"]) // sw
                if not s["capped"] and not fin and sw > 0 and r > 0
                else 0
            )
            for key, s in rows.items()
        }
        wc = {
            key
            for key, s in rows.items()
            if not s["capped"] and not fin and s["alloc"] + ps[key] >= s["cap"]
        }
        if fin:
            continue
        if wc:
            r -= sum(rows[key]["cap"] - rows[key]["alloc"] for key in wc)
            for key in wc:
                rows[key]["alloc"] = rows[key]["cap"]
                rows[key]["capped"] = True
        else:
            for key, s in rows.items():
                if not s["capped"]:
                    s["alloc"] += ps[key]
            r -= sum(ps.values())
            fin = True
    return rows, r

_TWO_32 = float(1 << 32)


def uniform_hash(key: Column | str, salt: str = "") -> Column:
    """Deterministic uniform draw in [0, 1) from ``md5(salt || key)``.

    The first 8 md5 hex chars are an exact 32-bit integer; dividing by
    2^32 is a power-of-two float division, so the result is bit-exact
    in any IEEE engine (the portability contract the DuckDB oracles
    rely on). ``salt`` decorrelates independent decisions on the same
    key (sample vs split vs rebalance)."""
    k = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(F.md5(F.concat(F.lit(salt), k.cast("string"))), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(_TWO_32)


def hash_sample(
    df: DataFrame, fraction: float, key_col: str, salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose uniform draw is
    below ``fraction``. Narrow (no shuffle), reproducible, and stable
    under re-execution — unlike ``DataFrame.sample``, which draws per
    task attempt."""
    return df.where(uniform_hash(key_col, salt) < F.lit(float(fraction)))


def _rate_for(strata_col: str, rates: Mapping[str, float], default: float) -> Column:
    expr = F.lit(float(default))
    for value, rate in sorted(rates.items()):
        expr = F.when(F.col(strata_col) == value, F.lit(float(rate))).otherwise(expr)
    return expr


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    key_col: str,
    salt: str = "strat",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli sampling with an explicit rate per stratum
    value (e.g. keep 10% of web text but all books). Still a narrow
    map: the rate lookup is a literal CASE chain, the draw is
    ``uniform_hash`` — no shuffle, no driver round trip."""
    return df.where(
        uniform_hash(key_col, salt) < _rate_for(strata_col, rates, default_rate)
    )


def train_test_split(
    df: DataFrame,
    key_col: Column | str,
    test_fraction: float = 0.1,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Label each row ``train``/``test`` on a deterministic hash of
    ``key_col``. Pass a GROUP key (user id, normalized-content hash,
    dedup-cluster id) rather than the row id to get a leakage-safe
    split: every row sharing the key lands on the same side, so
    near-identical documents can't straddle the boundary."""
    u = uniform_hash(key_col, salt)
    return df.withColumn(
        split_col,
        F.when(u < F.lit(float(test_fraction)), F.lit("test")).otherwise(F.lit("train")),
    )


def mixture_rebalance(
    df: DataFrame,
    strata_col: str,
    target_shares: Mapping[str, float],
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Downsample strata so the surviving corpus matches ``target_shares``
    exactly (in expectation) while keeping as much data as possible.

    Feasible total ``M = min_s(count_s / share_s)`` — the largest corpus
    whose composition can hit every target share without upsampling;
    each stratum then keeps ``M * share_s / count_s`` of its rows. The
    stratum that binds the minimum keeps everything.

    Plan shape: one partial-aggregated count per stratum (tiny result),
    a scalar min over it, broadcast join back, then the narrow hash
    filter — the full corpus shuffles zero times."""
    shares = {k: float(v) for k, v in target_shares.items()}
    counts = (
        df.where(F.col(strata_col).isin(list(shares)))
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__share", _rate_for(strata_col, shares, 0.0))
    )
    feasible = counts.agg(
        F.min(F.col("__n").cast("double") / F.col("__share")).alias("__m")
    )
    keep = (
        counts.crossJoin(F.broadcast(feasible))
        .select(
            strata_col,
            F.least(
                F.lit(1.0), F.col("__m") * F.col("__share") / F.col("__n").cast("double")
            ).alias("__keep"),
        )
    )
    return (
        df.join(F.broadcast(keep), strata_col)
        .where(uniform_hash(key_col, salt) < F.col("__keep"))
        .drop("__keep")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    partition_cols: Optional[Sequence[str]] = None,
    seq_col: str = "seq_id",
) -> DataFrame:
    """Assign each document to a fixed-token-budget training sequence:
    running token total (ordered by ``order_col``) divided by the
    budget. A document lands in the sequence its PRECEDING cumulative
    total falls in, so sequences fill in order and a document larger
    than the budget overflows its own sequence without disturbing
    earlier ones.

    Packing is per shard (``partition_cols`` — e.g. language or a hash
    bucket): a single global running sum would serialize the corpus
    through one window partition, which is exactly the shuffle shape to
    avoid at 100 TB. Real pipelines pack within shards and interleave
    shards at read time."""
    parts = list(partition_cols or [])
    w = (
        Window.partitionBy(*parts)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col).cast("long")).over(w)
    before = (cum - F.col(token_col)).cast("double")
    return df.withColumn(
        seq_col, F.floor(before / F.lit(float(budget))).cast("long")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking — the context-window prep step
    for RAG indexing / long-doc training: each document becomes
    overlapping word-window chunks with stable (doc, chunk_index)
    identity.

    Chunk k covers words [k·(window−overlap), …) for up to ``window``
    words; chunks are emitted while their start is inside the document,
    so the final chunk may be shorter (and, per standard sliding
    semantics, a short tail can be contained in its predecessor —
    deterministic either way). Empty documents yield no chunks.

    Pure Catalyst fan-out (transform + posexplode — U4's one-cell→N
    shape applied to text): a narrow map stage, no shuffle; chunk
    identity is positional, so the operation is reproducible under
    retries and re-partitioning at any scale."""
    if overlap >= window:
        raise ValueError("chunk_documents: overlap must be < window")
    stride = window - overlap
    words = f"split(trim(lower({text_col})), '\\\\s+')"
    # split bound once via the single-element-array lambda (round 10):
    # the inline form re-ran the O(L) split per chunk — O(L²/stride)/doc.
    # Round 11 moves the empty-document guard INSIDE the binding too
    # (the outer CASE's size() check evaluated its own split — 2
    # splits/row → 1); a NULL split array makes the CASE condition
    # NULL → the empty-array ELSE, exactly what the outer guard
    # produced.
    chunks = (
        f"transform(array({words}), __ws -> "
        f"CASE WHEN size(__ws) > 0 AND trim({text_col}) != '' THEN "
        f"transform(sequence(0, CAST(ceil(size(__ws) / {stride}.0) AS INT) - 1), "
        f"k -> named_struct("
        f"'start_word', k * {stride}, "
        f"'n_words', least({window}, size(__ws) - k * {stride}), "
        f"'chunk_text', array_join(slice(__ws, k * {stride} + 1, {window}), ' '))) "
        f"ELSE CAST(array() AS ARRAY<STRUCT<start_word INT, n_words INT, chunk_text STRING>>) END)[0]"
    )
    return df.select(
        F.col(id_col),
        F.posexplode(F.expr(chunks)).alias("chunk_index", "c"),
    ).select(
        id_col,
        F.col("chunk_index").cast("int").alias("chunk_index"),
        F.col("c.start_word").cast("int").alias("start_word"),
        F.col("c.n_words").cast("int").alias("n_words"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def pow2_bucket_sql(col: str, lo: int = 16, hi: int = 1 << 20) -> str:
    """A CASE ladder mapping an integer column to the smallest
    power-of-2 bucket ≥ its value (floored at ``lo``, capped at ``hi``)
    — pure integer branching, so the SAME source string evaluates
    identically in Spark SQL and DuckDB (no log2, which the oracle
    hash-stability rules ban as engine-variant float math)."""
    if lo < 1 or lo >= hi:
        raise ValueError(f"need 1 <= lo < hi, got lo={lo} hi={hi}")
    whens = []
    b = lo
    while b < hi:
        whens.append(f"WHEN {col} <= {b} THEN CAST({b} AS BIGINT)")
        b <<= 1
    return "CASE " + " ".join(whens) + f" ELSE CAST({hi} AS BIGINT) END"


def length_bucket_stats(
    df: DataFrame,
    tokens_col: str = "n_tok",
    lo: int = 16,
    hi: int = 1 << 20,
) -> DataFrame:
    """Per-bucket batch-geometry report for fixed-shape training
    batches: documents grouped by power-of-2 token-length bucket, with
    the padding waste a pad-to-bucket batch assembler pays —
    (bucket, n_docs, sum_tokens, padded_tokens, waste_ppm), all exact
    integers (ppm by integer division). The companion measurement to
    :func:`pack_sequences`: packing eliminates the waste this report
    quantifies, which is how a pipeline decides whether packing is
    worth its shuffle.

    Scale shape: one narrow bucket projection + one aggregation on the
    ≤ ~17-value bucket key with map-side combine — group count is
    bounded by the ladder, not the corpus, so the final exchange is
    O(buckets) rows.
    """
    bucket = F.expr(pow2_bucket_sql(tokens_col, lo, hi))
    agg = (
        df.select(F.col(tokens_col).cast("bigint").alias("n_tok"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("sum_tokens"),
        )
    )
    return agg.select(
        "bucket",
        "n_docs",
        "sum_tokens",
        (F.col("bucket") * F.col("n_docs")).cast("bigint").alias("padded_tokens"),
        F.expr(
            "CAST(((bucket * n_docs - sum_tokens) * 1000000) div (bucket * n_docs) AS BIGINT)"
        ).alias("waste_ppm"),
    )


def domain_relevance(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 30,
) -> DataFrame:
    """Importance-based data selection, the DSIR shape (Xie et al.,
    "Data Selection for Language Models via Importance Resampling"):
    score every raw-corpus document by how much its word distribution
    resembles a small TARGET domain, then keep the top scorers. The
    importance weight of a word is the exact integer ppm-frequency gap
    ``ppm_target(w) − ppm_corpus(w)`` (log-ratio weights would need
    ln(), which the oracle rules ban as engine-variant float math; the
    frequency-gap linear scorer is the same rank-by-target-likeness
    signal in exact BIGINT arithmetic). Only words present in the
    target model carry weight — absent words contribute a constant
    under smoothing and would bloat the table to corpus vocabulary.

    Returns the ``top_n`` corpus documents by (score DESC, id):
    (id, rel_rank, rel_score, n_scored).

    Scale shape (100 TB): the target model is domain-sample-sized and
    the weight table is target-vocab-sized — both broadcast; the
    corpus side is one narrow explode + a (doc, word) count on a
    uniform composite key + one per-doc sum, all map-side combining;
    the final top-n is TakeOrdered (no global sort), with the rank
    assigned by a window over only the surviving n rows.
    """
    split_ = f"split(trim(lower({text_col})), '\\\\s+')"
    tw = target.select(F.explode(F.expr(split_)).alias("word"))
    t_ppm = (
        tw.groupBy("word")
        .agg(F.count("*").alias("ct"))
        .crossJoin(F.broadcast(tw.agg(F.count("*").alias("tot"))))
        .select("word", F.expr("CAST((ct * 1000000) div tot AS BIGINT)").alias("ppm_t"))
    )
    rw = corpus.select(F.col(id_col), F.explode(F.expr(split_)).alias("word"))
    r_ppm = (
        rw.groupBy("word")
        .agg(F.count("*").alias("cr"))
        .crossJoin(F.broadcast(rw.agg(F.count("*").alias("tot"))))
        .select("word", F.expr("CAST((cr * 1000000) div tot AS BIGINT)").alias("ppm_r"))
    )
    wt = (
        t_ppm.join(r_ppm, "word", "left")
        .select(
            "word",
            (F.col("ppm_t") - F.coalesce("ppm_r", F.lit(0))).cast("bigint").alias("weight"),
        )
    )
    dc = rw.groupBy(id_col, "word").agg(F.count("*").alias("c"))
    scores = (
        dc.join(F.broadcast(wt), "word")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("c") * F.col("weight")).cast("bigint").alias("rel_score"),
            F.sum("c").cast("bigint").alias("n_scored"),
        )
    )
    top = scores.orderBy(F.desc("rel_score"), F.asc(id_col)).limit(top_n)
    w = Window.orderBy(F.desc("rel_score"), F.asc(id_col))
    return top.withColumn("rel_rank", F.row_number().over(w)).select(
        id_col, "rel_rank", "rel_score", "n_scored"
    )
