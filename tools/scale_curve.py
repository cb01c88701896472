"""Two-point scale-curve evidence for the scaling claims (VERDICT r5
task #6): synthesize a deterministic 10× corpus from sf0.1 and measure
the watched query families at both scales, printing wall-time ratios.

The 10× corpus is ten replicas of the sf0.1 ``documents`` table:

* replica 0 is the original rows, byte for byte;
* replica r>0 keeps every STOPWORD verbatim (so the language-ID gate
  and stopword-ratio features classify replicas exactly like the
  originals) and substitutes every other word with an md5-derived
  token of the same length (``substring(md5(word || '#r'), 1,
  length(word))``), so within a replica the duplicate/near-duplicate
  structure maps through the substitution (same-word-set docs stay
  exact dups, shingle overlaps persist) while ACROSS replicas the
  vocabularies are disjoint — no artificial cross-replica near-dup
  pairs, which would otherwise make dedup work quadratic in the
  replica count instead of linear in the data (the failure a naive
  copy-the-rows corpus builds in);
* doc_id' = doc_id + r·10¹² keeps ids unique and dense per replica.

The result is "10× more same-shaped data": 10× rows, 10× tokens, ~10×
vocabulary, same per-doc statistics, same within-replica relational
structure — the honest input for checking that a plan argued linear
is measured linear.

Usage::

    python tools/scale_curve.py [out_dir]   # default /tmp/scale10x
    python tools/scale_curve.py /tmp/scale100x --replicas 100 \
        --queries q163_source_overlap --emb-queries q152_ivf_incremental_add

Prints a markdown table (query, sf0.1 best, Nx best, ratio) for
SCALING.md. Best-of-2 per point — the curve needs the ratio's order
of magnitude, not a tracked minimum.

Round 9 (VERDICT r8 task #3): ``--replicas`` builds an N× corpus with
the same construction (the third scale point for the steepest curves);
``--queries`` / ``--emb-queries`` restrict the sweep so a 100× run
doesn't re-measure the whole watch list. Embedding replicas beyond the
vector dimension negate the rotated copy (negation is orthogonal too,
so norms and within-replica structure still hold and cross-replica
cosines stay decorrelated instead of replica r and r+64 colliding).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from redshift_avro_spark.operators.text import STOPWORDS  # noqa: E402
from redshift_avro_spark.queries import load_all  # noqa: E402
from redshift_avro_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_STRIDE = 10**12
N_REPLICAS = 10

QUERIES = [
    "q31_minhash_lsh_candidates",
    "q49_curation_pipeline",
    "q114_bpe_encode",
    "q163_source_overlap",
    "q170_signal_blend",
    # round 8 (VERDICT r7 task #8): the round-7 corpus-token-scale
    # text families + the round-8 URL dedup
    "q180_bigram_lm_score",
    "q182_repetition_audit",
    "q183_url_dedup",
    # round 9: the full release funnel, the trigram KN LM, and the
    # top-N overlap cutoff (the q163 scale lever — its curve should
    # stay flat where q163's grows with the gram vocabulary)
    "q187_full_funnel",
    "q188_trigram_lm_score",
    "q190_source_overlap_topn",
]

# ANN families measured against a 10× EMBEDDINGS table: ten replicas,
# replica r > 0 cyclically rotates each vector by r coordinates —
# norms and within-replica pair structure are preserved (rotation is
# orthogonal), cross-replica cosines decorrelate, so the corpus is
# "10× more same-shaped vectors". Families chosen to be linear-in-N
# by design with FIXED query sets: brute-force scoring (q35), PQ/ADC
# encode+query (q147), IVF incremental add (q152). q94 (SemDeDup) is
# deliberately NOT measured this way: with a FIXED centroid count its
# per-cell pair scan is quadratic in cell size — the operator's
# documented contract is that k scales with the corpus.
EMB_QUERIES = [
    "q35_cosine_topk",
    "q147_pq_adc_topk",
    "q152_ivf_incremental_add",
]
EMB_ID_STRIDE = 10**7

# Graph families measured against an N× TRADE GRAPH (round 11, VERDICT
# r10 task #2 — q102/q119 previously had plan-diff evidence only): the
# graph queries read lineitem+orders, so the builder replicates those
# two tables with every key offset by r·10⁹ per replica. Each replica
# is a DISJOINT copy of the same trade graph — N× nodes, N× edges, N×
# wedges/triangles, identical per-component structure — so an operator
# argued linear-in-E must measure ≈linear here (no cross-replica edges
# can form: the key spaces never collide). Only the columns the graph
# queries project are written (l_orderkey/l_suppkey/l_partkey,
# o_orderkey/o_custkey/o_orderpriority) — column pruning makes the
# full-width replica pure dead weight at 100×.
GRAPH_QUERIES = [
    "q102_pagerank",
    "q119_triangle_count",
]
GRAPH_KEY_STRIDE = 10**9


def build_corpus(spark, out_dir: str, n_replicas: int = N_REPLICAS) -> None:
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    sw = ", ".join(f"'{w}'" for w in all_stop)
    parts = [docs]
    for r in range(1, n_replicas):
        subst = (
            f"array_join(transform(split(trim(lower(text)), '\\\\s+'), "
            f"w -> CASE WHEN w IN ({sw}) THEN w "
            f"ELSE substring(md5(concat(w, '#', '{r}')), 1, greatest(length(w), 1)) END), ' ')"
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * ID_STRIDE)).alias("doc_id"),
                F.expr(subst).alias("text"),
                "lang",
                "source",
                F.expr(f"length({subst})").cast(docs.schema["n_chars"].dataType).alias(
                    "n_chars"
                ),
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def build_embeddings(spark, out_dir: str, n_replicas: int = N_REPLICAS) -> None:
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    dim = 64
    parts = [emb]
    for r in range(1, n_replicas):
        k = r % dim
        rot = (
            f"concat(slice(embedding, {k + 1}, {dim - k}), "
            f"slice(embedding, 1, {k}))"
            if k
            else "embedding"
        )
        # past one full cycle of rotations, negate — also orthogonal,
        # so replica r and r+dim don't become exact duplicates
        if (r // dim) % 2 == 1:
            rot = f"transform({rot}, x -> -x)"
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * EMB_ID_STRIDE)).alias("vec_id"),
                F.expr(rot).alias("embedding"),
                "label",
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def build_trade_graph(spark, out_dir: str, n_replicas: int = N_REPLICAS) -> None:
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).select(
        "l_orderkey", "l_suppkey", "l_partkey"
    )
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    li_parts, o_parts = [], []
    for r in range(n_replicas):
        off = r * GRAPH_KEY_STRIDE
        li_parts.append(
            li.select(
                (F.col("l_orderkey") + off).alias("l_orderkey"),
                (F.col("l_suppkey") + off).alias("l_suppkey"),
                (F.col("l_partkey") + off).alias("l_partkey"),
            )
        )
        o_parts.append(
            orders.select(
                (F.col("o_orderkey") + off).alias("o_orderkey"),
                (F.col("o_custkey") + off).alias("o_custkey"),
                "o_orderpriority",
            )
        )
    big_li, big_o = li_parts[0], o_parts[0]
    for p in li_parts[1:]:
        big_li = big_li.unionByName(p)
    for p in o_parts[1:]:
        big_o = big_o.unionByName(p)
    big_li.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineitem.parquet")
    )
    big_o.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "orders.parquet")
    )


def _best_of_2(fn) -> float:
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="/tmp/scale10x")
    ap.add_argument("--replicas", type=int, default=N_REPLICAS)
    ap.add_argument("--queries", default=None, help="csv subset of the doc sweep")
    ap.add_argument("--emb-queries", default=None, help="csv subset of the ANN sweep")
    ap.add_argument(
        "--graph-queries",
        default="",
        help="csv subset of the trade-graph sweep (off by default: the "
        "graph tables are only built when asked for)",
    )
    ap.add_argument(
        "--reuse",
        action="store_true",
        help="skip the corpus build when out_dir already holds one "
        "(same deterministic construction, so a prior build at the "
        "same --replicas is byte-equivalent)",
    )
    args = ap.parse_args()
    queries = args.queries.split(",") if args.queries is not None else QUERIES
    emb_queries = (
        args.emb_queries.split(",") if args.emb_queries is not None else EMB_QUERIES
    )
    graph_queries = args.graph_queries.split(",")
    queries = [q for q in queries if q]
    emb_queries = [q for q in emb_queries if q]
    graph_queries = [q for q in graph_queries if q]

    registry = load_all()
    spark = get_spark(app_name="scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    label = f"{args.replicas}x"

    # warmup
    registry["q37_text_quality"].fn(spark, SF_DIR).count()

    if queries:
        if not (
            args.reuse
            and os.path.exists(os.path.join(args.out_dir, "documents.parquet"))
        ):
            build_corpus(spark, args.out_dir, args.replicas)
        n_small = spark.read.parquet(
            os.path.join(SF_DIR, "documents.parquet")
        ).count()
        if args.reuse:
            # a stale corpus from a different --replicas would silently
            # mislabel every ratio — the row count pins it
            n_have = spark.read.parquet(
                os.path.join(args.out_dir, "documents.parquet")
            ).count()
            if n_have != n_small * args.replicas:
                raise SystemExit(
                    f"--reuse: {args.out_dir} holds {n_have} docs, expected "
                    f"{n_small * args.replicas} for --replicas {args.replicas}; "
                    f"rebuild without --reuse"
                )
        n_big = spark.read.parquet(
            os.path.join(args.out_dir, "documents.parquet")
        ).count()
        print(f"corpus: {n_small} docs -> {n_big} docs ({n_big / n_small:.1f}x)")
        print(f"| query | sf0.1 best (s) | {label} best (s) | time ratio |")
        print("|---|---|---|---|")
        for name in queries:
            t_small = _best_of_2(lambda: registry[name].fn(spark, SF_DIR).count())
            t_big = _best_of_2(lambda: registry[name].fn(spark, args.out_dir).count())
            ratio = round(t_big / t_small, 2) if t_small else float("inf")
            print(f"| {name} | {t_small} | {t_big} | {ratio}x |")

    if emb_queries:
        if not (
            args.reuse
            and os.path.exists(os.path.join(args.out_dir, "embeddings.parquet"))
        ):
            build_embeddings(spark, args.out_dir, args.replicas)
        ne_small = spark.read.parquet(
            os.path.join(SF_DIR, "embeddings.parquet")
        ).count()
        ne_big = spark.read.parquet(
            os.path.join(args.out_dir, "embeddings.parquet")
        ).count()
        print(f"embeddings: {ne_small} -> {ne_big} ({ne_big / ne_small:.1f}x)")
        print(f"| query | sf0.1 best (s) | {label} best (s) | time ratio |")
        print("|---|---|---|---|")
        for name in emb_queries:
            t_small = _best_of_2(lambda: registry[name].fn(spark, SF_DIR).count())
            t_big = _best_of_2(lambda: registry[name].fn(spark, args.out_dir).count())
            ratio = round(t_big / t_small, 2) if t_small else float("inf")
            print(f"| {name} | {t_small} | {t_big} | {ratio}x |")

    if graph_queries:
        if not (
            args.reuse
            and os.path.exists(os.path.join(args.out_dir, "lineitem.parquet"))
        ):
            build_trade_graph(spark, args.out_dir, args.replicas)
        nl_small = spark.read.parquet(
            os.path.join(SF_DIR, "lineitem.parquet")
        ).count()
        nl_big = spark.read.parquet(
            os.path.join(args.out_dir, "lineitem.parquet")
        ).count()
        print(f"lineitem: {nl_small} -> {nl_big} ({nl_big / nl_small:.1f}x)")
        print(f"| query | sf0.1 best (s) | {label} best (s) | time ratio |")
        print("|---|---|---|---|")
        for name in graph_queries:
            t_small = _best_of_2(lambda: registry[name].fn(spark, SF_DIR).count())
            t_big = _best_of_2(lambda: registry[name].fn(spark, args.out_dir).count())
            ratio = round(t_big / t_small, 2) if t_small else float("inf")
            print(f"| {name} | {t_small} | {t_big} | {ratio}x |")
    spark.stop()


if __name__ == "__main__":
    main()
