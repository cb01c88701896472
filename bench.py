"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is forced with a cheap count() (no driver-side collect of
full results); a warmup run of one small query absorbs JVM/codegen
startup so per-query numbers reflect steady-state plans.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_ROOT)

from redshift_avro_spark.queries import load_all  # noqa: E402
from redshift_avro_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q08_agg_distinct",
    "q11_window_topk",
    "q16_json_super",
    "q17_event_windows",
    "q20_avro_roundtrip",
    "q21_container_cells",
    "q23_schema_evolution",
    "q24_kpl_spring_pipeline",
    "q31_minhash_lsh_candidates",
    "q32_simhash",
    "q35_cosine_topk",
    "q37_text_quality",
    "q39_doc_fingerprint",
    "q49_curation_pipeline",
]

# Operator families beyond the round-1/2 headline set, measured at the
# same SF but reported in a SEPARATE field: "value" keeps summing
# exactly the original headline set so cross-round totals stay
# like-for-like. Round 6 (VERDICT r5 task #1) puts this surface under
# REGRESSION DISCIPLINE: best-of-3 per query (same estimator as the
# headline — single-run numbers swung 1.5-2.6x under host noise) with
# a per-query BUDGET in seconds at sf0.1. A best exceeding its budget
# lands in the detail file's "regressions" field and on stderr — loud,
# not advisory. Budgets: the VERDICT-set targets for the watched
# queries (q114<=2.8, q119<=4, q163<=2.5, q152/q147/q159<=2.2) and
# ~1.5-1.6x the round-5 single-run elsewhere (best-of-3 sits below
# single-run, so headroom shrinks, not grows).
EXTENDED: dict[str, float] = {
    "q113_bm25_topk": 2.0,
    # recalibrated r8 (2.62/2.83/3.00 same-session quiet bests) and
    # AGAIN r10: three r10 best-of-3 points on untouched code measured
    # 2.555 (quiet) / 2.788 (combined-load soak) / 3.223 (sentinel-0.3
    # host — tripped the 3.2 budget by 0.7%, noise not regression).
    # 4.0 = ~1.55x the quiet best, clearing the observed noisy-best
    # band while still far under the 12.8 s real regression this
    # budget caught in r6.
    "q114_bpe_encode": 4.0,
    "q115_pca_projection": 1.0,
    "q116_knn_graph": 2.6,
    "q117_zorder_layout": 1.3,
    "q119_triangle_count": 4.0,
    "q121_cohort_retention": 1.1,
    "q122_histogram_quantiles": 2.0,
    "q129_column_profile": 1.2,
    "q130_market_share": 2.0,
    "q131_robust_outliers": 0.7,
    "q146_duplicated_spans": 0.9,
    "q147_pq_adc_topk": 2.2,
    "q148_hard_negatives": 1.2,
    "q149_length_buckets": 0.7,
    "q150_domain_relevance": 1.7,
    "q152_ivf_incremental_add": 2.2,
    "q153_corpus_datasheet": 0.7,
    "q159_ann_recall": 2.2,
    "q160_edit_distance_verify": 1.8,
    "q161_span_scrub": 0.7,
    "q162_lexical_diversity": 0.7,
    "q163_source_overlap": 2.5,
    "q164_mixture_concentration": 0.8,
    "q165_retrieval_metrics": 2.2,
    "q166_inference_rerank": 2.4,
    "q167_shard_plan": 0.7,
    "q168_winnowing_fps": 0.5,
    "q169_langid_confusion": 1.3,
    # recalibrated r8: its two per-doc staged frames (signal join,
    # q-rank) moved checkpoint → parquet (corpus-ROW-scale rule, same
    # reclassification as q180/q182's token frames); measured best-of-3
    # 1.95 checkpoint vs 2.64 parquet — the documented 100 TB
    # fault-tolerance trade
    "q170_signal_blend": 3.4,
    "q171_matryoshka_audit": 1.3,
    "q173_rendezvous_plan": 1.0,
    # round 6 additions
    "q174_quant_cosine_drift": 0.8,
    "q175_minhash_calibration": 2.4,  # calibrated from best-of-3 2.13 s
    "q176_zipf_audit": 0.8,
    "q177_survivor_policy": 3.4,  # calibrated from best-of-3 3.12 s (LSH+verify+CC composition)
    "q178_release_diff": 1.0,
    "q179_ivf_delete": 2.2,
    # round 7 additions
    # recalibrated r8: bigram_lm_tokens moved checkpoint → parquet (the
    # corpus-token-scale staging rule, VERDICT r7 #2); the parquet
    # boundary costs ~0.1-0.2 s locally (measured checkpoint 1.23 vs
    # parquet 1.33-1.73 best-of-3) — the deliberate 100 TB
    # fault-tolerance trade, same as q49's documented ~13%
    "q180_bigram_lm_score": 2.2,
    "q181_semantic_cell_stats": 1.9,  # calibrated from best-of-3 1.50 s
    "q182_repetition_audit": 1.1,  # calibrated from best-of-3 0.80 s
    # round 8 additions
    "q183_url_dedup": 1.5,  # calibrated from best-of-3 1.07 s
    "q184_embedding_decontam": 0.5,  # calibrated from best-of-3 0.30 s
    # warm best-of-3 0.46 s; the first run additionally pays the
    # shared _sd_cells training, amortized across the process
    "q185_ivf_decontam": 0.8,
    "q186_c4_line_filter": 0.8,  # calibrated from best-of-3 0.47 s
    # round 9 additions — calibrated from same-session best-of-3 at
    # sf0.1 (sentinel best 0.20 s): q187 full funnel 4.27 s (it runs
    # the whole URL→C4→quality→dedup→decontam→packing DAG with 8
    # per-stage count actions), q188 trigram KN LM 2.40 s
    "q187_full_funnel": 6.0,
    # like q185: the first run pays the shared _kn_scores training
    # (~2.4 s at sf0.1), later runs read the staged parquet (best-of-3
    # min ≈ 0.06 s warm) — the training cost shows in the 10× curve
    # and the run range, not the best
    "q188_trigram_lm_score": 3.4,
    # q189 (round 10, VERDICT r9 #5): the rep verdict is computed
    # inline in the heur+clf scan (top_word_share_ppm_expr) and the
    # real r9 cost turned out to be an O(L²) interpreted-lambda bug in
    # quality_classifier_score (the split re-ran per bigram), fixed by
    # the array-binding trick. Measured best-of-3 2.731 s at sf0.1
    # (was 8.16 s); the trigram pass stays memoized (_kn_scores).
    # Budget from that measurement + headroom.
    "q189_filter_agreement": 4.5,
    "q190_source_overlap_topn": 2.8,  # calibrated from best-of-3 1.94 s
    # round 10 additions — calibrated from same-session best-of-3 at
    # sf0.1: q191 planted-leak decontam audit 1.56 s, q192 per-source
    # release datasheet 0.88 s, q193 per-benchmark-item reach 1.55 s
    "q191_external_decontam": 2.4,
    "q192_source_datasheet": 1.5,
    "q193_benchmark_reach": 2.4,
    # like q185/q188: the first run pays the shared _bpe_encoded
    # training+encode (~8.8 s at sf0.1), later runs read the staged
    # parquet (best-of-3 min 0.41 s warm) — the training cost shows in
    # q114's own row and the run range, not the best
    "q194_tokenizer_efficiency": 0.9,
    "q195_boilerplate_lines": 1.4,  # calibrated from best-of-3 0.84 s
    # one classifier scan + a ~40-bin histogram window; calibrated
    # from warm best 0.79 s measured on a sentinel-0.65 (loaded) host
    "q196_filter_threshold_sweep": 1.5,
    # like q188: the first run pays the shared _kn_scores training;
    # warm best 0.763 s measured on a sentinel-0.56 (loaded) host —
    # the bounded per-lang histogram + broadcast threshold join
    "q197_perplexity_buckets": 1.6,
    # (source, gram) DISTINCT + per-gram MIN(source) on the md5 lane;
    # best-of-3 0.743 s warm on a sentinel-0.47 (loaded) host
    "q198_gram_novelty": 1.6,
    # one per-lang token aggregation + the q144 count agg (narrow
    # pruned scans), loop on <= 5 collected rows; best-of-3 2.318 s
    # on a sentinel-0.69 (loaded) host
    "q199_epoch_allocation": 2.6,
    # classifier scan over the synthesized text + checkpointed
    # histogram + the U-statistic job; best-of-3 1.959 s on a
    # sentinel-0.50 (loaded) host
    "q200_filter_roc_audit": 3.0,
    # one k-means training + checkpointed assignment feeding four
    # broadcast probe joins (+ the exact q35 baseline); best-of-3
    # 2.07 s on a sentinel-0.75 (heavily loaded) host
    "q202_ivf_nprobe_sweep": 2.8,
    # one narrow scan + per-lang agg, driver reshape over <= 5 rows;
    # best-of-3 0.686 s on a sentinel-0.49 (loaded) host
    "q203_context_length_sweep": 1.3,
    # one per-source window + one agg with XOR lanes; best-of-3
    # 0.585 s on a sentinel-0.58 (loaded) host
    "q204_shard_manifest": 1.3,
    # one k-means training + bucket/cell population joins; best-of-3
    # 1.41 s on a sentinel-0.54 (loaded) host
    "q205_ann_cost_audit": 2.4,
}

_DETAIL_FILE = os.environ.get("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL_r11.json")

# Sentinel-normalized budget check (VERDICT r8 task #6): the sentinel
# records host noise, but raw seconds were still compared against the
# budgets — a loaded host could fire false alarms. Each extended best
# is now divided by max(1, sentinel_best_mean / _SENTINEL_QUIET)
# before the comparison, so a measurably-loaded host scales the check
# instead of tripping it. The factor is clamped at 1.0 from below:
# sentinel jitter on an already-quiet host (measured 0.11-0.22 s band)
# must not TIGHTEN budgets and fire alarms the raw numbers don't
# support. Raw numbers are still recorded unmodified.
#
# ADVICE r9: the reference is the quiet band's UPPER edge (0.22 s),
# not its midpoint — with 0.15, ordinary quiet-host jitter to 0.22 s
# yielded noise_factor ≈ 1.47 and silently loosened every budget by
# ~47%. With 0.22, noise_factor > 1 only on a materially loaded host;
# runs where normalization flips a verdict are flagged in the detail
# file (``normalization_changed_verdict``) so a masked raw overrun is
# visible, never silent.
_SENTINEL_QUIET = 0.22  # quiet-host reference best (round-8 band upper edge)


def _best_of_3(fn) -> tuple[float, float, list]:
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return (
        round(min(runs), 3),
        round(sum(runs) / len(runs), 3),
        [round(min(runs), 3), round(max(runs), 3)],
    )


# Host-noise sentinel (VERDICT r7 task #3): a FIXED pure-JVM
# microbenchmark — whole-stage-codegen sum over spark.range, no I/O,
# no Python, no shuffle — timed best-of-3 before and after the query
# runs. Its cost depends only on CPU availability, so cross-round
# drift in the sentinel separates host noise from code regressions
# mechanically: a round whose headline moved 1.2x while the sentinel
# also moved 1.2x is a noisy host, not a regression. Quiet-host
# reference (local[32], this box, measured round 8): best-of-3
# 0.12-0.21 s; treat a sentinel best ≥ ~0.3 s as a loaded host.
_SENTINEL_ROWS = 500_000_000


def _sentinel(spark) -> dict:
    best, mean, rng = _best_of_3(
        lambda: spark.range(_SENTINEL_ROWS)
        .selectExpr("sum(id * 2 + 1) AS s")
        .collect()
    )
    return {"best": best, "mean": mean, "range": rng, "rows": _SENTINEL_ROWS}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    registry = load_all()
    spark = get_spark(app_name="redshift-avro-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + codegen + parquet footer reads, plus one pandas-UDF
    # query at the smallest SF so the Python worker pool is spawned
    # before anything is timed
    registry["q02_parts_filter"].fn(spark, sf_dir).count()
    registry["q20_avro_roundtrip"].fn(spark, "/root/testdata/sf0.001").count()

    sentinel_before = _sentinel(spark)

    # best-of-3 per query: later runs reuse warmed code paths, and
    # min() is robust to transient host noise (measured run-to-run
    # drift of 2-4x on individual queries under a noisy neighbor —
    # best-of-2 was not enough to shake it). The JSON also carries the
    # per-query mean and range so cross-round comparisons can use a
    # like-for-like estimator (VERDICT r2 "What's wrong" #1): "queries"
    # stays the best-of-3 (same field as BENCH_r02).
    timings: dict[str, float] = {}
    means: dict[str, float] = {}
    ranges: dict[str, list] = {}
    for name in HEADLINE:
        timings[name], means[name], ranges[name] = _best_of_3(
            lambda n=name: registry[n].fn(spark, sf_dir).count()
        )

    total = round(sum(timings.values()), 3)

    extended: dict[str, float] = {}
    ext_means: dict[str, float] = {}
    ext_ranges: dict[str, list] = {}
    for name in EXTENDED:
        extended[name], ext_means[name], ext_ranges[name] = _best_of_3(
            lambda n=name: registry[n].fn(spark, sf_dir).count()
        )

    # VERDICT r3 "What's wrong" #1: the enriched single-line output grew
    # past the driver's captured stdout tail, so BENCH_r03 parsed as null.
    # Detail (mean/range/extended/budgets/regressions) goes to a file;
    # stdout carries only the short driver-spec line, printed LAST so it
    # is always in the tail. Budget violations ALSO go to stderr so a
    # human (or CI grep) can't miss them.
    sentinel_after = _sentinel(spark)

    # budget comparison on sentinel-normalized seconds (see the
    # _SENTINEL_QUIET comment): both sentinel measurements bracket the
    # query runs, so their mean best is the round's load estimate
    noise_factor = max(
        1.0,
        round(
            (sentinel_before["best"] + sentinel_after["best"])
            / 2.0
            / _SENTINEL_QUIET,
            3,
        ),
    )
    ext_normalized = {
        name: round(best / noise_factor, 3) for name, best in extended.items()
    }
    regressions = [
        {
            "query": name,
            "best": extended[name],
            "normalized": ext_normalized[name],
            "budget": EXTENDED[name],
        }
        for name in EXTENDED
        if ext_normalized[name] > EXTENDED[name]
    ]
    # queries whose RAW best overran the budget but whose normalized
    # value passed — i.e. the noise normalization changed the verdict.
    # Recorded so a loaded-host run can't silently absorb a real
    # regression of about the noise factor's size (ADVICE r9).
    normalization_changed_verdict = [
        {
            "query": name,
            "best": extended[name],
            "normalized": ext_normalized[name],
            "budget": EXTENDED[name],
            "noise_factor": noise_factor,
        }
        for name in EXTENDED
        if extended[name] > EXTENDED[name] >= ext_normalized[name]
    ]

    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sentinel_before": sentinel_before,
        "sentinel_after": sentinel_after,
        "queries": timings,
        "queries_mean": means,
        "queries_range": ranges,
        "total_mean": round(sum(means.values()), 3),
        "extended_queries": extended,
        "extended_means": ext_means,
        "extended_ranges": ext_ranges,
        "noise_factor": noise_factor,
        "sentinel_quiet_ref": _SENTINEL_QUIET,
        "extended_normalized": ext_normalized,
        "extended_budgets": EXTENDED,
        "extended_total": round(sum(extended.values()), 3),
        "regressions": regressions,
        "normalization_changed_verdict": normalization_changed_verdict,
        "sf": sf,
    }
    with open(os.path.join(_REPO_ROOT, _DETAIL_FILE), "w") as f:
        json.dump(detail, f, indent=1)
        f.write("\n")
    if regressions:
        print(
            "BUDGET REGRESSIONS: "
            + ", ".join(
                f"{r['query']} best {r['best']}s (normalized {r['normalized']}s)"
                f" > budget {r['budget']}s"
                for r in regressions
            ),
            file=sys.stderr,
        )
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
