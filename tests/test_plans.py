"""Plan-shape regression tests: the scale properties SURVEY §4 claims
Catalyst provides must actually show up in the physical plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from redshift_avro_spark.plans import (
    broadcast_join_count,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    wholestage_codegen_spans,
)
from redshift_avro_spark.queries import load_all, load_table

REGISTRY = load_all()


def test_filter_pushdown_reaches_scan(spark):
    df = REGISTRY["q02_parts_filter"].fn(spark, SF_SMOKE)
    pf = pushed_filters(df)
    assert pf, "q02 must push predicates into the parquet scan"
    assert any("p_size" in f for f in pf)


def test_column_pruning(spark):
    df = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    cols = read_schema_columns(df)
    assert cols and set(cols[0]) == {"l_orderkey", "l_quantity"}, cols


def test_star_join_broadcasts_dims(spark):
    df = REGISTRY["q05_local_supplier_volume"].fn(spark, SF_SMOKE)
    assert broadcast_join_count(df) >= 3, "region/nation/supplier must broadcast"


def test_q01_single_shuffle_agg(spark):
    df = REGISTRY["q01_pricing_summary"].fn(spark, SF_SMOKE)
    # partial+final hash agg → exactly one hash shuffle (plus the
    # top-level sort's range exchange)
    assert shuffle_count(df) <= 2


def test_topk_no_global_sort_shuffle(spark):
    from redshift_avro_spark.plans import uses_top_k

    df = REGISTRY["q03_shipping_priority"].fn(spark, SF_SMOKE)
    assert uses_top_k(df), "ORDER BY+LIMIT must compile to TakeOrderedAndProject"
    df.collect()  # AQE finalizes the plan (and codegen markers) on execution
    assert wholestage_codegen_spans(df) >= 1


def test_semi_join_plan(spark):
    df = REGISTRY["q06_semi_join"].fn(spark, SF_SMOKE)
    assert has_broadcast_join(df) or shuffle_count(df) >= 1


def test_avro_decode_is_narrow(spark):
    """The decode chain (hex→unhex→from_avro) adds NO shuffle beyond
    the query's own repartition+agg: decode must stay a map stage."""
    from redshift_avro_spark.queries.avro_pipeline import EVENT_AVRO_SCHEMA, _EVENT_COLS
    from redshift_avro_spark.sources.columns import from_avro, from_hex, to_avro, to_hex

    e = load_table(spark, SF_SMOKE, "events")
    hexed = e.select(to_hex(to_avro(F.struct(*_EVENT_COLS), EVENT_AVRO_SCHEMA)).alias("h"))
    decoded = hexed.select(from_avro(from_hex("h"), EVENT_AVRO_SCHEMA).alias("ev")).select("ev.*")
    assert shuffle_count(decoded) == 0


def test_salted_join_matches_plain_join(spark):
    """Salting must not change results — only shuffle distribution."""
    from redshift_avro_spark.operators.skew import salted_join

    # heavy-hitter: 90% of probe rows share one key
    probe = spark.range(2000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 7 ELSE id END AS k", "id AS payload"
    )
    build = spark.range(50).selectExpr("id AS bk", "id * 100 AS bval")
    plain = probe.join(build, probe.k == build.bk, "inner").select("k", "payload", "bval")
    salted = salted_join(probe, build, "k", "bk", n_salts=8).select("k", "payload", "bval")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_left_join(spark):
    from redshift_avro_spark.operators.skew import salted_join

    probe = spark.range(100).selectExpr("id % 5 AS k", "id AS payload")
    build = spark.range(3).selectExpr("id AS bk", "id * 10 AS bval")
    plain = probe.join(build, probe.k == build.bk, "left").select("k", "payload", "bval")
    salted = salted_join(probe, build, "k", "bk", n_salts=4, how="left").select(
        "k", "payload", "bval"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Pre-bucketing both sides on the join key co-locates partitions:
    the join plans with ZERO exchanges — the 100 TB answer for a join
    that repeats every run (SURVEY §7.1: reuse a partitioning)."""
    import uuid as _uuid

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ta, tb = f"bj_a_{_uuid.uuid4().hex[:6]}", f"bj_b_{_uuid.uuid4().hex[:6]}"
        spark.range(10_000).selectExpr("id AS k", "id * 2 AS va").write.bucketBy(
            8, "k"
        ).sortBy("k").mode("overwrite").saveAsTable(ta)
        spark.range(10_000).selectExpr("id AS k", "id * 3 AS vb").write.bucketBy(
            8, "k"
        ).sortBy("k").mode("overwrite").saveAsTable(tb)
        joined = spark.table(ta).join(spark.table(tb), "k")
        assert shuffle_count(joined) == 0, "bucketed equi-join must not shuffle"
        assert joined.count() == 10_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_decontamination_broadcasts_bench_grams(spark):
    # q65's benchmark gram set must broadcast: the corpus side of the
    # contamination join may be 100 TB and must not shuffle for it.
    df = REGISTRY["q65_decontamination"].fn(spark, SF_SMOKE)
    assert has_broadcast_join(df), "benchmark gram set must broadcast"
    # corpus shuffles only for the per-doc count + final sort
    assert shuffle_count(df) <= 3


def test_pii_scrub_is_map_only(spark):
    # q66 is a narrow regex projection: nothing but the final ORDER BY
    # may shuffle, and the whole thing stays in codegen.
    df = REGISTRY["q66_pii_scrub"].fn(spark, SF_SMOKE)
    assert shuffle_count(df) <= 1
    df.collect()
    assert wholestage_codegen_spans(df) >= 1


def test_passage_dedup_no_window_sort(spark):
    # q68 counts chunks via groupBy+join, NOT a window over
    # PARTITION BY chunk (which would sort the full corpus).
    from redshift_avro_spark.plans import explain_str

    df = REGISTRY["q68_passage_dedup"].fn(spark, SF_SMOKE)
    assert "Window" not in explain_str(df, "simple")


def test_quality_classifier_is_map_only(spark):
    # q95 (hashed-bigram linear scorer) must be a narrow projection:
    # nothing but the final ORDER BY may shuffle — at 100 TB this is a
    # pure scan-speed pass like q66.
    df = REGISTRY["q95_quality_classifier"].fn(spark, SF_SMOKE)
    assert shuffle_count(df) <= 1


def test_doc_chunking_is_narrow_fanout(spark):
    # q96 (sliding-window chunking) is posexplode fan-out with no
    # shuffle beyond the final ORDER BY; no Window node anywhere.
    from redshift_avro_spark.plans import explain_str

    df = REGISTRY["q96_doc_chunking"].fn(spark, SF_SMOKE)
    assert shuffle_count(df) <= 1
    assert "Window" not in explain_str(df, "simple")


def test_semantic_dedup_pairs_join_on_cell(spark):
    # q94's quadratic near-dup scan must be bounded per k-means cell:
    # the pair generation joins on cid, never a corpus-wide cartesian.
    from redshift_avro_spark.plans import explain_str

    df = REGISTRY["q94_semantic_dedup"].fn(spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, "pairs must join on the cell key"


def test_range_join_no_nested_loop(spark):
    # the whole point of q98: the non-equi BETWEEN join must compile to
    # an equi-join on the time-bucket key, not a nested loop
    from redshift_avro_spark.plans import explain_str

    df = REGISTRY["q98_range_join"].fn(spark, SF_SMOKE)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pivot_single_aggregation_pass(spark):
    # enumerated pivot values + count cells folded into the same agg:
    # three table scans total (orders/customer/nation, once each) —
    # a separate count aggregation would re-scan the join subtree
    import re

    from redshift_avro_spark.plans import explain_str

    df = REGISTRY["q99_pivot_revenue"].fn(spark, SF_SMOKE)
    plan = explain_str(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 3


def test_hypertable_rollup_reuses_exchanges(spark):
    # executed plan: ONE raw scan; hour reuses the minute exchange and
    # day reuses hour's (AQE ReusedExchange)
    df = REGISTRY["q101_hypertable_rollup"].fn(spark, SF_SMOKE)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split("Initial Plan")[0]
    assert final.count("Scan parquet") == 1
    assert final.count("Reused") >= 2


def test_full_outer_is_shuffle_join(spark):
    # neither side of a full outer can broadcast; the dim lookup can
    from redshift_avro_spark.plans import explain_str

    df = REGISTRY["q108_full_outer_balance"].fn(spark, SF_SMOKE)
    plan = explain_str(df)
    assert "FullOuter" in plan
    assert "BroadcastHashJoin FullOuter" not in plan


def test_q130_deep_star_broadcasts_all_dims(spark):
    """The Q8-shape plan must broadcast every dimension edge (nation
    twice, region, supplier, part, customer) and push the r_name /
    p_type filters into their scans."""
    df = REGISTRY["q130_market_share"].fn(spark, SF_SMOKE)
    assert broadcast_join_count(df) >= 5
    pf = " ".join(pushed_filters(df))
    assert "r_name" in pf and "p_type" in pf


def test_q119_triangles_no_cartesian(spark):
    """Wedge generation and closure must be equi-joins — a cartesian
    product in this plan means the orientation trick regressed."""
    df = REGISTRY["q119_triangle_count"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q135_row_constraints_share_one_aggregation(spark):
    """All three row constraints must ride one aggregation pass: the
    validation report's plan may contain at most one scan of lineitem
    per constraint KIND (row/unique/fk), not per constraint."""
    df = REGISTRY["q135_data_quality"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") <= 3, (
        "expected <=3 lineitem scans (row-agg, unique, fk), got plan:\n" + plan[:2000]
    )


def test_q145_bucketed_join_no_shuffle(spark):
    """The whole point of the bucketed write: the orders⋈lineitem
    SortMergeJoin must sit directly on bucketed scans with NO Exchange
    in its subtree (the only exchanges allowed are the post-join
    aggregation/sort ones)."""
    df = REGISTRY["q145_bucketed_colocated_join"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    smj = plan.index("SortMergeJoin")
    # the join subtree is everything after the SMJ node in toString's
    # indentation order; no Exchange may appear below it
    assert "Exchange" not in plan[smj:], (
        "shuffle under the bucketed join:\n" + plan[smj:smj + 2000]
    )
    assert plan.count("Exchange") <= 2  # agg + orderBy only, above the join


def test_duplicated_spans_no_window_over_grams(spark):
    """q146's island merge must window only per-document rows; the
    gram fan-out side stays a broadcast-joined map stage and the plan
    keeps the exchange count bounded (distinct, gram count, doc
    window, span/doc aggs — no extra corpus-wide sort)."""
    df = REGISTRY["q146_duplicated_spans"].fn(spark, SF_SMOKE)
    assert shuffle_count(df) <= 6
    assert broadcast_join_count(df) >= 1


def test_pq_adc_no_corpus_vector_shuffle(spark):
    """q147: codebook and LUT broadcast; the only exchanges are the
    min(struct) code assignment and the integer-sum aggregation —
    the corpus embedding column itself must never shuffle."""
    from redshift_avro_spark.plans import explain_str

    df = REGISTRY["q147_pq_adc_topk"].fn(spark, SF_SMOKE)
    assert broadcast_join_count(df) >= 2
    plan = explain_str(df)
    import re
    # no Exchange stanza may carry the raw embedding array
    for m in re.finditer(r"Exchange [^\n]*", plan):
        assert "embedding" not in m.group(0), m.group(0)


def test_domain_relevance_uses_takeordered(spark):
    """q150's top-n must compile to TakeOrderedAndProject (no global
    sort of the scored corpus) with the weight table broadcast."""
    from redshift_avro_spark.plans import uses_top_k

    df = REGISTRY["q150_domain_relevance"].fn(spark, SF_SMOKE)
    assert uses_top_k(df)
    assert broadcast_join_count(df) >= 3


def test_length_buckets_bounded_final_exchange(spark):
    """q149: two map-side-combining aggs; the bucket key domain is the
    CASE ladder (≤ 17 values), so the plan has no joins at all."""
    df = REGISTRY["q149_length_buckets"].fn(spark, SF_SMOKE)
    assert shuffle_count(df) <= 3
    assert broadcast_join_count(df) == 0


def test_ivf_probe_join_is_broadcast(spark):
    # VERDICT r6 #4: the IVF query tail joins the corpus assignment to
    # the exploded probe list — k·n_probe rows that must ride a
    # broadcast at any corpus size, never an AQE gamble.
    from redshift_avro_spark.plans import explain_str

    df = REGISTRY["q45_ivf_topk"].fn(spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan, "probe join must broadcast the probe side"
    assert "SortMergeJoin" not in plan, "no corpus-side sort-merge in the IVF tail"


def test_semantic_dedup_guard_joins_are_broadcast(spark, monkeypatch):
    # the hot-cell guard's two histograms (k cell sizes, ≤ k·2^p
    # refined sizes) join the corpus via explicit broadcast hints;
    # inspect the refined stage directly — in the full query the
    # guard runs behind materialize()'s lineage cut, so the final
    # plan can't show it
    from redshift_avro_spark.operators.similarity import _semantic_cells
    from redshift_avro_spark.plans import explain_str

    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "none")
    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet")
    refined = _semantic_cells(emb, "vec_id", "embedding", 2, 1, 64, 4096, 4)[1]
    plan = explain_str(refined, "simple")
    assert plan.count("BroadcastHashJoin") >= 2, (
        "cell-size and refined-size joins must broadcast"
    )
    assert "SortMergeJoin" not in plan


def test_url_dedup_host_rollup_broadcasts(spark, monkeypatch):
    # q183 (round 8): the host rollup (hosts-sized) must ride the
    # explicit broadcast back onto the per-doc frame, and the dedup
    # runs on the canonical-URL key — inspect with the staging cut
    # disabled so the whole shape is in one plan
    from redshift_avro_spark.plans import explain_str, shuffle_count

    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "none")
    df = REGISTRY["q183_url_dedup"].fn(spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan, "host rollup must broadcast"
    # canonical-URL groups + host rollup + canonical join + order:
    # bounded, no corpus-squared term anywhere
    assert shuffle_count(df) <= 7
    assert "CartesianProduct" not in plan


def test_embedding_decontam_probes_broadcast_no_corpus_shuffle(spark):
    # q184 (round 8): the probe set must broadcast (map-only scan of
    # the corpus); the only exchanges are the per-vector aggregation
    # and the output sort — the corpus never shuffles for scoring
    from redshift_avro_spark.plans import explain_str, shuffle_count

    df = REGISTRY["q184_embedding_decontam"].fn(spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" in plan, "probe side must broadcast"
    # the scoring path itself never sort-merges; the single allowed
    # SMJ is the narrow id-only left join that keeps partnerless
    # vectors (8-byte keys, dominated by the scoring scan)
    assert plan.count("SortMergeJoin") <= 1
    assert shuffle_count(df) <= 3
    assert "CartesianProduct" not in plan


def test_ivf_decontam_probe_cells_broadcast(spark):
    # q185 (round 8): the probe-cells frame (|probes|·n_probe rows)
    # must ride a broadcast onto the corpus assignment — the corpus
    # never shuffles for the pruned scoring
    from redshift_avro_spark.plans import explain_str, shuffle_count

    df = REGISTRY["q185_ivf_decontam"].fn(spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan, "probe-cells join must broadcast"
    assert plan.count("SortMergeJoin") <= 1  # the id-only keep-all left join
    assert shuffle_count(df) <= 3
    assert "CartesianProduct" not in plan


def test_full_funnel_adds_no_corpus_shuffles(spark, monkeypatch):
    # q187 (round 9): the funnel composes member fragments — its ONLY
    # additions over the members' own plans are doc_id-keyed semi/anti
    # joins and single-row aggs. With the staging cut disabled the
    # whole DAG sits in one plan: pin that it stays free of cartesian
    # products, that the benchmark-gram and drop-list joins ride
    # broadcasts, and that the total exchange count stays at the sum
    # of the member chains (the uncut minhash+jaccard+window lineage
    # measured 87 at round 9 — a new corpus-squared or re-shuffle
    # regression would blow well past this).
    from redshift_avro_spark.plans import explain_str, shuffle_count
    from redshift_avro_spark.queries.curation import _funnel_frames

    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "none")
    fr = _funnel_frames(spark, SF_SMOKE)
    final = fr["decontam"]
    plan = explain_str(final, "simple")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 5, (
        "bench grams, jaccard gram sides and drop lists must broadcast"
    )
    # Exchange-count bounds derived LINK BY LINK from the funnel's own
    # frames (ADVICE r9: the former absolute 90/12 constants pinned one
    # Spark version's plan; a benign member edit or AQE change could
    # shift them without any real regression). Each stage gate adds
    # only stage-key joins / windows / single-row aggs over the
    # previous frame — a handful of NEW exchanges, never a multiple of
    # the chain so far. A corpus-squared or re-shuffle regression in
    # any one stage still blows its own link bound.
    order = [
        "docs", "url_dedup", "line_clean", "language", "quality",
        "exact_dedup", "near_dup", "decontam",
    ]
    sc = {k: shuffle_count(fr[k]) for k in order}
    assert sc["docs"] <= 2, f"raw corpus frame should not shuffle: {sc}"
    for prev, cur in zip(order, order[1:]):
        # near_dup carries the whole minhash band + jaccard-verify
        # lineage (several windows and gram joins); decontam references
        # the near_dup frame TWICE (corpus-gram side and the surviving
        # side of the anti-join), so with staging disabled its uncut
        # plan re-expands that lineage once more; every other gate is a
        # keeper-window or key-join sliver
        if cur == "near_dup":
            bound = sc[prev] + 40
        elif cur == "decontam":
            bound = 2 * sc[prev] + 12
        else:
            bound = sc[prev] + 12
        assert sc[cur] <= bound, (
            f"stage {cur} at {sc[cur]} exchanges > bound {bound} "
            f"(prev {prev}={sc[prev]}): {sc}"
        )
