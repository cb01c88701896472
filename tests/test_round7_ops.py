"""Round-7 fixes: staging-path uniqueness per invocation, null-text
handling in the linear cross-encoder (both from ADVICE r6), and the
round's operator hardening."""

from __future__ import annotations

import pytest



class TestStagingPathPerInvocation:
    """ADVICE r6 #1: composites reuse one label ('lsh_candidates')
    across members; parquet mode must not let a later member's write
    clobber part files an earlier member's lazy read already listed."""

    def test_parquet_label_reuse_keeps_both_frames(self, spark, monkeypatch):
        from redshift_avro_spark.operators.staging import materialize

        monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "parquet")
        a = materialize(spark.range(0, 5), label="shared_label")
        b = materialize(spark.range(100, 102), label="shared_label")
        # action AFTER both writes — the composite evaluation order
        assert sorted(r[0] for r in a.collect()) == [0, 1, 2, 3, 4]
        assert sorted(r[0] for r in b.collect()) == [100, 101]
        assert a.unionAll(b).count() == 7

    def test_parquet_paths_are_invocation_unique(self, spark, monkeypatch):
        from redshift_avro_spark.operators.staging import materialize

        monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "parquet")
        a = materialize(spark.range(3), label="uniq")
        b = materialize(spark.range(3), label="uniq")
        pa = a.inputFiles()[0].rsplit("/", 1)[0]
        pb = b.inputFiles()[0].rsplit("/", 1)[0]
        assert pa != pb


class TestLinearCeNullText:
    """ADVICE r6 #3: NULL text must drop the doc (the oracle's
    unnest(NULL) treatment), not crash the executor iterating None."""

    def test_null_text_doc_dropped_like_oracle(self, spark):
        from redshift_avro_spark.operators.inference import rerank_with_model

        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, None), (3, "beta gamma beta")],
            "doc_id long, text string",
        )
        cands = spark.createDataFrame(
            [(1, 1), (2, 2), (3, 3)], "doc_id long, rank long"
        )
        qt = spark.createDataFrame([("beta", 2), ("alpha", 1)], "term string, df long")
        out = rerank_with_model(cands, docs, query_terms=qt).collect()
        assert sorted(r.doc_id for r in out) == [1, 3]
        assert sorted(r.ce_rank for r in out) == [1, 2]

    def test_fake_model_still_handles_null(self, spark):
        from redshift_avro_spark.operators.inference import rerank_with_model

        docs = spark.createDataFrame(
            [(1, "x"), (2, None)], "doc_id long, text string"
        )
        cands = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
        out = rerank_with_model(cands, docs, model="fake").collect()
        assert sorted(r.doc_id for r in out) == [1, 2]
