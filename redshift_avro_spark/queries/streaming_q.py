"""Declared streaming queries — all with full value-hash oracles.

Each runs a complete Structured Streaming pipeline — land Avro-encoded
payload rows, file-stream them, decode, watermarked stateful operator,
availableNow trigger into a memory sink — and returns the sink as a
batch DataFrame whose contents must hash-equal a batch SQL answer:
q50 flushes every window via a far-future sentinel, q51 exploits the
monotonicity of running counts, q52 doubles the corpus and requires
dedup to exactly undo it, q69 joins the stream against a static
broadcast benchmark-gram table (stream-static join) and exploits
count monotonicity like q51, and q151 maintains an LSH signature
index incrementally via foreachBatch parquet appends whose final
verdict is batching-independent by construction. Cross-batch state convergence is
additionally covered by tests/test_streaming.py.
"""

from __future__ import annotations

import atexit
import glob
import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import load_table, register
from ..sources.columns import to_avro
from ..streaming import (
    decode_avro_stream,
    dedup_within_watermark,
    read_binary_file_stream,
    windowed_agg,
)

_SCHEMA = {
    "type": "record",
    "name": "Event",
    "namespace": "engine.events",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "user_id", "type": "long"},
        {"name": "event_type", "type": "string"},
        {"name": "value", "type": "double"},
    ],
}

_PAYLOAD_STRUCT = T.StructType(
    [T.StructField("ts", T.TimestampType()), T.StructField("payload", T.BinaryType())]
)


def _land_dir(prefix: str) -> str:
    """Per-invocation landing dir, removed at interpreter exit so
    repeated runs (bench does 3×) can't accumulate temp parquet."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _await_sink(q, timeout: int = 300) -> None:
    """availableNow queries must FINISH: a silently elapsed timeout
    would return a partial memory sink as the answer and surface as a
    baffling oracle mismatch — fail loudly instead."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(f"streaming query {q.name!r} still running after {timeout}s")


@register(
    "q50_stream_windowed_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type, COUNT(*) AS n
    FROM events
    GROUP BY window_start, window_end, event_type
    ORDER BY window_start, event_type
    """,
)
def q50_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end streaming: events → Avro payloads on disk → file
    stream → decode (narrow) → 1h tumbling windows with a 1h watermark
    → append-mode memory sink.

    Full value-hash oracle via a watermark flush: a single sentinel
    event landed 3 hours past the corpus maximum pushes the final
    watermark beyond every real window's end, so append mode emits ALL
    real windows (Spark runs the state-eviction batch after the last
    data batch). The sentinel's own window stays open and unemitted —
    and is filtered defensively — so the sink must equal the batch
    hourly GROUP BY exactly. The sentinel row is DERIVED INSIDE the
    landing write (the scan and the 1-row max-ts aggregate are branches
    of one union in one job) — no driver-side collect round-trip."""
    run = uuid.uuid4().hex[:8]
    land_dir = _land_dir(f"stream_q50_{run}_")
    e = load_table(spark, sf_dir, "events")
    payloads = e.select(
        "ts",
        to_avro(F.struct("event_id", "user_id", "event_type", "value"), _SCHEMA).alias(
            "payload"
        ),
    )
    sentinel = (
        e.agg(F.max("ts").alias("ts"))
        .select(
            (F.col("ts") + F.expr("INTERVAL 3 HOURS")).alias("ts"),
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("__flush__").alias("event_type"),
            F.lit(0.0).alias("value"),
        )
        .select(
            "ts",
            to_avro(
                F.struct("event_id", "user_id", "event_type", "value"), _SCHEMA
            ).alias("payload"),
        )
    )
    payloads.unionAll(sentinel).write.mode("overwrite").parquet(land_dir)
    stream = read_binary_file_stream(spark, land_dir, _PAYLOAD_STRUCT)
    decoded = decode_avro_stream(stream, "payload", _SCHEMA)
    agg = windowed_agg(
        decoded,
        "ts",
        watermark="1 hour",
        window_duration="1 hour",
        group_cols=["event_type"],
        aggs=[F.count("*").alias("n")],
    )
    name = f"q50_sink_{run}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_sink(q)
    return (
        spark.table(name)
        .where(F.col("event_type") != "__flush__")
        .orderBy("window_start", "event_type")
    )


@register(
    "q51_stream_running_totals",
    oracle="""
    SELECT event_type AS key, COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY key
    """,
)
def q51_stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming on the declared surface: per-event-type
    running (count, sum) via applyInPandasWithState across micro-batches.

    Full value-hash oracle: running counts increase monotonically across
    update-mode emissions, so MAX(n_events) per key is the final state —
    which must equal the batch COUNT(*) per event_type no matter how the
    stream micro-batched. (Float sums stay out of the oracle: their
    accumulation order is batch-dependent; cross-batch convergence of
    the full state is asserted in
    tests/test_streaming.py::test_stateful_running_totals.)"""
    from ..streaming.stateful import running_totals

    run = uuid.uuid4().hex[:8]
    land_dir = _land_dir(f"stream_q51_{run}_")
    e = load_table(spark, sf_dir, "events")
    (
        e.select(
            "ts",
            to_avro(F.struct("event_id", "user_id", "event_type", "value"), _SCHEMA).alias(
                "payload"
            ),
        ).write.mode("overwrite").parquet(land_dir)
    )
    stream = read_binary_file_stream(spark, land_dir, _PAYLOAD_STRUCT)
    decoded = decode_avro_stream(stream, "payload", _SCHEMA)
    # NoTimeout: an availableNow replay never terminates once a
    # processing-time timer is armed (see running_totals docstring);
    # the eviction branch is unit-tested directly instead
    totals = running_totals(decoded, "event_type", "value", idle_timeout_ms=None)
    name = f"q51_sink_{run}"
    q = (
        totals.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await_sink(q)
    return (
        spark.table(name)
        .groupBy("key")
        .agg(F.max("n_events").alias("n_events"))
        .orderBy("key")
    )


@register(
    "q52_stream_dedup",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q52_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-duplicate handling on the declared surface: land every
    event TWICE, stream + decode, dropDuplicatesWithinWatermark on
    event_id, aggregate. The dedup must reduce the doubled corpus back
    to exactly the original table, so this streaming query has a full
    value-hash oracle (the batch GROUP BY over undoubled events) — the
    duplicates all arrive in one availableNow micro-batch, within the
    watermark by construction."""
    run = uuid.uuid4().hex[:8]
    land_dir = _land_dir(f"stream_q52_{run}_")
    e = load_table(spark, sf_dir, "events")
    payloads = e.select(
        "ts",
        to_avro(F.struct("event_id", "user_id", "event_type", "value"), _SCHEMA).alias(
            "payload"
        ),
    )
    payloads.unionAll(payloads).write.mode("overwrite").parquet(land_dir)
    stream = read_binary_file_stream(spark, land_dir, _PAYLOAD_STRUCT)
    decoded = decode_avro_stream(stream, "payload", _SCHEMA)
    deduped = dedup_within_watermark(decoded, ["event_id"], "ts", "1 hour")
    name = f"q52_sink_{run}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_sink(q)
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


_DOC_SCHEMA = {
    "type": "record",
    "name": "Doc",
    "namespace": "engine.docs",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": "string"},
    ],
}

_DOC_PAYLOAD_STRUCT = T.StructType([T.StructField("payload", T.BinaryType())])


@register(
    "q69_stream_decontamination",
    oracle="""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS __w FROM documents
    ), g AS (
      SELECT doc_id,
             CASE WHEN len(__w) >= 3 THEN list_distinct(list_transform(
                    generate_series(1, len(__w) - 2),
                    i -> array_to_string(list_slice(__w, i, i + 2), ' ')))
                  ELSE CAST([] AS VARCHAR[]) END AS grams
      FROM w
    ), bench AS (
      SELECT DISTINCT gram
      FROM (SELECT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0)
    ), corpus AS (
      SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 97 <> 0
    )
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_hit_grams
    FROM corpus c JOIN bench b USING (gram)
    GROUP BY c.doc_id
    ORDER BY doc_id
    """,
)
def q69_stream_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join on the declared surface: documents arrive as
    an Avro payload stream (micro-batched via maxFilesPerTrigger), the
    benchmark gram set is a STATIC broadcast table, and contamination
    hits aggregate statefully across batches — the live-ingest version
    of q65, the shape a training pipeline uses to screen an incoming
    crawl against eval benchmarks continuously.

    Full value-hash oracle via q51's monotonicity trick: per-doc hit
    counts only grow across update-mode emissions, so MAX per doc is
    the final count, which must equal the batch answer regardless of
    how the stream micro-batched. The stream-static join itself is
    stateless (no watermark needed); the only state is the per-doc
    aggregation."""
    from ..operators.scrub import word_ngrams

    run = uuid.uuid4().hex[:8]
    land_dir = _land_dir(f"stream_q69_{run}_")
    docs = load_table(spark, sf_dir, "documents")
    bench_grams = (
        docs.where(F.col("doc_id") % 97 == 0)
        .select(F.explode(word_ngrams("text", 3)).alias("gram"))
        .distinct()
    )
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    (
        corpus.select(to_avro(F.struct("doc_id", "text"), _DOC_SCHEMA).alias("payload"))
        .repartition(8)
        .write.mode("overwrite")
        .parquet(land_dir)
    )
    stream = read_binary_file_stream(
        spark, land_dir, _DOC_PAYLOAD_STRUCT, max_files_per_trigger=3
    )
    decoded = decode_avro_stream(stream, "payload", _DOC_SCHEMA)
    hits = decoded.select(
        "doc_id", F.explode(word_ngrams("text", 3)).alias("gram")
    ).join(F.broadcast(bench_grams), "gram")
    agg = hits.groupBy("doc_id").agg(F.count("*").alias("n_hit_grams"))
    name = f"q69_sink_{run}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await_sink(q)
    return (
        spark.table(name)
        .groupBy("doc_id")
        .agg(F.max("n_hit_grams").alias("n_hit_grams"))
        .orderBy("doc_id")
    )


def interval_join_pipeline(
    spark: SparkSession,
    sf_dir: str,
    watermark: str = "2 hours",
    files: int = 8,
    max_files_per_trigger: int = 3,
):
    """q76's full pipeline, factored so tests can inspect the finished
    StreamingQuery's state metrics. Returns (sink DataFrame, query).

    Landing is TIME-ORDERED: payloads are range-partitioned and sorted
    on ts, and each part file's mtime is stamped in range order, so the
    file source (which batches oldest-mtime-first) replays the corpus
    in event-time order — exactly how a Kafka/Kinesis source delivers.
    Cross-batch disorder is then zero, so a ~2-hour watermark (join
    range 1h + slack) keeps the join exact AND lets Spark evict join
    state as the watermark advances (tests/test_streaming.py::
    test_interval_join_state_eviction asserts rows actually leave the
    state store)."""
    run = uuid.uuid4().hex[:8]
    land_dir = _land_dir(f"stream_q76_{run}_")
    e = load_table(spark, sf_dir, "events")
    (
        e.select(
            "ts",
            to_avro(F.struct("event_id", "user_id", "event_type", "value"), _SCHEMA).alias(
                "payload"
            ),
        )
        .repartitionByRange(files, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(land_dir)
    )
    # part-00000 holds the earliest ts range; stamp strictly increasing
    # mtimes so FileStreamSource's oldest-first batching follows event
    # time (one written-at-once parquet dir has near-identical mtimes)
    base = time.time() - 3600
    for i, part in enumerate(sorted(glob.glob(os.path.join(land_dir, "part-*")))):
        os.utime(part, (base + i * 10, base + i * 10))
    stream = read_binary_file_stream(
        spark, land_dir, _PAYLOAD_STRUCT, max_files_per_trigger=max_files_per_trigger
    )
    decoded = decode_avro_stream(stream, "payload", _SCHEMA)
    errors = (
        decoded.where(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", watermark)
    )
    signups = (
        decoded.where(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_event_id"),
            F.col("user_id").alias("s_user_id"),
            F.col("ts").alias("signup_ts"),
        )
        .withWatermark("signup_ts", watermark)
    )
    joined = errors.join(
        signups,
        (F.col("user_id") == F.col("s_user_id"))
        & (F.col("signup_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("signup_ts") <= F.col("ts")),
        "inner",
    ).select("event_id", "signup_event_id", "user_id", "ts", "signup_ts")
    name = f"q76_sink_{run}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_sink(q)
    return spark.table(name), q


@register(
    "q76_stream_stream_join",
    oracle="""
    SELECT e.event_id, s.event_id AS signup_event_id, e.user_id,
           e.ts, s.ts AS signup_ts
    FROM events e
    JOIN events s
      ON e.event_type = 'error' AND s.event_type = 'signup'
     AND e.user_id = s.user_id
     AND s.ts >= e.ts - INTERVAL 1 HOUR AND s.ts <= e.ts
    ORDER BY e.event_id, signup_event_id
    """,
)
def q76_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: error events joined to signup
    events by the same user within the trailing hour — both sides are
    STREAMS (split off one decoded Avro payload stream), each with its
    own watermark, joined under a time-range condition. Completes the
    streaming operator taxonomy (windowed agg q50, custom state q51,
    dedup q52, stream-static q69).

    Full value-hash oracle: an inner time-interval join emits exactly
    the pairs the batch join produces as long as no qualifying row is
    event-time-late beyond the watermark. Since round 3 the landing is
    time-ordered (range-partitioned + mtime-stamped — the replay order
    a real log source guarantees), so the watermark is a PRODUCTION
    2 hours (join range + slack) and join state is genuinely evicted
    as it advances, instead of round 2's 3650-day keep-everything
    bound; see interval_join_pipeline."""
    df, _ = interval_join_pipeline(spark, sf_dir)
    return df.orderBy("event_id", "signup_event_id")


# --------------------------------------------------------------- q151
# Streaming LSH signature-index maintenance — the production shape of
# continuous near-dup curation: documents arrive as an Avro payload
# stream, each micro-batch computes its MinHash band keys and APPENDS
# them to a persisted parquet signature index (foreachBatch — the
# incremental work is exactly one batch's signatures), and the dedup
# verdict is one batch query over the final index using the IDENTICAL
# capped per-band pair generation as q31. Because the index is
# append-only and the verdict reads the whole index, the result is
# independent of how the stream micro-batched — which is what makes an
# exact value-hash oracle possible (same minhash CTE as q31, collapsed
# to per-dropped-doc rows).

from .dedup import minhash_cte as _q151_minhash_cte  # noqa: E402


@register(
    "q151_stream_lsh_index",
    oracle=f"""
    WITH {_q151_minhash_cte("documents")}
    SELECT id_b AS doc_id, MIN(id_a) AS dup_of,
           CAST(COUNT(*) AS BIGINT) AS n_partners
    FROM candidates
    GROUP BY id_b ORDER BY doc_id
    """,
)
def q151_stream_lsh_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous near-dup curation: per-micro-batch MinHash band keys
    appended to a parquet signature index via foreachBatch, then one
    batch verdict over the index — (dropped doc, earliest partner,
    partner count). Per-batch work is one batch's signatures (narrow
    map + one band-key exchange); the index grows linearly with the
    corpus and the verdict's per-band aggregation is capped exactly
    like q31's batch path (operators/dedup.py:band_pairs_from_index).
    """
    from ..operators.dedup import band_pairs_from_index, minhash_band_keys_df

    run = uuid.uuid4().hex[:8]
    land_dir = _land_dir(f"stream_q151_{run}_")
    index_dir = _land_dir(f"stream_q151_idx_{run}_")
    docs = load_table(spark, sf_dir, "documents")
    (
        docs.select(to_avro(F.struct("doc_id", "text"), _DOC_SCHEMA).alias("payload"))
        .repartition(8)
        .write.mode("overwrite")
        .parquet(land_dir)
    )
    stream = read_binary_file_stream(
        spark, land_dir, _DOC_PAYLOAD_STRUCT, max_files_per_trigger=3
    )
    decoded = decode_avro_stream(stream, "payload", _DOC_SCHEMA)

    def _append_signatures(batch_df: DataFrame, batch_id: int) -> None:
        (
            minhash_band_keys_df(batch_df, "doc_id", "text")
            .write.mode("append")
            .parquet(index_dir)
        )

    q = (
        decoded.writeStream.foreachBatch(_append_signatures)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(index_dir, "_checkpoint"))
        .start()
    )
    _await_sink(q)
    # foreachBatch is at-least-once: a batch whose parquet append
    # committed but whose streaming commit-log record did not will be
    # re-run on restart, appending duplicate (__id, band_key) rows. A
    # clean index has no duplicates, so distinct() is semantically free
    # — and it makes the verdict idempotent under replay (without it a
    # doubled row yields a self-pair and can push a band past the cap).
    banded = spark.read.parquet(index_dir).distinct()
    pairs = band_pairs_from_index(banded)
    return (
        pairs.groupBy(F.col("id_b").alias("doc_id"))
        .agg(
            F.min("id_a").alias("dup_of"),
            F.count("*").cast("bigint").alias("n_partners"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------- q201
# Streaming quality-gate monitor — the live-ingest version of the
# q49/q187 quality stage: documents arrive as an Avro payload stream
# (micro-batched), each batch is scored by the SAME registered gate
# formulas (q37 heuristic >= 0.68, q95 classifier keep), and per-lang
# keep/drop counters + token mass aggregate statefully across batches
# — the dashboard a continuous crawl-ingest pipeline watches to catch
# a drifting source before it pollutes a release. Full value-hash
# oracle via q51/q69's monotonicity trick: every counter only grows
# across update-mode emissions, so the per-lang MAX of each counter
# is the final state, which must equal the batch answer regardless of
# how the stream micro-batched; the ppm share is derived AFTER the
# MAX (it is not itself monotone).

_DOCL_SCHEMA = {
    "type": "record",
    "name": "DocL",
    "namespace": "engine.docs",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "lang", "type": "string"},
        {"name": "text", "type": "string"},
    ],
}


@register(
    "q201_stream_quality_gate",
    oracle=None,  # set below — composes the q37/q95 member oracles
)
def q201_stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang streaming quality-gate counters: docs in, heuristic
    keeps, classifier keeps, both-gate keeps, kept/total token mass,
    and the both-gate share in exact ppm — one stream-side codegen
    projection per batch, stateful per-lang aggregation (5 keys), the
    memory sink reduced by MAX per counter (monotonicity ⇒ exactly
    the batch answer)."""
    from ..operators.text import quality_classifier_score, quality_features

    run = uuid.uuid4().hex[:8]
    land_dir = _land_dir(f"stream_q201_{run}_")
    docs = load_table(spark, sf_dir, "documents")
    (
        docs.select(
            to_avro(F.struct("doc_id", "lang", "text"), _DOCL_SCHEMA).alias(
                "payload"
            )
        )
        .repartition(8)
        .write.mode("overwrite")
        .parquet(land_dir)
    )
    stream = read_binary_file_stream(
        spark, land_dir, _DOC_PAYLOAD_STRUCT, max_files_per_trigger=3
    )
    decoded = decode_avro_stream(stream, "payload", _DOCL_SCHEMA)
    verdicts = decoded.select(
        "lang",
        (quality_features("text")["quality_score"] >= 0.68).alias("kh"),
        quality_classifier_score("text")["keep"].alias("kc"),
        F.expr("CAST(size(split(trim(lower(text)), '\\\\s+')) AS BIGINT)").alias(
            "toks"
        ),
    )
    agg = verdicts.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("kh"), 1).otherwise(0)).cast("long").alias("n_keep_heur"),
        F.sum(F.when(F.col("kc"), 1).otherwise(0)).cast("long").alias("n_keep_clf"),
        F.sum(F.when(F.col("kh") & F.col("kc"), 1).otherwise(0))
        .cast("long")
        .alias("n_keep_both"),
        F.sum(F.when(F.col("kh") & F.col("kc"), F.col("toks")).otherwise(0))
        .cast("long")
        .alias("kept_tokens"),
        F.sum("toks").cast("long").alias("total_tokens"),
    )
    name = f"q201_sink_{run}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await_sink(q)
    final = spark.table(name).groupBy("lang").agg(
        *[
            F.max(c).cast("long").alias(c)
            for c in (
                "n_docs",
                "n_keep_heur",
                "n_keep_clf",
                "n_keep_both",
                "kept_tokens",
                "total_tokens",
            )
        ]
    )
    return final.select(
        "lang",
        "n_docs",
        "n_keep_heur",
        "n_keep_clf",
        "n_keep_both",
        "kept_tokens",
        "total_tokens",
        F.expr("n_keep_both * 1000000 div n_docs").alias("keep_both_ppm"),
    ).orderBy("lang")


def _q201_oracle() -> str:
    from . import REGISTRY
    from .text import _N_WORDS

    q37 = REGISTRY["q37_text_quality"].oracle
    q95 = REGISTRY["q95_quality_classifier"].oracle
    return f"""
    WITH h AS (SELECT doc_id, quality_score FROM ({q37})),
    cf AS (SELECT doc_id, keep FROM ({q95})),
    d AS (
      SELECT doc_id, lang, CAST({_N_WORDS} AS BIGINT) AS toks FROM documents
    ),
    v AS (
      SELECT d.lang, h.quality_score >= 0.68 AS kh, cf.keep AS kc, d.toks
      FROM d JOIN h USING (doc_id) JOIN cf USING (doc_id)
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN kh THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_heur,
           CAST(SUM(CASE WHEN kc THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_clf,
           CAST(SUM(CASE WHEN kh AND kc THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_both,
           CAST(SUM(CASE WHEN kh AND kc THEN toks ELSE 0 END) AS BIGINT) AS kept_tokens,
           CAST(SUM(toks) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN kh AND kc THEN 1 ELSE 0 END) * 1000000
             // COUNT(*) AS BIGINT) AS keep_both_ppm
    FROM v GROUP BY lang ORDER BY lang
    """


from . import REGISTRY as _REG201  # noqa: E402

_REG201["q201_stream_quality_gate"].oracle = _q201_oracle()
