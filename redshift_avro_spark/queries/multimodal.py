"""Multimodal-column queries: binary payloads + typed metadata.

q40 exercises the JVM-side metadata path (filters/pruning never touch
payload bytes); q41/q71/q72 exercise the Arrow-batched ``mapInPandas``
plumbing — feature extraction, per-frame fan-out, resize — with the
deterministic fake decoders (media libs absent by design — SURVEY
§7.4), whose byte arithmetic the DuckDB oracles replicate exactly, so
every multimodal query has a full value-hash row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.staging import materialize
from . import load_table, register
from ..operators.multimodal import attach_payload_metadata, extract_payload_features


@register(
    "q40_payload_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           substring(hex(encode(text)), 1, 8) AS magic_hex,
           md5(text) AS digest
    FROM documents ORDER BY doc_id
    """,
)
def q40_payload_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column (UTF-8 document bytes standing in for
    image/audio blobs) + sibling metadata struct computed JVM-side:
    size, magic prefix, content digest."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    with_meta = attach_payload_metadata(docs, "payload")
    return with_meta.select(
        "doc_id",
        F.col("payload_meta.n_bytes").alias("n_bytes"),
        F.col("payload_meta.magic_hex").alias("magic_hex"),
        F.col("payload_meta.digest").alias("digest"),
    ).orderBy("doc_id")


@register(
    "q41_payload_features",
    # BYTE semantics, not characters: the payload is binary, so the
    # oracle reads bytes via hex(encode(text)) — byte i is hex chars
    # [2i-1, 2i] — keeping value-hash parity even for multi-byte UTF-8
    # (ascii()/length() would count characters and diverge)
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    )
    SELECT doc_id,
           CAST(n AS INTEGER) AS n_bytes,
           CAST(1 + (CASE WHEN n >= 1 THEN CAST(concat('0x', substring(hx, 1, 2)) AS INTEGER) ELSE 0 END) % 64 AS INTEGER) AS width,
           CAST(1 + (CASE WHEN n >= 2 THEN CAST(concat('0x', substring(hx, 3, 2)) AS INTEGER) ELSE 0 END) % 64 AS INTEGER) AS height,
           CAST(1 + (CASE WHEN n >= 3 THEN CAST(concat('0x', substring(hx, 5, 2)) AS INTEGER) ELSE 0 END) % 4 AS INTEGER) AS channels,
           CASE WHEN n = 0 THEN 0.0
                ELSE list_aggregate(list_transform(generate_series(1, n),
                       i -> CAST(concat('0x', substring(hx, (i-1)*2+1, 2)) AS BIGINT)), 'sum')
                     / CAST(n AS DOUBLE)
           END AS mean_pixel
    FROM b ORDER BY doc_id
    """,
)
def q41_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the real 100 TB decode pattern (batch in, batch
    out, narrow map stage); inner decode is the deterministic fake,
    whose byte arithmetic the DuckDB oracle replicates with ascii()
    over the same (ASCII) document text — upgrading q41 from the
    rows-only check to a full value-hash row. The integer byte sum is
    exact in both engines, so the single float division is bit-stable."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return extract_payload_features(docs, "doc_id", "payload", fake=True).orderBy("doc_id")


@register(
    "q71_payload_frames",
    # byte semantics via hex(encode(text)): 64-byte frame k = hex chars
    # [k*128+1, k*128+128] (see q41's oracle note)
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_index,
           substring(hx, i * 128 + 1, 128) AS frame_hex
    FROM b,
         unnest(generate_series(0, least(8, greatest(1, n // 64)) - 1)) AS t(i)
    ORDER BY doc_id, frame_index
    """,
)
def q71_payload_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling from video-like binary payloads: ONE OUTPUT ROW
    per sampled frame (the U4 one-cell→N-records fan-out inside
    mapInPandas, applied to media). The fake 'codec' slices the payload
    at fixed 64-byte strides, so the DuckDB oracle replicates every
    frame byte with substring arithmetic over the same (ASCII)
    document text — a full value-hash row for the fan-out path, like
    q41 gave the feature path. Frames hex-encode in both engines so
    the compared column is a plain string."""
    from ..operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return (
        sample_frames(docs, "doc_id", "payload", every_n_bytes=64, max_frames=8)
        .select("doc_id", "frame_index", F.hex("frame").alias("frame_hex"))
        .orderBy("doc_id", "frame_index")
    )


@register(
    "q72_payload_resize",
    # byte semantics via hex(encode(text)) (see q41's oracle note)
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN (50176 % greatest(n, 1)) = 0
                THEN substring(hx, 1, 2)
                ELSE substring(hx, 1, 2 * (50176 % greatest(n, 1))) END AS resized_hex,
           CAST(224 AS INTEGER) AS out_width,
           CAST(224 AS INTEGER) AS out_height
    FROM b ORDER BY doc_id
    """,
)
def q72_payload_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing over binary payloads (batch in, binary
    batch out, narrow mapInPandas stage). The fake resample emits a
    deterministic payload slice sized by (224*224) mod len, which the
    oracle replicates byte-for-byte — upgrading the resize path from
    tests-only to a gated full-hash query."""
    from ..operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return (
        resize_images(docs, "doc_id", "payload", width=224, height=224)
        .select("doc_id", F.hex("resized").alias("resized_hex"), "out_width", "out_height")
        .orderBy("doc_id")
    )


@register(
    "q112_audio_segments",
    # BYTE semantics like q41: byte i of the payload is hex chars
    # [2i-1, 2i] of hex(encode(text)), so parity holds for any UTF-8
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      FROM documents
    ),
    fr AS (
      SELECT doc_id, f AS fi, least(32, n - f * 32) AS flen,
             list_aggregate(list_transform(generate_series(f*32 + 1, least((f+1)*32, n)),
               i -> CAST(concat('0x', substring(hx, (i-1)*2 + 1, 2)) AS BIGINT)), 'sum') AS energy
      FROM b, unnest(generate_series(0, CAST((n + 31) // 32 AS BIGINT) - 1)) AS t(f)
      WHERE n > 0
    ),
    act AS (SELECT * FROM fr WHERE energy >= 96 * flen),
    seg AS (
      SELECT doc_id, fi, energy,
             fi - row_number() OVER (PARTITION BY doc_id ORDER BY fi) AS grp
      FROM act
    ),
    runs AS (
      SELECT doc_id, CAST(min(fi) AS INTEGER) AS start_frame,
             CAST(max(fi) AS INTEGER) AS end_frame,
             CAST(count(*) AS INTEGER) AS n_frames,
             CAST(sum(energy) AS BIGINT) AS energy
      FROM seg GROUP BY doc_id, grp
    )
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_frame) AS INTEGER) AS seg_index,
           start_frame, end_frame, n_frames, energy
    FROM runs
    ORDER BY doc_id, seg_index
    """,
)
def q112_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAD-style audio segmentation: frame the payload byte stream
    (32 uint8 samples/frame), keep frames with mean amplitude ≥ 96
    (exact integer compare), merge consecutive active frames into
    segments with start/end/energy — the silence-trimming prep an
    audio pipeline runs before feature extraction, via one narrow
    ``mapInPandas`` stage (numpy reshape + vectorized row sums;
    per-doc gaps-and-islands needs no shuffle — segments cannot cross
    documents). The oracle rebuilds the identical framing from hex
    byte pairs and merges runs with the SQL gaps-and-islands idiom."""
    from ..operators.multimodal import segment_audio

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    return segment_audio(docs, "doc_id", "payload").orderBy("doc_id", "seg_index")


# ---- q134: perceptual-hash clusters + bit-flip hamming-1 index ----

_PH_H4 = ((1, 1, 1, 1), (1, -1, 1, -1), (1, 1, -1, -1), (1, -1, -1, 1))


def _ph_byte(k: int) -> str:
    """0-based strided byte (k+1)·n//17 of the payload, via hex chars
    (byte semantics — see q41's oracle note); 0 for empty payloads."""
    idx = f"(({k + 1} * n) // 17)"
    return (
        f"(CASE WHEN n >= 1 THEN CAST(concat('0x', substring(hx, 2 * {idx} + 1, 2)) "
        f"AS BIGINT) ELSE 0 END)"
    )


def _ph_sig_sql() -> str:
    bits = []
    for i in range(4):
        for j in range(4):
            if i == 0 and j == 0:
                continue
            terms = []
            for x in range(4):
                for y in range(4):
                    s = _PH_H4[i][x] * _PH_H4[j][y]
                    terms.append(("+ " if s > 0 else "- ") + _ph_byte(4 * x + y))
            bits.append(
                f"(CASE WHEN ({' '.join(terms)}) > 0 THEN {1 << (4 * i + j - 1)} ELSE 0 END)"
            )
    return " + ".join(bits)


_PH_FLIPS = ", ".join(str(1 << k) for k in range(15))


@register(
    "q134_phash_clusters",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      FROM documents
    ),
    sig AS (SELECT doc_id, ({_ph_sig_sql()}) AS sig FROM b),
    clusters AS (
      SELECT sig, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(MIN(doc_id) AS BIGINT) AS keeper_doc,
             CAST(MAX(doc_id) AS BIGINT) AS max_doc
      FROM sig GROUP BY sig HAVING count(*) >= 2
    ),
    flips AS (
      SELECT c.sig, xor(c.sig, f.v) AS variant
      FROM clusters c, (SELECT unnest([{_PH_FLIPS}]) AS v) f
    ),
    h1 AS (
      SELECT fl.sig, CAST(count(*) AS BIGINT) AS n_h1
      FROM flips fl JOIN clusters o ON fl.variant = o.sig
      GROUP BY fl.sig
    )
    SELECT c.sig, c.n_docs, c.keeper_doc, c.max_doc,
           CAST(COALESCE(h1.n_h1, 0) AS BIGINT) AS n_h1
    FROM clusters c LEFT JOIN h1 USING (sig)
    ORDER BY sig
    """,
)
def q134_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup for binary media payloads
    (:func:`..operators.multimodal.perceptual_hash_signatures`): a
    15-bit Walsh-Hadamard sign signature per payload (integer pHash —
    strided 4×4 byte block, exact ±sums instead of libm DCT), exact
    clusters by GROUP BY sig (keeper = min doc), and each cluster's
    hamming-1 neighbor count found by the BIT-FLIP INDEX — every
    cluster emits its 15 one-bit variants and joins them against the
    cluster set — so near-neighbor discovery is linear in clusters,
    never a pairwise signature comparison.

    Scale shape: signatures are one narrow mapInPandas stage;
    clustering is one group-by on the compact integer key; the flip
    join fans out ×15 on broadcast-size cluster state. The oracle
    rebuilds the identical 256-term signature arithmetic in SQL."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    from ..operators.multimodal import perceptual_hash_signatures

    sig = perceptual_hash_signatures(docs, "doc_id", "payload")
    clusters = materialize(
        sig.groupBy("sig")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("keeper_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
        .where(F.col("n_docs") >= 2),
        label="phash_clusters",
        default="checkpoint",
    )  # consumed by both sides of the flip join
    flips = clusters.select(
        "sig", F.explode(F.expr(f"array({_PH_FLIPS})")).alias("v")
    ).select("sig", F.expr("sig ^ v").alias("variant"))
    h1 = (
        flips.join(clusters.select(F.col("sig").alias("variant")), "variant")
        .groupBy("sig")
        .agg(F.count("*").cast("long").alias("n_h1"))
    )
    return (
        clusters.join(h1, "sig", "left")
        .select(
            "sig",
            "n_docs",
            "keeper_doc",
            "max_doc",
            F.coalesce("n_h1", F.lit(0)).cast("long").alias("n_h1"),
        )
        .orderBy("sig")
    )
