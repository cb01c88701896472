"""Multimodal oracle parity on NON-ASCII payloads.

The synthetic corpus is pure ASCII, where character and byte semantics
coincide — these tests feed multi-byte UTF-8 (and empty) payloads
through the REGISTERED q40/q41/q71/q72 query fns and their DuckDB
oracles to prove the byte-level equivalence is real, not an accident
of the fixture (round-2 ADVICE: the old ascii()/length() oracles held
only for ASCII)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from test_queries_oracle import _norm_df

from redshift_avro_spark.queries import load_all

REGISTRY = load_all()

DOCS = pd.DataFrame(
    {
        "doc_id": [0, 1, 2, 3],
        "text": [
            "héllo wörld ✓ " * 12,       # multi-byte UTF-8, > 64 bytes
            "plain ascii words only " * 8,
            "日本語テキストのペイロード" * 10,  # 3-byte CJK sequences
            "",                            # empty payload edge
        ],
        "lang": ["de", "en", "ja", "en"],
        "source": ["t"] * 4,
        "n_chars": [0, 0, 0, 0],
    }
)


@pytest.fixture(scope="module")
def nonascii_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nonascii-sf")
    DOCS.to_parquet(d / "documents.parquet")
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["q40_payload_metadata", "q41_payload_features", "q71_payload_frames", "q72_payload_resize"],
)
def test_multimodal_oracle_parity_non_ascii(spark, nonascii_dir, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, nonascii_dir).toPandas()
    con = duckdb.connect(config={"memory_limit": "4GB", "threads": 4})
    try:
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{nonascii_dir}/documents.parquet'"
        )
        duck_pdf = con.sql(spec.oracle).df()
    finally:
        con.close()
    s_cols, s_rows = _norm_df(spark_pdf)
    d_cols, d_rows = _norm_df(duck_pdf)
    assert s_cols == d_cols
    assert len(s_rows) == len(d_rows) > 0
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
    assert not mismatches, mismatches


def test_segment_audio_contract(spark):
    """Segmentation semantics on crafted payloads: activity threshold
    is an exact integer compare, runs merge only when consecutive,
    the trailing partial frame uses its true length, and empty /
    all-silent payloads yield nothing."""
    from redshift_avro_spark.operators.multimodal import segment_audio

    loud, quiet = b"\xff" * 32, b"\x00" * 32
    rows = [
        (1, loud + quiet + loud),          # two 1-frame segments, gap between
        (2, loud * 3),                     # one 3-frame segment
        (3, quiet * 2),                    # silent → no rows
        (4, b""),                          # empty → no rows
        (5, loud + b"\xff" * 8),           # partial trailing frame is active
        (6, loud + b"\x60" * 8),           # trailing frame mean == 96 → active (>=)
        (7, loud + b"\x5f" * 8),           # trailing frame mean 95 → inactive
    ]
    out = {}
    res = segment_audio(
        spark.createDataFrame(rows, "doc_id long, payload binary"), "doc_id", "payload"
    ).collect()
    for r in res:
        out.setdefault(r.doc_id, []).append((r.seg_index, r.start_frame, r.end_frame, r.n_frames))
    assert out[1] == [(1, 0, 0, 1), (2, 2, 2, 1)]
    assert out[2] == [(1, 0, 2, 3)]
    assert 3 not in out and 4 not in out
    assert out[5] == [(1, 0, 1, 2)]
    assert out[6] == [(1, 0, 1, 2)]
    assert out[7] == [(1, 0, 0, 1)]
    # energy is the exact byte sum over the segment's frames
    e2 = [r.energy for r in res if r.doc_id == 2]
    assert e2 == [255 * 96]
