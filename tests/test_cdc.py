"""Unit tests for the CDC merge operator (q109's engine)."""

from __future__ import annotations

import pytest

from redshift_avro_spark.operators.cdc import merge_upsert


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [(1, "ann", 10.0), (2, "bob", 20.0), (3, "cid", 30.0), (4, "dee", 40.0)],
        "id long, name string, bal double",
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, "id long, op string, bal double, name string")


def test_merge_semantics(spark, base):
    ch = _changes(
        spark,
        [
            (2, "upsert", 99.0, None),      # partial update: name survives
            (3, "delete", None, None),       # delete existing
            (9, "upsert", 5.0, "new"),       # insert
            (8, "delete", None, None),       # delete of absent key: no-op
        ],
    )
    got = {
        r.id: (r.name, r.bal, r.action)
        for r in merge_upsert(base, ch, key="id").collect()
    }
    assert got == {
        1: ("ann", 10.0, "kept"),
        2: ("bob", 99.0, "updated"),   # name fell back to the snapshot
        4: ("dee", 40.0, "kept"),
        9: ("new", 5.0, "inserted"),
    }
    assert 3 not in got and 8 not in got


def test_update_of_missing_key_inserts(spark, base):
    # UPSERT semantics: WHEN NOT MATCHED → INSERT even for "updates"
    ch = _changes(spark, [(7, "upsert", 1.0, None)])
    rows = {r.id: r for r in merge_upsert(base, ch, key="id").collect()}
    assert rows[7].action == "inserted" and rows[7].name is None


def test_change_columns_may_be_a_subset(spark, base):
    ch = spark.createDataFrame([(1, "upsert", 77.0)], "id long, op string, bal double")
    rows = {r.id: r for r in merge_upsert(base, ch, key="id").collect()}
    assert rows[1].bal == 77.0 and rows[1].name == "ann" and rows[1].action == "updated"


def test_validation(spark, base):
    ch = _changes(spark, [(1, "upsert", 1.0, None)])
    with pytest.raises(ValueError, match="key"):
        merge_upsert(base, ch, key="nope")
    with pytest.raises(ValueError, match="op column"):
        merge_upsert(base, ch, key="id", op_col="missing")
    with pytest.raises(ValueError, match="not in base"):
        merge_upsert(base.drop("name"), ch, key="id")
    with pytest.raises(ValueError, match="'action'"):
        merge_upsert(base.withColumnRenamed("name", "action"), ch.drop("name"), key="id")


def test_scd2_intervals(spark):
    from datetime import datetime

    from redshift_avro_spark.operators.cdc import scd2_history

    snap = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, bal double")
    ch = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 5), 100, 11.0),
            (1, datetime(2024, 1, 5), 101, 12.0),  # same-ts: tiebreak orders it
            (1, datetime(2024, 2, 1), 102, 13.0),
        ],
        "id long, ts timestamp, seq long, bal double",
    )
    rows = scd2_history(
        snap, ch, key="id", ts_col="ts", tiebreak_col="seq", snapshot_ts="2023-01-01 00:00:00"
    ).collect()
    h1 = sorted((r.version_seq, r.bal, r.valid_to is None) for r in rows if r.id == 1)
    assert h1 == [(1, 10.0, False), (2, 11.0, False), (3, 12.0, False), (4, 13.0, True)]
    # intervals chain: valid_to of version k == valid_from of k+1
    by_seq = {r.version_seq: r for r in rows if r.id == 1}
    for k in (1, 2, 3):
        assert by_seq[k].valid_to == by_seq[k + 1].valid_from
    h2 = [(r.version_seq, r.bal, r.is_current) for r in rows if r.id == 2]
    assert h2 == [(1, 20.0, True)]  # no changes → single open snapshot row


def test_scd2_validation(spark):
    from redshift_avro_spark.operators.cdc import scd2_history

    snap = spark.createDataFrame([(1, 10.0)], "id long, bal double")
    ch = spark.createDataFrame([(1, 5.0)], "id long, bal double")
    with pytest.raises(ValueError, match="changes lacks"):
        scd2_history(snap, ch, key="id", ts_col="ts", tiebreak_col="seq", snapshot_ts="2023-01-01")
