"""Snapshot-table layer: commits, time travel, stats pruning, errors."""

from __future__ import annotations

import json
import os

import pytest

from redshift_avro_spark.sources.snapshots import SnapshotError, SnapshotTable


def _df(spark, lo, hi, parts=1):
    d = spark.range(lo, hi).selectExpr("id AS k", "id * 10 AS v")
    return d.repartitionByRange(parts, "k") if parts > 1 else d.coalesce(1)


def test_commit_versions_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    v0 = t.commit(_df(spark, 0, 100), mode="overwrite", stats_cols=("k",))
    v1 = t.commit(_df(spark, 100, 150), mode="append", stats_cols=("k",))
    v2 = t.commit(_df(spark, 500, 510), mode="overwrite", stats_cols=("k",))
    assert (v0, v1, v2) == (0, 1, 2)

    assert t.read(spark, version=0).count() == 100
    assert t.read(spark, version=1).count() == 150  # append sees both
    assert t.read(spark, version=2).count() == 10   # overwrite replaced
    assert t.read(spark).count() == 10              # latest by default
    # append version contains the overwrite version's content exactly
    got = sorted(r.k for r in t.read(spark, version=1).collect())
    assert got == list(range(150))

    hist = t.history()
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert [h["n_rows"] for h in hist] == [100, 150, 10]
    assert hist[1]["action"] == "append"


def test_stats_pruning_skips_files(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    # 8 range-partitioned files over k=0..799 -> disjoint zone maps
    t.commit(_df(spark, 0, 800, parts=8), mode="overwrite", stats_cols=("k",))
    all_files = t.file_entries()
    assert len(all_files) == 8
    pruned = t.file_entries(prune=("k", 100, 199))
    assert 1 <= len(pruned) <= 2  # interval touches at most 2 range files
    # pruned read == full read + filter
    got = sorted(r.k for r in t.read(spark, prune=("k", 100, 199)).where("k BETWEEN 100 AND 199").collect())
    assert got == list(range(100, 200))
    # a file without stats for the column is conservatively kept
    nofstats = t.file_entries(prune=("missing_col", 0, 1))
    assert len(nofstats) == 8


def test_empty_prune_returns_empty_with_schema(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 10), mode="overwrite", stats_cols=("k",))
    out = t.read(spark, prune=("k", 10_000, 20_000))
    assert out.count() == 0
    assert out.columns == ["k", "v"]


def test_empty_overwrite_version_reads_back_empty(spark, tmp_path):
    """ADVICE r3: a truncating overwrite (empty DataFrame) must commit a
    readable version — the manifest carries the schema, so read() yields
    an empty frame with the right columns and compact() still works."""
    from redshift_avro_spark.sources.snapshots import SnapshotTableMaintenance

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 10), mode="overwrite", stats_cols=("k",))
    empty = _df(spark, 0, 10).where("k < 0")
    v1 = t.commit(empty, mode="overwrite", stats_cols=("k",))
    out = t.read(spark, version=v1)
    assert out.count() == 0
    assert out.columns == ["k", "v"]
    assert [f.dataType.simpleString() for f in out.schema.fields] == ["bigint", "bigint"]
    # history and maintenance on the empty version stay functional
    assert t.history()[-1]["n_rows"] == 0
    v2 = SnapshotTableMaintenance(t).compact(spark, stats_cols=("k",))
    assert t.read(spark, version=v2).count() == 0
    # time travel to the pre-truncate version still sees the data
    assert t.read(spark, version=0).count() == 10


def test_errors(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    with pytest.raises(SnapshotError, match="no committed version"):
        t.latest_version()
    with pytest.raises(SnapshotError, match="mode"):
        t.commit(_df(spark, 0, 1), mode="upsert")
    with pytest.raises(SnapshotError, match="stats_cols"):
        t.commit(_df(spark, 0, 1), stats_cols=("nope",))
    t.commit(_df(spark, 0, 5), mode="overwrite")
    with pytest.raises(SnapshotError, match="version 9 does not exist"):
        t.read(spark, version=9)
    # truncated manifest -> loud error
    path = t._manifest_path(0)
    with open(path, "w") as f:
        json.dump({"version": 0}, f)
    with pytest.raises(SnapshotError, match="missing key"):
        t.read(spark, version=0)


def test_crashed_writer_leaves_no_visible_version(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 5), mode="overwrite")
    # simulate a crash between data write and manifest publish: a stray
    # tmp manifest + data dir must not surface as a version
    stray = t._manifest_path(1) + ".tmp-dead"
    with open(stray, "w") as f:
        f.write("{}")
    os.makedirs(os.path.join(t.root, "data", "v00001-dead"), exist_ok=True)
    assert t.versions() == [0]
    assert t.read(spark).count() == 5


def test_compact_rewrites_small_files(spark, tmp_path):
    from redshift_avro_spark.sources.snapshots import SnapshotTableMaintenance

    t = SnapshotTable(str(tmp_path / "tbl"))
    # 16 tiny files
    t.commit(_df(spark, 0, 1600, parts=16), mode="overwrite", stats_cols=("k",))
    assert len(t.file_entries()) == 16
    m = SnapshotTableMaintenance(t)
    v = m.compact(spark, target_bytes=10**9, stats_cols=("k",), sort_col="k")
    assert v == 1
    ents = t.file_entries()
    assert len(ents) == 1  # everything fits one target-size file
    got = sorted(r.k for r in t.read(spark).collect())
    assert got == list(range(1600))
    # zone map present on the compacted file
    assert ents[0]["stats"]["k"] == [0, 1599]


def test_compact_sorted_zone_maps_disjoint(spark, tmp_path):
    from redshift_avro_spark.sources.snapshots import SnapshotTableMaintenance

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 4000, parts=1), mode="overwrite")
    m = SnapshotTableMaintenance(t)
    # force ~4 files by picking a small target
    size = _entries_bytes_of(t)
    m.compact(spark, target_bytes=max(1, size // 4), stats_cols=("k",), sort_col="k")
    ents = sorted(t.file_entries(), key=lambda fe: fe["stats"]["k"][0])
    assert len(ents) >= 3
    for a, b in zip(ents, ents[1:]):
        assert a["stats"]["k"][1] < b["stats"]["k"][0]  # disjoint ranges


def _entries_bytes_of(t):
    import os as _os

    return sum(_os.path.getsize(fe["path"]) for fe in t.file_entries())


def test_vacuum_drops_old_versions_and_files(spark, tmp_path):
    from redshift_avro_spark.sources.snapshots import SnapshotTableMaintenance

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 50), mode="overwrite")          # v0
    t.commit(_df(spark, 50, 80), mode="append")            # v1 (shares v0 files)
    t.commit(_df(spark, 900, 950), mode="overwrite")       # v2 (fresh files)
    m = SnapshotTableMaintenance(t)
    deleted = m.vacuum(keep_versions=1)
    assert deleted  # v0/v1-only files are gone
    import os as _os

    for p in deleted:
        assert not _os.path.exists(p)
    assert t.versions() == [2]
    assert t.read(spark).count() == 50
    with pytest.raises(SnapshotError, match="version 0 does not exist"):
        t.read(spark, version=0)


def test_vacuum_keeps_files_shared_with_live_versions(spark, tmp_path):
    from redshift_avro_spark.sources.snapshots import SnapshotTableMaintenance

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 50), mode="overwrite")   # v0 files...
    t.commit(_df(spark, 50, 80), mode="append")     # ...also referenced by v1
    m = SnapshotTableMaintenance(t)
    deleted = m.vacuum(keep_versions=1)
    assert deleted == []  # v1 references every v0 file: nothing to delete
    assert t.versions() == [1]
    assert t.read(spark).count() == 80


def test_cdc_merge_commits_versioned_history(spark, tmp_path):
    """Synthesis: CDC merge_upsert output committed per batch into the
    snapshot table — mini-Delta MERGE with full time travel."""
    from redshift_avro_spark.operators.cdc import merge_upsert
    from redshift_avro_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, bal double"
    )
    t.commit(base.coalesce(1), mode="overwrite", stats_cols=("k",))

    batches = [
        [(2, "upsert", "b2", 25.0), (4, "upsert", "d", 40.0)],   # update + insert
        [(1, "delete", None, None), (4, "upsert", "d2", 44.0)],  # delete + update
    ]
    for rows in batches:
        ch = spark.createDataFrame(rows, "k long, op string, name string, bal double")
        snap = t.read(spark)
        merged = merge_upsert(snap, ch, key="k").select("k", "name", "bal")
        t.commit(merged.coalesce(1), mode="overwrite", stats_cols=("k",))

    assert [h["n_rows"] for h in t.history()] == [3, 4, 3]
    latest = {r.k: (r.name, r.bal) for r in t.read(spark).collect()}
    assert latest == {2: ("b2", 25.0), 3: ("c", 30.0), 4: ("d2", 44.0)}
    # time travel reproduces the pre-delete state exactly
    v1 = {r.k: (r.name, r.bal) for r in t.read(spark, version=1).collect()}
    assert v1 == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_streaming_foreachbatch_commits_versions(spark, tmp_path):
    """Streaming → snapshot-table sink: each micro-batch appends one
    committed version, so the table's history IS the stream's batch
    ledger and any batch boundary is time-travelable."""
    import time

    from pyspark.sql import functions as F
    from redshift_avro_spark.sources.snapshots import SnapshotTable

    src_dir = str(tmp_path / "in")
    import os as _os

    _os.makedirs(src_dir)
    t = SnapshotTable(str(tmp_path / "tbl"))

    def sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        t.commit(
            batch_df.select(F.col("value").cast("long").alias("k")).coalesce(1),
            mode="append",
            stats_cols=("k",),
        )

    # land two files BEFORE starting, with maxFilesPerTrigger=1 so the
    # stream processes them as separate micro-batches
    spark.range(0, 10).selectExpr("CAST(id AS STRING) AS value").coalesce(1).write.text(
        src_dir + "/f1"
    )
    spark.range(10, 30).selectExpr("CAST(id AS STRING) AS value").coalesce(1).write.text(
        src_dir + "/f2"
    )
    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(src_dir + "/*/")
    )
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    assert q.awaitTermination(120), "stream did not finish in time"

    hist = t.history()
    assert [h["action"] for h in hist] == ["append"] * len(hist)
    assert len(hist) == 2
    assert hist[-1]["n_rows"] == 30
    assert sorted(r.k for r in t.read(spark).collect()) == list(range(30))
    # the first batch boundary is reproducible
    assert t.read(spark, version=0).count() in (10, 20)


def test_concurrent_commit_collision_is_loud(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 5), mode="overwrite")
    # simulate the race: the other writer publishes version 1 AFTER our
    # commit has chosen its version number (pin versions() to pre-race
    # state so our commit claims the now-taken version 1)
    with open(t._manifest_path(1), "w") as f:
        json.dump({"version": 1, "action": "overwrite", "files": []}, f)
    t.versions = lambda: [0]  # what our writer saw before the race
    with pytest.raises(SnapshotError, match="concurrent commit"):
        t.commit(_df(spark, 5, 9), mode="append")


def test_read_missing_data_file_fails_loudly(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 10), mode="overwrite")
    victim = t.file_entries()[0]["path"]
    os.remove(victim)
    with pytest.raises(Exception, match="PATH_NOT_FOUND|does not exist|Path does not"):
        t.read(spark).count()


def test_alien_manifest_name_is_rejected(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 3), mode="overwrite")
    with open(os.path.join(t.root, "manifest-abc.json"), "w") as f:
        f.write("{}")
    with pytest.raises(SnapshotError, match="alien manifest"):
        t.versions()


def test_table_diff_emits_minimal_change_feed(spark, tmp_path):
    from pyspark.sql import functions as F
    from redshift_avro_spark.sources.snapshots import table_diff

    t = SnapshotTable(str(tmp_path / "tbl"))
    v0 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, name string, v long"
    )
    t.commit(v0.coalesce(1), mode="overwrite")
    v1 = spark.createDataFrame(
        [(2, "b", 25), (3, "c", 30), (4, "d", 40)], "k long, name string, v long"
    )
    t.commit(v1.coalesce(1), mode="overwrite")

    feed = {r.k: (r.op, r.name, r.v) for r in
            table_diff(spark, t, from_version=0, to_version=1, key="k").collect()}
    assert feed == {
        1: ("delete", None, None),
        2: ("update", "b", 25),
        4: ("insert", "d", 40),
    }  # k=3 unchanged -> absent

    # the feed replayed through merge_upsert reproduces the new version
    from redshift_avro_spark.operators.cdc import merge_upsert

    feed_df = table_diff(spark, t, from_version=0, to_version=1, key="k")
    merged = merge_upsert(t.read(spark, version=0), feed_df, key="k").select(
        "k", "name", "v"
    )
    got = sorted((r.k, r.name, r.v) for r in merged.collect())
    want = sorted((r.k, r.name, r.v) for r in t.read(spark, version=1).collect())
    assert got == want


def test_incremental_aggregate_maintenance(spark, tmp_path):
    """IVM: a downstream SUM/COUNT per group is maintained from the
    diff's before/after images alone — +new −old, no table rescan."""
    from pyspark.sql import functions as F
    from redshift_avro_spark.sources.snapshots import table_diff

    t = SnapshotTable(str(tmp_path / "tbl"))
    v0 = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)],
        "k long, grp string, v long",
    )
    t.commit(v0.coalesce(1), mode="overwrite")
    v1 = spark.createDataFrame(
        [(1, "a", 15), (3, "b", 30), (4, "a", 40), (5, "c", 50)],
        "k long, grp string, v long",
    )  # update k=1, delete k=2, k=4 moves group, insert k=5
    t.commit(v1.coalesce(1), mode="overwrite")

    base_agg = (
        t.read(spark, version=0).groupBy("grp")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
    )
    feed = table_diff(spark, t, from_version=0, to_version=1, key="k", with_before=True)
    # delta contributions: -old (delete/update), +new (insert/update)
    minus = feed.where(F.col("op").isin("delete", "update")).select(
        F.col("before_grp").alias("grp"),
        (-F.col("before_v")).alias("dv"),
        F.lit(-1).alias("dn"),
    )
    plus = feed.where(F.col("op").isin("insert", "update")).select(
        "grp", F.col("v").alias("dv"), F.lit(1).alias("dn")
    )
    maintained = (
        base_agg.select("grp", F.col("s").alias("dv"), F.col("n").alias("dn"))
        .unionByName(minus)
        .unionByName(plus)
        .groupBy("grp")
        .agg(F.sum("dv").alias("s"), F.sum("dn").alias("n"))
        .where(F.col("n") > 0)
    )
    want = {
        r.grp: (r.s, r.n)
        for r in t.read(spark, version=1)
        .groupBy("grp")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    got = {r.grp: (r.s, r.n) for r in maintained.collect()}
    assert got == want == {"a": (55, 2), "b": (30, 1), "c": (50, 1)}


def test_restore_rolls_back_metadata_only(spark, tmp_path):
    """RESTORE publishes a new manifest pointing at the old version's
    files — no data moves; the rollback is itself time-travelable."""
    import glob as _glob

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 100), mode="overwrite", stats_cols=("k",))
    t.commit(_df(spark, 100, 150), mode="append", stats_cols=("k",))
    t.commit(_df(spark, 500, 510), mode="overwrite", stats_cols=("k",))
    n_data_before = len(
        _glob.glob(str(tmp_path / "tbl" / "data" / "*" / "*.parquet"))
    )
    v3 = t.restore(1)
    assert v3 == 3
    # latest now reads the v1 content; v2 stays time-travelable
    assert sorted(r.k for r in t.read(spark).collect()) == list(range(150))
    assert t.read(spark, version=2).count() == 10
    # metadata-only: no new data files were written
    n_data_after = len(
        _glob.glob(str(tmp_path / "tbl" / "data" / "*" / "*.parquet"))
    )
    assert n_data_after == n_data_before
    h = t.history()[-1]
    assert h["action"] == "restore" and h["n_rows"] == 150
    # a further append stacks on the restored state
    t.commit(_df(spark, 900, 905), mode="append", stats_cols=("k",))
    assert t.read(spark).count() == 155


def test_restore_after_vacuum_is_loud(spark, tmp_path):
    from redshift_avro_spark.sources.snapshots import (
        SnapshotError,
        SnapshotTableMaintenance,
    )

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 50), mode="overwrite")
    t.commit(_df(spark, 50, 60), mode="overwrite")
    t.commit(_df(spark, 60, 70), mode="overwrite")
    SnapshotTableMaintenance(t).vacuum(keep_versions=1)
    import pytest as _pytest

    # vacuum drops the old manifest itself, so the restore fails on the
    # unknown version; a manifest surviving with missing data files
    # (manual deletion) would hit restore's own "vacuumed" guard
    with _pytest.raises(SnapshotError, match="does not exist"):
        t.restore(0)
    # the dangling-files guard, driven directly: delete a kept
    # version's data file behind the manifest's back
    import glob as _glob
    import os as _os

    v_live = t.latest_version()
    _os.remove(t._load_manifest(v_live)["files"][0]["path"])
    with _pytest.raises(SnapshotError, match="vacuumed"):
        t.restore(v_live)


def test_streaming_cdc_with_midstream_restore(spark, tmp_path):
    """VERDICT r6 #8 — the maintenance layer and the streaming layer
    compose: a foreachBatch CDC stream commits MERGE results into the
    snapshot table, RESTORE rolls the table back between micro-batch
    runs, and the RESUMED stream (same checkpoint) applies the next
    change batch on top of the restored state — proving a restore
    neither corrupts the stream's checkpoint nor the table's history."""
    import glob as _glob
    import os as _os

    from pyspark.sql import functions as F
    from redshift_avro_spark.operators.cdc import merge_upsert

    src_dir = str(tmp_path / "in")
    _os.makedirs(src_dir)
    ckpt = str(tmp_path / "ckpt")
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, bal double").coalesce(1),
        mode="overwrite",
        stats_cols=("k",),
    )  # v0: base state

    def sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        ch = batch_df.select(
            F.split("value", ",").getItem(0).cast("long").alias("k"),
            F.split("value", ",").getItem(1).alias("op"),
            F.expr("try_cast(nullif(split(value, ',')[2], '') AS double)").alias("bal"),
        )
        merged = merge_upsert(t.read(spark), ch, key="k").select("k", "bal")
        t.commit(merged.coalesce(1), mode="overwrite", stats_cols=("k",))

    def run_stream():
        q = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", "1")
            .load(src_dir + "/*/")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish"

    def land(name, rows):
        spark.createDataFrame([(r,) for r in rows], "value string").coalesce(
            1
        ).write.text(src_dir + "/" + name)

    land("f1", ["3,upsert,30.0"])
    run_stream()  # v1 = base + k3
    land("f2", ["1,delete,", "4,upsert,40.0"])
    run_stream()  # v2 = v1 - k1 + k4
    assert sorted(r.k for r in t.read(spark).collect()) == [2, 3, 4]

    v_restore = t.restore(1)  # roll back batch 2's merge, metadata-only
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 2, 3]

    # the resumed stream (same checkpoint) skips f1/f2 and applies only
    # the NEW change file on the restored state
    land("f3", ["2,upsert,25.0", "5,upsert,50.0"])
    run_stream()  # v4 = restored + batch 3
    final = {r.k: r.bal for r in t.read(spark).collect()}
    assert final == {1: 10.0, 2: 25.0, 3: 30.0, 5: 50.0}, (
        "batch 2 must stay rolled back; batch 3 applies on the restored state"
    )
    actions = [h["action"] for h in t.history()]
    assert actions == ["overwrite", "overwrite", "overwrite", "restore", "overwrite"]
    # every boundary stays time-travelable, including the pre-restore v2
    assert sorted(r.k for r in t.read(spark, version=2).collect()) == [2, 3, 4]
    assert t.read(spark, version=v_restore).count() == 3
