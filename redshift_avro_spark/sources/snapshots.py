"""Versioned snapshot tables — manifest-tracked parquet with time
travel and stats-based file pruning (a minimal lakehouse table layer).

The reference stops at decode; a 100 TB corpus built FROM those
decodes needs a table layer that answers three questions a plain
directory can't: *what exactly is in the table right now* (atomic
commits), *what was in it yesterday* (time travel for reproducible
training runs), and *which files can this query skip* (file-level
zone maps — the persisted form of :mod:`..operators.layout`'s
analysis). This module implements the smallest honest version of the
Delta/Iceberg idea:

- every commit writes its parquet files into a fresh
  ``data/v{N}-…/`` directory, collects per-file row counts and
  min/max column stats WITH A SPARK JOB (one ``input_file_name()``
  aggregation — the metadata is tiny, the scan is distributed), and
  records them in ``manifest-{N:05d}.json``;
- a manifest lists absolute data-file entries, so APPEND is "previous
  entries + new entries" and OVERWRITE is "new entries" — readers of
  version N never see a half-written version N+1 (the manifest is
  written last, atomically via rename);
- reads resolve a version's file list driver-side, optionally prune
  it with a ``(col, lo, hi)`` interval against the stored stats
  (files whose zone map misses the interval are never opened), and
  hand the survivors to the normal parquet reader — predicate
  pushdown and column pruning still apply inside each file.

What this deliberately does NOT do (and says so): concurrent writer
coordination beyond loud version-collision detection (single-writer
assumption; commits link-publish atomically so a crashed writer
leaves no visible version — its orphaned ``data/`` directory is
unreferenced and harmless, but reclaiming it needs an out-of-band
sweep, not :meth:`SnapshotTableMaintenance.vacuum`, which only
removes files referenced by EXPIRED manifests), row-level deletes
(overwrite granularity is the commit), and catalog integration.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["SnapshotTable", "SnapshotTableMaintenance", "SnapshotError"]

_MANIFEST_FMT = "manifest-{n:05d}.json"


class SnapshotError(RuntimeError):
    """Raised for malformed tables, unknown versions or bad usage."""


@dataclass
class _FileEntry:
    path: str
    rows: int
    stats: dict = field(default_factory=dict)  # col -> [min, max]


class SnapshotTable:
    """A manifest-versioned parquet table rooted at ``root``."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # ------------------------------------------------------------ meta
    def versions(self) -> list:
        out = []
        for name in os.listdir(self.root):
            if name.startswith("manifest-") and name.endswith(".json"):
                try:
                    out.append(int(name[len("manifest-"):-len(".json")]))
                except ValueError as e:
                    raise SnapshotError(f"alien manifest name {name!r} in {self.root}") from e
        return sorted(out)

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise SnapshotError(f"{self.root} has no committed version")
        return vs[-1]

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, _MANIFEST_FMT.format(n=version))

    def _load_manifest(self, version: int) -> dict:
        path = self._manifest_path(version)
        if not os.path.exists(path):
            raise SnapshotError(f"version {version} does not exist in {self.root}")
        with open(path) as f:
            m = json.load(f)
        for k in ("version", "action", "files"):
            if k not in m:
                raise SnapshotError(f"manifest {path} missing key {k!r}")
        return m

    def history(self) -> list:
        """One dict per version: version, action, n_files, n_rows."""
        out = []
        for v in self.versions():
            m = self._load_manifest(v)
            out.append(
                {
                    "version": v,
                    "action": m["action"],
                    "n_files": len(m["files"]),
                    "n_rows": sum(fe["rows"] for fe in m["files"]),
                }
            )
        return out

    # ----------------------------------------------------------- write
    def commit(
        self,
        df: DataFrame,
        *,
        mode: str = "append",
        stats_cols: tuple = (),
    ) -> int:
        """Write ``df`` as a new version; returns the version number.

        ``stats_cols`` name numeric/orderable columns whose per-file
        min/max go into the manifest for pruning. The stats job is one
        distributed ``input_file_name()`` aggregation; only the
        per-file summary (O(files)) reaches the driver.
        """
        if mode not in ("append", "overwrite"):
            raise SnapshotError(f"commit mode must be append|overwrite, got {mode!r}")
        missing = [c for c in stats_cols if c not in df.columns]
        if missing:
            raise SnapshotError(f"stats_cols {missing} not in DataFrame")
        spark = df.sparkSession
        vs = self.versions()
        version = (vs[-1] + 1) if vs else 0
        datadir = os.path.join(self.root, "data", f"v{version:05d}-{uuid.uuid4().hex[:8]}")
        df.write.parquet(datadir)

        back = spark.read.parquet(datadir)
        aggs = [F.count("*").cast("long").alias("__rows")]
        for c in stats_cols:
            aggs.append(F.min(c).alias(f"__min_{c}"))
            aggs.append(F.max(c).alias(f"__max_{c}"))
        rows = (
            back.groupBy(F.input_file_name().alias("__file"))
            .agg(*aggs)
            .collect()  # O(files) manifest metadata, not data
        )
        new_entries = []
        for r in sorted(rows, key=lambda r: r["__file"]):
            stats = {}
            for c in stats_cols:
                mn, mx = r[f"__min_{c}"], r[f"__max_{c}"]
                stats[c] = [self._json_safe(mn), self._json_safe(mx)]
            path = r["__file"]
            if path.startswith("file:"):
                path = path[len("file:"):]
            new_entries.append({"path": path, "rows": r["__rows"], "stats": stats})

        files = new_entries
        if mode == "append" and vs:
            files = self._load_manifest(vs[-1])["files"] + new_entries
        # schema travels in the manifest so a version whose file list is
        # empty (a legitimate truncating overwrite: the stats job emits
        # no rows, hence no entries) still reads back as an empty
        # DataFrame with the right columns instead of raising
        manifest = {
            "version": version,
            "action": mode,
            "files": files,
            "schema": json.loads(df.schema.json()),
        }
        tmp = self._manifest_path(version) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        # atomic CREATE (link fails if the name exists), not rename
        # (which silently overwrites): a concurrent writer racing to
        # the same version number loses LOUDLY instead of silently
        # clobbering the other commit
        try:
            os.link(tmp, self._manifest_path(version))
        except FileExistsError as e:
            raise SnapshotError(
                f"concurrent commit detected: version {version} was published "
                f"by another writer while this commit was writing"
            ) from e
        finally:
            os.unlink(tmp)
        return version

    def restore(self, version: int) -> int:
        """Roll the table back to ``version`` as a NEW commit — the
        Delta-style RESTORE: a metadata-only operation that publishes a
        fresh manifest pointing at the old version's file list (no data
        moves or copies), so the rollback is itself time-travelable and
        the rolled-back-over versions stay readable until VACUUM ages
        them out. Returns the new version number.

        The restored version's files must still exist — restoring past
        a VACUUM that already collected them raises loudly instead of
        publishing a manifest of dangling paths."""
        src = self._load_manifest(version)  # raises on unknown version
        missing = [e["path"] for e in src["files"] if not os.path.exists(e["path"])]
        if missing:
            raise SnapshotError(
                f"cannot restore v{version}: {len(missing)} data file(s) were "
                f"vacuumed (first: {missing[0]})"
            )
        vs = self.versions()
        new_version = (vs[-1] + 1) if vs else 0
        manifest = {
            "version": new_version,
            "action": "restore",
            "restored_from": version,
            "files": src["files"],
            "schema": src["schema"],
        }
        tmp = self._manifest_path(new_version) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, self._manifest_path(new_version))
        except FileExistsError as e:
            raise SnapshotError(
                f"concurrent commit detected: version {new_version} was "
                f"published by another writer while this restore was writing"
            ) from e
        finally:
            os.unlink(tmp)
        return new_version

    @staticmethod
    def _json_safe(v):
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return v

    # ------------------------------------------------------------ read
    def file_entries(self, version: int | None = None, prune: tuple | None = None) -> list:
        """Resolved (and optionally pruned) file entries of a version.

        ``prune`` is ``(col, lo, hi)``: keep only files whose stored
        [min, max] for ``col`` intersects [lo, hi]; files without
        stats for the column are conservatively kept.
        """
        v = self.latest_version() if version is None else version
        m = self._load_manifest(v)
        entries = m["files"]
        if prune is not None:
            col, lo, hi = prune
            kept = []
            for fe in entries:
                st = fe.get("stats", {}).get(col)
                if st is None or not (st[1] < lo or st[0] > hi):
                    kept.append(fe)
            entries = kept
        return entries

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        prune: tuple | None = None,
    ) -> DataFrame:
        """Read a version as a DataFrame, skipping pruned files.

        An empty post-prune (or legitimately empty) version returns an
        empty DataFrame with the table's schema — taken from the
        manifest's recorded schema, falling back to the first file for
        manifests written before schemas were recorded."""
        v = self.latest_version() if version is None else version
        entries = self.file_entries(version=v, prune=prune)
        if not entries:
            m = self._load_manifest(v)
            if "schema" in m:  # committed by a schema-carrying writer
                from pyspark.sql.types import StructType

                return spark.createDataFrame([], StructType.fromJson(m["schema"]))
            full = m["files"]
            if not full:
                raise SnapshotError("cannot derive schema from an empty version")
            schema = spark.read.parquet(full[0]["path"]).schema
            return spark.createDataFrame([], schema)
        return spark.read.parquet(*[fe["path"] for fe in entries])


def _entries_bytes(entries: list) -> int:
    return sum(os.path.getsize(fe["path"]) for fe in entries)


class SnapshotTableMaintenance:
    """OPTIMIZE/VACUUM for :class:`SnapshotTable` — separated so the
    read/write core stays small; construct with the table."""

    def __init__(self, table: SnapshotTable):
        self.table = table

    def compact(
        self,
        spark: SparkSession,
        *,
        target_bytes: int = 128 * 1024 * 1024,
        stats_cols: tuple = (),
        sort_col: str | None = None,
    ) -> int:
        """Rewrite the LATEST version's files into ~``target_bytes``
        outputs and commit the result as a new overwrite version —
        the table-layer realization of the q58 shard-sizing plan.

        ``sort_col`` additionally range-partitions + sorts the rewrite
        on that column so the new files carry tight zone maps (the
        persisted form of the q117 clustering analysis; pass the
        column queries filter on). Returns the new version number.
        """
        t = self.table
        entries = t.file_entries()
        total = _entries_bytes(entries)
        n_files = max(1, (total + target_bytes - 1) // target_bytes)
        df = t.read(spark)
        if sort_col is not None:
            if sort_col not in df.columns:
                raise SnapshotError(f"sort_col {sort_col!r} not in table")
            df = df.repartitionByRange(n_files, sort_col).sortWithinPartitions(sort_col)
        else:
            df = df.repartition(n_files)
        return t.commit(df, mode="overwrite", stats_cols=stats_cols)

    def vacuum(self, keep_versions: int = 2) -> list:
        """Delete data files referenced ONLY by versions older than the
        last ``keep_versions``, and drop those versions' manifests.
        Returns the deleted file paths. Time travel to vacuumed
        versions subsequently raises (as in any lakehouse)."""
        if keep_versions < 1:
            raise SnapshotError(f"keep_versions must be >= 1, got {keep_versions}")
        t = self.table
        vs = t.versions()
        keep, drop = vs[-keep_versions:], vs[:-keep_versions]
        if not drop:
            return []
        live = {
            fe["path"] for v in keep for fe in t._load_manifest(v)["files"]
        }
        dead = []
        for v in drop:
            for fe in t._load_manifest(v)["files"]:
                if fe["path"] not in live:
                    dead.append(fe["path"])
        for path in sorted(set(dead)):
            if os.path.exists(path):
                os.remove(path)
        for v in drop:
            os.remove(t._manifest_path(v))
        return sorted(set(dead))


def table_diff(
    spark: SparkSession,
    table: SnapshotTable,
    *,
    from_version: int,
    to_version: int,
    key: str,
    with_before: bool = False,
) -> DataFrame:
    """Change feed BETWEEN two versions — the inverse of CDC merge:
    downstream consumers that missed intermediate versions catch up
    with one diff instead of replaying history.

    Returns (``key``, op ∈ insert|delete|update, plus the TO-version
    value columns, NULL for deletes). An unchanged key emits nothing;
    'update' means any value column differs (NULL-safe comparison).
    ``with_before=True`` additionally emits each value column's
    FROM-version image as ``before_<col>`` — the before/after pair
    that incremental view maintenance needs (a downstream aggregate
    updates as +new −old without rescanning the table; proven in
    test_snapshots.py::test_incremental_aggregate_maintenance).

    Scale: one full-outer join on the table key between the two
    version reads — co-keyed if the table is written bucketed on it;
    file pruning applies to both sides as usual.
    """
    old = table.read(spark, version=from_version)
    new = table.read(spark, version=to_version)
    if key not in old.columns or key not in new.columns:
        raise SnapshotError(f"table_diff: key {key!r} missing from a version's schema")
    value_cols = [c for c in new.columns if c != key]
    o = old.select(F.col(key).alias("__k"), F.struct(*old.columns).alias("__o"))
    n = new.select(F.col(key).alias("__k"), F.struct(*new.columns).alias("__n"))
    joined = o.join(n, "__k", "full_outer")
    changed = F.lit(False)
    for c in value_cols:
        changed = changed | ~F.col(f"__o.{c}").eqNullSafe(F.col(f"__n.{c}"))
    before = (
        [F.col(f"__o.{c}").alias(f"before_{c}") for c in value_cols] if with_before else []
    )
    out = joined.select(
        F.col("__k").alias(key),
        F.when(F.col("__o").isNull(), F.lit("insert"))
        .when(F.col("__n").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
        .alias("op"),
        *[F.col(f"__n.{c}").alias(c) for c in value_cols],
        *before,
    )
    return out.where(F.col("op").isNotNull())
