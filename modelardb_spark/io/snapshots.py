"""Snapshot catalog: ACID table commits over plain parquet/ORC files.

The reference hand-rolled a write-ahead log + crash recovery for its
file backends (storage/FileStorage.scala:83-233: log-before-write,
recover-on-open, merge-every-N). The production answer on Spark is a
table format with atomic metadata commits (Apache Iceberg); this
sandbox ships no Iceberg runtime jars, so this module implements the
same commit protocol at the scale of our catalog — the Iceberg /
Hadoop-catalog design, not a new invention:

- **Immutable data files.** Every write lands in a fresh
  ``data/commit-<uuid>/`` directory; nothing is ever modified in place.
- **Versioned manifests.** ``meta/v{N}.json`` lists the table's live
  data files (with their partition values and row counts) at version N
  plus the parent version and the operation that produced it.
- **Atomic commit = one filesystem primitive.** The fully-written
  manifest is published with ``os.link(tmp, vN)`` — atomic AND
  exclusive (fails with EEXIST if vN exists). There is no window where
  a reader can observe a partial manifest, and two writers can never
  both claim version N. (On HDFS/S3 the same role is played by
  rename-without-overwrite / conditional PUT; the protocol is
  identical.)
- **Optimistic concurrency.** A loser of the version race REBASES: its
  data files are already durable, so it recomputes the manifest delta
  against the new base and retries the link. Appends and overwrites of
  disjoint partitions from concurrent writers both land; overwrites of
  the same partition resolve last-committer-wins — Iceberg's
  serializable-append / last-wins-replace semantics.
- **Snapshot-isolated reads.** Readers resolve the current version
  once and read exactly that manifest's file list — concurrent commits
  never change a running query's input (no directory-listing races).
  Any retained version is readable (time travel).
- **Retention.** ``expire_snapshots`` drops old manifests and
  garbage-collects unreferenced data files; ``rewrite_data_files``
  compacts small files per partition in one commit (the
  merge-every-N concern of FileStorage.scala:320-351).

Scale note: commit cost is O(files in the manifest) of driver-side
JSON — the same shape as Iceberg's manifest handling; data volume
never moves at commit time. File counts stay bounded by compaction +
expiry, and the JSON could shard into per-partition manifest lists
(exactly Iceberg's manifest-list indirection) without changing the
protocol.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_META = "meta"
_DATA = "data"
_CURRENT_HINT = "_current"  # advisory version hint (version-hint.text)


class CommitConflict(RuntimeError):
    """Raised internally when another writer claimed the version; the
    public API always rebases and retries, so callers never see it
    unless max_retries is exhausted."""


def _partition_of(relpath: str) -> dict[str, str]:
    """Partition values encoded in a file's directory components
    (``part_day=19752/part-...``) — Spark's own layout encoding."""
    out: dict[str, str] = {}
    for comp in relpath.split("/")[:-1]:
        if "=" in comp:
            k, v = comp.split("=", 1)
            out[k] = v
    return out


@dataclass
class SnapshotCatalog:
    """Drop-in for `TableCatalog` (same method surface) with ACID
    commits and snapshot-pinned reads. `fmt` is "parquet" or "orc"."""

    root: str
    fmt: str = "parquet"
    max_retries: int = 20

    # ---------------------------------------------------------------- paths
    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _meta(self, name: str) -> str:
        return os.path.join(self.path(name), _META)

    def _data(self, name: str) -> str:
        return os.path.join(self.path(name), _DATA)

    def _vfile(self, name: str, version: int) -> str:
        return os.path.join(self._meta(name), f"v{version:08d}.json")

    # ------------------------------------------------------------- versions
    def current_version(self, name: str) -> int:
        """Latest committed version (0 = table does not exist yet).
        The hint file is advisory: probe upward from it so a crashed
        writer that linked a manifest but not the hint is still seen;
        when the hinted version is missing (stale hint + expired
        snapshots), fall back to listing the manifest directory —
        expiry leaves a gap below the retained versions that pure
        upward probing from 0 would misread as an empty table."""
        meta = self._meta(name)
        if not os.path.isdir(meta):
            return 0
        v = 0
        hint = os.path.join(meta, _CURRENT_HINT)
        if os.path.exists(hint):
            try:
                with open(hint) as f:
                    v = int(f.read().strip() or "0")
            except ValueError:
                v = 0
        if not os.path.exists(self._vfile(name, v)):
            versions = [
                int(fn[1:9])
                for fn in os.listdir(meta)
                if fn.startswith("v") and fn.endswith(".json") and fn[1:9].isdigit()
            ]
            v = max(versions, default=0)
        while os.path.exists(self._vfile(name, v + 1)):
            v += 1
        return v

    def exists(self, name: str) -> bool:
        return self.current_version(name) > 0

    def manifest(self, name: str, version: int | None = None) -> dict:
        v = self.current_version(name) if version is None else version
        if v == 0:
            return {"version": 0, "entries": [], "schema": None}
        with open(self._vfile(name, v)) as f:
            return json.load(f)

    # --------------------------------------------------------------- commit
    def _write_files(self, df: DataFrame, name: str, partition_by: list[str] | None):
        """Write one commit's immutable data directory; returns
        (commit_dir_name, manifest entries)."""
        commit = f"commit-{uuid.uuid4().hex[:12]}"
        target = os.path.join(self._data(name), commit)
        w = df.write.mode("errorifexists").format(self.fmt)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(target)
        entries = []
        for dirpath, _dirs, files in os.walk(target):
            for fn in files:
                if fn.startswith(("_", ".")):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, self._data(name))
                entries.append(
                    {
                        "path": rel,
                        "partition": _partition_of(rel),
                        "bytes": os.path.getsize(full),
                    }
                )
        return commit, entries

    def _try_link(self, name: str, version: int, manifest: dict) -> bool:
        """Publish a fully-written manifest as version `version`.
        os.link is atomic and exclusive: exactly one writer can claim a
        version, and no reader ever sees a partial file."""
        meta = self._meta(name)
        os.makedirs(meta, exist_ok=True)
        tmp = os.path.join(meta, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._vfile(name, version))
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        hint_tmp = os.path.join(meta, f".hint-{uuid.uuid4().hex}")
        with open(hint_tmp, "w") as f:
            f.write(str(version))
        os.replace(hint_tmp, os.path.join(meta, _CURRENT_HINT))  # atomic
        return True

    def _commit(self, name: str, op: str, delta) -> int:
        """Optimistic-concurrency commit loop: apply `delta(base_entries)
        -> entries` against the current base; on a lost race, rebase on
        the new base and retry (data files are already durable)."""
        for _ in range(self.max_retries):
            base_v = self.current_version(name)
            base = self.manifest(name, base_v)
            manifest = {
                "version": base_v + 1,
                "parent": base_v,
                "operation": op,
                "entries": delta(base.get("entries", [])),
                "schema": base.get("schema"),
                "ts_ms": int(time.time() * 1000),
            }
            if self._try_link(name, base_v + 1, manifest):
                return base_v + 1
        raise CommitConflict(
            f"{name}: lost the commit race {self.max_retries} times"
        )

    def _commit_write(
        self,
        df: DataFrame,
        name: str,
        op: str,
        partition_by: list[str] | None,
        delta_with,
    ) -> int:
        _commit_dir, new_entries = self._write_files(df, name, partition_by)
        schema_json = df.schema.json()

        def delta(base_entries):
            return delta_with(base_entries, new_entries)

        for _ in range(self.max_retries):
            base_v = self.current_version(name)
            base = self.manifest(name, base_v)
            manifest = {
                "version": base_v + 1,
                "parent": base_v,
                "operation": op,
                "entries": delta(base.get("entries", [])),
                "schema": schema_json,
                "ts_ms": int(time.time() * 1000),
            }
            if self._try_link(name, base_v + 1, manifest):
                return base_v + 1
        raise CommitConflict(
            f"{name}: lost the commit race {self.max_retries} times"
        )

    # ------------------------------------------------- TableCatalog surface
    def overwrite(
        self, df: DataFrame, name: str, partition_by: list[str] | None = None
    ) -> None:
        self._commit_write(
            df, name, "overwrite", partition_by, lambda base, new: new
        )

    def append(
        self, df: DataFrame, name: str, partition_by: list[str] | None = None
    ) -> None:
        self._commit_write(
            df, name, "append", partition_by, lambda base, new: base + new
        )

    def overwrite_partitions(
        self, df: DataFrame, name: str, partition_by: list[str]
    ) -> None:
        """Dynamic partition overwrite as ONE atomic commit: partitions
        present in `df` are replaced, all others are untouched — and a
        reader never sees the in-between state (the property the plain
        directory catalog cannot give)."""

        def delta(base, new):
            replaced = {
                tuple(sorted(e["partition"].items())) for e in new
            }
            kept = [
                e
                for e in base
                if tuple(sorted(e["partition"].items())) not in replaced
            ]
            return kept + new

        self._commit_write(df, name, "overwrite_partitions", partition_by, delta)

    def drop_partitions(self, name: str, column: str, values: list) -> int:
        """Metadata-only commit (Iceberg `DELETE WHERE part = v`): no
        data moves; the files become unreferenced and are reclaimed by
        expire_snapshots."""
        drop = {str(v) for v in values}
        before = self.manifest(name).get("entries", [])
        hit = {
            str(v)
            for v in drop
            if any(e["partition"].get(column) == str(v) for e in before)
        }
        if not hit:
            return 0

        def delta(base):
            return [e for e in base if e["partition"].get(column) not in drop]

        self._commit(name, "drop_partitions", delta)
        return len(hit)

    def list_partitions(self, name: str, column: str) -> list[str]:
        vals = {
            e["partition"][column]
            for e in self.manifest(name).get("entries", [])
            if column in e["partition"]
        }
        return sorted(vals)

    def read(
        self,
        spark: SparkSession,
        name: str,
        version: int | None = None,
        partition_filter: dict[str, list] | None = None,
    ) -> DataFrame:
        """Snapshot-pinned read: exactly the manifest's files, grouped
        by commit directory so Spark re-derives partition columns from
        each directory layout. `version` time-travels; `partition_filter`
        ({column: [values]}) prunes files at the MANIFEST level before
        Spark lists anything."""
        man = self.manifest(name, version)
        entries = man.get("entries", [])
        if partition_filter:
            want = {k: {str(v) for v in vs} for k, vs in partition_filter.items()}
            entries = [
                e
                for e in entries
                if all(e["partition"].get(k) in vs for k, vs in want.items())
            ]
        if not entries:
            if man.get("schema") is None:
                raise FileNotFoundError(f"{name}: no committed snapshot")
            return spark.createDataFrame(
                [], StructType.fromJson(json.loads(man["schema"]))
            )
        by_commit: dict[str, list[str]] = {}
        for e in entries:
            commit = e["path"].split("/", 1)[0]
            by_commit.setdefault(commit, []).append(
                os.path.join(self._data(name), e["path"])
            )
        parts = []
        for commit, files in sorted(by_commit.items()):
            parts.append(
                spark.read.option(
                    "basePath", os.path.join(self._data(name), commit)
                )
                .format(self.fmt)
                .load(files)
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    # ------------------------------------------------------------ manifests
    def write_manifest(self, name: str, info: dict) -> None:
        """Side-channel table info (snapshot ids etc.), kept API-
        compatible with TableCatalog; stored next to the versioned
        manifests, last-writer-wins via atomic replace."""
        os.makedirs(self._meta(name), exist_ok=True)
        info = dict(info, written_at_ms=int(time.time() * 1000))
        tmp = os.path.join(self._meta(name), f".info-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(info, f, indent=2, sort_keys=True)
        os.replace(tmp, os.path.join(self._meta(name), "_INFO.json"))

    def read_manifest(self, name: str) -> dict | None:
        p = os.path.join(self._meta(name), "_INFO.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    # ----------------------------------------------------------- retention
    def expire_snapshots(self, name: str, keep_last: int = 2) -> dict:
        """Drop manifests older than the newest `keep_last` and
        garbage-collect data files no retained manifest references.
        Readers pinned to an expired version fail on their next open —
        Iceberg's documented contract.

        Run from the maintenance path WITHOUT concurrent writers: a
        writer that has staged data files but not yet linked its
        manifest references nothing yet, so a simultaneous expiry would
        sweep its files (the same caveat as Iceberg's orphan-file
        cleanup with in-flight commits)."""
        cur = self.current_version(name)
        keep = set(range(max(1, cur - keep_last + 1), cur + 1))
        removed_manifests = 0
        for v in range(1, cur + 1):
            if v not in keep and os.path.exists(self._vfile(name, v)):
                os.unlink(self._vfile(name, v))
                removed_manifests += 1
        live: set[str] = set()
        for v in keep:
            for e in self.manifest(name, v).get("entries", []):
                live.add(os.path.normpath(os.path.join(self._data(name), e["path"])))
        removed_files = 0
        for dirpath, _dirs, files in os.walk(self._data(name), topdown=False):
            for fn in files:
                full = os.path.normpath(os.path.join(dirpath, fn))
                if full not in live:
                    os.unlink(full)
                    removed_files += 1
            if not os.listdir(dirpath):
                os.rmdir(dirpath)
        return {"manifests": removed_manifests, "data_files": removed_files}

    def rewrite_data_files(
        self, spark: SparkSession, name: str, partition_by: list[str]
    ) -> int:
        """Compaction (Iceberg rewrite_data_files): rewrite the current
        snapshot as one file per partition in ONE commit; concurrent
        appends that land first win the race and this rewrite rebases —
        but to keep the semantics trivially safe it re-reads and fully
        replaces, so run it from the maintenance path like Iceberg's
        procedure."""
        df = self.read(spark, name).repartition(*partition_by)
        self.overwrite(df, name, partition_by)
        return self.current_version(name)


def make_catalog(root: str, fmt: str = "parquet", kind: str = "dir"):
    """Catalog factory: "dir" = TableCatalog (partition-dir layout),
    "snapshot" = SnapshotCatalog (ACID manifest commits), "jdbc" =
    JdbcCatalog (RDBMS backend, JDBCStorage.scala parity)."""
    if kind == "snapshot":
        return SnapshotCatalog(root, fmt)
    if kind == "jdbc":
        from modelardb_spark.io.jdbc import JdbcCatalog

        return JdbcCatalog(root)
    from modelardb_spark.io.tables import TableCatalog

    if kind != "dir":
        raise ValueError(f"unknown catalog kind: {kind}")
    return TableCatalog(root, fmt)
