"""Iceberg-lite snapshot table: manifest-based atomic commits + time travel.

Layout (all paths under one table root):

    <root>/data/s<N>-<uuid>/part-*.parquet   immutable data directories
    <root>/manifests/v<N>.json               one manifest per snapshot
    <root>/LATEST                            current-snapshot pointer

A commit NEVER mutates existing files: it (1) writes a brand-new data
directory, (2) writes manifest ``v<N>.json`` listing the FULL set of
data directories visible in snapshot N, then (3) atomically renames a
temp file over ``LATEST``. Readers resolve LATEST → manifest → data
dirs; every file on that path is immutable once named, and the pointer
swing is a single POSIX rename, so a concurrent reader observes either
the old snapshot or the new one — never a torn mix (tested in
tests/test_round8_ops.py). Old snapshots stay readable until an
explicit ``expire_snapshots`` — that is what makes ``read_as_of`` time
travel free.

Design follows the PUBLIC Apache Iceberg spec's snapshot +
metadata-pointer model (v1 semantics: manifests enumerate data files,
a root pointer names the live snapshot); the implementation here is
original and minimal. Reference parity: the reference delegates table
state to BigQuery's ``if_exists='append'/'replace'``
(``sf_html_data.py:178-185``) with no point-in-time reads; this layer
is the lake-side replacement that the history/bitemporal query family
(queries/history.py) assumes at 100 TB.

SINGLE-WRITER assumption (same contract as ``sinks.writers.swap_dir``):
snapshot ids are allocated as latest+1 without a lock, so two
concurrent WRITERS can race on a manifest name; readers are always
consistent. A multi-writer deployment swaps step (3) for a
compare-and-swap on the pointer (e.g. a rename that fails if LATEST
moved), exactly Iceberg's optimistic-commit loop.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    """A parquet table with atomic snapshot commits and time travel."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)

    # -- metadata ------------------------------------------------------------
    def _pointer(self) -> str:
        return os.path.join(self.root, "LATEST")

    def _manifest_path(self, snapshot_id: int) -> str:
        return os.path.join(self.root, "manifests", f"v{snapshot_id}.json")

    def latest_snapshot_id(self) -> int | None:
        try:
            with open(self._pointer()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def manifest(self, snapshot_id: int) -> dict:
        with open(self._manifest_path(snapshot_id)) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        """All manifests, oldest first (the snapshot log)."""
        latest = self.latest_snapshot_id()
        if latest is None:
            return []
        return [self.manifest(i) for i in range(1, latest + 1)]

    # -- commits -------------------------------------------------------------
    def _commit(self, df: DataFrame, operation: str) -> int:
        parent = self.latest_snapshot_id()
        new_id = 1 if parent is None else parent + 1
        rel_dir = os.path.join("data", f"s{new_id}-{uuid.uuid4().hex[:8]}")
        df.write.parquet(os.path.join(self.root, rel_dir))
        dirs: list[str] = []
        if operation == "append" and parent is not None:
            dirs.extend(self.manifest(parent)["data_dirs"])
        dirs.append(rel_dir)
        manifest = {
            "snapshot_id": new_id,
            "parent_id": parent,
            "operation": operation,
            "data_dirs": dirs,
        }
        # manifest then pointer, each via write-temp + atomic rename —
        # a reader that resolves the pointer always finds a complete
        # manifest whose data dirs are fully written
        for path, payload in (
            (self._manifest_path(new_id), json.dumps(manifest, indent=1)),
            (self._pointer(), str(new_id)),
        ):
            tmp = path + f".tmp.{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                f.write(payload)
                f.flush()
                os.fsync(f.fileno())
            os.rename(tmp, path)
        return new_id

    def commit_overwrite(self, df: DataFrame) -> int:
        """The reference's ``if_exists='replace'`` with history kept."""
        return self._commit(df, "overwrite")

    def commit_append(self, df: DataFrame) -> int:
        """The reference's ``if_exists='append'``: the new snapshot sees
        the parent's data dirs plus the new one — no rewrite of old data."""
        return self._commit(df, "append")

    # -- reads ---------------------------------------------------------------
    def read_as_of(
        self, spark: SparkSession, snapshot_id: int | None = None
    ) -> DataFrame:
        """The table as of ``snapshot_id`` (default: current). Reads only
        the manifest's data dirs — at scale each dir is partition-pruned
        parquet like any other table."""
        sid = self.latest_snapshot_id() if snapshot_id is None else snapshot_id
        if sid is None:
            raise ValueError(f"empty snapshot table at {self.root}")
        dirs = self.manifest(sid)["data_dirs"]
        return spark.read.parquet(*[os.path.join(self.root, d) for d in dirs])

    # -- maintenance ---------------------------------------------------------
    def expire_snapshots(self, keep_from: int) -> list[str]:
        """Drop manifests < ``keep_from`` and delete data dirs no
        surviving snapshot references (Iceberg's expire_snapshots).
        Returns the deleted data dirs."""
        latest = self.latest_snapshot_id()
        if latest is None or keep_from <= 1:
            return []
        keep_from = min(keep_from, latest)
        live: set[str] = set()
        for i in range(keep_from, latest + 1):
            live.update(self.manifest(i)["data_dirs"])
        deleted = []
        for i in range(1, keep_from):
            path = self._manifest_path(i)
            if not os.path.exists(path):
                continue
            for d in self.manifest(i)["data_dirs"]:
                if d not in live and os.path.exists(os.path.join(self.root, d)):
                    shutil.rmtree(os.path.join(self.root, d))
                    deleted.append(d)
            os.remove(path)
        return deleted
