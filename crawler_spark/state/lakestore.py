"""Durable crawl state — append-only parquet tables with a commit manifest.

The reference keeps ALL crawl state in process memory (scheduler queue,
dupefilter set, per-request ``meta`` page counters) and loses it on
crash — there is no resume (SURVEY.md §3.1). The north_rule requires
checkpoint-resumable state with per-partition lineage; the design of
record is an Iceberg catalog, whose runtime jars are not in this image
(offline sandbox). This module keeps the Iceberg-shaped API —
snapshot-committed appends, atomic manifest swap, time-travel by commit
id — over plain parquet directories, so swapping in Iceberg is a
one-class change (``writeTo(...).append()`` instead of
``parquet(dir)`` + manifest update).

Two table classes, two commit protocols (both crash-safe, idempotent):

- **Append tables** (items/errors/pops/metrics — the log):
  1. data is written to ``<root>/<table>/<commit_id>/``;
  2. the table's ``_commits.json`` is rewritten via temp-file + atomic
     ``os.replace`` to include the new commit id.
  A directory absent from ``_commits.json`` is an aborted write:
  readers never see it, and a re-run of the same commit id overwrites
  it (mode=overwrite), making wave re-execution idempotent.

- **Snapshot tables** (frontier/seen/shards — replaced every wave):
  ``stage_snapshot`` only writes the data directory; the snapshot
  becomes current when ``save_checkpoint`` records its commit id in
  ``_checkpoint.json['snapshots']``. The checkpoint's single atomic
  ``os.replace`` is therefore the commit point for ALL of a wave's
  snapshot tables AT ONCE — a crash between per-table writes can never
  expose mixed-wave state (frontier at w(k+1) with seen at w(k)), which
  per-table manifest swaps allowed. Superseded/aborted snapshot dirs
  are garbage-collected after the checkpoint lands (``gc_snapshots``),
  so a long crawl does not leak one directory per wave.

Both are tested in tests/test_resume.py, including a torn multi-table
snapshot write.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class LakeStore:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest helpers ---------------------------------------------------

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_commits.json")

    def commits(self, table: str) -> list[str]:
        path = self._manifest_path(table)
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return json.load(f)["commits"]

    def _write_manifest(self, table: str, commits: list[str]) -> None:
        path = self._manifest_path(table)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"commits": commits}, f)
        os.replace(tmp, path)  # atomic on POSIX

    # -- table ops ----------------------------------------------------------

    def append(self, df: DataFrame, table: str, commit_id: str) -> None:
        """Write df as one commit. Re-running the same commit_id replaces
        the uncommitted (or committed) data — idempotent wave replay."""
        tdir = os.path.join(self.root, table)
        os.makedirs(tdir, exist_ok=True)
        df.write.mode("overwrite").parquet(os.path.join(tdir, commit_id))
        commits = self.commits(table)
        if commit_id not in commits:
            commits.append(commit_id)
        self._write_manifest(table, commits)

    def stage_snapshot(self, df: DataFrame, table: str, commit_id: str) -> None:
        """Write a snapshot's data directory WITHOUT making it visible.
        It becomes current only when a later ``save_checkpoint`` names
        it in ``snapshots`` — one atomic rename commits every snapshot
        table of the wave together."""
        tdir = os.path.join(self.root, table)
        os.makedirs(tdir, exist_ok=True)
        df.write.mode("overwrite").parquet(os.path.join(tdir, commit_id))

    def read_snapshot(
        self,
        spark: SparkSession,
        table: str,
        commit_id: str | None,
        schema: T.StructType | None = None,
    ) -> DataFrame:
        """Read the snapshot the checkpoint names; empty if never
        committed (commit_id None)."""
        if commit_id is None:
            if schema is None:
                raise ValueError(f"snapshot {table!r} has no commit and no schema given")
            return spark.createDataFrame([], schema)
        return spark.read.parquet(os.path.join(self.root, table, commit_id))

    def gc_snapshots(self, table: str, keep: str) -> None:
        """Delete snapshot directories other than ``keep`` — superseded
        previous waves and aborted stage attempts. Call only AFTER the
        checkpoint naming ``keep`` has landed."""
        tdir = os.path.join(self.root, table)
        if not os.path.isdir(tdir):
            return
        for d in os.listdir(tdir):
            full = os.path.join(tdir, d)
            if os.path.isdir(full) and d != keep:
                shutil.rmtree(full)

    def read(self, spark: SparkSession, table: str, schema: T.StructType | None = None) -> DataFrame:
        commits = self.commits(table)
        if not commits:
            if schema is None:
                raise ValueError(f"table {table!r} is empty and no schema given")
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self.root, table, c) for c in commits]
        return spark.read.parquet(*paths)

    def drop_uncommitted(self, table: str) -> None:
        tdir = os.path.join(self.root, table)
        if not os.path.isdir(tdir):
            return
        committed = set(self.commits(table))
        for d in os.listdir(tdir):
            full = os.path.join(tdir, d)
            if os.path.isdir(full) and d not in committed:
                shutil.rmtree(full)

    # -- checkpoint ---------------------------------------------------------

    def save_checkpoint(self, payload: dict[str, Any]) -> None:
        path = os.path.join(self.root, "_checkpoint.json")
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, path)

    def load_checkpoint(self) -> dict[str, Any] | None:
        path = os.path.join(self.root, "_checkpoint.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)
