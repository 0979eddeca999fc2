"""Versioned parquet tables — a minimal transaction log giving
snapshot isolation and time travel without Delta/Iceberg (neither is
in this container; on a real deployment this module swaps for
`DeltaTable` with no caller changes).

Why it exists (SURVEY.md §7 risk register): the reference's SEM
confidence model trains on PRIOR runs' org_air_scores
(sem_confidence.py:278-297) — a self-referential feedback loop.  A
run that reads the same table it is writing must read the PRE-RUN
snapshot, or it trains on its own output.  Delta time travel makes
that clean; this is the same mechanism at 1% of the size:

- data files are immutable parquet under `<path>/data/`,
- each commit writes a manifest `<path>/_log/v%010d.json` listing the
  EXACT data files that make up that version,
- the manifest is written to a temp name and `os.link`-ed into place:
  link(2) fails if the target exists, so two concurrent committers
  cannot both win a version — the loser re-reads and retries
  (optimistic concurrency, same protocol as Delta's log).

Readers resolve a manifest (latest or pinned version) and read ONLY
its files — writers never disturb a running reader, and any historic
version stays readable until explicitly vacuumed.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_log"
_DATA = "data"


class VersionedTable:
    """Path-based versioned parquet table with snapshot reads."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.join(path, _LOG), exist_ok=True)
        os.makedirs(os.path.join(path, _DATA), exist_ok=True)

    # -- log helpers -------------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, _LOG, f"v{version:010d}.json")

    def latest_version(self) -> int:
        """Highest committed version, or -1 for an empty table."""
        vs = [
            int(f[1:11])
            for f in os.listdir(os.path.join(self.path, _LOG))
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(vs, default=-1)

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def history(self) -> list[dict]:
        vs = sorted(
            int(f[1:11])
            for f in os.listdir(os.path.join(self.path, _LOG))
            if f.startswith("v") and f.endswith(".json")
        )
        return [self._read_manifest(v) for v in vs]

    # -- write path --------------------------------------------------------

    def write(self, df: DataFrame, mode: str = "append") -> int:
        """Commit `df` as a new version; returns the version number.

        mode='append' keeps the previous version's files and adds the
        new ones; mode='overwrite' starts the file list fresh.  Data
        lands first (immutable, invisible until committed); the
        manifest link is the atomic commit point.  On a version
        collision with a concurrent writer the commit RETRIES against
        the new latest — append semantics compose, overwrite
        last-writer-wins, both without ever corrupting a snapshot.
        """
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unsupported mode {mode!r}")
        stage = os.path.join(self.path, _DATA, uuid.uuid4().hex)
        df.write.mode("error").parquet(stage)
        new_files = sorted(
            os.path.join(stage, f)
            for f in os.listdir(stage)
            if f.endswith(".parquet")
        )
        while True:
            base = self.latest_version()
            files = new_files
            if mode == "append" and base >= 0:
                files = self._read_manifest(base)["files"] + new_files
            version = base + 1
            manifest = {
                "version": version,
                "mode": mode,
                "files": files,
                "n_new_files": len(new_files),
                "committed_at": time.time(),
            }
            tmp = self._manifest_path(version) + f".{uuid.uuid4().hex}.tmp"
            with open(tmp, "w") as fh:
                json.dump(manifest, fh)
            try:
                os.link(tmp, self._manifest_path(version))  # atomic claim
                os.unlink(tmp)
                return version
            except FileExistsError:
                os.unlink(tmp)  # lost the race — recompute and retry

    # -- read path ---------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read: latest version by default, or AS OF any
        committed version (time travel)."""
        v = self.latest_version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"versioned table {self.path} has no commits")
        files = self._read_manifest(v)["files"]
        return spark.read.parquet(*files)


    # -- maintenance -------------------------------------------------------

    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """OPTIMIZE-style compaction: rewrite the LATEST snapshot into
        `target_files` files and commit as a new version.  Pure
        metadata+rewrite — readers of any existing version are
        untouched, and the result is bit-identical data in fewer,
        bigger files (the small-file problem is the first thing a
        streaming ingest path creates at scale)."""
        compacted = self.read(spark).coalesce(target_files)
        return self.write(compacted, mode="overwrite")

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Retention: drop manifests older than the last `keep_last`
        versions and delete data files no surviving version
        references.  Returns the deleted file paths.  Time travel
        windows shrink accordingly — same contract as Delta VACUUM."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        latest = self.latest_version()
        if latest < 0:
            return []
        cutoff = latest - keep_last + 1
        keep_files: set[str] = set()
        for v in range(cutoff, latest + 1):
            keep_files.update(self._read_manifest(v)["files"])
        removed: list[str] = []
        for v in range(0, cutoff):
            for f in self._read_manifest(v)["files"]:
                if f not in keep_files and os.path.exists(f):
                    os.unlink(f)
                    removed.append(f)
            os.unlink(self._manifest_path(v))
        # prune emptied staging dirs
        data_root = os.path.join(self.path, _DATA)
        for d in os.listdir(data_root):
            full = os.path.join(data_root, d)
            if os.path.isdir(full) and not any(
                f.endswith(".parquet") for f in os.listdir(full)
            ):
                import shutil

                shutil.rmtree(full)
        return removed


def transactional_merge(
    table: VersionedTable, source: DataFrame, keys: list[str]
) -> int:
    """MERGE with snapshot isolation: read the latest snapshot, apply
    the algebraic merge (anti-join ∪ source — the same shuffle Delta's
    MERGE runs underneath), commit as a NEW version.  Readers pinned
    to older versions are untouched; the pre-merge state stays
    time-travelable.  Returns the committed version."""
    from ..operators.writes import merge_upsert

    if table.latest_version() < 0:
        return table.write(source, mode="overwrite")
    merged = merge_upsert(table.read(source.sparkSession), source, keys)
    return table.write(merged, mode="overwrite")
