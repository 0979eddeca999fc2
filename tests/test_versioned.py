"""Versioned parquet table (mini transaction log): snapshot isolation,
time travel, optimistic commits, transactional MERGE — and the
self-referential SEM loop reading its pre-run snapshot (SURVEY §7,
reference sem_confidence.py:278-297)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from damg7245_casestudy_03_ai_scoring_engine_spark.sources.versioned import (
    VersionedTable,
    transactional_merge,
)

from conftest import SF_SMOKE


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_append_and_overwrite_versions_time_travel(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    assert t.latest_version() == -1
    v0 = t.write(_df(spark, [(1, "a")]), mode="overwrite")
    v1 = t.write(_df(spark, [(2, "b")]), mode="append")
    v2 = t.write(_df(spark, [(9, "z")]), mode="overwrite")
    assert (v0, v1, v2) == (0, 1, 2)
    assert sorted(tuple(r) for r in t.read(spark, 0).collect()) == [(1, "a")]
    assert sorted(tuple(r) for r in t.read(spark, 1).collect()) == [(1, "a"), (2, "b")]
    assert sorted(tuple(r) for r in t.read(spark).collect()) == [(9, "z")]
    assert [m["version"] for m in t.history()] == [0, 1, 2]


def test_readers_pinned_to_old_version_survive_overwrite(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    pinned = t.read(spark, 0)
    t.write(_df(spark, [(3, "c")]), mode="overwrite")
    # the pinned snapshot still reads the ORIGINAL files
    assert sorted(r.k for r in pinned.collect()) == [1, 2]


def test_commit_collision_retries_not_corrupts(spark, tmp_path):
    """Simulate losing the commit race: pre-claim the next version's
    manifest name; the writer must land on the following version."""
    t = VersionedTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    # squat on v1 with a valid empty-append manifest (a "concurrent"
    # committer that added nothing)
    import json

    m0 = t._read_manifest(0)
    with open(t._manifest_path(1), "w") as fh:
        json.dump({"version": 1, "mode": "append", "files": m0["files"], "n_new_files": 0, "committed_at": 0}, fh)
    v = t.write(_df(spark, [(2, "b")]), mode="append")
    assert v == 2
    assert sorted(r.k for r in t.read(spark).collect()) == [1, 2]


def test_transactional_merge_snapshot_isolated(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "old"), (2, "keep")]), mode="overwrite")
    v = transactional_merge(t, _df(spark, [(1, "new"), (3, "ins")]), ["k"])
    assert v == 1
    assert sorted(tuple(r) for r in t.read(spark).collect()) == [
        (1, "new"), (2, "keep"), (3, "ins"),
    ]
    # pre-merge state is still time-travelable
    assert sorted(tuple(r) for r in t.read(spark, 0).collect()) == [
        (1, "old"), (2, "keep"),
    ]


def test_sem_runs_train_on_pre_run_snapshot_only(spark, tmp_path):
    """Run 1 has no history (every company gets the ±5 fallback band);
    run 2 trains exactly on run 1's snapshot — and run 2's own rows,
    though written to the same table, cannot influence its SEM
    (structural no-feedback).  Version pinning proves both."""
    from damg7245_casestudy_03_ai_scoring_engine_spark.scoring.sem_snapshot import (
        SEM_FALLBACK_BAND,
        run_scoring_with_sem,
        sem_from_history,
    )

    t = VersionedTable(str(tmp_path / "scores"))
    v1, r1 = run_scoring_with_sem(spark, SF_SMOKE, t, run_id=1)
    rows1 = {r.company_id: r for r in r1.collect()}
    assert v1 == 0
    for r in rows1.values():  # no history -> fallback band, clamped
        assert r.n_training == 0
        assert r.ci_low == round(max(r.composite_score - SEM_FALLBACK_BAND, 0.0), 4)
        assert r.ci_high == round(min(r.composite_score + SEM_FALLBACK_BAND, 100.0), 4)

    v2, r2 = run_scoring_with_sem(spark, SF_SMOKE, t, run_id=2)
    rows2 = {r.company_id: r for r in r2.collect()}
    assert v2 == 1
    n_companies = len(rows1)
    for cid, r in rows2.items():
        # trained on run 1's OTHER companies only (cap 50)
        assert r.n_training == min(50, n_companies - 1), (cid, r)

    # recomputing SEM from the pinned v0 snapshot reproduces run 2's
    # training counts even AFTER run 2's rows were committed
    sem_again = {
        r.company_id: r.n_training
        for r in sem_from_history(
            t.read(spark, 0), t.read(spark, 1).select("company_id")
        ).collect()
    }
    for cid, r in rows2.items():
        assert sem_again[cid] == r.n_training

    # and the table now holds both runs' rows
    per_run = {
        r.scored_at: r.n
        for r in t.read(spark).groupBy("scored_at").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_run == {1: n_companies, 2: n_companies}


def test_compact_preserves_data_reduces_files(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    for i in range(4):  # 4 append commits -> >= 4 small files
        t.write(_df(spark, [(i, f"v{i}")]), mode="append")
    before = len(t._read_manifest(t.latest_version())["files"])
    v = t.compact(spark, target_files=1)
    after = t._read_manifest(v)["files"]
    assert len(after) == 1 and before >= 4
    assert sorted(r.k for r in t.read(spark).collect()) == [0, 1, 2, 3]
    # the pre-compaction version is still readable (time travel intact)
    assert sorted(r.k for r in t.read(spark, v - 1).collect()) == [0, 1, 2, 3]


def test_vacuum_drops_old_versions_keeps_current(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    t.write(_df(spark, [(2, "b")]), mode="overwrite")  # v1 orphans v0's files
    t.write(_df(spark, [(3, "c")]), mode="append")  # v2 shares v1's files
    removed = t.vacuum(keep_last=2)  # keep v1, v2
    assert removed  # v0's files are referenced by nobody -> deleted
    assert [m["version"] for m in t.history()] == [1, 2]
    assert sorted(r.k for r in t.read(spark).collect()) == [2, 3]
    assert sorted(r.k for r in t.read(spark, 1).collect()) == [2]
    import pytest

    with pytest.raises(FileNotFoundError):
        t._read_manifest(0)


def test_data_files_are_immutable_across_commits(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    files_v0 = set(t._read_manifest(0)["files"])
    mtimes = {f: os.path.getmtime(f) for f in files_v0}
    t.write(_df(spark, [(2, "b")]), mode="append")
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m  # never rewritten in place
