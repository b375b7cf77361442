"""Manifest-log table format: snapshot isolation, time travel, optimistic
concurrency, expiry (sources/snapshots.py — the native stand-in for the
reference's Iceberg fork feature, serde/mod.rs:90)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datafusion_ballista_dhruvil_spark.sources.snapshots import (
    CommitConflict,
    commit,
    expire_snapshots,
    history,
    read_snapshot,
)


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def test_append_overwrite_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    v0 = commit(_df(spark, 0, 10, "a"), root, "append")
    v1 = commit(_df(spark, 10, 15, "b"), root, "append")
    v2 = commit(_df(spark, 100, 103, "c"), root, "overwrite")
    assert (v0, v1, v2) == (0, 1, 2)

    assert read_snapshot(spark, root, version=0).count() == 10
    assert read_snapshot(spark, root, version=1).count() == 15
    assert read_snapshot(spark, root).count() == 3  # latest = overwrite

    # snapshot isolation: v1's row set is exactly append(0-10) + (10-15)
    ids = sorted(r.id for r in read_snapshot(spark, root, version=1).collect())
    assert ids == list(range(15))

    # time travel by timestamp: as-of v1's commit time resolves to v1
    h = history(root)
    assert [s["snapshot_id"] for s in h] == [0, 1, 2]
    assert read_snapshot(spark, root, as_of_ts_ms=h[1]["ts_ms"]).count() == 15
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, as_of_ts_ms=h[0]["ts_ms"] - 10_000)


def test_old_reader_unaffected_by_new_commits(spark, tmp_path):
    """Immutable files + whole-manifest swaps: a plan built against v0
    returns v0's rows even after an overwrite commits underneath it."""
    root = str(tmp_path / "t")
    commit(_df(spark, 0, 8, "a"), root, "append")
    old = read_snapshot(spark, root, version=0)
    commit(_df(spark, 50, 51, "b"), root, "overwrite")
    assert old.count() == 8
    assert read_snapshot(spark, root).count() == 1


def test_append_race_retries_overwrite_race_aborts(spark, tmp_path, monkeypatch):
    """Inject a racer that commits AFTER our writer reads the head but
    BEFORE it publishes: append must retry onto the new head (keeping the
    racer's files), overwrite must abort with CommitConflict."""
    import json as _json

    import datafusion_ballista_dhruvil_spark.sources.snapshots as snap

    root = str(tmp_path / "t")
    commit(_df(spark, 0, 5, "a"), root, "append")

    real_list = snap._list_snapshots

    def racing_list(r, _state={"fired": False}):
        snaps = real_list(r)
        if not _state["fired"]:
            _state["fired"] = True
            head = snaps[-1]
            winner = {
                "snapshot_id": head + 1,
                "parent_id": head,
                "ts_ms": 0,
                "op": "append",
                "files": snap._read_manifest(r, head)["files"],
                "schema": "{}",
            }
            with open(snap._log_path(r, head + 1), "w") as f:
                _json.dump(winner, f)
        return snaps  # stale view: does NOT include the racer's commit

    # append loses the race for id 1, retries, and lands as snapshot 2 —
    # stacked on the racer's file set plus its own
    monkeypatch.setattr(snap, "_list_snapshots", racing_list)
    v = commit(_df(spark, 5, 9, "b"), root, "append")
    assert v == 2
    assert read_snapshot(spark, root, version=2).count() == 9

    # overwrite hitting the same interleaving must abort loudly
    monkeypatch.setattr(
        snap, "_list_snapshots", lambda r: racing_list(r, {"fired": False})
    )
    with pytest.raises(CommitConflict):
        commit(_df(spark, 0, 1, "c"), root, "overwrite")


def test_expire_snapshots_keeps_live_files(spark, tmp_path):
    root = str(tmp_path / "t")
    commit(_df(spark, 0, 10, "a"), root, "append")
    commit(_df(spark, 10, 20, "b"), root, "append")
    commit(_df(spark, 100, 104, "c"), root, "overwrite")

    stats = expire_snapshots(root, keep_last=1)
    assert stats["removed_snapshots"] == 2
    assert stats["removed_files"] > 0
    # head still reads perfectly; expired versions are gone
    assert read_snapshot(spark, root).count() == 4
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, version=0)


def test_schema_evolution_recorded(spark, tmp_path):
    root = str(tmp_path / "t")
    commit(_df(spark, 0, 3, "a"), root, "append")
    wider = _df(spark, 3, 6, "b").withColumn("extra", F.lit(7))
    commit(wider, root, "overwrite")
    h = history(root)
    assert h[-1]["op"] == "overwrite"
    assert "extra" in read_snapshot(spark, root).columns


def test_empty_snapshot_reads_as_typed_empty(spark, tmp_path):
    root = str(tmp_path / "t")
    commit(_df(spark, 0, 0, "a"), root, "append")  # zero rows staged
    df = read_snapshot(spark, root)
    # parquet writer still emits a (possibly empty) file set; either way
    # the read must be empty with the committed schema
    assert df.count() == 0
    assert set(df.columns) == {"id", "tag"}


def test_snapshot_diff_change_data_feed(spark, tmp_path):
    from pyspark.sql import functions as F

    from datafusion_ballista_dhruvil_spark.sources.snapshots import snapshot_diff

    root = str(tmp_path / "t")
    base = spark.range(0, 10).select("id", (F.col("id") * 2).alias("v"))
    commit(base, root, "append")
    nxt = (
        spark.range(2, 12)  # drops 0,1; adds 10,11
        .select("id", (F.col("id") * 2).alias("v"))
        .withColumn("v", F.when(F.col("id") == 5, 999).otherwise(F.col("v")))
    )
    commit(nxt, root, "overwrite")

    d = {r.id: r._change_type for r in snapshot_diff(spark, root, 0, 1, "id").collect()}
    assert d[0] == "removed" and d[1] == "removed"
    assert d[10] == "added" and d[11] == "added"
    assert d[5] == "changed"
    assert d[3] == "unchanged"
    assert len(d) == 12


def test_incremental_mv_refresh_via_change_feed(spark, tmp_path):
    """Materialized-view maintenance from the change feed: refresh ONLY
    the aggregate groups touched by changed keys and splice them into the
    old MV — must equal a full recompute. At 100 TB this is the
    difference between re-aggregating the lake and re-aggregating the
    day's delta."""
    from pyspark.sql import functions as F

    from datafusion_ballista_dhruvil_spark.sources.snapshots import snapshot_diff

    root = str(tmp_path / "t")
    v0 = spark.range(0, 1000).select(
        "id", F.expr("id div 100").alias("grp"), (F.col("id") * 3).alias("val")
    )
    commit(v0, root, "append")
    # v1: drop ids 0-49, change vals for grp-7 members, add 1000-1099
    v1 = (
        spark.range(50, 1100)
        .select("id", F.expr("id div 100").alias("grp"), (F.col("id") * 3).alias("val"))
        .withColumn(
            "val", F.when(F.col("grp") == 7, F.col("val") + 1).otherwise(F.col("val"))
        )
    )
    commit(v1, root, "overwrite")

    def mv_of(df):
        return df.groupBy("grp").agg(F.sum("val").alias("s"))

    old_mv = mv_of(read_snapshot(spark, root, version=0))

    changed = snapshot_diff(spark, root, 0, 1, "id").where(
        F.col("_change_type") != "unchanged"
    )
    both = read_snapshot(spark, root, version=0).unionAll(
        read_snapshot(spark, root, version=1)
    )
    affected = (
        changed.join(both, "id").select("grp").distinct()
    )
    fresh = mv_of(
        read_snapshot(spark, root, version=1).join(
            F.broadcast(affected), "grp"
        )
    )
    incremental = old_mv.join(
        F.broadcast(affected), "grp", "left_anti"
    ).unionAll(fresh)

    full = mv_of(read_snapshot(spark, root, version=1))
    assert sorted(map(tuple, incremental.collect())) == sorted(
        map(tuple, full.collect())
    )
    # the refresh really was partial: some groups came from the old MV
    n_affected = affected.count()
    assert 0 < n_affected < 11  # grps {0 (drop), 7 (change), 10 (add)} of 11


def test_cleanup_orphans_removes_only_unreferenced(spark, tmp_path):
    """A crashed writer's staged-but-unpublished files are garbage; live
    snapshot data must survive the sweep untouched."""
    import os as _os

    import datafusion_ballista_dhruvil_spark.sources.snapshots as snap

    root = str(tmp_path / "t")
    commit(_df(spark, 0, 10, "a"), root, "append")
    # simulate a crash: stage files but never publish a manifest
    orphans = snap._stage_files(_df(spark, 50, 60, "x"), root)
    assert orphans

    stats = snap.cleanup_orphans(root)
    assert stats["removed_dirs"] == 1
    assert not _os.path.exists(_os.path.join(root, _os.path.dirname(orphans[0])))
    # live table unaffected
    assert read_snapshot(spark, root).count() == 10
    # idempotent
    assert snap.cleanup_orphans(root)["removed_dirs"] == 0
