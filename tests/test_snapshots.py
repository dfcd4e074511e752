"""Versioned-parquet snapshot layer: isolation, time travel, rollback,
vacuum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from climate_data_pipeline_spark.sources.snapshots import (
    snapshot_read,
    snapshot_rollback,
    snapshot_write,
    table_versions,
    vacuum,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"),
                                      (F.col("id") * 2).alias("v"))


def test_append_versions_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    m1 = snapshot_write(_df(spark, 0, 10), t)
    m2 = snapshot_write(_df(spark, 10, 15), t)
    assert (m1["version"], m2["version"]) == (1, 2)
    assert snapshot_read(spark, t).count() == 15          # latest
    assert snapshot_read(spark, t, version=1).count() == 10  # time travel
    assert table_versions(t) == [1, 2]


def test_overwrite_keeps_old_version_readable(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 10), t)
    snapshot_write(_df(spark, 100, 103), t, mode="overwrite")
    assert snapshot_read(spark, t).count() == 3
    assert snapshot_read(spark, t, version=1).count() == 10


def test_uncommitted_files_invisible(spark, tmp_path):
    """Snapshot isolation: parquet dropped into data/ without a commit
    never appears."""
    import os
    t = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 5), t)
    rogue = os.path.join(t, "data", "rogue")
    _df(spark, 1000, 2000).write.parquet(rogue)
    assert snapshot_read(spark, t).count() == 5


def test_rollback_is_roll_forward(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 10), t)
    snapshot_write(_df(spark, 10, 20), t)
    m = snapshot_rollback(t, 1)
    assert m["version"] == 3 and m["operation"] == "rollback-to-v1"
    assert snapshot_read(spark, t).count() == 10
    assert snapshot_read(spark, t, version=2).count() == 20  # history intact


def test_vacuum_drops_only_expired_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 10), t)
    snapshot_write(_df(spark, 100, 103), t, mode="overwrite")
    deleted = vacuum(t, keep_versions=1)
    assert deleted                                  # v1-only files removed
    assert table_versions(t) == [2]
    assert snapshot_read(spark, t).count() == 3     # live version untouched
    with pytest.raises(ValueError):
        snapshot_read(spark, t, version=1)


def test_snapshot_merge_and_diff(spark, tmp_path):
    from climate_data_pipeline_spark.sources.snapshots import (
        snapshot_diff, snapshot_merge)

    t = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 5), t)                      # ids 0..4, v=2id
    upd = spark.createDataFrame([(3, 999), (100, 7)], "id long, v long")
    m = snapshot_merge(spark, t, upd, keys=["id"])
    assert m["version"] == 2
    got = {r["id"]: r["v"] for r in snapshot_read(spark, t).collect()}
    assert got[3] == 999 and got[100] == 7 and got[0] == 0 and len(got) == 6
    # CDC between v1 and v2: update = delete+insert, plus the new row
    changes = {(r["id"], r["v"], r["change"])
               for r in snapshot_diff(spark, t, 1, 2).collect()}
    assert changes == {(3, 999, "insert"), (100, 7, "insert"),
                       (3, 6, "delete")}


def test_vacuum_zero_keep_and_orphans(spark, tmp_path):
    """Regression: keep_versions=0 drops EVERYTHING (the [:-0] empty
    slice made it a silent no-op), and remove_orphans reclaims crashed
    writers' unreferenced batch dirs and stale .tmp manifests."""
    import os

    from climate_data_pipeline_spark.sources import snapshots as SN

    t = str(tmp_path / "tbl")
    df = spark.range(5).withColumnRenamed("id", "k")
    SN.snapshot_write(df, t)
    SN.snapshot_write(df, t)
    # simulate a crashed writer: an uncommitted batch dir + tmp manifest
    orphan = os.path.join(t, "data", "deadbeef")
    os.makedirs(orphan)
    open(os.path.join(orphan, "part-x.parquet"), "wb").write(b"x")
    open(os.path.join(t, "manifests", ".tmp-crashed"), "w").write("{}")
    deleted = SN.vacuum(t, keep_versions=1, remove_orphans=True)
    assert any("deadbeef" in f for f in deleted)
    assert not os.path.exists(orphan)
    assert not os.path.exists(os.path.join(t, "manifests", ".tmp-crashed"))
    assert SN.table_versions(t) == [2]          # newest kept, readable
    assert SN.snapshot_read(spark, t).count() == 10
    # keep_versions=0: every manifest goes
    deleted = SN.vacuum(t, keep_versions=0, remove_orphans=True)
    assert SN.table_versions(t) == []
    assert deleted


def test_commit_publish_is_exclusive(tmp_path):
    """The manifest publish must be atomic AND exclusive — a second
    commit of the same version number raises instead of clobbering."""
    import pytest as _pt

    from climate_data_pipeline_spark.sources.snapshots import _commit

    t = str(tmp_path / "tbl2")
    _commit(t, 1, ["a.parquet"], None, "append")
    with _pt.raises(RuntimeError, match="concurrent commit"):
        _commit(t, 1, ["b.parquet"], None, "append")
