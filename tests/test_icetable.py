"""IceTable snapshot-log table format: atomic commits, time travel,
rollback, idempotent resume keys, manifest min/max file skipping, vacuum.

Reference parity: the reference has no table layer (flat CSV via
logai/dataloader/file_data_loader.py); this is the north-rule Iceberg
semantics evidenced without the runtime jar (see sources/icetable.py)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from logai_spark.sources import icetable as it


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc-"), F.col("id")).alias("text"),
    )


def test_append_time_travel_and_isolation(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = it.append(_docs(spark, 0, 10), t, stats_cols=["doc_id"])
    v2 = it.append(_docs(spark, 10, 30), t, stats_cols=["doc_id"])
    assert (v1, v2) == (1, 2)
    # latest sees both commits; pinned v1 is isolated from the append
    assert it.read(spark, t).count() == 30
    assert it.read(spark, t, snapshot=1).count() == 10
    # rows, not just counts
    got = sorted(r.doc_id for r in it.read(spark, t, snapshot=1).collect())
    assert got == list(range(10))
    hist = it.snapshots(t)
    assert [s["version"] for s in hist] == [1, 2]
    assert hist[1]["parent"] == 1
    assert hist[1]["total_rows"] == 30


def test_overwrite_and_rollback_nondestructive(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_docs(spark, 0, 10), t)
    it.overwrite(_docs(spark, 100, 105), t)
    assert it.read(spark, t).count() == 5
    v3 = it.rollback(t, to_version=1)
    assert v3 == 3  # rollback is a NEW snapshot, history intact
    assert it.read(spark, t).count() == 10
    assert it.read(spark, t, snapshot=2).count() == 5  # still readable


def test_idempotent_commit_key_resume(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = it.append(_docs(spark, 0, 10), t, commit_key="stage-3")
    v1b = it.append(_docs(spark, 0, 10), t, commit_key="stage-3")  # re-run
    assert v1 == v1b == 1
    assert it.read(spark, t).count() == 10  # no duplicate rows
    assert it.current_version(t) == 1


def test_manifest_file_skipping(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # 4 commits with disjoint doc_id ranges -> 4+ files with tight min/max
    for lo in (0, 100, 200, 300):
        it.append(
            _docs(spark, lo, lo + 50).coalesce(1), t, stats_cols=["doc_id"]
        )
    all_files = it.plan_files(t)
    pruned = it.plan_files(t, between=("doc_id", 210, 220))
    assert len(pruned) < len(all_files)
    assert len(pruned) == 1
    # pruning never changes results: same rows as a full-scan filter
    fast = it.read(spark, t, between=("doc_id", 210, 220))
    slow = it.read(spark, t).filter(F.col("doc_id").between(210, 220))
    assert sorted(r.doc_id for r in fast.collect()) == sorted(
        r.doc_id for r in slow.collect()
    )


def test_skipping_conservative_without_stats(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_docs(spark, 0, 50).coalesce(1), t)  # no stats_cols
    # cannot prune safely -> keeps the file, filter still correct
    assert it.plan_files(t, between=("doc_id", 999, 1000)) == it.plan_files(t)
    assert it.read(spark, t, between=("doc_id", 10, 12)).count() == 3


def test_crash_debris_invisible_and_vacuumed(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_docs(spark, 0, 10), t)
    # simulate a crash mid-commit: staged data, no snapshot published
    stage = os.path.join(t, "data", "commit-99")
    _docs(spark, 500, 600).write.parquet(stage)
    assert it.read(spark, t).count() == 10  # readers never see it
    removed = it.vacuum(t)
    assert removed == [stage]
    assert not os.path.exists(stage)
    assert it.read(spark, t).count() == 10


def test_commit_pointer_is_last_to_move(spark, tmp_path):
    t = str(tmp_path / "tbl")
    it.append(_docs(spark, 0, 10), t)
    # snapshot v2 json present but pointer still at 1 == uncommitted
    snap1 = json.load(open(os.path.join(t, "metadata", "v1.json")))
    with open(os.path.join(t, "metadata", "v2.json"), "w") as fp:
        json.dump({**snap1, "version": 2, "parent": 1}, fp)
    assert it.current_version(t) == 1
    assert it.read(spark, t).count() == 10
    # optimistic concurrency: next committer collides on v2's exclusive
    # create and surfaces the conflict instead of clobbering
    with pytest.raises(FileExistsError):
        it.append(_docs(spark, 10, 20), t)


def test_empty_and_missing_snapshots(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert it.current_version(t) == 0
    assert it.snapshots(t) == []
    with pytest.raises(ValueError):
        it.read(spark, t)
    it.append(_docs(spark, 0, 5), t)
    with pytest.raises(ValueError):
        it.read(spark, t, snapshot=7)


def test_catalog_routes_icetable(spark, tmp_path):
    # write_table(snapshots=True) -> IceTable; read_table auto-detects it
    from logai_spark.sources.catalog import read_table, write_table

    t = str(tmp_path / "cat_tbl")
    fmt = write_table(_docs(spark, 0, 10), t, snapshots=True, commit_key="a")
    assert fmt == "icetable"
    # append through the SAME catalog surface (auto-detected, no flag)
    assert write_table(_docs(spark, 10, 20), t, mode="append") == "icetable"
    assert read_table(spark, t).count() == 20
    assert read_table(spark, t, snapshot=1).count() == 10
    # idempotent resume through the catalog surface
    write_table(_docs(spark, 0, 10), t, mode="append", commit_key="a")
    assert read_table(spark, t).count() == 20
    # plain-parquet behavior unchanged when snapshots not requested
    p = str(tmp_path / "plain")
    assert write_table(_docs(spark, 0, 5), p) == "parquet"
    assert read_table(spark, p).count() == 5
