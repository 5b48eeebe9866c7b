"""icelite branches — write-audit-publish (Iceberg's branch refs).

A branch commits through the same optimistic gen-file CAS as main, in a
branch-scoped generation namespace, so main is untouched until
``fast_forward`` hard-links the branch's generation files into main's
namespace (the same put-if-absent CAS deciding publication atomically).
The reference has no storage layer (inputs are in-memory arrays,
reference tests/test_pcm.py:10); this guards the engine's own claimed
Iceberg-semantics surface.
"""

import os

import pytest

from hdstats_spark.icelite import CommitConflict, IceliteTable

SCHEMA = "k int, v string, day string"


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _vals(t, spark, **kw):
    return sorted((r.k, r.v) for r in t.read(spark, **kw).collect())


def test_wap_stage_audit_publish(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "b1"))
    t.append(_mk(spark, [(1, "a", "d1")]), partition_col="day")
    t.create_branch("staging")
    with pytest.raises(FileExistsError):
        t.create_branch("staging")
    # stage two commits on the branch: main is completely unaffected
    t.append(_mk(spark, [(2, "b", "d1")]), partition_col="day", branch="staging")
    t.append(_mk(spark, [(3, "c", "d2")]), partition_col="day", branch="staging")
    assert _vals(t, spark) == [(1, "a")]
    assert _vals(t, spark, ref="staging") == [(1, "a"), (2, "b"), (3, "c")]
    assert set(t.branches()) == {"staging"}
    # audit passed -> publish: main advances to the branch head atomically
    head = t.fast_forward("staging")
    assert head.snapshot_id == t.current_snapshot_id("staging")
    assert _vals(t, spark) == [(1, "a"), (2, "b"), (3, "c")]
    # idempotent re-run; post-publish main commits continue the chain
    assert t.fast_forward("staging").snapshot_id == head.snapshot_id
    t.drop_branch("staging")
    s = t.append(_mk(spark, [(4, "d", "d1")]), partition_col="day")
    assert s.seq == head.seq + 1
    assert _vals(t, spark) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_fast_forward_conflicts_when_main_moved(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "b2"))
    t.append(_mk(spark, [(1, "a", "d1")]), partition_col="day")
    t.create_branch("wap")
    t.append(_mk(spark, [(2, "b", "d1")]), partition_col="day", branch="wap")
    # a concurrent MAIN commit lands after the fork
    t.append(_mk(spark, [(9, "z", "d1")]), partition_col="day")
    with pytest.raises(CommitConflict, match="fast-forward"):
        t.fast_forward("wap")
    # main kept its own history; the branch is still independently readable
    assert _vals(t, spark) == [(1, "a"), (9, "z")]
    assert _vals(t, spark, ref="wap") == [(1, "a"), (2, "b")]


def test_branch_seq_collision_with_main_is_safe(spark, tmp_path):
    """A branch commit and a main commit share seq numbers in disjoint gen
    namespaces; dropping the branch and expiring must not touch main's
    generation files (content-checked unlink)."""
    t = IceliteTable(str(tmp_path / "b3"))
    t.append(_mk(spark, [(1, "a", "d1")]), partition_col="day")
    t.create_branch("tmp")
    t.append(_mk(spark, [(2, "b", "d1")]), partition_col="day", branch="tmp")  # seq 2
    t.append(_mk(spark, [(3, "c", "d1")]), partition_col="day")  # main seq 2
    bhead = t.current_snapshot_id("tmp")
    t.drop_branch("tmp")
    with pytest.raises(KeyError):
        t.drop_branch("tmp")
    res = t.expire_snapshots(keep_last=2)
    # the dropped branch's snapshot is reaped, its files gone, main intact
    assert res["snapshots_removed"] == 1
    with pytest.raises(FileNotFoundError):
        t.snapshot(bhead)
    assert bhead not in {s.snapshot_id for s in t.snapshots()}
    assert _vals(t, spark) == [(1, "a"), (3, "c")]
    # the main gen chain survives a hint-less probe (content check worked)
    os.unlink(os.path.join(t.meta_dir, "current"))
    assert t.current_snapshot_id() is not None
    assert _vals(t, spark) == [(1, "a"), (3, "c")]


def test_branch_survives_expiry_of_main_prefix(spark, tmp_path):
    t = IceliteTable(str(tmp_path / "b4"))
    t.append(_mk(spark, [(1, "a", "d1")]), partition_col="day")
    t.create_branch("keepme")
    t.append(_mk(spark, [(2, "b", "d1")]), partition_col="day", branch="keepme")
    # main moves on twice; expire keeps only the newest main snapshot
    t.overwrite_partitions(_mk(spark, [(1, "x", "d1")]), "day")
    t.append(_mk(spark, [(5, "y", "d2")]), partition_col="day")
    t.expire_snapshots(keep_last=1)
    # the branch chain is pinned: still readable verbatim (island rule
    # checkpoints its oldest commit when fork-side ancestors expire)
    assert _vals(t, spark, ref="keepme") == [(1, "a"), (2, "b")]
    # and a stale branch can no longer fast-forward (main moved)
    with pytest.raises(CommitConflict):
        t.fast_forward("keepme")


def test_stream_tails_a_branch(spark, tmp_path):
    """readStream option("branch") follows the staging branch's commits;
    main commits never enter the stream."""
    from pyspark.sql import functions as F

    from hdstats_spark.icelite_source import register

    register(spark)
    t = IceliteTable(str(tmp_path / "bs"))
    t.append(_mk(spark, [(1, "base", "d1")]), partition_col="day")
    t.create_branch("staging")
    t.append(_mk(spark, [(2, "staged", "d1")]), partition_col="day", branch="staging")
    t.append(_mk(spark, [(9, "mainonly", "d1")]), partition_col="day")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("icelite")
        .option("branch", "staging")
        .load(t.root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    assert sorted(r.v for r in got.collect()) == ["base", "staged"]
    assert got.filter(F.col("v") == "mainonly").count() == 0
