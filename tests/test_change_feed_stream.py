"""ChangeFeedStream laws (r11, VERDICT task 3 — the Delta-CDF
``readStream`` analog): checkpointed per-commit CDF delivery with
exactly-once semantics across restarts, the fold law (applying every
delivered diff onto the first snapshot reproduces the head, and equals
the consolidated ``table_changes``), and the wiring into a maintained
view with the ``to_version``-as-batch-id idempotence fence."""

from __future__ import annotations

import os

import pytest

from tabular_cdc_bootstrapper_spark.operators.cdc import apply_changelog
from tabular_cdc_bootstrapper_spark.streaming.pipeline import (
    ChangeFeedStream,
    MaintainedAggView,
    ParquetStateTable,
    VersionedBucketMirror,
    table_changes,
)


def _named(spark, pairs):
    return spark.createDataFrame(pairs, "id long, name string")


def _make(spark, tmp_path, layout):
    if layout == "snapshot":
        t = ParquetStateTable(str(tmp_path / "t"), keep_versions=10)
        t.commit(_named(spark, [(0, "a"), (1, "b"), (2, "c")]))
        t.commit(_named(spark, [(0, "A"), (1, "b"), (3, "d")]))
        t.commit(_named(spark, [(1, "B"), (3, "d"), (4, "e")]))
    else:
        from tabular_cdc_bootstrapper_spark.config import CdcTarget

        def b(rows):
            return spark.createDataFrame(
                rows, "id long, name string, ts long, op string"
            )

        target = CdcTarget(
            source_uri="file:///x", key_column="id", ts_column="ts"
        )
        t = VersionedBucketMirror(
            str(tmp_path / "t"), n_buckets=4, key_col="id", keep_versions=10
        )
        t.initialize(b([(0, "a", 0, "I"), (1, "b", 0, "I"), (2, "c", 0, "I")]))
        t.merge_batch(
            b([(0, "A", 1, "U"), (2, "c", 1, "D"), (3, "d", 1, "I")]), target
        )
        t.merge_batch(
            b([(0, "A", 2, "D"), (1, "B", 2, "U"), (4, "e", 2, "I")]), target
        )
    return t


def _fold(spark, state_df, diff):
    log = state_df.selectExpr("id", "name", "'I' AS op", "0 AS seq")
    return apply_changelog(
        log.unionByName(diff.selectExpr("id", "name", "op", "1 AS seq")),
        key_cols="id",
        ts_cols="seq",
        drop_envelope=["op", "seq"],
    )


def _pairs(df):
    return {(r.id, r.name) for r in df.select("id", "name").collect()}


@pytest.mark.parametrize("layout", ["snapshot", "bucketed_versioned"])
def test_per_commit_delivery_and_fold_law(spark, tmp_path, layout):
    t = _make(spark, tmp_path, layout)
    drop = () if layout == "snapshot" else ("op", "ts", "_src_file")
    feed = ChangeFeedStream(
        t, key_cols="id", checkpoint_path=str(tmp_path / "ckpt.json"),
        drop_cols=drop,
    )
    state = t.read_version(spark, 0).select("id", "name")
    windows = []

    def apply(diff, f, to):
        nonlocal state
        windows.append((f, to))
        state = _fold(spark, state, diff)

    done = feed.process_available(spark, apply)
    versions = [e["version"] for e in t._log.committed()]
    assert done == windows == list(zip(versions[:-1], versions[1:]))
    # fold law: per-commit diffs compose to the head state...
    head = t.read(spark).select("id", "name")
    assert _pairs(state) == _pairs(head)
    # ...and to the consolidated table_changes applied in one step
    one = table_changes(
        spark, t, versions[0], versions[-1], key_cols="id", drop_cols=drop
    )
    assert _pairs(
        _fold(spark, t.read_version(spark, 0).select("id", "name"), one)
    ) == _pairs(head)
    # caught up: nothing pending until the next commit
    assert feed.pending(spark) is None


def test_restart_semantics_exactly_once(spark, tmp_path):
    t = _make(spark, tmp_path, "snapshot")
    ckpt = str(tmp_path / "ckpt.json")
    feed = ChangeFeedStream(t, key_cols="id", checkpoint_path=ckpt)
    diff, f, to = feed.pending(spark)
    got1 = {(r.id, r.op) for r in diff.collect()}
    # crash BEFORE ack: a fresh consumer on the same checkpoint
    # redelivers the identical window
    feed2 = ChangeFeedStream(t, key_cols="id", checkpoint_path=ckpt)
    diff2, f2, to2 = feed2.pending(spark)
    assert (f2, to2) == (f, to)
    assert {(r.id, r.op) for r in diff2.collect()} == got1
    # ack: the window is never redelivered, the next one surfaces
    feed2.ack(to2)
    diff3, f3, to3 = ChangeFeedStream(
        t, key_cols="id", checkpoint_path=ckpt
    ).pending(spark)
    assert f3 == to2 and to3 > to2


def test_consolidated_catchup_is_one_window(spark, tmp_path):
    t = _make(spark, tmp_path, "snapshot")
    feed = ChangeFeedStream(
        t, key_cols="id", checkpoint_path=str(tmp_path / "c.json")
    )
    versions = [e["version"] for e in t._log.committed()]
    done = feed.process_available(spark, lambda *a: None, consolidate=True)
    assert done == [(versions[0], versions[-1])]


def test_from_version_tails_new_changes_only(spark, tmp_path):
    t = _make(spark, tmp_path, "snapshot")
    head = t.current()["version"]
    feed = ChangeFeedStream(
        t,
        key_cols="id",
        checkpoint_path=str(tmp_path / "c.json"),
        from_version=head,
    )
    assert feed.pending(spark) is None
    t.commit(_named(spark, [(1, "B"), (9, "z")]))
    diff, f, to = feed.pending(spark)
    assert (f, to) == (head, head + 1)
    assert {(r.id, r.op) for r in diff.collect()} == {
        (3, "D"), (4, "D"), (9, "I"),
    }


def test_wired_maintained_view_with_replay_fence(spark, tmp_path):
    """The change feed drives a MaintainedAggView: ``to_version`` is the
    batch id, so a redelivered window (crash before ack) is skipped by
    the view's fence and the view still equals the direct aggregate of
    the head — end-to-end exactly-once effects."""
    t = _make(spark, tmp_path, "snapshot")
    ckpt = str(tmp_path / "ckpt.json")
    view = MaintainedAggView(
        str(tmp_path / "view"),
        group_cols="name",
        key_col="id",
        ts_col="seq",
        sum_cols={},
        count_col="n",
    )
    feed = ChangeFeedStream(t, key_cols="id", checkpoint_path=ckpt)

    def apply(diff, f, to):
        view.apply_batch(
            spark,
            diff.selectExpr("id", "name", "op", "1 AS seq"),
            batch_id=to,
            mirror_before=t.read_version(spark, f).select("id", "name"),
        )

    done = feed.process_available(spark, apply)
    assert len(done) == 2
    # simulate a crash before the LAST ack: rewind the checkpoint and
    # re-drain — the view skips the replayed batch id
    feed.ack(done[-1][0])
    redone = feed.process_available(spark, apply)
    assert redone == [done[-1]]
    expected = {
        (r.name, r.n)
        for r in t.read(spark).groupBy("name").count()
        .withColumnRenamed("count", "n").collect()
    }
    got = {(r.name, r.n) for r in view.read(spark).collect()}
    assert got == expected
