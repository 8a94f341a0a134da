"""Persisted ANN index lifecycle (VERDICT r7 #3/#4): build-once/query-many
result identity, no-corpus-no-retrain query plans, delta-sized appends
with the incremental==rebuilt twin law, drift trigger, replay fence."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tabular_cdc_bootstrapper_spark.functions.ann_index import (
    AnnIndex,
    MaintainedAnnIndex,
    append_to_index,
    ann_query,
    build_ann_index,
)
from tabular_cdc_bootstrapper_spark.functions.similarity import ivf_pq_topk
from tabular_cdc_bootstrapper_spark.plans.inspect import physical_plan


def _rows(df):
    return sorted(
        (r["qid"], r["vec_id"], r["cos_sim"], r["rn"]) for r in df.collect()
    )


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def built(spark, emb, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ann_index"))
    idx = build_ann_index(
        spark, emb, root, n_centroids=64, n_subspaces=8, n_codes=16, dim=64
    )
    return idx


def test_prebuilt_matches_inline_ivf_pq(spark, emb, built):
    """Result identity: the persisted-index query path returns exactly
    what the inline pipeline returns — same models (lowest-id train →
    parquet roundtrip is exact), same encoder UDF, same ADC fold, same
    rerank dots over the stored covering column."""
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    inline = ivf_pq_topk(emb, q, k=10)
    prebuilt = ann_query(spark, built, q, k=10)
    assert _rows(prebuilt) == _rows(inline)


def test_ann_query_touches_only_index_tables(spark, built):
    """The amortized-path contract: ann_query's plan must scan the index
    tables (model via bounded driver collect, codes via parquet) and the
    caller's query frame ONLY — no corpus parquet scan, no training
    stage. Queries come from a local frame here so ANY parquet scan in
    the plan must point inside the index root."""
    q = spark.createDataFrame(
        [(9001, [float(i % 7) / 7.0 for i in range(64)])],
        "qid long, embedding array<double>",
    )
    df = ann_query(spark, built, q, k=5)
    plan = physical_plan(df)
    import re

    locations = re.findall(r"Location: [^\[]*\[([^\]]*)\]", plan)
    assert locations, plan
    for loc in locations:
        assert built.root in loc, f"non-index scan in ann_query plan: {loc}"
    assert df.count() == 5


def test_append_twin_law_incremental_equals_rebuilt(spark, emb, tmp_path):
    """The maintenance twin law: build(part1) + append(part2) answers
    queries identically to build(full), when the split leaves the
    training sample (lowest ids) in part1 — the standing-model regime
    the incremental path is FOR. Segments stay delta-sized: the append
    writes one new segment, leaving the base untouched."""
    n = emb.count()
    cut = max(100, int(n * 0.7))
    part1 = emb.filter(F.col("vec_id") < cut)
    part2 = emb.filter(F.col("vec_id") >= cut)
    assert part2.count() > 0

    inc = build_ann_index(
        spark, part1, str(tmp_path / "inc"),
        n_centroids=64, n_subspaces=8, n_codes=16, dim=64,
    )
    report = append_to_index(spark, inc, part2)
    assert report["n_appended"] == part2.count()
    assert len(inc.codes.current()["segments"]) == 2

    full = build_ann_index(
        spark, emb, str(tmp_path / "full"),
        n_centroids=64, n_subspaces=8, n_codes=16, dim=64,
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    assert _rows(ann_query(spark, inc, q, k=10)) == _rows(
        ann_query(spark, full, q, k=10)
    )


def test_drift_trigger_fires_on_distribution_shift(spark, tmp_path):
    """The retrain criterion is MEASURED, not guessed: an append drawn
    from the build distribution keeps needs_retrain False; an append
    from a shifted distribution (axis-aligned spikes vs the smooth build
    vectors) drives quantization error past the threshold."""
    dim = 16

    def vecs(ids, fn):
        return spark.createDataFrame(
            [(i, [float(fn(i, j)) for j in range(dim)]) for i in ids],
            "vec_id long, embedding array<double>",
        )

    base = vecs(range(200), lambda i, j: 1.0 + ((i + j) % 5) * 0.01)
    idx = build_ann_index(
        spark, base, str(tmp_path / "drift"),
        n_centroids=8, n_subspaces=4, n_codes=8, dim=dim,
    )
    same = append_to_index(
        spark, idx, vecs(range(200, 240), lambda i, j: 1.0 + ((i + j) % 5) * 0.01)
    )
    assert same["needs_retrain"] is False
    shifted = append_to_index(
        spark, idx, vecs(range(300, 340), lambda i, j: 1.0 if j == i % dim else 0.0)
    )
    assert shifted["batch_qerr"] > same["batch_qerr"]
    assert shifted["needs_retrain"] is True


def test_maintained_index_replay_fence(spark, tmp_path):
    """foreachBatch idempotency (the MaintainedClusterView discipline):
    re-applying an already-committed batch id is a no-op — no duplicate
    segment, no double-count."""
    dim = 16
    base = spark.createDataFrame(
        [(i, [float((i + j) % 3) for j in range(dim)]) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    root = str(tmp_path / "maintained")
    build_ann_index(
        spark, base, root, n_centroids=4, n_subspaces=4, n_codes=4, dim=dim
    )
    view = MaintainedAnnIndex(root)
    batch = spark.createDataFrame(
        [(i, [float((i + j) % 3) for j in range(dim)]) for i in range(100, 120)],
        "vec_id long, embedding array<double>",
    )
    r1 = view.apply_batch(spark, batch, batch_id=1)
    assert r1["n_appended"] == 20
    n_segments = len(view.index.codes.current()["segments"])
    r2 = view.apply_batch(spark, batch, batch_id=1)
    assert r2 == {"skipped_replay": True, "batch_id": 1}
    assert len(view.index.codes.current()["segments"]) == n_segments
    assert view.index.codes.read(spark).count() == 120


def test_unbuilt_index_errors_clearly_or_bootstraps(spark, tmp_path):
    """ADVICE r8: applying a batch to a never-built index used to crash
    with TypeError (None["meta"]). Default: a descriptive ValueError;
    with bootstrap=True the first micro-batch builds the index, later
    batches append against the bootstrapped models."""
    import pytest

    from tabular_cdc_bootstrapper_spark.functions.ann_index import (
        append_to_index,
    )

    dim = 16
    batch = spark.createDataFrame(
        [(i, [float((i + j) % 3) for j in range(dim)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    # default path: clear error, not a TypeError
    view = MaintainedAnnIndex(str(tmp_path / "nofence"))
    with pytest.raises(ValueError, match="has not been built"):
        view.apply_batch(spark, batch, batch_id=0)
    with pytest.raises(ValueError, match="has not been built"):
        append_to_index(spark, AnnIndex(str(tmp_path / "nofence")), batch)
    # bootstrap path: first batch builds, second appends, fence holds
    boot = MaintainedAnnIndex(
        str(tmp_path / "boot"),
        bootstrap=True,
        build_opts={"n_subspaces": 4, "n_codes": 4, "dim": dim},
    )
    r0 = boot.apply_batch(spark, batch, batch_id=0)
    assert r0["bootstrap_build"] is True and r0["n_appended"] == 60
    assert boot.index.exists()
    replay = boot.apply_batch(spark, batch, batch_id=0)
    assert replay == {"skipped_replay": True, "batch_id": 0}
    nxt = spark.createDataFrame(
        [(i, [float((i + j) % 3) for j in range(dim)]) for i in range(60, 80)],
        "vec_id long, embedding array<double>",
    )
    r1 = boot.apply_batch(spark, nxt, batch_id=1)
    assert r1["n_appended"] == 20 and "bootstrap_build" not in r1
    assert boot.index.codes.read(spark).count() == 80


def test_manifest_swap_is_atomic_and_prunes(spark, tmp_path):
    """SegmentedTable: replace() installs a single-segment manifest and
    prunes unreferenced segment dirs; update_meta() swaps metadata
    without touching segments."""
    import os

    from tabular_cdc_bootstrapper_spark.functions.ann_index import SegmentedTable

    t = SegmentedTable(str(tmp_path / "seg"))
    df1 = spark.range(10).withColumnRenamed("id", "x")
    t.replace(df1, {"tag": "a"})
    t.append(spark.range(5).withColumnRenamed("id", "x"), {"tag": "b"})
    assert t.read(spark).count() == 15
    assert len(t.current()["segments"]) == 2
    t.update_meta({"extra": 1})
    cur = t.current()
    assert cur["meta"] == {"tag": "b", "extra": 1}
    assert len(cur["segments"]) == 2
    t.replace(spark.range(3).withColumnRenamed("id", "x"), {"tag": "c"})
    assert t.read(spark).count() == 3
    on_disk = [d for d in os.listdir(t.root) if d.startswith("seg-")]
    assert len(on_disk) == 1  # old segments pruned
    # manifest is valid JSON readable by a cold reader
    with open(t._manifest) as fh:
        assert json.load(fh)["meta"]["tag"] == "c"


def test_large_batch_query_path_identical_and_never_broadcasts(spark, emb, built):
    """VERDICT r8 task 8: the shuffle-join query path (the
    batch-inference shape — millions of queries can't broadcast) returns
    EXACTLY what the broadcast path returns, and its plan carries no
    BroadcastExchange (shuffle_hash-hinted on both query-side joins, so
    Catalyst cannot silently re-broadcast)."""
    q = emb.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    small = ann_query(spark, built, q, k=5, broadcast_queries=True)
    large = ann_query(spark, built, q, k=5, broadcast_queries=False)
    assert _rows(large) == _rows(small)
    # both query-side joins (codes⋈queries on list_id, rerank⋈queries on
    # qid) must be shuffle joins — the hint makes re-broadcast of the
    # query side impossible; Catalyst broadcasting the small CODES side
    # at test scale is its business (at warehouse scale codes are huge)
    plan = physical_plan(large)
    assert plan.count("ShuffledHashJoin") >= 2, plan
    # auto knob: below threshold -> broadcast plan; above -> shuffle plan
    auto_small = ann_query(spark, built, q, k=5, broadcast_threshold=1000)
    assert "ShuffledHashJoin" not in physical_plan(auto_small)
    auto_large = ann_query(spark, built, q, k=5, broadcast_threshold=10)
    assert physical_plan(auto_large).count("ShuffledHashJoin") >= 2
    assert _rows(auto_large) == _rows(small)


def test_delete_from_index_purges_and_shares_untouched_segments(
    spark, emb, built, tmp_path
):
    """GDPR purge laws: deleted vec_ids never appear in results or in the
    codes table; segments without purged ids keep their dirs (shared into
    the new manifest); survivors' ranking equals the unpurged ranking
    minus the deleted candidates (standing models untouched)."""
    import shutil

    from tabular_cdc_bootstrapper_spark.functions.ann_index import (
        delete_from_index,
    )

    root = str(tmp_path / "copy")
    shutil.copytree(built.root, root)
    idx = AnnIndex(root)
    # append a second segment so untouched-segment sharing is observable
    extra = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    append_to_index(spark, idx, extra)
    segs_before = list(idx.codes.current()["segments"])
    assert len(segs_before) == 2

    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    before = _rows(ann_query(spark, idx, q, k=10))
    doomed = {v for _, v, _, _ in before[:3]}  # purge some actual hits
    keys = spark.createDataFrame([(v,) for v in sorted(doomed)], "vec_id long")
    out = delete_from_index(spark, idx, keys)
    assert out["segments_rewritten"] >= 1
    segs_after = list(idx.codes.current()["segments"])
    # the appended segment (ids >= 1M, never doomed) is shared unchanged
    assert segs_before[1] in segs_after
    codes_ids = {r["vec_id"] for r in idx.codes.read(spark).select("vec_id").collect()}
    assert not (doomed & codes_ids)
    after = _rows(ann_query(spark, idx, q, k=10))
    assert not any(v in doomed for _, v, _, _ in after)
    # survivors keep their relative order and scores
    surv_before = [(qid, v, s) for qid, v, s, _ in before if v not in doomed]
    surv_after_set = {(qid, v, s) for qid, v, s, _ in after}
    assert set(surv_before) <= surv_after_set
    assert "purged_ts" in idx.codes.current()["meta"]


def test_delete_from_index_empty_and_unbuilt(spark, emb, built, tmp_path):
    import shutil

    import pytest as _pytest

    from tabular_cdc_bootstrapper_spark.functions.ann_index import (
        delete_from_index,
    )

    with _pytest.raises(ValueError, match="has not been built"):
        delete_from_index(
            spark, AnnIndex(str(tmp_path / "nope")),
            spark.createDataFrame([(1,)], "vec_id long"),
        )
    root = str(tmp_path / "copy2")
    shutil.copytree(built.root, root)
    idx = AnnIndex(root)
    segs = list(idx.codes.current()["segments"])
    out = delete_from_index(
        spark, idx, spark.createDataFrame([(-42,)], "vec_id long")
    )
    assert out["segments_rewritten"] == 0 and out["segments_dropped"] == 0
    assert idx.codes.current()["segments"] == segs  # manifest unchanged dirs
