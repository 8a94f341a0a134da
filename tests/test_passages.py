"""Passage pipeline composition (functions/passages.py — VERDICT r8 task
3): the chunk→vec_id pairing, the md5-derived deterministic embedding,
doc-level dedup of chunk hits, and the end-to-end corpus-free query-path
plan pin. Oracle parity at fixture scale: test_oracle_parity
(passage_ann_topk replays chunking → embedding → IVF-PQ → doc dedup in
DuckDB)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from tabular_cdc_bootstrapper_spark.functions.passages import (
    CHUNK_ID_MULTIPLIER,
    chunk_vectors,
    dedup_hits_by_doc,
    md5_embedding,
)
from tabular_cdc_bootstrapper_spark.plans.inspect import physical_plan


def test_md5_embedding_is_the_hex_bytes(spark):
    df = spark.createDataFrame([("00ff10a5" + "0" * 24,)], "h string")
    (row,) = df.select(md5_embedding(F.col("h"), dim=4).alias("e")).collect()
    assert row["e"] == [0.0, 255.0, 16.0, 165.0]
    with pytest.raises(ValueError, match="16 bytes"):
        md5_embedding(F.col("h"), dim=17)


def test_chunk_vectors_ids_are_invertible(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cv = chunk_vectors(docs)
    bad = cv.filter(
        (F.col("vec_id") != F.col("doc_id") * CHUNK_ID_MULTIPLIER
         + F.col("chunk_idx"))
        | (F.col("chunk_idx") >= CHUNK_ID_MULTIPLIER)
    )
    assert bad.count() == 0
    assert cv.select("vec_id").distinct().count() == cv.count()
    # every embedding is 16 ints in [0, 256)
    rng = cv.select(
        F.min(F.array_min("embedding")).alias("lo"),
        F.max(F.array_max("embedding")).alias("hi"),
        F.min(F.size("embedding")).alias("d"),
    ).first()
    assert rng["lo"] >= 0.0 and rng["hi"] < 256.0 and rng["d"] == 16


def test_dedup_hits_by_doc_best_chunk_and_ranking(spark):
    """Per (query, doc) the best-scoring chunk survives (cos_sim DESC,
    vec_id ASC tie-break); docs rank by that score (doc_id tie-break)."""
    M = CHUNK_ID_MULTIPLIER
    hits = spark.createDataFrame(
        [
            # qid 1: doc 2 has chunks scoring .9/.7 -> keep chunk 0 (.9)
            (1, 2 * M + 0, 0.9),
            (1, 2 * M + 3, 0.7),
            # doc 5: single chunk .8
            (1, 5 * M + 1, 0.8),
            # doc 3 ties doc 5 at .8 -> doc 3 ranks first (lower doc_id);
            # within doc 3 two chunks tie at .8 -> lower vec_id survives
            (1, 3 * M + 7, 0.8),
            (1, 3 * M + 2, 0.8),
            # qid 9 independent
            (9, 4 * M + 0, 0.5),
        ],
        "qid long, vec_id long, cos_sim double",
    )
    got = sorted(
        (r["qid"], r["rn"], r["doc_id"], r["chunk_idx"], r["cos_sim"])
        for r in dedup_hits_by_doc(hits, k=2).collect()
    )
    assert got == [
        (1, 1, 2, 0, 0.9),
        (1, 2, 3, 2, 0.8),  # doc 3 beats doc 5 on id; chunk 2 beats 7
        (9, 1, 4, 0, 0.5),
    ]


def test_passage_query_path_is_corpus_free(spark, sf_dir, tmp_path):
    """The composition preserves ann_query's contract: once the chunk
    index is built, query + doc-dedup plans scan ONLY index tables —
    no documents.parquet scan, no re-chunking, no training."""
    from tabular_cdc_bootstrapper_spark.functions.ann_index import (
        ann_query,
        build_ann_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cv = chunk_vectors(docs)
    root = str(tmp_path / "passage_index")
    idx = build_ann_index(
        spark, cv, root, n_centroids=32, n_subspaces=4, n_codes=16, dim=16
    )
    q = spark.createDataFrame(
        [(9_999_999_999, [float((7 * i) % 256) for i in range(16)])],
        "qid long, embedding array<double>",
    )
    out = dedup_hits_by_doc(ann_query(spark, idx, q, k=50, shortlist=50), k=5)
    plan = physical_plan(out)
    locations = re.findall(r"Location: [^\[]*\[([^\]]*)\]", plan)
    assert locations, plan
    for loc in locations:
        assert root in loc, f"non-index scan in passage query plan: {loc}"
    assert out.count() == 5
    # hits decode through the pairing: all doc/chunk ids are consistent
    bad = out.filter(
        (F.col("doc_id") < 0) | (F.col("chunk_idx") < 0)
        | (F.col("chunk_idx") >= CHUNK_ID_MULTIPLIER)
    )
    assert bad.count() == 0


def test_chunk_vectors_rejects_chunk_idx_overflow(spark, monkeypatch):
    """ADVICE r9: a document with >= CHUNK_ID_MULTIPLIER chunks would
    silently collide vec_ids into a neighboring doc_id — the build must
    fail loudly instead. Exercised by shrinking the multiplier (the
    guard is the same in-plan assert at any value)."""
    import pytest

    from tabular_cdc_bootstrapper_spark.functions import passages

    docs = spark.createDataFrame(
        [(1, " ".join(f"tok{i}" for i in range(400)))], "doc_id long, text string"
    )
    # sane multiplier: builds fine
    assert passages.chunk_vectors(docs).count() > 3
    monkeypatch.setattr(passages, "CHUNK_ID_MULTIPLIER", 2)
    with pytest.raises(Exception, match="CHUNK_ID_MULTIPLIER"):
        # evaluate vec_id itself — under a bare count() Catalyst prunes
        # the column (and with it the guard), exactly like production
        # never reads a vec_id it doesn't use
        passages.chunk_vectors(docs).select("vec_id").collect()
