"""Connected-components clustering (functions/graph.py) and BM25 retrieval
(functions/retrieval.py): unit tests against hand-built graphs and an
independent pandas BM25 reference. The oracle-parity suite additionally
checks the registered `near_dup_clusters` / `bm25_topk` queries against
DuckDB (recursive-CTE closure / straight SQL)."""

from __future__ import annotations

import math

import pytest

from tabular_cdc_bootstrapper_spark.functions.graph import (
    connected_components,
    dedup_clusters,
)
from tabular_cdc_bootstrapper_spark.functions.retrieval import bm25_topk


def _cc_map(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df).collect()
    return {r["id"]: r["component_id"] for r in rows}


def test_connected_components_chain(spark):
    # a 12-node path is the adversarial case for plain label propagation
    # (diameter rounds); large-star/small-star must close it in O(log n)
    edges = [(i, i + 1) for i in range(11)]
    got = _cc_map(spark, edges)
    assert got == {i: 0 for i in range(12)}


def test_connected_components_multiple_and_direction_blind(spark):
    # two components; edge direction and duplicates are irrelevant
    edges = [(2, 1), (3, 2), (1, 3), (9, 7), (7, 9)]
    got = _cc_map(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_connected_components_empty(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_dedup_clusters_sizes_and_canonical(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    rows = {r["id"]: r for r in dedup_clusters(pairs).collect()}
    assert set(rows) == {1, 2, 3, 5, 6}
    assert [rows[i]["component_id"] for i in (1, 2, 3)] == [1, 1, 1]
    assert [rows[i]["component_id"] for i in (5, 6)] == [5, 5]
    assert [rows[i]["cluster_size"] for i in (1, 2, 3, 5, 6)] == [3, 3, 3, 2, 2]
    canon = {i for i, r in rows.items() if r["is_canonical"]}
    assert canon == {1, 5}


def _bm25_reference(docs, terms, k1=1.2, b=0.75):
    """Independent plain-Python BM25 (Lucene idf) over (doc_id, text)."""
    toks = {i: t.lower().strip().split() for i, t in docs if t.strip()}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    df = {
        t: sum(1 for w in toks.values() if t in w) for t in terms
    }
    scores = {}
    for i, w in toks.items():
        s, matched = 0.0, 0
        for t in terms:
            tf = w.count(t)
            if not tf:
                continue
            matched += 1
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(w) / avgdl))
        if matched:
            scores[i] = (round(s, 6), matched)
    return scores


def test_bm25_matches_python_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = ["dup", "vector", "merge"]
    got = bm25_topk(docs, terms, k=15).collect()
    ref = _bm25_reference(
        [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()],
        terms,
    )
    expected_topk = sorted(
        ref.items(), key=lambda kv: (-kv[1][0], kv[0])
    )[:15]
    assert [r["doc_id"] for r in got] == [i for i, _ in expected_topk]
    for r in got:
        score, matched = ref[r["doc_id"]]
        assert r["bm25"] == pytest.approx(score, abs=2e-6)
        assert r["n_terms"] == matched


def test_bm25_rare_term_dominates(spark):
    # idf must rank one rare-term match above many common-term matches
    rows = [(0, "dup alpha beta")] + [
        (i, "alpha beta alpha beta alpha") for i in range(1, 40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    top = bm25_topk(docs, ["dup", "alpha"], k=3).collect()
    assert top[0]["doc_id"] == 0


def test_quality_canonical_elects_best_member(spark):
    """Quality-aware survivor election: argmax(quality) per component,
    ties broken by smallest id — never the min-id default."""
    from tabular_cdc_bootstrapper_spark.functions.graph import (
        dedup_clusters,
        quality_canonical,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    clusters = dedup_clusters(pairs)
    quality = spark.createDataFrame(
        # component {1,2,3}: best quality is id 3 (min-id canonical is 1)
        # component {10,11}: quality TIE -> smallest id 10 wins
        [(1, 5.0), (2, 7.0), (3, 9.0), (10, 4.0), (11, 4.0)],
        "id long, quality double",
    )
    out = {r["id"]: r for r in quality_canonical(clusters, quality).collect()}
    assert len(out) == 5
    winners = {i for i, r in out.items() if r["is_canonical"]}
    assert winners == {3, 10}
    # null-quality policy: unscored members are KEPT (null quality, never
    # elected while a scored sibling exists); an all-null cluster degrades
    # to min-id election — no document ever vanishes from the output
    partial = spark.createDataFrame(
        [(2, 7.0)], "id long, quality double"  # 1 and 3 unscored
    )
    out2 = {r["id"]: r for r in quality_canonical(clusters, partial).collect()}
    assert set(out2) == {1, 2, 3, 10, 11}
    assert {i for i, r in out2.items() if r["is_canonical"]} == {2, 10}
    assert out2[3]["quality"] is None
    # exactly one survivor per component
    per_comp = {}
    for r in out.values():
        per_comp.setdefault(r["component_id"], 0)
        per_comp[r["component_id"]] += int(r["is_canonical"])
    assert all(v == 1 for v in per_comp.values())


def test_quality_canonical_single_aggregation_no_window(spark):
    """Plan shape: the election is a max_by aggregate + broadcast-back,
    never a window sort over cluster members."""
    from tabular_cdc_bootstrapper_spark.functions.graph import (
        dedup_clusters,
        quality_canonical,
    )

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    quality = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "id long, quality double"
    )
    df = quality_canonical(dedup_clusters(pairs), quality)
    from tabular_cdc_bootstrapper_spark.plans.inspect import physical_plan

    p = physical_plan(df)
    assert "Window" not in p
    assert "max_by" in p.lower()
