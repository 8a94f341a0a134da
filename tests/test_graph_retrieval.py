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
