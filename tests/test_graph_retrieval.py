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


def _cc_map(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = connected_components(df, **kw).collect()
    return {r["id"]: r["component_id"] for r in rows}


def test_connected_components_chain(spark):
    # a 12-node path is the adversarial case for plain label propagation
    # (diameter rounds); large-star/small-star must close it in O(log n).
    # driver_finish_edges=0 forces the DISTRIBUTED star rounds — the
    # default would finish this fixture-sized graph driver-side
    edges = [(i, i + 1) for i in range(11)]
    got = _cc_map(spark, edges, driver_finish_edges=0)
    assert got == {i: 0 for i in range(12)}


def test_connected_components_multiple_and_direction_blind(spark):
    # two components; edge direction and duplicates are irrelevant —
    # asserted on BOTH execution paths
    edges = [(2, 1), (3, 2), (1, 3), (9, 7), (7, 9)]
    want = {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}
    assert _cc_map(spark, edges, driver_finish_edges=0) == want
    assert _cc_map(spark, edges) == want


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


# ---------------------------------------------------------------------------
# update_clusters: incremental CC maintenance (VERDICT r6 #6)
# ---------------------------------------------------------------------------


def _pairs_df(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def _apply_inc(spark, batch1, batch2):
    """connected_components(batch1) folded forward with batch2's delta."""
    from tabular_cdc_bootstrapper_spark.functions.graph import (
        apply_cluster_update,
        update_clusters,
    )

    m1 = connected_components(_pairs_df(spark, batch1)).localCheckpoint(eager=True)
    upd = update_clusters(m1, _pairs_df(spark, batch2))
    return {
        r["id"]: r["component_id"]
        for r in apply_cluster_update(m1, upd).collect()
    }


def test_update_clusters_merges_two_components(spark):
    """A delta edge bridging two existing components relabels BOTH sides
    to the global min; untouched components never appear in the update."""
    from tabular_cdc_bootstrapper_spark.functions.graph import update_clusters

    batch1 = [(1, 2), (2, 3), (10, 11), (20, 21)]
    m1 = connected_components(_pairs_df(spark, batch1)).localCheckpoint(eager=True)
    upd = update_clusters(m1, _pairs_df(spark, [(3, 10)])).collect()
    got = {r["id"]: r["component_id"] for r in upd}
    # rows 10, 11 move to component 1; (20, 21) is untouched -> ABSENT
    assert got == {10: 1, 11: 1}
    full = _apply_inc(spark, batch1, [(3, 10)])
    batch = {
        r["id"]: r["component_id"]
        for r in connected_components(_pairs_df(spark, batch1 + [(3, 10)])).collect()
    }
    assert full == batch


def test_update_clusters_new_nodes_and_new_min(spark):
    """New nodes join existing clusters; a new node with a SMALLER id than
    an existing component's min becomes the new component id (the min-id
    invariant survives incrementally)."""
    batch1 = [(5, 6), (6, 7)]
    # 100 joins the cluster; 0 bridges in with the new global min
    batch2 = [(7, 100), (0, 5)]
    assert _apply_inc(spark, batch1, batch2) == {
        0: 0, 5: 0, 6: 0, 7: 0, 100: 0,
    }


def test_update_clusters_intra_component_delta_is_noop(spark):
    """A delta edge inside an existing component contracts to a self-loop:
    the update must be EMPTY (no spurious touched rows)."""
    from tabular_cdc_bootstrapper_spark.functions.graph import update_clusters

    batch1 = [(1, 2), (2, 3)]
    m1 = connected_components(_pairs_df(spark, batch1)).localCheckpoint(eager=True)
    assert update_clusters(m1, _pairs_df(spark, [(1, 3)])).count() == 0


def test_update_clusters_all_new_component(spark):
    """A delta whose nodes are all unseen forms a fresh component without
    touching the mapping."""
    batch1 = [(1, 2)]
    batch2 = [(50, 51), (51, 52)]
    assert _apply_inc(spark, batch1, batch2) == {1: 1, 2: 1, 50: 50, 51: 50, 52: 50}


def test_update_clusters_chain_merge_across_batches(spark):
    """The adversarial case: the delta bridges MANY existing components at
    once (a path laid down in two interleaved halves) — the contracted
    graph is itself a path of super-nodes and must converge."""
    batch1 = [(i, i + 1) for i in range(0, 20, 2)]  # (0,1),(2,3),...  10 comps
    batch2 = [(i, i + 1) for i in range(1, 19, 2)]  # bridges them into one
    full = _apply_inc(spark, batch1, batch2)
    assert full == {i: 0 for i in range(20)}


def test_update_clusters_matches_batch_on_random_split(spark):
    """The twin law on a randomized topology: for a seeded random graph
    split into two arbitrary edge batches, incremental == batch recompute,
    row for row."""
    import random

    rng = random.Random(1234)
    nodes = list(range(60))
    edges = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(120)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    rng.shuffle(edges)
    cut = len(edges) // 2
    inc = _apply_inc(spark, edges[:cut], edges[cut:])
    batch = {
        r["id"]: r["component_id"]
        for r in connected_components(_pairs_df(spark, edges)).collect()
    }
    assert inc == batch


def test_update_clusters_fixture_two_batch_twin(spark, sf_dir):
    """VERDICT r6 #6's stated done-criterion: batch near_dup_clusters ==
    incremental result after a 2-batch corpus split, on the REAL fixture
    pair stream (SimHash near-dup pairs over documents, split by doc_id
    parity of the pair's smaller member — an arbitrary, skew-agnostic
    cut)."""
    import pyspark.sql.functions as F

    from tabular_cdc_bootstrapper_spark.functions.dedup import (
        simhash_near_duplicates,
    )
    from tabular_cdc_bootstrapper_spark.functions.graph import (
        apply_cluster_update,
        update_clusters,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = simhash_near_duplicates(docs).select("id_a", "id_b").localCheckpoint(
        eager=True
    )
    b1 = pairs.filter(F.col("id_a") % 2 == 0)
    b2 = pairs.filter(F.col("id_a") % 2 == 1)
    m1 = connected_components(b1).localCheckpoint(eager=True)
    inc = {
        r["id"]: r["component_id"]
        for r in apply_cluster_update(m1, update_clusters(m1, b2)).collect()
    }
    batch = {
        r["id"]: r["component_id"] for r in connected_components(pairs).collect()
    }
    assert inc == batch and len(batch) > 0


def test_update_clusters_folds_over_many_batches(spark):
    """The maintenance loop a stream actually runs: fold N sequential
    pair deltas (the streaming MinHash twin emits per micro-batch) into
    the standing mapping — after every batch the mapping equals the batch
    recompute over everything seen so far."""
    import random

    from tabular_cdc_bootstrapper_spark.functions.graph import (
        apply_cluster_update,
        update_clusters,
    )

    rng = random.Random(77)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    batches = [edges[i::3] for i in range(3)]  # interleaved, arbitrary cut
    mapping = connected_components(_pairs_df(spark, batches[0])).localCheckpoint(
        eager=True
    )
    seen = list(batches[0])
    for delta in batches[1:]:
        upd = update_clusters(mapping, _pairs_df(spark, delta))
        mapping = apply_cluster_update(mapping, upd).localCheckpoint(eager=True)
        seen += delta
        inc = {r["id"]: r["component_id"] for r in mapping.collect()}
        batch = {
            r["id"]: r["component_id"]
            for r in connected_components(_pairs_df(spark, seen)).collect()
        }
        assert inc == batch


def test_cc_driver_finish_matches_distributed(spark):
    """The engine-adaptive fallthrough: union-find driver finish and pure
    distributed star rounds are result-identical on seeded random graphs
    (including chains — the path-compression stress case) and on an
    already-contracted star."""
    import random

    rng = random.Random(4242)
    cases = [
        [(i, i + 1) for i in range(30)],  # path: worst case for min-label
        [(rng.randrange(50), rng.randrange(50)) for _ in range(80)],
        [(0, 1), (2, 3), (4, 5), (1, 2)],  # partial merges
    ]
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        fast = {
            r["id"]: r["component_id"] for r in connected_components(df).collect()
        }
        dist = {
            r["id"]: r["component_id"]
            for r in connected_components(df, driver_finish_edges=0).collect()
        }
        assert fast == dist and len(fast) > 0


def test_cc_driver_finish_after_contraction_rounds(spark):
    """With a threshold BELOW the initial edge count, the first star
    rounds run distributed and the union-find finishes the contracted
    remainder — the 100 TB shape, exercised end-to-end."""
    edges = [(i, i + 1) for i in range(200)]  # contracts fast but starts "big"
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["component_id"]
        for r in connected_components(df, driver_finish_edges=150).collect()
    }
    assert got == {i: 0 for i in range(201)}


def test_update_clusters_fold_law_hypothesis(spark):
    """Property: for ANY small random graph and ANY 2-way edge split, the
    incremental fold equals the batch recompute — hypothesis shrinks
    failures to a minimal edge set/split. Reference semantics is plain
    union-find in Python (independent of both Spark paths)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from tabular_cdc_bootstrapper_spark.functions.graph import _driver_union_find

    edge = st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    )

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        edges=st.lists(edge, min_size=1, max_size=20),
        cut=st.integers(min_value=0, max_value=20),
    )
    def law(edges, cut):
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            return
        cut = min(cut, len(edges))
        b1, b2 = edges[:cut], edges[cut:]
        if not b1:  # fold needs a standing mapping; CC(∅) is the b2 batch
            b1, b2 = b2, b1
        got = _apply_inc(spark, b1, b2)
        want = _driver_union_find(edges)
        assert got == want, (edges, cut)

    law()


# --- PageRank (integer-exact) ---------------------------------------------


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_pagerank_two_cycle_is_exact_fixed_point(spark):
    """a↔b with outdeg 1 each: every iteration maps r=scale to
    base + 85·scale//100 = scale exactly — the hand-computable invariant
    that pins the damped-update arithmetic."""
    from tabular_cdc_bootstrapper_spark.functions.graph import pagerank

    out = pagerank(_edges_df(spark, [(1, 2), (2, 1)]), iters=3).collect()
    assert {r["node_id"]: r["rank_scaled"] for r in out} == {
        1: 10**9,
        2: 10**9,
    }


def test_pagerank_hub_outranks_leaves(spark):
    """Symmetric star: the hub aggregates every leaf's full contribution,
    leaves split the hub's — hub rank must dominate."""
    from tabular_cdc_bootstrapper_spark.functions.graph import pagerank

    edges = []
    for leaf in range(2, 8):
        edges += [(1, leaf), (leaf, 1)]
    got = {
        r["node_id"]: r["rank_scaled"]
        for r in pagerank(_edges_df(spark, edges), iters=3).collect()
    }
    assert all(got[1] > got[leaf] for leaf in range(2, 8))
    assert len(set(got[leaf] for leaf in range(2, 8))) == 1  # symmetry


def test_pagerank_dangling_node_decays_to_base(spark):
    """Directed a→b only: a has no in-edges, so after one iteration its
    rank is exactly the base term (the documented leaky simplification)."""
    from tabular_cdc_bootstrapper_spark.functions.graph import pagerank

    got = {
        r["node_id"]: r["rank_scaled"]
        for r in pagerank(_edges_df(spark, [(1, 2)]), iters=2).collect()
    }
    assert got[1] == 150_000_000  # (10^9 · 15) // 100
    # b received a's full (decaying) contribution on top of base
    assert got[2] > got[1]


def test_pagerank_deterministic_across_runs(spark):
    from tabular_cdc_bootstrapper_spark.functions.graph import pagerank

    edges = [(i, (i * 3) % 11 + 1) for i in range(1, 12)]
    sym = edges + [(b, a) for a, b in edges]
    a = sorted(map(tuple, pagerank(_edges_df(spark, sym), iters=3).collect()))
    b = sorted(map(tuple, pagerank(_edges_df(spark, sym), iters=3).collect()))
    assert a == b


def test_pagerank_redistribution_conserves_mass(spark):
    from pyspark.sql import functions as F
    """VERDICT r8 task 5: with redistribute_dangling=True total rank
    mass stays at n·scale up to trunc-div slack, on a graph where the
    default path leaks (a chain ending in a sink). Slack bound: each
    iteration loses < 1 unit per edge contribution, per-node damping
    trunc, and the share trunc — iters·(E + n + n) units total."""
    from tabular_cdc_bootstrapper_spark.functions.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 4), (5, 4), (1, 3)]  # 4 is a sink
    n, e_cnt, iters, scale = 5, len(edges), 4, 10**9
    fixed = pagerank(
        _edges_df(spark, edges), iters=iters, redistribute_dangling=True
    )
    total = fixed.agg(F.sum("rank_scaled")).collect()[0][0]
    slack = iters * (e_cnt + 2 * n + 2)
    assert abs(total - n * scale) <= slack, (total, n * scale)
    # the default path on the same graph demonstrably leaks
    leaky = pagerank(_edges_df(spark, edges), iters=iters)
    leaked = leaky.agg(F.sum("rank_scaled")).collect()[0][0]
    assert n * scale - leaked > scale // 2  # lost a node's worth of mass


def test_pagerank_redistribution_noop_without_dangling(spark):
    """No sinks → share is 0 every round → bit-identical trajectory to
    the default path (flag safe to enable unconditionally)."""
    from tabular_cdc_bootstrapper_spark.functions.graph import pagerank

    sym = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3)]
    a = sorted(map(tuple, pagerank(_edges_df(spark, sym), iters=3).collect()))
    b = sorted(
        map(
            tuple,
            pagerank(
                _edges_df(spark, sym), iters=3, redistribute_dangling=True
            ).collect(),
        )
    )
    assert a == b
