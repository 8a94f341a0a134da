"""Connected components over an edge DataFrame — the pairs→clusters step.

Near-dup operators (MinHash/SimHash/embedding — `functions/dedup.py`) emit
PAIRS; an actual corpus-dedup pipeline needs the transitive closure of those
pairs: duplicate CLUSTERS, one canonical survivor each. The reference
delegates its whole data plane to a SaaS (README.md:6-10), so it has no
analog; this is the standard missing piece between "pairs found" and
"corpus deduplicated".

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi, Mirrokni,
Rastogi, Vassilvitskii — "Connected Components in MapReduce and Beyond",
ACM SoCC 2014). Each round is two key-partitioned aggregations + joins;
the edge set converges to star graphs (node → component-minimum) in
O(log n) rounds on any graph — unlike plain min-label propagation, whose
round count is the graph DIAMETER (a 10⁶-node chain needs 10⁶ rounds;
large-star/small-star needs ~20).

Scale notes (100 TB / 10⁹-node dedup graphs):
- No neighborhood is ever materialized as one row (no collect_list): each
  star step is groupBy(min) + same-key join, so Catalyst plans one exchange
  per step and reuses its partitioning for the join — skew-safe even when
  a boilerplate document participates in millions of pairs.
- Lineage is truncated every round with an EAGER localCheckpoint —
  iterative DataFrame algorithms otherwise stack O(rounds) of plan and
  re-execute the whole chain at every action. (GraphFrames' own CC does
  the same; on a real cluster prefer `checkpoint()` on HDFS/S3 so executor
  loss can't drop partitions of the working set.) Superseded round states
  are freed by the ContextCleaner once unreferenced (each round holds one
  edge-set snapshot; only the final one backs the returned DataFrame), so
  peak storage is ~2 edge-set snapshots, not O(rounds).
- Convergence is detected with a 1-row aggregate (edge count + order-
  independent xxhash64 sum) — the only driver-side data per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tabular_cdc_bootstrapper_spark.localdf import local_df


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as (u > v) pairs, self-loops dropped."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m(u)) for every neighbor v > u, where m(u) = min(Γ(u) ∪ {u}).

    Connects every larger neighbor directly to the neighborhood minimum —
    the step that collapses long paths logarithmically.
    """
    sym = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("u", "mv").alias("m"))
    )
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Re-point every smaller neighbor (and u itself) at min(N⁻(u) ∪ {u}).

    Input contract: edges oriented u > v with no self-loops — exactly what
    ``_large_star`` and ``_canonical`` both emit, so no re-canonicalizing
    shuffle here. Duplicate edges are harmless (min over duplicates is the
    min); the caller's outer ``_canonical`` dedups the output.
    """
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    re_pointed = (
        edges.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return re_pointed.union(mins.select("u", F.col("m").alias("v")))


def _driver_union_find(edge_rows) -> dict:
    """Path-compressed union-find over collected edges: id → min-id root.
    O(E·α) — the finishing move once a (contracted) edge set fits on the
    driver."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in edge_rows:
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by MIN id, so every root is its component's minimum
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
        parent.setdefault(u, find(u))
        parent.setdefault(v, find(v))
    return {x: find(x) for x in parent}


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 30,
    driver_finish_edges: int = 50_000,
) -> DataFrame:
    """(id, component_id) for every node appearing in ``pairs``, where
    ``component_id`` is the minimum node id in the component.

    Nodes with no edges are absent (callers treat missing = singleton);
    ``pairs`` direction is irrelevant. Raises if the edge set hasn't
    stabilized after ``max_rounds`` (default 30 covers > 10⁹ nodes —
    convergence is O(log n) rounds).

    ``driver_finish_edges``: once the (distinct, canonical) edge set is
    at or below this size — measured by the same per-round count the
    convergence signature already pays for — the remaining rounds finish
    driver-side with path-compressed union-find instead of more star
    rounds. This is the engine-adaptive move every iterative distributed
    algorithm wants (the same bounded-collect class as k-means'
    broadcast-the-model centroids, `functions/clustering.py`): each star
    round costs ~5 scheduling barriers regardless of size, while a
    ≤50 k-edge collect finishes in O(E·α) — measured 3.9 s → <1 s on the
    fixture's 1.6 k-edge graphs. The 50 k default is measured, not
    guessed: at 500 k the handoff can fire with a ~1 M-node mapping whose
    driver-side DataFrame construction costs MORE than the remaining
    distributed rounds (26.0 s vs 18.6 s pure-distributed on a planted
    1 M-edge graph, SCALING.md r7) — the threshold must bound the RESULT
    size, and a converged star forest has ~one edge per non-root node, so
    edge count ≈ mapping size at handoff. Above the threshold the check
    costs nothing (it rides the signature count) and the rounds proceed
    distributed — on big graphs adaptive == pure distributed by
    construction. The two paths are result-identical (pinned by
    tests/test_graph_retrieval.py::test_cc_driver_finish_matches_distributed
    and verified on the 1 M-edge probe against ground-truth union-find);
    pass ``driver_finish_edges=0`` to force pure distributed rounds."""
    # materialize the input edge set BEFORE the loop: the first round's
    # star steps reference `edges` four times (sym union + mins join ×2),
    # and without truncation each reference re-executes the upstream pair
    # pipeline (e.g. the full SimHash banding) — measured 2× on the cold
    # run at sf0.1
    edges = _canonical(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint(eager=True)
    if not edges.head(1):
        # schema must match the non-empty path (which inherits the input
        # id type) — a hardcoded long would break string-id callers' later
        # unions exactly and only on the empty-edge edge case
        return edges.select(
            F.col("u").alias("id"), F.col("v").alias("component_id")
        ).limit(0)

    prev_sig = None
    # the initial count is one cheap job over the checkpointed edge set;
    # per-round counts afterwards ride the convergence signature for free
    n_edges = edges.count()
    for _ in range(max_rounds):
        if n_edges <= driver_finish_edges:
            root = _driver_union_find(
                [(r["u"], r["v"]) for r in edges.collect()]
            )
            spark = edges.sparkSession
            out = local_df(
                spark, sorted(root.items()), schema=edges.schema
            )
            return out.select(
                F.col("u").alias("id"), F.col("v").alias("component_id")
            )
        edges = _canonical(_small_star(_large_star(edges)))
        # truncate lineage each round; eager=True also materializes the
        # round so the signature aggregate below doesn't recompute it
        edges = edges.localCheckpoint(eager=True)
        # bit_xor: order-independent, overflow-free under ANSI mode (a
        # SUM of 64-bit hashes overflows long); edges are distinct so
        # set-equality is what the signature needs to witness
        sig = edges.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).head()
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        n_edges = sig[0]
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )

    # converged edge set is (child > root) stars; roots map to themselves
    return (
        edges.select(F.col("u").alias("id"), F.col("v").alias("component_id"))
        .union(
            edges.select(
                F.col("v").alias("id"), F.col("v").alias("component_id")
            ).distinct()
        )
        .distinct()
    )


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(id, component_id, cluster_size, is_canonical): near-dup clusters
    with the min-id member marked canonical — the keep/drop decision of a
    corpus-dedup pipeline (keep ``is_canonical``, drop the rest).

    ``cluster_size`` comes from a second aggregation keyed on component_id
    (not a window over the full mapping: an aggregate + broadcast-back join
    keeps the big side un-sorted, and the per-component count table is tiny
    relative to the corpus).
    """
    cc = connected_components(pairs, src, dst)
    sizes = cc.groupBy("component_id").agg(
        F.count("*").alias("cluster_size")
    )
    return cc.join(sizes, "component_id").select(
        "id",
        "component_id",
        "cluster_size",
        (F.col("id") == F.col("component_id")).alias("is_canonical"),
    )


def quality_canonical(
    clusters: DataFrame,
    quality: DataFrame,
    id_col: str = "id",
    quality_col: str = "quality",
) -> DataFrame:
    """Re-elect each cluster's survivor by QUALITY instead of min-id: the
    production keep/drop policy ("keep the longest / cleanest / highest-
    scoring copy, drop the rest"), which min-id canonical election cannot
    express. Deterministic: argmax(quality), ties broken by SMALLEST id,
    so re-runs and engine changes elect the same survivor.

    ``clusters`` is dedup_clusters output (or any (id, component_id)
    mapping); ``quality`` maps id → a numeric score (e.g. the unigram
    surprisal score, a length stat, or with_text_stats' composite).

    Returns (id, component_id, quality, is_canonical). Members with NO
    quality row are kept (null quality) and can never win unless their
    ENTIRE cluster lacks scores, in which case the election degrades to
    min-id — an inner join here would silently drop unscored docs from
    the keep/drop output, losing documents downstream.

    Scale shape: one left equi-join on id (both sides id-partitioned at
    the corpus's natural key) and ONE max_by aggregation per component —
    max_by carries a (quality, -id) struct so the argmax and the
    tie-break ride a single shuffle; no window sort over cluster members,
    no second pass. The per-component winner table is cluster-count-sized
    — corpus-proportional at the extreme — so the join-back is left
    unhinted for AQE to pick (same reasoning as dedup_clusters' sizes
    join above; a forced broadcast would OOM at the 100 TB design
    point)."""
    q = quality.select(
        F.col(id_col).alias("id"), F.col(quality_col).alias("quality")
    )
    members = clusters.select("id", "component_id").join(q, "id", "left")
    # -inf sorts every unscored member below any real score; an all-null
    # cluster ties at -inf and the -id tie-break elects min id
    rank_q = F.coalesce(F.col("quality"), F.lit(float("-inf")))
    winners = members.groupBy("component_id").agg(
        F.max_by(
            "id", F.struct(rank_q.alias("rq"), (-F.col("id")).alias("neg_id"))
        ).alias("_winner")
    )
    return (
        members.join(winners, "component_id")
        .select(
            "id",
            "component_id",
            "quality",
            (F.col("id") == F.col("_winner")).alias("is_canonical"),
        )
    )


def update_clusters(
    mapping: DataFrame,
    delta_pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    persisted: list | None = None,
) -> DataFrame:
    """Incremental connected-components maintenance (VERDICT r6 #6): merge
    a DELTA of near-dup pairs into an existing (id, component_id) mapping
    and return only the CHANGED/NEW rows — the same touched-keys
    discipline as operators/incremental.maintain_agg, sized by the delta,
    never the corpus.

    The batch pipeline (connected_components over ALL pairs) recomputes
    O(corpus) work per refresh; the streaming MinHash twin
    (streaming/stateful.py: streaming_minhash_candidates) already emits
    candidate pairs incrementally, so the missing piece is folding a pair
    delta into the standing cluster map. Standard component contraction:

    1. Map each delta endpoint through the mapping (left join against the
       DELTA node set — delta-sized): an endpoint's super-node is its
       current component id, or itself if unseen. Because every component
       id IS the minimum member id, super-node ids inherit the min-id
       invariant.
    2. Drop intra-component self-loops; run the batch large-star/
       small-star on the CONTRACTED graph — at most |delta| edges, so the
       O(log n) rounds run on delta-scale data regardless of corpus size.
    3. The contracted roots give a relabel table old_component →
       new_component (min of the merged components' mins = the global
       min-id, preserving the invariant). Relabel the standing mapping
       with a BROADCAST join on component_id — the mapping streams
       map-side, no corpus shuffle (pinned by tests/test_plan_shapes.py)
       — and emit only rows whose component changed, plus rows for
       delta nodes the mapping has never seen.

    Apply the returned rows as an upsert on ``id`` (foreachBatch MERGE in
    a stream, or unionByName + latest-wins in a batch refresh); the law
    ``apply(update_clusters(M, Δ)) == connected_components(all pairs)``
    is pinned by tests/test_graph_retrieval.py on planted topologies and
    a randomized 2-batch split of the fixture's real pair stream.

    Scale shape: steps 1-2 shuffle only delta-sized frames; step 3 is one
    map-side broadcast relabel over the mapping scan plus a delta-sized
    anti-join for the new nodes. Per-batch cost therefore grows with the
    delta (SCALING.md carries the measured ratio), while the batch
    recompute grows with the corpus — the crossover is immediate."""
    edges = _canonical(
        delta_pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    )
    m = mapping.select("id", "component_id")

    # delta node set + each node's current super-node. Join DIRECTION
    # matters at scale: a plain nodes-LEFT-JOIN-mapping would hash-build
    # the corpus-sized mapping; instead the delta node set broadcasts and
    # the mapping streams map-side (inner BHJ), and the not-found
    # remainder comes from an anti-join against the FOUND ids — also
    # delta-sized — so no corpus-sized frame is ever built or shuffled.
    nodes = edges.select(F.col("u").alias("id")).union(
        edges.select(F.col("v").alias("id"))
    ).distinct()
    # persist (lazy), not eager localCheckpoint: each frame is delta-sized
    # and referenced twice; a checkpoint barrier here costs two extra
    # scheduling round-trips per batch for no lineage-depth benefit (the
    # contracted CC below truncates its own lineage every round). Callers
    # either clear the cache per query (the bench/driver/tests house rule)
    # or — in a shared session where a global clearCache would evict
    # unrelated state (ADVICE r7) — pass ``persisted`` and unpersist
    # exactly the frames appended to it once the result is materialized.
    found = m.join(F.broadcast(nodes), "id").persist()
    missing = nodes.join(
        F.broadcast(found.select("id")), "id", "left_anti"
    ).persist()
    if persisted is not None:
        persisted.extend([found, missing])
    node_comp = found.select("id", F.col("component_id").alias("comp")).unionByName(
        missing.select("id", F.col("id").alias("comp"))
    )

    # contracted super-node edges
    cu = node_comp.withColumnsRenamed({"id": "u", "comp": "cu"})
    cv = node_comp.withColumnsRenamed({"id": "v", "comp": "cv"})
    contracted = (
        edges.join(cu, "u").join(cv, "v")
        .select(F.col("cu").alias("id_a"), F.col("cv").alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b"))
    )
    roots = connected_components(contracted)  # (id=old comp, component_id=new)
    relabel = roots.filter(F.col("id") != F.col("component_id")).select(
        F.col("id").alias("comp"), F.col("component_id").alias("new_comp")
    )

    # changed existing rows: broadcast the (delta-sized) relabel table onto
    # the mapping scan — map-side, no corpus shuffle
    changed = (
        mapping.join(
            F.broadcast(relabel),
            mapping["component_id"] == relabel["comp"],
        )
        .select("id", F.col("new_comp").alias("component_id"))
    )
    # brand-new nodes (the MISSING set above — absent from the mapping):
    # their own id is their comp unless the contraction merged them under
    # a lower root; both joins here are delta-sized
    new_nodes = (
        missing.select("id", F.col("id").alias("comp"))
        .join(F.broadcast(relabel), "comp", "left")
        .select("id", F.coalesce("new_comp", "comp").alias("component_id"))
    )
    return changed.unionByName(new_nodes)


def apply_cluster_update(mapping: DataFrame, update: DataFrame) -> DataFrame:
    """Upsert ``update_clusters`` output into the standing mapping (the
    batch form of the foreachBatch MERGE a warehouse would run): update
    rows win on id, everything else passes through unchanged."""
    keep = mapping.join(update.select("id"), "id", "left_anti")
    return keep.unionByName(update.select("id", "component_id"))


def _trunc_div(a, b):
    """Exact ``a // b`` for non-negative int64 columns without leaving the
    JVM: ``a % b`` is exact in long arithmetic, so ``a − a % b`` is an
    exact multiple of ``b``; the division then runs in decimal(38,0) —
    never double — so the quotient is exact over the FULL int64 domain.
    (A double-based divide is exact only below 2^53; a hub's damped mass
    ``num·Σr`` can exceed that on ≥10^5-node graphs, which would silently
    break the bit-exact oracle contract.)"""
    dec = "decimal(38,0)"
    return ((a - a % b).cast(dec) / b.cast(dec)).cast("long")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: tuple[int, int] = (85, 100),
    scale: int = 10**9,
    checkpoint_interval: int = 2,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Damped PageRank in EXACT integer arithmetic — link-graph centrality
    (the web-quality signal of pretraining pipelines) as a deterministic,
    oracle-replayable iteration.

    Ranks are integers at ``scale`` (init r = scale); one iteration is
    ``r'(v) = (scale·(den−num))//den + (num·Σ_{u→v} r(u)//outdeg(u))//den``
    with num/den = ``damping``. Every step is trunc-div / multiply / sum
    on int64 (max ≈ n·scale·num ≪ 2^63), so any engine replays the
    fixed-point trajectory bit-for-bit — the same determinism scheme as
    clustering.py's quantized k-means.

    Dangling nodes (no out-edges): by default they receive rank but leak
    their mass (the classical simplification — fine when the caller
    symmetrizes the edge set). Real link graphs are full of sinks, and
    leaked mass makes ranks incomparable across graphs, so
    ``redistribute_dangling=True`` applies the standard correction: each
    iteration adds ``(Σ dangling rank) // n`` to every node's incoming
    sum before damping — still exact int64 (one extra 1-row aggregate
    per iteration, broadcast back via a literal-row cross join; n is one
    static count at setup). With no dangling nodes the share is 0 and
    the trajectory is bit-identical to the default path (pinned).

    Scale shape per iteration: ONE join (edges ⋈ ranks, shuffled on the
    source key — the static edges ⋈ outdeg frame is materialized once via
    localCheckpoint) and ONE map-side-combinable aggregate on dst. Ranks
    are checkpointed per round (lineage truncation — the CC star-round
    pattern); driver state is zero. This is the canonical iterate-join-
    aggregate shape GraphX/Pregel runs; at warehouse scale pre-partition
    edges by src so the per-round join reuses one partitioning.
    """
    # materialize the edge set ONCE before anything else: deg, the
    # edge⋈deg frame, and the node set all re-execute the caller's edge
    # pipeline otherwise (the CC pre-loop lesson — upstream can be a
    # join+distinct or a full pair generator)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)  # static per run
    nodes = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    num, den = damping
    base = (scale * (den - num)) // den
    n_nodes = 0
    dang_total = 0
    if redistribute_dangling:
        # the dangling SET is static per graph (out-degree never changes
        # across iterations): carry it as a boolean flag ON the node
        # frame, so each round's dangling-mass sum is a conditional
        # aggregate over ranks — observable on the round's own job —
        # instead of a semi-join against a separate frame (r16; the r15
        # crossJoin(share) form re-executed the previous round's ranks
        # subtree inside the share branch, doubling per-round work
        # between checkpoints)
        nodes = (
            nodes.join(
                deg.select(
                    F.col("src").alias("v"), F.lit(True).alias("__out")
                ),
                "v",
                "left",
            )
            .select("v", F.col("__out").isNull().alias("__dang"))
            .localCheckpoint(eager=True)
        )
        counts = nodes.agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("__dang"), 1).otherwise(0)).alias("nd"),
        ).collect()[0]
        n_nodes = int(counts["n"])
        # r0 = scale everywhere, so the first round's dangling mass is
        # closed-form — no extra pass
        dang_total = scale * int(counts["nd"] or 0)
    ranks = nodes.withColumn("r", F.lit(scale).cast("long"))
    for it in range(iters):
        contrib = ed.join(ranks, ed["src"] == ranks["v"]).select(
            F.col("dst").alias("v"),
            _trunc_div(F.col("r"), F.col("deg")).alias("c"),
        )
        sums = contrib.groupBy("v").agg(F.sum("c").alias("s"))
        incoming = F.coalesce("s", F.lit(0))
        if redistribute_dangling:
            # Σ dangling rank // n, exact int64 (both operands are
            # non-negative Python ints — same trunc-div as _trunc_div)
            incoming = incoming + F.lit(dang_total // n_nodes).cast(
                "long"
            )
        joined = nodes.join(sums, "v", "left")
        ranks = joined.select(
            *nodes.columns,
            (
                F.lit(base).cast("long")
                + _trunc_div(
                    F.lit(num).cast("long") * incoming,
                    F.lit(den).cast("long"),
                )
            ).alias("r"),
        )
        # truncate lineage every ``checkpoint_interval`` rounds rather
        # than every round: a checkpoint is an eager job barrier, and
        # letting Catalyst fuse rounds into one job measured 4.39 s →
        # 4.09 s (interval 2) → 3.90 s (no mid-checkpoints) for 3 iters
        # at sf0.1, bit-identical output (checkpointing never changes
        # results, only scheduling). Interval 2 is the default because
        # unbounded fusion re-expands lineage exponentially-deep plans
        # on LONG iteration runs — the CC rounds lesson.
        if redistribute_dangling and it + 1 < iters:
            # the next round needs THIS round's dangling mass: observe
            # it on the round's checkpoint job (guide §2.4 — fold the
            # driver-bound aggregate into the job that materializes the
            # round anyway; jobs/round 2 → 1)
            from pyspark.sql import Observation

            obs = Observation()
            ranks = ranks.observe(
                obs,
                F.sum(
                    F.when(F.col("__dang"), F.col("r")).otherwise(
                        F.lit(0)
                    )
                )
                .cast("long")
                .alias("dt"),
            ).localCheckpoint(eager=True)
            dang_total = int(obs.get["dt"] or 0)
        elif (it + 1) % checkpoint_interval == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("v").alias("node_id"), F.col("r").alias("rank_scaled"))
