"""Distributed k-means over embedding columns — the curation primitive
behind semantic clustering (diversity sampling, IVF list training, topic
bucketing of a 100 TB corpus).

Two design decisions make this Spark-shaped AND oracle-checkable:

1. **Broadcast-the-model iteration.** Each Lloyd iteration broadcasts the
   k×dim centroid matrix (a few KB) and computes assignments with ONE
   vectorized Arrow-batch matmul per partition — the corpus never
   shuffles for assignment. The centroid update aggregates
   (cluster, dim_index) partial sums map-side, so the only shuffle is
   ~``n_partitions × k × dim`` pre-aggregated rows, independent of corpus
   size. Driver state is k×dim numbers per iteration ("collect the
   model, never the data" — same contract as similarity.ivf_topk's
   centroid table).

2. **Integer quantization ⇒ exact determinism.** Float k-means is not
   reproducible across engines (sum order changes the means by ulps,
   which flips boundary assignments). Quantizing each coordinate to
   ``round(x * 2^20)`` int64 makes every distance, argmin tie-break
   (lowest centroid id), and centroid mean (integer div truncating
   toward zero) EXACT integer arithmetic — bit-identical in any engine,
   so a DuckDB oracle can replay the full iteration in SQL. Max scaled
   magnitude ~2^24 ⇒ squared-distance sums < 2^50 for dim ≤ 4096: no
   overflow headroom issues at embedding dims that matter. The ~1e-6
   relative quantization error is far below any clustering-quality
   signal.

Init: the k lowest-``id`` vectors (deterministic, no RNG — same rationale
as the engine-wide no-rand() sampling rule). k-means++ would need a seeded
RNG shared with the oracle; lowest-id is reproducible everywhere.
"""

from __future__ import annotations

import pandas as pd  # module-level: future-annotations stringifies hints,
# and pandas_udf resolves them against module globals (same as bench.py)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1 << 20


def quantize_vectors(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, qv): coordinates as round(x · 2²⁰) int64. float→double widening
    BEFORE the scale multiply (scaling by a power of two is exact in
    binary floating point, so `round` sees the true float32 value)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * F.lit(float(_SCALE))).cast("long"),
        ).alias("qv"),
    )


def _assign(qdf: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """(id, qv, cid): nearest centroid by squared L2, ties → lowest cid.
    One numpy matmul per Arrow batch against the broadcast centroid
    matrix; int64 end-to-end so the argmin is exact."""
    import numpy as np
    from pyspark.sql import functions as SF

    cmat = np.array(centroids, dtype=np.int64)  # (k, dim)

    @SF.pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # np.stack rejects an empty batch
            return pd.Series([], dtype="int32")
        x = np.stack(vecs.to_numpy())  # (batch, dim) int64
        # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row, so
        # argmin over centroids needs only  c·c - 2x·c  (exact int64)
        cross = x @ cmat.T  # (batch, k)
        scores = (cmat * cmat).sum(axis=1)[None, :] - 2 * cross
        # np.argmin returns the FIRST min index = lowest cid tie-break
        return pd.Series(np.argmin(scores, axis=1).astype(np.int32))

    return qdf.withColumn("cid", nearest("qv"))


def _fit(qdf: DataFrame, k: int, max_iters: int) -> tuple[list[list[int]], int]:
    """Lloyd loop over an (id, qv) quantized corpus; returns the final
    quantized centroid matrix and the number of iterations actually run.

    Convergence probe (zero extra jobs): integer quantization makes the
    centroid update EXACT, so a Lloyd fixed point is detectable as plain
    list equality of the k×dim ints on the driver — no assignment-diff
    join needed. If ``new == old`` the assignment next round is
    bit-identical too (deterministic argmin over identical centroids), so
    stopping early NEVER changes the result — which is why the
    fixed-iter oracle queries can share this loop: an oracle that unrolls
    ``iters`` rounds computes the same centroids, converged or not."""
    init_rows = qdf.orderBy("id").limit(k).collect()
    centroids = [list(r["qv"]) for r in init_rows]
    dim = len(centroids[0])

    it_run = 0
    for _ in range(max_iters):
        assigned = _assign(qdf, centroids)
        sums = (
            assigned.select(
                "cid", F.posexplode("qv").alias("i", "val")
            )
            .groupBy("cid", "i")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_cid: dict[int, list[tuple[int, int, int]]] = {}
        for r in sums:
            by_cid.setdefault(r["cid"], []).append((r["i"], r["s"], r["n"]))
        new_centroids = []
        for cid in range(len(centroids)):
            if cid not in by_cid:
                new_centroids.append(centroids[cid])  # empty cluster: keep
                continue
            vec = [0] * dim
            for i, s, n in by_cid[cid]:
                q, rem = divmod(abs(s), n)
                vec[i] = q if s >= 0 else -q  # trunc toward zero
            new_centroids.append(vec)
        it_run += 1
        if new_centroids == centroids:  # exact integer fixed point
            break
        centroids = new_centroids
    return centroids, it_run


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    max_iters: int = 20,
) -> tuple[list[list[int]], int]:
    """Fit only: returns (quantized k×dim centroids, iterations run).

    Runs until the exact integer fixed point or ``max_iters``, whichever
    comes first (see ``_fit`` for why early stop is result-identical).
    Use ``dequantize_centroids`` to get float vectors — e.g. to train
    IVF inverted lists (similarity.ivf_topk(centroid_strategy="kmeans"))."""
    qdf = quantize_vectors(df, vec_col, id_col).localCheckpoint(eager=True)
    return _fit(qdf, k, max_iters)


def dequantize_centroids(centroids: list[list[int]]) -> list[list[float]]:
    """Quantized int64 centroids → float coordinates (exact: int/2²⁰ is a
    dyadic rational, representable in double for all our magnitudes)."""
    return [[c / _SCALE for c in vec] for vec in centroids]


def kmeans_fit_predict(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    keep_vec: bool = False,
) -> DataFrame:
    """Lloyd k-means, returns (id, cid) assignments after ``iters`` rounds
    (fewer if the exact fixed point arrives first — same result either
    way, see ``_fit``). ``keep_vec=True`` also returns the quantized
    vector column ``qv`` — consumers that need exact-integer geometry on
    the assigned points (semantic_dedup's within-cluster cosine test)
    read it instead of re-quantizing the corpus.

    Plan per iteration: corpus-resident assignment (no shuffle) → explode
    to (cid, dim_idx, val) → hash agg with map-side partials (shuffle is
    k·dim rows per partition) → collect k·dim longs. Centroid mean uses
    integer division truncating toward zero (matches both Spark `div` and
    the oracle's emulated trunc-div); empty clusters keep their previous
    centroid (deterministic, no re-seeding).

    Caching: the fit runs ``iters + 2`` ACTIONS (init top-k, one
    aggregate per iteration, the returned final assignment), so the
    quantized corpus is materialized ONCE via eager localCheckpoint —
    like graph.py's star rounds — and every action reads the stored
    blocks. Unlike persist(), checkpoint blocks are freed by the
    ContextCleaner when the returned plan is garbage-collected, so
    long-lived sessions (and drivers that never clearCache between
    queries) don't accumulate leaked cache entries. The lineage
    truncation means executor loss forces a job failure instead of
    recompute — the standard localCheckpoint trade; swap in persist()
    +StorageLevel replication on clusters where that matters."""
    qdf = quantize_vectors(df, vec_col, id_col).localCheckpoint(eager=True)
    centroids, _ = _fit(qdf, k, iters)
    cols = ["id", "qv", "cid"] if keep_vec else ["id", "cid"]
    return _assign(qdf, centroids).select(*cols)
