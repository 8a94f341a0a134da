"""Similarity search over embedding columns (array<float>).

Two tiers, same contract:

- ``cosine_topk``: brute-force exact top-k. All arithmetic is native
  higher-order functions (zip_with + aggregate) in DOUBLE — JVM-side,
  codegen'd, no Python/Arrow hop — and the query side is broadcast, so the
  corpus is scanned once with no shuffle of the embedding column at all.
  Per-query top-k uses a ranking window over a (query × corpus) stream
  that carries only (ids, sim), not vectors.
- ``lsh_bucketed_topk``: the 100 TB path. Sign-random-projection LSH:
  b deterministic hyperplanes → b-bit bucket id; queries only score
  against corpus rows in the same (or neighboring, via multi-probe)
  bucket. Recall is tunable with n_planes/n_probes; the candidate scan
  shrinks by ~2^b.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd  # module-level: __future__ annotations stringifies the
# pandas_udf type hints, and pyspark resolves them against module globals

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """Exact top-k neighbors per query vector: (qid, vec_id, cos_sim, rn).

    ``queries`` must be small enough to broadcast (the usual ANN serving
    shape); the corpus side streams through unshuffled."""
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(vec_col).alias("qv")
    )
    scored = (
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
        .join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .withColumn("sim", cosine_similarity(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.select("qid", "vec_id", "sim")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "qid", "vec_id", F.round("sim", 6).alias("cos_sim"), F.col("rn").cast("int")
        )
    )


def int8_codes(vec: Column) -> Column:
    """Symmetric per-vector int8 quantization: scale = 127 / max|x|,
    code_i = floor(x_i·scale + 0.5) ∈ [-127, 127] (half-up rounding —
    floor(+0.5) — because it is bit-identical across engines, unlike
    banker's rounding). A zero vector quantizes to all-zero codes.

    The scale itself never needs to be carried for COSINE search: it
    cancels in dot/(|a|·|b|). That is the point of the int8 tier — the
    shuffled/broadcast payload drops 4× (int8-valued ints vs floats) and
    every downstream dot product becomes exact integer arithmetic."""
    amax = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    scale = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(0.0))
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("int")
    )


def _int_dot(a: Column, b: Column) -> Column:
    # exact: |products| <= 127² and dim·127² fits comfortably in a long
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )


def int8_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """Quantized brute-force top-k: cosine over int8 codes instead of
    floats — (qid, vec_id, q_cos, rn). Same broadcast-queries/stream-corpus
    shape as cosine_topk, but the inner loop is integer multiply-adds (the
    dot and both norms are EXACT integers; the only floating point is one
    sqrt+division per pair), so results are bit-reproducible across
    engines, partitionings and SIMD widths — no float-summation-order
    hazard at all. Ranking quality vs exact cosine is pinned by the recall
    test (test_int8_topk_recall_vs_exact)."""
    # norms are per-VECTOR quantities: compute them once per side before
    # the join, not per candidate pair — per-pair only the dot remains,
    # cutting the inner-loop HOF folds from 3 to 1 (norms are O(Q + N)
    # instead of O(Q·N))
    qv = queries.select(
        F.col(query_id_col).alias("qid"), int8_codes(F.col(vec_col)).alias("qq")
    ).withColumn("n2a", _int_dot(F.col("qq"), F.col("qq")))
    cv = corpus.select(
        F.col(id_col).alias("vec_id"), int8_codes(F.col(vec_col)).alias("cq")
    ).withColumn("n2b", _int_dot(F.col("cq"), F.col("cq")))
    scored = (
        cv.join(F.broadcast(qv), F.col("vec_id") != F.col("qid"))
        .withColumn("dot", _int_dot(F.col("qq"), F.col("cq")))
        .withColumn(
            "sim",
            F.when(
                (F.col("n2a") > 0) & (F.col("n2b") > 0),
                F.col("dot")
                / (F.sqrt(F.col("n2a").cast("double")) * F.sqrt(F.col("n2b").cast("double"))),
            ).otherwise(F.lit(0.0)),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.select("qid", "vec_id", "sim")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "qid",
            "vec_id",
            F.round("sim", 6).alias("q_cos"),
            F.col("rn").cast("int"),
        )
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (driver-side, tiny, broadcast)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def bucket_id(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket: one bit per hyperplane.

    The planes ride in ONE flat literal (see ``_flat_double_literal``);
    each plane's static slice constant-folds back to a per-plane array
    literal, so the executed plan is unchanged while construction drops
    from n_planes·dim ``F.lit`` py4j calls to one."""
    dim = len(planes[0])
    # public helper: a ragged planes list would silently mis-slice the
    # flat literal into wrong per-plane weights (ADVICE r15) — error out
    if any(len(p) != dim for p in planes):
        raise ValueError(
            f"bucket_id: all hyperplanes must have dim {dim}, got lengths "
            f"{sorted({len(p) for p in planes})}"
        )
    flat = _flat_double_literal(w for plane in planes for w in plane)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.slice(flat, p * dim + 1, dim),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for p in range(len(planes))
    ]
    out = F.lit(0)
    for b in bits:
        out = out * 2 + b
    return out


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only same-bucket candidates.

    Multi-probe: each query also probes the ``n_probes - 1`` buckets at
    Hamming distance 1 (flipping the lowest bits), trading extra candidate
    scans for recall. At scale the corpus would be written bucket-
    partitioned so a probe is a partition-pruned read."""
    planes = random_hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        bucket_id(F.col(vec_col), planes).alias("bucket"),
    )
    probe_offsets = [0] + [1 << i for i in range(max(n_probes - 1, 0))]
    q = queries.select(
        F.col(query_id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        bucket_id(F.col(vec_col), planes).alias("qbucket"),
    ).select(
        "qid",
        "qv",
        F.explode(
            F.array_distinct(
                F.array(*[F.col("qbucket").bitwiseXOR(F.lit(o)) for o in probe_offsets])
            )
        ).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("sim", cosine_similarity(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.select("qid", "vec_id", "sim")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "qid", "vec_id", F.round("sim", 6).alias("cos_sim"), F.col("rn").cast("int")
        )
    )


def auto_n_centroids(n_rows: int, floor: int = 16, cap: int = 65536) -> int:
    """Scale-adaptive IVF centroid count: ``⌈√n⌉`` clamped to
    [floor, cap] — the classical IVF balance point (√n lists of √n
    vectors each equalizes the assignment cost n·√n-matmul against the
    probe cost n_probes·√n, and keeps per-list size flat as n grows).
    SCALING.md r5/r6 measured the fixed-64 default at 6.7× wall for 10×
    data precisely because list size grew linearly; √n restores the
    sublinear regime. The cap bounds the driver-side model broadcast
    (65536 × dim doubles ≈ 32 MB at dim 64 — the "broadcast the model"
    ceiling); past it, probes shrink relative to n again and a second
    quantization level (IVF-PQ) is the documented next tier."""
    import math

    return max(floor, min(cap, math.isqrt(max(n_rows, 1) - 1) + 1))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int | None = 64,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    centroid_strategy: str = "lowest_id",
    kmeans_iters: int = 2,
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into inverted
    lists by nearest centroid; queries scan only their ``n_probes``
    closest lists.

    ``n_centroids=None`` derives the list count from the corpus size as
    ``⌈√n⌉`` (see auto_n_centroids — VERDICT r6's one known 100×-scale
    degradation was this knob staying fixed at 64 while lists grew
    linearly). The count must stay SUBLINEAR in the corpus (∝ n the
    assignment degenerates to O(n²) compute plus a corpus-proportional
    model broadcast); pass an explicit int when an oracle needs to replay
    the exact list structure. The size probe is one ``corpus.count()`` —
    driver-cheap (parquet row-count metadata / one count job), run once
    at build time like the centroid fit itself.

    ``centroid_strategy`` picks how the inverted lists are trained —
    both deterministic and oracle-replayable:

    - ``"lowest_id"``: the ``n_centroids`` lowest-id vectors (a
      TakeOrdered, no full sort). Cheapest; list quality is whatever the
      id order happens to give.
    - ``"kmeans"``: ``clustering.kmeans_fit`` centroids (``kmeans_iters``
      Lloyd rounds over the int64-quantized corpus, exact fixed-point
      early stop). Lists follow the data's actual density, so recall at
      equal ``n_probes`` is ≥ the sample lists' on clustered data
      (pinned by tests/test_clustering.py); costs ``kmeans_iters``
      extra aggregate jobs at build time.

    The tiny centroid table is collected driver-side and shipped in the
    UDF closure (the "broadcast the model" pattern), so assignment is a
    shuffle-free vectorized matmul over each Arrow batch. At warehouse
    scale the corpus is written partitioned by ``centroid_id`` so a
    probe is a partition-pruned scan.

    NOTE: building the plan runs eager driver-side jobs (the centroid
    collect / k-means fit) — this function is not lazily composable;
    call it when you mean to execute. Zero-norm vectors are guarded in
    the assignment matmul (treated as norm 1 → similarity 0 to every
    centroid → deterministic assignment to the first/lowest-cid list)
    instead of propagating NaN into argmax.
    """
    from pyspark.sql import functions as SF

    if n_centroids is None:
        n_centroids = auto_n_centroids(corpus.count())

    # The centroid table is collected driver-side (n_centroids rows — the
    # "broadcast the model" pattern every ML scoring pipeline uses) and the
    # assignment becomes ONE vectorized matmul per Arrow batch, zero joins,
    # zero shuffles. The declarative alternative (corpus × broadcast(cents)
    # join + per-pair HOF cosine) evaluates interpreted array arithmetic
    # per element — measured ~2.6 s for 128 k pairs at sf0.1, ~10× slower
    # than numpy on the same work. Assignment maps each vector to its list;
    # the candidate scoring below stays fully declarative.
    if centroid_strategy == "kmeans":
        from tabular_cdc_bootstrapper_spark.functions.clustering import (
            dequantize_centroids,
            kmeans_fit,
        )

        cents, _ = kmeans_fit(
            corpus, vec_col=vec_col, id_col=id_col, k=n_centroids,
            max_iters=kmeans_iters,
        )
        cids = list(range(len(cents)))  # argmax tie → lowest cid
        cmat = np.array(dequantize_centroids(cents), dtype=np.float64)
    elif centroid_strategy == "lowest_id":
        cent_rows = (
            corpus.orderBy(F.col(id_col))
            .limit(n_centroids)
            .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
            .collect()
        )
        cids = [int(r["cid"]) for r in cent_rows]  # ascending — argmax tie → lowest cid
        cmat = np.array([r["cv"] for r in cent_rows], dtype=np.float64)
    else:
        raise ValueError(
            f"unknown centroid_strategy {centroid_strategy!r}; "
            "use 'lowest_id' or 'kmeans'"
        )
    cnorm = np.linalg.norm(cmat, axis=1, keepdims=True)
    cmat = cmat / np.where(cnorm == 0, 1.0, cnorm)

    def _sims(vecs: pd.Series) -> np.ndarray:
        x = np.array(vecs.tolist(), dtype=np.float64)
        norm = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.where(norm == 0, 1.0, norm)  # zero vec → sims 0, not NaN
        return x @ cmat.T  # (batch, n_centroids)

    @SF.pandas_udf("long")
    def nearest_list(vecs: pd.Series) -> pd.Series:
        if vecs.empty:
            return pd.Series([], dtype="int64")
        idx = np.argmax(_sims(vecs), axis=1)  # first max → lowest cid on ties
        return pd.Series([cids[i] for i in idx])

    @SF.pandas_udf("array<long>")
    def nearest_lists_topn(vecs: pd.Series) -> pd.Series:
        if vecs.empty:
            return pd.Series([], dtype="object")
        order = np.argsort(-_sims(vecs), axis=1, kind="stable")[:, :n_probes]
        return pd.Series([[cids[i] for i in row] for row in order])

    c_assigned = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        nearest_list(F.col(vec_col)).alias("list_id"),
    )
    q_assigned = queries.select(
        F.col(query_id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        F.explode(nearest_lists_topn(F.col(vec_col))).alias("list_id"),
    )
    # no distinct(): each corpus vector lives in exactly ONE list, so a
    # (qid, vec_id) pair can meet at most once — a distinct here would be a
    # pure extra shuffle. q_assigned is n_queries × n_probes rows (vectors
    # included), broadcastable by the operator's small-query-set contract.
    scored = (
        c_assigned.join(F.broadcast(q_assigned), "list_id")
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("sim", cosine_similarity(F.col("qv"), F.col("v")))
        .select("qid", "vec_id", "sim")
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "qid", "vec_id", F.round("sim", 6).alias("cos_sim"), F.col("rn").cast("int")
        )
    )


def _unit(vec: Column) -> Column:
    """Unit-normalize an array<float/double> column; a zero vector stays
    all-zero (cosine 0 to everything) instead of propagating NaN."""
    n = _norm(vec)
    return F.transform(
        vec,
        lambda x: F.when(n > 0, x.cast("double") / n).otherwise(F.lit(0.0)),
    )


def train_pq_codebooks(
    corpus: DataFrame,
    n_subspaces: int,
    n_codes: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "lowest_id",
    sample_size: int = 2048,
    kmeans_iters: int = 8,
) -> "np.ndarray":
    """(n_subspaces, n_codes, sub_dim) PQ codebooks from a bounded
    deterministic sample of the corpus.

    - ``"lowest_id"``: the ``n_codes`` lowest-id normalized vectors'
      subvectors — cheapest, fully SQL-replayable (the registry oracle's
      choice).
    - ``"kmeans"``: per-subspace Lloyd k-means (numpy, driver-side) over
      the ``sample_size`` lowest-id normalized vectors — standard PQ
      training (codebooks fit the data's subspace density, so encode
      error and hence shortlist recall improve; pinned by
      test_pq_kmeans_codebooks_beat_sample on clustered data). The
      sample collect is bounded (~sample_size·dim doubles ≈ 1 MB at the
      defaults) and the seed path is deterministic: init = the first
      ``n_codes`` sample subvectors, ties → lowest index, empty clusters
      keep their previous centroid — no RNG anywhere."""
    import numpy as np

    sub_dim = dim // n_subspaces
    n_rows = n_codes if strategy == "lowest_id" else sample_size
    sample = (
        corpus.orderBy(F.col(id_col))
        .limit(n_rows)
        .select(_unit(F.col(vec_col)).alias("v"))
        .collect()
    )
    x = np.array([r["v"] for r in sample], dtype=np.float64)
    return _codebooks_from_sample(
        x, n_subspaces, n_codes, sub_dim, strategy, kmeans_iters
    )


def _codebooks_from_sample(
    x, n_subspaces: int, n_codes: int, sub_dim: int,
    strategy: str, kmeans_iters: int,
) -> "np.ndarray":
    """Codebooks from an already-collected (n, dim) unit-vector sample —
    the driver-side half of ``train_pq_codebooks``, shared with the fused
    one-pass trainer ``_ivf_pq_models`` (r15)."""
    import numpy as np

    if strategy == "lowest_id":
        return x.reshape(len(x), n_subspaces, sub_dim).transpose(1, 0, 2)
    if strategy != "kmeans":
        raise ValueError(f"unknown codebook strategy {strategy!r}")
    xs = x.reshape(len(x), n_subspaces, sub_dim)
    # a corpus smaller than n_codes yields a short init slice: clamp the
    # codebook to the sample size (the same graceful degradation the
    # lowest_id strategy gets for free) instead of a numpy broadcast
    # ValueError at books[s] = cents (ADVICE r7)
    n_codes = min(n_codes, len(x))
    books = np.empty((n_subspaces, n_codes, sub_dim), dtype=np.float64)
    for s in range(n_subspaces):
        pts = xs[:, s, :]
        cents = pts[:n_codes].copy()  # deterministic init
        for _ in range(kmeans_iters):
            d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)  # first-min → lowest code on ties
            new = cents.copy()  # empty cluster keeps previous centroid
            for c in range(n_codes):
                members = pts[assign == c]
                if len(members):
                    new[c] = members.mean(axis=0)
            if np.array_equal(new, cents):
                break
            cents = new
        books[s] = cents
    return books


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_subspaces: int = 8,
    n_codes: int = 16,
    shortlist: int = 50,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    codebook_strategy: str = "lowest_id",
) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance shortlisting and
    exact rerank — the second quantization tier past int8 (the
    "IVF-PQ is the next tier" note at auto_n_centroids, substantiated):

    1. TRAIN: the codebook for subspace s is the s-th ``dim/n_subspaces``-
       dim slice of the ``n_codes`` LOWEST-id unit-normalized corpus
       vectors (the same deterministic, oracle-replayable strategy as
       ivf_topk's ``lowest_id`` lists; k-means-trained codebooks are the
       quality upgrade, exactly as for IVF).
    2. ENCODE: each unit-normalized corpus vector → ``n_subspaces`` bytes
       (argmin-L2 codeword per subspace, ties → lowest code) via one
       Arrow-batched matmul — at 2048 codes that is 256 floats → 8 bytes,
       a 128× payload cut; at warehouse scale codes are written once at
       ingest and the float column never ships to search.
    3. SEARCH (ADC): a query's similarity to a candidate is approximated
       by Σ_s ⟨q_s, codebook_s[code_s]⟩ — computed JVM-side with
       higher-order functions against the codebook inlined as a literal
       (n_subspaces·n_codes·sub_dim doubles, KB-sized), so the corpus
       streams through with only its codes; top-``shortlist`` candidates
       per query survive (ties → lowest vec_id).
    4. RERANK: exact float cosine over the shortlist only (candidate-
       sized join), final top-``k`` by exact similarity.

    The rerank makes the OUTPUT exact-cosine-ranked over the shortlist, so
    quantization error only costs recall (pinned ≥ the measured floor by
    tests), never ranking fidelity. Query side broadcasts; the only
    exchange is the per-qid ranking window over (ids, score) — plan
    pinned."""
    import numpy as np
    from pyspark.sql import functions as SF

    sub_dim = dim // n_subspaces
    if sub_dim * n_subspaces != dim:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")

    # --- train: bounded driver-side collect, normalized (strategy-driven
    # — "kmeans" is the measured-recall upgrade, "lowest_id" the
    # oracle-replayable default; see train_pq_codebooks)
    cb_sub = train_pq_codebooks(
        corpus, n_subspaces, n_codes, dim, id_col, vec_col, codebook_strategy
    )
    # (n_subspaces, n_codes, sub_dim) — shipped two ways: in the encode
    # UDF closure (broadcast-the-model) and as a plan literal for ADC
    cb_lit = _codebook_literal(cb_sub)

    @SF.pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        if vecs.empty:
            return pd.Series([], dtype="object")
        x = np.array(vecs.tolist(), dtype=np.float64)
        nrm = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.where(nrm == 0, 1.0, nrm)
        xs = x.reshape(len(x), n_subspaces, sub_dim)
        codes = np.empty((len(x), n_subspaces), dtype=np.int64)
        for s in range(n_subspaces):
            # (batch, codes) squared L2; argmin takes the FIRST (lowest
            # code) on ties — the oracle's ORDER BY dist, code twin
            d = ((xs[:, s, None, :] - cb_sub[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d, axis=1)
        return pd.Series(codes.tolist())

    c_codes = _spread_for_encode(corpus).select(
        F.col(id_col).alias("vec_id"),
        encode(F.col(vec_col)).alias("codes"),
    )
    qv = queries.select(
        F.col(query_id_col).alias("qid"), _unit(F.col(vec_col)).alias("qv")
    )

    # ADC: fold over subspace index; slice the query, index the literal
    # codebook by (subspace, code) — all JVM-side, no Python in the scan
    adc = _adc_over_codes(cb_lit, n_subspaces, n_codes, sub_dim)
    w_short = Window.partitionBy("qid").orderBy(F.col("adc").desc(), F.col("vec_id"))
    shortlisted = (
        c_codes.join(F.broadcast(qv), F.col("vec_id") != F.col("qid"))
        .withColumn("adc", adc)
        .select("qid", "vec_id", "adc")
        .withColumn("srn", F.row_number().over(w_short))
        .filter(F.col("srn") <= shortlist)
        .select("qid", "vec_id")
    )

    # exact rerank over the candidate-sized shortlist only. r15: the
    # SHORTLIST side broadcasts (qid·shortlist rows, the provably small
    # side) and the corpus streams — Catalyst's estimates used to pick
    # the corpus-units subtree as the build side, computing _unit over
    # the WHOLE corpus single-threaded inside one BroadcastExchange task
    # (profiled 2.5 s of the 4.7 s query at sf0.1). Normalizing AFTER
    # the join touches only the surviving candidates.
    cand = (
        F.broadcast(shortlisted)
        .join(
            corpus.select(
                F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cvr")
            ),
            "vec_id",
        )
        .join(F.broadcast(qv), "qid")
        .withColumn("cv", _unit(F.col("__cvr")))
    )
    w_final = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        cand.withColumn("sim", _dot(F.col("qv"), F.col("cv")))
        .select("qid", "vec_id", "sim")
        .withColumn("rn", F.row_number().over(w_final))
        .filter(F.col("rn") <= k)
        .select(
            "qid", "vec_id", F.round("sim", 6).alias("cos_sim"), F.col("rn").cast("int")
        )
    )


def _flat_double_literal(values) -> Column:
    """An iterable of floats → ONE ``array<double>`` plan literal, built
    as a single string literal + split + cast, which Catalyst
    constant-folds into one Literal node (split/cast are foldable over a
    foldable child). The nested ``F.array(F.lit(...))`` alternative costs
    one py4j call per element to CONSTRUCT and as many Literal nodes for
    the analyzer/optimizer to walk — ~1.2k per ANN query at the bench
    shape, measured as driver-side planning time (OPTIMIZATION_r15.md
    #8). Bit-exact: ``repr`` of a Python float is shortest-roundtrip and
    Spark's string→double cast parses correctly rounded, so every double
    survives unchanged."""
    flat = ",".join(repr(float(x)) for x in values)
    return F.split(F.lit(flat), ",").cast("array<double>")


def _codebook_literal(cb_sub) -> Column:
    """(n_subspaces, n_codes, sub_dim) numpy codebooks → ONE flat
    ``array<double>`` plan literal (KB-scale) so ADC scoring stays
    JVM-side in the scan; index it with :func:`_cb_entry`."""
    return _flat_double_literal(
        x for s in range(len(cb_sub)) for code in cb_sub[s] for x in code
    )


def _cb_entry(cb_lit: Column, s, code, n_codes: int, sub_dim: int) -> Column:
    """``codebook[s][code]`` — a ``sub_dim`` slice of the flat literal;
    ``s``/``code`` are 0-based ints or int Columns."""
    return F.slice(cb_lit, (s * n_codes + code) * sub_dim + 1, sub_dim)


def _ivf_centroid_model(
    corpus: DataFrame, n_centroids: int, id_col: str, vec_col: str
):
    """Deterministic IVF model: the ``n_centroids`` lowest-id RAW vectors
    (the ivf_topk contract — oracle-replayable). Bounded driver collect;
    returns (cids, cmat raw, cmat_n row-normalized)."""
    import numpy as np

    cent_rows = (
        corpus.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .collect()
    )
    cids = [int(r["cid"]) for r in cent_rows]
    cmat = np.array([r["cv"] for r in cent_rows], dtype=np.float64)
    cnorm = np.linalg.norm(cmat, axis=1, keepdims=True)
    return cids, cmat, cmat / np.where(cnorm == 0, 1.0, cnorm)


def _ivf_pq_models(
    corpus: DataFrame,
    n_centroids: int,
    n_subspaces: int,
    n_codes: int,
    dim: int,
    id_col: str,
    vec_col: str,
    strategy: str = "lowest_id",
    sample_size: int = 2048,
    kmeans_iters: int = 8,
):
    """Both standing models from ONE lowest-id corpus pass (r15
    optimization round): the separate ``_ivf_centroid_model`` +
    ``train_pq_codebooks`` calls each ran their own orderBy+limit top-k
    scan of the corpus — this collects max(n_centroids, codebook sample)
    lowest-id rows ONCE with both the raw vector (IVF centroids) and the
    Spark-side unit vector (PQ codebook sample — computed by the same
    ``_unit`` expression, so the models are bit-identical to the
    two-pass form). Returns (cids, cmat, cmat_n, cb_sub)."""
    import numpy as np

    sub_dim = dim // n_subspaces
    n_rows = n_codes if strategy == "lowest_id" else sample_size
    rows = (
        corpus.orderBy(F.col(id_col))
        .limit(max(n_centroids, n_rows))
        .select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cv"),
            _unit(F.col(vec_col)).alias("uv"),
        )
        .collect()
    )
    cents = rows[:n_centroids]
    cids = [int(r["cid"]) for r in cents]
    cmat = np.array([r["cv"] for r in cents], dtype=np.float64)
    cnorm = np.linalg.norm(cmat, axis=1, keepdims=True)
    cmat_n = cmat / np.where(cnorm == 0, 1.0, cnorm)
    x = np.array([r["uv"] for r in rows[:n_rows]], dtype=np.float64)
    cb_sub = _codebooks_from_sample(
        x, n_subspaces, n_codes, sub_dim, strategy, kmeans_iters
    )
    return cids, cmat, cmat_n, cb_sub


def _spread_for_encode(df: DataFrame) -> DataFrame:
    """Raise map-side parallelism for the Arrow encode pass when the scan
    yields fewer partitions than the session's parallelism (a single
    small parquet file plans as ONE split, so the whole pandas-UDF encode
    ran in one task). The round-robin repartition only fires under that
    condition — small input by construction, so the extra exchange is
    cheap — and is a structural no-op at warehouse scale, where input
    splits already exceed the core count (guide §2.5 input-skew rule:
    repartition immediately after a low-split read)."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def _assign_encode_udf(cids, cmat_n, cb_sub):
    """Arrow-batched (IVF list, PQ codes) encoder from the two standing
    models: one matmul per batch for the list argmax (first-max → lowest
    centroid position on ties), argmin-L2 per subspace for codes (first-
    min → lowest code). Shared by the inline ivf_pq_topk and the
    persisted-index build/append paths so their encodings are identical
    by construction. The closure is self-contained (models captured by
    value, imports inside) so workers need not import this package."""
    from pyspark.sql import functions as SF

    n_subspaces, _, sub_dim = cb_sub.shape

    @SF.pandas_udf("struct<list_id: long, codes: array<int>>")
    def assign_and_encode(vecs: pd.Series) -> pd.DataFrame:
        import numpy as np
        import pandas as _pd

        if vecs.empty:
            return _pd.DataFrame({"list_id": [], "codes": []})
        x = np.array(vecs.tolist(), dtype=np.float64)
        nrm = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.where(nrm == 0, 1.0, nrm)
        lists = [cids[i] for i in np.argmax(x @ cmat_n.T, axis=1)]
        xs = x.reshape(len(x), n_subspaces, sub_dim)
        codes = np.empty((len(x), n_subspaces), dtype=np.int64)
        for s in range(n_subspaces):
            d = ((xs[:, s, None, :] - cb_sub[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d, axis=1)
        return _pd.DataFrame({"list_id": lists, "codes": codes.tolist()})

    return assign_and_encode


def _probe_lists_udf(cids, cmat_n, n_probes):
    from pyspark.sql import functions as SF

    @SF.pandas_udf("array<long>")
    def probe_lists(vecs: pd.Series) -> pd.Series:
        import numpy as np
        import pandas as _pd

        if vecs.empty:
            return _pd.Series([], dtype="object")
        x = np.array(vecs.tolist(), dtype=np.float64)
        nrm = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.where(nrm == 0, 1.0, nrm)
        order = np.argsort(-(x @ cmat_n.T), axis=1, kind="stable")[:, :n_probes]
        return _pd.Series([[cids[i] for i in row] for row in order])

    return probe_lists


def _adc_over_codes(
    cb_lit: Column, n_subspaces: int, n_codes: int, sub_dim: int
) -> Column:
    """ADC score Σ_s ⟨qv_s, codebook_s[code_s]⟩ over columns ``codes`` and
    ``qv`` — all JVM-side higher-order functions, subspace-ordered fold so
    the float summation order matches the oracle's s-ORDERED list_sum."""
    idx = F.sequence(F.lit(0), F.lit(n_subspaces - 1))
    return F.aggregate(
        F.zip_with(
            F.col("codes"),
            idx,
            lambda code, s: _dot(
                F.slice(F.col("qv"), s * sub_dim + 1, sub_dim),
                _cb_entry(cb_lit, s, code, n_codes, sub_dim),
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int | None = 64,
    n_probes: int = 4,
    n_subspaces: int = 8,
    n_codes: int = 16,
    shortlist: int = 50,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """IVF-PQ: the composed warehouse ANN index — IVF list pruning
    (ivf_topk's lowest-id centroid assignment) on top of PQ-ADC scoring
    (pq_adc_topk's codebook), with the exact-cosine rerank closing the
    pipeline. A query touches only its ``n_probes`` inverted lists, and
    within them scores 8-byte PQ codes against the literal codebook — the
    float column is read only for the ``shortlist`` rerank candidates.

    At 100 TB: the corpus is written partitioned by ``list_id`` carrying
    only (id, codes) — a probe is a partition-pruned scan of ~n/c · p
    rows × 8 bytes; both models (centroids + codebook) are KB-scale
    driver-side artifacts trained once. ``n_centroids=None`` derives
    ⌈√n⌉ via auto_n_centroids. Both stages use the deterministic
    lowest-id training strategy, so the whole pipeline is replayable by
    the DuckDB oracle (k-means-trained centroids/codebooks are the
    quality upgrade, as with ivf_topk)."""
    if n_centroids is None:
        n_centroids = auto_n_centroids(corpus.count())
    sub_dim = dim // n_subspaces
    if sub_dim * n_subspaces != dim:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")

    # --- both standing models from ONE lowest-id pass (r15): IVF
    # centroids (raw vectors, ivf_topk contract) + PQ codebooks
    # (lowest-id normalized sample) — bit-identical to the two-scan form
    cids, _cmat, cmat_n, cb_sub = _ivf_pq_models(
        corpus, n_centroids, n_subspaces, n_codes, dim,
        id_col, vec_col, "lowest_id",
    )
    cb_lit = _codebook_literal(cb_sub)
    assign_and_encode = _assign_encode_udf(cids, cmat_n, cb_sub)
    probe_lists = _probe_lists_udf(cids, cmat_n, n_probes)

    c_idx = _spread_for_encode(corpus).select(
        F.col(id_col).alias("vec_id"),
        assign_and_encode(F.col(vec_col)).alias("ae"),
    ).select("vec_id", F.col("ae.list_id").alias("list_id"), F.col("ae.codes").alias("codes"))
    qv = queries.select(
        F.col(query_id_col).alias("qid"),
        _unit(F.col(vec_col)).alias("qv"),
        F.explode(probe_lists(F.col(vec_col))).alias("list_id"),
    )

    adc = _adc_over_codes(cb_lit, n_subspaces, n_codes, sub_dim)
    w_short = Window.partitionBy("qid").orderBy(F.col("adc").desc(), F.col("vec_id"))
    shortlisted = (
        c_idx.join(F.broadcast(qv), "list_id")
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("adc", adc)
        .select("qid", "vec_id", "adc")
        .withColumn("srn", F.row_number().over(w_short))
        .filter(F.col("srn") <= shortlist)
        .select("qid", "vec_id")
    )
    q_only = qv.select("qid", "qv").dropDuplicates(["qid"])
    # r15: broadcast the provably-small shortlist, stream the corpus,
    # normalize only the surviving candidates (see pq_adc_topk note)
    cand = (
        F.broadcast(shortlisted)
        .join(
            corpus.select(
                F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cvr")
            ),
            "vec_id",
        )
        .join(F.broadcast(q_only), "qid")
        .withColumn("cv", _unit(F.col("__cvr")))
    )
    w_final = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        cand.withColumn("sim", _dot(F.col("qv"), F.col("cv")))
        .select("qid", "vec_id", "sim")
        .withColumn("rn", F.row_number().over(w_final))
        .filter(F.col("rn") <= k)
        .select(
            "qid", "vec_id", F.round("sim", 6).alias("cos_sim"), F.col("rn").cast("int")
        )
    )
