"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard.

Scale design (the whole point — 100 TB of documents):

- Exact dedup is one hash-groupBy: map-side partial agg on the digest, one
  shuffle of (digest → doc ids), no text movement after the first project.
- MinHash/LSH avoids the O(n²) pair space: signatures are computed per
  document in a single scan with higher-order functions (no Python UDF, no
  Arrow hop), then candidate pairs come from a self-equi-join on
  (band_id, band_hash) — a shuffle keyed on bucket, so only colliding
  documents ever meet. Verification (exact shingle Jaccard) runs only on
  candidates.
- Skew guard: pathological buckets (boilerplate text → thousands of docs in
  one band bucket) are capped by ``max_bucket_size`` before the pair
  explosion, the standard trick for keeping the join skew-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized(text: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group exact duplicates by content digest.

    Returns (digest, canonical_id, n_copies, ids). md5 is used for the
    digest because every engine agrees on it (oracle-checkable); xxhash64
    is the cheaper in-plan choice when cross-engine parity isn't needed.
    """
    d = df.select(
        F.md5(normalized(F.col(text_col))).alias("digest"), F.col(id_col).alias("id")
    )
    return d.groupBy("digest").agg(
        F.min("id").alias("canonical_id"),
        F.count("*").alias("n_copies"),
        F.sort_array(F.collect_list("id")).alias("ids"),
    )


def _shingles_from_tokens(toks: Column, text: Column, k: int) -> Column:
    """k-shingles from a tokens ATTRIBUTE (not expression).

    CRITICAL perf contract: ``toks`` must be a bound column attribute, not
    an inline ``split(...)`` expression — expressions referenced inside a
    ``transform`` lambda are re-evaluated per array element, so an inline
    split would re-tokenize the document once per shingle (measured ~40×
    slowdown at sf0.1). Use ``shingles_df`` which stages the projections.
    """
    n = F.size(toks)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
            )
        ),
    ).otherwise(F.array(F.trim(text)))


def shingle_tokens(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles of a document (array<string>).

    Column-level convenience for small inputs/tests; the scan pipelines use
    ``shingles_df`` (staged projections) — see _shingles_from_tokens note.
    """
    return _shingles_from_tokens(F.split(F.trim(text), r"\s+"), text, k)


def shingles_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, sh): staged tokenize → shingle projection (each intermediate is
    an attribute by the time a lambda touches it)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__text"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks"),
    )
    return toks.select(
        "id",
        _shingles_from_tokens(F.col("__toks"), F.col("__text"), k).alias("sh"),
    )


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature (array<bigint>, length ``num_hashes``) from a
    *pre-hashed* or string shingle array — see ``minhash_signatures_df``
    for the staged (CSE-safe) form used by the pipeline.

    Hash family: xxhash64(shingle, seed_i) — independent 64-bit hashes per
    seed, all evaluated inside codegen.
    """
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def minhash_signatures_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """(id, sh, sig): shingles + MinHash signature, staged for performance.

    Three stacked projections, each aliasing a result the next references
    more than once — Catalyst's CollapseProject keeps non-cheap expressions
    that are multiply-referenced in their own stage, so: the shingle array
    is built ONCE, the expensive string hashing runs ONCE
    (``xxhash64(shingle)``), and the hash family is derived from the 64-bit
    base with cheap long re-hashes (``xxhash64(h, seed_i)``). The naive
    form (family hashes straight off the strings) re-builds the shingle
    array per hash — ~16× the work; measured 60× slower at sf0.1.
    """
    sh = shingles_df(df, text_col, id_col, k)
    hs = sh.select(
        "id", "sh", F.transform("sh", lambda s: F.xxhash64(s)).alias("hs")
    )
    return hs.select(
        "id",
        "sh",
        F.array(
            *[
                F.array_min(F.transform("hs", lambda h: F.xxhash64(h, F.lit(i))))
                for i in range(num_hashes)
            ]
        ).alias("sig"),
    )


def signature_bands(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Split a signature into ``bands`` hashed bands: array<struct<band_id,
    band_hash>>. Two docs collide in a band iff that band's rows all match."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[F.element_at(sig, b * rows_per_band + r + 1) for r in range(rows_per_band)]
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int = 200,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b), deduplicated across bands.

    Plan shape: scan → per-doc signature (no shuffle) → explode bands →
    shuffle on (band_id, band_hash) → within-bucket self-join → distinct
    pairs. ``max_bucket_size`` drops degenerate buckets before the join to
    bound the pair explosion (skew guard)."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures_df(df, text_col, id_col, k, num_hashes)
    band_hashes = F.array(
        *[
            F.xxhash64(
                *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]
            )
            for b in range(bands)
        ]
    )
    # (id, band_id, band_hash) — 4 skinny rows per doc. Persisted because the
    # bucket-count and both sides of the self-join reference it: without the
    # persist each reference re-runs the whole scan+signature pipeline (3×
    # the cost); at warehouse scale this is the signature index you'd land
    # in its own table.
    exploded = sigs.select(
        "id", F.posexplode(band_hashes).alias("band_id", "band_hash")
    ).persist()
    counts = exploded.groupBy("band_id", "band_hash").agg(F.count("*").alias("sz"))
    small = exploded.join(
        counts.filter(F.col("sz") <= max_bucket_size), ["band_id", "band_hash"]
    )
    left = small.select("band_id", "band_hash", F.col("id").alias("id_a"))
    right = small.select("band_id", "band_hash", F.col("id").alias("id_b"))
    return (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def verified_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.7,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """MinHash-LSH candidates verified with exact shingle Jaccard ≥
    ``threshold``. Returns (id_a, id_b, jaccard_sim). Only candidate pairs
    ever rejoin the shingle arrays, so the text is re-read for a tiny
    fraction of the corpus."""
    cands = minhash_candidates(df, text_col, id_col, k, num_hashes, bands)
    sh = shingles_df(df, text_col, id_col, k)
    pairs = (
        cands.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .withColumn("jaccard_sim", jaccard(F.col("sh_a"), F.col("sh_b")))
    )
    return pairs.filter(F.col("jaccard_sim") >= threshold).select(
        "id_a", "id_b", F.round("jaccard_sim", 6).alias("jaccard_sim")
    )


# ---------------------------------------------------------------------------
# SimHash: near-dup detection via Hamming distance on a 64-bit sketch.
# ---------------------------------------------------------------------------


def simhash_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """(id, simhash): 64-bit SimHash of the token multiset.

    Each token's 64-bit hash votes ±1 per bit position; the sign of each
    position's total becomes that bit. All JVM-side: token hashes staged
    once (attribute), then one aggregate per bit over the long array —
    cheap shifts/masks, no string re-hashing (same staging discipline as
    minhash_signatures_df).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks"),
    )
    th = toks.select(
        "id", F.transform("__toks", lambda t: F.xxhash64(t)).alias("__th")
    )
    bit_votes = [
        F.aggregate(
            "__th",
            F.lit(0),
            lambda acc, h: acc
            + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1).cast("int"),
        )
        for i in range(bits)
    ]
    sim = F.lit(0).cast("long")
    for i, v in enumerate(bit_votes):
        sim = sim.bitwiseOR(
            F.when(v > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return th.select("id", sim.alias("simhash"))


def hamming_distance(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ ``max_hamming``.

    Blocking: the 64-bit sketch splits into 4 16-bit bands; any pair within
    Hamming distance 3 agrees exactly on ≥1 band (pigeonhole), so the
    candidate join is an equi-join on (band_id, band_value) — same skew-
    guarded bucket shape as MinHash-LSH, no O(n²) scan.
    """
    sh = simhash_df(df, text_col, id_col).persist()
    bands = sh.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", b * 16).bitwiseAND(F.lit(0xFFFF))
                    for b in range(4)
                ]
            )
        ).alias("band_id", "band_value"),
    )
    counts = bands.groupBy("band_id", "band_value").agg(F.count("*").alias("sz"))
    small = bands.join(
        counts.filter(F.col("sz") <= max_bucket_size), ["band_id", "band_value"]
    )
    left = small.select("band_id", "band_value", F.col("id").alias("id_a"),
                        F.col("simhash").alias("sim_a"))
    right = small.select("band_id", "band_value", F.col("id").alias("id_b"),
                         F.col("simhash").alias("sim_b"))
    pairs = (
        left.join(right, ["band_id", "band_value"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming_distance(F.col("sim_a"), F.col("sim_b")).alias("hamming"))
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ threshold) via sign-random-
    projection buckets: highly similar vectors land in the same bucket with
    probability (1 - θ/π)^n_planes, so only same-bucket pairs are scored.
    Exact cosine verifies each candidate (same verify-after-block shape as
    MinHash → Jaccard)."""
    from tabular_cdc_bootstrapper_spark.functions.similarity import (
        bucket_id,
        cosine_similarity,
        random_hyperplanes,
    )

    planes = random_hyperplanes(dim, n_planes, seed)
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        bucket_id(F.col(vec_col), planes).alias("bucket"),
    ).persist()
    counts = b.groupBy("bucket").agg(F.count("*").alias("sz"))
    small = b.join(counts.filter(F.col("sz") <= max_bucket_size), "bucket")
    left = small.select("bucket", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    right = small.select("bucket", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine_similarity(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
        .distinct()
    )
