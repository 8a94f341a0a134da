"""k-means (functions/clustering.py): recovers separable clusters, handles
empty clusters deterministically, and its quantization is exact for
power-of-two-friendly inputs. Oracle parity at the fixture scale is covered
by test_oracle_parity (kmeans_embedding_clusters)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tabular_cdc_bootstrapper_spark.functions.clustering import (
    kmeans_fit_predict,
    quantize_vectors,
)


def _vec_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_kmeans_recovers_separated_clusters(spark):
    """Two tight, far-apart blobs: every point must land with its blob,
    whatever the (deterministic lowest-id) init picked."""
    blob_a = [(i, [0.0 + 0.01 * i, 0.0]) for i in range(5)]
    blob_b = [(10 + i, [100.0 + 0.01 * i, 100.0]) for i in range(5)]
    df = _vec_df(spark, blob_a + blob_b)
    got = {r["id"]: r["cid"] for r in kmeans_fit_predict(df, k=2, iters=3).collect()}
    a_cids = {got[i] for i, _ in blob_a}
    b_cids = {got[i] for i, _ in blob_b}
    assert len(a_cids) == 1 and len(b_cids) == 1 and a_cids != b_cids


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """k=3 over 2 distinct locations: one centroid goes memberless; the
    run must stay deterministic and still assign every point."""
    df = _vec_df(spark, [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [50.0, 50.0])])
    out = kmeans_fit_predict(df, k=3, iters=2).collect()
    assert len(out) == 3
    assert {r["id"] for r in out} == {0, 1, 2}


def test_kmeans_deterministic_across_runs(spark):
    df = _vec_df(
        spark, [(i, [float((i * 7) % 13), float((i * 3) % 5)]) for i in range(40)]
    )
    a = sorted(map(tuple, kmeans_fit_predict(df, k=4, iters=2).collect()))
    b = sorted(map(tuple, kmeans_fit_predict(df, k=4, iters=2).collect()))
    assert a == b


def test_quantization_is_exact_scaling(spark):
    """Power-of-two scaling of float32 is exact in double: 0.5 → exactly
    524288, -1.25 → exactly -1310720 (no rounding drift)."""
    df = _vec_df(spark, [(0, [0.5, -1.25])])
    (row,) = quantize_vectors(df).collect()
    assert list(row["qv"]) == [524288, -1310720]
