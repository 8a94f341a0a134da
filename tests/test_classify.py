"""Nearest-class-mean classifier (functions/classify.py): closed-form fit
matches hand-computed trunc-div means, prediction picks the nearest
centroid with deterministic tie-breaks, and scoring stays shuffle-free.
Oracle parity at fixture scale: test_oracle_parity (rocchio_lang_confusion)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tabular_cdc_bootstrapper_spark.functions.classify import (
    nearest_centroid_fit,
    nearest_centroid_fit_predict,
    nearest_centroid_predict,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "label string, f0 long, f1 long")


def test_fit_is_truncdiv_means(spark):
    df = _df(spark, [("a", 1, 10), ("a", 2, 11), ("b", 100, 0)])
    model = nearest_centroid_fit(df, "label", ["f0", "f1"])
    assert model == {"a": [1, 10], "b": [100, 0]}  # (1+2)//2 == 1


def test_predict_nearest_and_tie_breaks_to_smallest_label(spark):
    model = {"a": [0, 0], "b": [10, 0]}
    df = _df(spark, [("x", 2, 0), ("x", 9, 0), ("x", 5, 0)])  # 5 is equidistant
    got = [
        (r["f0"], r["p"])
        for r in df.select(
            "f0", nearest_centroid_predict(model, ["f0", "f1"], "p").alias("p")
        ).collect()
    ]
    assert dict(got) == {2: "a", 9: "b", 5: "a"}  # tie → 'a'


def test_fit_predict_recovers_separable_classes(spark):
    rows = [("lo", i, 0) for i in range(5)] + [("hi", 100 + i, 0) for i in range(5)]
    df = _df(spark, rows)
    out = nearest_centroid_fit_predict(df, "label", ["f0", "f1"])
    assert all(r["label"] == r["pred"] for r in out.collect())


def test_confusion_query_plan_single_shuffle(spark, sf_dir):
    """Featurize and score are narrow (codegen regex + literal model);
    the only exchange in the returned plan is the confusion groupBy."""
    from tabular_cdc_bootstrapper_spark import queries as q
    from tabular_cdc_bootstrapper_spark.plans.inspect import exchange_count

    df = q.rocchio_lang_confusion(spark, sf_dir)
    assert exchange_count(df) == 1


def test_classifier_scoring_runs_unchanged_on_a_stream(spark, tmp_path):
    """nearest_centroid_predict is a pure narrow expression over a LITERAL
    model, so the SAME scoring column runs on a streaming DataFrame with
    no twin needed (the serving path: fit offline on the labeled batch
    table, score the live stream). Pin it: file-source stream → score →
    memory sink equals the batch scoring exactly."""
    import uuid

    rows = [("a", 1, 0), ("a", 3, 0), ("b", 99, 0), ("b", 101, 0)]
    df = _df(spark, rows)
    model = nearest_centroid_fit(df, "label", ["f0", "f1"])
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    sink = f"scored_{uuid.uuid4().hex[:8]}"
    q = (
        stream.withColumn(
            "pred", nearest_centroid_predict(model, ["f0", "f1"], "pred")
        )
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.label, r.f0, r.pred)
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    want = {
        (r.label, r.f0, r.pred)
        for r in df.withColumn(
            "pred", nearest_centroid_predict(model, ["f0", "f1"], "pred")
        ).collect()
    }
    assert got == want
    assert {p for (_, _, p) in want} == {"a", "b"}


def test_fit_excludes_null_labels_and_truncdiv_negatives(spark):
    """NULL-labeled rows train nothing (and must not crash the sorted
    tie-break); negative feature sums divide toward zero, matching the
    module contract and the k-means oracle scheme."""
    df = spark.createDataFrame(
        [("a", -3, 0), ("a", 0, 0), (None, 999, 999)],
        "label string, f0 long, f1 long",
    )
    model = nearest_centroid_fit(df, "label", ["f0", "f1"])
    assert model == {"a": [-1, 0]}  # trunc(-3/2) = -1, not floor's -2
    out = nearest_centroid_fit_predict(df, "label", ["f0", "f1"])
    assert out.count() == 3  # null-labeled rows still get scored
