"""Nearest-class-mean (Rocchio) classification — the train/predict/evaluate
ML primitive for corpus curation, Spark-shaped and oracle-exact.

A fastText-style quality or language classifier has three pipeline stages:
featurize the corpus, fit a model, score every document. This module keeps
all three distributed and deterministic:

1. **Featurize** — integer features from codegen-side expressions (regex
   marker counts, token counts; no UDFs — the text scan dominates at
   100 TB and scoring must ride it).
2. **Fit** — the class model is the per-label feature MEAN: one map-side
   combinable groupBy aggregate over the corpus, then a BOUNDED model
   collect (n_classes × n_features ints — the kmeans "collect the model,
   never the data" contract). Means use integer trunc-division, so the
   model is bit-identical in any engine.
3. **Predict** — the collected centroid matrix is inlined as literal
   expressions: per-class squared-L2 distance is an exact-int64 codegen
   chain, argmin ties break to the lexicographically smallest label
   (array_min over (dist, label) structs). The corpus never shuffles for
   scoring.

Rocchio (nearest centroid) rather than logistic regression because its
training is CLOSED-FORM over integer sums — no learning rate, no RNG, no
transcendental functions — which is what lets a DuckDB oracle replay
fit + predict + confusion end-to-end (the same determinism rationale as
functions/clustering.py's integer k-means).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nearest_centroid_fit(
    df: DataFrame, label_col: str, feature_cols: list[str]
) -> dict[str, list[int]]:
    """Per-label integer feature means (trunc-div). One aggregate over the
    corpus; the returned model is n_classes × n_features ints."""
    aggs = [F.sum(c).cast("long").alias(c) for c in feature_cols]
    aggs.append(F.count("*").alias("__n"))
    # NULL labels carry no class: excluded from training (they would also
    # break the deterministic sorted-label tie-break in predict)
    rows = (
        df.filter(F.col(label_col).isNotNull())
        .groupBy(label_col)
        .agg(*aggs)
        .collect()
    )
    model: dict[str, list[int]] = {}
    for r in rows:
        n = r["__n"]
        cent = []
        for c in feature_cols:
            s = int(r[c])
            q = abs(s) // n  # trunc toward zero, matching the module
            cent.append(q if s >= 0 else -q)  # contract and the oracle's
        model[r[label_col]] = cent  # emulated trunc-div (kmeans _fit)
    return model


def nearest_centroid_predict(
    model: dict[str, list[int]], feature_cols: list[str], out_col: str = "pred"
) -> Column:
    """Column expression assigning each row the label of its nearest class
    mean (squared L2 over int64 features, ties → smallest label)."""
    scored = []
    for label in sorted(model):
        cent = model[label]
        dist = F.lit(0).cast("long")
        for c, ci in zip(feature_cols, cent):
            d = F.col(c).cast("long") - F.lit(ci).cast("long")
            dist = dist + d * d
        scored.append(F.struct(dist.alias("dist"), F.lit(label).alias("label")))
    return F.array_min(F.array(*scored))["label"].alias(out_col)


def nearest_centroid_fit_predict(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    out_col: str = "pred",
) -> DataFrame:
    """Fit on the labeled corpus, score every row with the fitted model
    (resubstitution — the evaluate step of the curation pipeline; at scale
    fit on a labeled sample table, predict over the full corpus with the
    same literal-model broadcast)."""
    model = nearest_centroid_fit(df, label_col, feature_cols)
    return df.withColumn(
        out_col, nearest_centroid_predict(model, feature_cols, out_col)
    )
