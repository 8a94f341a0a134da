"""Regression tests for the round-5 operator review findings: NULL-key /
NULL-group handling, salted outer-join duplication, as-of null timestamps
and tie determinism, max_by column order, BM25 query-term case, and the
empty-graph schema edge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tabular_cdc_bootstrapper_spark.operators.cdc import latest_by_key
from tabular_cdc_bootstrapper_spark.operators.incremental import maintain_agg
from tabular_cdc_bootstrapper_spark.operators.skew import salted_join


def test_maintain_agg_null_group_matches_recompute(spark):
    """NULL is a real group out of groupBy; the incremental merge must
    null-safely match it instead of splitting it into two rows."""
    mirror = spark.createDataFrame(
        [(1, None, 10.0), (2, None, 20.0), (3, "g", 5.0)],
        "id long, grp string, v double",
    )
    agg0 = mirror.groupBy("grp").agg(
        F.count("*").alias("n_rows"), F.sum("v").alias("s")
    )
    batch = spark.createDataFrame(
        [(1, None, 99.0, "U", 1), (4, None, 1.0, "I", 1)],
        "id long, grp string, v double, op string, ts long",
    )
    out = maintain_agg(
        agg0, mirror, batch, "grp", "id", "ts", {"s": "v"}, count_col="n_rows"
    ).collect()
    got = {r["grp"]: (r["n_rows"], r["s"]) for r in out}
    # recompute: null group = {1:99, 2:20, 4:1} → n=3, s=120; "g" untouched
    assert got == {None: (3, 120.0), "g": (1, 5.0)}


def test_maintain_agg_null_key_is_retracted(spark):
    """A mirror row with a NULL key must still be retracted when the batch
    touches the NULL key (plain equality semi-join would skip it)."""
    mirror = spark.createDataFrame(
        [(None, "a", 10.0), (2, "a", 20.0)], "id long, grp string, v double"
    )
    agg0 = mirror.groupBy("grp").agg(
        F.count("*").alias("n_rows"), F.sum("v").alias("s")
    )
    batch = spark.createDataFrame(
        [(None, "a", None, "D", 1)], "id long, grp string, v double, op string, ts long"
    )
    out = maintain_agg(
        agg0, mirror, batch, "grp", "id", "ts", {"s": "v"}, count_col="n_rows"
    ).collect()
    got = {r["grp"]: (r["n_rows"], r["s"]) for r in out}
    assert got == {"a": (1, 20.0)}  # the null-key row is gone


def test_salted_join_rejects_outer(spark):
    big = spark.createDataFrame([(1, "x")], "k long, a string")
    small = spark.createDataFrame([(1, "y")], "k long, b string")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="replicated small side"):
            salted_join(big, small, "k", how=how)
    # the legal forms still work
    assert salted_join(big, small, "k", how="inner").count() == 1
    assert salted_join(big, small, "k", how="left_anti").count() == 0


def test_asof_null_right_ts_is_excluded(spark):
    """A right row with NULL ts must never become a floor match."""
    from tabular_cdc_bootstrapper_spark.operators.asof import as_of_join

    left = spark.createDataFrame([(1, 10)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, None, "phantom")], "k long, rts long, v string"
    )
    (row,) = as_of_join(left, right, on="k", left_ts="lts", right_ts="rts").collect()
    assert row["v_asof"] is None


def test_asof_equal_ts_tie_is_deterministic_max(spark):
    from tabular_cdc_bootstrapper_spark.operators.asof import as_of_join

    left = spark.createDataFrame([(1, 10)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, 5, "A"), (1, 5, "B")], "k long, rts long, v string"
    )
    (row,) = as_of_join(left, right, on="k", left_ts="lts", right_ts="rts").collect()
    assert row["v_asof"] == "B"  # greatest payload struct wins the tie


def test_latest_by_key_preserves_column_order(spark):
    df = spark.createDataFrame([(5, "x", 1), (6, "y", 1)], "ts long, val string, id long")
    for strategy in ("max_by", "window"):
        out = latest_by_key(df, "id", "ts", strategy=strategy)
        assert out.columns == ["ts", "val", "id"], strategy


def test_bm25_query_terms_are_case_insensitive(spark):
    from tabular_cdc_bootstrapper_spark.functions.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(1, "merge the tables"), (2, "nothing relevant")], "doc_id long, text string"
    )
    out = bm25_topk(docs, ["Merge"], k=5).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_connected_components_empty_edges_keeps_id_type(spark):
    from tabular_cdc_bootstrapper_spark.functions.graph import connected_components

    pairs = spark.createDataFrame([], "id_a string, id_b string")
    out = connected_components(pairs, "id_a", "id_b")
    assert out.count() == 0
    kinds = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert kinds == {"id": "string", "component_id": "string"}


def test_round6_queries_survive_empty_documents(spark, tmp_path):
    """Every round-6 documents-table query must return an EMPTY result —
    not raise — on an empty (but correctly-typed) documents table: empty
    span-hash arrays, a 0-token heavy-hitter threshold (cnt·65 > 0 must
    not emit phantom rows), an all-NULL quota frame, and percentile over
    zero rows are all edge paths a fresh-bootstrap corpus hits."""
    from pyspark.sql import functions as F  # noqa: F401

    from tabular_cdc_bootstrapper_spark import queries as q

    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    empty.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    for name in (
        "duplicated_span_hashes",
        "span_dedup_retention",
        "temperature_mixture_quota",
        "winsorized_length_stats",
        "heavy_hitter_terms",
        "unigram_surprisal_quality",
        "source_token_drift",
        "leakage_safe_split",
        "hybrid_retrieval_topk",
        "event_mix_drift",
    ):
        assert q.QUERIES[name](spark, str(tmp_path)).count() == 0, name
        spark.catalog.clearCache()


def test_round6_queries_survive_single_doc(spark, tmp_path):
    """One short document: fingerprints exist but nothing is duplicated;
    the single lang gets the whole quota; heavy hitters sees every term
    as frequent (each > 1/65 of a tiny stream)."""
    from tabular_cdc_bootstrapper_spark import queries as q

    one = spark.createDataFrame(
        [(1, "alpha beta alpha", "en", "s", 16)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    one.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    assert q.QUERIES["duplicated_span_hashes"](spark, str(tmp_path)).count() == 0
    ret = q.QUERIES["span_dedup_retention"](spark, str(tmp_path)).collect()
    assert len(ret) == 1 and ret[0]["n_dup_spans"] == 0
    hh = {r["term"]: r["cnt"] for r in
          q.QUERIES["heavy_hitter_terms"](spark, str(tmp_path)).collect()}
    assert hh == {"alpha": 2, "beta": 1}
    w = q.QUERIES["winsorized_length_stats"](spark, str(tmp_path)).collect()[0]
    assert w["n_docs"] == 1 and w["raw_mean"] == w["wins_mean"] == 16.0
    assert w["n_clip_low"] == 0 == w["n_clip_high"]
    # surprisal: N=3 tokens, c(alpha)=2 (0 bits), c(beta)=1 (1 bit);
    # score_milli = 1000 div 3 = 333 -> bucket 0
    s = q.QUERIES["unigram_surprisal_quality"](spark, str(tmp_path)).collect()
    spark.catalog.clearCache()
    assert len(s) == 1 and s[0]["bits_bucket"] == 0
    assert s[0]["n_docs"] == 1 and s[0]["sum_score_milli"] == 333
    # the sole source IS the corpus: zero drift
    dr = q.QUERIES["source_token_drift"](spark, str(tmp_path)).collect()
    spark.catalog.clearCache()
    assert len(dr) == 1 and dr[0]["tv_ppm"] == 0
    # one unclustered doc: one group, nothing to leak
    sp = q.QUERIES["leakage_safe_split"](spark, str(tmp_path)).collect()
    assert len(sp) == 1 and sp[0]["n_docs"] == 1 == sp[0]["n_groups"]
    assert sp[0]["leaked_without_grouping"] == 0
