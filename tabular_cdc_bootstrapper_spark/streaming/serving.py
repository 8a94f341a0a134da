"""Stream-static similarity serving: top-k neighbors for a STREAM of
query vectors against a static corpus — the online half of the ANN tier
(functions/similarity.py is the offline half).

Covers the one §2.9 join shape the other streaming operators don't:
the STREAM-STATIC join (Structured Streaming joins each micro-batch
against a batch DataFrame with no state on the static side), composed
with a stateful per-query aggregation that reduces the scored candidates
to a top-k array.

Scale shape: the static corpus broadcasts (serving corpora are the small
side — a shard of an index, not the training corpus); each arriving query
scores against it map-side, and the only stateful operator is the per-qid
aggregation whose state is one (k at most after the slice; n_candidates
during the batch) array per in-flight query. At real index sizes the
scored stream is pre-pruned by LSH/IVF bucketing (same expressions as the
batch operators) so the aggregation never sees the full corpus per query
— composition documented, not baked in, to keep the twin law exact.

Design provenance: the reference delegates serving entirely
(tabular.py:58-62 configures pipelines, it never answers queries); this
is the engine-native replacement a retrieval workload needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_topk(
    query_stream: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """(qid, neighbors) where neighbors = array<struct<vec_id, sim>> of
    the top-k cosine neighbors, sim descending, vec_id ascending on ties
    — EXACTLY the pair set of the batch ``cosine_topk`` for the same
    query vectors (twin-tested).

    The ranking trick: streaming DataFrames cannot host window functions,
    so top-k is an AGGREGATE — collect the (−sim, vec_id) structs, let
    array_sort order them (ascending on the negated sim = descending on
    sim, vec_id breaking ties), slice k, then flip the sign back. Output
    mode "update": a query's row re-emits only if its batch added
    candidates."""
    from tabular_cdc_bootstrapper_spark.functions.similarity import (
        cosine_similarity,
    )

    q = query_stream.select(
        F.col(query_id_col).alias("qid"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    scored = q.join(F.broadcast(c), F.col("vec_id") != F.col("qid")).select(
        "qid",
        F.struct(
            (-cosine_similarity(F.col("qv"), F.col("cv"))).alias("negsim"),
            F.col("vec_id"),
        ).alias("cand"),
    )
    topk = F.expr(
        f"transform(slice(array_sort(collect_list(cand)), 1, {k}),"
        f" x -> struct(x.vec_id AS vec_id, round(-x.negsim, 6) AS sim))"
    )
    return scored.groupBy("qid").agg(topk.alias("neighbors"))
