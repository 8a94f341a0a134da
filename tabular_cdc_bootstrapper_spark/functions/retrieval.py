"""Keyword retrieval over the document corpus: BM25 scoring + top-k.

Rounds out the text-analysis surface (`functions/text.py`) with the other
half of a training-data pipeline's text toolkit: lexical search — finding
the documents that match a query term set, ranked. (The embedding side of
retrieval lives in `functions/similarity.py`; BM25 is its sparse/lexical
counterpart, and the standard first-stage retriever in front of it.)

Scoring is Okapi BM25 with the Lucene idf variant (log(1 + (N−df+½)/(df+½)),
always ≥ 0):

    score(D, Q) = Σ_{t∈Q} idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1−b+b·|D|/avgdl))

Scale shape (the whole point at 100 TB):
- Document length |D| is computed IN-PLAN (`size(split(...))`) — no
  explode, no shuffle, no second scan.
- Tokens are exploded and filtered to the query term set BEFORE the tf
  aggregation, so the only corpus-sized shuffle moves (doc_id, term) rows
  for matching terms only — for selective queries that is a small fraction
  of the corpus (an inverted-index lookup expressed declaratively).
- df(t) and the corpus stats (N, avgdl) are tiny aggregates (≤ |Q| rows
  and 1 row) broadcast back — no fact-fact join anywhere.
- Top-k is orderBy+limit → TakeOrderedAndProject: per-partition heaps,
  only k rows ever reach the driver side of the exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for ``terms`` by BM25: (doc_id, n_terms, bm25).

    Tokenization is lowercase whitespace split (matching the corpus's other
    text operators); ``n_terms`` is how many distinct query terms the
    document matched. Ties break on doc_id so the cut is deterministic;
    the score is rounded to 6 dp BEFORE ranking so the order (and thus the
    top-k set) is reproducible across engines despite float summation
    order.
    """
    base = docs.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("toks"),
    )
    base = base.withColumn("dl", F.size("toks"))

    stats = base.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # lowercase the QUERY terms too — document tokens come from F.lower,
    # so an uppercase query term would silently match nothing
    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin([t.lower() for t in terms]))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    w = idf * F.col("tf") * (k1 + 1) / denom

    return (
        tf.join(F.broadcast(dfs), "term")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("n_terms"),
            F.round(F.sum(w), 6).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(k)
    )
