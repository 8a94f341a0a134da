"""Laws for sliding-window passage chunking (functions/text.py
chunk_documents) — the document→passage step of a RAG/embedding-ingest
pipeline. The registry entry document_chunks carries the md5-per-chunk
DuckDB oracle; these pin the windowing semantics on constructed docs
where every boundary is known by hand.
"""

from __future__ import annotations

import pytest

from tabular_cdc_bootstrapper_spark.functions.text import chunk_documents


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def _toks(n):
    return " ".join(f"t{i}" for i in range(n))


def collect_chunks(spark, texts, **kw):
    out = chunk_documents(_docs(spark, texts), **kw)
    rows = out.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for v in by_doc.values():
        v.sort(key=lambda r: r.chunk_idx)
    return by_doc


def test_exact_boundaries_long_doc(spark):
    # 150 tokens, chunk 64 / stride 48 → starts while start < 150-16=134:
    # 0, 48, 96 → sizes 64, 64, 54
    by_doc = collect_chunks(spark, [_toks(150)], chunk_size=64, stride=48)
    assert [r.n_tokens for r in by_doc[0]] == [64, 64, 54]
    assert [r.chunk_idx for r in by_doc[0]] == [0, 1, 2]


def test_overlap_law(spark):
    # consecutive full chunks share exactly overlap = chunk_size - stride
    # tokens: chunk i covers [i*stride, i*stride + chunk_size)
    by_doc = collect_chunks(spark, [_toks(112)], chunk_size=64, stride=48)
    # n=112: starts < 96 → 0, 48; chunk1 covers tokens 48..111 (64 tokens)
    assert [r.n_tokens for r in by_doc[0]] == [64, 64]
    toks = _toks(112).split()
    import hashlib

    for i, r in enumerate(by_doc[0]):
        expect = " ".join(toks[i * 48 : i * 48 + 64])
        assert r.chunk_md5 == hashlib.md5(expect.encode()).hexdigest()


def test_no_pure_suffix_replay_chunk(spark):
    # n=49 with chunk 64/stride 48: the naive start=48 window would cover
    # only token 48, already inside chunk 0 — the start < max(n-overlap,1)
    # rule suppresses it
    by_doc = collect_chunks(spark, [_toks(49)], chunk_size=64, stride=48)
    assert [r.n_tokens for r in by_doc[0]] == [49]
    # one past the cutoff: n=65 keeps the second chunk (1 new token)
    by_doc = collect_chunks(spark, [_toks(65)], chunk_size=64, stride=48)
    assert [r.n_tokens for r in by_doc[0]] == [64, 17]


def test_short_and_empty_docs(spark):
    by_doc = collect_chunks(
        spark, [_toks(5), "", "   ", _toks(64)], chunk_size=64, stride=48
    )
    assert [r.n_tokens for r in by_doc[0]] == [5]
    assert 1 not in by_doc and 2 not in by_doc  # no chunks, not empty ones
    assert [r.n_tokens for r in by_doc[3]] == [64]


def test_full_coverage_law(spark):
    # every token position is covered by at least one chunk, for a spread
    # of doc lengths around the boundary arithmetic
    for n in (1, 16, 17, 47, 48, 49, 64, 65, 96, 112, 113, 200):
        by_doc = collect_chunks(spark, [_toks(n)], chunk_size=64, stride=48)
        covered = set()
        for r in by_doc[0]:
            start = r.chunk_idx * 48
            covered |= set(range(start, start + r.n_tokens))
        assert covered == set(range(n)), f"n={n}"


def test_invalid_params_raise(spark):
    d = _docs(spark, [_toks(10)])
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(d, chunk_size=64, stride=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(d, chunk_size=32, stride=48)


def test_chunking_runs_unchanged_on_a_stream(spark, tmp_path):
    """chunk_documents is a pure narrow transformation, so the SAME
    function body runs on a streaming DataFrame with no twin needed —
    the streaming chunker IS the batch chunker. Pin it: file-source
    stream → chunk → memory sink equals the batch result exactly."""
    import uuid

    docs = _docs(spark, [_toks(n) for n in (5, 70, 150)])
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    sink = f"chunks_{uuid.uuid4().hex[:8]}"
    q = (
        chunk_documents(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.doc_id, r.chunk_idx, r.n_tokens, r.chunk_md5)
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    want = {
        (r.doc_id, r.chunk_idx, r.n_tokens, r.chunk_md5)
        for r in chunk_documents(docs).collect()
    }
    assert got == want and len(want) == 1 + 2 + 3
