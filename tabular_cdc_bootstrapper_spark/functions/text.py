"""Text analysis for large-scale training-data pipelines.

All operators are built from JVM-side ``pyspark.sql.functions`` (no Python
UDFs): at 100 TB the text column dominates I/O, and keeping tokenization/
scoring inside whole-stage codegen means the only cost is the scan itself.
North-star surface per BASELINE.json: language-ID (marker heuristic),
quality scoring, token counting, document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Common high-frequency marker words per language. A real pipeline swaps in
# a trained n-gram model (e.g. fastText) via mapInPandas; the heuristic
# keeps the operator UDF-free and deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "es"],
    "fr": ["le", "la", "et", "les", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add per-document stats: chars, tokens, avg token length, punctuation
    /digit/whitespace ratios, and a composite quality score.

    The quality score is a cheap filter for corpus cleaning: long-enough
    documents with low punctuation/digit noise score near 1.
    """
    t = F.col(text_col)
    toks = _tokens(t)
    n_chars = F.length(t)
    n_tokens = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(toks))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_space = n_chars - F.length(F.regexp_replace(t, r"\s", ""))
    avg_token_len = F.when(
        n_tokens > 0, (n_chars - n_space).cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    digit_ratio = F.when(n_chars > 0, n_digit.cast("double") / n_chars).otherwise(0.0)
    quality = (
        F.least(n_tokens.cast("double") / F.lit(64.0), F.lit(1.0))
        * (1 - F.least(punct_ratio * 4, F.lit(1.0)))
        * (1 - F.least(digit_ratio * 4, F.lit(1.0)))
    )
    return (
        df.withColumn("stat_n_chars", n_chars.cast("bigint"))
        .withColumn("stat_n_tokens", n_tokens.cast("bigint"))
        .withColumn("stat_avg_token_len", avg_token_len)
        .withColumn("stat_punct_ratio", punct_ratio)
        .withColumn("stat_digit_ratio", digit_ratio)
        .withColumn("stat_quality", quality)
    )


def marker_count(text: Column, words: list[str]) -> Column:
    """Whole-word marker occurrences, codegen'd regex count."""
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pattern))


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax over per-language marker counts,
    deterministic tie-break by language code; 'und' when nothing matches."""
    t = F.col(text_col)
    # struct comparison is lexicographic by field order: score first, then
    # lang code — so ties resolve deterministically to the greatest code
    scored = F.array(
        *[
            F.struct(
                marker_count(t, LANG_MARKERS[lang]).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_max(scored)
    return df.withColumn(
        "lang_guess",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    ).withColumn("lang_guess_score", best["score"].cast("bigint"))


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document repetition signals — the Gopher-style cleaning filters
    (Rae et al. 2021, "Scaling Language Models", appendix A1.1) that catch
    boilerplate/spam the length+punctuation score misses:

    - ``distinct_token_ratio``: |distinct tokens| / |tokens| (low = loops)
    - ``top_token_frac``: most frequent token's share of all tokens
    - ``top_bigram_frac``: most frequent word-2-gram's share of bigrams
      (null when the document has < 2 tokens)

    Scale shape: per-token and per-bigram counts via ONE unioned explode →
    two keyed aggregations, both map-side combinable and keyed by (doc,
    kind, gram) then (doc, kind) — no per-row O(n·distinct) higher-order
    scan (interpreted, quadratic on long docs) and no join of two
    corpus-sized aggregates (the kind tag folds token and bigram pipelines
    into the same shuffle).

    ``carry_cols`` (constant per document, e.g. ``lang``) ride the
    aggregation keys — free, since they don't split any id group — instead
    of a corpus-sized join-back."""
    t = F.lower(F.trim(F.col(text_col)))
    carry = list(carry_cols)
    staged = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col).alias("id"), *carry, F.split(t, r"\s+").alias("toks"))
    )
    n = F.size("toks")
    staged = staged.withColumn(
        "bigrams",
        F.when(
            n >= 2,
            F.zip_with(
                F.slice("toks", 1, n - 1),
                F.slice("toks", 2, n - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    grams = staged.select(
        "id", *carry, F.lit("tok").alias("kind"), F.explode("toks").alias("gram")
    ).unionAll(
        staged.select(
            "id", *carry, F.lit("big").alias("kind"), F.explode("bigrams").alias("gram")
        )
    )
    counts = grams.groupBy("id", *carry, "kind", "gram").agg(F.count("*").alias("c"))
    per_kind = counts.groupBy("id", *carry, "kind").agg(
        F.max("c").alias("top"),
        F.count("*").alias("n_distinct"),
        F.sum("c").alias("n_total"),
    )
    tok = F.when(F.col("kind") == "tok", F.col("top"))
    return per_kind.groupBy("id", *carry).agg(
        F.max(F.when(F.col("kind") == "tok", F.col("n_total"))).alias("n_tokens"),
        (
            F.max(F.when(F.col("kind") == "tok", F.col("n_distinct")))
            / F.max(F.when(F.col("kind") == "tok", F.col("n_total")))
        ).alias("distinct_token_ratio"),
        (
            F.max(tok) / F.max(F.when(F.col("kind") == "tok", F.col("n_total")))
        ).alias("top_token_frac"),
        (
            F.max(F.when(F.col("kind") == "big", F.col("top")))
            / F.max(F.when(F.col("kind") == "big", F.col("n_total")))
        ).alias("top_bigram_frac"),
    )


# PII patterns kept RE2-compatible (no backrefs/lookarounds) so the same
# regex runs identically on Spark (Java regex) and DuckDB (RE2) — and would
# port to RE2-based scanners unchanged.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


def with_pii_redaction(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect-and-redact PII (emails, NANP-style phone numbers): adds
    ``n_emails``/``n_phones`` match counts and ``text_redacted`` with
    matches replaced by ``[EMAIL]``/``[PHONE]`` placeholders.

    Pure codegen'd regexp expressions — at 100 TB this runs inside the
    scan's whole-stage-codegen like the other text filters, no UDF. A
    production pipeline extends PII_* with locale patterns (IBAN, SSN,
    IPs); the operator shape doesn't change."""
    t = F.col(text_col)
    return (
        df.withColumn("n_emails", F.regexp_count(t, F.lit(PII_EMAIL)).cast("bigint"))
        .withColumn("n_phones", F.regexp_count(t, F.lit(PII_PHONE)).cast("bigint"))
        .withColumn(
            "text_redacted",
            F.regexp_replace(
                F.regexp_replace(t, PII_EMAIL, "[EMAIL]"), PII_PHONE, "[PHONE]"
            ),
        )
    )


def with_fingerprint(
    df: DataFrame, text_col: str = "text", k: int = 3, algo: str = "xxhash64"
) -> DataFrame:
    """Order-insensitive document fingerprint: min/max/size digest of the
    word k-shingle hash set (winnowing-lite). Two documents share a
    fingerprint iff their shingle sets hash identically — a fast pre-filter
    for near-dup mining; pairs agreeing here go to MinHash verification.

    ``algo``: ``xxhash64`` (default — cheapest in-plan hash, engine-
    specific) or ``md5`` (hex-string digests every engine computes
    identically → cross-engine/oracle-checkable). Identical plan shape;
    min/max over md5 hex strings is lexicographic on [0-9a-f] ASCII, which
    every engine orders the same way.

    Staged projections so the tokens array is an attribute before any
    lambda references it (see dedup._shingles_from_tokens perf note)."""
    if algo == "xxhash64":
        shingle_h = lambda c: F.xxhash64(c)  # noqa: E731
        final_h = lambda mn, mx, n: F.xxhash64(mn, mx, n)  # noqa: E731
    elif algo == "md5":
        shingle_h = lambda c: F.md5(c)  # noqa: E731
        final_h = lambda mn, mx, n: F.md5(F.concat_ws("|", mn, mx, n))  # noqa: E731
    else:
        raise ValueError(f"unknown fingerprint algo {algo!r}")
    staged = df.withColumn("__toks", _tokens(F.col(text_col)))
    n = F.size(F.col("__toks"))
    staged = staged.withColumn(
        "__shingle_hashes",
        F.when(
            n >= k,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), n - k),
                    lambda i: shingle_h(
                        F.concat_ws(" ", F.slice(F.col("__toks"), i + 1, k))
                    ),
                )
            ),
        ).otherwise(F.array(shingle_h(F.col(text_col)))),
    )
    return staged.withColumn(
        "fingerprint",
        final_h(
            F.array_min("__shingle_hashes"),
            F.array_max("__shingle_hashes"),
            F.size("__shingle_hashes"),
        ),
    ).drop("__toks", "__shingle_hashes")


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window token chunking with overlap — the document→passage
    step of a RAG / embedding-ingest pipeline (each chunk is what the ANN
    family embeds and indexes; ``chunk_size - stride`` tokens of overlap
    preserve context across boundaries, the same windowing contract as a
    tokenizer's ``stride``/overflow splitting).

    Window starts are ``0, stride, 2·stride, …`` while
    ``start < max(n_tokens - overlap, 1)`` — every chunk after the first
    covers at least one token the previous chunk didn't, so no chunk is a
    pure suffix replay of its predecessor; short documents yield exactly
    one chunk; whitespace-only documents yield none.

    Pure narrow transformation: tokenize → per-row ``sequence`` of starts
    → ``explode`` → ``slice`` — no UDF and NO SHUFFLE (plan-pinned), so
    at 100 TB the cost is the text scan plus the ~1-2× chunk-row
    multiplier, and the output composes with any downstream partitioning
    (dedup by chunk_md5, embedding via mapInPandas, ANN indexing).

    Output: (id_col, chunk_idx, n_tokens, chunk_md5); the md5 is computed
    over the space-joined token slice so exact chunk-level dedup needs no
    re-tokenization.
    """
    if chunk_size <= 0 or stride <= 0 or stride > chunk_size:
        raise ValueError(
            f"need 0 < stride <= chunk_size, got stride={stride} "
            f"chunk_size={chunk_size}"
        )
    overlap = chunk_size - stride
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("__toks") - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_size)
    return (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), _tokens(F.col(text_col)).alias("__toks"))
        .select(id_col, "__toks", F.explode(starts).alias("__start"))
        .select(
            id_col,
            (F.col("__start") / stride).cast("long").alias("chunk_idx"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
        )
    )
