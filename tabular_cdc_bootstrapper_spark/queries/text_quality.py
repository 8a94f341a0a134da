"""Text quality, profiling, mixtures, splits, retrieval additions.

Split from the single-file registry (VERDICT r9 item 3); every entry
registers via the shared ``@query`` decorator in ``_registry``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from tabular_cdc_bootstrapper_spark.functions import profiling
import pandas as pd
from tabular_cdc_bootstrapper_spark.queries._registry import (_t, query)


# ---------------------------------------------------------------------------
# North-star text additions (BASELINE.json): BPE-ish token counting, quality
# scoring, exact n-gram Jaccard near-dup (the verification half of MinHash).
# ---------------------------------------------------------------------------


@query(
    "bpe_token_counts",
    oracle=r"""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text,
               '''s|''t|''re|''ve|''m|''ll|''d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+'))) AS BIGINT)
               AS bpe_tokens,
           CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT)
               AS ws_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (north star): GPT-2-ish BPE pre-tokenizer
    regex (contractions | letter runs | digit runs | symbol runs, each with
    optional leading space) and plain whitespace splitting. Pure codegen'd
    regexp — no UDF; the regex stays in ASCII classes so Java (Spark) and
    RE2 (DuckDB) agree."""
    d = _t(spark, sf_dir, "documents")
    bpe_pat = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"
    t = F.col("text")
    ws = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+"))
    )
    return d.groupBy("lang").agg(
        F.sum(F.size(F.regexp_extract_all(t, F.lit(bpe_pat), F.lit(0)))).alias(
            "bpe_tokens"
        ),
        F.sum(ws).alias("ws_tokens"),
        F.count("*").alias("n_docs"),
    )


@query(
    "quality_score_histogram",
    oracle=r"""
    WITH s AS (
        SELECT length(text) AS n_chars,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
               length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit
        FROM documents
    ), q AS (
        SELECT LEAST(n_tokens / 64.0, 1.0)
               * (1 - LEAST(CASE WHEN n_chars > 0
                                 THEN CAST(n_punct AS DOUBLE) / n_chars
                                 ELSE 0 END * 4, 1.0))
               * (1 - LEAST(CASE WHEN n_chars > 0
                                 THEN CAST(n_digit AS DOUBLE) / n_chars
                                 ELSE 0 END * 4, 1.0)) AS quality
        FROM s
    )
    SELECT CAST(LEAST(FLOOR(quality * 10), 9) AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM q GROUP BY bin
    """,
)
def quality_score_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality-score decile histogram (north star: quality scoring
    as a cleaning filter). Uses functions.text.with_text_stats — the oracle
    re-derives the identical formula in SQL, exercising cross-engine
    IEEE-double determinism of the score itself."""
    from tabular_cdc_bootstrapper_spark.functions.text import with_text_stats

    d = with_text_stats(_t(spark, sf_dir, "documents"))
    return (
        d.select(
            F.least(F.floor(F.col("stat_quality") * 10), F.lit(9))
            .cast("int")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
    )


@query(
    "ngram_jaccard_pairs",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, lang,
               string_split_regex(lower(trim(text)), '\s+') AS w
        FROM documents
    ), sh AS (
        SELECT doc_id, lang,
               list_distinct(list_transform(range(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS s
        FROM toks WHERE len(w) >= 3
    ), sizes AS (
        SELECT doc_id, len(s) AS n FROM sh
    ), ex AS (
        SELECT doc_id, lang, unnest(s) AS g FROM sh
    ), kept AS (
        -- mirror the Spark side's max_bucket_size=200 skew cap: shingles
        -- shared by >200 docs contribute nothing to the match count (they
        -- still count toward each doc's set size n)
        SELECT ex.* FROM ex
        JOIN (SELECT g, lang, COUNT(*) AS n_docs FROM ex GROUP BY g, lang) sz
        USING (g, lang)
        WHERE sz.n_docs <= 200
    ), common AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
        FROM kept a JOIN kept b
          ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id1, id2,
           ROUND(CAST(c AS DOUBLE) / (s1.n + s2.n - c), 4) AS jac
    FROM common
    JOIN sizes s1 ON id1 = s1.doc_id
    JOIN sizes s2 ON id2 = s2.doc_id
    WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= 0.5
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-duplicate pairs (north star: n-gram
    Jaccard dedup) via an inverted-index similarity join — the scale path.

    Three formulations measured at sf0.1 (5 k docs):
      1. lang-blocked all-pairs array_intersect join: 157 s (O(n²/block));
      2. explode + self-join on the shingle: 15.5 s — only pairs sharing a
         shingle materialize (exactly the ``jac > 0`` set), but the
         shingle pipeline runs once per join side, and Spark evaluates
         higher-order array functions (transform/slice) INTERPRETED, not
         codegen'd — the shingle build alone was ~2.8 s/side;
      3. this one: 1.3 s — Arrow-vectorized pandas UDF emits each doc's
         distinct shingle-hash set (vectorized Python beats interpreted
         Catalyst HOFs ~10× here), then ONE pass groups shingle → sorted
         doc list and emits the per-shingle pairs in-plan. Jaccard
         |A∩B| / (|A|+|B|−|A∩B|) comes from the per-pair match count plus
         per-doc set sizes.
    Hashes are blake2b-64 (deterministic across workers — Python's builtin
    hash() is process-seeded and must never be used in a distributed
    plan). Hot shingles (stop-phrase skew) would make one doc-list row
    quadratic, so lists are CAPPED at ``max_bucket_size`` docs — the same
    skew guard as dedup.minhash_candidates. A capped (stop-phrase) shingle
    contributes nothing to the intersection count, which only *lowers* the
    computed Jaccard of pairs relying on it — a documented, bounded
    approximation that never invents a pair. The oracle REPLICATES the cap
    (``kept`` CTE), so parity holds at any SF — including ones where a
    degenerate shingle actually exceeds it (same strategy as the simhash
    oracle's bucket cap)."""
    max_bucket_size = 200
    d = _t(spark, sf_dir, "documents")

    @F.pandas_udf("array<long>")
    def shingle_hashes(texts: pd.Series) -> pd.Series:
        from hashlib import blake2b

        def h(s: str) -> int:
            return int.from_bytes(
                blake2b(s.encode(), digest_size=8).digest(), "big", signed=True
            )

        out = []
        for t in texts:
            w = t.lower().strip().split()
            out.append(
                sorted({h(" ".join(w[i : i + 3])) for i in range(max(len(w) - 2, 0))})
            )
        return pd.Series(out)

    # same two fixes as _span_fingerprints / span_dedup_retention: spread
    # the CPU-bound UDF beyond the (single) scan split, and persist the
    # shingle frame — sizes and the inverted index BOTH branch from it, so
    # without the persist the UDF (the expensive stage) runs twice.
    # Caller contract: bench/driver clearCache() after each query.
    cores = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < cores:
        d = d.repartition(cores)
    sh = d.select("doc_id", "lang", shingle_hashes("text").alias("s")).persist()
    sizes = sh.select("doc_id", F.size("s").alias("n"))
    ex = sh.select("doc_id", "lang", F.explode("s").alias("gh"))
    # one shuffle: shingle → sorted doc list; pairs generated in-plan.
    # sort_array gives id1 < id2 for free.
    lists = (
        ex.groupBy("gh", "lang")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket_size))
    )
    pairs = lists.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.slice("ids", 1, F.size("ids") - 1),
                    lambda x, i: F.transform(
                        F.slice("ids", i + 2, F.size("ids")),
                        lambda y: F.struct(x.alias("id1"), y.alias("id2")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id1", "p.id2")
    common = pairs.groupBy("id1", "id2").agg(F.count("*").alias("c"))
    s1 = sizes.select(F.col("doc_id").alias("id1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("id2"), F.col("n").alias("n2"))
    jac = F.col("c").cast("double") / (F.col("n1") + F.col("n2") - F.col("c"))
    # no broadcast hint on sizes: one row per *document* does not fit in a
    # broadcast at corpus scale — AQE picks broadcast at small SF itself
    return (
        common.join(s1, "id1")
        .join(s2, "id2")
        .withColumn("jac", jac)
        .filter(F.col("jac") >= 0.5)
        .select("id1", "id2", F.round("jac", 4).alias("jac"))
    )


@query(
    "rolling_30d_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(epoch(o_orderdate) / 86400 AS BIGINT)
               RANGE BETWEEN 29 PRECEDING AND CURRENT ROW), 2) AS rev_30d
    FROM orders
    """,
)
def rolling_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame window: trailing 30-day revenue per customer. Spark's
    rangeBetween needs a numeric ordering key, so the timestamp becomes
    epoch days in BOTH engines (same truncation → same frames)."""
    o = _t(spark, sf_dir, "orders")
    days = (F.unix_timestamp(F.col("o_orderdate").cast("timestamp")) / 86400).cast(
        "bigint"
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days.alias("d"))
        .rangeBetween(-29, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("rev_30d"),
    )


@query(
    "set_ops_multiset",
    oracle="""
    SELECT 'intersect_all' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        INTERSECT ALL
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    ) a
    UNION ALL
    SELECT 'except_all', CAST(COUNT(*) AS BIGINT) FROM (
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        EXCEPT ALL
        SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    ) b
    """,
)
def set_ops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations (INTERSECT ALL / EXCEPT ALL) — the
    bag-semantics complements of the distinct set ops query."""
    l = _t(spark, sf_dir, "lineitem")
    r = l.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = l.filter(F.col("l_returnflag") == "A").select("l_partkey")
    inter = r.intersectAll(a).agg(F.count("*").alias("n")).select(
        F.lit("intersect_all").alias("op"), "n"
    )
    exc = r.exceptAll(a).agg(F.count("*").alias("n")).select(
        F.lit("except_all").alias("op"), "n"
    )
    return inter.unionByName(exc)


@query(
    "session_stats",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    ), per_session AS (
        SELECT user_id, session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(MAX(n_events) AS BIGINT) AS max_events,
           CAST(SUM(dur_us) AS BIGINT) AS total_dur_us
    FROM per_session GROUP BY user_id
    """,
)
def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization with per-session rollup: lag flags
    session starts, a running sum assigns session ids, then two stacked
    aggregations. Extends user_sessions with session-level durations."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0).alias(
            "new_session"
        ),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (
            F.unix_micros(F.max("ts").cast("timestamp"))
            - F.unix_micros(F.min("ts").cast("timestamp"))
        ).alias("dur_us"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("n_events").alias("max_events"),
        F.sum("dur_us").alias("total_dur_us"),
    )


@query(
    "hash_split_counts",
    oracle="""
    WITH b AS (
        SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 1000 AS bucket,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents WHERE length(trim(text)) > 0
    )
    SELECT CASE WHEN bucket < 980 THEN 'train'
                WHEN bucket < 990 THEN 'validation'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM b GROUP BY 1
    """,
)
def hash_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation/test split — the training-pipeline
    primitive for reproducible dataset membership. The split is a pure
    function of the document id (md5-bucket mod 1000 → 98/1/1), so it is
    stable across runs, engines, partitionings and appends: new documents
    join a split without reshuffling old ones, and leakage checks can
    recompute membership from the id alone. All in-plan (no UDF, no
    shuffle before the final 3-group agg); md5 is used (not xxhash64)
    because both engines implement it identically, which is also the
    production-portable choice for split stability across toolchains."""
    d = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 1000
    )
    split = (
        F.when(bucket < 980, "train").when(bucket < 990, "validation").otherwise("test")
    )
    return (
        d.select(
            split.alias("split"),
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


@query(
    "sequence_packing",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents WHERE length(trim(text)) > 0
    ), c AS (
        SELECT doc_id, lang, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
        FROM toks
    )
    SELECT lang, CAST(FLOOR((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM c GROUP BY lang, pack_id
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style): documents are laid
    end-to-end per language in doc_id order and cut into fixed 2048-token
    context windows; a document belongs to the pack where it STARTS.
    Output: per (lang, pack_id) membership stats — what a training-data
    writer needs to emit packed examples.

    Scale shape: one window cumsum per partition key + one hash agg on the
    same key — no UDF, no extra shuffle (the agg reuses the window's
    partitioning). At 100 TB the partition key becomes (lang, shard) so no
    single language serializes through one task; packing stays
    deterministic because the cumsum order is (doc_id), not arrival."""
    d = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    toks = d.select(
        "doc_id", "lang", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    w = Window.partitionBy("lang").orderBy("doc_id")
    c = toks.withColumn("cum", F.sum("n_tokens").over(w))
    pack = F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(2048.0))
    return (
        c.select("lang", pack.alias("pack_id"), "n_tokens", "doc_id")
        .groupBy("lang", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "weighted_mixture_sample",
    oracle="""
    WITH b AS (
        SELECT lang,
               CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 1000 AS bucket,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents WHERE length(trim(text)) > 0
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN bucket < (CASE WHEN lang = 'en' THEN 250 ELSE 1000 END)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN bucket < (CASE WHEN lang = 'en' THEN 250 ELSE 1000 END)
                         THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
    FROM b GROUP BY lang
    """,
)
def weighted_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted data mixing — downsample over-represented
    sources to a target mixture (here: keep 25% of 'en', 100% of the
    rest). Membership is a pure function of the doc id (salted md5 bucket,
    a DIFFERENT salt than hash_split_counts so mixture and split stay
    independent), so the mixture is reproducible and append-stable, and
    sampling composes with the split without coordination. All in-plan:
    one pruned scan, map-side conditional aggregation, one exchange for
    the per-source rollup — at 100 TB the filter form (keep rows, write
    the mixed corpus) is the same expression used as a predicate."""
    d = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    rate = F.when(F.col("lang") == "en", 250).otherwise(1000)
    kept = bucket < rate
    return (
        d.select(
            "lang",
            kept.alias("kept"),
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0)).alias(
                "kept_tokens"
            ),
        )
    )


@query(
    "uniform_per_group_sample",
    oracle="""
    WITH h AS (
        SELECT lang, doc_id,
               CAST(('0x' || substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS hk
        FROM documents
    ), r AS (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rank
        FROM h
    )
    SELECT lang, doc_id, CAST(rank AS INT) AS rank FROM r WHERE rank <= 20
    """,
)
def uniform_per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible uniform sample of exactly k=20 documents per source:
    rank by a salted hash of the doc id inside each group and keep the
    first k. Unlike ``df.sample`` this is deterministic across runs,
    engines and partitionings (hash order is data-defined, not RNG-
    defined) and gives exact per-group counts. Scale shape: the rank
    filter compiles to WindowGroupLimit (map-side top-k per group before
    the shuffle, plan-pinned in tests) — the corpus never fully sorts."""
    d = _t(spark, sf_dir, "documents")
    hk = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("lang").orderBy("hk", "doc_id")
    return (
        d.select("lang", "doc_id", hk.alias("hk"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("lang", "doc_id", F.col("rank").cast("int").alias("rank"))
    )


@query(
    "benchmark_contamination",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, lang, text FROM documents
        UNION ALL
        SELECT doc_id + 1000001, lang, text FROM documents WHERE doc_id % 200 = 0
    ), toks AS (
        SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS w
        FROM corpus
    ), sh AS (
        SELECT doc_id, lang,
               unnest(list_distinct(list_transform(range(1, len(w) - 6),
                   i -> list_aggregate(w[i:i+7], 'string_agg', ' ')))) AS g
        FROM toks WHERE len(w) >= 8
    ), bench AS (
        SELECT DISTINCT g FROM sh WHERE doc_id % 100 = 0
    )
    SELECT lang, CAST(COUNT(DISTINCT s.doc_id) AS BIGINT) AS n_contaminated
    FROM sh s JOIN bench USING (g)
    WHERE s.doc_id % 100 <> 0
    GROUP BY lang
    """,
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/benchmark contamination check (decontamination stage of a
    training pipeline): a training document is contaminated if it shares
    any 8-word shingle with the benchmark set (docs with id % 100 == 0
    here). The fixture corpus has no natural 8-gram overlap at the smoke
    SF, so known-contaminated documents are planted deterministically on
    both sides (every 200th doc re-appended under a train-side id).

    Shape: staged tokenize → shingle projections (attribute-bound, see
    _shingles_from_tokens perf contract), explode to an inverted index,
    LEFT SEMI join train shingles against distinct benchmark shingles
    (the doc_id%100 predicates push below the shingle projection, so each
    branch shingles only its own subset), then a distinct-doc count per
    source. At cluster scale the shingles become 8-byte hashed shuffle
    keys computed inside the vectorized shingle UDF (the
    ngram_jaccard_pairs approach — hashing via an interpreted transform()
    lambda measured SLOWER locally than shipping the strings, the
    BASELINE.md HOF lesson again); a 2⁻⁶⁴ collision only over-marks,
    never misses."""
    from tabular_cdc_bootstrapper_spark.functions.dedup import _shingles_from_tokens

    d = _t(spark, sf_dir, "documents")
    planted = d.filter(F.col("doc_id") % 200 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000001
    )
    corpus = d.select("doc_id", "lang", "text").unionByName(
        planted.select("doc_id", "lang", "text")
    )
    toks = corpus.select(
        "doc_id",
        "lang",
        F.col("text").alias("__text"),
        F.split(F.trim("text"), r"\s+").alias("__toks"),
    ).filter(F.size("__toks") >= 8)
    sh = toks.select(
        "doc_id",
        "lang",
        F.explode(
            _shingles_from_tokens(F.col("__toks"), F.col("__text"), 8)
        ).alias("g"),
    )
    # no distinct() on the semi-join's right side: LEFT SEMI gives identical
    # results on duplicated keys, and the distinct would be a pure extra
    # shuffle+agg of the benchmark shingle set
    bench = sh.filter(F.col("doc_id") % 100 == 0).select("g")
    return (
        sh.filter(F.col("doc_id") % 100 != 0)
        .join(bench, "g", "left_semi")
        .groupBy("lang")
        .agg(F.countDistinct("doc_id").alias("n_contaminated"))
    )


# Winnowed span fingerprints (Schleimer et al., "Winnowing: Local
# Algorithms for Document Fingerprinting", SIGMOD'03 — the MOSS algorithm),
# shared by the two span-dedup queries below. Every 40-char window is
# hashed, then each sliding window of 10 consecutive hashes records its
# MINIMUM — the fingerprint set is the distinct minima. Selection is
# content-defined, so two copies of a run pick the SAME fingerprints at any
# byte alignment: any shared run of >= w+s-1 = 49 chars contains s
# consecutive w-grams on both copies, hence one full hash-window whose min
# depends only on run content. (A strided sample — hash every s-th window —
# would be s× cheaper but alignment-SENSITIVE: copies at offsets that
# differ mod s select different windows and never match.) Fingerprint
# volume is ~len/s per doc, same as a stride, with the exact-recall
# guarantee. Everything happens INSIDE array HOFs on the document row —
# no explode of per-offset rows, no per-doc window function, no shuffle
# before the global fingerprint aggregation.
_SPAN_W = 40


_SPAN_S = 10


def _span_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select("doc_id", "source", "text")
    )
    # The per-offset hash projection is pure CPU (~len md5 calls per doc)
    # and parallelism is pinned to SCAN splits: at bench SF the whole
    # corpus is one parquet row-group, which would serialize ~1.3M md5s on
    # one of 32 cores (measured 4.3 s → 0.4 s). Spread ONLY when the scan
    # has fewer splits than the cluster — at 100 TB splits ≫ cores and the
    # guard skips the exchange, so full-scale plans never pay a raw-text
    # shuffle.
    cores = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < cores:
        d = d.repartition(cores)
    from tabular_cdc_bootstrapper_spark.functions.dedup import span_fingerprints_df

    return span_fingerprints_df(
        d, w=_SPAN_W, s=_SPAN_S, keep_cols=("source",)
    ).withColumnRenamed("id", "doc_id")


# The matching oracle-side fingerprint projection (DuckDB): range() is
# end-exclusive where Spark's sequence() is end-inclusive, hence the +1;
# list slicing l[i:j] is end-inclusive where Spark's slice(l, i, n) takes a
# length; both clamp past the end.
_SPAN_SQL = f"""
        SELECT doc_id, source, unnest(list_distinct(list_transform(
                   range(1, greatest(len(hs) - {_SPAN_S - 1}, 1) + 1),
                   i -> list_min(hs[i:i + {_SPAN_S - 1}])))) AS span_hash
        FROM (
            SELECT doc_id, source,
                   list_transform(
                       range(1, greatest(length(text) - {_SPAN_W - 1}, 1) + 1),
                       i -> md5(substr(text, i, {_SPAN_W}))) AS hs
            FROM documents
            WHERE text IS NOT NULL AND length(text) > 0)
"""


@query(
    "duplicated_span_hashes",
    oracle=f"""
    WITH s AS ({_SPAN_SQL})
    SELECT span_hash, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM s GROUP BY span_hash
    HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, span_hash LIMIT 100
    """,
)
def duplicated_span_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-SPAN detection (sub-document granularity) via
    winnowed fingerprints: surface the spans that recur across documents —
    boilerplate headers, license blocks, templated text — the spans a
    substring-level dedup pass (Lee et al., "Deduplicating Training Data
    Makes Language Models Better") would cut. Complements document-level
    dedup (dedup_exact_groups / minhash): those miss duplication BELOW the
    document level. Any cross-document duplicated run of >= 49 chars is
    caught at any byte alignment (the winnowing guarantee, see
    _span_fingerprints).

    Scale shape: one narrow projection (~len/s 16-byte fingerprints per
    doc, built inside array HOFs so explode never widens and nothing
    shuffles per-offset rows), ONE hash-partition shuffle on span_hash with
    map-side partial aggregation, then a TakeOrderedAndProject top-100 — no
    sort of the full hash space, no self-join anywhere. A boilerplate span
    seen in millions of docs is one hot GROUP — partial agg absorbs it
    map-side; nothing is quadratic in its frequency."""
    return (
        _span_fingerprints(spark, sf_dir)
        .groupBy("span_hash")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), "span_hash")
        .limit(100)
    )


@query(
    "span_dedup_retention",
    oracle=f"""
    WITH s AS ({_SPAN_SQL}),
    c AS (
        SELECT span_hash, COUNT(DISTINCT doc_id) AS nd
        FROM s GROUP BY span_hash
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_spans,
           CAST(COUNT(DISTINCT CASE WHEN nd >= 2 THEN doc_id END) AS BIGINT)
               AS n_docs_with_dup
    FROM s JOIN c USING (span_hash)
    GROUP BY source
    """,
)
def span_dedup_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source span-dedup retention forecast: of each source's winnowed
    span fingerprints, how many are corpus-duplicated, and how many of its
    documents contain at least one duplicated span — the "what would
    substring dedup cost me per source" report a training-data curator
    reads before turning the pass on (the C4 line-dedup report, adapted to
    a corpus with no line structure).

    Scale shape: fingerprint projection → per-hash distinct-doc count
    (shuffle 1, on span_hash) → join the count BACK to the fingerprint
    stream on the same key (the exchange is reused — both sides are
    hash-partitioned on span_hash, AQE plans a shuffle-local join) →
    per-source conditional rollup (shuffle 2, #sources cardinality).
    Counts stay integer end-to-end so the oracle comparison is exact, no
    float division. The fingerprint frame is persisted because BOTH join
    sides branch off it — without it the md5 projection (the expensive
    stage) runs twice; same caller contract as verified_near_duplicates
    (bench/driver clearCache() after each query)."""
    spans = _span_fingerprints(spark, sf_dir).persist()
    counts = spans.groupBy("span_hash").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    dup = F.col("nd") >= 2
    return (
        spans.join(counts, "span_hash")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(dup.cast("long")).alias("n_dup_spans"),
            F.countDistinct(F.when(dup, F.col("doc_id"))).alias(
                "n_docs_with_dup"
            ),
        )
    )


@query(
    "temperature_mixture_quota",
    oracle="""
    WITH stats AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(FLOOR(SQRT(COUNT(*)) * 1000) AS BIGINT) AS w
        FROM documents GROUP BY lang
    ), q AS (
        SELECT lang, n_total,
               ((SUM(n_total) OVER () // 4) * w) // (SUM(w) OVER ()) AS quota
        FROM stats
    ), ranked AS (
        SELECT lang, doc_id,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5('temp:' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents WHERE length(trim(text)) > 0
    )
    SELECT q.lang, q.n_total, CAST(q.quota AS BIGINT) AS quota,
           CAST(COUNT(*) FILTER (WHERE rk <= quota) AS BIGINT) AS n_kept,
           CAST(COALESCE(SUM(n_tokens) FILTER (WHERE rk <= quota), 0)
                AS BIGINT) AS kept_tokens
    FROM ranked r JOIN q USING (lang)
    GROUP BY q.lang, q.n_total, q.quota
    """,
)
def temperature_mixture_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling (α = 0.5): per-language quotas
    proportional to count^α, so low-resource languages get a LARGER share
    than their raw frequency — the multilingual-LM mixing rule (mBERT/XLM
    exponential smoothing), with the rates derived FROM the data rather
    than fixed like weighted_mixture_sample's. Budget = ¼ of the corpus.

    All quota math is integer-exact — weights are floor(sqrt(n)·1000) as
    BIGINT and the quota is (budget·w) div W — so Spark and the oracle
    agree bit-for-bit with no float summation-order hazard. Selection is
    the house salted-md5 rank (deterministic, append-stable, RNG-free).

    Scale shape: the per-lang stats aggregate is #langs rows, the global
    window over it is trivially small, and the quota frame BROADCASTS back
    onto the rank stream; the only corpus-sized work is one partitionBy
    (lang) window sort. The quota is data-dependent, so WindowGroupLimit
    cannot pre-truncate map-side — at 100 TB you first collect the #langs
    quota rows (a model, like the k-means centroids) and re-issue literal
    per-lang limits; expressed here as one plan for oracle purity."""
    d = _t(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(F.count("*").alias("n_total")).select(
        "lang",
        "n_total",
        F.floor(F.sqrt(F.col("n_total")) * 1000).cast("long").alias("w"),
    )
    wall = Window.partitionBy()  # #langs rows: a global window here is fine
    # budget·w widened to DECIMAL(38,0) before the product: both factors
    # are longs, but their PRODUCT can pass 2^63 at extreme corpus sizes
    # (budget ~ n_docs/4, w ~ sqrt(n_docs)·1000) and a silently-wrapping
    # long product would diverge from DuckDB's HUGEINT arithmetic exactly
    # where the integer-exactness claim matters. 38 digits holds the
    # worst case (19-digit budget × 13-digit w) losslessly.
    q = stats.select(
        "lang",
        "n_total",
        F.expr(
            "CAST((sum(n_total) over () div 4) AS DECIMAL(38,0)) "
            "* CAST(w AS DECIMAL(38,0))"
        ).alias("_bw"),
        F.sum("w").over(wall).alias("_wsum"),
    ).select(
        "lang",
        "n_total",
        F.floor(F.col("_bw") / F.col("_wsum")).cast("long").alias("quota"),
    )
    ranked = (
        d.filter(F.length(F.trim("text")) > 0)
        .select(
            "lang",
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
            F.md5(F.concat(F.lit("temp:"), F.col("doc_id").cast("string"))).alias(
                "hk"
            ),
        )
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("lang").orderBy("hk", "doc_id")),
        )
    )
    kept = F.col("rk") <= F.col("quota")
    return (
        ranked.join(F.broadcast(q), "lang")
        .groupBy("lang", "n_total", "quota")
        .agg(
            F.sum(kept.cast("long")).alias("n_kept"),
            F.coalesce(
                F.sum(F.when(kept, F.col("n_tokens"))), F.lit(0)
            ).alias("kept_tokens"),
        )
    )


@query(
    "heavy_hitter_terms",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0
    ), tot AS (
        SELECT COUNT(*) AS n FROM toks
    )
    SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks, tot
    GROUP BY term, tot.n
    HAVING COUNT(*) * 65 > tot.n
    """,
)
def heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-sketch tier: exact corpus heavy hitters (terms above a
    1/(k+1) = 1/65 frequency threshold) found via distributed Misra–Gries
    summaries + a candidate-restricted exact pass — one summary shuffle of
    ≤ partitions·k rows instead of a full-vocabulary GROUP BY, then exact
    counts for the few candidates. The oracle is the plain HAVING query:
    a row missing from the Spark side would be a violated sketch
    guarantee, so correctness-checking doubles as a proof of the MG law
    on this corpus. See functions/heavyhitters.py for the merge bound."""
    from tabular_cdc_bootstrapper_spark.functions.heavyhitters import (
        heavy_hitters_exact,
    )

    d = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    tokens = d.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    )
    return heavy_hitters_exact(tokens, "term", k=64)


@query(
    "winsorized_length_stats",
    oracle="""
    WITH b AS (
        SELECT lang,
               quantile_cont(n_chars, 0.05) AS lo,
               quantile_cont(n_chars, 0.95) AS hi
        FROM documents GROUP BY lang
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(n_chars), 4) AS raw_mean,
           ROUND(AVG(LEAST(GREATEST(CAST(n_chars AS DOUBLE), lo), hi)), 4)
               AS wins_mean,
           CAST(SUM(CASE WHEN n_chars < lo THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clip_low,
           CAST(SUM(CASE WHEN n_chars > hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clip_high
    FROM documents d JOIN b USING (lang)
    GROUP BY d.lang
    """,
)
def winsorized_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (outlier-clipped) per-language length statistics — the
    robust-stats pass a curation pipeline runs before length-based quality
    rules, so a handful of megadocs can't drag the mean that thresholds
    derive from. Values clip to the group's exact interpolated [p5, p95]
    (percentile ↔ quantile_cont, the price_percentiles parity pair).

    Scale shape: percentile bounds aggregate per group (shuffle 1, exact
    percentile is the oracle-parity choice — approx_percentile is the
    drop-in at 100 TB, same plan), the #langs bounds frame BROADCASTS back
    onto the corpus, conditional rollup (shuffle 2 on lang). Means round
    at 4 dp on ~2^53-headroom sums, inside the house float-agg contract."""
    d = _t(spark, sf_dir, "documents")
    b = d.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.05)).alias("lo"),
        F.percentile("n_chars", F.lit(0.95)).alias("hi"),
    )
    clipped = F.least(
        F.greatest(F.col("n_chars").cast("double"), F.col("lo")), F.col("hi")
    )
    return (
        d.join(F.broadcast(b), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("raw_mean"),
            F.round(F.avg(clipped), 4).alias("wins_mean"),
            F.sum((F.col("n_chars") < F.col("lo")).cast("long")).alias(
                "n_clip_low"
            ),
            F.sum((F.col("n_chars") > F.col("hi")).cast("long")).alias(
                "n_clip_high"
            ),
        )
    )


@query(
    "event_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, ts, event_id, event_type,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS s1
        FROM events
    ), s2 AS (
        SELECT *, MAX(CASE WHEN event_type = 'click' AND s1 = 1 THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS s2
        FROM s1
    ), s3 AS (
        SELECT *, MAX(CASE WHEN event_type = 'purchase' AND s2 = 1 THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS s3
        FROM s2
    ), pu AS (
        SELECT user_id, MAX(s1) AS r1, MAX(s2) AS r2, MAX(s3) AS r3
        FROM s3 GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(r1) AS BIGINT) AS reached_view,
           CAST(SUM(r2) AS BIGINT) AS reached_view_click,
           CAST(SUM(r3) AS BIGINT) AS reached_full
    FROM pu
    """,
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): a user reaches
    a stage only by hitting its event AFTER reaching the previous stage —
    the classic product-analytics operator, done as a running state
    machine in layered window expressions instead of per-stage self-joins.

    Scale shape: all three stage flags are cumulative MAX over the SAME
    (user_id, ts) sort, so Catalyst plans ONE exchange + ONE sort with
    three stacked Window operators, and the per-user reduction reuses the
    partitioning — versus the naive 3-way self-join (3 shuffles of the
    event log + skew on hot users). Event-count ties break on event_id,
    making the funnel deterministic."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    stage = lambda cond: F.max(F.when(cond, 1).otherwise(0)).over(w)  # noqa: E731
    e = e.withColumn("s1", stage(F.col("event_type") == "view"))
    e = e.withColumn("s2", stage((F.col("event_type") == "click") & (F.col("s1") == 1)))
    e = e.withColumn(
        "s3", stage((F.col("event_type") == "purchase") & (F.col("s2") == 1))
    )
    pu = e.groupBy("user_id").agg(
        F.max("s1").alias("r1"), F.max("s2").alias("r2"), F.max("s3").alias("r3")
    )
    return pu.agg(
        F.count("*").alias("n_users"),
        F.sum("r1").alias("reached_view"),
        F.sum("r2").alias("reached_view_click"),
        F.sum("r3").alias("reached_full"),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH su AS (
        SELECT user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'signup' THEN ts END)
                   OVER (PARTITION BY user_id) AS signup_ts
        FROM events
    )
    SELECT strftime(date_trunc('week', signup_ts), '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', date_trunc('week', signup_ts),
                          date_trunc('week', ts)) // 7 AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
    FROM su
    WHERE signup_ts IS NOT NULL AND event_type <> 'signup' AND ts >= signup_ts
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by signup week, counted as
    active in each later week they emit a non-signup event. The signup
    timestamp comes from an unordered per-user window MIN — no self-join
    of the event log against itself — so the plan is one exchange on
    user_id (window + nothing else reuses it) and one on the (cohort,
    offset) aggregate. Both engines truncate weeks to ISO Monday."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    su = e.withColumn(
        "signup_ts", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    )
    cohort = F.date_trunc("week", "signup_ts")
    offset = F.expr("datediff(date_trunc('week', ts), date_trunc('week', signup_ts)) div 7")
    return (
        su.filter(
            F.col("signup_ts").isNotNull()
            & (F.col("event_type") != "signup")
            & (F.col("ts") >= F.col("signup_ts"))
        )
        .groupBy(
            cohort.cast("date").cast("string").alias("cohort_week"),
            offset.cast("long").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "hll_distinct_counts",
    oracle="""
    SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END
               AS l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_5pct
    FROM lineitem GROUP BY ROLLUP(l_returnflag)
    """,
)
def hll_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog sketch surface (the 100 TB path for COUNT DISTINCT:
    mergeable partial sketches, no exact shuffle of the distinct values):
    hll_sketch_agg per group + hll_union_agg across groups.

    Oracle scheme: the sketch estimate itself is engine-specific, so the
    query emits the deterministic half — the exact cardinality — plus a
    ±5% *tolerance verdict* computed sketch-vs-exact in the SAME plan.
    DuckDB reproduces the exact side and asserts the verdict is TRUE, so
    the driver hash-checks both the exact values and the sketch's
    accuracy envelope (a lattice-deterministic property: the same input
    always yields the same HLL estimate). The mergeable-sketch path —
    hll_union_agg over STORED per-group sketches, what a warehouse does
    instead of re-scanning — is exercised by
    test_hll_sketch_within_5pct_of_exact."""
    l = _t(spark, sf_dir, "lineitem")
    # single-pass ROLLUP: per-flag sketch + exact distinct + all-up row from
    # ONE scan; Spark plans the distinct aggregate with expand + two-phase
    # agg while the sketch still partial-merges map-side.
    return (
        l.rollup("l_returnflag")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("__approx"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.grouping("l_returnflag").alias("__g"),  # only valid inside the agg
        )
        .select(
            F.when(F.col("__g") == 1, F.lit("ALL"))
            .otherwise(F.col("l_returnflag"))
            .alias("l_returnflag"),
            "exact_parts",
            (
                F.abs(F.col("__approx") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("within_5pct"),
        )
    )


@query(
    "array_hof_embedding_stats",
    oracle="""
    SELECT label,
           CAST(SUM(len(list_filter(embedding, x -> x > 0.2))) AS BIGINT) AS n_high,
           ROUND(AVG(list_aggregate(
               list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               'sum')), 4) AS avg_sq_norm,
           CAST(MAX(array_indexof(embedding, list_aggregate(embedding, 'max'))) AS BIGINT)
               AS max_argmax_pos
    FROM embeddings GROUP BY label
    """,
)
def array_hof_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order-function surface (filter / transform / aggregate /
    array_position) over the embedding column — all JVM-side; floats are
    widened to double BEFORE arithmetic in both engines so the in-array
    fold order produces bit-identical sums."""
    e = _t(spark, sf_dir, "embeddings")
    sq_norm = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n_high = F.size(F.filter("embedding", lambda x: x > 0.2))
    argmax_pos = F.array_position("embedding", F.array_max("embedding"))
    return e.groupBy("label").agg(
        F.sum(n_high).alias("n_high"),
        F.round(F.avg(sq_norm), 4).alias("avg_sq_norm"),
        F.max(argmax_pos).alias("max_argmax_pos"),
    )


@query(
    "orders_by_month",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS month_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT CAST(dayofweek(o_orderdate) AS INT)) AS BIGINT) AS n_dows,
           MAX(CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR)) AS eom
    FROM orders GROUP BY month_start
    """,
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar surface: date_trunc, dayofweek (counted distinct —
    the two engines number weekdays differently), last_day."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.date_trunc("month", "o_orderdate").alias("month_start")).agg(
        F.count("*").alias("n"),
        F.countDistinct(F.dayofweek("o_orderdate")).alias("n_dows"),
        F.max(F.last_day("o_orderdate").cast("string")).alias("eom"),
    )


@query(
    "tfidf_top_terms",
    oracle=r"""
    WITH base AS (
        SELECT doc_id,
               string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents WHERE trim(text) <> ''
    ), tf AS (
        SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(toks) AS t FROM base)
        GROUP BY doc_id, t
    ), stats AS (
        SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM tf
    ), dfs AS (
        SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
    ), scored AS (
        SELECT doc_id, term,
               ROUND(tf * ln(n_docs / df), 6) AS tfidf
        FROM tf JOIN dfs USING (term) CROSS JOIN stats
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        FROM scored
    )
    SELECT doc_id, CAST(rank AS INT) AS rank, term, tfidf
    FROM ranked WHERE rank <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: top-3 TF-IDF terms per document — the corpus-
    analysis half of the lexical family (BM25 is the query-time half,
    `functions/retrieval.py`). One corpus shuffle to (doc, term) counts;
    the df table (≤|vocab| rows) and the 1-row N broadcast back; the
    per-doc window gets WindowGroupLimit's map-side top-3. Scores round to
    6 dp before ranking and tie-break on term, so the cut is deterministic
    cross-engine."""
    d = _t(spark, sf_dir, "documents")
    toks = d.filter(F.trim("text") != "").select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfs = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    stats = tf.agg(F.countDistinct("doc_id").cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfs), "term")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", "tfidf")
    )


_PCT_QS = [0.25, 0.5, 0.75, 0.95]


@query(
    "approx_price_percentiles",
    oracle="""
    WITH ex AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.95]) AS exs
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(u.q AS DOUBLE) AS quantile,
           ROUND(exs[u.i], 4) AS exact_price,
           TRUE AS within_1pct
    FROM ex, (VALUES (1, 0.25), (2, 0.5), (3, 0.75), (4, 0.95)) u(i, q)
    """,
)
def approx_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles via percentile_approx (KLL-style mergeable
    sketch) per return flag — the sketch twin of the exact
    `price_percentiles` query, same role as HLL beside countDistinct: at
    100 TB the sketch aggregates map-side and merges, where exact
    percentiles must shuffle every value.

    Oracle scheme (same as hll_distinct_counts): one row per
    (flag, quantile) — all scalars, so the driver canonicalizer can sort
    them — carrying the deterministic exact percentile plus a ±1%
    relative-tolerance verdict computed sketch-vs-exact in the SAME plan;
    DuckDB reproduces the exact side (quantile_cont == Spark's
    interpolated `percentile`, the mapping pinned by `price_percentiles`)
    and asserts TRUE."""
    l = _t(spark, sf_dir, "lineitem")
    agged = l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", _PCT_QS, 10000).alias("approx"),
        F.percentile("l_extendedprice", F.array(*[F.lit(q) for q in _PCT_QS])).alias(
            "exact"
        ),
    )
    # posexplode the quantile list so every output value is a scalar
    exploded = agged.select(
        "l_returnflag",
        F.posexplode(F.array(*[F.lit(q) for q in _PCT_QS])).alias("__i", "quantile"),
        "approx",
        "exact",
    )
    a = F.element_at("approx", F.col("__i") + 1)
    e = F.element_at("exact", F.col("__i") + 1)
    return exploded.select(
        "l_returnflag",
        "quantile",
        F.round(e, 4).alias("exact_price"),
        (F.abs(a - e) <= 0.01 * F.abs(e)).alias("within_1pct"),
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-side range predicates + one global sum — every
    filter must reach the parquet scan (pinned in test_plan_shapes)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q21_sole_late_supplier",
    oracle="""
    WITH lf AS (
        SELECT l.l_orderkey, l.l_suppkey,
               l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS is_late
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lf l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE l1.is_late
      AND EXISTS (SELECT 1 FROM lf l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lf l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.is_late)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's operator shape — EXISTS + NOT EXISTS both correlated on
    the same fact — adapted to the fixture schema: lacking
    l_receiptdate/l_commitdate, "late" is shipping > 90 days after the
    order date. Finds suppliers who were the SOLE late supplier on
    multi-supplier finished orders.

    Decorrelated to ONE aggregate instead of semi + anti self-joins: per
    order, n_supp = distinct suppliers and n_late_supp = distinct LATE
    suppliers; then EXISTS(other supplier) ⇔ n_supp >= 2 and
    NOT EXISTS(other late supplier) ⇔ n_late_supp == 1 (the late probe row
    itself is one of them). The fact shuffles on l_orderkey twice (agg +
    join-back) instead of four half-joins; at sf0.1 this cut the query from
    2.3 s to well under baseline, and at 100 TB the agg output is
    orders-sized, so AQE turns the join-back into a shuffle-local join on
    the reused l_orderkey partitioning. supplier/nation dims broadcast."""
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    lf = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .withColumn(
            "is_late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        )
        .select("l_orderkey", "l_suppkey", "is_late")
    )
    # (order, supplier) granularity first: no multi-DISTINCT Expand (which
    # doubles the shuffled fact), and the join-back probe is the reduced
    # per-pair frame, not raw late lineitem rows. numwait rides along as
    # the per-pair late-row count and is summed at the end.
    per_os = lf.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.when(F.col("is_late"), 1)).alias("n_late_rows")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum((F.col("n_late_rows") > 0).cast("int")).alias("n_late_supp"),
    )
    sole = (
        per_os.filter(F.col("n_late_rows") > 0)
        .join(per_o, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        sole.join(F.broadcast(s), sole.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "q11_value_share_shape",
    oracle="""
    WITH pv AS (
        SELECT n_name, l_partkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS value_cents
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name, l_partkey
    ), nt AS (
        SELECT n_name,
               CAST((3 * SUM(value_cents)) // COUNT(*) AS BIGINT) AS thr
        FROM pv GROUP BY n_name
    )
    SELECT pv.n_name, l_partkey AS partkey, value_cents
    FROM pv JOIN nt USING (n_name)
    WHERE value_cents > nt.thr
    ORDER BY n_name, value_cents DESC, partkey
    """,
)
def q11_value_share_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's operator SHAPE — grouped value per part within each
    supplying nation, kept only where the part's value exceeds 3× the nation's
    MEAN part value (a scale-invariant threshold — a fixed fraction of the
    total selects nothing once the part space grows): an aggregate
    filtered by an aggregate of itself. The real Q11 runs on partsupp (availqty·supplycost), which the
    fixtures lack (FIXTURES.md §B), so shipped value (price·qty per
    lineitem, attributed to the supplier's nation) stands in; the plan
    shape — agg → per-group threshold from a second-level agg →
    decorrelated join-back filter — is the point.

    All value math is integer cents (per-row ROUND(price·100) is exact
    and identical in both engines; quantities are integral), and the
    threshold is an integer division of the exact total — no float
    boundary can flip a row between Spark and the oracle.

    Scale shape: dims broadcast onto the fact scan, ONE shuffle on
    (n_name, l_partkey) for the value agg; the per-nation totals are a
    #nations-row aggregate OF THE AGG OUTPUT, broadcast back — never a
    second fact scan (the classic decorrelation of Q11's subquery)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long") * F.col(
        "l_quantity"
    ).cast("long")
    pv = (
        l.join(
            F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
            l.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("n_name", "l_partkey")
        .agg(F.sum(cents).alias("value_cents"))
    )
    nt = pv.groupBy("n_name").agg(
        F.expr("(3 * sum(value_cents)) div count(*)").alias("thr")
    )
    return (
        pv.join(F.broadcast(nt), "n_name")
        .filter(F.col("value_cents") > F.col("thr"))
        .select("n_name", F.col("l_partkey").alias("partkey"), "value_cents")
        .orderBy("n_name", F.desc("value_cents"), "partkey")
    )


@query(
    "q20_excess_share_shape",
    oracle="""
    WITH sp AS (
        SELECT l_suppkey, l_partkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey
    ), pt AS (
        SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS total_qty
        FROM sp GROUP BY l_partkey
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_dominated_parts
    FROM sp
    JOIN pt USING (l_partkey)
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE 2 * qty > total_qty AND p_name LIKE '%widget%'
    GROUP BY s_name
    """,
)
def q20_excess_share_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20's operator SHAPE — a correlated aggregate threshold
    (supplier's shipped quantity for a part vs half of that part's total
    in a year) feeding a name-filtered supplier report. The real Q20
    compares partsupp availability against the correlated lineitem sum;
    without partsupp (FIXTURES.md §B) the engine-relevant structure is
    kept: per-(supplier, part) agg, per-part agg OVER THE FIRST AGG,
    join-back threshold compare (the decorrelated nested subquery), part
    name LIKE filter, dim join. Integer quantities end-to-end — the 2·qty
    > total compare cannot float-flip.

    Scale shape: the year filter pushes to the scan; the fact shuffles
    once on (l_suppkey, l_partkey); the per-part rollup reuses that
    output (orders of magnitude smaller); part/supplier dims broadcast.
    """
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    sp = l.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("qty")
    )
    pt = sp.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    return (
        sp.join(pt, "l_partkey")
        .filter(2 * F.col("qty") > F.col("total_qty"))
        .join(F.broadcast(p), sp.l_partkey == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("n_dominated_parts"))
    )


@query(
    "unigram_surprisal_quality",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0
    ), vocab AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY term
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n FROM vocab
    ), scored AS (
        SELECT t.doc_id, t.lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(length(bin(tot.n)) - length(bin(v.c))) AS BIGINT)
                   AS total_bits
        FROM tok t JOIN vocab v USING (term) CROSS JOIN tot
        GROUP BY t.doc_id, t.lang
    ), per_doc AS (
        SELECT lang, (total_bits * 1000) // n_tokens AS score_milli
        FROM scored
    )
    SELECT lang, CAST(score_milli // 1000 AS BIGINT) AS bits_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(score_milli) AS BIGINT) AS sum_score_milli
    FROM per_doc GROUP BY lang, bits_bucket
    """,
)
def unigram_surprisal_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring with a corpus-trained unigram LM —
    the CCNet-style filter rule (rank documents by how surprising their
    tokens are under a language model; boilerplate scores low, gibberish
    and rare-token noise score high) with the LM reduced to unigram
    counts so the whole fit is one aggregation.

    Everything is INTEGER-exact, so the DuckDB oracle matches bit-for-bit
    with no float log / summation-order hazard: the per-token surprisal is
    floor-log2(N) − floor-log2(c) bits (computed as length(bin(x)) deltas,
    identical in both engines), the per-doc score is the integer-milli
    mean (total_bits·1000 div n_tokens), and the output histogram keys on
    the whole-bit bucket. The ±1-bit quantization per token is irrelevant
    for a FILTER (thresholds are tuned on the same scale) and is the price
    of cross-engine exactness.

    Scale shape (the tf-idf template): explode once; vocab counts are one
    shuffle with map-side combine (output is vocab-sized, not corpus-
    sized); the corpus total is a 1-row broadcast; tokens re-join the
    vocab on term (second shuffle — at 100 TB the vocab is millions of
    rows, far too big to broadcast, and the sort-merge join on term is
    the standard inverted-index shape); per-doc re-agg is the third
    shuffle; the (lang, bucket) histogram is map-side-combinable and
    tiny.

    Design provenance: the reference delegates all aggregation to its
    SaaS (batch-bootstrapper/tabular.py:58-62); this extends the engine's
    training-data curation tier (quality_score_histogram,
    repetition_stats_by_lang) with the model-based filter rule."""
    d = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
    )
    # persist the vocab-sized counts: tot, bits, and the score join all
    # consume this frame, and without the persist each branch re-executes
    # the corpus explode+agg (exchange reuse does NOT kick in — the join
    # branches push different null-filters into their scans, so the
    # exchanges aren't canonically identical). With it the corpus is
    # scanned exactly twice: once to fit the LM, once to score.
    vocab = tok.groupBy("term").agg(F.count("*").alias("c")).persist()
    tot = vocab.agg(F.sum("c").alias("n"))
    bits = vocab.crossJoin(F.broadcast(tot)).select(
        "term",
        (F.length(F.expr("bin(n)")) - F.length(F.expr("bin(c)")))
        .cast("long")
        .alias("surprisal_bits"),
    )
    scored = (
        tok.join(bits, "term")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("surprisal_bits").alias("total_bits"),
        )
        .select(
            "lang", F.expr("(total_bits * 1000) div n_tokens").alias("score_milli")
        )
    )
    return scored.groupBy(
        "lang", F.expr("score_milli div 1000").alias("bits_bucket")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("score_milli").alias("sum_score_milli"),
    )


@query(
    "source_token_drift",
    oracle=r"""
    WITH tok AS (
        SELECT source,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0
    ), st AS (
        SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cs
        FROM tok GROUP BY source, term
    ), ct AS (
        SELECT term, CAST(SUM(cs) AS BIGINT) AS c FROM st GROUP BY term
    ), ns AS (
        SELECT source, CAST(SUM(cs) AS BIGINT) AS n_s,
               CAST(COUNT(*) AS BIGINT) AS n_terms
        FROM st GROUP BY source
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n FROM ct
    ), present AS (
        SELECT st.source,
               SUM(abs(CAST(st.cs AS HUGEINT) * tot.n
                       - CAST(ct.c AS HUGEINT) * ns.n_s)) AS present_abs,
               CAST(SUM(ct.c) AS BIGINT) AS c_present
        FROM st JOIN ct USING (term) JOIN ns USING (source) CROSS JOIN tot
        GROUP BY st.source
    )
    SELECT p.source, ns.n_s AS n_tokens, ns.n_terms,
           CAST(((p.present_abs
                  + CAST(tot.n - p.c_present AS HUGEINT) * ns.n_s) * 1000000)
                // (2 * CAST(ns.n_s AS HUGEINT) * tot.n) AS BIGINT) AS tv_ppm
    FROM present p JOIN ns USING (source) CROSS JOIN tot
    """,
)
def source_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: total-variation distance between each
    source's unigram token distribution and the whole corpus — the data-QA
    check a pipeline runs when a new crawl/source lands ("does this slice
    look like the rest, or did the scraper break?"). TV is the right
    first-line metric because it is bounded [0, 1], symmetric, and —
    unlike KL — defined when a term is missing on either side.

    INTEGER-exact cross-engine: TV = Σ|c_s/n_s − c/N| / 2 is computed as
    the exact integer Σ|c_s·N − c·n_s| (wide arithmetic), then scaled to
    ppm by one truncating division — no float sum ordering anywhere.
    Terms absent from a source contribute in CLOSED FORM, (N − Σ_present
    c)·n_s, so no per-source outer join against the full vocabulary is
    ever materialized. Widening: the summand is bounded by Σ(c_s·N +
    c·n_s) = 2·n_s·N ≤ ~2e28 at 100 TB (1e14 tokens), and ×1e6 still
    fits DECIMAL(38,0) / HUGEINT — documented so the exactness claim
    survives scale-up.

    Scale shape: one (source, term) shuffle with map-side combine (the
    only corpus-sized exchange); vocab totals regroup the ALREADY-reduced
    st frame on term; per-source totals and the 1-row corpus total
    broadcast back; the final per-source agg is #sources rows.

    Design provenance: the data-QA counterpart of the reference's ingest
    observability (its per-batch op histogram, batch_bootstrapper.py:
    49-94 loop) promoted to distribution level — no reference analog,
    part of the engine's pipeline-monitoring tier (A2, C2)."""
    d = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    tok = d.select(
        "source",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
    )
    # persist the vocab×sources-sized counts: EVERY downstream frame (ct,
    # ns, tot, present) derives from st, and without the persist each one
    # re-executes the corpus explode+agg (measured: 8 scans planned, only
    # half reused — join-injected null-filters make the branch exchanges
    # non-identical, defeating ReuseExchange). With it the corpus is
    # scanned exactly ONCE; everything after is vocab-sized.
    st = tok.groupBy("source", "term").agg(F.count("*").alias("cs")).persist()
    ct = st.groupBy("term").agg(F.sum("cs").alias("c"))
    ns = st.groupBy("source").agg(
        F.sum("cs").alias("n_s"), F.count("*").alias("n_terms")
    )
    tot = ct.agg(F.sum("c").alias("n"))
    present = (
        st.join(ct, "term")
        .join(F.broadcast(ns.select("source", "n_s")), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.expr(
                "abs(CAST(cs AS DECIMAL(38,0)) * n - CAST(c AS DECIMAL(38,0)) * n_s)"
            ).alias("term_abs"),
            "c",
        )
        .groupBy("source")
        .agg(
            F.sum("term_abs").alias("present_abs"),
            F.sum("c").alias("c_present"),
        )
    )
    return (
        present.join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            "n_terms",
            F.expr(
                "((present_abs + CAST(n - c_present AS DECIMAL(38,0)) * n_s)"
                " * 1000000)"
                " div (2 * CAST(n_s AS DECIMAL(38,0)) * n)"
            ).alias("tv_ppm"),
        )
    )


@query(
    "hybrid_retrieval_topk",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               string_split_regex(lower(trim(text)), '\\s+') AS toks
        FROM documents WHERE trim(text) <> ''
    ), d AS (
        SELECT doc_id, len(toks) AS dl, toks FROM base
    ), stats AS (
        SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM d
    ), tf AS (
        SELECT doc_id, dl, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS t FROM d)
        WHERE t IN ('dup', 'vector', 'merge')
        GROUP BY doc_id, dl, t
    ), dfs AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), cand AS (
        SELECT doc_id,
               ROUND(SUM(
                   ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS bm25
        FROM tf JOIN dfs USING (term) CROSS JOIN stats
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id
        LIMIT 50
    ), qv AS (
        SELECT embedding AS q FROM embeddings WHERE vec_id = 0
    ), scored AS (
        SELECT c.doc_id, c.bm25,
               ROUND(
                 list_sum(list_transform(list_zip(qv.q, e.embedding),
                          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
                 (sqrt(list_sum(list_transform(qv.q,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
                  sqrt(list_sum(list_transform(e.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
               6) AS cos_sim
        FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id CROSS JOIN qv
        WHERE c.doc_id <> 0
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS rank
        FROM scored
    )
    SELECT doc_id, bm25, cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def hybrid_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — the RAG-serving composition: a cheap LEXICAL
    recall stage (BM25 top-50 over the inverted-index plan) feeds a
    dense RERANK stage (exact cosine against the query embedding, vec 0,
    over the 50 candidates; the query's own document is excluded). This
    is how production search actually combines the two retriever tiers
    this engine already has — sparse recall bounds the work, dense
    scoring fixes the order — and the query proves the fixtures' doc_id ↔
    vec_id alignment end-to-end.

    Determinism (the house retrieval rule): BOTH stages round their score
    to 6 dp BEFORE ranking and tie-break on doc_id, so the candidate cut
    and the final order are reproducible across engines despite float
    summation order.

    Scale shape: the recall stage is the bm25_topk plan (corpus shuffle
    carries only matching (doc, term) rows; df/stats broadcast;
    TakeOrderedAndProject cut). The rerank joins the 50-row candidate
    frame (broadcast) against embeddings and ranks 50 rows — the global
    window is candidate-sized by construction, never corpus-sized. At
    100 TB the embeddings side is id-partitioned parquet and the
    broadcast-semi-join prunes to 50 row lookups."""
    from tabular_cdc_bootstrapper_spark.functions.retrieval import bm25_topk
    from tabular_cdc_bootstrapper_spark.functions.similarity import (
        cosine_similarity,
    )

    d = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    cand = bm25_topk(d, ["dup", "vector", "merge"], k=50).select("doc_id", "bm25")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = (
        emb.join(F.broadcast(cand), emb.vec_id == cand.doc_id)
        .filter(F.col("doc_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            "bm25",
            F.round(cosine_similarity(F.col("qv"), F.col("embedding")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.orderBy(F.col("cos_sim").desc(), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 10)
    )


@query(
    "referential_integrity_report",
    oracle="""
    SELECT 'lineitem->orders' AS edge,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_child,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphan,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_parent,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_orderkey = o.o_orderkey))
               AS n_parent_unreferenced
    UNION ALL
    SELECT 'orders->customer',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey))
    UNION ALL
    SELECT 'customer->nation',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey)),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM nation),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM nation n
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_nationkey = n.n_nationkey))
    """,
)
def referential_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key integrity audit across the star schema — the landing
    check a warehouse runs after every load ("did the CDC pipeline drop
    parents? are there orphaned facts?"). One row per FK edge: child row
    count, orphaned child rows (key missing from the parent), parent row
    count, and unreferenced parents (no child points at them — not an
    error, but the coverage number capacity planning wants).

    Scale shape, per edge: the child pre-aggregates to (key, cnt) — the
    ONLY corpus-sized exchange, map-side combined — and orphan rows are
    the SUM of cnt over keys anti-joined against the parent, so the fact
    table is scanned once and never shuffled raw. Parent-side counts are
    one aggregate + one anti join on the (much smaller) parent. Dim-sized
    parents (nation) broadcast automatically under AQE.

    Design provenance: the reference trusts its SaaS to enforce table
    integrity (tabular.py:77-143 creates tables, never validates
    content); a native engine needs the audit to exist. Sibling of
    table_profile_orders in the profiling tier."""
    edges = [
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    out = None
    for edge, child_t, ck, parent_t, pk in edges:
        child = _t(spark, sf_dir, child_t)
        parent = _t(spark, sf_dir, parent_t)
        kc = child.groupBy(F.col(ck).alias("k")).agg(F.count("*").alias("cnt"))
        pkeys = parent.select(F.col(pk).alias("k"))
        orphan = kc.join(pkeys, "k", "left_anti").agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_orphan")
        )
        unref = pkeys.join(kc.select("k"), "k", "left_anti").agg(
            F.count("*").alias("n_parent_unreferenced")
        )
        row = (
            # coalesce: an empty child table must report n_child = 0 (the
            # oracle's COUNT(*)), not NULL — same guard as n_orphan above
            kc.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_child"))
            .crossJoin(orphan)
            .crossJoin(parent.agg(F.count("*").alias("n_parent")))
            .crossJoin(unref)
            .select(
                F.lit(edge).alias("edge"),
                "n_child",
                "n_orphan",
                "n_parent",
                "n_parent_unreferenced",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


_ORDERS_PROFILE_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "num"),
    ("o_totalprice", "float"),
    ("o_orderdate", "num"),
    ("o_orderpriority", "num"),
]


_LINEITEM_PROFILE_COLS = [
    ("l_orderkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "float"),
    ("l_extendedprice", "float"),
    ("l_returnflag", "num"),
    ("l_shipdate", "num"),
]


@query(
    "table_profile_orders",
    oracle=profiling.profile_oracle_sql("orders", _ORDERS_PROFILE_COLS),
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profiling (the Deequ/profiler primitive): null
    count, distinct count, and min/max for every column of a table, in
    ONE scan — the first thing a pipeline runs on a newly landed dataset
    ("did the loader null a column? did cardinality collapse?"). Values
    render as strings so one long-format report covers heterogeneous
    column types; doubles round to 2 dp through DECIMAL so the rendering
    is engine-identical.

    r8: generalized — the implementation AND the oracle are now built
    from the column list by functions/profiling.py (any table, any
    atomic columns, schema-driven renders), proven on a second table by
    table_profile_lineitem. Plan unchanged: all aggregates in a single
    pass, multi-countDistinct via one Expand (row-multiplied map-side,
    still one scan), stack() unpivot. At 100 TB swap to
    profile_table_approx (same plan minus the Expand); exact is the
    oracle-parity choice here."""
    o = _t(spark, sf_dir, "orders")
    return profiling.profile_table(o, [c for c, _ in _ORDERS_PROFILE_COLS])


@query(
    "table_profile_lineitem",
    oracle=profiling.profile_oracle_sql("lineitem", _LINEITEM_PROFILE_COLS),
)
def table_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generality proof for the schema-driven profiler (VERDICT r7
    #8): the same profile_table implementation over the fixture's FACT
    table — six lineitem columns spanning bigint/int/double/varchar/
    timestamp — with the oracle generated from the same column list. One
    scan, one Expand, stack() unpivot; nothing per-table beyond the
    column list itself."""
    l = _t(spark, sf_dir, "lineitem")
    return profiling.profile_table(l, [c for c, _ in _LINEITEM_PROFILE_COLS])


@query(
    "table_profile_orders_approx",
    oracle=profiling.profile_oracle_sql(
        "orders", _ORDERS_PROFILE_COLS, verdict=True
    ),
)
def table_profile_orders_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB profiler, now hash-green (VERDICT r7 #1 — the registry's
    last rows-only entry converted to the tolerance-verdict scheme the
    repo proved on hll_distinct_counts): n_distinct estimation runs on
    HLL++ sketches aggregated over the UN-expanded stream — no Expand
    anywhere in the plan (pinned) — and the output emits the
    deterministic half (exact n_nulls/n_distinct/min/max) plus a
    per-column ``nd_within_5pct`` verdict comparing the sketch estimate
    against the exact count in the same plan. The exact counts come from
    one single-distinct branch per column: each plans as a plain
    two-phase distinct aggregate (Expand-free) whose scan prunes to
    exactly its one column, so the six single-column scans read the same
    bytes as the exact profiler's one six-column scan WITHOUT the 6×
    Expand row multiplication (see functions/profiling.py docstring —
    this is the alternative exact-multi-distinct strategy, not a
    verification tax). DuckDB reproduces every column including the
    verdict, so the driver hash-checks the sketch's accuracy envelope —
    a deterministic property: HLL++ always yields the same estimate for
    the same input and rsd."""
    o = _t(spark, sf_dir, "orders")
    return profiling.profile_table_verified(
        o, [c for c, _ in _ORDERS_PROFILE_COLS]
    )


@query(
    "event_mix_drift",
    oracle="""
    WITH e AS (
        SELECT CAST(date_trunc('week', ts) AS VARCHAR) AS week, event_type
        FROM events
    ), we AS (
        SELECT week, event_type, CAST(COUNT(*) AS BIGINT) AS cw
        FROM e GROUP BY week, event_type
    ), nw AS (
        SELECT week, CAST(SUM(cw) AS BIGINT) AS n_w FROM we GROUP BY week
    ), ce AS (
        SELECT event_type, CAST(SUM(cw) AS BIGINT) AS c
        FROM we GROUP BY event_type
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n FROM ce
    ), present AS (
        SELECT we.week,
               SUM(abs(CAST(we.cw AS HUGEINT) * tot.n
                       - CAST(ce.c AS HUGEINT) * nw.n_w)) AS present_abs,
               CAST(SUM(ce.c) AS BIGINT) AS c_present
        FROM we JOIN ce USING (event_type) JOIN nw USING (week) CROSS JOIN tot
        GROUP BY we.week
    )
    SELECT p.week, nw.n_w AS n_events,
           CAST(((p.present_abs
                  + CAST(tot.n - p.c_present AS HUGEINT) * nw.n_w) * 1000000)
                // (2 * CAST(nw.n_w AS HUGEINT) * tot.n) AS BIGINT) AS tv_ppm
    FROM present p JOIN nw USING (week) CROSS JOIN tot
    """,
)
def event_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal drift on the event stream: total-variation distance
    between each ISO week's event-type mix and the whole history — the
    monitoring query that catches instrumentation breakage ("clicks
    stopped being logged on Tuesday") as a distribution shift rather than
    a raw-count alarm that fires on ordinary traffic swings.

    Same exact-integer TV machinery as source_token_drift (one truncating
    division to ppm, closed-form handling of event types absent in a
    week, DECIMAL(38,0)/HUGEINT widening), on the time axis instead of
    the source axis and on the events table instead of documents. The
    week key is date_trunc('week') — ISO Monday in both engines — cast to
    string for cross-engine hash identity.

    Scale shape: the only event-scale work is the map-side-combined
    (week, event_type) count — #weeks × #event_types rows out; every
    later frame is that size or smaller. The count frame is persisted
    for the same reason as the token-drift twin: its four consumers
    (nw/ce/tot/present) would otherwise each re-SCAN the events table
    (join-injected null filters defeat ReuseExchange), and the persist
    caps the query at one events pass."""
    e = _t(spark, sf_dir, "events").select(
        # to_date matches DuckDB, whose 'week' truncation yields DATE
        F.to_date(F.date_trunc("week", "ts")).cast("string").alias("week"),
        "event_type",
    )
    # persist the weeks×types count frame: all four downstream frames
    # derive from it, and without the persist each one re-executes the
    # events scan + agg (same ReuseExchange failure mode as
    # source_token_drift). One events pass, KB of cache.
    we = e.groupBy("week", "event_type").agg(F.count("*").alias("cw")).persist()
    nw = we.groupBy("week").agg(F.sum("cw").alias("n_w"))
    ce = we.groupBy("event_type").agg(F.sum("cw").alias("c"))
    tot = ce.agg(F.sum("c").alias("n"))
    present = (
        we.join(ce, "event_type")
        .join(F.broadcast(nw), "week")
        .crossJoin(F.broadcast(tot))
        .select(
            "week",
            F.expr(
                "abs(CAST(cw AS DECIMAL(38,0)) * n - CAST(c AS DECIMAL(38,0)) * n_w)"
            ).alias("wk_abs"),
            "c",
        )
        .groupBy("week")
        .agg(
            F.sum("wk_abs").alias("present_abs"),
            F.sum("c").alias("c_present"),
        )
    )
    return (
        present.join(F.broadcast(nw), "week")
        .crossJoin(F.broadcast(tot))
        .select(
            "week",
            F.col("n_w").alias("n_events"),
            F.expr(
                "((present_abs + CAST(n - c_present AS DECIMAL(38,0)) * n_w)"
                " * 1000000)"
                " div (2 * CAST(n_w AS DECIMAL(38,0)) * n)"
            ).alias("tv_ppm"),
        )
    )


_LEAKAGE_SPLIT_ORACLE_PROLOGUE = r"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ), th AS (
        SELECT doc_id, md5_number_lower(tok) AS h FROM toks
    ), votes AS (
        SELECT doc_id, i,
               SUM(CASE WHEN (h >> CAST(i AS UBIGINT)) & 1 = 1
                        THEN 1 ELSE -1 END) AS v
        FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS i) g
        GROUP BY doc_id, i
    ), sims AS (
        SELECT doc_id,
               SUM(CASE WHEN v > 0 THEN (1::HUGEINT << CAST(i AS INT))
                        ELSE 0 END) AS sim_u
        FROM votes GROUP BY doc_id
    ), all_sims AS (
        SELECT d.doc_id, CAST(COALESCE(s.sim_u, 0) AS UBIGINT) AS sim
        FROM documents d LEFT JOIN sims s USING (doc_id)
    ), bands AS (
        SELECT doc_id, sim, b,
               CAST((sim >> CAST(b * 16 AS UBIGINT)) & 65535 AS INT) AS bv
        FROM all_sims CROSS JOIN (SELECT unnest(range(0, 4)) AS b) g
    ), kept AS (
        SELECT bands.* FROM bands
        JOIN (SELECT b, bv, COUNT(*) AS n FROM bands GROUP BY b, bv) sz
        USING (b, bv)
        WHERE sz.n BETWEEN 2 AND 200
    ), pr AS (
        SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
        FROM kept a JOIN kept b2
          ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id
        WHERE bit_count(xor(a.sim, b2.sim)) <= 3
    ), edges AS (
        SELECT id_a AS u, id_b AS v FROM pr
        UNION SELECT id_b, id_a FROM pr
    ), reach(id, lab) AS (
        SELECT DISTINCT u, u FROM edges
        UNION
        SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.id
    ), comp AS (
        SELECT id, MIN(lab) AS component_id FROM reach GROUP BY id
    )
"""


@query(
    "leakage_safe_split",
    oracle=_LEAKAGE_SPLIT_ORACLE_PROLOGUE
    + r""", g AS (
        SELECT d.doc_id, COALESCE(c.component_id, d.doc_id) AS gk
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    ), s AS (
        SELECT doc_id, gk,
               CAST(('0x' || substr(md5('split:' || CAST(gk AS VARCHAR)),
                                    1, 15)) AS BIGINT) % 1000 AS gb,
               CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
                                    1, 15)) AS BIGINT) % 1000 AS nb
        FROM g
    ), lab AS (
        SELECT CASE WHEN gb < 800 THEN 'train'
                    WHEN gb < 900 THEN 'validation'
                    ELSE 'test' END AS split,
               gk,
               CASE WHEN (CASE WHEN gb < 800 THEN 0 WHEN gb < 900 THEN 1
                               ELSE 2 END)
                      <> (CASE WHEN nb < 800 THEN 0 WHEN nb < 900 THEN 1
                               ELSE 2 END)
                    THEN 1 ELSE 0 END AS leak
        FROM s
    )
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT gk) AS BIGINT) AS n_groups,
           CAST(SUM(leak) AS BIGINT) AS leaked_without_grouping
    FROM lab GROUP BY split
    """,
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster-aware train/validation/test split: every SimHash
    near-dup CLUSTER is assigned to one split as a unit (split = md5
    bucket of the cluster's canonical id; unclustered docs hash their own
    id), so near-copies of a training document can never land in the
    held-out set — the leakage mode a naive per-document hash split
    (hash_split_counts) cannot prevent. The `leaked_without_grouping`
    column quantifies exactly that: how many docs the naive id-hash would
    have placed in a DIFFERENT split than their cluster — each one a
    train/test contamination the grouping averted. By construction the
    cluster-aware assignment itself can never leak (split is a pure
    function of the group key), which is the law the test pins.

    Scale shape: reuses the production pair→cluster pipeline (SimHash
    banding + O(log n) large-star/small-star rounds, functions/graph.py);
    on top of it, one broadcast-sized left join of the cluster map onto
    the corpus (clustered docs are a small fraction) and a 3-group agg.
    The split stays append-stable: new docs only join existing splits,
    and re-clustering only moves docs whose duplicate neighborhood
    changed.

    Design provenance: composes the engine's own hash_split_counts and
    near_dup_clusters operators (no reference analog — the reference has
    no dedup or split surface); the composition law is what's new."""
    from tabular_cdc_bootstrapper_spark.functions.dedup import simhash_near_duplicates
    from tabular_cdc_bootstrapper_spark.functions.graph import dedup_clusters

    d = _t(spark, sf_dir, "documents")
    clusters = dedup_clusters(simhash_near_duplicates(d)).select(
        F.col("id").alias("doc_id"), "component_id"
    )
    g = d.select("doc_id").join(clusters, "doc_id", "left").select(
        "doc_id", F.coalesce("component_id", "doc_id").alias("gk")
    )

    def _bucket(col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("split:"), col.cast("string"))), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % 1000
        )

    def _split(bucket):
        return (
            F.when(bucket < 800, "train")
            .when(bucket < 900, "validation")
            .otherwise("test")
        )

    labeled = g.select(
        _split(_bucket(F.col("gk"))).alias("split"),
        "gk",
        (_split(_bucket(F.col("gk"))) != _split(_bucket(F.col("doc_id"))))
        .cast("long")
        .alias("leak"),
    )
    return labeled.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("gk").alias("n_groups"),
        F.sum("leak").alias("leaked_without_grouping"),
    )


def _pagerank_oracle(iters: int = 3, scale: int = 10**9) -> str:
    """Unrolled integer PageRank iterations in DuckDB SQL — possible
    because functions/graph.py:pagerank keeps every step (trunc-div
    contribution split, damped update) in exact int64, so the rank
    trajectory is bit-identical across engines. num/den = 85/100."""
    base = (scale * 15) // 100
    parts = [
        f"""
    pe AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    e AS (
        SELECT src, dst FROM pe UNION ALL SELECT dst, src FROM pe
    ),
    nodes AS (SELECT DISTINCT src AS v FROM e),
    deg AS (SELECT src AS v, COUNT(*) AS d FROM e GROUP BY src),
    r0 AS (SELECT v, CAST({scale} AS BIGINT) AS r FROM nodes)"""
    ]
    for n in range(1, iters + 1):
        parts.append(f"""
    it{n} AS (
        SELECT e.dst AS v, SUM(r.r // dg.d) AS s
        FROM e JOIN r{n - 1} r ON e.src = r.v JOIN deg dg ON e.src = dg.v
        GROUP BY e.dst
    ),
    r{n} AS (
        SELECT n.v,
               CAST({base} + (85 * COALESCE(it{n}.s, 0)) // 100 AS BIGINT) AS r
        FROM nodes n LEFT JOIN it{n} ON n.v = it{n}.v
    )""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT CAST(v AS BIGINT) AS node_id,
           CASE WHEN v % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           r AS rank_scaled
    FROM r{iters} ORDER BY r DESC, v LIMIT 20
    """
    )


@query("purchase_graph_pagerank", oracle=_pagerank_oracle())
def purchase_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph centrality (the PageRank web-quality signal of
    pretraining pipelines) over the bipartite customer↔supplier purchase
    graph: distinct (customer, supplier) trade edges from lineitem⋈orders,
    symmetrized so no node dangles, 3 damped iterations in exact integer
    arithmetic (functions/graph.py:pagerank — one src-keyed join + one
    map-side-combinable dst aggregate per round, ranks checkpointed like
    the CC star rounds), top-20 hubs with deterministic tie-breaks."""
    from tabular_cdc_bootstrapper_spark.functions.graph import pagerank

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pe = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = pe.union(pe.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank(edges, iters=3)
    return (
        ranks.orderBy(F.col("rank_scaled").desc(), "node_id")
        .limit(20)
        .select(
            F.col("node_id").cast("bigint"),
            F.when(F.col("node_id") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.col("rank_scaled").cast("bigint"),
        )
    )


def _pagerank_dangling_oracle(iters: int = 3, scale: int = 10**9) -> str:
    """Unrolled integer PageRank WITH dangling-mass redistribution
    (VERDICT r8 task 5): per iteration the ranks of out-degree-0 nodes
    sum into one value, split n ways by trunc-div, and join every node's
    incoming sum before damping — replayed in SQL because every step
    stays exact int64 (sums in HUGEINT cast back). The directed
    customer→supplier graph makes EVERY supplier a sink, so the
    redistribution term is live, not vacuous."""
    base = (scale * 15) // 100
    parts = [
        f"""
    e AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS (SELECT src AS v, COUNT(*) AS d FROM e GROUP BY src),
    r0 AS (SELECT v, CAST({scale} AS BIGINT) AS r FROM nodes)"""
    ]
    for n in range(1, iters + 1):
        parts.append(f"""
    d{n} AS (
        SELECT CAST(COALESCE(SUM(r.r), 0) // (SELECT n FROM nn) AS BIGINT)
               AS share
        FROM r{n - 1} r LEFT JOIN deg dg ON r.v = dg.v
        WHERE dg.v IS NULL
    ),
    it{n} AS (
        SELECT e.dst AS v, SUM(r.r // dg.d) AS s
        FROM e JOIN r{n - 1} r ON e.src = r.v JOIN deg dg ON e.src = dg.v
        GROUP BY e.dst
    ),
    r{n} AS (
        SELECT n.v,
               CAST({base} + (85 * (COALESCE(it{n}.s, 0)
                     + (SELECT share FROM d{n}))) // 100 AS BIGINT) AS r
        FROM nodes n LEFT JOIN it{n} ON n.v = it{n}.v
    )""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT CAST(v AS BIGINT) AS node_id,
           CASE WHEN v % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           r AS rank_scaled
    FROM r{iters} ORDER BY r DESC, v LIMIT 20
    """
    )


@query("pagerank_dangling_directed", oracle=_pagerank_dangling_oracle())
def pagerank_dangling_directed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank with dangling-mass redistribution (VERDICT r8 task 5 —
    functions/graph.py pagerank(redistribute_dangling=True)) over the
    DIRECTED customer→supplier purchase graph, where every supplier is a
    sink: without the correction all supplier mass leaks each round and
    ranks stop being comparable across graphs. The correction is the
    standard uniform add-back — one extra 1-row aggregate per iteration
    (Σ dangling rank // n), broadcast back as a literal cross join,
    still exact int64 so the DuckDB oracle unrolls the corrected
    trajectory bit-for-bit. Mass conservation at scale·n is law-tested
    in tests/test_graph_retrieval.py."""
    from tabular_cdc_bootstrapper_spark.functions.graph import pagerank

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(edges, iters=3, redistribute_dangling=True)
    return (
        ranks.orderBy(F.col("rank_scaled").desc(), "node_id")
        .limit(20)
        .select(
            F.col("node_id").cast("bigint"),
            F.when(F.col("node_id") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.col("rank_scaled").cast("bigint"),
        )
    )


def _rocchio_oracle() -> str:
    """Replays nearest-centroid fit + predict + confusion end-to-end: the
    class means are integer trunc-divs of one GROUP BY (HUGEINT sums cast
    back), distances exact int64, argmin ties → smallest label — the same
    closed-form determinism that makes the kmeans oracle possible
    (functions/classify.py)."""
    langs = ["de", "en", "es", "fr", "zh"]
    pats = {
        "de": r"\b(der|die|und|das|ist)\b",
        "en": r"\b(the|and|of|to|is)\b",
        "es": r"\b(el|la|de|que|es)\b",
        "fr": r"\b(le|la|et|les|est)\b",
        # no \b for CJK: Java's \b is Unicode-aware, RE2's is ASCII-only,
        # so a word-bounded CJK pattern silently diverges between engines
        "zh": r"(的|是|了|在|我)",
    }
    plant = " ".join(
        f"WHEN '{g}' THEN ' {p}'"
        for g, p in [
            ("de", "der die und"),
            ("en", "the and of"),
            ("es", "el la que"),
            ("fr", "le et les"),
            ("zh", "的 是 了"),
        ]
    )
    feats = ",\n               ".join(
        f"length(regexp_extract_all(lower(text), '{pats[g]}')) AS f_{g}"
        for g in langs
    )
    cents = ",\n               ".join(
        f"CAST(SUM(f_{g}) // COUNT(*) AS BIGINT) AS c_{g}" for g in langs
    )
    dist = " + ".join(f"(f.f_{g} - c.c_{g}) * (f.f_{g} - c.c_{g})" for g in langs)
    return f"""
    WITH planted AS (
        SELECT doc_id, lang,
               text || CASE WHEN doc_id % 4 <> 0
                            THEN (CASE lang {plant} ELSE '' END)
                            ELSE '' END AS text
        FROM documents
    ), f AS (
        SELECT doc_id, lang,
               {feats}
        FROM planted
    ), cent AS (
        SELECT lang AS clang,
               {cents}
        FROM f GROUP BY lang
    ), pairs AS (
        SELECT f.doc_id, f.lang AS labeled_lang, c.clang,
               {dist} AS dist
        FROM f CROSS JOIN cent c
    ), best AS (
        SELECT labeled_lang, clang AS predicted_lang FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY dist, clang) AS rn
            FROM pairs
        ) WHERE rn = 1
    )
    SELECT labeled_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM best GROUP BY 1, 2
    """


@query("rocchio_lang_confusion", oracle=_rocchio_oracle())
def rocchio_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED language classifier (nearest class mean / Rocchio) vs the
    labeled lang column — the train/predict/evaluate curation pipeline as
    one plan: codegen marker-count features, one groupBy fit (bounded
    model collect: 5×5 ints), literal-model scoring with no corpus
    shuffle, confusion-matrix aggregate. Complements lang_id_confusion
    (the untrained heuristic) the way kmeans complements fixed IVF
    centroids: the model comes FROM the data.

    The fixture text is the same synthetic distribution for every lang
    label (measured: marker means identical across classes), so — like
    semantic_dedup's planted twins — a learnable signal is PLANTED on
    both engines identically: docs with doc_id % 4 != 0 get their label's
    3-marker phrase appended. The trained model must then recover a
    near-diagonal confusion matrix, hash-verified, while the 25%
    unplanted rows keep the evaluation non-trivial."""
    from tabular_cdc_bootstrapper_spark.functions.classify import (
        nearest_centroid_fit_predict,
    )
    from tabular_cdc_bootstrapper_spark.functions.text import (
        LANG_MARKERS,
        marker_count,
    )

    plant_phrase = {
        "de": " der die und",
        "en": " the and of",
        "es": " el la que",
        "fr": " le et les",
        "zh": " 的 是 了",
    }
    d = _t(spark, sf_dir, "documents")
    phrase = F.lit("")
    for g, p in plant_phrase.items():
        phrase = F.when(F.col("lang") == g, F.lit(p)).otherwise(phrase)
    d = d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 4 != 0, phrase).otherwise(F.lit("")),
        ),
    )
    feat_cols = []
    for g in sorted(LANG_MARKERS):
        if g == "zh":
            # no \b around CJK markers: Java's \b is Unicode-aware where
            # RE2's (DuckDB) is ASCII-only — a word-bounded CJK pattern
            # silently counts differently across engines (oracle mirrors)
            feat = F.regexp_count(
                F.lower(F.col("text")),
                F.lit("(" + "|".join(LANG_MARKERS[g]) + ")"),
            )
        else:
            feat = marker_count(F.col("text"), LANG_MARKERS[g])
        d = d.withColumn(f"f_{g}", feat.cast("long"))
        feat_cols.append(f"f_{g}")
    scored = nearest_centroid_fit_predict(d, "lang", feat_cols, out_col="pred")
    return (
        scored.groupBy(
            F.col("lang").alias("labeled_lang"),
            F.col("pred").alias("predicted_lang"),
        )
        .agg(F.count("*").alias("n"))
        .select("labeled_lang", "predicted_lang", F.col("n").cast("bigint"))
    )


def _zorder_sql_interleave(sc_a: str, sc_b: str, bits: int = 16) -> str:
    """The Morton interleave as a SQL bit expression — generated, not
    hand-written, so the Spark column chain (functions/layout.py
    zorder_key) and the oracle share one definition of bit placement:
    bit i of dim a → position 2i+1, of dim b → position 2i."""
    terms = []
    for i in range(bits):
        terms.append(f"((({sc_a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({sc_b} >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


def _zorder_oracle() -> str:
    z = _zorder_sql_interleave("sc", "sd")
    return f"""
WITH d AS (
    SELECT o_custkey,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT) AS day_idx
    FROM orders
), mm AS (
    SELECT MIN(o_custkey) AS mnc, MAX(o_custkey) AS mxc,
           MIN(day_idx) AS mnd, MAX(day_idx) AS mxd
    FROM d
), s AS (
    SELECT o_custkey, day_idx,
           ((o_custkey - mnc) * 65535) // GREATEST(mxc - mnc, 1) AS sc,
           ((day_idx - mnd) * 65535) // GREATEST(mxd - mnd, 1) AS sd
    FROM d CROSS JOIN mm
), z AS (
    SELECT o_custkey, day_idx, ({z}) AS zval FROM s
)
SELECT CAST(zval >> 28 AS BIGINT) AS file_group,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(o_custkey) AS BIGINT) AS min_custkey,
       CAST(MAX(o_custkey) AS BIGINT) AS max_custkey,
       CAST(MIN(day_idx) AS BIGINT) AS min_day,
       CAST(MAX(day_idx) AS BIGINT) AS max_day
FROM z GROUP BY 1
"""


@query("sql_optimize_zorder", oracle=_zorder_oracle())
def sql_optimize_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``OPTIMIZE <t> ZORDER BY (a, b)`` driven through the SQL dialect
    (r15, VERDICT r14 #7 — the maintenance verb the warehouse story
    needs beside CTAS/DML/RESTORE/VACUUM; the reference's tables take
    the same verbs through their Iceberg engine, reference
    tabular.py:8). A bucketed mirror is CTAS'd from half of `orders`
    and INSERT-fragmented with the other half (two files per bucket),
    then one ``OPTIMIZE zo ZORDER BY (o_custkey, day_idx)`` statement
    compacts every bucket to a single z-ordered file. Proof of
    losslessness is the same Morton-cell audit as
    ``zorder_layout_stats`` computed over the POST-OPTIMIZE table read
    back through SQL — cell populations and per-cell min/max must equal
    DuckDB's recompute from raw `orders`; the file-count halving is
    pinned in tests/test_sql.py."""
    import tempfile

    from tabular_cdc_bootstrapper_spark.functions.layout import with_zorder_key
    from tabular_cdc_bootstrapper_spark.sql import TableSql

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.to_date(F.lit("1995-01-01"))
        )
        .cast("long")
        .alias("day_idx"),
    )
    o.createOrReplaceTempView("sql_zorder_src")
    root = tempfile.mkdtemp(prefix="spark_graft_sqlzorder_")
    t = TableSql(spark)
    t.sql(
        f"CREATE TABLE zo LOCATION '{root}/t' PARTITIONED BY "
        "BUCKET(8, o_orderkey) AS "
        "SELECT * FROM sql_zorder_src WHERE o_orderkey % 2 = 0"
    )
    t.sql(
        "INSERT INTO zo SELECT * FROM sql_zorder_src WHERE o_orderkey % 2 = 1"
    )
    rec = t.sql("OPTIMIZE zo ZORDER BY (o_custkey, day_idx)")
    if rec["files_after"] > rec["files_before"]:
        raise AssertionError(
            f"OPTIMIZE grew the table: {rec['files_before']} -> "
            f"{rec['files_after']} files"
        )
    keyed = with_zorder_key(
        t.sql("SELECT o_custkey, day_idx FROM zo"),
        ["o_custkey", "day_idx"],
        bits=16,
    )
    return (
        keyed.withColumn("file_group", F.shiftright("zval", 28))
        .groupBy("file_group")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.min("day_idx").alias("min_day"),
            F.max("day_idx").alias("max_day"),
        )
        .select(
            F.col("file_group").cast("bigint"),
            F.col("n_rows").cast("bigint"),
            F.col("min_custkey").cast("bigint"),
            F.col("max_custkey").cast("bigint"),
            F.col("min_day").cast("bigint"),
            F.col("max_day").cast("bigint"),
        )
    )


@query("zorder_layout_stats", oracle=_zorder_oracle())
def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit over orders on (o_custkey, order day): Morton
    code in exact integer arithmetic (min-max scale → bit interleave, all
    JVM-side column expressions — functions/layout.py), file cells taken
    as the top 4 Morton bits (= the 4×4 quadtree of custkey-quartile ×
    date-quartile). Each cell's min/max per dimension demonstrates WHY
    the layout prunes: every cell is a small rectangle of the key space,
    so parquet/Iceberg min-max file stats cut selective predicates on
    EITHER dimension. ``write_zordered`` is the corresponding
    materialization path (repartitionByRange on the z-key — distributed
    sampling, never a single-task sort)."""
    from tabular_cdc_bootstrapper_spark.functions.layout import with_zorder_key

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.to_date(F.lit("1995-01-01"))
        )
        .cast("long")
        .alias("day_idx"),
    )
    keyed = with_zorder_key(o, ["o_custkey", "day_idx"], bits=16)
    return (
        keyed.withColumn("file_group", F.shiftright("zval", 28))
        .groupBy("file_group")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.min("day_idx").alias("min_day"),
            F.max("day_idx").alias("max_day"),
        )
        .select(
            F.col("file_group").cast("bigint"),
            F.col("n_rows").cast("bigint"),
            F.col("min_custkey").cast("bigint"),
            F.col("max_custkey").cast("bigint"),
            F.col("min_day").cast("bigint"),
            F.col("max_day").cast("bigint"),
        )
    )
