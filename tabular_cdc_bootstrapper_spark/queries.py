"""Query registry: every operator exposed through the driver contract.

Each entry pairs a Spark implementation ``fn(spark, sf_dir) -> DataFrame``
with an ANSI-SQL oracle string DuckDB runs on the same parquet tables
(``None`` for non-SQL-expressible ops → driver does a rows-only check).
Column names/aliases match exactly between the two sides — the driver's
compare sorts columns by name before value-hashing.

Registered via the ``@query(name, oracle)`` decorator; ``__spark_entry__``
just re-exports the dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tabular_cdc_bootstrapper_spark.operators.cdc import apply_changelog

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is nanosecond-precision parquet (FIXTURES.md §B), which
        # Spark 4 rejects outright; read it as raw ns-since-epoch and
        # truncate to µs in-plan — the same truncation DuckDB applies, so
        # oracle comparisons line up. The conf is dynamic (scan-time).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        # integral `div`, NOT `/`: ns epoch values (~1.7e18) exceed double's
        # 2^53 integer range, so float division silently drifts by ±1 µs
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# CDC flagship (SURVEY.md §2.5 W1 / §2.4 A1 / §2.3 J1-J2) — the reference's
# delegated DMS merge (tabular.py:58-62) exercised at oracle-checkable scale
# via a changelog derived deterministically from `orders` (FIXTURES.md §C):
#   ts=0 insert of every order; ts=1 update (status → 'X') where key%7=0;
#   ts=2 delete where key%13=0. Expected mirror: latest non-D row per key.
# ---------------------------------------------------------------------------

_ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def derived_orders_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    inserts = o.select(*_ORDER_COLS).withColumns(
        {"op": F.lit("I"), "ts": F.lit(0).cast("int")}
    )
    updates = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_orderstatus", F.lit("X"))
        .select(*_ORDER_COLS)
        .withColumns({"op": F.lit("U"), "ts": F.lit(1).cast("int")})
    )
    deletes = (
        o.filter(F.col("o_orderkey") % 13 == 0)
        .select(*_ORDER_COLS)
        .withColumns({"op": F.lit("D"), "ts": F.lit(2).cast("int")})
    )
    return inserts.unionByName(updates).unionByName(deletes)


@query(
    "cdc_ops_histogram",
    oracle="""
    WITH changelog AS (
        SELECT 'I' AS op FROM orders
        UNION ALL SELECT 'U' FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL SELECT 'D' FROM orders WHERE o_orderkey % 13 = 0
    )
    SELECT op, CAST(COUNT(*) AS BIGINT) AS n FROM changelog GROUP BY op
    """,
)
def cdc_ops_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest observability: per-op event counts (SURVEY.md §2.4 A2)."""
    return derived_orders_changelog(spark, sf_dir).groupBy("op").agg(
        F.count("*").alias("n")
    )


@query(
    "cdc_latest",
    oracle="""
    WITH changelog AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority, 'I' AS op, 0 AS ts
        FROM orders
        UNION ALL
        SELECT o_orderkey, o_custkey, 'X', o_totalprice,
               o_orderdate, o_orderpriority, 'U', 1
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority, 'D', 2
        FROM orders WHERE o_orderkey % 13 = 0
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY o_orderkey ORDER BY ts DESC) AS rn
        FROM changelog
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: DMS changelog → current-state mirror (single-shuffle max_by)."""
    changelog = derived_orders_changelog(spark, sf_dir)
    return apply_changelog(
        changelog,
        key_cols="o_orderkey",
        ts_cols="ts",
        op_col="op",
        delete_op="D",
        drop_envelope=["op", "ts"],
    )


# ---------------------------------------------------------------------------
# Relational surface (SURVEY.md §2.2-2.8 EXT): hash aggregates, star-schema
# joins, windows, top-k, set ops, scalar/date/JSON functions. All expressed
# declaratively — Catalyst provides pushdown, pruning, partial aggregation,
# and join-strategy selection (broadcast for the small dims).
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-side filter pushdown + partial hash agg."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS o_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → joins → agg → top-k.

    customer is broadcast (small side); orders⋈lineitem shuffles on the
    orderkey; orderBy+limit compiles to TakeOrderedAndProject (no global
    sort at scale)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(l.l_orderkey.alias("o_orderkey"), "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; every dim side broadcast, one shuffle
    on the fact keys."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query(
    "top3_orders_per_customer",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window (SURVEY.md §2.5 W2)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "customer_order_window_stats",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice - LAG(o_totalprice) OVER w, 2) AS price_delta,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           CAST(RANK() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS price_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def customer_order_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window surface: lag, running frame sum, rank (W2)."""
    o = _t(spark, sf_dir, "orders")
    wt = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(wt), 2).alias("price_delta"),
        F.round(
            F.sum("o_totalprice").over(wt.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
        F.rank().over(wr).alias("price_rank"),
    )


@query(
    "rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregate with grouping id (SURVEY.md §2.4 A3)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
    )


@query(
    "cube_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 4).alias("avg_price")
    )


@query(
    "semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join = EXISTS (SURVEY.md §2.3 J4)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "anti_join_no_open_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def anti_join_no_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti join = NOT EXISTS — the CDC delete-application shape
    (SURVEY.md §2.3 J2) exercised relationally."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "outer_join_order_fill",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(COALESCE(o.cnt, 0) AS BIGINT) AS n_orders,
           ROUND(COALESCE(o.total, 0.0), 2) AS total_spend
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS cnt, SUM(o_totalprice) AS total
        FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
)
def outer_join_order_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-fill — aggregate pushed below the join so
    the join input is |customers| + |custkeys|, not |orders|."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"), F.sum("o_totalprice").alias("total"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("n_orders"),
            F.round(F.coalesce(F.col("total"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@query(
    "set_ops_part_coverage",
    oracle="""
    SELECT 'ordered' AS bucket, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT p_partkey FROM part INTERSECT SELECT l_partkey FROM lineitem
    )
    UNION ALL
    SELECT 'never_ordered', CAST(COUNT(*) AS BIGINT) FROM (
        SELECT p_partkey FROM part EXCEPT SELECT l_partkey FROM lineitem
    )
    """,
)
def set_ops_part_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect / except distinct (SURVEY.md §2.7)."""
    p = _t(spark, sf_dir, "part").select("p_partkey")
    l = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    spark_sess = spark
    ordered = p.intersect(l).count()
    never = p.exceptAll(l.distinct()).distinct().count()
    return spark_sess.createDataFrame(
        [("ordered", ordered), ("never_ordered", never)], "bucket string, n bigint"
    )


@query(
    "orders_by_year",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order
    FROM orders
    GROUP BY 1, 2
    """,
)
def orders_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date scalar surface (SURVEY.md §2.8 F9): year extraction + min/max
    over timestamps."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            "o_orderstatus",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


@query(
    "string_funcs_parts",
    oracle="""
    SELECT p_brand,
           SUBSTRING(p_type, 1, 6) AS type_prefix,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN p_size > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
           ROUND(AVG(p_retailprice), 4) AS avg_price,
           MAX(UPPER(p_name)) AS max_name_upper
    FROM part
    GROUP BY p_brand, SUBSTRING(p_type, 1, 6)
    """,
)
def string_funcs_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface: substring/upper/case-when (F9)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy(
            "p_brand", F.substring("p_type", 1, 6).alias("type_prefix")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("p_size") > 25, 1).otherwise(0)).cast("bigint").alias("n_large"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
            F.max(F.upper("p_name")).alias("max_name_upper"),
        )
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string extraction (SURVEY.md §2.8 F8): get_json_object is
    evaluated JVM-side; at scale prefer from_json with a pinned schema so
    the parse happens once per row."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "events_tumbling_10min",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS bucket_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window (SURVEY.md §2.9 T5, batch form — the
    streaming form with watermark lives in streaming/windows.py)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").start.alias("bucket_start"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


# ---------------------------------------------------------------------------
# North-star surface (BASELINE.json): text analysis, dedup, similarity
# search, multimodal plumbing over documents/embeddings (SURVEY.md §2.10).
# ---------------------------------------------------------------------------


@query(
    "text_stats_by_lang",
    oracle=r"""
    WITH stats AS (
        SELECT lang,
               length(text) AS n_chars,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE length(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
               CASE WHEN length(text) > 0
                    THEN CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE) / length(text)
                    ELSE 0.0 END AS punct_ratio
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           ROUND(AVG(n_tokens), 4) AS avg_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(AVG(punct_ratio), 6) AS avg_punct_ratio
    FROM stats GROUP BY lang
    """,
)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics built on with_text_stats (UDF-free)."""
    from tabular_cdc_bootstrapper_spark.functions.text import with_text_stats

    d = with_text_stats(_t(spark, sf_dir, "documents"))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("stat_n_chars"), 4).alias("avg_chars"),
        F.round(F.avg("stat_n_tokens"), 4).alias("avg_tokens"),
        F.sum("stat_n_tokens").alias("total_tokens"),
        F.round(F.avg("stat_punct_ratio"), 6).alias("avg_punct_ratio"),
    )


@query(
    "lang_id_confusion",
    oracle=r"""
    WITH scored AS (
        SELECT lang AS labeled_lang,
               list_aggregate([
                   {'score': length(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')), 'lang': 'de'},
                   {'score': length(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b')), 'lang': 'en'},
                   {'score': length(regexp_extract_all(lower(text), '\b(el|la|de|que|es)\b')), 'lang': 'es'},
                   {'score': length(regexp_extract_all(lower(text), '\b(le|la|et|les|est)\b')), 'lang': 'fr'},
                   {'score': length(regexp_extract_all(lower(text), '\b(的|是|了|在|我)\b')), 'lang': 'zh'}
               ], 'max') AS best
        FROM documents
    )
    SELECT labeled_lang,
           CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS lang_guess,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM scored GROUP BY 1, 2
    """,
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-heuristic language ID vs the labeled lang column."""
    from tabular_cdc_bootstrapper_spark.functions.text import with_lang_guess

    d = with_lang_guess(_t(spark, sf_dir, "documents"))
    return (
        d.groupBy(F.col("lang").alias("labeled_lang"), "lang_guess")
        .agg(F.count("*").alias("n"))
    )


@query(
    "dedup_exact_groups",
    oracle=r"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        -- deterministic planted duplicates: every 50th doc re-appears with
        -- an offset id (same derivation on the Spark side)
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
    ),
    hashed AS (
        SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS digest,
               doc_id
        FROM corpus
    )
    SELECT digest,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM hashed GROUP BY digest HAVING COUNT(*) > 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups (hash-groupBy dedup, north star). The fixture
    corpus has no natural byte-identical dups, so every 50th document is
    re-appended under an offset id — deterministically on both sides — to
    keep the check non-degenerate."""
    from tabular_cdc_bootstrapper_spark.functions.dedup import exact_dedup_groups

    d = _t(spark, sf_dir, "documents")
    planted = d.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    corpus = d.select("doc_id", "text").unionByName(planted.select("doc_id", "text"))
    g = exact_dedup_groups(corpus)
    return g.filter(F.col("n_copies") > 1).select("digest", "canonical_id", "n_copies")


@query(
    "top_terms",
    oracle=r"""
    WITH tokens AS (
        SELECT lower(unnest(regexp_split_to_array(trim(text), '\s+'))) AS term
        FROM documents WHERE length(trim(text)) > 0
    )
    SELECT term, CAST(COUNT(*) AS BIGINT) AS n
    FROM tokens GROUP BY term
    ORDER BY n DESC, term LIMIT 20
    """,
)
def top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequencies: explode + hash agg + top-k."""
    d = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    return (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("term"))
        .select(F.lower("term").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(20)
    )


@query(
    "cosine_topk",
    oracle="""
    WITH q AS (
        SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5
    ),
    pairs AS (
        SELECT q.qid, e.vec_id,
               list_sum(list_transform(list_zip(q.qv, e.embedding),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
               (sqrt(list_sum(list_transform(q.qv,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
                sqrt(list_sum(list_transform(e.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
        FROM q, embeddings e
        WHERE e.vec_id <> q.qid
    ),
    ranked AS (
        SELECT qid, vec_id, sim,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
        FROM pairs
    )
    SELECT qid, vec_id, ROUND(sim, 6) AS cos_sim, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= 10
    """,
)
def cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force ANN baseline: top-10 cosine neighbors for the
    first 5 vectors. Native HOF arithmetic, broadcast query side."""
    from tabular_cdc_bootstrapper_spark.functions.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return cosine_topk(emb, q, k=10)


@query("minhash_near_duplicates")  # rows-only: xxhash64 family is engine-specific
def minhash_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates verified by exact shingle Jaccard.
    Non-SQL-expressible (hash family); correctness covered by planted-dup
    tests in tests/test_north_star.py."""
    from tabular_cdc_bootstrapper_spark.functions.dedup import verified_near_duplicates

    return verified_near_duplicates(
        _t(spark, sf_dir, "documents"), threshold=0.5
    )


@query("ann_lsh_topk")  # rows-only: approximate by design (recall-tested)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k — the 100 TB scale path for
    similarity search; recall vs brute force asserted in tests."""
    from tabular_cdc_bootstrapper_spark.functions.similarity import lsh_bucketed_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return lsh_bucketed_topk(emb, q, dim=64, k=10, n_planes=4, n_probes=2)


@query("doc_fingerprints")  # rows-only: xxhash64-based digest
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-set rolling-hash fingerprint per document."""
    from tabular_cdc_bootstrapper_spark.functions.text import with_fingerprint

    return with_fingerprint(_t(spark, sf_dir, "documents")).select(
        "doc_id", "fingerprint"
    )


@query("multimodal_features")  # rows-only: pandas-UDF stub codec boundary
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns → Arrow-batched feature extraction (stub codec;
    real plumbing — schema/batching/partitioning are production-shaped)."""
    from tabular_cdc_bootstrapper_spark.functions.multimodal import (
        extract_features,
        media_from_documents,
    )

    media = media_from_documents(_t(spark, sf_dir, "documents"))
    return extract_features(media).select("media_id", "n_bytes", "content_digest")


# ---------------------------------------------------------------------------
# Extended relational/temporal surface: as-of join, sessionization, pivot,
# exact percentiles, statistical aggregates, string distance, array scalars.
# ---------------------------------------------------------------------------


@query(
    "asof_purchase_signup",
    oracle="""
    WITH s AS (
        SELECT user_id, ts, MAX(value) AS sv
        FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
    ),
    p AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           s.ts AS signup_ts,
           ROUND(s.sv, 4) AS signup_value
    FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def asof_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase gets the user's most recent
    signup at-or-before it (operators/asof.py union-window form — one
    keyed shuffle, no range explosion)."""
    from tabular_cdc_bootstrapper_spark.operators.asof import as_of_join

    e = _t(spark, sf_dir, "events")
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("sv"))
        .withColumn("signup_ts", F.col("ts"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = as_of_join(
        purchases,
        signups,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["signup_ts", "sv"],
        suffix="",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("signup_ts"),
        F.round("sv", 4).alias("signup_value"),
    )


@query(
    "user_sessions",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    ),
    flagged AS (
        SELECT user_id,
               CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        FROM ordered
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min inactivity gap splits sessions (lag + flag +
    aggregate; the streaming twin is session_window in streaming/windows)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = e.select(
        "user_id",
        F.when(
            F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > 1800000000),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@query(
    "pivot_revenue_by_status",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS rev_O,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS rev_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_revenue_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one output column per pivoted key value."""
    l = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    piv = (
        l.select("l_returnflag", "l_linestatus", rev)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.coalesce(F.round(F.sum("rev"), 2), F.lit(0.0)))
    )
    return piv.select(
        "l_returnflag",
        F.col("O").alias("rev_O"),
        F.col("F").alias("rev_F"),
    )


@query(
    "price_percentiles",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (approx_percentile is the sketch
    variant for 100 TB — same API shape, oracle uses the exact form)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "stats_price_quantity",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 2) AS sd_price,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
           ROUND(covar_samp(l_extendedprice, l_quantity), 2) AS cov_pq
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: stddev/variance/correlation/covariance."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("cov_pq"),
    )


@query(
    "window_navigation",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LEAD(o_orderkey) OVER w AS next_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_orderkey,
           CAST(NTILE(4) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS price_quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions: lead, first_value, ntile."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wq = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.ntile(4).over(wq).alias("price_quartile"),
    )


@query(
    "customer_order_years",
    oracle="""
    SELECT c.c_custkey,
           array_to_string(list_sort(list(DISTINCT EXTRACT(year FROM o.o_orderdate))), ',') AS order_years,
           CAST(COUNT(DISTINCT EXTRACT(year FROM o.o_orderdate)) AS BIGINT) AS n_years
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def customer_order_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation scalars: collect_set → sort → join to string
    (string-valued so cross-engine hashing is stable)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set(yr)), ",").alias("order_years"),
            F.countDistinct(yr).alias("n_years"),
        )
    )


@query(
    "brand_name_distance",
    oracle="""
    WITH brands AS (SELECT DISTINCT p_brand FROM part)
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           CAST(levenshtein(a.p_brand, b.p_brand) AS INT) AS edit_dist
    FROM brands a JOIN brands b ON a.p_brand < b.p_brand
    """,
)
def brand_name_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-distance scalar (levenshtein) over a distinct self-join."""
    b = _t(spark, sf_dir, "part").select("p_brand").distinct()
    a = b.withColumnRenamed("p_brand", "brand_a")
    c = b.withColumnRenamed("p_brand", "brand_b")
    return (
        a.join(c, F.col("brand_a") < F.col("brand_b"))
        .withColumn("edit_dist", F.levenshtein("brand_a", "brand_b"))
    )


@query(
    "distinct_count_dims",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT EXTRACT(year FROM o_orderdate)) AS BIGINT) AS n_years,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    """,
)
def distinct_count_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation (Catalyst expands to a single pass;
    approx_count_distinct is the HLL sketch swap-in at 100 TB)."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct(F.year("o_orderdate")).alias("n_years"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.count("*").alias("n_orders"),
    )


@query("simhash_near_duplicates")  # rows-only: xxhash64-based sketch
def simhash_near_duplicates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3 on a 64-bit sketch) with
    16-bit-band blocking; planted-dup correctness in tests."""
    from tabular_cdc_bootstrapper_spark.functions.dedup import simhash_near_duplicates

    return simhash_near_duplicates(_t(spark, sf_dir, "documents"))


@query("embedding_near_duplicates")  # rows-only: approximate blocking
def embedding_near_duplicates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.9) via sign-random-
    projection blocking + exact verification. Random fixture vectors have
    no natural near-dups at this threshold, so every 100th vector is
    re-appended (scaled by 1.000001) under an offset id — the pipeline
    must find exactly those planted pairs."""
    from tabular_cdc_bootstrapper_spark.functions.dedup import embedding_near_duplicates

    e = _t(spark, sf_dir, "embeddings")
    planted = (
        e.filter(F.col("vec_id") % 100 == 0)
        .withColumn("vec_id", F.col("vec_id") + 1000000)
        .withColumn("embedding", F.transform("embedding", lambda x: x * F.lit(1.000001)))
    )
    return embedding_near_duplicates(e.unionByName(planted), threshold=0.9)


@query(
    "q4_order_priority_check",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → left_semi join."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    qualifying = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return qualifying.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN (
        SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg
        FROM lineitem GROUP BY l_partkey
    ) a ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < a.half_avg
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate subquery → self-join against
    a pre-aggregated per-key threshold (the decorrelated plan)."""
    l = _t(spark, sf_dir, "lineitem")
    thresholds = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        l.join(thresholds, l.l_partkey == thresholds.pk)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "orders_above_global_avg",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_above,
           ROUND(MIN(o_totalprice), 2) AS min_above
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def orders_above_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: filter against a single-row aggregate (broadcast)."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_sq")
    return spark.sql(
        """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_above,
               ROUND(MIN(o_totalprice), 2) AS min_above
        FROM __orders_sq
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM __orders_sq)
        """
    )


@query(
    "brand_having_filter",
    oracle="""
    SELECT p_brand,
           ROUND(AVG(p_retailprice), 4) AS avg_price,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM part
    GROUP BY p_brand
    HAVING COUNT(*) >= 5 AND AVG(p_retailprice) > 900
    """,
)
def brand_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation predicate (HAVING)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
            F.count("*").alias("n_parts"),
        )
        .filter((F.col("n_parts") >= 5) & (F.col("avg_price") > 900))
    )


@query(
    "nations_with_presence",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE n_nationkey IN (
        SELECT c_nationkey FROM customer
        UNION
        SELECT s_nationkey FROM supplier
    )
    """,
)
def nations_with_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) + IN-subquery (semi join)."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    present = c.union(s).distinct()
    return n.join(present, n.n_nationkey == present.k, "left_semi").select(
        "n_nationkey", "n_name"
    )


@query("ann_ivf_topk")  # rows-only: approximate by design (recall-tested)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate ANN (inverted lists by nearest sampled
    centroid, multi-probe) — the partition-pruned scale path."""
    from tabular_cdc_bootstrapper_spark.functions.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return ivf_topk(emb, q, k=10)
