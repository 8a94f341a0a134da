"""Relational surface: aggregates, joins, windows, set ops, temporal.

Split from the single-file registry (VERDICT r9 item 3); every entry
registers via the shared ``@query`` decorator in ``_registry``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from tabular_cdc_bootstrapper_spark.queries._registry import (_sql_cos, _t, query)


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
    "skewed_priority_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def skewed_priority_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation (operators/skew.py, VERDICT r5 #4):
    o_orderpriority has only 5 values, so each group holds ~20% of the
    table — the exact shape where a single-phase groupBy makes 5 reducers
    do all the work. salted_agg splits each group across 16 salted
    partials, then merges; the ORACLE IS THE PLAIN GROUP BY, because the
    salted law is result identity. The sum runs over DECIMAL(18,2)
    (o_totalprice is a 2-decimal value, so the cast is exact) to keep the
    identity bit-exact under the salt's re-ordering of float additions."""
    from tabular_cdc_bootstrapper_spark.operators.skew import salted_agg

    o = _t(spark, sf_dir, "orders")
    out = salted_agg(
        o,
        ["o_orderpriority"],
        {
            "total_price": ("sum", F.col("o_totalprice").cast("decimal(18,2)")),
            "n_orders": ("count", F.col("o_orderkey")),
            "min_price": ("min", F.col("o_totalprice")),
            "max_price": ("max", F.col("o_totalprice")),
        },
        n_salts=16,
    )
    return out.select(
        "o_orderpriority",
        F.col("total_price").cast("double"),
        "n_orders",
        "min_price",
        "max_price",
    )


@query(
    "salted_nation_revenue",
    oracle="""
    SELECT s.s_nationkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def salted_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicate-join (operators/skew.py salted_join, VERDICT r5
    #4): the big (fact) side is salted, the dim side replicated once per
    salt, so a hot supplier key spreads over 8 tasks instead of one
    straggler. The oracle is the PLAIN equi-join — the salted law is
    result identity. (supplier would normally broadcast at this size; it
    stands in for a mid-size dim that doesn't fit the broadcast
    threshold, which is exactly when salted_join earns its keep.)"""
    from tabular_cdc_bootstrapper_spark.operators.skew import salted_join

    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(l, s, on="l_suppkey", n_salts=8, how="inner")
    return joined.groupBy("s_nationkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n_items"),
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
    """intersect / except distinct (SURVEY.md §2.7) — one lazy plan, no
    driver-side counts (the earlier form ran two eager actions and
    re-created a local DataFrame, an anti-pattern at any scale)."""
    p = _t(spark, sf_dir, "part").select("p_partkey")
    l = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    inter = p.intersect(l).agg(F.count("*").alias("n")).select(
        F.lit("ordered").alias("bucket"), "n"
    )
    never = p.subtract(l).agg(F.count("*").alias("n")).select(
        F.lit("never_ordered").alias("bucket"), "n"
    )
    return inter.unionByName(never)


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
    "range_join_click_attribution",
    oracle="""
    SELECT s.event_id AS signup_event_id,
           s.user_id,
           c.event_id AS click_event_id,
           c.ts AS click_ts,
           ROUND(c.value, 4) AS click_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') s
    JOIN (SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'click') c
      ON s.user_id = c.user_id
     AND c.ts >= s.ts
     AND c.ts <= s.ts + INTERVAL '30 minutes'
    """,
)
def range_join_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join via banding (SURVEY.md §2.3 J5, second half):
    each signup is paired with the same user's clicks in the 30 minutes at
    or after it. banded_range_join buckets both sides into window-sized
    time bands so the equi-join key is (user_id, band) — candidate pairs
    are limited to same-or-adjacent buckets instead of the whole per-user
    history, and a hot user's events spread across many partitions (the
    plain non-equi form materializes O(n_k·m_k) pairs per key before the
    range filter — a scale-killer at 100 TB)."""
    from tabular_cdc_bootstrapper_spark.operators.rangejoin import banded_range_join

    e = _t(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = banded_range_join(
        signups,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        lower_s=0,
        upper_s=1800,
        right_payload=["event_id", "value"],
        suffix="_click",
    )
    return joined.select(
        F.col("event_id").alias("signup_event_id"),
        "user_id",
        F.col("event_id_click").alias("click_event_id"),
        F.col("ts_click").alias("click_ts"),
        F.round("value_click", 4).alias("click_value"),
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


@query(
    "simhash_near_duplicates",
    oracle=r"""
    WITH toks AS (
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
    )
    SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
           CAST(bit_count(xor(a.sim, b2.sim)) AS INT) AS hamming
    FROM kept a JOIN kept b2
      ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id
    WHERE bit_count(xor(a.sim, b2.sim)) <= 3
    """,
)
def simhash_near_duplicates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3 on a 64-bit sketch) with
    16-bit-band blocking.

    Oracle-checkable end to end: the token hash family is md5-lower-64
    (DuckDB ``md5_number_lower``) so both engines compute bit-identical
    sketches, the 4×16-bit-band pigeonhole blocking has GUARANTEED recall
    for Hamming ≤ 3 (≤3 flipped bits can't touch all 4 bands), and the
    oracle replicates the banding INCLUDING the ``max_bucket_size=200``
    skew cap — the deterministic algorithm, verified exactly (at sf0.1 a
    few degenerate band values exceed the cap, so a ground-truth all-pairs
    oracle would diverge by design; the cap is the documented scale
    trade-off, not an accident)."""
    from tabular_cdc_bootstrapper_spark.functions.dedup import simhash_near_duplicates

    return simhash_near_duplicates(_t(spark, sf_dir, "documents"))


@query(
    "embedding_near_duplicates",
    oracle="""
    WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
        FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000,
               list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.000001)
        FROM embeddings WHERE vec_id % 100 = 0
    ), pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_sum(list_transform(list_zip(a.embedding, b.embedding),
                        x -> x[1] * x[2])) /
               (sqrt(list_sum(list_transform(a.embedding, x -> x * x))) *
                sqrt(list_sum(list_transform(b.embedding, x -> x * x)))) AS cos
        FROM base a JOIN base b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, ROUND(cos, 6) AS cos_sim
    FROM pairs WHERE cos >= 0.9
    """,
)
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
    "near_dup_clusters",
    oracle="""
    WITH RECURSIVE toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
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
    ), sizes AS (
        SELECT component_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
        FROM comp GROUP BY component_id
    )
    SELECT c.id, c.component_id, s.cluster_size,
           c.id = c.component_id AS is_canonical
    FROM comp c JOIN sizes s USING (component_id)
    """,
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs → duplicate CLUSTERS: the transitive-closure step a corpus
    dedup actually needs (keep one canonical doc per cluster, drop the
    rest). Pairs come from the SimHash pipeline (deterministic md5-lower-64
    family, so the pair set is oracle-exact); clustering is alternating
    large-star/small-star connected components (`functions/graph.py` —
    O(log n) rounds, no neighborhood ever materialized as one row). The
    oracle recomputes the same pair set in SQL and closes it with a
    recursive min-label CTE — tractable on fixture-scale graphs, which is
    exactly why the distributed side exists for the 100 TB one."""
    from tabular_cdc_bootstrapper_spark.functions.dedup import simhash_near_duplicates
    from tabular_cdc_bootstrapper_spark.functions.graph import dedup_clusters

    pairs = simhash_near_duplicates(_t(spark, sf_dir, "documents"))
    return dedup_clusters(pairs)


@query(
    "incremental_cluster_maintenance",
    oracle="""
    WITH RECURSIVE toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
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
    )
    SELECT id, MIN(lab) AS component_id FROM reach GROUP BY id
    """,
)
def incremental_cluster_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental pair→cluster maintenance, driven end-to-end (VERDICT
    r6 #6): the SimHash pair stream is split 90/10 by an id hash (the
    realistic maintenance shape — the 90% is the standing corpus whose
    clusters already exist, the 10% is one incoming batch's pair delta),
    the standing side is clustered with the batch large-star/small-star,
    and the delta is folded in with ``functions/graph.update_clusters``
    (component contraction over the delta, broadcast relabel,
    changed-rows-only update) applied as an upsert. The maintenance LAW —
    the folded mapping is row-identical to the batch recompute over all
    pairs — is what makes this oracle-exact: DuckDB closes the full pair
    set with the recursive min-label CTE and must agree bit-for-bit with
    the two-step incremental result (tests additionally pin the law on
    adversarial 50/50 and 3-way splits).

    Scale shape: per batch, only delta-sized frames shuffle; the standing
    mapping streams map-side through two broadcast joins (plan-pinned).
    SCALING.md carries the measured flat-in-corpus per-batch cost."""
    from pyspark.sql import functions as SF

    from tabular_cdc_bootstrapper_spark.functions.dedup import simhash_near_duplicates
    from tabular_cdc_bootstrapper_spark.functions.graph import (
        apply_cluster_update,
        connected_components,
        update_clusters,
    )

    pairs = (
        simhash_near_duplicates(_t(spark, sf_dir, "documents"))
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    standing = pairs.filter(SF.col("id_a") % 10 != 9)
    delta = pairs.filter(SF.col("id_a") % 10 == 9)
    m1 = connected_components(standing).localCheckpoint(eager=True)
    return apply_cluster_update(m1, update_clusters(m1, delta))


@query(
    "corpus_dedup_summary",
    oracle="""
    WITH RECURSIVE toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
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
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(c.id) AS BIGINT) AS n_in_clusters,
           CAST(SUM(CASE WHEN c.id IS NOT NULL AND c.id <> c.component_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(COUNT(*) - SUM(CASE WHEN c.id IS NOT NULL
                                         AND c.id <> c.component_id
                                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
    GROUP BY d.lang
    """,
)
def corpus_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end dedup decision, summarized per language: pairs
    (SimHash) → transitive clusters (connected components) → keep the
    canonical min-id member of each cluster plus every unclustered doc,
    drop the rest. This is the query a pipeline operator runs before
    committing a dedup pass — "how much of each slice would I lose?"."""
    from tabular_cdc_bootstrapper_spark.functions.dedup import simhash_near_duplicates
    from tabular_cdc_bootstrapper_spark.functions.graph import dedup_clusters

    d = _t(spark, sf_dir, "documents")
    clusters = dedup_clusters(simhash_near_duplicates(d)).select(
        F.col("id").alias("doc_id"), "is_canonical"
    )
    joined = d.select("doc_id", "lang").join(clusters, "doc_id", "left")
    dropped = F.when(
        F.col("is_canonical").isNotNull() & ~F.col("is_canonical"), 1
    ).otherwise(0)
    return joined.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count("is_canonical").alias("n_in_clusters"),
        F.sum(dropped).alias("n_dropped"),
        (F.count("*") - F.sum(dropped)).alias("n_kept"),
    )


@query(
    "bm25_topk",
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
    )
    SELECT doc_id,
           CAST(COUNT(DISTINCT term) AS BIGINT) AS n_terms,
           ROUND(SUM(
               ln(1 + (n_docs - df + 0.5) / (df + 0.5))
               * tf * (1.2 + 1)
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 6) AS bm25
    FROM tf JOIN dfs USING (term) CROSS JOIN stats
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 10
    """,
)
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval: BM25 top-10 for the query {dup, vector, merge} —
    one rare term (df 25/500 at sf0.01) and two common ones, so the idf
    weighting actually decides the ranking. Sparse counterpart to the
    embedding retrievers in `functions/similarity.py`; see
    `functions/retrieval.py` for the inverted-index-shaped plan (corpus
    shuffle carries matching (doc_id, term) rows only; df/stats broadcast
    back; top-k via TakeOrderedAndProject). Scores round to 6 dp BEFORE
    ranking so the cut is reproducible across engines."""
    from tabular_cdc_bootstrapper_spark.functions.retrieval import bm25_topk

    return bm25_topk(_t(spark, sf_dir, "documents"), ["dup", "vector", "merge"], k=10)


@query(
    "repetition_stats_by_lang",
    oracle=r"""
    WITH base AS (
        SELECT doc_id, lang,
               string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents WHERE trim(text) <> ''
    ), tok AS (
        SELECT doc_id, lang, unnest(toks) AS g FROM base
    ), tc AS (
        SELECT doc_id, lang, g, COUNT(*) AS c
        FROM tok GROUP BY doc_id, lang, g
    ), ta AS (
        SELECT doc_id, lang,
               CAST(COUNT(*) AS DOUBLE) / SUM(c) AS distinct_ratio,
               CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_tok
        FROM tc GROUP BY doc_id, lang
    ), big AS (
        SELECT doc_id, lang,
               unnest(list_transform(range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i + 1])) AS g
        FROM base WHERE len(toks) >= 2
    ), bc AS (
        SELECT doc_id, lang, g, COUNT(*) AS c
        FROM big GROUP BY doc_id, lang, g
    ), ba AS (
        SELECT doc_id, lang, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_big
        FROM bc GROUP BY doc_id, lang
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(distinct_ratio), 6) AS avg_distinct_ratio,
           ROUND(AVG(top_tok), 6) AS avg_top_token_frac,
           ROUND(AVG(top_big), 6) AS avg_top_bigram_frac
    FROM ta LEFT JOIN ba USING (doc_id, lang)
    GROUP BY lang
    """,
)
def repetition_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters rolled up per language: distinct-
    token ratio, top-token share, top-bigram share (the boilerplate/spam
    signals the length+punct quality score misses). Per-doc stats come from
    `functions/text.py repetition_stats` — one unioned explode, two keyed
    map-side-combinable aggregations, `lang` carried on the keys instead of
    a corpus-sized join-back."""
    from tabular_cdc_bootstrapper_spark.functions.text import repetition_stats

    r = repetition_stats(
        _t(spark, sf_dir, "documents"), carry_cols=("lang",)
    )
    return r.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("distinct_token_ratio"), 6).alias("avg_distinct_ratio"),
        F.round(F.avg("top_token_frac"), 6).alias("avg_top_token_frac"),
        F.round(F.avg("top_bigram_frac"), 6).alias("avg_top_bigram_frac"),
    )


@query(
    "pii_redaction_by_source",
    oracle=r"""
    WITH planted AS (
        SELECT source,
               text ||
               CASE WHEN doc_id % 10 = 0
                    THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com'
                    ELSE '' END ||
               CASE WHEN doc_id % 15 = 0
                    THEN ' call 555-123-4567' ELSE '' END AS text
        FROM documents
    ), r AS (
        SELECT source, text,
               len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
               len(regexp_extract_all(text,
                   '\b\d{3}-\d{3}-\d{4}\b')) AS n_phones,
               regexp_replace(
                   regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '[EMAIL]', 'g'),
                   '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g') AS red
        FROM planted
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_emails) AS BIGINT) AS n_emails,
           CAST(SUM(n_phones) AS BIGINT) AS n_phones,
           CAST(SUM(len(text) - len(red)) AS BIGINT) AS chars_removed
    FROM r GROUP BY source
    """,
)
def pii_redaction_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect-and-redact rolled up per source: match counts and the
    redaction's character delta (witnesses the replacement actually ran,
    not just the counters). The fixture corpus carries no natural PII, so
    deterministic emails/phones are planted on every 10th/15th doc — the
    operator must find exactly those. Patterns are RE2-compatible so Spark
    (Java regex) and DuckDB (RE2) match identically; DuckDB needs the 'g'
    flag to mirror Spark's replace-all default."""
    from tabular_cdc_bootstrapper_spark.functions.text import with_pii_redaction

    d = _t(spark, sf_dir, "documents")
    planted = d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(
                    F.lit(" contact u"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 15 == 0, F.lit(" call 555-123-4567")).otherwise(
                F.lit("")
            ),
        ),
    )
    r = with_pii_redaction(planted)
    return r.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_emails").alias("n_emails"),
        F.sum("n_phones").alias("n_phones"),
        F.sum(F.length("text") - F.length("text_redacted")).alias("chars_removed"),
    )


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


def _ivf_oracle() -> str:
    """Replicates ivf_topk(k=10, n_centroids=64, n_probes=4) exactly:
    centroids are the 64 lowest-id vectors (deterministic in both engines),
    assignment is argmax cosine with cid tie-break, probes are the 4 nearest
    lists per query — a deterministic pipeline, hence oracle-checkable."""
    cos_ec = _sql_cos("e.embedding", "c.cv")
    return f"""
    WITH cents AS (
        SELECT vec_id AS cid, embedding AS cv
        FROM embeddings ORDER BY vec_id LIMIT 64
    ), cass AS (
        SELECT vec_id, embedding, cid AS list_id FROM (
            SELECT e.vec_id, e.embedding, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY {cos_ec} DESC, c.cid) AS rn
            FROM embeddings e CROSS JOIN cents c
        ) WHERE rn = 1
    ), qass AS (
        SELECT qid, qv, cid AS list_id FROM (
            SELECT e.vec_id AS qid, e.embedding AS qv, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY {cos_ec} DESC, c.cid) AS rn
            FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 5
        ) WHERE rn <= 4
    ), scored AS (
        SELECT q.qid, a.vec_id, {_sql_cos("q.qv", "a.embedding")} AS sim
        FROM qass q JOIN cass a USING (list_id) WHERE a.vec_id <> q.qid
    ), ranked AS (
        SELECT qid, vec_id, sim,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
        FROM scored
    )
    SELECT qid, vec_id, ROUND(sim, 6) AS cos_sim, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= 10
    """


def _ivf_pq_oracle(candidate_filter: str = "") -> str:
    """Replicates ivf_pq_topk(k=10, n_centroids=64, n_probes=4,
    n_subspaces=8, n_codes=16, shortlist=50): the IVF assignment CTEs
    (raw-cosine argmax, cid tie-break — same as _ivf_oracle) compose with
    the PQ train/encode/ADC CTEs (same as pq_adc_topk's oracle, incl. the
    s-ORDERED list_sum for float-order parity), candidates restricted to
    the query's 4 probed lists, exact-cosine rerank of the top-50.

    ``candidate_filter``: extra SQL ANDed into the candidate side (the
    `terms` CTE) — the purged-index entry uses it to exclude deleted
    vec_ids while the training CTEs stay on the full corpus, exactly
    matching a standing-models deletion."""
    cos_ec = _sql_cos("e.embedding", "c.cv")
    return f"""
    WITH cents AS (
        SELECT vec_id AS cid, embedding AS cv
        FROM embeddings ORDER BY vec_id LIMIT 64
    ), cass AS (
        SELECT vec_id, cid AS list_id FROM (
            SELECT e.vec_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY {cos_ec} DESC, c.cid) AS rn
            FROM embeddings e CROSS JOIN cents c
        ) WHERE rn = 1
    ), qass AS (
        SELECT qid, cid AS list_id FROM (
            SELECT e.vec_id AS qid, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY {cos_ec} DESC, c.cid) AS rn
            FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 5
        ) WHERE rn <= 4
    ), nrm0 AS (
        SELECT vec_id, embedding,
               sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    ), norm AS (
        SELECT vec_id,
               list_transform(embedding, x -> CASE WHEN nrm > 0
                   THEN CAST(x AS DOUBLE) / nrm ELSE 0.0 END) AS v
        FROM nrm0
    ), cb AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, v
        FROM norm ORDER BY vec_id LIMIT 16
    ), subs AS (
        SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS s
    ), dists AS (
        SELECT n.vec_id, subs.s, cb.code,
               list_sum(list_transform(
                   list_zip(n.v[subs.s*8+1 : subs.s*8+8],
                            cb.v[subs.s*8+1 : subs.s*8+8]),
                   p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
        FROM norm n CROSS JOIN subs CROSS JOIN cb
    ), enc AS (
        SELECT vec_id, s, code FROM (
            SELECT vec_id, s, code,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                      ORDER BY d, code) AS rn
            FROM dists) WHERE rn = 1
    ), terms AS (
        SELECT q.qid, a.vec_id, e.s,
               list_sum(list_transform(
                   list_zip(qn.v[e.s*8+1 : e.s*8+8], cb.v[e.s*8+1 : e.s*8+8]),
                   p -> p[1] * p[2])) AS t
        FROM qass q
        JOIN cass a USING (list_id)
        JOIN enc e ON e.vec_id = a.vec_id
        JOIN cb ON cb.code = e.code
        JOIN norm qn ON qn.vec_id = q.qid
        WHERE a.vec_id <> q.qid {candidate_filter}
    ), adc AS (
        SELECT qid, vec_id, list_sum(list(t ORDER BY s)) AS adc
        FROM terms GROUP BY qid, vec_id
    ), short AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY adc DESC, vec_id) AS srn
            FROM adc) WHERE srn <= 50
    ), rerank AS (
        SELECT s.qid, s.vec_id,
               list_sum(list_transform(list_zip(q.v, c2.v),
                   p -> p[1] * p[2])) AS sim
        FROM short s
        JOIN norm q ON q.vec_id = s.qid
        JOIN norm c2 ON c2.vec_id = s.vec_id
    )
    SELECT qid, vec_id, ROUND(sim, 6) AS cos_sim, CAST(rn AS INT) AS rn
    FROM (SELECT qid, vec_id, sim,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY sim DESC, vec_id) AS rn
          FROM rerank)
    WHERE rn <= 10
    """


@query("ivf_pq_topk", oracle=_ivf_pq_oracle())
def ivf_pq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN — the warehouse index shape: IVF list pruning
    (lowest-id centroids, 4 probes) over PQ-ADC scoring (8×16 codebook,
    8-byte codes), exact-cosine rerank of the top-50. A query scans only
    its probed lists' codes; the float column is read only for rerank
    candidates. Both models are deterministic lowest-id trains so the
    full pipeline is oracle-replayable; see
    functions/similarity.py:ivf_pq_topk for the partition-pruned 100 TB
    shape."""
    from tabular_cdc_bootstrapper_spark.functions.similarity import ivf_pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return ivf_pq_topk(emb, q, k=10)


#: bump when the index row format or encode semantics change — makes a
#: cached index from older code self-invalidate via the fingerprint
_ANN_INDEX_FORMAT_VERSION = 1


@query("ann_prebuilt_ivfpq_topk", oracle=_ivf_pq_oracle())
def ann_prebuilt_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ over a PERSISTED index (VERDICT r7 #3 — build once, query
    many): first invocation trains + encodes the corpus into durable
    index tables (functions/ann_index.py: codes segments + model table,
    atomic manifests); subsequent invocations detect the fresh index by
    corpus fingerprint and run ONLY the query path — probe → ADC over
    stored 8-byte codes → exact rerank over the stored covering column,
    with no corpus scan and no retrain (plan-pinned by
    tests/test_ann_index.py). Results are bit-identical to the inline
    ``ivf_pq_topk`` (same lowest-id models, same encoder — identity
    test pinned), so this entry shares its DuckDB oracle verbatim: the
    driver hash-checks that the amortized path answers exactly what the
    stateless pipeline answers. The bench median over repeat runs
    therefore measures the amortized QUERY cost — the number a warehouse
    user sees — while the one-time build cost is recorded separately in
    SCALING.md."""
    from tabular_cdc_bootstrapper_spark.functions.ann_index import ann_query

    emb = _t(spark, sf_dir, "embeddings")
    index = _prebuilt_ann_index(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return ann_query(spark, index, q, k=10, broadcast_queries=True)


def _prebuilt_ann_index(spark: SparkSession, sf_dir: str):
    """Resolve (or build) the cached IVF-PQ index over the embeddings
    corpus — shared by the prebuilt / batch-shuffle registry entries so
    repeat invocations measure the amortized query path."""
    import os
    import tempfile

    from tabular_cdc_bootstrapper_spark.functions.ann_index import (
        AnnIndex,
        build_ann_index,
    )

    emb_path = f"{sf_dir}/embeddings.parquet"
    st = os.stat(emb_path)
    fingerprint = (
        f"v{_ANN_INDEX_FORMAT_VERSION}:{emb_path}:{st.st_mtime_ns}:{st.st_size}"
    )
    root = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_ann_index",
        sf_dir.strip("/").replace("/", "_"),
    )
    index = AnnIndex(root)
    if not (index.exists() and index.meta().get("fingerprint") == fingerprint):
        index = build_ann_index(
            spark, _t(spark, sf_dir, "embeddings"), root,
            n_centroids=64, n_subspaces=8, n_codes=16, dim=64,
            fingerprint=fingerprint,
        )
    return index


@query("ann_batch_shuffle_topk", oracle=_ivf_pq_oracle())
def ann_batch_shuffle_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch-inference ANN query path (VERDICT r8 task 8 —
    ann_query(broadcast_queries=False)): both query-side joins run as
    shuffle_hash-hinted shuffle joins on list_id/qid, the shape that
    survives millions of queries where the exploded query frame cannot
    broadcast. Results are identical to the broadcast path by
    construction, so this entry shares the inline IVF-PQ DuckDB oracle
    verbatim — the driver hash-checks the shuffle plan end to end. The
    ≥2-ShuffledHashJoin plan pin lives in tests/test_ann_index.py;
    SCALING.md carries the 5/500/2000-query probe (shuffle ≤ broadcast
    even where broadcast still fits)."""
    from tabular_cdc_bootstrapper_spark.functions.ann_index import ann_query

    emb = _t(spark, sf_dir, "embeddings")
    index = _prebuilt_ann_index(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return ann_query(spark, index, q, k=10, broadcast_queries=False)


@query("ann_index_purged_topk", oracle=_ivf_pq_oracle("AND a.vec_id % 31 <> 0"))
def ann_index_purged_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR purge on the retrieval side (`functions/ann_index.py
    delete_from_index` — the companion of cdc_purge_history): copy the
    prebuilt IVF-PQ index, hard-delete vec_id%31 from its codes table
    (touched segments rewritten by broadcast anti-join, untouched segment
    dirs shared into the new manifest, one atomic swap), then answer the
    standard top-k query against the purged index. The standing models
    are untouched — centroids/codebooks are aggregates that reproduce no
    individual vector — so the oracle is the inline IVF-PQ replay with
    ONLY the candidate side filtered: deleted vectors can never be
    scored, every surviving result is bit-identical to the unpurged
    ranking minus the deleted candidates."""
    import shutil as _shutil
    import tempfile

    from tabular_cdc_bootstrapper_spark.functions.ann_index import (
        AnnIndex,
        ann_query,
        delete_from_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    src = _prebuilt_ann_index(spark, sf_dir)
    dst_root = tempfile.mkdtemp(prefix="spark_graft_annpurge_")
    _shutil.rmtree(dst_root)
    _shutil.copytree(src.root, dst_root)
    index = AnnIndex(dst_root)
    purge = emb.filter(F.col("vec_id") % 31 == 0).select("vec_id")
    delete_from_index(spark, index, purge)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return ann_query(spark, index, q, k=10, broadcast_queries=True)


@query("ann_index_maintained_topk", oracle=_ivf_pq_oracle())
def ann_index_maintained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance, oracle-exact (VERDICT r7 #4): build
    the IVF-PQ index on the first ~70% of the corpus (which contains the
    lowest-id training sample, so the standing models equal a full
    build's), APPEND the remaining vectors against those standing models
    (one delta-sized segment, no corpus re-encode — the foreachBatch
    maintenance path), then query. Because append-encoding uses the same
    standing models a full build would train, the maintained index
    answers bit-identically to the rebuilt one — the same fold law that
    makes incremental_cluster_maintenance oracle-exact — so this entry
    reuses the inline IVF-PQ DuckDB oracle verbatim and the driver
    hash-checks the incremental path end to end. Like that entry, this
    is a worst-case harness (it performs build + append + query every
    invocation to stay stateless for the oracle); the production cost
    model is append ∝ delta (SCALING.md row). The drift-trigger /
    retrain arm is pinned by tests/test_ann_index.py."""
    import tempfile

    from tabular_cdc_bootstrapper_spark.functions.ann_index import (
        ann_query,
        append_to_index,
        build_ann_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    # the 70% split point needs only the corpus ROW COUNT — parquet
    # footer metadata, not a count() scan action (r16, guide §6)
    from tabular_cdc_bootstrapper_spark.queries._registry import _parquet_rows

    n = _parquet_rows(sf_dir, "embeddings")
    cut = max(100, int(n * 0.7))
    root = tempfile.mkdtemp(prefix="spark_graft_ann_maint_")
    index = build_ann_index(
        spark, emb.filter(F.col("vec_id") < cut), root,
        n_centroids=64, n_subspaces=8, n_codes=16, dim=64,
    )
    append_to_index(spark, index, emb.filter(F.col("vec_id") >= cut))
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return ann_query(spark, index, q, k=10, broadcast_queries=True)


def _passage_ann_oracle() -> str:
    """Replays the FULL passage pipeline: chunking (document_chunks
    oracle CTEs) → md5-derived 16-dim chunk embeddings (hex-pair strpos
    arithmetic ≡ Spark's substr+conv — integer-exact) → IVF-PQ over the
    chunk corpus (32 lowest-id centroids, 4×16 codebooks on 4-dim
    subspaces, 4 probes, 50-shortlist ADC, exact-cosine rerank — the
    same CTE pipeline as _ivf_pq_oracle at dim 16) → doc-level dedup
    (best chunk per (query, doc), docs ranked by that score)."""
    cos_ec = _sql_cos("e.embedding", "c.cv")
    return r"""
    WITH d AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents WHERE length(trim(text)) > 0
    ), st AS (
        SELECT doc_id, toks, gs.start
        FROM d, LATERAL (
            SELECT unnest(range(
                0, greatest(CAST(len(toks) AS BIGINT) - 16, 1), 48
            )) AS start
        ) gs
    ), ch AS (
        SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx,
               md5(array_to_string(toks[start+1 : start+64], ' ')) AS chunk_md5
        FROM st
    ), chunks AS (
        SELECT doc_id*100000 + chunk_idx AS vec_id,
               list_transform(range(0, 16), j -> CAST(
                   (strpos('0123456789abcdef',
                           substr(chunk_md5, CAST(j*2+1 AS INT), 1)) - 1) * 16
                 + (strpos('0123456789abcdef',
                           substr(chunk_md5, CAST(j*2+2 AS INT), 1)) - 1)
                   AS DOUBLE)) AS embedding
        FROM ch
    ), cents AS (
        SELECT vec_id AS cid, embedding AS cv
        FROM chunks ORDER BY vec_id LIMIT 32
    ), cass AS (
        SELECT vec_id, cid AS list_id FROM (
            SELECT e.vec_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY {cos_ec} DESC, c.cid) AS rn
            FROM chunks e CROSS JOIN cents c
        ) WHERE rn = 1
    ), qids AS (
        SELECT vec_id FROM chunks ORDER BY vec_id LIMIT 3
    ), qass AS (
        SELECT qid, cid AS list_id FROM (
            SELECT e.vec_id AS qid, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY {cos_ec} DESC, c.cid) AS rn
            FROM chunks e CROSS JOIN cents c
            WHERE e.vec_id IN (SELECT vec_id FROM qids)
        ) WHERE rn <= 4
    ), nrm0 AS (
        SELECT vec_id, embedding,
               sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM chunks
    ), norm AS (
        SELECT vec_id,
               list_transform(embedding, x -> CASE WHEN nrm > 0
                   THEN CAST(x AS DOUBLE) / nrm ELSE 0.0 END) AS v
        FROM nrm0
    ), cb AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, v
        FROM norm ORDER BY vec_id LIMIT 16
    ), subs AS (
        SELECT CAST(unnest(range(0, 4)) AS BIGINT) AS s
    ), dists AS (
        SELECT n.vec_id, subs.s, cb.code,
               list_sum(list_transform(
                   list_zip(n.v[subs.s*4+1 : subs.s*4+4],
                            cb.v[subs.s*4+1 : subs.s*4+4]),
                   p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
        FROM norm n CROSS JOIN subs CROSS JOIN cb
    ), enc AS (
        SELECT vec_id, s, code FROM (
            SELECT vec_id, s, code,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                      ORDER BY d, code) AS rn
            FROM dists) WHERE rn = 1
    ), terms AS (
        SELECT q.qid, a.vec_id, e.s,
               list_sum(list_transform(
                   list_zip(qn.v[e.s*4+1 : e.s*4+4], cb.v[e.s*4+1 : e.s*4+4]),
                   p -> p[1] * p[2])) AS t
        FROM qass q
        JOIN cass a USING (list_id)
        JOIN enc e ON e.vec_id = a.vec_id
        JOIN cb ON cb.code = e.code
        JOIN norm qn ON qn.vec_id = q.qid
        WHERE a.vec_id <> q.qid
    ), adc AS (
        SELECT qid, vec_id, list_sum(list(t ORDER BY s)) AS adc
        FROM terms GROUP BY qid, vec_id
    ), short AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY adc DESC, vec_id) AS srn
            FROM adc) WHERE srn <= 50
    ), hit AS (
        SELECT s.qid, s.vec_id,
               CAST(s.vec_id // 100000 AS BIGINT) AS doc_id,
               CAST(s.vec_id % 100000 AS BIGINT) AS chunk_idx,
               ROUND(list_sum(list_transform(list_zip(q.v, c2.v),
                   p -> p[1] * p[2])), 6) AS cos_sim
        FROM short s
        JOIN norm q ON q.vec_id = s.qid
        JOIN norm c2 ON c2.vec_id = s.vec_id
    ), best AS (
        SELECT qid, doc_id, chunk_idx, cos_sim FROM (
            SELECT qid, doc_id, chunk_idx, cos_sim,
                   ROW_NUMBER() OVER (PARTITION BY qid, doc_id
                       ORDER BY cos_sim DESC, vec_id) AS cr
            FROM hit) WHERE cr = 1
    )
    SELECT qid, doc_id, chunk_idx, cos_sim, CAST(rn AS INT) AS rn
    FROM (SELECT qid, doc_id, chunk_idx, cos_sim,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY cos_sim DESC, doc_id) AS rn
          FROM best)
    WHERE rn <= 5
    """.replace("{cos_ec}", cos_ec)


@query("passage_ann_topk", oracle=_passage_ann_oracle())
def passage_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end passage retrieval (VERDICT r8 task 3 — the RAG ingest
    composition): chunk_documents → deterministic md5-derived chunk
    embeddings → build_ann_index over CHUNKS (cached by document-corpus
    fingerprint, so the bench median measures the amortized query path)
    → ann_query (corpus-free plan, pinned in tests/test_passages.py) →
    doc-level dedup of chunk hits (functions/passages.py). The 3
    lowest-id chunks query the index; output is the top-5 DOCUMENTS per
    query, each represented by its best-scoring chunk. Every stage was
    proven alone in r8; this entry hash-checks the composition seams —
    the chunk→vec_id pairing, the chunk-level index, and the doc-dedup
    of hits — against a single DuckDB replay of the whole pipeline."""
    import os
    import tempfile

    from tabular_cdc_bootstrapper_spark.functions.ann_index import (
        AnnIndex,
        ann_query,
        build_ann_index,
    )
    from tabular_cdc_bootstrapper_spark.functions.passages import (
        chunk_vectors,
        dedup_hits_by_doc,
    )

    doc_path = f"{sf_dir}/documents.parquet"
    stt = os.stat(doc_path)
    fingerprint = (
        f"v{_ANN_INDEX_FORMAT_VERSION}:passage:{doc_path}:"
        f"{stt.st_mtime_ns}:{stt.st_size}"
    )
    root = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_passage_index",
        sf_dir.strip("/").replace("/", "_"),
    )
    cv = chunk_vectors(_t(spark, sf_dir, "documents"))
    index = AnnIndex(root)
    if not (index.exists() and index.meta().get("fingerprint") == fingerprint):
        index = build_ann_index(
            spark, cv, root,
            n_centroids=32, n_subspaces=4, n_codes=16, dim=16,
            fingerprint=fingerprint,
        )
    q = cv.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    hits = ann_query(
        spark, index, q, k=50, shortlist=50, broadcast_queries=True
    )
    return dedup_hits_by_doc(hits, k=5)


@query("ann_ivf_topk", oracle=_ivf_oracle())
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate ANN (inverted lists by nearest fixed-count
    centroid sample, multi-probe) — the partition-pruned scale path; the
    full assign→probe→rank pipeline is replicated by the oracle."""
    from tabular_cdc_bootstrapper_spark.functions.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return ivf_topk(emb, q, k=10)


def _kmeans_oracle(
    k: int = 8,
    iters: int = 2,
    final_select: str | None = None,
    corpus: str = "embeddings",
) -> str:
    """Unrolled Lloyd iterations in DuckDB SQL — possible because the Spark
    side quantizes to int64 (functions/clustering.py), so every distance,
    tie-break, and trunc-div centroid mean is exact integer arithmetic
    that both engines reproduce bit-identically. ``final_select`` is a SQL
    fragment over the final assignment CTE (referenced as ``{a}``) so
    derived queries (cluster_balanced_sample) share the iteration without
    string surgery; it may also reference ``{c}`` — the FINAL centroid CTE
    (quantized int64 coords) — for consumers of the model itself
    (ann_ivf_kmeans_topk trains its inverted lists from it)."""
    assign = """
    d{n} AS (
        SELECT q.id, q.qv, c.cid,
               list_sum(list_transform(list_zip(q.qv, c.qv),
                        p -> (p[1]-p[2])*(p[1]-p[2]))) AS dist
        FROM q CROSS JOIN {cents} c
    ),
    a{n} AS (
        SELECT id, qv, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist, cid) AS rn
            FROM d{n}
        ) WHERE rn = 1
    )"""
    update = """
    s{n} AS (
        SELECT cid, i, SUM(v) AS s, COUNT(*) AS n
        FROM (SELECT cid, unnest(qv) AS v,
                     unnest(range(1, len(qv) + 1)) AS i
              FROM a{n})
        GROUP BY cid, i
    ),
    m{n} AS (
        SELECT cid,
               list(CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END
                    ORDER BY i) AS qv
        FROM s{n} GROUP BY cid
    ),
    c{n} AS (  -- empty clusters keep the previous centroid
        SELECT p.cid, COALESCE(m{n}.qv, p.qv) AS qv
        FROM {prev} p LEFT JOIN m{n} ON p.cid = m{n}.cid
    )"""
    parts = [
        f"""
    q AS (
        SELECT vec_id AS id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
        FROM {corpus}
    ),
    c0 AS (
        SELECT row_number() OVER (ORDER BY id) - 1 AS cid, qv
        FROM (SELECT id, qv FROM q ORDER BY id LIMIT {k})
    )"""
    ]
    cents = "c0"
    for it in range(1, iters + 1):
        parts.append(assign.format(n=it, cents=cents))
        parts.append(update.format(n=it, prev=cents))
        cents = f"c{it}"
    final = iters + 1
    parts.append(assign.format(n=final, cents=cents))
    if final_select is None:
        final_select = """
    SELECT CAST(cid AS BIGINT) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(id) AS BIGINT) AS id_checksum
    FROM {a} GROUP BY cid
    """
    return "WITH " + ",".join(parts) + final_select.format(a=f"a{final}", c=cents)


@query(
    "cluster_balanced_sample",
    oracle=_kmeans_oracle(
        final_select="""
    , ranked AS (
        SELECT cid, id,
               row_number() OVER (
                   PARTITION BY cid
                   ORDER BY ((id % 1000000007) * 2654435761) % 1000000007, id
               ) AS rk
        FROM {a}
    )
    SELECT CAST(cid AS BIGINT) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(id) AS BIGINT) AS sample_checksum
    FROM ranked WHERE rk <= 5 GROUP BY cid
    """
    ),
)
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity sampling for training-data curation: k-means the corpus,
    then take a fixed per-cluster quota so the sample covers embedding
    space instead of mirroring its density. Quota selection orders by a
    deterministic multiplicative-hash permutation of the id (exact int64
    arithmetic, no rand(), no engine-specific hash — same reproducibility
    rule as hash_split/uniform_per_group_sample). rank<=quota compiles to
    WindowGroupLimit: each cluster's partition keeps only quota rows
    through the shuffle, so the sample never materializes a full sort."""
    from tabular_cdc_bootstrapper_spark.functions.clustering import (
        kmeans_fit_predict,
    )

    emb = _t(spark, sf_dir, "embeddings")
    assigned = kmeans_fit_predict(emb, k=8, iters=2)
    # reduce BEFORE multiplying: id·P overflows int64 for id ≳ 3.5e9
    # (Spark wraps silently, DuckDB errors); (id mod M)·P < 2^62 in both
    w = Window.partitionBy("cid").orderBy(
        ((F.col("id") % F.lit(1000000007)) * F.lit(2654435761))
        % F.lit(1000000007),
        "id",
    )
    return (
        assigned.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .groupBy("cid")
        .agg(F.count("*").alias("n_sampled"), F.sum("id").alias("sample_checksum"))
        .select(
            F.col("cid").cast("bigint").alias("cluster_id"),
            F.col("n_sampled").cast("bigint"),
            F.col("sample_checksum").cast("bigint"),
        )
    )


@query("kmeans_embedding_clusters", oracle=_kmeans_oracle())
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means over the embedding corpus (semantic
    clustering for diversity sampling / IVF list training): broadcast the
    k×dim centroid model each round, assignment is one Arrow-batch matmul
    with NO corpus shuffle, centroid update shuffles only map-side partial
    (cluster, dim) sums. Integer quantization makes the whole iteration
    deterministic enough for a DuckDB oracle to replay move-for-move —
    functions/clustering.py for the scheme."""
    from tabular_cdc_bootstrapper_spark.functions.clustering import (
        kmeans_fit_predict,
    )

    emb = _t(spark, sf_dir, "embeddings")
    assigned = kmeans_fit_predict(emb, k=8, iters=2)
    return assigned.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.sum("id").alias("id_checksum"),
    ).select(
        F.col("cid").cast("bigint").alias("cluster_id"),
        F.col("n_members").cast("bigint"),
        F.col("id_checksum").cast("bigint"),
    )


def _semdedup_oracle(tau_num: int = 19, tau_den: int = 20) -> str:
    """Replays semantic_dedup(k=8, iters=2, tau=19/20) move-for-move: the
    kmeans oracle's final assignment CTE ``{a}`` carries the quantized
    int64 vectors, so the within-cluster threshold test — dot > 0 ∧
    den²·dot² ≥ num²·‖a‖²·‖b‖² — runs in HUGEINT on DuckDB's side and
    decimal(38,0) on Spark's, both exact, so the drop decision is
    bit-identical (functions/dedup.py:semantic_dedup for the bounds).

    The fixture corpus has no natural pair above cos 0.52 (measured), so
    both engines run over the corpus plus ten PLANTED exact twins
    (vec_id < 10 re-issued at id+1_000_000 — the same deterministic
    transformation on both sides): the drop path is then exercised for
    real — each twin must be dropped with its lowest-id original kept —
    instead of the summary being trivially all-zero n_dropped."""
    n2, d2 = tau_num * tau_num, tau_den * tau_den
    return _kmeans_oracle(
        corpus="""(SELECT vec_id, embedding FROM embeddings
                   UNION ALL
                   SELECT vec_id + 1000000, embedding
                   FROM embeddings WHERE vec_id < 10)""",
        final_select=f"""
    , pts AS (
        SELECT id, cid, qv,
               list_sum(list_transform(qv, x -> CAST(x AS HUGEINT) * x)) AS nrm
        FROM {{a}}
    ),
    pr AS (
        SELECT a.id, a.nrm AS na, b.nrm AS nb,
               list_sum(list_transform(list_zip(a.qv, b.qv),
                        p -> CAST(p[1] AS HUGEINT) * p[2])) AS dot
        FROM pts a JOIN pts b ON a.cid = b.cid AND b.id < a.id
    ),
    dup AS (
        SELECT DISTINCT id FROM pr
        WHERE dot > 0 AND {d2} * dot * dot >= {n2} * na * nb
    )
    SELECT CAST(p.cid AS BIGINT) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(d.id) AS BIGINT) AS n_dropped,
           CAST(COALESCE(SUM(CASE WHEN d.id IS NULL THEN p.id END), 0)
                AS BIGINT) AS kept_checksum
    FROM pts p LEFT JOIN dup d ON p.id = d.id
    GROUP BY p.cid
    """
    )


@query("semantic_dedup_summary", oracle=_semdedup_oracle())
def semantic_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embedding corpus (arXiv:2303.09540): k-means is
    the blocking structure — the pair scan joins on cluster id, quadratic
    only within a cluster, never corpus×corpus — and the keep-lowest-id
    drop rule runs in exact integer arithmetic so the oracle replays it
    bit-for-bit. Per-cluster retention summary: members, dropped count,
    checksum of the surviving ids. Ten exact twins are planted (ids < 10
    re-issued at id+1e6, mirrored in the oracle) so the drop path is
    hash-verified — the fixture corpus alone has no pair above cos 0.52."""
    from tabular_cdc_bootstrapper_spark.functions.dedup import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"), "embedding"
    )
    marked = semantic_dedup(emb.unionAll(planted), k=8, iters=2)
    return (
        marked.groupBy("cid")
        .agg(
            F.count("*").alias("nm"),
            F.sum(F.col("is_dup").cast("long")).alias("nd"),
            F.coalesce(
                F.sum(F.when(~F.col("is_dup"), F.col("id"))), F.lit(0)
            ).alias("kc"),
        )
        .select(
            F.col("cid").cast("bigint").alias("cluster_id"),
            F.col("nm").cast("bigint").alias("n_members"),
            F.col("nd").cast("bigint").alias("n_dropped"),
            F.col("kc").cast("bigint").alias("kept_checksum"),
        )
    )


def _ivf_kmeans_oracle() -> str:
    """Replicates ivf_topk(centroid_strategy="kmeans", k=10, n_centroids=8,
    n_probes=2): the inverted lists are trained by the SAME int64-quantized
    Lloyd iteration the kmeans oracle replays (final centroid CTE ``{c}``),
    dequantized exactly (int / 2²⁰ is a dyadic rational — bit-identical in
    both engines), then the standard IVF assign→probe→rank pipeline runs
    by cosine against those centroids."""
    cos_ec = _sql_cos("e.embedding", "c.cv")
    return _kmeans_oracle(
        k=8,
        iters=2,
        final_select=f"""
    , fcents AS (
        SELECT cid, list_transform(qv, x -> CAST(x AS DOUBLE) / 1048576.0) AS cv
        FROM {{c}}
    ), cass AS (
        SELECT vec_id, embedding, cid AS list_id FROM (
            SELECT e.vec_id, e.embedding, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY {cos_ec} DESC, c.cid) AS rn
            FROM embeddings e CROSS JOIN fcents c
        ) WHERE rn = 1
    ), qass AS (
        SELECT qid, qv, cid AS list_id FROM (
            SELECT e.vec_id AS qid, e.embedding AS qv, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY {cos_ec} DESC, c.cid) AS rn
            FROM embeddings e CROSS JOIN fcents c WHERE e.vec_id < 5
        ) WHERE rn <= 2
    ), scored AS (
        SELECT q.qid, a.vec_id, {_sql_cos("q.qv", "a.embedding")} AS sim
        FROM qass q JOIN cass a USING (list_id) WHERE a.vec_id <> q.qid
    ), ranked AS (
        SELECT qid, vec_id, sim,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
        FROM scored
    )
    SELECT qid, vec_id, ROUND(sim, 6) AS cos_sim, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= 10
    """,
    )


@query("ann_ivf_kmeans_topk", oracle=_ivf_kmeans_oracle())
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with k-means-TRAINED inverted lists (VERDICT r5 #2): same
    assign→probe→rank pipeline as ann_ivf_topk, but the centroids come
    from functions/clustering.py's deterministic quantized Lloyd fit, so
    lists follow the corpus's actual density instead of its id order —
    higher recall at equal n_probes on clustered data (pinned by
    tests/test_clustering.py::test_kmeans_lists_beat_sample_lists_recall).
    Model build cost: kmeans_iters extra aggregate jobs, shuffle volume
    k·dim·n_partitions — constant in corpus size."""
    from tabular_cdc_bootstrapper_spark.functions.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return ivf_topk(
        emb, q, k=10, n_centroids=8, n_probes=2,
        centroid_strategy="kmeans", kmeans_iters=2,
    )
