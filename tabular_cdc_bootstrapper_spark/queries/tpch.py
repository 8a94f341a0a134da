"""TPC-H shape sweep registry entries.

Split from the single-file registry (VERDICT r9 item 3); every entry
registers via the shared ``@query`` decorator in ``_registry``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from tabular_cdc_bootstrapper_spark.queries._registry import (_t, query)


# ---------------------------------------------------------------------------
# TPC-H shape sweep (SURVEY.md §2.3-2.8 EXT). The fixture schema lacks
# partsupp / l_shipmode / c_phone, so each query keeps the *plan shape* of
# its TPC-H namesake (join graph, subquery pattern, aggregation structure)
# over the columns that exist. Revenue := l_extendedprice * (1 - l_discount).
# ---------------------------------------------------------------------------

_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_price
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ), ranked AS (
        SELECT l_partkey, l_suppkey, unit_price,
               ROW_NUMBER() OVER (PARTITION BY l_partkey
                                  ORDER BY unit_price, l_suppkey) AS rn
        FROM cost
    )
    SELECT p.p_partkey, p.p_name, r.l_suppkey AS best_suppkey,
           ROUND(r.unit_price, 4) AS best_unit_price
    FROM ranked r JOIN part p ON p.p_partkey = r.l_partkey
    WHERE r.rn = 1 AND p.p_size <= 10
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part (correlated MIN →
    decorrelated argmin; suppkey tie-break for determinism).

    Plan: ONE hash aggregation — min(struct(unit_price, suppkey)) per
    part is lexicographic argmin, which equals the oracle's two-phase
    min-per-supplier → rank-1 result (the winning supplier's per-supplier
    min IS the global min, ties broken by lower suppkey in both forms).
    The previous two-phase form paid a (partkey, suppkey) aggregation
    shuffle PLUS a partkey window shuffle; this pays one partkey shuffle
    with map-side partials, then broadcasts the filtered part dim."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cand = F.struct(
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        F.col("l_suppkey").alias("suppkey"),
    )
    best = (
        l.select("l_partkey", cand.alias("cand"))
        .groupBy("l_partkey")
        .agg(F.min("cand").alias("m"))
    )
    return (
        best.join(
            F.broadcast(p.filter(F.col("p_size") <= 10)),
            best.l_partkey == p.p_partkey,
        )
        .select(
            "p_partkey",
            "p_name",
            F.col("m.suppkey").alias("best_suppkey"),
            F.round("m.unit_price", 4).alias("best_unit_price"),
        )
    )


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l.l_shipdate) AS l_year,
               l.{_REV} AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year
    (5-way join, disjunctive nation pair predicate, broadcast dims).

    The canonical Q7 plan shape: Catalyst cannot derive the single-side
    ``n_name IN (pair)`` implications from the cross-column disjunction,
    so applying the pair predicate only AFTER the 5-way join would pull
    supplier/customer rows from ALL nations through both fact joins. We
    pre-filter each nation dim to the two named nations (2-row
    broadcasts), so supplier and customer shrink to ~2/N of their rows
    BEFORE touching lineitem/orders, and keep the disjunction only for
    the cross term (excluding the two intra-nation combinations)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    n1 = (
        n.filter(F.col("n_name").isin(pair))
        .select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        n.filter(F.col("n_name").isin(pair))
        .select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    )
    # resolve each fact side to its (pair-filtered) nation first: these
    # 2-row broadcast joins act as semi-filters, so only the two nations'
    # suppliers/customers ever reach the lineitem/orders joins
    s2 = s.join(F.broadcast(n1), F.col("s_nationkey") == F.col("sk")).select(
        "s_suppkey", "supp_nation"
    )
    c2 = c.join(F.broadcast(n2), F.col("c_nationkey") == F.col("ck")).select(
        "c_custkey", "cust_nation"
    )
    j = (
        # broadcast the reduced supplier side first: it prunes lineitem to
        # the pair's suppliers before the l⋈o shuffle, the only big one
        l.join(F.broadcast(s2), l.l_suppkey == F.col("s_suppkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c2, o.o_custkey == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.expr(_REV)), 2).alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
               l.{_REV} AS volume, n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market for a part
    type, by year (8-way join + conditional aggregation ratio)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select("n_nationkey", "n_regionkey")
    n2 = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("nation"))
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sk"))
    )
    vol = F.expr(_REV)
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year,
           ROUND(CAST(SUM(amount) AS DOUBLE), 2) AS sum_profit
    FROM (
        SELECT n.n_name AS nation, EXTRACT(year FROM o.o_orderdate) AS o_year,
               CAST(l.{_REV} - 0.6 * p.p_retailprice * l.l_quantity
                    AS DECIMAL(18, 4)) AS amount
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%a%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year. The fixture has
    no partsupp, so supply cost is proxied as 0.6 * retail price. The
    per-row amount is cast to DECIMAL before summing: double summation
    order differs between engines (and between Spark partitionings), so a
    double SUM is only ULP-deterministic — decimal is exact."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    n = _t(spark, sf_dir, "nation")
    amount = (
        F.expr(_REV) - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount).cast("double"), 2).alias("sum_profit"))
    )


@query(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, ROUND(SUM(l.{_REV}), 2) AS revenue,
           ROUND(c.c_acctbal, 2) AS acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY SUM(l.{_REV}) DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by lost revenue from returned
    items in a half-year window (top-k over a 4-way join)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(F.expr(_REV)).alias("__rev"))
        .orderBy(F.col("__rev").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round("__rev", 2).alias("revenue"),
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
    )


@query(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: urgent/non-urgent order counts per line status
    (CASE aggregation over a join; linestatus stands in for shipmode)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                           AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer,
    including zero-order customers.

    Pre-aggregated form: orders reduce to (custkey, count) BEFORE meeting
    customer, so the join moves #customers rows instead of #orders rows
    and the left join + coalesce(0) reinstates zero-order customers — the
    same fold-the-fact-first rewrite as q18. AQE broadcasts the reduced
    side at bench scale; at 100 TB it's a custkey-keyed shuffle join of
    two customer-sized frames (never orders-sized)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cnt = (
        o.filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("c_count"))
    )
    per_cust = c.select("c_custkey").join(
        cnt, c.c_custkey == cnt.o_custkey, "left"
    ).select(F.coalesce("c_count", F.lit(0).cast("long")).alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.{_REV} ELSE 0 END)
                 / SUM(l.{_REV}), 4) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of a month's revenue from promo parts."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = _t(spark, sf_dir, "part")
    rev = F.expr(_REV)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM({_REV}), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue
    (aggregate CTE reused in a scalar MAX subquery; revenue rounded before
    the equality so both engines compare identical values)."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.expr(_REV)), 2).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_revenue == max_rev.m)
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_brand_supplier_count",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_brand_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) with an
    exclusion predicate; lineitem stands in for partsupp as the link."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q18_large_volume_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           ROUND(o.o_totalprice, 2) AS total_price,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice
    HAVING SUM(l.l_quantity) > 250
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders (HAVING on a summed measure,
    top-k by price). l_quantity is integral so the float sum is exact and
    the HAVING boundary is deterministic across engines.

    Plan: aggregate lineitem by order key BEFORE any join — the per-order
    sum doesn't depend on customer/order columns, and the HAVING
    predicate is extremely selective, so the join inputs collapse from
    |lineitem| to a handful of qualifying orders (which AQE then
    broadcasts). The naive join-first form shuffles the full
    lineitem⋈orders⋈customer row set into a 4-key aggregation — one extra
    fact-fact shuffle carrying wide customer columns. Measured 1.55 s →
    1.02 s at sf0.1, 3 exchanges → 1."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.round("__qty", 2).alias("sum_qty"),
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT ROUND(SUM(l.{_REV}), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    ranges — exercises OR-predicate pushdown through a join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(cond).agg(F.round(F.sum(F.expr(_REV)), 2).alias("revenue"))


@query(
    "q22_idle_balance",
    oracle="""
    SELECT c.c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c.c_nationkey
    """,
)
def q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers with no *recent* orders (scalar
    AVG subquery + anti join + aggregation), grouped by nation key."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1999-01-01")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                            (l_returnflag, l_linestatus), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (rollup/cube's general form) with GROUPING()
    markers disambiguating aggregate NULLs from data NULLs."""
    l = _t(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("__li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               COUNT(*) AS n
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus), ())
        """
    )


@query(
    "events_sliding_10min",
    oracle="""
    SELECT ws, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS sum_value
    FROM (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', value
        FROM events
    ) expanded
    GROUP BY ws
    """,
)
def events_sliding_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (10 min, slide 5): each event lands in
    two overlapping windows. Same operator Structured Streaming runs
    incrementally; the oracle expands the slide as two shifted buckets."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("ws"), "n_events", "sum_value")
    )
