"""Extended TPC-H-shape relational coverage (SURVEY.md §2.3 "ABSENT"
categories: correlated subqueries, EXISTS/NOT EXISTS, outer joins, scalar
subqueries, disjunctive predicate pushdown).

The reference has none of these (its full API is
/root/reference/src/Edgy.hs:12-46); they are north-star scope.  Queries are
the classic TPC-H patterns adapted to the driver's trimmed star schema
(TESTDATA.md — no partsupp table, no shipmode/commitdate columns), so every
pattern keeps its plan shape: Q4's semi-join, Q13's outer-join distribution,
Q17/Q22's correlated-aggregate predicates, Q21's exists/not-exists pair.

Determinism: every aggregate runs on exact decimals (functions/exact.py) and
correlated average predicates are rewritten multiplication-free-of-division
(``5*qty*cnt < sum`` instead of ``qty < 0.2*sum/cnt``) so Spark and DuckDB
compare bit-identical exact values.

Scale notes: dimension sides broadcast explicitly; each query's only wide
shuffle is its fact-fact join or final aggregation, and correlated
subqueries are expressed as one extra aggregate-then-join on the fact's own
key (partial aggregation map-side; AQE splits skewed keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from edgy_spark.catalog import register
from edgy_spark.functions.exact import dec, one, to_dbl
from edgy_spark.plans.prefix import ranked_prefix
from edgy_spark.sources import load


def _dec2(c):
    return dec(c, 2, 12)


def _rate(c):
    return dec(c, 4, 6)


def _ts(s: str):
    return F.lit(s).cast("timestamp")


_REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(1,0)) - CAST(l_discount AS DECIMAL(6,4)))"


def _rev():
    return _dec2("l_extendedprice") * (one() - _rate("l_discount"))


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS decorrelated to a semi-join
# ---------------------------------------------------------------------------

@register(
    "q4_priority_with_returns",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "semi", "aggregation"),
)
def q4_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join (commitdate is absent from
    this schema; returnflag='R' plays the late-delivery predicate).

    Scale: the orders date filter is parquet-pushed; the semi-join shuffles
    both sides on orderkey but the lineitem side is pre-filtered and
    projected to ONE column before the exchange.
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01")) & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q7 shape: bidirectional nation-pair volume
# ---------------------------------------------------------------------------

@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(ROUND(SUM(vol), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             {_REV} AS vol
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "aggregation"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two nation lenses over the same join tree with a
    disjunctive cross-filter.

    Scale: both nation dims and supplier/customer broadcast; the disjunction
    is applied AFTER the broadcast joins so the single orders⋈lineitem
    shuffle is shared by both directions of the pair.
    """
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(to_dbl(F.sum(_rev())).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 shape: market share (ratio of conditional aggregates)
# ---------------------------------------------------------------------------

@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(ROUND(SUM(CASE WHEN nation = 'NATION_2' THEN vol ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE)
           / CAST(ROUND(SUM(vol), 2) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             {_REV} AS vol,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("join", "aggregation"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's supplied volume,
    as a ratio of two exact conditional sums (division done once, in
    double, after both sums are exact — deterministic).

    Scale: part/supplier/customer/nation/region all broadcast; single
    orders⋈lineitem shuffle; CASE-conditional partial aggregation.
    """
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    l = load(spark, sf_dir, "lineitem")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = _rev()
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                to_dbl(F.sum(F.when(F.col("nation") == "NATION_2", vol).otherwise(zero)))
                / to_dbl(F.sum(vol))
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q10 shape: returned-item revenue ranking
# ---------------------------------------------------------------------------

@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "aggregation", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost (returned) revenue in a window.

    Scale: customer/nation broadcast; orders⋈lineitem shuffles on orderkey
    with both filters pushed to the scans; final top-20 is
    TakeOrderedAndProject (no global sort).
    """
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01")) & (F.col("o_orderdate") < _ts("1997-07-01"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(to_dbl(F.sum(_rev())).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 shape: CASE-bucketed counts per year
# ---------------------------------------------------------------------------

@register(
    "q12_priority_shipping_by_year",
    oracle="""
    SELECT EXTRACT(year FROM l_shipdate) AS l_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag = 'N'
    GROUP BY l_year
    ORDER BY l_year
    """,
    tags=("join", "aggregation"),
)
def q12_priority_shipping_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional-count pivot (shipmode is absent; the
    ship-year plays the grouping axis).

    Scale: single orderkey shuffle; both CASE counts fold into one partial
    aggregate — no double scan for the two buckets.
    """
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "N")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_year")
    )


# ---------------------------------------------------------------------------
# Q13 shape: outer join + distribution of counts
# ---------------------------------------------------------------------------

@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "outer", "aggregation"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: LEFT OUTER join with a join-time residual predicate, then
    a distribution (count-of-counts) — customers with zero orders MUST
    appear in the 0 bucket, which an inner join would lose.

    Scale: first agg keys on c_custkey (same key as the join — no extra
    shuffle under AQE); the second agg's domain is tiny (distinct counts).
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    joined = c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"), "left_outer"
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q14 shape: promo revenue ratio
# ---------------------------------------------------------------------------

@register(
    "q14_promo_effect",
    oracle=f"""
    SELECT 100.00 * CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                                        ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE)
           / CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("join", "aggregation"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of one month's revenue from PROMO parts.

    Scale: part broadcasts; the month filter prunes lineitem row groups;
    one global two-sum reduction, division once at the end in double.
    """
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-03-01")) & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    vol = _rev()
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.00)
                * to_dbl(F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)))
                / to_dbl(F.sum(vol))
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q17 shape: correlated average predicate (division-free exact rewrite)
# ---------------------------------------------------------------------------

@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS agg_pk, COUNT(*) AS cnt,
                 SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qsum
          FROM lineitem GROUP BY l_partkey) agg
      ON agg_pk = p_partkey
    WHERE p_brand = 'Brand#11'
      AND 5 * CAST(l_quantity AS DECIMAL(12,2)) * cnt < qsum
    """,
    tags=("join", "subquery", "aggregation"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: lineitems below 20% of their part's average quantity.

    The correlated AVG predicate ``qty < 0.2 * avg(qty)`` is rewritten
    division-free as ``5*qty*cnt < sum(qty)`` — exact in decimal, so both
    engines classify every row identically (no float-division boundary).

    Scale: the per-part aggregate shuffles lineitem once on partkey (narrow
    2-column rows, map-side partial); the re-join is on the same key so AQE
    reuses the partitioning; brand filter broadcasts from part.
    """
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    l = load(spark, sf_dir, "lineitem")
    agg = (
        l.groupBy(F.col("l_partkey").alias("agg_pk"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(_dec2("l_quantity")).alias("qsum"))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(agg, F.col("agg_pk") == F.col("p_partkey"))
        .filter(F.lit(5) * _dec2("l_quantity") * F.col("cnt") < F.col("qsum"))
        .agg((to_dbl(F.sum(_dec2("l_extendedprice"))) / F.lit(7.0)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 shape: large-volume orders (HAVING pushdown into a join)
# ---------------------------------------------------------------------------

@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice,
           CAST(ROUND(total_qty, 2) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN (SELECT l_orderkey AS big_ok,
                 SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250) big
      ON big_ok = o_orderkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    bench=True,
    tags=("join", "subquery", "topk"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold.

    Scale: the HAVING aggregate reduces lineitem to qualifying orderkeys
    BEFORE touching orders (semi-join-like reduction); customer broadcasts;
    top-100 via TakeOrderedAndProject.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy(F.col("l_orderkey").alias("big_ok"))
        .agg(F.sum(_dec2("l_quantity")).alias("tq"))
        .filter(F.col("tq") > 250)
    )
    return (
        o.join(big, o.o_orderkey == F.col("big_ok"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            to_dbl(F.col("tq")).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunction of conjunctive predicates
# ---------------------------------------------------------------------------

@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(ROUND(SUM({_REV}), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "filter", "aggregation"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs spanning both join sides.

    Scale: Catalyst extracts the common l_quantity range (1..30) and the
    part-side disjunction as pushable pre-filters on each scan, keeping the
    broadcast-join input small before the residual OR is applied.
    """
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    branch = lambda brand, szhi, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, szhi)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        j.filter(
            branch("Brand#12", 15, 1, 11)
            | branch("Brand#23", 25, 10, 20)
            | branch("Brand#34", 35, 20, 30)
        ).agg(to_dbl(F.sum(_rev())).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q21 shape: EXISTS + NOT EXISTS pair
# ---------------------------------------------------------------------------

@register(
    "q21_sole_returning_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("join", "semi", "anti", "aggregation"),
)
def q21_sole_returning_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the supplier solely responsible for returns in
    multi-supplier finalized orders (returnflag stands in for the absent
    receipt/commit dates).

    Scale: EXISTS/NOT EXISTS become left-semi / left-anti joins on
    orderkey with a non-equi residual (suppkey <>); all three lineitem
    lenses share one orderkey exchange under AQE; supplier broadcasts.
    """
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load(spark, sf_dir, "lineitem")
    l1 = l.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = l.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    l3 = (
        l.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3"))
    )
    return (
        l1.join(
            l2,
            (l1.l_orderkey == F.col("ok2")) & (l1.l_suppkey != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == F.col("ok3")) & (l1.l_suppkey != F.col("sk3")),
            "left_anti",
        )
        .join(o, l1.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 shape: global-average scalar subquery + anti-join
# ---------------------------------------------------------------------------

@register(
    "q22_lapsed_rich_customers",
    oracle="""
    WITH stats AS (
      SELECT COUNT(*) AS n, SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS bal_sum
      FROM customer WHERE c_acctbal > 0.00
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS totacctbal
    FROM customer, stats
    WHERE CAST(c_acctbal AS DECIMAL(12,2)) * n > bal_sum
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("anti", "subquery", "aggregation"),
)
def q22_lapsed_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, bucketed by nation (nationkey stands in for the absent phone
    country code).

    The AVG comparison is division-free: ``bal * count > sum`` in exact
    decimal — identical row classification in both engines.

    Scale: the 2-value stats aggregate broadcasts as a cross join; the
    NOT EXISTS is a left-anti against date-filtered orders projected to one
    column before its shuffle.
    """
    c = load(spark, sf_dir, "customer")
    stats = c.filter(F.col("c_acctbal") > 0.00).agg(
        F.count(F.lit(1)).alias("n"), F.sum(_dec2("c_acctbal")).alias("bal_sum")
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("1999-01-01"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(stats))
        .filter(_dec2("c_acctbal") * F.col("n") > F.col("bal_sum"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            to_dbl(F.sum(_dec2("c_acctbal"))).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Q2 shape: correlated MIN subquery
# ---------------------------------------------------------------------------

@register(
    "q2_min_price_suppliers",
    oracle="""
    SELECT DISTINCT p_partkey, p_brand, s_suppkey, s_name, l_extendedprice AS min_price
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN (SELECT l_partkey AS mpk, MIN(l_extendedprice) AS mp
          FROM lineitem GROUP BY l_partkey) m
      ON mpk = p_partkey AND l_extendedprice = mp
    WHERE p_size BETWEEN 10 AND 15
    ORDER BY p_partkey, s_suppkey
    """,
    tags=("join", "subquery"),
)
def q2_min_price_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part correlated MIN (partsupp is absent; the
    shipped price from lineitem plays supplycost).

    Scale: the MIN aggregate and the re-join share the partkey
    partitioning; equality on the stored double is safe — both engines
    compare the identical parquet bit pattern, no arithmetic involved.
    """
    p = load(spark, sf_dir, "part").filter(F.col("p_size").between(10, 15))
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem")
    m = l.groupBy(F.col("l_partkey").alias("mpk")).agg(F.min("l_extendedprice").alias("mp"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(m, (F.col("mpk") == F.col("p_partkey")) & (F.col("l_extendedprice") == F.col("mp")))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey", "p_brand", "s_suppkey", "s_name",
            F.col("l_extendedprice").alias("min_price"),
        )
        .distinct()
        .orderBy("p_partkey", "s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q11 shape: fraction-of-total HAVING (scalar subquery threshold)
# ---------------------------------------------------------------------------

@register(
    "q11_important_part_values",
    oracle="""
    WITH val AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS v
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey = 5
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, CAST(ROUND(v, 2) AS DOUBLE) AS part_value
    FROM val, (SELECT SUM(v) AS total FROM val) t
    WHERE v * 1000 > total
    ORDER BY part_value DESC, p_partkey
    """,
    tags=("subquery", "aggregation"),
)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose shipped value from one nation's
    suppliers exceeds 0.1% of that nation's total (partsupp absent —
    lineitem value plays stock value).

    The fraction threshold is division-free: ``v * 1000 > total`` in exact
    decimal.

    Scale: supplier broadcasts; ONE partkey aggregation feeds both the
    per-part values and (via a 1-row reduction) the threshold — the 1-row
    total broadcasts back as a cross join, no second scan of lineitem.
    """
    s = load(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 5)
    l = load(spark, sf_dir, "lineitem")
    val = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice", 2, 14)).alias("v"))
    )
    total = val.agg(F.sum("v").alias("total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v") * F.lit(1000) > F.col("total"))
        .select(F.col("l_partkey").alias("p_partkey"), to_dbl(F.col("v")).alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("p_partkey"))
    )


# ---------------------------------------------------------------------------
# Q9 shape: multi-join profit by nation and year
# ---------------------------------------------------------------------------

@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(ROUND(SUM(
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(1,0)) - CAST(l_discount AS DECIMAL(6,4)))
             - CAST(p_retailprice AS DECIMAL(12,2))
               * CAST(l_quantity AS DECIMAL(12,2))
               * CAST(0.5 AS DECIMAL(1,1))
           ), 2) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY n_name, o_year DESC
    """,
    bench=True,
    tags=("join", "aggregation"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on one product family by supplier nation and
    order year (partsupp absent — cost is modeled as half the part's retail
    price per unit, keeping the 5-way join + signed-measure aggregation).

    Scale: part/supplier/nation broadcast (part is pre-filtered by the name
    predicate, pushed to its scan); the one wide shuffle is
    lineitem ⋈ orders on orderkey, then a narrow (nation, year) agg with
    map-side partials.  Profit stays exact-decimal end to end.
    """
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    half = F.lit(0.5).cast("decimal(1,1)")
    profit = _rev() - _dec2("p_retailprice") * _dec2("l_quantity") * half
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(to_dbl(F.sum(profit)).alias("profit"))
        .orderBy(F.asc("n_name"), F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q15 shape: top supplier via scalar-MAX subquery
# ---------------------------------------------------------------------------

@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, SUM({_REV}) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(ROUND(total, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON l_suppkey = s_suppkey
    WHERE total = (SELECT MAX(total) FROM rev)
    ORDER BY s_suppkey
    """,
    tags=("subquery", "aggregation"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue,
    compared in exact decimal so ties and equality are bit-reproducible.

    Scale: ONE suppkey aggregation feeds both the per-supplier revenue and
    the 1-row MAX, which broadcasts back; supplier broadcasts for the name
    lookup.  No second lineitem scan.
    """
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    s = load(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(F.sum(_rev()).alias("total"))
    mx = rev.agg(F.max("total").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", to_dbl(F.col("total")).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 shape: NOT IN anti-join + COUNT(DISTINCT)
# ---------------------------------------------------------------------------

@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("anti-join", "distinct-aggregation"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part class, excluding
    a blacklist of suppliers via NOT IN (the supplier link is lineitem —
    partsupp is absent; negative account balance plays "complaints").

    Scale: the blacklist and the filtered part dim both broadcast (anti +
    inner); COUNT(DISTINCT) expands to a two-phase agg on (class, suppkey)
    — partial dedup map-side, so the wide shuffle carries pre-deduped keys.
    """
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 shape: nested aggregate semi-join
# ---------------------------------------------------------------------------

@register(
    "q20_excess_shippers",
    oracle="""
    WITH pq AS (
      SELECT l_suppkey,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                       AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                      THEN CAST(l_quantity AS DECIMAL(12,2))
                      ELSE CAST(0 AS DECIMAL(1,0)) END) AS qty97,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red %'
      GROUP BY l_suppkey, l_partkey)
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier JOIN pq ON l_suppkey = s_suppkey
    WHERE 2 * qty97 > total_qty AND qty97 > 0 AND s_nationkey < 10
    ORDER BY s_suppkey
    """,
    tags=("semi-join", "subquery"),
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who concentrated more than half of their
    all-time shipments of a part family into one year (partsupp absent —
    the availqty>half-of-shipped predicate becomes year-share-of-shipped),
    semi-joined against a nation filter.

    Scale: conditional + total SUM come from ONE (suppkey, partkey) agg of
    the part-filtered fact (part broadcasts); the share predicate is
    division-free exact decimal; the qualifying suppkeys collapse via
    DISTINCT before a broadcast join to supplier.
    """
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("red %"))
    s = load(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 10)
    qty = _dec2("l_quantity")
    in97 = (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    pq = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in97, qty).otherwise(F.lit(0).cast("decimal(1,0)"))).alias("qty97"),
            F.sum(qty).alias("total_qty"),
        )
        .filter((F.lit(2) * F.col("qty97") > F.col("total_qty")) & (F.col("qty97") > 0))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(pq, s.s_suppkey == pq.l_suppkey)
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# market-basket association rules (support / confidence / lift)
# ---------------------------------------------------------------------------

MB_MIN_PAIR = 2   # minimum co-occurrence count for a rule
MB_TOP_K = 50
MB_E6 = 10**6     # fixed-point scale for confidence / lift
MB_MAX_BASKET = 50  # baskets over this size are excluded from pair mining:
#                     one mega-basket (loyalty card, bot session) otherwise
#                     emits C(n,2) pairs in a single task.  TPC-H baskets
#                     hold <= 7 items, so the cap is invisible here — it
#                     exists for the retail-shaped corpus at scale.


@register(
    "orders_market_basket",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem),
    n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM baskets),
    freq AS (SELECT part, COUNT(*) AS cnt FROM baskets GROUP BY part),
    sz AS (SELECT okey FROM baskets GROUP BY okey
           HAVING COUNT(*) BETWEEN 2 AND {MB_MAX_BASKET}),
    kept AS (SELECT b.okey, b.part FROM baskets b JOIN sz USING (okey)),
    pairs AS (
      SELECT a.part AS part_a, b.part AS part_b, COUNT(*) AS pair_cnt
      FROM kept a JOIN kept b
        ON a.okey = b.okey AND a.part < b.part
      GROUP BY a.part, b.part
      HAVING COUNT(*) >= {MB_MIN_PAIR})
    SELECT part_a, part_b, CAST(pair_cnt AS BIGINT) AS pair_cnt,
           CAST({MB_E6} * pair_cnt // fa.cnt AS BIGINT) AS conf_ab_e6,
           CAST({MB_E6} * pair_cnt * n.n_orders // (fa.cnt * fb.cnt)
                AS BIGINT) AS lift_e6
    FROM pairs
    JOIN freq fa ON fa.part = part_a
    JOIN freq fb ON fb.part = part_b
    CROSS JOIN n
    ORDER BY lift_e6 DESC, part_a, part_b LIMIT {MB_TOP_K}
    """,
    tags=("relational", "association", "basket"),
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: the top-MB_TOP_K
    part pairs by lift, with co-occurrence count and confidence(a→b).
    Confidence and lift are fixed-point e6 integers via floor division —
    the ratio algebra stays BIGINT-exact across engines (pair*N and
    cnt_a*cnt_b are < 2^50 at any SF whose counts fit the driver schema).

    Scale: baskets come from ONE distinct projection of lineitem; pair
    emission is bounded by the MB_MAX_BASKET cap (the dedup family's
    posting-list pattern): basket sizes come from a map-side-combinable
    count, over-cap baskets are dropped BEFORE the pair self-join, so no
    task ever materializes a mega-basket's C(n,2) pairs — and no
    collect_list array exists anywhere.  Item frequencies / n_orders stay
    computed over ALL baskets (support is a corpus property; the cap only
    bounds pair mining).  The final ranking is TakeOrderedAndProject.
    """
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    ).distinct()
    n_orders = li.select(F.countDistinct("okey").alias("n_orders"))
    freq = li.groupBy("part").agg(F.count(F.lit(1)).alias("cnt"))
    kept_okeys = (
        li.groupBy("okey")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .filter(F.col("bsz").between(2, MB_MAX_BASKET))
        .select("okey")
    )
    kept = li.join(kept_okeys, "okey")
    pairs = (
        kept.alias("a")
        .join(
            kept.alias("b"),
            on=[
                F.col("a.okey") == F.col("b.okey"),
                F.col("a.part") < F.col("b.part"),
            ],
        )
        .select(F.col("a.part").alias("part_a"), F.col("b.part").alias("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= MB_MIN_PAIR)
    )
    fa = freq.select(F.col("part").alias("part_a"), F.col("cnt").alias("cnt_a"))
    fb = freq.select(F.col("part").alias("part_b"), F.col("cnt").alias("cnt_b"))
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "pair_cnt",
            F.expr(f"({MB_E6} * pair_cnt) div cnt_a").alias("conf_ab_e6"),
            F.expr(
                f"({MB_E6} * pair_cnt * n_orders) div (cnt_a * cnt_b)"
            ).alias("lift_e6"),
        )
        .orderBy(F.desc("lift_e6"), F.asc("part_a"), F.asc("part_b"))
        .limit(MB_TOP_K)
    )


# ---------------------------------------------------------------------------
# Pareto / ABC revenue classification
# ---------------------------------------------------------------------------


@register(
    "parts_pareto_classes",
    oracle="""
    WITH rev AS (
      SELECT l_partkey AS partkey,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 -
                            CAST(l_extendedprice AS DECIMAL(18,2)) * 100 *
                            CAST(l_discount AS DECIMAL(18,4))), 0)
                  AS BIGINT) AS rev_c
      FROM lineitem GROUP BY l_partkey),
    ranked AS (
      SELECT partkey, rev_c,
             CAST(SUM(rev_c) OVER (ORDER BY rev_c DESC, partkey
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_c,
             CAST(SUM(rev_c) OVER () AS BIGINT) AS total_c,
             CAST(ROW_NUMBER() OVER (ORDER BY rev_c DESC, partkey)
                  AS BIGINT) AS rev_rank
      FROM rev)
    SELECT partkey, rev_c, rev_rank,
           CASE WHEN cum_c * 10 <= total_c * 7 THEN 'A'
                WHEN cum_c * 10 <= total_c * 9 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    ORDER BY rev_rank
    """,
    tags=("relational", "pareto", "window"),
)
def parts_pareto_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC classification of parts by discounted revenue: rank parts
    by revenue, classify by cumulative share (A = first 70% of total
    revenue, B = to 90%, C = tail) — the inventory-analysis classic.  The
    share cut is the cross-multiplied integer comparison
    ``cum * 10 <= total * k`` on exact revenue cents (the fractional
    sub-cent from the discount product is ROUNDed identically half-up on
    both engines before the BIGINT cast — a bare cast truncates in Spark
    but rounds in DuckDB), so class boundaries cannot drift between
    engines (a float running share would).

    Scale: revenue per part is one map-side-combinable aggregate; the
    running revenue sum and the rank run on the chunked parallel-prefix
    combinator (plans/prefix.py — the CUSUM decomposition): revenue-range
    chunk ids map-side, per-chunk partials, broadcast offsets, in-chunk
    prefixes under a chunk-keyed window.  No window anywhere scans the
    part dimension in one task (r12 verdict task #1).
    """
    li = load(spark, sf_dir, "lineitem")
    cents = dec("l_extendedprice", 2) * 100
    rev_expr = cents - cents * dec("l_discount", 4)
    rev = (
        li.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.round(F.sum(rev_expr), 0).cast("long").alias("rev_c"))
    )
    ranked = ranked_prefix(
        rev,
        "rev_c",
        descending=True,
        tiebreak=["partkey"],
        rank_col="rev_rank",
        prefix="rev_c",
        cum_col="cum_c",
        total_col="total_c",
    )
    return ranked.select(
        "partkey",
        "rev_c",
        "rev_rank",
        F.when(F.col("cum_c") * 10 <= F.col("total_c") * 7, "A")
        .when(F.col("cum_c") * 10 <= F.col("total_c") * 9, "B")
        .otherwise("C")
        .alias("abc_class"),
    ).orderBy("rev_rank")


# ---------------------------------------------------------------------------
# grouped OLS: per-nation monthly revenue trend (sufficient statistics)
# ---------------------------------------------------------------------------

TREND_E6 = 10**6


@register(
    "orders_nation_revenue_trend",
    oracle=f"""
    WITH m AS (
      SELECT n.n_name AS nation,
             (EXTRACT(year FROM o_orderdate) - 1992) * 12
               + EXTRACT(month FROM o_orderdate) - 1 AS t,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100), 0)
                  AS BIGINT) AS y_c
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n ON n.n_nationkey = c_nationkey
      GROUP BY 1, 2),
    s AS (
      SELECT nation,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(t) AS HUGEINT) AS st,
             CAST(SUM(y_c) AS HUGEINT) AS sy,
             CAST(SUM(t * y_c) AS HUGEINT) AS sty,
             CAST(SUM(t * t) AS HUGEINT) AS stt
      FROM m GROUP BY nation)
    SELECT nation,
           CAST(n AS BIGINT) AS n_months,
           CAST(sy AS BIGINT) AS total_cents,
           CAST(({TREND_E6} * (n * sty - st * sy))
                // (n * stt - st * st) AS BIGINT) AS slope_e6
    FROM s
    WHERE n * stt - st * st <> 0
    ORDER BY nation
    """,
    tags=("relational", "regression", "trend"),
)
def orders_nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation linear trend of monthly order revenue — grouped ordinary
    least squares via SUFFICIENT STATISTICS: slope = (n*Sty - St*Sy) /
    (n*Stt - St^2) over (month-index t, exact-cents revenue y), exposed
    as an e6 fixed-point integer so both engines agree bit-for-bit
    (truncating integer division matches across engines for negative
    slopes too — verified -7 div 2 == -7 // 2 == -3).

    This is THE scalable shape for grouped regression at 100 TB: one
    map-side-combinable aggregation produces the five sufficient sums per
    group — no per-group sort, no iteration, no matrix library; the
    monthly rollup itself is a single groupBy riding the orders scan with
    the nation dimension broadcast.  Products are computed in
    DECIMAL(38,0)/HUGEINT so a petabyte-scale Sty cannot overflow the
    64-bit lane before the final division.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    t = (
        (F.year("o_orderdate") - F.lit(1992)) * 12
        + F.month("o_orderdate") - 1
    ).cast("long")
    monthly = (
        o.join(F.broadcast(c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
               .select("c_custkey", F.col("n_name").alias("nation"))),
               o.o_custkey == F.col("c_custkey"))
        .groupBy("nation", t.alias("t"))
        .agg(
            F.round(F.sum(dec("o_totalprice", 2) * 100), 0)
            .cast("long")
            .alias("y_c")
        )
    )
    d38 = "decimal(38,0)"
    # per-row products stay in the long lane (t <= ~10^3, monthly cents <=
    # ~10^13 even at petabyte scale), but the ACCUMULATION casts each
    # operand to DECIMAL(38,0) BEFORE summing — exactly DuckDB's
    # SUM(BIGINT) -> HUGEINT behavior, so neither engine can overflow the
    # 64-bit lane mid-aggregation (review r10)
    s = monthly.groupBy("nation").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("t").cast(d38)).alias("st"),
        F.sum(F.col("y_c").cast(d38)).alias("sy"),
        F.sum((F.col("t") * F.col("y_c")).cast(d38)).alias("sty"),
        F.sum((F.col("t") * F.col("t")).cast(d38)).alias("stt"),
    )
    den = F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    num = F.lit(TREND_E6).cast(d38) * (
        F.col("n") * F.col("sty") - F.col("st") * F.col("sy")
    )
    return (
        s.filter(den != 0)
        .select(
            "nation",
            F.col("n").cast("long").alias("n_months"),
            F.col("sy").cast("long").alias("total_cents"),
            F.expr(
                f"CAST(({TREND_E6} * (n * sty - st * sy)) div "
                "(n * stt - st * st) AS BIGINT)"
            ).alias("slope_e6"),
        )
        .orderBy("nation")
    )
