"""Relational operator coverage (SURVEY.md §2.3) over the driver's star schema.

The reference engine exposes scan/filter/project/equi-semi-anti join/union
through its graph API (/root/reference/src/Edgy/Operations.hs) and the demo
workload (/root/reference/app/Main.hs:118-157); aggregation, windows, sort,
set ops, and scalar functions are ABSENT there but in scope per the north
star.  Everything here is pure DataFrame API — Catalyst picks broadcast vs
shuffle joins (dimension tables are under the broadcast threshold at every
SF; fact-fact joins shuffle on their keys and AQE handles skew).

Scale notes per query are in the docstrings; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from edgy_spark.catalog import register
from edgy_spark.functions.exact import dec, one, to_dbl
from edgy_spark.sources import load


def _dec2(c):  # prices/balances: exact 2-dp, values < 10^10
    return dec(c, 2, 12)


def _rate(c):  # discount/tax: exact 4-dp rates in [0,1]
    return dec(c, 4, 6)


# ---------------------------------------------------------------------------
# Aggregation (hash agg, partial+final via Catalyst)
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(1,0)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(1,0)) - CAST(l_discount AS DECIMAL(6,4)))
                    * (CAST(1 AS DECIMAL(1,0)) + CAST(l_tax AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_charge,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("aggregation", "scan", "filter"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: full-scan agg with exact-decimal measures.

    Scale: maps to one shuffle on (returnflag, linestatus) — 6 groups —
    with map-side partial aggregation doing ~all the work; the filter and
    the 7-column projection push into the parquet scan.
    """
    l = load(spark, sf_dir, "lineitem")
    l = l.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
    qty, price = _dec2("l_quantity"), _dec2("l_extendedprice")
    disc, tax = _rate("l_discount"), _rate("l_tax")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            to_dbl(F.sum(qty)).alias("sum_qty"),
            to_dbl(F.sum(price)).alias("sum_base_price"),
            to_dbl(F.sum(price * (one() - disc))).alias("sum_disc_price"),
            to_dbl(F.sum(price * (one() - disc) * (one() + tax))).alias("sum_charge"),
            (to_dbl(F.sum(qty)) / F.count(F.lit(1))).alias("avg_qty"),
            (to_dbl(F.sum(disc), 4) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(6,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("aggregation", "filter"),
    bench=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly-selective filter + global sum.

    Scale: every predicate is parquet-pushable (min/max row-group skipping
    on l_shipdate); the agg is a single partial+final reduction, no
    wide shuffle at all.
    """
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(to_dbl(F.sum(_dec2("l_extendedprice") * _rate("l_discount"))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Joins (broadcast dims, shuffled facts) + top-k
# ---------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(1,0)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "aggregation", "topk"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dim⋈fact⋈fact with selective filters, then top-10.

    Scale: customer (filtered to one segment) broadcasts; orders⋈lineitem
    shuffles on orderkey.  The final top-10 is a TakeOrderedAndProject —
    no global sort materializes.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            to_dbl(
                F.sum(_dec2("l_extendedprice") * (one() - _rate("l_discount")))
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(1,0)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "aggregation"),
    bench=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join through the whole star.

    Scale: region/nation/supplier/customer all broadcast (dimension-sized
    at any SF in this schema); the only shuffle is orders⋈lineitem on
    orderkey plus the 5-group final agg.
    """
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
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
        .agg(
            to_dbl(
                F.sum(_dec2("l_extendedprice") * (one() - _rate("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@register(
    "top_orders_per_customer",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM customer JOIN orders ON c_custkey = o_custkey
    ) t
    WHERE rn <= 3
    ORDER BY c_custkey, rn
    """,
    tags=("window", "join"),
    bench=True,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ROW_NUMBER (ABSENT in reference; north-star).

    Scale: one shuffle on c_custkey; the rn<=3 filter is applied by
    Spark's WindowGroupLimit pushdown before full sort materialization.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("c_custkey", "rn")
    )


@register(
    "customer_order_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
             AS running_spend,
           LAG(o_orderkey) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
    FROM orders
    WHERE o_custkey <= 200
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    tags=("window",),
)
def customer_order_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate + LAG analytic window (ABSENT in reference)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        to_dbl(
            F.sum(_dec2("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0))
        ).alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube, distinct aggregation
# ---------------------------------------------------------------------------

@register(
    "rollup_nation_balance",
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
    tags=("aggregation", "rollup"),
)
def rollup_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (ABSENT in reference; Spark built-in)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            to_dbl(F.sum(_dec2("c_acctbal"))).alias("total_balance"),
        )
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


@register(
    "cube_returnflag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("aggregation", "cube"),
)
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (ABSENT in reference; Spark built-in)."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            to_dbl(F.sum(_dec2("l_quantity"))).alias("total_qty"),
        )
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


@register(
    "distinct_customers_per_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("aggregation", "distinct"),
)
def distinct_customers_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Catalyst expands to a two-phase exact distinct agg."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Semi / anti joins and set operations
# (the reference's isRelated, `\\` anti-join, and (++) union —
#  /root/reference/src/Edgy/Operations.hs:289-301, app/Main.hs:153-157)
# ---------------------------------------------------------------------------

@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY c_custkey
    """,
    tags=("join", "anti"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join — the reference's `needed \\\\ available` pattern
    (/root/reference/app/Main.hs:157) and delete-cascade filter
    (/root/reference/src/Edgy/Operations.hs:206-214) at table scale.

    Scale: left-anti against orders' custkey projection; Catalyst builds
    the hash side from the distinct keys only.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
    tags=("join", "semi"),
)
def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join — the reference's `isRelated` edge-existence test
    (/root/reference/src/Edgy/Operations.hs:289-301) as a set-at-a-time op."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "repeat_buyers_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ORDER BY o_custkey
    """,
    tags=("setop", "intersect"),
)
def repeat_buyers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics) — ABSENT in reference, north-star scope."""
    o = load(spark, sf_dir, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y96.intersect(y97).orderBy("o_custkey")


@register(
    "lapsed_buyers_except_all",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    EXCEPT ALL
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    ORDER BY o_custkey
    """,
    tags=("setop", "except"),
)
def lapsed_buyers_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference, the exact semantics of the reference's
    `Data.List.(\\\\)` in missingTools (/root/reference/app/Main.hs:157,
    SURVEY §7.4 trap 1): removes one occurrence per right-hand element."""
    o = load(spark, sf_dir, "orders")
    before = o.filter(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")).select(
        "o_custkey"
    )
    after = o.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")).select(
        "o_custkey"
    )
    return before.exceptAll(after).orderBy("o_custkey")


@register(
    "priority_union_all",
    oracle="""
    SELECT o_orderkey, o_orderpriority AS bucket FROM orders
    WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_orderpriority AS bucket FROM orders
    WHERE o_orderpriority = '2-HIGH'
    ORDER BY o_orderkey, bucket
    """,
    tags=("setop", "union"),
)
def priority_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — the reference's `(++)` of traversal branches
    (/root/reference/app/Main.hs:153-156)."""
    o = load(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.col("o_orderpriority").alias("bucket")
    )
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select(
        "o_orderkey", F.col("o_orderpriority").alias("bucket")
    )
    return urgent.unionAll(high).orderBy("o_orderkey", "bucket")


# ---------------------------------------------------------------------------
# Scalar function passthrough (string / date / math / conditional)
# ---------------------------------------------------------------------------

@register(
    "scalar_function_showcase",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LENGTH(p_name) AS name_len,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           ROUND(p_retailprice * 1.1, 2) AS marked_up,
           CAST(FLOOR(p_size / 10) AS INTEGER) AS size_bucket,
           CASE WHEN p_retailprice > 1500 THEN 'premium' ELSE 'standard' END AS tier,
           SUBSTR(p_type, 1, 3) AS type_prefix
    FROM part
    WHERE p_size >= 10
    ORDER BY p_partkey
    """,
    tags=("scalar", "projection", "filter"),
)
def scalar_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/math/conditional functions (ABSENT in reference — its
    values are opaque Binary blobs, /root/reference/src/Edgy/Node.hs:73-81;
    the full pyspark.sql.functions catalog is our replacement).

    All JVM-side, inside whole-stage codegen — zero Python in the row path.
    """
    p = load(spark, sf_dir, "part").filter(F.col("p_size") >= 10)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("marked_up"),
        F.floor(F.col("p_size") / 10).cast("int").alias("size_bucket"),
        F.when(F.col("p_retailprice") > 1500, "premium")
        .otherwise("standard")
        .alias("tier"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
    ).orderBy("p_partkey")


@register(
    "json_event_extraction",
    oracle="""
    SELECT event_id,
           user_id,
           UPPER(event_type) AS event_type_uc,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS event_day
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    ORDER BY event_id
    """,
    tags=("scalar", "json"),
)
def json_event_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction + date functions over the events table."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "signup")
    )
    return e.select(
        "event_id",
        "user_id",
        F.upper("event_type").alias("event_type_uc"),
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("event_day"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Sort / limit
# ---------------------------------------------------------------------------

@register(
    "priciest_parts_topk",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 15
    """,
    tags=("sort", "topk"),
)
def priciest_parts_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject (per-partition top-k then
    driver merge of k·partitions rows; never a global sort)."""
    p = load(spark, sf_dir, "part")
    return p.select("p_partkey", "p_name", "p_retailprice").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    ).limit(15)


# ---------------------------------------------------------------------------
# GROUPING SETS (explicit set list, distinct from cube/rollup above)
# ---------------------------------------------------------------------------

@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY gid, returnflag, linestatus
    """,
    tags=("aggregation", "grouping-sets"),
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — per-returnflag, per-linestatus, and grand
    totals in ONE pass (cube/rollup are the degenerate cases; this is the
    general form).

    Scale: Catalyst expands the sets via Expand (3 rows per input row
    pre-aggregation, combined map-side), so the fact table is scanned once
    — vs 3 scans for the UNION ALL equivalent.  grouping() disambiguates
    real NULL group keys from roll-up rows.
    """
    l = load(spark, sf_dir, "lineitem")
    return (
        l.groupingSets(
            [[F.col("l_returnflag")], [F.col("l_linestatus")], []],
            F.col("l_returnflag"), F.col("l_linestatus"),
        )
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).alias("gid"),
            to_dbl(F.sum(_dec2("l_extendedprice"))).alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "gid", "revenue",
        )
        .orderBy("gid", "returnflag", "linestatus")
    )


# ---------------------------------------------------------------------------
# Analytic window functions: lag / lead / ntile
# ---------------------------------------------------------------------------

@register(
    "customer_order_gaps",
    oracle="""
    SELECT o_custkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           date_diff('day',
                     LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS days_since_prev,
           NTILE(4) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS recency_quartile
    FROM orders
    WHERE o_custkey < 200
    ORDER BY o_custkey, order_date, days_since_prev
    """,
    tags=("window", "analytic"),
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer inter-order gaps (LAG) and order-recency quartiles
    (NTILE) — the analytic-window family the ranking/cumsum queries above
    don't touch.

    Scale: one shuffle on custkey serves both window functions (same
    partitioning + ordering); the custkey filter pushes to the scan.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("days_since_prev"),
            F.ntile(4).over(w).alias("recency_quartile"),
        )
        .orderBy("o_custkey", "order_date", "days_since_prev")
    )


# ---------------------------------------------------------------------------
# PIVOT (wide conditional aggregation)
# ---------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_COLS = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low"]


@register(
    "pivot_orders_priority_by_year",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           {', '.join(
               f"COALESCE(COUNT(*) FILTER (WHERE o_orderpriority = '{p}'), 0) AS {c}"
               for p, c in zip(_PRIORITIES, _PRIORITY_COLS))}
    FROM orders
    GROUP BY order_year
    ORDER BY order_year
    """,
    tags=("aggregation", "pivot"),
)
def pivot_orders_priority_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per year, one column per priority.

    The value list is EXPLICIT — with an implicit list Spark runs an extra
    distinct-collect job to discover pivot columns and the output schema
    becomes data-dependent, which breaks at scale (a driver-side collect
    over the key universe) and breaks schema stability.  Explicit values
    compile to one pass of conditional aggregation: a single scan + single
    shuffle, identical to the oracle's FILTER clauses.
    """
    o = load(spark, sf_dir, "orders")
    wide = (
        o.select(F.year("o_orderdate").cast("long").alias("order_year"), "o_orderpriority")
        .groupBy("order_year")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    # one explicit null-handling path (the oracle's COALESCE): a pivot cell
    # with no rows is NULL, never a count
    renamed = wide.select(
        "order_year",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(c)
          for p, c in zip(_PRIORITIES, _PRIORITY_COLS)],
    )
    return renamed.orderBy("order_year")


@register(
    "repeat_buyers_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT ALL
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ORDER BY o_custkey
    """,
    tags=("setop", "intersect"),
)
def repeat_buyers_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): each customer appears min(n96, n97)
    times — with the bag EXCEPT/UNION queries this completes the multiset
    algebra the engine's NodeSet layer is built on.

    Scale: Catalyst rewrites intersect-all as a count-compare aggregate —
    one shuffle per side on the key, no raw-row self-join.
    """
    o = load(spark, sf_dir, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y96.intersectAll(y97).orderBy("o_custkey")


# -- skew-toolkit demonstration (oracle-verified salted join) ----------------

@register(
    "skew_salted_segment_revenue",
    oracle="""
    SELECT c_mktsegment AS mktsegment,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY mktsegment
    """,
    tags=("skew", "join", "aggregation"),
)
def skew_salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment order revenue computed through the SALTED join path
    (plans/skew.salted_join) with a deliberately low hot threshold so every
    key takes the salt-and-replicate route — proving the skew machinery is
    value-exact against the plain-join oracle (row multiplicity included),
    not just plan-shaped.  At 100 TB this is the join you'd salt when one
    customer owns a pathological share of orders and the build side is too
    large to broadcast.
    """
    from edgy_spark.functions.exact import dec, to_dbl
    from edgy_spark.plans.skew import salted_join

    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    joined = salted_join(o, c, "custkey", n_salts=8, hot_threshold_rows=5)
    return (
        joined.groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            to_dbl(F.sum(dec("o_totalprice", 2, 18))).alias("total_price"),
        )
        .orderBy("mktsegment")
    )


@register(
    "variant_event_props_rollup",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           'OBJECT<k: BIGINT>' AS props_schema
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("scalar", "json", "variant"),
)
def variant_event_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured rollup through the VARIANT type (Spark 4): props is
    parsed ONCE into the binary variant encoding, then every downstream
    access — typed ``variant_get`` extraction, aggregation, and
    ``schema_of_variant_agg`` introspection — works on that encoding
    instead of re-parsing JSON text per access.

    At 100 TB this is the difference between one parse per row and one
    parse per (row × accessed-field); for event tables with wide sparse
    props maps, variant + shredded parquet storage is the idiomatic Spark 4
    answer (``json_event_extraction`` shows the classic per-field
    ``get_json_object`` path for contrast).  The inferred-schema column is
    Spark's variant schema string — the oracle pins it as a literal, which
    also asserts the inference is stable.
    """
    e = load(spark, sf_dir, "events")
    v = e.select("event_type", F.parse_json("props").alias("v"))
    k = F.variant_get("v", "$.k", "bigint")
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.schema_of_variant_agg("v").alias("props_schema"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Bloom-filter join pruning (plans/bloom.py)
# ---------------------------------------------------------------------------

@register(
    "join_bloom_pruned_building_revenue",
    oracle="""
    SELECT c_nationkey AS nationkey,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY c_nationkey
    ORDER BY nationkey
    """,
    tags=("join", "bloom", "scale"),
)
def join_bloom_pruned_building_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue of BUILDING-segment orders, computed through the
    EXPLICIT Bloom-prune path (plans/bloom.py): an 8 KiB bitset summarizing
    the segment's custkeys broadcasts to every probe task and discards
    non-matching orders BEFORE the join shuffle; the exact join afterwards
    removes the (rare, bounded) false positives, so the result is provably
    identical to the plain join — which is exactly what the oracle runs.

    At 100 TB this is the join you'd bloom when the filtered dimension is
    too large to broadcast as a hash relation: m bits of state replace the
    key set, and the probe side shrinks by the true selectivity (~1/5 here)
    before any data moves.  The prune is all codegen'd map-lookup bit tests;
    no Python, no extra shuffle (the bitset build aggregates bit_or partials
    map-side over the dimension only).
    """
    from edgy_spark.plans.bloom import bloom_build, bloom_prune

    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    bloom = bloom_build(c, "c_custkey")
    pruned = bloom_prune(o, "o_custkey", bloom)
    return (
        pruned.join(c, pruned.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            to_dbl(F.sum(dec("o_totalprice", 2, 18))).alias("total_price"),
        )
        .orderBy("nationkey")
    )


@register(
    "trailing_30d_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w, 2)
                AS DOUBLE) AS spend_30d,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_30d
    FROM orders
    WHERE o_custkey <= 200
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY datediff('day', DATE '1970-01-01',
                                   CAST(o_orderdate AS DATE))
                 RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "range-frame"),
)
def trailing_30d_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-day spend per customer order: a RANGE window frame —
    the frame is defined by the ORDER-BY VALUE interval (29 days preceding
    through the current date), not by row offsets, so same-day orders are
    frame peers and gaps in the calendar shrink the window.  This is the
    frame type rows-based windows cannot express (running_total above is
    the ROWS twin); Spark evaluates it in the same single per-partition
    sort, so scale behavior matches any other window — one shuffle on the
    partition key.  Date arithmetic runs on epoch-day integers
    (``unix_date``), keeping the frame bounds exact.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.to_date("o_orderdate")))
        .rangeBetween(-29, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        to_dbl(F.sum(_dec2("o_totalprice")).over(w)).alias("spend_30d"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    ).orderBy("o_custkey", "o_orderkey")
