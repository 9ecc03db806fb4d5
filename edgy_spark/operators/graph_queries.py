"""Graph-operator queries over the star schema via the traversal compiler.

Each query exercises a reference traversal pattern
(/root/reference/app/Main.hs:118-157) — scan+filter, k-hop, anti/semi,
cardinality check — through ``edgy_spark.query.NodeSet`` on the graph view
of the TPC-H-ish tables (FIXTURES.md §2), and is oracle-checked as plain SQL.

Scale: a hop is an equi-join whose edge side is a column projection of the
underlying fact scan — no materialized edge copies; Catalyst still sees one
join tree and broadcasts dimension-sized sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from edgy_spark.catalog import register
from edgy_spark.functions.exact import dec, to_dbl
from edgy_spark.sources.starview import star_nodes


@register(
    "graph_customer_order_rollup",
    oracle="""
    SELECT o_custkey AS c_custkey,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_spend
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_custkey
    ORDER BY total_spend DESC, c_custkey
    LIMIT 50
    """,
    tags=("graph", "traversal", "aggregation"),
    bench=True,
)
def graph_customer_order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hop traversal with provenance: BUILDING customers → placed orders,
    aggregated per source customer (getRelated as a set-at-a-time join,
    /root/reference/src/Edgy/Operations.hs:273-287)."""
    customers = star_nodes(spark, sf_dir, "customer").filter(c_mktsegment="BUILDING")
    orders = customers.hop("placed", with_source=True)
    return (
        orders.df.groupBy(F.col("src_id").alias("c_custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            to_dbl(F.sum(dec("o_totalprice", 2, 12))).alias("total_spend"),
        )
        .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
        .limit(50)
    )


@register(
    "graph_3hop_nation_parts",
    oracle="""
    SELECT DISTINCT p_partkey, p_brand
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN part     ON p_partkey = l_partkey
    WHERE c_nationkey = 1 AND o_orderpriority = '1-URGENT'
    ORDER BY p_partkey
    """,
    tags=("graph", "traversal"),
    bench=True,
)
def graph_3hop_nation_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop traversal customer→orders→lineitem→part with filters on two
    hops — the missingTools 2-hop chain (/root/reference/app/Main.hs:152)
    extended one level, compiled to a single join DAG."""
    customers = star_nodes(spark, sf_dir, "customer").filter(c_nationkey=1)
    urgent = customers.hop("placed").filter(o_orderpriority="1-URGENT")
    parts = urgent.hop("contains").hop("of_part").distinct()
    return parts.df.select(
        F.col("id").alias("p_partkey"), "p_brand"
    ).orderBy("p_partkey")


@register(
    "graph_anti_inactive_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_custkey NOT IN (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    ORDER BY c_custkey
    LIMIT 100
    """,
    tags=("graph", "anti"),
)
def graph_anti_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join via the traversal layer — `\\\\` / left_anti
    (/root/reference/app/Main.hs:157)."""
    customers = star_nodes(spark, sf_dir, "customer")
    recent_customers = (
        customers.hop("placed")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .hop("placed_by")
    )
    # anti() preserves the scan's attribute columns, so no rehydrate —
    # that would re-scan and re-join the customer table for nothing
    inactive = customers.anti(recent_customers)
    return inactive.df.select(
        F.col("id").alias("c_custkey"), "c_name", "c_acctbal"
    ).orderBy("c_custkey").limit(100)


@register(
    "graph_semi_nations_with_rich_customers",
    oracle="""
    SELECT DISTINCT n_nationkey, n_name
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    WHERE c_acctbal > 9000
    ORDER BY n_nationkey
    """,
    tags=("graph", "semi"),
)
def graph_semi_nations_with_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join through an inverse relation view — isRelated set-at-a-time
    (/root/reference/src/Edgy/Operations.hs:289-301)."""
    rich = star_nodes(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    nations = rich.hop("in_nation").distinct()
    return nations.df.select(
        F.col("id").cast("int").alias("n_nationkey"), "n_name"
    ).orderBy("n_nationkey")


@register(
    "graph_cardinality_orders_have_customer",
    oracle="""
    SELECT COUNT(*) AS n_violations
    FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    """,
    tags=("graph", "constraint"),
)
def graph_cardinality_orders_have_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality-ONE enforcement scan (placed_by): every order must have
    its customer (/root/reference/src/Edgy/Operations.hs:284-287 as a
    distributed constraint check, SURVEY §2.3)."""
    orders = star_nodes(spark, sf_dir, "orders")
    customers = star_nodes(spark, sf_dir, "customer")
    orphans = orders.df.join(
        customers.df.select(F.col("id").alias("ck")),
        orders.df.o_custkey == F.col("ck"),
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_violations"))
