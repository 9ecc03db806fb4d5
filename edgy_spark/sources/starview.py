"""Graph-shaped view of the driver's star schema (FIXTURES.md §2).

Maps the TPC-H-ish parquet tables onto the engine's graph model WITHOUT
copying data: node tables are the parquet tables with the key renamed to
``id``; edge tables are projections of the fact tables' foreign keys.
This exercises the reference's traversal operators (scan / filter / k-hop /
anti / semi — /root/reference/app/Main.hs:118-157) on real volume, and every
traversal stays a pure DataFrame plan (predicate pushdown + broadcast joins
still apply, since edges are column projections of the same scans).

lineitem's synthetic node id is ``l_orderkey * 10 + l_linenumber``
(l_linenumber < 10 by TPC-H construction) — deterministic and collision-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from edgy_spark.schema import Attr, Cardinality, Directed, GraphSchema, NodeType
from edgy_spark.sources.tables import load

STAR_SCHEMA = GraphSchema(
    node_types=(
        NodeType("customer", (Attr("c_name"), Attr("c_nationkey", "int"),
                              Attr("c_acctbal", "double"), Attr("c_mktsegment"))),
        NodeType("orders", (Attr("o_custkey", "long"), Attr("o_orderstatus"),
                            Attr("o_totalprice", "double"), Attr("o_orderdate", "timestamp"),
                            Attr("o_orderpriority"))),
        NodeType("lineitem", (Attr("l_orderkey", "long"), Attr("l_partkey", "long"),
                              Attr("l_suppkey", "long"), Attr("l_quantity", "double"),
                              Attr("l_extendedprice", "double"), Attr("l_discount", "double"),
                              Attr("l_shipdate", "timestamp"))),
        NodeType("part", (Attr("p_name"), Attr("p_brand"), Attr("p_type"),
                          Attr("p_size", "int"), Attr("p_retailprice", "double"))),
        NodeType("supplier", (Attr("s_name"), Attr("s_nationkey", "int"),
                              Attr("s_acctbal", "double"))),
        NodeType("nation", (Attr("n_name"), Attr("n_regionkey", "int"))),
        NodeType("region", (Attr("r_name"),)),
    ),
    relations=(
        Directed("placed", Cardinality.MANY, "customer", "orders", "placed_by",
                 Cardinality.ONE),
        Directed("contains", Cardinality.SOME, "orders", "lineitem", "contained_in",
                 Cardinality.ONE),
        Directed("of_part", Cardinality.ONE, "lineitem", "part", "part_lineitems"),
        Directed("from_supplier", Cardinality.ONE, "lineitem", "supplier",
                 "supplier_lineitems"),
        Directed("in_nation", Cardinality.ONE, "customer", "nation", "nation_customers"),
        Directed("supp_nation", Cardinality.ONE, "supplier", "nation", "nation_suppliers"),
        Directed("in_region", Cardinality.ONE, "nation", "region", "region_nations"),
    ),
)

def _lineitem_id():
    return (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long")


class StarSnapshot:
    """Duck-typed Snapshot (nodes()/edge_table()) over the parquet star schema."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    def nodes(self, node_type: str) -> DataFrame:
        key = {
            "customer": "c_custkey", "orders": "o_orderkey", "part": "p_partkey",
            "supplier": "s_suppkey", "nation": "n_nationkey", "region": "r_regionkey",
        }
        df = load(self.spark, self.sf_dir, node_type)
        if node_type == "lineitem":
            return df.withColumn("id", _lineitem_id())
        return df.withColumn("id", F.col(key[node_type]).cast("long"))

    def edge_table(self, table: str) -> DataFrame:
        z = F.lit(0).cast("long")
        if table == "placed":
            df = load(self.spark, self.sf_dir, "orders")
            return df.select(F.col("o_custkey").cast("long").alias("src"),
                             F.col("o_orderkey").cast("long").alias("dst"))\
                     .withColumn("pos", z).withColumn("ipos", z)
        if table in ("contains", "of_part", "from_supplier"):
            df = load(self.spark, self.sf_dir, "lineitem")
            src, dst = {
                "contains": (F.col("l_orderkey"), _lineitem_id()),
                "of_part": (_lineitem_id(), F.col("l_partkey")),
                "from_supplier": (_lineitem_id(), F.col("l_suppkey")),
            }[table]
            return df.select(src.cast("long").alias("src"), dst.cast("long").alias("dst"))\
                     .withColumn("pos", z).withColumn("ipos", z)
        if table == "in_nation":
            df = load(self.spark, self.sf_dir, "customer")
            return df.select(F.col("c_custkey").cast("long").alias("src"),
                             F.col("c_nationkey").cast("long").alias("dst"))\
                     .withColumn("pos", z).withColumn("ipos", z)
        if table == "supp_nation":
            df = load(self.spark, self.sf_dir, "supplier")
            return df.select(F.col("s_suppkey").cast("long").alias("src"),
                             F.col("s_nationkey").cast("long").alias("dst"))\
                     .withColumn("pos", z).withColumn("ipos", z)
        if table == "in_region":
            df = load(self.spark, self.sf_dir, "nation")
            return df.select(F.col("n_nationkey").cast("long").alias("src"),
                             F.col("n_regionkey").cast("long").alias("dst"))\
                     .withColumn("pos", z).withColumn("ipos", z)
        raise KeyError(table)


def star_nodes(spark: SparkSession, sf_dir: str, node_type: str):
    from edgy_spark.query import NodeSet

    return NodeSet.scan(StarSnapshot(spark, sf_dir), STAR_SCHEMA, node_type)
