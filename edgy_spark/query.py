"""Traversal-to-join compiler — set-at-a-time queries over graph snapshots.

The reference's demo queries are monadic compositions of point reads
(/root/reference/app/Main.hs:118-157): enumerate-all + filterM (scan+filter),
``concatMapM (getRelated …)`` (k-hop flatMap), ``(++)`` (union) and
``Data.List.(\\\\)`` (bag difference).  This module compiles the same shapes
into DataFrame plans so Catalyst executes them as distributed joins:

- ``NodeSet`` is a *bag* of nodes (duplicates preserved — ``concatMapM``
  over parallel edges duplicates results, and the parity tests depend on it).
- ``hop(rel)`` = equi-join through the relation's edge table; the node side
  broadcasts when small, and the join is a plain shuffled hash join at scale.
- ``minus_bag`` = EXCEPT ALL on node id — exactly ``(\\\\)``'s
  one-occurrence-per-right-element semantics (SURVEY §7.4 trap 1).
- ``anti`` = left-anti join, ``union`` = unionAll.

The reference's O(N)-scan ``lookupByName`` (app/Main.hs:132-140) becomes a
predicate-pushdown columnar scan + unique assertion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from edgy_spark.schema import GraphSchema
from edgy_spark.storage import Snapshot


class LookupError_(Exception):
    """0 or >1 matches where exactly one was required (app/Main.hs:137-140)."""


def _with_defaults(df: DataFrame, nt) -> DataFrame:
    """Unset OPTIONAL attributes are stored as NULL but READ as the declared
    default (mempty analogue — same rule as Transaction.get_attribute).
    Every path that materializes node attributes into the set-at-a-time
    layer (scan, hop, rehydrate) must apply this projection, so a
    filter(tag=<default>) matches nodes whose attr was never written no
    matter how the NodeSet was built (ADVICE r06: it was scan-only, and
    post-traversal filters missed never-written attrs)."""
    return df.select(
        "id",
        *[
            (
                F.coalesce(F.col(a.name), F.lit(a.default)).alias(a.name)
                if (not a.required and a.default is not None)
                else F.col(a.name)
            )
            for a in nt.attrs
        ],
    )


class NodeSet:
    def __init__(self, snap: Snapshot, schema: GraphSchema, node_type: str, df: DataFrame):
        self.snap = snap
        self.schema = schema
        self.node_type = node_type
        self.df = df  # bag of node rows (id + attrs)

    # -- scan / filter / project ------------------------------------------

    @classmethod
    def scan(cls, snap: Snapshot, schema: GraphSchema, node_type: str) -> "NodeSet":
        nt = schema.node_type(node_type)  # plan-time validation
        df = _with_defaults(snap.nodes(node_type), nt)
        return cls(snap, schema, node_type, df)

    #: above this many index hits, lookup abandons the point-read plan (the
    #: literal id list would bloat the filter) and joins ids to the table
    LOOKUP_POINT_LIMIT = 1000

    @classmethod
    def lookup(cls, snap: Snapshot, schema: GraphSchema, node_type: str, **eq) -> "NodeSet":
        """Equality lookup that uses a committed secondary index when one
        matches an ``attr=value`` predicate.  The index read prunes to ONE
        bucket of a two-column projection; the matching ids (an equality
        hit — small by construction) are then collected and pushed into the
        node-table read as a LITERAL id predicate, which parquet row-group
        min/max skipping — and bucket pruning, under ``bucket_nodes`` —
        turns into a point read.  (A lazy ids⋈nodes join would NOT give
        this: OSS Spark has no dynamic bucket/file pruning off a join key,
        so the join side would scan the whole table.)  Lookups matching
        more than LOOKUP_POINT_LIMIT ids keep the join plan instead.

        Falls back to ``scan().filter()`` when no index applies (none
        configured, dropped by a bulk load, or stale against the current
        schema), so results are identical either way — including matches on
        never-written optional attributes, since the index stores
        default-coalesced READ values."""
        nt = schema.node_type(node_type)
        for name in eq:
            nt.attr(name)  # plan-time validation → UnknownAttributeError
        for name, value in eq.items():
            idx = snap.attr_index(node_type, name)
            if idx is None:
                continue
            ids = idx.filter(F.col(name) == value).select("id")
            nodes = _with_defaults(snap.nodes(node_type), nt)
            head = ids.limit(cls.LOOKUP_POINT_LIMIT + 1).collect()
            if len(head) <= cls.LOOKUP_POINT_LIMIT:
                id_list = [r[0] for r in head]
                hit_df = (
                    nodes.filter(F.col("id").isin(id_list))
                    if id_list
                    else nodes.filter(F.lit(False))
                )
            else:
                hit_df = ids.join(nodes, "id")
            hit = cls(snap, schema, node_type, hit_df)
            rest = {k: v for k, v in eq.items() if k != name}
            return hit.filter(**rest) if rest else hit
        return cls.scan(snap, schema, node_type).filter(**eq)

    def filter(self, condition: Column | None = None, **eq) -> "NodeSet":
        nt = self.schema.node_type(self.node_type)
        df = self.df
        if condition is not None:
            df = df.filter(condition)
        for name, value in eq.items():
            nt.attr(name)  # plan-time validation → UnknownAttributeError
            df = df.filter(F.col(name) == value)
        return NodeSet(self.snap, self.schema, self.node_type, df)

    def attrs(self, *names: str) -> DataFrame:
        nt = self.schema.node_type(self.node_type)
        for n in names:
            nt.attr(n)
        return self.df.select("id", *names)

    # -- traversal ---------------------------------------------------------

    def hop(
        self, rel_name: str, keep_order: bool = False, with_source: bool = False
    ) -> "NodeSet":
        """Follow a relation for every node in the set (bag semantics:
        one output row per edge, duplicates preserved — ``concatMapM``).

        Scale: two equi-joins (nodes⋈edges⋈targets); Catalyst broadcasts
        whichever side is small and shuffles on the key otherwise.  With
        ``keep_order`` the per-source adjacency order (pos) is carried so
        downstream sorts can reproduce the reference's list order.
        """
        side = self.schema.relation(rel_name)
        if side.source != self.node_type:
            raise TypeError(
                f"relation {rel_name!r} starts at {side.source!r}, "
                f"not {self.node_type!r}"
            )
        edges = self.snap.edge_table(side.table)
        if side.forward or side.symmetric:
            e = edges.select(
                F.col("src").alias("_from"), F.col("dst").alias("_to"), "pos"
            )
        else:
            e = edges.select(
                F.col("dst").alias("_from"), F.col("src").alias("_to"),
                F.col("ipos").alias("pos"),
            )
        targets = _with_defaults(
            self.snap.nodes(side.target), self.schema.node_type(side.target)
        )
        out = (
            self.df.select(F.col("id").alias("_from"))
            .join(e, "_from")
            .join(targets, F.col("_to") == targets.id)
        )
        cols = list(targets.columns)
        if keep_order:
            cols.append("pos")
        sel = out.select(*cols, F.col("_from").alias("src_id")) if with_source else out.select(*cols)
        return NodeSet(self.snap, self.schema, side.target, sel)

    # -- set / bag algebra -------------------------------------------------

    def union(self, other: "NodeSet") -> "NodeSet":
        self._same_type(other)
        return NodeSet(
            self.snap, self.schema, self.node_type,
            self.df.select("id").unionAll(other.df.select("id")),
        )

    def minus_bag(self, other: "NodeSet") -> "NodeSet":
        """Bag difference on id — ``Data.List.(\\\\)`` semantics."""
        self._same_type(other)
        return NodeSet(
            self.snap, self.schema, self.node_type,
            self.df.select("id").exceptAll(other.df.select("id")),
        )

    def anti(self, other: "NodeSet") -> "NodeSet":
        """Anti-join on id — removes ALL occurrences (document the delta
        from minus_bag; both are exposed per SURVEY §7.4)."""
        self._same_type(other)
        return NodeSet(
            self.snap, self.schema, self.node_type,
            self.df.join(other.df.select("id"), "id", "left_anti"),
        )

    def distinct(self) -> "NodeSet":
        return NodeSet(self.snap, self.schema, self.node_type, self.df.distinct())

    def rehydrate(self) -> "NodeSet":
        """Re-attach attribute columns after id-only algebra."""
        nodes = _with_defaults(
            self.snap.nodes(self.node_type), self.schema.node_type(self.node_type)
        )
        ids = self.df.select("id")
        return NodeSet(
            self.snap, self.schema, self.node_type, ids.join(nodes, "id", "left")
        )

    def _same_type(self, other: "NodeSet") -> None:
        if other.node_type != self.node_type:
            raise TypeError(
                f"set algebra over different node types: "
                f"{self.node_type!r} vs {other.node_type!r}"
            )

    # -- terminal ----------------------------------------------------------

    def ids(self) -> list[int]:
        return [r[0] for r in self.df.select("id").collect()]

    def unique(self) -> dict:
        """Exactly-one assertion (lookupByName, app/Main.hs:137-140)."""
        rows = self.df.limit(2).collect()
        if len(rows) != 1:
            n = self.df.count() if len(rows) > 1 else 0
            raise LookupError_(f"expected exactly one {self.node_type}, found {n or len(rows)}")
        return rows[0].asDict()
