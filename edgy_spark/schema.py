"""Property-graph schema DSL with plan-time validation.

The reference validates its schema at compile time via type-level machinery
(/root/reference/src/Edgy/Schema.hs) and turns misuse into GHC TypeErrors.
This module preserves the "errors before execution" property: a GraphSchema
is validated on construction and every name lookup raises a typed Python
exception *before* any Spark job is submitted — the four reference
diagnostics map 1:1:

- "Duplicate attribute"            (Schema.hs:131-144) → DuplicateAttributeError
- "Node type missing from schema"  (Schema.hs:341-345) → UnknownNodeTypeError
- "Attribute missing from schema"  (Schema.hs:417-427) → UnknownAttributeError
- "Relation missing from schema"   (Schema.hs:568-582) → UnknownRelationError

Design mapping (SURVEY §1.5): one node table per node type
(``id: long`` + attribute columns), one physical edge table per directed
relation pair ``(src, dst, pos)``; the inverse name resolves to a swapped
*view* of the same table, so the reference's bidirectional-consistency
invariant (Operations.hs:314-319) holds by construction.  Symmetric
relations (Schema.hs:298-307) store one canonical edge and expand to both
directions on read.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import types as T


class SchemaError(Exception):
    """Base for all plan-time schema diagnostics."""


class DuplicateAttributeError(SchemaError):
    pass


class UnknownNodeTypeError(SchemaError):
    pass


class UnknownAttributeError(SchemaError):
    pass


class UnknownRelationError(SchemaError):
    pass


class DuplicateRelationError(SchemaError):
    pass


class CardinalityError(Exception):
    """Read-time cardinality violation — the reference's
    ``error "getRelated: bad cardinality"`` (Operations.hs:284-287)."""


class Cardinality(Enum):
    """Result-shape declaration (/root/reference/src/Edgy/Cardinality.hs:16-22)."""

    OPTIONAL = "optional"  # Maybe t   → value or None
    ONE = "one"            # t         → exactly one
    MANY = "many"          # [t]       → list
    SOME = "some"          # NonEmpty  → non-empty list


_DTYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    # opaque host payloads: the reference accepts ANY Typeable+Binary type
    # as an attribute (Schema.hs:148-155); a `binary` attr gives the same
    # latitude here — callers serialize (e.g. pickle) and the engine stores
    # the bytes untouched through commits and snapshots.
    "binary": T.BinaryType(),
    "array<float>": T.ArrayType(T.FloatType()),
    "array<double>": T.ArrayType(T.DoubleType()),
    "array<string>": T.ArrayType(T.StringType()),
}


@dataclass(frozen=True)
class Attr:
    """``name ::: type`` (required) or ``name ::? type`` (optional)
    (/root/reference/src/Edgy/Schema.hs:34-36).

    Optional attributes carry an explicit default (the engine-level analogue
    of the reference's Monoid ``mempty``, Schema.hs:398-407); required
    attributes have none and must be supplied at node creation
    (Constructor family, Schema.hs:309-312).
    """

    name: str
    dtype: str = "string"
    required: bool = True
    default: object | None = None

    def spark_type(self) -> T.DataType:
        if self.dtype not in _DTYPES:
            raise SchemaError(
                f"unsupported attribute type {self.dtype!r}; one of {sorted(_DTYPES)}"
            )
        return _DTYPES[self.dtype]


def optional(name: str, dtype: str = "string", default: object | None = None) -> Attr:
    if default is None:
        default = {
            "string": "",
            "long": 0,
            "int": 0,
            "double": 0.0,
            "binary": b"",
        }.get(dtype)
    return Attr(name, dtype, required=False, default=default)


@dataclass(frozen=True)
class NodeType:
    name: str
    attrs: tuple[Attr, ...] = ()

    def __post_init__(self) -> None:
        seen: set[str] = set()
        for a in self.attrs:
            if a.name in seen:
                raise DuplicateAttributeError(
                    f"Duplicate attribute {a.name!r} in node type {self.name!r}"
                )
            seen.add(a.name)

    def attr(self, name: str) -> Attr:
        for a in self.attrs:
            if a.name == name:
                return a
        raise UnknownAttributeError(
            f"Attribute {name!r} missing from node type {self.name!r}"
        )

    def struct_type(self) -> T.StructType:
        fields = [T.StructField("id", T.LongType(), nullable=False)]
        for a in self.attrs:
            fields.append(T.StructField(a.name, a.spark_type(), nullable=not a.required))
        return T.StructType(fields)


@dataclass(frozen=True)
class RelationSide:
    """One direction of a relation, fully resolved."""

    name: str
    cardinality: Cardinality
    source: str  # node type the traversal starts from
    target: str  # node type it lands on
    table: str   # physical edge table name
    forward: bool  # True → (src,dst) as stored; False → swapped view
    symmetric: bool = False


@dataclass(frozen=True)
class Directed:
    """``DefDirected fwd bwd`` (/root/reference/src/Edgy/Schema.hs:73-76):
    a forward spec plus its explicitly-named inverse."""

    name: str
    cardinality: Cardinality
    source: str
    target: str
    inverse: str
    inverse_cardinality: Cardinality = Cardinality.MANY


@dataclass(frozen=True)
class Symmetric:
    """``DefSymmetric rel`` — self-inverse (/root/reference/src/Edgy/Schema.hs:75-76)."""

    name: str
    cardinality: Cardinality
    node_type: str


@dataclass
class GraphSchema:
    node_types: tuple[NodeType, ...]
    relations: tuple[Directed | Symmetric, ...] = ()
    _nodes: dict[str, NodeType] = field(init=False, repr=False)
    _rels: dict[str, RelationSide] = field(init=False, repr=False)

    def __post_init__(self) -> None:
        self._nodes = {}
        for nt in self.node_types:
            if nt.name in self._nodes:
                raise SchemaError(f"duplicate node type {nt.name!r}")
            self._nodes[nt.name] = nt
        self._rels = {}
        for r in self.relations:
            if isinstance(r, Directed):
                self._check_node(r.source, f"relation {r.name!r}")
                self._check_node(r.target, f"relation {r.name!r}")
                self._add_rel(
                    RelationSide(r.name, r.cardinality, r.source, r.target, r.name, True)
                )
                self._add_rel(
                    RelationSide(
                        r.inverse, r.inverse_cardinality, r.target, r.source, r.name, False
                    )
                )
            else:
                self._check_node(r.node_type, f"relation {r.name!r}")
                self._add_rel(
                    RelationSide(
                        r.name,
                        r.cardinality,
                        r.node_type,
                        r.node_type,
                        r.name,
                        True,
                        symmetric=True,
                    )
                )

    def _add_rel(self, side: RelationSide) -> None:
        if side.name in self._rels:
            raise DuplicateRelationError(f"duplicate relation name {side.name!r}")
        self._rels[side.name] = side

    def _check_node(self, name: str, ctx: str) -> None:
        if name not in self._nodes:
            raise UnknownNodeTypeError(
                f"Node type {name!r} missing from schema (referenced by {ctx})"
            )

    # -- lookups (each raises the matching typed diagnostic) ---------------

    def node_type(self, name: str) -> NodeType:
        if name not in self._nodes:
            raise UnknownNodeTypeError(f"Node type {name!r} missing from schema")
        return self._nodes[name]

    def relation(self, name: str) -> RelationSide:
        if name not in self._rels:
            raise UnknownRelationError(f"Relation {name!r} missing from schema")
        return self._rels[name]

    @property
    def edge_tables(self) -> tuple[str, ...]:
        return tuple(sorted({r.table for r in self._rels.values()}))

