"""Schema DSL validation — parity with the reference's four compile-time
TypeError classes (/root/reference/src/Edgy/Schema.hs:131-144, 341-345,
417-427, 568-582), surfaced as plan-time Python exceptions."""

from __future__ import annotations

import pytest

from edgy_spark.schema import (
    Attr,
    Cardinality,
    Directed,
    DuplicateAttributeError,
    GraphSchema,
    NodeType,
    Symmetric,
    UnknownAttributeError,
    UnknownNodeTypeError,
    UnknownRelationError,
    optional,
)


# single source of the demo schema: the runnable CLI module (re-exported
# here because the graph/plan parity tests import it from this module)
from edgy_spark.demo import demo_schema  # noqa: F401


def test_valid_schema_builds():
    s = demo_schema()
    assert s.relation("friendOf").forward is False
    assert s.relation("friendOf").table == "friend"
    assert s.relation("spouse").symmetric
    assert [f.name for f in s.node_type("Person").struct_type().fields] == [
        "id", "name", "age",
    ]


def test_duplicate_attribute_rejected():
    with pytest.raises(DuplicateAttributeError):
        NodeType("Person", (Attr("name"), Attr("name", "long")))


def test_unknown_node_type_in_relation():
    with pytest.raises(UnknownNodeTypeError):
        GraphSchema(
            node_types=(NodeType("Person", (Attr("name"),)),),
            relations=(Directed("hobby", Cardinality.MANY, "Person", "Activity", "x"),),
        )


def test_unknown_attribute_lookup():
    with pytest.raises(UnknownAttributeError):
        demo_schema().node_type("Person").attr("salary")


def test_unknown_relation_lookup():
    with pytest.raises(UnknownRelationError):
        demo_schema().relation("nemesis")


def test_optional_attr_default():
    a = optional("nickname")
    assert a.default == ""  # monoid mempty analogue (Schema.hs:398-407)
    assert optional("score", "long").default == 0
