"""Property tests for the vendored mini protobuf runtime
(tests/_vendor/google/protobuf/_minirt.py): arbitrary values round-trip
through our own wire encode/decode, and a JVM cross-check on adversarial
scalars (negative/limit int64s, unicode, empty messages) pins real-protobuf
compatibility beyond the examples the integration test happens to touch."""

from __future__ import annotations

import pytest

pytest.importorskip("google.protobuf")


def _sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_minirt_roundtrip_properties():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sm = _sm()

    @settings(max_examples=60, deadline=None)
    @given(
        status=st.integers(-(2**31), 2**31 - 1),
        msg=st.text(max_size=40),
        value=st.integers(-(2**63), 2**63 - 1),
    )
    def check(status, msg, value):
        m = sm.StateResponseWithLongTypeVal(
            statusCode=status, errorMessage=msg, value=value
        )
        back = sm.StateResponseWithLongTypeVal()
        back.ParseFromString(m.SerializeToString())
        assert (back.statusCode, back.errorMessage, back.value) == (
            status, msg, value
        )

    check()


def test_minirt_repeated_and_nested_roundtrip():
    sm = _sm()
    m = sm.StateResponseWithMapIterator(
        statusCode=1,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"", value=b"\x00\xff" * 10),
        ],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(m.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == [
        (b"k1", b"v1"), (b"", b"\x00\xff" * 10)
    ]
    assert back.requireNextFetch is True


def test_minirt_jvm_cross_check_adversarial_scalars(spark):
    """JVM parse of our bytes + our parse of JVM bytes for the values most
    likely to expose varint bugs."""
    sm = _sm()
    jsm = spark._sc._jvm.org.apache.spark.sql.execution.streaming.state.StateMessage
    for v in (0, 1, -1, 127, 128, -128, 2**31 - 1, -(2**31),
              2**63 - 1, -(2**63)):
        ours = sm.StateResponseWithLongTypeVal(value=v, errorMessage="é☃")
        jm = jsm.StateResponseWithLongTypeVal.parseFrom(ours.SerializeToString())
        assert jm.getValue() == v
        assert jm.getErrorMessage() == "é☃"
        back = sm.StateResponseWithLongTypeVal()
        back.ParseFromString(bytes(jm.toByteArray()))
        assert back.value == v and back.errorMessage == "é☃"
