"""miniproto (vendor/pyshim) wire-format conformance.

Three layers of oracle, none of which is miniproto testing itself:
  1. golden byte vectors from the protobuf encoding spec
     (https://protobuf.dev/programming-guides/encoding/ examples);
  2. the JVM's Java-protobuf parser (shipped inside spark-sql) parsing
     miniproto-serialized StateMessage requests and re-serializing them
     byte-identically;
  3. the real end-to-end state-v2 drain (test_streaming.
     test_state_v2_semantics) where the state server consumes the wire.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_invoice_stream_analysis_spark.vendor.protobuf_shim import (  # noqa: E402
    install,
)

install()

from google.protobuf import miniproto as mp  # noqa: E402


def _msg_desc(fields):
    """Hand-build a MessageDesc: fields = [(name, number, type, repeated)]."""
    d = mp.MessageDesc()
    d.name = "T"
    d.full_name = "t.T"
    for name, number, ftype, rep in fields:
        f = mp.FieldDesc()
        f.name, f.number, f.type, f.repeated = name, number, ftype, rep
        d.fields.append(f)
        d.fields_by_name[name] = f
        d.fields_by_number[number] = f
    return d


def _cls(fields):
    return mp.MessageFactory().class_for(_msg_desc(fields))


def test_golden_vectors_from_encoding_spec():
    # protobuf docs: message Test1 { int32 a = 1; } with a=150 -> 08 96 01
    T1 = _cls([("a", 1, mp.TYPE_INT32, False)])
    assert T1(a=150).SerializeToString() == bytes.fromhex("089601")
    # message Test2 { string b = 2; } with b="testing" -> 12 07 74..67
    T2 = _cls([("b", 2, mp.TYPE_STRING, False)])
    assert T2(b="testing").SerializeToString() == bytes.fromhex(
        "120774657374696e67"
    )
    # message Test3 { Test1 c = 3; } with c.a=150 -> 1a 03 08 96 01
    d3 = _msg_desc([("c", 3, mp.TYPE_MESSAGE, False)])
    d3.fields_by_name["c"].message_desc = _msg_desc(
        [("a", 1, mp.TYPE_INT32, False)]
    )
    T3 = mp.MessageFactory().class_for(d3)
    m = T3()
    m.c.a = 150
    assert m.SerializeToString() == bytes.fromhex("1a03089601")


def test_negative_int_is_ten_byte_twos_complement():
    T = _cls([("a", 1, mp.TYPE_INT32, False)])
    raw = T(a=-2).SerializeToString()
    assert raw == bytes.fromhex("08feffffffffffffffff01")
    back = T()
    back.ParseFromString(raw)
    assert back.a == -2


def test_zigzag_sint():
    T = _cls([("s", 1, mp.TYPE_SINT32, False)])
    # spec: 0->0, -1->1, 1->2, -2->3
    for val, enc in [(0, "00"), (-1, "01"), (1, "02"), (-2, "03")]:
        got = T(s=val).SerializeToString()
        assert got == bytes.fromhex("08" + enc), val
        b = T()
        b.ParseFromString(got)
        assert b.s == val


def test_packed_and_unpacked_repeated_decode():
    T = _cls([("r", 4, mp.TYPE_INT32, True)])
    # packed: tag 4/LEN, payload = varints 3,270,86942 (spec example)
    packed = bytes.fromhex("2206038e029ea705")
    m = T()
    m.ParseFromString(packed)
    assert list(m.r) == [3, 270, 86942]
    # unpacked: three separate varint tags decode identically
    unpacked = bytes.fromhex("2003" "208e02" "209ea705")
    m2 = T()
    m2.ParseFromString(unpacked)
    assert list(m2.r) == [3, 270, 86942]


def test_unknown_fields_are_skipped():
    T = _cls([("a", 1, mp.TYPE_INT32, False)])
    # field 9 varint + field 10 LEN + our field 1
    raw = bytes.fromhex("48ff01" "52026869" "089601")
    m = T()
    m.ParseFromString(raw)
    assert m.a == 150


def test_oneof_last_write_wins():
    d = _msg_desc(
        [("x", 1, mp.TYPE_INT32, False), ("y", 2, mp.TYPE_STRING, False)]
    )
    o = mp.OneofDesc("choice")
    o.fields = d.fields
    d.oneofs = [o]
    for f in d.fields:
        f.oneof_index = 0
    T = mp.MessageFactory().class_for(d)
    m = T(x=7)
    assert m.WhichOneof("choice") == "x"
    m.y = "hi"
    assert m.WhichOneof("choice") == "y"
    assert not m.HasField("x")
    raw = m.SerializeToString()
    assert raw == bytes.fromhex("12026869")  # only y on the wire


def test_statemessage_pb2_loads_through_shim():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    # enum constants hoisted to module scope (proto3 open enums)
    assert (sm.PRE_INIT, sm.CREATED, sm.CLOSED) == (0, 1, 5)
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CLOSED)
        )
    )
    raw = req.SerializeToString()
    assert raw == bytes.fromhex("12040a020805")
    back = sm.StateRequest()
    back.ParseFromString(raw)
    assert back.statefulProcessorCall.setHandleState.state == sm.CLOSED


@pytest.mark.parametrize("case", ["handle", "ttl", "timer", "implicit_key"])
def test_jvm_java_protobuf_reserializes_identically(spark, case):
    """The real interop oracle short of a drain: Java protobuf (inside
    spark-sql) parses miniproto bytes and re-serializes them to the
    IDENTICAL bytes. Values are non-zero so proto3 implicit presence
    can't drop fields on the Java side."""
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    if case == "handle":
        msg = sm.StateRequest(
            statefulProcessorCall=sm.StatefulProcessorCall(
                setHandleState=sm.SetHandleState(state=sm.CLOSED)
            )
        )
    elif case == "ttl":
        cmd = sm.StateCallCommand(stateName="invoice", schema='{"a":1}')
        cmd.ttl.durationMs = 60000
        msg = sm.StateRequest(
            statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd)
        )
    elif case == "timer":
        msg = sm.StateRequest(
            timerRequest=sm.TimerRequest(
                expiryTimerRequest=sm.ExpiryTimerRequest(
                    expiryTimestampMs=1723672800123, iteratorId="it-1"
                )
            )
        )
    else:
        msg = sm.StateRequest(
            implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
                setImplicitKey=sm.SetImplicitKey(key=b"\x01\x02\xff")
            )
        )
    raw = msg.SerializeToString()
    jcls = getattr(
        spark._jvm, "org.apache.spark.sql.execution.streaming.state.StateMessage"
    ).StateRequest
    jmsg = jcls.parseFrom(raw)
    assert bytes(jmsg.toByteArray()) == raw


def test_jvm_fuzz_value_state_calls(spark):
    """Property-style sweep: many ValueStateCall shapes (varied state
    names incl. unicode, every oneof member, boundary ints) serialized
    by miniproto → parsed by Java protobuf → byte-identical
    re-serialization. Catches varint-boundary and UTF-8 length bugs a
    handful of fixed cases could miss."""
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    jcls = getattr(
        spark._jvm, "org.apache.spark.sql.execution.streaming.state.StateMessage"
    ).StateRequest

    names = ["a", "x" * 127, "x" * 128, "état-ключ-状態", "s p a c e"]
    payloads = [b"\x00", b"\x80" * 16, bytes(range(256)), b"v" * 300]
    msgs = []
    for i, name in enumerate(names):
        msgs.append(
            sm.StateRequest(
                stateVariableRequest=sm.StateVariableRequest(
                    valueStateCall=sm.ValueStateCall(
                        stateName=name, get=sm.Get()
                    )
                )
            )
        )
        msgs.append(
            sm.StateRequest(
                stateVariableRequest=sm.StateVariableRequest(
                    valueStateCall=sm.ValueStateCall(
                        stateName=name,
                        valueStateUpdate=sm.ValueStateUpdate(
                            value=payloads[i % len(payloads)]
                        ),
                    )
                )
            )
        )
    # varint boundaries through a timer registration
    for ts in [1, 127, 128, 16383, 16384, 2**31 - 1, 2**31, 2**53]:
        msgs.append(
            sm.StateRequest(
                statefulProcessorCall=sm.StatefulProcessorCall(
                    timerStateCall=sm.TimerStateCallCommand(
                        register=sm.RegisterTimer(expiryTimestampMs=ts)
                    )
                )
            )
        )
    for msg in msgs:
        raw = msg.SerializeToString()
        assert bytes(jcls.parseFrom(raw).toByteArray()) == raw


def test_repeated_append_idiom_serializes():
    """Round-4 review fix: the standard protobuf idiom for repeated
    fields is append/extend on the attribute (assignment raises in the
    real library) — a list populated that way must reach the wire, and
    a sub-message whose only content is an appended repeated field
    must serialize through its parent."""
    T = _cls([("r", 4, mp.TYPE_INT32, True)])
    m = T()
    m.r.append(3)
    m.r.extend([270, 86942])
    back = T()
    back.ParseFromString(m.SerializeToString())
    assert list(back.r) == [3, 270, 86942]
    # nested: parent -> child with only an appended repeated field
    child_desc = _msg_desc([("v", 1, mp.TYPE_BYTES, True)])
    parent_desc = _msg_desc([("c", 2, mp.TYPE_MESSAGE, False)])
    parent_desc.fields_by_name["c"].message_desc = child_desc
    P = mp.MessageFactory().class_for(parent_desc)
    p = P()
    p.c.v.append(b"xy")
    pb = P()
    pb.ParseFromString(p.SerializeToString())
    assert list(pb.c.v) == [b"xy"]
    # and an untouched empty repeated field still serializes to nothing
    assert T().SerializeToString() == b""


def test_shim_google_namespace_extends_not_shadows(tmp_path):
    """Round-4 review fix: installing the shim must not hide sibling
    google.* packages that live elsewhere on sys.path (google.auth
    etc. in environments that have them but lack protobuf)."""
    import importlib
    import sys

    sib_root = tmp_path / "siblings"
    gdir = sib_root / "google" / "fakecloudpkg"
    gdir.mkdir(parents=True)
    (sib_root / "google" / "__init__.py").write_text(
        "from pkgutil import extend_path\n"
        "__path__ = extend_path(__path__, __name__)\n"
    )
    (gdir / "__init__.py").write_text("MARKER = 'sibling-ok'\n")
    sys.path.insert(0, str(sib_root))
    try:
        for mod in [m for m in list(sys.modules) if m.split(".")[0] == "google"]:
            del sys.modules[mod]
        install()  # shim dir goes to sys.path[0]
        import google.protobuf  # noqa: F401  (shim serves this)
        fake = importlib.import_module("google.fakecloudpkg")
        assert fake.MARKER == "sibling-ok"
    finally:
        sys.path.remove(str(sib_root))
        for mod in [m for m in list(sys.modules) if "fakecloudpkg" in m]:
            del sys.modules[mod]
