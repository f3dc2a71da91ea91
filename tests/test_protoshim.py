"""Protobuf shim (etl_demo_spark/protoshim + google/ façade): wire-format
vectors computed by hand from the public spec, descriptor parsing of the
real StateMessage blob, and message semantics the PySpark state client
relies on. The end-to-end proof is the transformWithState v2 streaming
test (test_streaming.py) + the oracled `stream_user_type_profile` query;
these pin the pieces."""

from __future__ import annotations

import pytest

from etl_demo_spark.protoshim import wire
from etl_demo_spark.protoshim.descriptor_parse import (
    TYPE_BYTES,
    TYPE_INT32,
    TYPE_STRING,
    parse_file_descriptor,
)


def test_varint_vectors():
    # protobuf.dev/programming-guides/encoding reference values
    assert wire.encode_varint(0) == b"\x00"
    assert wire.encode_varint(1) == b"\x01"
    assert wire.encode_varint(127) == b"\x7f"
    assert wire.encode_varint(128) == b"\x80\x01"
    assert wire.encode_varint(300) == b"\xac\x02"
    # negative int64: two's complement, always 10 bytes
    assert wire.encode_varint(-1) == b"\xff" * 9 + b"\x01"
    for v in (0, 1, 127, 128, 300, 2**35, -1, -(2**31)):
        enc = wire.encode_varint(v)
        dec, pos = wire.decode_varint(enc, 0)
        assert pos == len(enc)
        assert wire.varint_to_signed(dec) == v


def test_tag_and_len_delimited():
    # field 1, varint 150 → 08 96 01 (the spec's canonical example)
    assert wire.encode_varint_field(1, 150) == b"\x08\x96\x01"
    # field 2, string "testing" → 12 07 74 65 73 74 69 6e 67
    assert wire.encode_len_delimited(2, b"testing") == b"\x12\x07testing"


def test_unknown_fields_are_skipped():
    buf = (
        wire.encode_varint_field(99, 7)  # unknown varint
        + wire.encode_len_delimited(98, b"zz")  # unknown bytes
        + wire.encode_varint_field(1, 42)
    )
    seen = [(n, v) for n, wt, v, _ in wire.iter_fields(buf)]
    assert (1, 42) in seen and len(seen) == 3


def test_parse_real_statemessage_descriptor():
    import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401 — force shim load
    import re
    from pathlib import Path

    src = Path(
        __import__("pyspark").__file__
    ).parent / "sql" / "streaming" / "proto" / "StateMessage_pb2.py"
    m = re.search(rb"AddSerializedFile\(\s*(b'.*?')\n\)", src.read_bytes(), re.S)
    blob = eval(m.group(1))  # the embedded serialized FileDescriptorProto
    schema = parse_file_descriptor(blob)
    pkg = "org.apache.spark.sql.execution.streaming.state"
    assert f"{pkg}.StateRequest" in schema.messages
    resp = schema.messages[f"{pkg}.StateResponse"]
    fields = {f.name: f for f in resp.fields}
    assert fields["statusCode"].type == TYPE_INT32
    assert fields["errorMessage"].type == TYPE_STRING
    assert fields["value"].type == TYPE_BYTES
    hs = schema.enums[f"{pkg}.HandleState"]
    assert ("PRE_INIT", 0) in hs.values and ("CLOSED", 5) in hs.values
    # oneof membership drives presence semantics
    req = schema.messages[f"{pkg}.StateRequest"]
    assert req.oneofs == ["method"]
    assert all(
        f.oneof_index == 0 for f in req.fields if f.name != "version"
    )


def test_message_semantics_via_generated_module():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    # canonical client handshake message, wire bytes checked by hand:
    # 08 02 (version=2) 12 04 (oneof msg, 4 bytes) 0a 02 (setHandleState)
    # 08 00 (state=PRE_INIT — explicit default, wire-legal proto3)
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.HandleState.PRE_INIT)
        ),
    )
    assert req.SerializeToString() == bytes.fromhex("080212040a020800")

    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.version == 2
    assert back.WhichOneof("method") == "statefulProcessorCall"
    assert back.statefulProcessorCall.setHandleState.state == 0

    # oneof: setting one member clears the others
    call = sm.ValueStateCall(stateName="s", get=sm.Get())
    assert call.WhichOneof("method") == "get"
    call.clear = sm.Clear()
    assert call.WhichOneof("method") == "clear"
    assert not call.HasField("get")

    # repeated bytes + bool on a response, fields out of order
    payload = (
        wire.encode_len_delimited(3, b"a")
        + wire.encode_varint_field(4, 1)
        + wire.encode_len_delimited(3, b"b")
        + wire.encode_varint_field(1, 0)
    )
    lg = sm.StateResponseWithListGet()
    lg.ParseFromString(payload)
    assert lg.value == [b"a", b"b"]
    assert lg.requireNextFetch is True and lg.statusCode == 0

    # unset scalar/message defaults
    fresh = sm.StateResponse()
    assert fresh.statusCode == 0 and fresh.errorMessage == "" and fresh.value == b""
    assert sm.StateRequest().WhichOneof("method") is None

    # unknown kwarg must fail loudly, like real generated classes
    with pytest.raises(TypeError):
        sm.StateRequest(nonexistent=1)

    # negative int64 round trip (timer timestamps can be -1 sentinels)
    ti = sm.TimerInfo(timestampMs=-1)
    back2 = sm.TimerInfo()
    back2.ParseFromString(ti.SerializeToString())
    assert back2.timestampMs == -1


def test_detached_default_submessage_is_frozen():
    """Mutating an unset sub-message's detached default must raise — real
    protobuf auto-vivifies there, and silently discarding the write (the
    naive shim behavior) would make that idiom a no-op."""
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    req = sm.StateRequest()
    with pytest.raises(AttributeError, match="detached default"):
        req.statefulProcessorCall.setHandleState = sm.SetHandleState(state=1)
    # reads on the detached default still work (protobuf semantics)
    assert req.statefulProcessorCall.setHandleState.state == 0


def test_frozen_default_repeated_and_parse_guards():
    """The frozen-default protections must cover every lost-write path:
    repeated fields hand out an immutable empty view, ParseFromString
    raises — while a default ASSIGNED to a parent becomes a real message
    (unfrozen) exactly as the documented reference-assignment semantics
    require."""
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    req = sm.StateResponseWithListGet()
    detached = sm.StateRequest().statefulProcessorCall  # frozen default
    with pytest.raises(AttributeError):
        detached.ParseFromString(b"")
    lg = sm.StateResponseWithTimer()
    frozen_parent = sm.StateRequest()
    # repeated field of a frozen default: immutable view, never a cached list
    frozen_timer_holder = sm.StateResponseWithTimer()
    object.__setattr__(frozen_timer_holder, "_frozen", True)
    assert frozen_timer_holder.timer == ()
    # assignment unfreezes: the assigned sub-message is mutable and real
    call = sm.StatefulProcessorCall().setHandleState  # frozen default
    parent = sm.StatefulProcessorCall()
    parent.setHandleState = call
    parent.setHandleState.state = 2  # must not raise
    assert parent.setHandleState.state == 2
    assert req.value == []  # unfrozen instance keeps the appendable list
