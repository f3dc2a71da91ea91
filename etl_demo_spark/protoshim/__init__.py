"""Minimal pure-Python protobuf runtime (wire format + descriptor-driven
message classes) — just enough to run PySpark's transformWithState v2
worker protocol in environments without the ``google.protobuf`` wheel.

Why this exists: the v2 stateful API's Python worker talks to the JVM
state server in protobuf messages (``pyspark/sql/streaming/proto/
StateMessage_pb2.py``). The generated module needs only four runtime
entry points (``descriptor_pool.Default().AddSerializedFile``, the two
``internal.builder`` calls, ``runtime_version.Validate…``), and the
StateMessage schema uses a narrow slice of proto3: varint scalars
(int32/int64/bool/enum), length-delimited strings/bytes, singular
message fields (mostly in oneofs), and a few repeated fields. This
package implements exactly that slice from the public wire-format spec
(https://protobuf.dev/programming-guides/encoding/):

* ``wire`` — varint/tag/field primitives;
* ``descriptor_parse`` — parses the serialized ``FileDescriptorProto``
  blob embedded in any ``*_pb2.py`` (the blob itself is a protobuf
  message; its schema is the public ``descriptor.proto``);
* ``messages`` — builds message classes (SerializeToString /
  ParseFromString / attribute access / enum namespaces) from the parsed
  descriptor.

The ``google/`` package at the repo root is a façade exposing these
under the module names generated code imports. NOT a general protobuf
implementation: no groups, no packed repeated scalars (proto3 packs
repeated VARINT scalars — StateMessage has repeated bytes/message only),
no fixed32/64, no floats, no maps, no extensions, no text format. The
parser SKIPS unknown fields (forward-compatible reads) and raises on
wire types it cannot skip correctly.
"""
