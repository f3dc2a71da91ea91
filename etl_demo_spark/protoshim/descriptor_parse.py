"""Parse a serialized FileDescriptorProto into plain schema objects.

The blob a ``*_pb2.py`` embeds is itself a protobuf message whose schema
is the public ``descriptor.proto``. We decode just the parts needed to
build message classes: message names, fields (name/number/type/label/
type_name/oneof_index/proto3_optional), nested messages, enums.

Field numbers below are fixed by descriptor.proto (public, stable since
proto2):
  FileDescriptorProto: name=1, package=2, message_type=4, enum_type=5
  DescriptorProto:     name=1, field=2, nested_type=3, enum_type=4,
                       oneof_decl=8
  FieldDescriptorProto: name=1, number=3, label=4, type=5, type_name=6,
                        oneof_index=9, proto3_optional=17
  OneofDescriptorProto: name=1
  EnumDescriptorProto:  name=1, value=2
  EnumValueDescriptorProto: name=1, number=2
"""

from __future__ import annotations

from dataclasses import dataclass, field

from etl_demo_spark.protoshim.wire import WT_LEN, WT_VARINT, iter_fields

# FieldDescriptorProto.Type values (descriptor.proto enum)
TYPE_INT64 = 3
TYPE_INT32 = 5
TYPE_BOOL = 8
TYPE_STRING = 9
TYPE_MESSAGE = 11
TYPE_BYTES = 12
TYPE_ENUM = 14

LABEL_REPEATED = 3

SUPPORTED_TYPES = {
    TYPE_INT64,
    TYPE_INT32,
    TYPE_BOOL,
    TYPE_STRING,
    TYPE_MESSAGE,
    TYPE_BYTES,
    TYPE_ENUM,
}


@dataclass
class FieldSchema:
    name: str = ""
    number: int = 0
    label: int = 0
    type: int = 0
    type_name: str = ""  # fully-qualified ".pkg.Message" for message/enum
    oneof_index: int | None = None
    proto3_optional: bool = False

    @property
    def repeated(self) -> bool:
        return self.label == LABEL_REPEATED


@dataclass
class EnumSchema:
    name: str = ""
    values: list[tuple[str, int]] = field(default_factory=list)


@dataclass
class MessageSchema:
    name: str = ""  # fully qualified, no leading dot
    fields: list[FieldSchema] = field(default_factory=list)
    oneofs: list[str] = field(default_factory=list)


@dataclass
class FileSchema:
    name: str = ""
    package: str = ""
    messages: dict[str, MessageSchema] = field(default_factory=dict)
    enums: dict[str, EnumSchema] = field(default_factory=dict)


def _parse_field(buf: bytes) -> FieldSchema:
    f = FieldSchema()
    for num, wt, val, _ in iter_fields(buf):
        if num == 1 and wt == WT_LEN:
            f.name = val.decode()
        elif num == 3 and wt == WT_VARINT:
            f.number = val
        elif num == 4 and wt == WT_VARINT:
            f.label = val
        elif num == 5 and wt == WT_VARINT:
            f.type = val
        elif num == 6 and wt == WT_LEN:
            f.type_name = val.decode().lstrip(".")
        elif num == 9 and wt == WT_VARINT:
            f.oneof_index = val
        elif num == 17 and wt == WT_VARINT:
            f.proto3_optional = bool(val)
    return f


def _parse_enum(buf: bytes, prefix: str) -> EnumSchema:
    e = EnumSchema()
    for num, wt, val, _ in iter_fields(buf):
        if num == 1 and wt == WT_LEN:
            e.name = f"{prefix}.{val.decode()}" if prefix else val.decode()
        elif num == 2 and wt == WT_LEN:
            vname, vnum = "", 0
            for n2, w2, v2, _ in iter_fields(val):
                if n2 == 1 and w2 == WT_LEN:
                    vname = v2.decode()
                elif n2 == 2 and w2 == WT_VARINT:
                    vnum = v2
            e.values.append((vname, vnum))
    return e


def _parse_message(buf: bytes, prefix: str, out: FileSchema) -> None:
    m = MessageSchema()
    raw_nested: list[bytes] = []
    raw_enums: list[bytes] = []
    for num, wt, val, _ in iter_fields(buf):
        if num == 1 and wt == WT_LEN:
            m.name = f"{prefix}.{val.decode()}" if prefix else val.decode()
        elif num == 2 and wt == WT_LEN:
            m.fields.append(_parse_field(val))
        elif num == 3 and wt == WT_LEN:
            raw_nested.append(val)
        elif num == 4 and wt == WT_LEN:
            raw_enums.append(val)
        elif num == 8 and wt == WT_LEN:
            for n2, w2, v2, _ in iter_fields(val):
                if n2 == 1 and w2 == WT_LEN:
                    m.oneofs.append(v2.decode())
    out.messages[m.name] = m
    for raw in raw_nested:
        _parse_message(raw, m.name, out)
    for raw in raw_enums:
        e = _parse_enum(raw, m.name)
        out.enums[e.name] = e


def parse_file_descriptor(blob: bytes) -> FileSchema:
    out = FileSchema()
    raw_msgs: list[bytes] = []
    raw_enums: list[bytes] = []
    for num, wt, val, _ in iter_fields(blob):
        if num == 1 and wt == WT_LEN:
            out.name = val.decode()
        elif num == 2 and wt == WT_LEN:
            out.package = val.decode()
        elif num == 4 and wt == WT_LEN:
            raw_msgs.append(val)
        elif num == 5 and wt == WT_LEN:
            raw_enums.append(val)
    for raw in raw_msgs:
        _parse_message(raw, out.package, out)
    for raw in raw_enums:
        e = _parse_enum(raw, out.package)
        out.enums[e.name] = e
    for m in out.messages.values():
        for f in m.fields:
            if f.type not in SUPPORTED_TYPES:
                raise NotImplementedError(
                    f"protoshim: field {m.name}.{f.name} has unsupported "
                    f"type {f.type} — extend protoshim/messages.py"
                )
    return out
