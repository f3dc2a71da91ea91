"""Descriptor-driven message classes over the wire primitives.

Semantics implemented (the slice StateMessage + its client use):

* constructor kwargs, attribute get/set, ``CopyFrom``-free reference
  assignment for sub-messages;
* ``SerializeToString`` — fields in field-number order; singular fields
  emit when explicitly set OR (for implicit-presence scalars) non-default
  — emitting an explicitly-set default scalar is wire-legal proto3 and
  indistinguishable to the receiver;
* ``ParseFromString`` — any field order, unknown fields skipped,
  repeated appended, signed interpretation for int32/int64;
* ``HasField`` / ``WhichOneof`` for oneof & proto3-optional members;
* enum namespaces (``HandleState.PRE_INIT``) whose values are plain ints,
  exactly how generated code uses them.
"""

from __future__ import annotations

from etl_demo_spark.protoshim import wire
from etl_demo_spark.protoshim.descriptor_parse import (
    TYPE_BOOL,
    TYPE_BYTES,
    TYPE_ENUM,
    TYPE_INT32,
    TYPE_INT64,
    TYPE_MESSAGE,
    TYPE_STRING,
    FieldSchema,
    FileSchema,
    MessageSchema,
)

_SCALAR_DEFAULTS = {
    TYPE_INT64: 0,
    TYPE_INT32: 0,
    TYPE_BOOL: False,
    TYPE_STRING: "",
    TYPE_BYTES: b"",
    TYPE_ENUM: 0,
}


class ShimMessage:
    """Base class; concrete classes carry ``_schema``, ``_pool``, and the
    precomputed per-class lookups (``_by_name``/``_by_number``/
    ``_by_number_sorted`` — built once in build_classes: attribute access
    and parsing sit on the state-server RPC hot path, once per state
    operation per key per micro-batch, so per-access dict rebuilding
    would be pure overhead)."""

    _schema: MessageSchema
    _pool: dict[str, type]
    _by_name: dict[str, FieldSchema]
    _by_number: dict[int, FieldSchema]
    _by_number_sorted: list[FieldSchema]
    __slots__ = ("_values", "_present", "_frozen")

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_present", set())
        object.__setattr__(self, "_frozen", False)
        for k, v in kwargs.items():
            if k not in self._by_name:
                raise TypeError(
                    f"{self._schema.name} has no field {k!r}"
                )
            if v is None:
                continue  # protobuf kwarg None == unset
            setattr(self, k, v)

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str):
        # __slots__ members resolve normally; only schema fields land here
        f = self._by_name.get(name)
        if f is None:
            raise AttributeError(f"{self._schema.name} has no field {name!r}")
        values = object.__getattribute__(self, "_values")
        if name in values:
            return values[name]
        if f.repeated:
            if object.__getattribute__(self, "_frozen"):
                # appending to a detached default's repeated field would
                # be a silently-discarded write — hand out an immutable
                # empty view instead of caching a throwaway list
                return ()
            values[name] = []
            return values[name]
        if f.type == TYPE_MESSAGE:
            # detached READ-ONLY default: real protobuf auto-vivifies on
            # nested mutation (msg.sub.field = x attaches sub); returning
            # a silently-discarded fresh instance would make that idiom a
            # no-op, so the default is frozen and mutation raises loudly
            inst = self._pool[f.type_name]()
            object.__setattr__(inst, "_frozen", True)
            return inst
        return _SCALAR_DEFAULTS[f.type]

    def __setattr__(self, name: str, value):
        if object.__getattribute__(self, "_frozen"):
            raise AttributeError(
                f"{self._schema.name}: cannot mutate an unset sub-message's "
                "detached default (protobuf auto-vivification is not "
                "implemented in protoshim) — build the sub-message and "
                "assign it to the parent field instead"
            )
        f = self._by_name.get(name)
        if f is None:
            raise AttributeError(f"{self._schema.name} has no field {name!r}")
        f_checked = _coerce(f, value, self._pool)
        values = object.__getattribute__(self, "_values")
        present = object.__getattribute__(self, "_present")
        values[name] = f_checked
        present.add(name)
        # oneof: setting one member clears its siblings
        if f.oneof_index is not None:
            for other in self._schema.fields:
                if (
                    other.oneof_index == f.oneof_index
                    and other.name != name
                    and other.name in present
                ):
                    present.discard(other.name)
                    values.pop(other.name, None)

    # -- protobuf API surface ----------------------------------------------
    def HasField(self, name: str) -> bool:
        return name in object.__getattribute__(self, "_present")

    def WhichOneof(self, oneof_name: str):
        try:
            idx = self._schema.oneofs.index(oneof_name)
        except ValueError:
            raise ValueError(
                f"{self._schema.name} has no oneof {oneof_name!r}"
            ) from None
        present = object.__getattribute__(self, "_present")
        for f in self._schema.fields:
            if f.oneof_index == idx and f.name in present:
                return f.name
        return None

    def SerializeToString(self) -> bytes:
        present = object.__getattribute__(self, "_present")
        values = object.__getattribute__(self, "_values")
        out = bytearray()
        for f in self._by_number_sorted:
            if f.repeated:
                for item in values.get(f.name, ()):
                    out += _encode_one(f, item)
                continue
            if f.name not in present:
                continue
            out += _encode_one(f, values[f.name])
        return bytes(out)

    def ParseFromString(self, data: bytes) -> int:
        if object.__getattribute__(self, "_frozen"):
            raise AttributeError(
                f"{self._schema.name}: cannot parse into an unset "
                "sub-message's detached default — parse into a fresh "
                "instance and assign it"
            )
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_present", set())
        by_number = self._by_number
        values = object.__getattribute__(self, "_values")
        present = object.__getattribute__(self, "_present")
        for num, wt, val, _ in wire.iter_fields(data):
            f = by_number.get(num)
            if f is None or val is None:
                continue  # unknown or fixed-width: skipped
            decoded = _decode_one(f, wt, val, self._pool)
            if decoded is _SKIP:
                continue
            if f.repeated:
                values.setdefault(f.name, []).append(decoded)
            else:
                values[f.name] = decoded
            present.add(f.name)
        return len(data)

    def __repr__(self) -> str:
        values = object.__getattribute__(self, "_values")
        inner = ", ".join(f"{k}={v!r}" for k, v in values.items())
        return f"{self._schema.name.rsplit('.', 1)[-1]}({inner})"

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, ShimMessage)
            and self._schema.name == other._schema.name
            and self.SerializeToString() == other.SerializeToString()
        )

    def __hash__(self):  # pragma: no cover - parity with messages being unhashable-by-value
        return id(self)


_SKIP = object()


def _coerce(f: FieldSchema, value, pool):
    if f.repeated:
        return [_coerce_single(f, v, pool) for v in value]
    return _coerce_single(f, value, pool)


def _coerce_single(f: FieldSchema, value, pool):
    if f.type == TYPE_MESSAGE:
        if not isinstance(value, ShimMessage) or value._schema.name != f.type_name:
            raise TypeError(
                f"field {f.name} expects {f.type_name}, got {type(value).__name__}"
            )
        # a detached default becomes a REAL message once assigned to a
        # parent field (each default access mints a fresh instance, so
        # unfreezing never leaks mutability to other readers)
        object.__setattr__(value, "_frozen", False)
        return value
    if f.type in (TYPE_INT32, TYPE_INT64, TYPE_ENUM):
        return int(value)
    if f.type == TYPE_BOOL:
        return bool(value)
    if f.type == TYPE_STRING:
        if isinstance(value, bytes):
            return value.decode()
        return str(value)
    if f.type == TYPE_BYTES:
        return bytes(value)
    raise TypeError(f"unsupported field type {f.type}")


def _encode_one(f: FieldSchema, value) -> bytes:
    if f.type == TYPE_MESSAGE:
        return wire.encode_len_delimited(f.number, value.SerializeToString())
    if f.type == TYPE_STRING:
        return wire.encode_len_delimited(f.number, value.encode())
    if f.type == TYPE_BYTES:
        return wire.encode_len_delimited(f.number, value)
    if f.type == TYPE_BOOL:
        return wire.encode_varint_field(f.number, 1 if value else 0)
    if f.type in (TYPE_INT32, TYPE_INT64, TYPE_ENUM):
        return wire.encode_varint_field(f.number, value)
    raise TypeError(f"unsupported field type {f.type}")


def _decode_one(f: FieldSchema, wt: int, val, pool):
    if f.type == TYPE_MESSAGE and wt == wire.WT_LEN:
        msg = pool[f.type_name]()
        msg.ParseFromString(val)
        return msg
    if f.type == TYPE_STRING and wt == wire.WT_LEN:
        return val.decode()
    if f.type == TYPE_BYTES and wt == wire.WT_LEN:
        return bytes(val)
    if wt == wire.WT_VARINT:
        if f.type == TYPE_BOOL:
            return bool(val)
        if f.type in (TYPE_INT32, TYPE_INT64, TYPE_ENUM):
            return wire.varint_to_signed(val)
    return _SKIP  # wire type mismatch: ignore rather than corrupt


class EnumNamespace:
    """`HandleState.PRE_INIT`-style namespace; values are plain ints, and
    calling it like protobuf's EnumTypeWrapper (Name/Value) also works."""

    def __init__(self, name: str, values: list[tuple[str, int]]):
        self._name = name
        self._by_name = dict(values)
        self._by_value = {v: k for k, v in values}
        for k, v in values:
            setattr(self, k, v)

    def Name(self, number: int) -> str:
        return self._by_value[number]

    def Value(self, name: str) -> int:
        return self._by_name[name]


def build_classes(schema: FileSchema) -> dict[str, object]:
    """fullname → message class / enum namespace, with a shared pool so
    message-typed fields resolve across the file."""
    pool: dict[str, type] = {}
    out: dict[str, object] = {}
    for fullname, m in schema.messages.items():
        cls = type(
            fullname.rsplit(".", 1)[-1],
            (ShimMessage,),
            {
                "_schema": m,
                "_pool": pool,
                "_by_name": {f.name: f for f in m.fields},
                "_by_number": {f.number: f for f in m.fields},
                "_by_number_sorted": sorted(m.fields, key=lambda x: x.number),
                "__slots__": (),
            },
        )
        pool[fullname] = cls
        out[fullname] = cls
    for fullname, e in schema.enums.items():
        out[fullname] = EnumNamespace(fullname, e.values)
    return out
