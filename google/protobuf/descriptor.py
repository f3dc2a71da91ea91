"""Descriptor objects for the shim.

Generated modules import this module (``from google.protobuf import
descriptor as _descriptor``) but, for the builder path the StateMessage
module takes, only need the resulting objects to accept attribute
assignment (``_STATEREQUEST._serialized_start = …``). The availability
probe in etl_demo_spark.streaming.stateful imports this module too."""

from __future__ import annotations


class _AssignAnything:
    """Placeholder descriptor: accepts any attribute set/get."""

    def __init__(self, name: str = ""):
        self.name = name

    def __repr__(self) -> str:
        return f"<shim descriptor {self.name}>"


class Descriptor(_AssignAnything):
    pass


class EnumDescriptor(_AssignAnything):
    pass


class FieldDescriptor(_AssignAnything):
    pass


class FileDescriptor(_AssignAnything):
    """Returned by descriptor_pool.Default().AddSerializedFile: carries
    the parsed FileSchema for the builder plus the attribute-assignment
    tolerance generated module tails rely on."""

    def __init__(self, name: str = "", schema=None):
        super().__init__(name)
        self.schema = schema
        self._options = None

    def SetOptions(self, *a, **k):  # generated code may call this
        return None


# Generated modules branch on this to decide whether to hand-patch
# serialized_start/end offsets; the pure-Python (False) branch is the one
# our builder supports.
_USE_C_DESCRIPTORS = False
