"""Descriptor pool: parses serialized FileDescriptorProtos via protoshim."""

from __future__ import annotations

from google.protobuf.descriptor import FileDescriptor


class DescriptorPool:
    def __init__(self):
        self._files: dict[str, FileDescriptor] = {}

    def AddSerializedFile(self, blob: bytes) -> FileDescriptor:
        from etl_demo_spark.protoshim.descriptor_parse import parse_file_descriptor

        schema = parse_file_descriptor(blob)
        fd = FileDescriptor(schema.name, schema)
        self._files[schema.name] = fd
        return fd


_DEFAULT = DescriptorPool()


def Default() -> DescriptorPool:
    return _DEFAULT
