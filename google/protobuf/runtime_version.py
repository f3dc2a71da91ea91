"""Runtime-version gate: the shim accepts any generated code version.

The real runtime refuses gencode newer than itself; this shim implements
the descriptor subset the StateMessage schema needs and parses the
descriptor at runtime, so the gencode version is immaterial — validation
is a no-op by design, not an oversight."""

from __future__ import annotations

import enum


class Domain(enum.Enum):
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


class VersionError(Exception):
    pass


def ValidateProtobufRuntimeVersion(
    gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location
) -> None:
    return None
