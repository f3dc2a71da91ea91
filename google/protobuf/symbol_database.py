"""Symbol database stub: generated modules call Default() and (rarely)
register classes; nothing in the StateMessage path reads it back."""

from __future__ import annotations


class SymbolDatabase:
    def RegisterMessage(self, *a, **k):
        return None

    def RegisterFileDescriptor(self, *a, **k):
        return None


_DEFAULT = SymbolDatabase()


def Default() -> SymbolDatabase:
    return _DEFAULT
