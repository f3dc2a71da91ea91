# Namespace shim — see google/protobuf/__init__.py. Kept an explicit
# package (not a namespace package) so the executor zip ships it intact.
