# internal package of the repo-local protobuf shim (see ../__init__.py)
