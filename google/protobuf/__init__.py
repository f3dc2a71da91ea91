"""Repo-local ``google.protobuf`` FAÇADE over etl_demo_spark.protoshim.

This is NOT the protobuf distribution. It exposes exactly the module
surface a protoc-generated ``*_pb2.py`` touches at import time
(descriptor_pool.Default().AddSerializedFile, internal.builder's two
build calls, runtime_version validation, symbol_database stub), backed
by the minimal pure-Python wire/descriptor runtime in
``etl_demo_spark/protoshim``. It exists so PySpark's transformWithState
v2 worker protocol (``pyspark/sql/streaming/proto/StateMessage_pb2.py``)
can run in this container, where the real wheel cannot be installed.

If the real protobuf IS installed, it sits in site-packages and this
repo-root copy shadows it only when the repo root precedes site-packages
on sys.path; delete this directory in that environment (nothing in the
engine imports it directly — only the availability probe and pyspark's
generated module do).
"""

__version__ = "0.0.0-etl-demo-spark-shim"
