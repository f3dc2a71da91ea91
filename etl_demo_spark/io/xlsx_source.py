"""Excel (.xlsx) as a Spark READ source (Python DataSource API, Spark 4).

The reference ships one binary report artifact, ``output/top_clients.xlsx``
(`etl_weekly_trades.py:214-217` writes it with openpyxl). Our engine
writes that format natively (io/sinks.py:write_excel → io/xlsx.py) — this
module closes the read loop so a user of the reference can load their
accumulated report workbooks straight into a DataFrame:

    spark.read.format("xlsx").load("reports/*.xlsx")

Shape: report workbooks are driver-tail artifacts (top-K rows each), so
the right parallel unit is ONE InputPartition per FILE — a directory of
weekly reports scans with one task per workbook, and a single workbook is
by construction tiny. The sheet parser is the repo's own pure-stdlib
SpreadsheetML reader (io/xlsx.py:read_xlsx_values), which handles both
this engine's writer output and openpyxl-style files (inline and shared
strings, numbers, blanks).

Schema: header row of the FIRST file (sorted order) names the columns;
per-column types are inferred from that file's data cells — DOUBLE if
every non-blank cell parsed as a number, else STRING (LONG is not split
out: SpreadsheetML stores all numbers as doubles, so a long column would
fabricate precision the format doesn't carry). All files must share the
header; a mismatch raises with the offending path rather than silently
misaligning columns.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _expand(path_opt: str) -> list[str]:
    """path option → sorted file list (file, glob, or directory)."""
    if os.path.isdir(path_opt):
        paths = glob.glob(os.path.join(path_opt, "*.xlsx"))
    else:
        paths = glob.glob(path_opt) if any(c in path_opt for c in "*?[") else [path_opt]
    paths = sorted(p for p in paths if os.path.exists(p))
    if not paths:
        raise FileNotFoundError(f"xlsx source: no files match {path_opt!r}")
    return paths


def _is_number(v: object) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _infer_schema(path: str) -> T.StructType:
    from etl_demo_spark.io.xlsx import read_xlsx_values

    header, rows = read_xlsx_values(path)
    fields = []
    for i, name in enumerate(header):
        cells = [r[i] for r in rows if i < len(r) and r[i] not in (None, "")]
        numeric = bool(cells) and all(_is_number(c) for c in cells)
        fields.append(
            T.StructField(str(name), T.DoubleType() if numeric else T.StringType())
        )
    return T.StructType(fields)


class XlsxReader(DataSourceReader):
    def __init__(self, options: dict, schema: T.StructType):
        self.paths = _expand(options["path"])
        self.schema = schema

    def partitions(self) -> list[_FilePartition]:
        return [_FilePartition(p) for p in self.paths]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        from etl_demo_spark.io.xlsx import read_xlsx_values

        header, rows = read_xlsx_values(partition.path)
        expected = [f.name for f in self.schema.fields]
        if [str(h) for h in header] != expected:
            raise ValueError(
                f"xlsx source: {partition.path} header {header!r} does not "
                f"match the schema header {expected!r}"
            )
        want_double = [isinstance(f.dataType, T.DoubleType) for f in self.schema.fields]
        n = len(expected)
        for ridx, r in enumerate(rows, start=2):  # row 1 = header
            out = []
            for i in range(n):
                v = r[i] if i < len(r) else None
                if v in (None, ""):
                    out.append(None)
                elif want_double[i]:
                    # type drift across workbooks must SIGNAL, exactly like
                    # header drift does — a text cell in a column the first
                    # file inferred as DOUBLE silently becoming NULL is data
                    # loss with no trace
                    if not _is_number(v):
                        raise ValueError(
                            f"xlsx source: {partition.path} row {ridx} column "
                            f"{expected[i]!r}: non-numeric value {v!r} in a "
                            f"column inferred as DOUBLE from the first file; "
                            f"fix the workbook or load with an explicit "
                            f"all-STRING schema"
                        )
                    out.append(float(v))
                else:
                    out.append(str(v))
            yield tuple(out)


class XlsxDataSource(DataSource):
    """``spark.read.format("xlsx").option("path", p)`` / ``.load(p)``.

    ``path`` may be a file, a glob, or a directory of ``*.xlsx``.
    """

    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self) -> T.StructType:
        return _infer_schema(_expand(self.options["path"])[0])

    def reader(self, schema: T.StructType) -> XlsxReader:
        return XlsxReader(self.options, schema)


def register_xlsx_source(spark: Any) -> None:
    """Idempotent registration of the ``xlsx`` format on a session."""
    from etl_demo_spark.io.pyds import register_data_source

    register_data_source(spark, XlsxDataSource)  # by-value: see io/pyds.py
