"""Multi-table CATALOG: atomic cross-table commits and consistent
snapshots over manifested tables.

Single-table snapshot formats (and `io/manifest.py` so far) make each
TABLE atomic, but a pipeline that commits orders and its order_events
side table separately exposes readers to a torn state between the two
commits — the classic lakehouse gap that warehouses close with
multi-statement transactions. This module closes it with one more
pointer level, the same trick the manifest layer plays on directories:

* a catalog is a directory of versioned JSON documents, each pinning
  ``{table_name: {root, version}}`` for every member table;
* writers run their per-table DML first (each lands as a normal
  manifest commit — durable but NOT yet visible through the catalog),
  then publish ONE catalog version flipping all the pins together via
  the same create-exclusive CAS the manifests use. Concurrent catalog
  committers race the CAS; losers re-resolve and retry against the
  winner's pins (their per-table versions are still the newest — the
  retry just re-merges the pin map);
* readers resolve the catalog once and read every member table AT ITS
  PINNED VERSION (`read_manifested(version=…)`): all-or-nothing
  visibility, repeatable across tables for the lifetime of the
  snapshot object. A crash after the table commits but before the
  catalog publish leaves the catalog on the old pins — consistent,
  never torn; the orphaned table versions age out through normal
  per-table retention/GC.
* the catalog itself time-travels: `catalog_versions` + ``version=``
  give CROSS-TABLE time travel ("the whole schema as of commit 41"),
  which no single-table snapshot can offer.

Retention interplay: a catalog pin older than its table's
`_RETAIN`-version window can no longer be read — same contract as
single-table time travel, surfaced as a clear error. Pin lag is bounded
by publishing the catalog in the same job that runs the DML.

Scale: documents are O(tables) — trivially small next to the per-table
manifests; one extra read per snapshot resolution.
"""

from __future__ import annotations

import json
import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_demo_spark.io.manifest import (
    _RETAIN,
    _hadoop_fs,
    _list_manifest_versions,
    _load_doc,
    _publish_cas,
    _read_file,
    append_manifested,
    delete_where_manifested,
    manifest_versions,
    merge_upsert_manifested,
    read_manifested,
    update_where_manifested,
)

_CAT_DIR = "_catalog"
_MAX_RETRIES = 20


class CatalogConflict(RuntimeError):
    """The CAS publish lost ``_MAX_RETRIES`` consecutive races."""


def _cat_path(cat_root: str, version: int) -> str:
    return f"{cat_root.rstrip('/')}/{_CAT_DIR}/v{version:010d}.json"


def _cat_versions(fs, jvm, cat_root: str) -> list[int]:
    d = jvm.org.apache.hadoop.fs.Path(f"{cat_root.rstrip('/')}/{_CAT_DIR}")
    if not fs.exists(d):
        return []
    out = []
    for st in fs.listStatus(d):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _load_cat(fs, jvm, cat_root: str, version: int) -> dict:
    return json.loads(_read_file(fs, jvm, _cat_path(cat_root, version)).decode())


def _table_head(spark: SparkSession, root: str) -> int:
    fs, jvm = _hadoop_fs(spark, root)
    vs = _list_manifest_versions(fs, jvm, root)
    if not vs:
        raise ValueError(f"{root} is not a manifested table")
    return vs[-1]


def catalog_init(
    spark: SparkSession, cat_root: str, tables: dict[str, str]
) -> int:
    """Create catalog v1 pinning every member table's CURRENT manifest
    version. Idempotent-safe: an existing catalog is left untouched and
    its head version returned."""
    fs, jvm = _hadoop_fs(spark, cat_root)
    vs = _cat_versions(fs, jvm, cat_root)
    if vs:
        return vs[-1]
    doc = {
        "version": 1,
        "committed_at_ms": int(time.time() * 1000),
        "tables": {
            name: {"root": root.rstrip("/"), "version": _table_head(spark, root)}
            for name, root in tables.items()
        },
    }
    if not _publish_cas(
        fs, jvm, _cat_path(cat_root, 1), json.dumps(doc, indent=1).encode()
    ):
        return _cat_versions(fs, jvm, cat_root)[-1]  # concurrent init won
    return 1


def catalog_versions(spark: SparkSession, cat_root: str) -> list[int]:
    fs, jvm = _hadoop_fs(spark, cat_root)
    return _cat_versions(fs, jvm, cat_root)


def catalog_alter(
    spark: SparkSession,
    cat_root: str,
    add: dict[str, str] | None = None,
    remove: list[str] | None = None,
) -> int:
    """Evolve catalog MEMBERSHIP in one atomic commit: ``add`` maps new
    member names to table roots (pinned at their current manifest head),
    ``remove`` drops names from the catalog. Removed tables keep their
    data and any table-level tags (incl. ``catalog:<release>`` pins from
    releases they were part of — those releases still resolve the old
    catalog versions, which still name the table); they simply stop
    participating in new catalog versions. Same CAS-retry semantics as
    `catalog_commit`. Returns the catalog version published."""
    add = dict(add or {})
    remove = list(remove or [])
    if not add and not remove:
        raise ValueError("catalog_alter: nothing to add or remove")
    dup = set(add) & set(remove)
    if dup:
        raise ValueError(f"catalog_alter: {sorted(dup)} in both add and remove")
    fs, jvm = _hadoop_fs(spark, cat_root)
    pinned = {
        name: {"root": root.rstrip("/"), "version": _table_head(spark, root)}
        for name, root in add.items()
    }
    for _ in range(_MAX_RETRIES):
        vs = _cat_versions(fs, jvm, cat_root)
        if not vs:
            raise ValueError(f"{cat_root} is not a catalog (no versions)")
        head = vs[-1]
        doc = _load_cat(fs, jvm, cat_root, head)
        clash = set(add) & set(doc["tables"])
        if clash:
            raise ValueError(
                f"catalog_alter: {sorted(clash)} are already members"
            )
        missing = set(remove) - set(doc["tables"])
        if missing:
            raise ValueError(
                f"catalog_alter: {sorted(missing)} are not members "
                f"(have: {sorted(doc['tables'])})"
            )
        new = {
            "version": head + 1,
            "committed_at_ms": int(time.time() * 1000),
            "tables": {
                **{
                    n: e
                    for n, e in doc["tables"].items()
                    if n not in remove
                },
                **pinned,
            },
        }
        if doc.get("tags"):
            new["tags"] = doc["tags"]
        if _publish_cas(
            fs,
            jvm,
            _cat_path(cat_root, head + 1),
            json.dumps(new, indent=1).encode(),
        ):
            return head + 1
    raise CatalogConflict(
        f"catalog_alter: lost {_MAX_RETRIES} consecutive publish races "
        f"on {cat_root}"
    )


def catalog_commit(
    spark: SparkSession, cat_root: str, pins: dict[str, int]
) -> int:
    """Atomically flip the catalog to new per-table versions.

    ``pins`` maps member-table NAMES to the manifest versions their DML
    just produced (``manifest_versions(spark, root)[-1]`` right after
    the DML call). All named tables become visible at the new versions in
    ONE catalog commit; unnamed member tables keep their current pins.
    On a lost CAS race the pin map re-merges onto the winner's document
    and retries — two writers touching DISJOINT tables both land;
    writers pinning the SAME table land in CAS order (last wins, both
    versions remain time-travelable). Returns the catalog version
    published."""
    fs, jvm = _hadoop_fs(spark, cat_root)
    for _ in range(_MAX_RETRIES):
        head = _cat_versions(fs, jvm, cat_root)[-1]
        doc = _load_cat(fs, jvm, cat_root, head)
        unknown = set(pins) - set(doc["tables"])
        if unknown:
            raise ValueError(
                f"catalog_commit: tables {sorted(unknown)} are not catalog "
                f"members (have: {sorted(doc['tables'])})"
            )
        new = {
            "version": head + 1,
            "committed_at_ms": int(time.time() * 1000),
            "tables": {
                name: {
                    "root": entry["root"],
                    "version": int(pins.get(name, entry["version"])),
                }
                for name, entry in doc["tables"].items()
            },
        }
        if doc.get("tags"):  # release tags survive every pin flip
            new["tags"] = doc["tags"]
        if _publish_cas(
            fs,
            jvm,
            _cat_path(cat_root, head + 1),
            json.dumps(new, indent=1).encode(),
        ):
            return head + 1
    raise CatalogConflict(
        f"catalog_commit: lost {_MAX_RETRIES} consecutive publish races on "
        f"{cat_root}"
    )


class CatalogSnapshot:
    """A resolved catalog version: every ``read()`` serves the pinned
    per-table versions, however many commits land meanwhile — the
    cross-table repeatable-read handle."""

    def __init__(self, spark: SparkSession, version: int, tables: dict):
        self._spark = spark
        self.version = version
        self.tables = tables

    def read(self, name: str, fmt: str = "parquet") -> DataFrame:
        if name not in self.tables:
            raise ValueError(
                f"catalog snapshot v{self.version} has no table {name!r} "
                f"(have: {sorted(self.tables)})"
            )
        entry = self.tables[name]
        fs, jvm = _hadoop_fs(self._spark, entry["root"])
        retained = _list_manifest_versions(fs, jvm, entry["root"])[-_RETAIN:]
        if entry["version"] not in retained:
            # release tags keep member snapshots readable past retention
            from etl_demo_spark.io.manifest import _load_doc

            table_tags = _load_doc(fs, jvm, entry["root"]).get("tags") or {}
            protected = {t["version"] for t in table_tags.values()}
            if entry["version"] not in protected:
                raise ValueError(
                    f"catalog snapshot v{self.version} pins {name!r} at "
                    f"table version {entry['version']}, which has left the "
                    f"table's retention window (retained: {retained}) and "
                    "is not tag-protected — its data may be GC'd; resolve "
                    "a newer catalog version or catalog_tag_create one"
                )
        return read_manifested(
            self._spark, entry["root"], fmt, version=entry["version"]
        )

    def pins(self) -> dict[str, int]:
        return {n: e["version"] for n, e in self.tables.items()}


def catalog_history(spark: SparkSession, cat_root: str) -> DataFrame:
    """The catalog's commit history as a DataFrame: one row per catalog
    version per member table with the pinned table version — the
    cross-table DESCRIBE HISTORY ("what did the whole schema look like
    at catalog v3, and which commit moved which table"). Metadata-only:
    one small JSON read per catalog version."""
    fs, jvm = _hadoop_fs(spark, cat_root)
    vs = _cat_versions(fs, jvm, cat_root)
    if not vs:
        raise ValueError(f"{cat_root} is not a catalog (no versions)")
    rows = []
    prev: dict = {}
    for v in vs:
        doc = _load_cat(fs, jvm, cat_root, v)
        for name, entry in sorted(doc["tables"].items()):
            rows.append(
                (
                    v,
                    int(doc.get("committed_at_ms") or 0),
                    name,
                    int(entry["version"]),
                    prev.get(name) != entry["version"],
                )
            )
        prev = {n: e["version"] for n, e in doc["tables"].items()}
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        rows,
        "catalog_version LONG, committed_at_ms LONG, table STRING, "
        "table_version LONG, changed BOOLEAN",
    ).select(
        "catalog_version",
        F.timestamp_millis(F.col("committed_at_ms")).alias("committed_at"),
        "table",
        "table_version",
        "changed",
    )


def register_catalog(
    spark: SparkSession,
    cat_root: str,
    prefix: str = "",
    version: int | None = None,
    as_of_ms: int | None = None,
) -> "CatalogSnapshot":
    """Register EVERY member table of one catalog snapshot as a temp
    view (``<prefix><table_name>``) so plain ``spark.sql`` joins across
    them under ONE consistent cross-table pin — the multi-table
    extension of `register_manifested`. Re-register to observe later
    catalog commits. Returns the snapshot used."""
    snap = catalog_snapshot(spark, cat_root, version=version, as_of_ms=as_of_ms)
    for name in snap.tables:
        snap.read(name).createOrReplaceTempView(f"{prefix}{name}")
    return snap


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside parentheses and single-quoted strings —
    enough structure to carve `SET a = f(x, y), b = 'i, j'` into its
    assignments without a SQL grammar."""
    out, depth, q, start = [], 0, False, 0
    for i, ch in enumerate(s):
        if q:
            if ch == "'":
                q = False
        elif ch == "'":
            q = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return [p.strip() for p in out if p.strip()]


def _table_partition_cols(spark: SparkSession, root: str) -> list[str]:
    fs, jvm = _hadoop_fs(spark, root)
    doc = _load_doc(fs, jvm, root)
    mapping = doc.get("partitions") or {}
    if not mapping:
        raise ValueError(f"{root} has no partitions — not DML-addressable")
    return [seg.split("=", 1)[0] for seg in next(iter(mapping)).split("/")]


def _table_schema(spark: SparkSession, root: str) -> T.StructType | None:
    fs, jvm = _hadoop_fs(spark, root)
    doc = _load_doc(fs, jvm, root)
    if doc.get("schema") is None:
        return None
    return T.StructType.fromJson(json.loads(doc["schema"]))


_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<table>\w+)\s*"
    r"(?:\(\s*(?P<cols>[^)]+?)\s*\)\s*)?"
    r"(?P<query>(?:SELECT|VALUES|WITH|TABLE|FROM)\b.*)$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<table>\w+)\s+WHERE\s+(?P<pred>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<table>\w+)\s+SET\s+(?P<sets>.+?)"
    r"(?:\s+WHERE\s+(?P<pred>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<table>\w+)(?:\s+AS)?(?:\s+(?P<talias>\w+))?\s+"
    r"USING\s+(?:\(\s*(?P<subq>.+?)\s*\)|(?P<srcname>\w+))(?:\s+AS)?"
    r"(?:\s+(?P<salias>\w+))?\s+"
    r"ON\s+(?P<cond>.+?)\s+"
    r"(?P<clauses>WHEN\s+.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)

# the MERGE clause family (ANSI/Delta shape): UPDATE SET * / DELETE on
# match (DELETE takes an optional AND condition over target columns),
# INSERT * on no-match, DELETE on NOT MATCHED BY SOURCE
_M_UPDATE_RE = re.compile(
    r"^MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s*$", re.IGNORECASE
)
_M_DELETE_RE = re.compile(
    r"^MATCHED\s*(?:AND\s+(?P<cond>.+?))?\s*THEN\s+DELETE\s*$",
    re.IGNORECASE | re.DOTALL,
)
_NM_INSERT_RE = re.compile(
    r"^NOT\s+MATCHED\s+(?:BY\s+TARGET\s+)?THEN\s+INSERT\s+\*\s*$",
    re.IGNORECASE,
)
_NMBS_DELETE_RE = re.compile(
    r"^NOT\s+MATCHED\s+BY\s+SOURCE\s*(?:AND\s+(?P<cond>.+?))?\s*"
    r"THEN\s+DELETE\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _parse_merge_clauses(
    clauses: str, talias: str, salias: str | None
) -> dict:
    """The WHEN-clause tail of a MERGE as merge_upsert_manifested
    parameters. Conditions are SQL over TARGET columns (the target
    alias prefix is stripped; source-alias references are refused —
    the row being kept or deleted is a target row)."""

    def _cond(c: str | None) -> str | None:
        if c is None:
            return None
        if salias and re.search(rf"\b{re.escape(salias)}\.", c):
            raise ValueError(
                "catalog_sql: MERGE clause conditions may reference "
                f"TARGET columns only, got source-qualified {c!r}"
            )
        return re.sub(rf"\b{re.escape(talias)}\.", "", c).strip()

    out = {
        "when_matched": None,
        "matched_cond": None,
        "insert": False,
        "nmbs_delete": False,
        "nmbs_cond": None,
    }
    parts = [p.strip() for p in re.split(r"\bWHEN\s+", clauses, flags=re.IGNORECASE) if p.strip()]
    for part in parts:
        if _M_UPDATE_RE.match(part):
            if out["when_matched"] is not None:
                raise ValueError("catalog_sql: duplicate MATCHED clause")
            out["when_matched"] = "update"
        elif (m := _NMBS_DELETE_RE.match(part)) is not None:
            # before _M_DELETE_RE / _NM_INSERT_RE: their prefixes overlap
            if out["nmbs_delete"]:
                raise ValueError(
                    "catalog_sql: duplicate NOT MATCHED BY SOURCE clause"
                )
            out["nmbs_delete"] = True
            out["nmbs_cond"] = _cond(m.group("cond"))
        elif (m := _M_DELETE_RE.match(part)) is not None:
            if out["when_matched"] is not None:
                raise ValueError("catalog_sql: duplicate MATCHED clause")
            out["when_matched"] = "delete"
            out["matched_cond"] = _cond(m.group("cond"))
        elif _NM_INSERT_RE.match(part):
            if out["insert"]:
                raise ValueError("catalog_sql: duplicate INSERT clause")
            out["insert"] = True
        else:
            raise ValueError(
                "catalog_sql: unsupported MERGE clause 'WHEN "
                + part[:80]
                + "' (supported: MATCHED THEN UPDATE SET *; MATCHED "
                "[AND cond] THEN DELETE; NOT MATCHED THEN INSERT *; "
                "NOT MATCHED BY SOURCE [AND cond] THEN DELETE)"
            )
    if out["when_matched"] is None:
        # insert-only / NMBS-only merges: matched rows pass through —
        # a DELETE clause whose condition never fires
        out["when_matched"] = "delete"
        out["matched_cond"] = "false"
    return out


def catalog_sql(
    spark: SparkSession,
    cat_root: str,
    statement: str,
    prefix: str = "",
    fmt: str = "parquet",
) -> int:
    """SQL DML against CATALOG table names — the write path next to
    `register_catalog`'s read views. A registered user's next step after
    ``SELECT``-ing the pinned views is ``INSERT INTO`` / ``MERGE INTO``
    those same names; this is the thin resolver that routes each
    statement through the existing manifested committers and then flips
    the catalog pin, so the mutation becomes visible to catalog readers
    in one atomic pointer swap (never a half-published table version).

    Supported statements (one per call; the target must be a catalog
    member name, unqualified):

    * ``INSERT INTO t [(c1, …)] <SELECT|VALUES|WITH query>`` —
      positional column mapping (ANSI INSERT), each column cast to the
      table's stored type, routed through `append_manifested` (an
      insert-only fast commit; no existing file is read). The column
      list, when given, must name every table column — appends never
      evolve schema.
    * ``MERGE INTO t [AS a] USING (<subquery>)|view [AS b] ON a.k = b.k
      [AND …] <clauses>`` — the FULL clause family (round 10), routed
      through `merge_upsert_manifested` with the ON-clause equality
      columns as keys: ``WHEN MATCHED THEN UPDATE SET *``, ``WHEN
      MATCHED [AND cond] THEN DELETE`` (conditions over TARGET columns;
      pure-DELETE merges accept key-only sources — the CDC tombstone
      shape), ``WHEN NOT MATCHED THEN INSERT *`` (optional), and ``WHEN
      NOT MATCHED BY SOURCE [AND cond] THEN DELETE`` (snapshot-sync —
      rewrites every target leaf, which is what the clause means).
      Column-level ``UPDATE SET c = expr`` inside MERGE remains
      unsupported — use the UPDATE statement or the DataFrame API.
    * ``UPDATE t SET c = expr[, …] [WHERE pred]`` →
      `update_where_manifested`.
    * ``DELETE FROM t WHERE pred`` → `delete_where_manifested`.

    The source query/subquery/predicates evaluate against THIS call's
    catalog snapshot: every member table is registered (or refreshed) as
    ``<prefix><name>`` before execution, so ``INSERT INTO a SELECT …
    FROM b`` reads b at the same consistent pin set it publishes
    against. After the table commit, the catalog pin flips and the
    views re-register onto the new snapshot. Returns the new catalog
    version.

    Scale: parsing is a statement-head regex — all data movement is the
    underlying committers' (append: O(new data); merge/update/delete:
    O(affected leaves)); the pin flip is one tiny JSON CAS."""
    snap = register_catalog(spark, cat_root, prefix=prefix)
    name, root = _apply_dml(spark, snap, cat_root, statement, fmt)
    cv = catalog_commit(
        spark, cat_root, {name: manifest_versions(spark, root)[-1]}
    )
    register_catalog(spark, cat_root, prefix=prefix)
    return cv


def _apply_dml(
    spark: SparkSession,
    snap: "CatalogSnapshot",
    cat_root: str,
    statement: str,
    fmt: str,
) -> tuple[str, str]:
    """Parse-and-route ONE DML statement against a resolved snapshot's
    member names; returns (table name, table root) of the target. The
    caller owns the catalog pin flip — `catalog_sql` flips per
    statement, `catalog_sql_txn` once for the whole batch."""

    def _resolve(name: str) -> str:
        if name not in snap.tables:
            raise ValueError(
                f"catalog_sql: {name!r} is not a member of {cat_root} "
                f"(have: {sorted(snap.tables)})"
            )
        return snap.tables[name]["root"]

    m = _INSERT_RE.match(statement)
    if m:
        name = m.group("table")
        root = _resolve(name)
        src = spark.sql(m.group("query"))
        schema = _table_schema(spark, root)
        if schema is None:
            raise ValueError(
                f"catalog_sql: table {name!r} stores no schema — "
                "positional INSERT needs one"
            )
        names = (
            _split_top_level(m.group("cols"))
            if m.group("cols")
            else [f.name for f in schema]
        )
        if set(names) != {f.name for f in schema}:
            raise ValueError(
                f"catalog_sql: INSERT column list must name every table "
                f"column (got {sorted(names)}, table has "
                f"{sorted(f.name for f in schema)}) — appends never "
                "evolve schema"
            )
        if len(src.columns) != len(names):
            raise ValueError(
                f"catalog_sql: INSERT query yields {len(src.columns)} "
                f"columns, target list has {len(names)}"
            )
        types = {f.name: f.dataType for f in schema}
        staged = src.toDF(*names).select(
            *[F.col(n).cast(types[n]).alias(n) for n in names]
        )
        append_manifested(spark, root, staged, fmt=fmt)
    elif (m := _MERGE_RE.match(statement)) is not None:
        name = m.group("table")
        root = _resolve(name)
        talias = m.group("talias") or name
        salias = m.group("salias") or m.group("srcname")
        src = (
            spark.sql(m.group("subq"))
            if m.group("subq")
            else spark.table(m.group("srcname"))
        )
        keys = []
        for conj in re.split(r"\s+AND\s+", m.group("cond"), flags=re.IGNORECASE):
            eq = re.match(
                r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", conj
            )
            if not eq:
                raise ValueError(
                    f"catalog_sql: MERGE ON clause must be equality "
                    f"conjuncts qualified by the two aliases, got {conj!r}"
                )
            a_al, a_col, b_al, b_col = eq.groups()
            if {a_al, b_al} != {talias, salias} or a_col != b_col:
                raise ValueError(
                    f"catalog_sql: MERGE key must equate the SAME column "
                    f"across target/source aliases, got {conj!r}"
                )
            keys.append(a_col)
        cl = _parse_merge_clauses(
            m.group("clauses"), talias, salias
        )
        if cl["when_matched"] == "update" and cl["insert"] and not cl["nmbs_delete"]:
            merge_upsert_manifested(
                spark, root, src, keys,
                _table_partition_cols(spark, root), fmt=fmt,
            )
        else:
            merge_upsert_manifested(
                spark, root, src, keys,
                _table_partition_cols(spark, root), fmt=fmt,
                when_matched=cl["when_matched"],
                matched_cond=cl["matched_cond"],
                insert=cl["insert"],
                nmbs_delete=cl["nmbs_delete"],
                nmbs_cond=cl["nmbs_cond"],
            )
    elif (m := _UPDATE_RE.match(statement)) is not None:
        name = m.group("table")
        root = _resolve(name)
        assignments = {}
        for part in _split_top_level(m.group("sets")):
            col, _, rhs = part.partition("=")
            if not _ or not col.strip().isidentifier():
                raise ValueError(
                    f"catalog_sql: bad SET assignment {part!r}"
                )
            assignments[col.strip()] = F.expr(rhs.strip())
        pred = F.expr(m.group("pred")) if m.group("pred") else F.lit(True)
        update_where_manifested(
            spark, root, assignments, pred,
            _table_partition_cols(spark, root), fmt=fmt,
        )
    elif (m := _DELETE_RE.match(statement)) is not None:
        name = m.group("table")
        root = _resolve(name)
        delete_where_manifested(
            spark, root, F.expr(m.group("pred")),
            _table_partition_cols(spark, root), fmt=fmt,
        )
    else:
        raise ValueError(
            "catalog_sql: unsupported statement (supported: INSERT INTO "
            "name <query>; MERGE INTO name USING … ON … with the clause "
            "family WHEN MATCHED THEN UPDATE SET * | WHEN MATCHED [AND "
            "cond] THEN DELETE | WHEN NOT MATCHED THEN INSERT * | WHEN "
            "NOT MATCHED BY SOURCE [AND cond] THEN DELETE; UPDATE name "
            "SET … [WHERE …]; DELETE FROM name WHERE …): "
            + statement.strip()[:120]
        )
    return name, root


def catalog_sql_txn(
    spark: SparkSession,
    cat_root: str,
    statements: list[str],
    prefix: str = "",
    fmt: str = "parquet",
) -> int:
    """MULTI-STATEMENT ATOMIC TRANSACTION over catalog tables — the
    multi-table counterpart of a warehouse's BEGIN…COMMIT, which no
    single-table snapshot format can offer: every statement's table
    commit lands durable-but-INVISIBLE, then ONE catalog version flips
    all the touched pins together. Readers see the entire transaction
    or none of it; a crash anywhere before the flip leaves the catalog
    on the old pins (the orphaned table versions age out through normal
    per-table retention), never a torn intermediate.

    Isolation: READ-YOUR-OWN-WRITES inside the transaction, invisible
    outside until the flip — a real BEGIN…COMMIT's contract. After each
    statement the touched table's view is re-registered at its new
    (not-yet-pinned) head, so statement N's SELECT sources and
    subqueries see statements 1..N-1's effects; tables the transaction
    hasn't touched stay at their transaction-start snapshot (no dirty
    reads of other writers). OUTSIDE readers resolve the catalog's old
    pins until the single CAS publishes every touched table together.
    Statement grammar = `catalog_sql`'s.

    Returns the catalog version that published the batch. Scale: N
    table commits + one tiny JSON CAS; no statement re-reads another's
    data beyond what its own DML needs."""
    if not statements:
        raise ValueError("catalog_sql_txn: empty statement list")
    from etl_demo_spark.io.manifest import read_manifested

    snap = register_catalog(spark, cat_root, prefix=prefix)
    pins: dict[str, int] = {}
    for stmt in statements:
        name, root = _apply_dml(spark, snap, cat_root, stmt, fmt)
        pins[name] = manifest_versions(spark, root)[-1]
        # read-your-own-writes: later statements' SELECT sources see
        # this statement's effect through the re-pointed view (still
        # invisible to outside readers — the catalog pin hasn't moved)
        read_manifested(
            spark, root, fmt, version=pins[name]
        ).createOrReplaceTempView(f"{prefix}{name}")
    cv = catalog_commit(spark, cat_root, pins)
    register_catalog(spark, cat_root, prefix=prefix)
    return cv


def catalog_snapshot(
    spark: SparkSession,
    cat_root: str,
    version: int | None = None,
    as_of_ms: int | None = None,
    tag: str | None = None,
) -> CatalogSnapshot:
    """Resolve the catalog ONCE (head, an explicit version, the newest
    version committed at-or-before ``as_of_ms`` — cross-table AS OF
    TIMESTAMP — or a named RELEASE ``tag``) and return the consistent
    read handle."""
    if sum(x is not None for x in (version, as_of_ms, tag)) > 1:
        raise ValueError(
            "catalog_snapshot: version, as_of_ms, and tag are exclusive"
        )
    fs, jvm = _hadoop_fs(spark, cat_root)
    vs = _cat_versions(fs, jvm, cat_root)
    if not vs:
        raise ValueError(f"{cat_root} is not a catalog (no versions)")
    if tag is not None:
        tags = _load_cat(fs, jvm, cat_root, vs[-1]).get("tags") or {}
        if tag not in tags:
            raise ValueError(
                f"catalog_snapshot: no release tag {tag!r} at {cat_root} "
                f"(have: {sorted(tags)})"
            )
        version = int(tags[tag]["version"])
    if as_of_ms is not None:
        hits = [
            v
            for v in vs
            if (_load_cat(fs, jvm, cat_root, v).get("committed_at_ms") or 0)
            <= as_of_ms
        ]
        if not hits:
            raise ValueError(
                f"no catalog version at {cat_root} was committed at or "
                f"before {as_of_ms}"
            )
        v = hits[-1]
    else:
        v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(
            f"catalog version {v} not available at {cat_root} (have {vs})"
        )
    doc = _load_cat(fs, jvm, cat_root, v)
    return CatalogSnapshot(spark, v, doc["tables"])


def catalog_tag_create(
    spark: SparkSession,
    cat_root: str,
    name: str,
    version: int | None = None,
    replace: bool = False,
) -> int:
    """Cross-table RELEASE tag: pin a catalog version under a stable
    name AND tag every member table at its pinned snapshot (table tag
    ``catalog:<name>``), so GC keeps the whole release's data alive in
    every table until the release is deleted — "the exact bytes of all
    N tables model X trained on", one name, zero copies.

    Member-table tags land first (each an atomic table commit; a crash
    partway leaves extra protection, never a dangling release), then one
    catalog CAS publishes the release name. A pinned member version that
    already left its table's retention window un-protected fails loudly
    here rather than lying. Returns the catalog version published."""
    from etl_demo_spark.io.manifest import tag_create

    fs, jvm = _hadoop_fs(spark, cat_root)
    vs = _cat_versions(fs, jvm, cat_root)
    if not vs:
        raise ValueError(f"{cat_root} is not a catalog (no versions)")
    target_v = vs[-1] if version is None else int(version)
    if target_v not in vs:
        raise ValueError(
            f"catalog_tag_create: version {target_v} not available at "
            f"{cat_root} (have {vs})"
        )
    target = _load_cat(fs, jvm, cat_root, target_v)
    head_tags = _load_cat(fs, jvm, cat_root, vs[-1]).get("tags") or {}
    if name in head_tags and not replace:
        raise ValueError(
            f"catalog_tag_create: release {name!r} already exists "
            f"(catalog v{head_tags[name]['version']}); pass replace=True"
        )
    if name in head_tags:
        # REPLACE: tables that were members of the old release but are
        # absent from the new target catalog version must lose their
        # catalog:<name> tag now — nothing will reference it afterwards,
        # and an orphaned tag pins their snapshots against GC forever.
        from etl_demo_spark.io.manifest import tag_delete

        old = _load_cat(fs, jvm, cat_root, int(head_tags[name]["version"]))
        gone = set(old["tables"]) - set(target["tables"])
        for tname in sorted(gone):
            try:
                tag_delete(spark, old["tables"][tname]["root"], f"catalog:{name}")
            except ValueError:
                pass  # tag already gone — idempotent
    for tname, entry in sorted(target["tables"].items()):
        tag_create(
            spark,
            entry["root"],
            f"catalog:{name}",
            version=int(entry["version"]),
            replace=True,  # idempotent re-run / replace of the release
        )
    for _ in range(_MAX_RETRIES):
        head = _cat_versions(fs, jvm, cat_root)[-1]
        doc = _load_cat(fs, jvm, cat_root, head)
        new = dict(doc)
        new["version"] = head + 1
        new["committed_at_ms"] = int(time.time() * 1000)
        new["tags"] = {
            **(doc.get("tags") or {}),
            name: {
                "version": target_v,
                "created_at_ms": int(time.time() * 1000),
            },
        }
        if _publish_cas(
            fs,
            jvm,
            _cat_path(cat_root, head + 1),
            json.dumps(new, indent=1).encode(),
        ):
            return head + 1
    raise CatalogConflict(
        f"catalog_tag_create: lost {_MAX_RETRIES} consecutive publish "
        f"races on {cat_root}"
    )


def catalog_tag_delete(spark: SparkSession, cat_root: str, name: str) -> int:
    """Delete a release: drop every member table's ``catalog:<name>``
    tag (their snapshots become reclaimable at the next GC unless still
    retained or otherwise tagged), then un-name the catalog version."""
    from etl_demo_spark.io.manifest import tag_delete

    fs, jvm = _hadoop_fs(spark, cat_root)
    vs = _cat_versions(fs, jvm, cat_root)
    head_tags = _load_cat(fs, jvm, cat_root, vs[-1]).get("tags") or {}
    if name not in head_tags:
        raise ValueError(
            f"catalog_tag_delete: no release {name!r} (have: "
            f"{sorted(head_tags)})"
        )
    release = _load_cat(fs, jvm, cat_root, int(head_tags[name]["version"]))
    for tname, entry in sorted(release["tables"].items()):
        try:
            tag_delete(spark, entry["root"], f"catalog:{name}")
        except ValueError:
            pass  # already gone (partial prior delete) — idempotent
    for _ in range(_MAX_RETRIES):
        head = _cat_versions(fs, jvm, cat_root)[-1]
        doc = _load_cat(fs, jvm, cat_root, head)
        kept = {
            k: v for k, v in (doc.get("tags") or {}).items() if k != name
        }
        new = dict(doc)
        new["version"] = head + 1
        new["committed_at_ms"] = int(time.time() * 1000)
        if kept:
            new["tags"] = kept
        else:
            new.pop("tags", None)
        if _publish_cas(
            fs,
            jvm,
            _cat_path(cat_root, head + 1),
            json.dumps(new, indent=1).encode(),
        ):
            return head + 1
    raise CatalogConflict(
        f"catalog_tag_delete: lost {_MAX_RETRIES} consecutive publish "
        f"races on {cat_root}"
    )


# ---------------------------------------------------------------------------
# CATALOG-LEVEL WRITE-AUDIT-PUBLISH: atomic multi-table stage -> validate ->
# publish. Per-table WAP (manifest.branch_create / branch_fastforward) can
# still publish table A while table B's audit fails; the training-data shape
# is multi-table (documents + embeddings + labels), so the gate must be too.
#
# Mechanics: catalog_wap_begin forks a same-named branch on EVERY selected
# member table and records a WAP ref under _catalog/_wap/ (create-exclusive,
# so a name begins once). Writers stage through use_catalog_wap — every
# manifest commit inside lands on the tables' branches, invisible to main
# readers, streams, and catalog pins. catalog_wap_publish validates ALL
# expectations (per-table predicates and cross-table SQL over the branch
# heads) BEFORE anything moves, pre-classifies every branch against main
# commits landed since the fork, fast-forwards each touched table (main
# heads advance, but catalog pins still serve the old consistent state),
# and finally flips ALL pins in ONE catalog CAS commit — the only moment
# catalog readers and `catalogstream` consumers see the load, whole or not
# at all. A refused publish leaves main, pins, and the stream untouched.
# ---------------------------------------------------------------------------

from contextlib import ExitStack as _ExitStack
from contextlib import contextmanager as _contextmanager


def _wap_path(cat_root: str, name: str) -> str:
    return f"{cat_root.rstrip('/')}/{_CAT_DIR}/_wap/{name}.json"


def _wap_load(fs, jvm, cat_root: str, name: str) -> dict:
    try:
        return json.loads(
            _read_file(fs, jvm, _wap_path(cat_root, name)).decode()
        )
    except Exception:
        raise ValueError(
            f"no catalog WAP {name!r} at {cat_root} — catalog_wap_begin it"
        )


def catalog_wap_begin(
    spark: SparkSession,
    cat_root: str,
    name: str,
    tables: list[str] | None = None,
) -> dict:
    """Open a catalog-level WAP: fork branch ``wap-<name>`` on every
    selected member table (default: all members) and record the WAP ref
    in the catalog sub-log. The ref file is create-exclusive — a second
    begin under the same name refuses. Returns the ref doc
    (``{"name", "catalog_version", "tables": {member: fork_version}}``)."""
    from etl_demo_spark.io.manifest import _mkdirs_parent, branch_create

    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"catalog_wap_begin: invalid WAP name {name!r}")
    fs, jvm = _hadoop_fs(spark, cat_root)
    vs = _cat_versions(fs, jvm, cat_root)
    if not vs:
        raise ValueError(f"{cat_root} is not a catalog (no versions)")
    doc = _load_cat(fs, jvm, cat_root, vs[-1])
    members = dict(doc["tables"])
    chosen = sorted(members) if tables is None else list(tables)
    unknown = set(chosen) - set(members)
    if unknown:
        raise ValueError(
            f"catalog_wap_begin: {sorted(unknown)} are not catalog members "
            f"(have: {sorted(members)})"
        )
    branch = f"wap-{name}"
    forked: dict[str, int] = {}
    try:
        for tname in chosen:
            forked[tname] = branch_create(spark, members[tname]["root"], branch)
    except Exception:
        # roll back the partial fork — begin is all-or-nothing
        from etl_demo_spark.io.manifest import branch_delete

        for tname in forked:
            try:
                branch_delete(spark, members[tname]["root"], branch)
            except ValueError:
                pass
        raise
    ref = {
        "name": name,
        "branch": branch,
        "catalog_version": vs[-1],
        "tables": {t: {"root": members[t]["root"], "fork": forked[t]}
                   for t in chosen},
    }
    path = _wap_path(cat_root, name)
    _mkdirs_parent(fs, jvm, path)
    if not _publish_cas(fs, jvm, path, json.dumps(ref, indent=1).encode()):
        from etl_demo_spark.io.manifest import branch_delete

        for tname in forked:
            try:
                branch_delete(spark, members[tname]["root"], branch)
            except ValueError:
                pass
        raise ValueError(
            f"catalog_wap_begin: WAP {name!r} already open at {cat_root}"
        )
    return ref


@_contextmanager
def use_catalog_wap(spark: SparkSession, cat_root: str, name: str):
    """Scope manifest operations on EVERY table of WAP ``name`` to its
    branch: commits land on the per-table branch sub-logs, reads resolve
    the branch heads. Yields the WAP ref doc."""
    from etl_demo_spark.io.manifest import use_branch

    fs, jvm = _hadoop_fs(spark, cat_root)
    ref = _wap_load(fs, jvm, cat_root, name)
    with _ExitStack() as stack:
        for tname in sorted(ref["tables"]):
            stack.enter_context(
                use_branch(spark, ref["tables"][tname]["root"], ref["branch"])
            )
        yield ref


def catalog_wap_abort(spark: SparkSession, cat_root: str, name: str) -> None:
    """Drop an open WAP: delete every per-table branch and the ref.
    Main, catalog pins, and streams were never touched."""
    from etl_demo_spark.io.manifest import branch_delete

    fs, jvm = _hadoop_fs(spark, cat_root)
    ref = _wap_load(fs, jvm, cat_root, name)
    for tname, entry in sorted(ref["tables"].items()):
        try:
            branch_delete(spark, entry["root"], ref["branch"])
        except ValueError:
            pass  # half-aborted earlier — idempotent
    fs.delete(jvm.org.apache.hadoop.fs.Path(_wap_path(cat_root, name)), False)


def catalog_wap_publish(
    spark: SparkSession,
    cat_root: str,
    name: str,
    expectations: dict[str, dict[str, str]] | None = None,
    sql_expectations: dict[str, str] | None = None,
    fmt: str = "parquet",
) -> int:
    """Validate, then publish a catalog WAP atomically.

    * ``expectations`` — ``{member_table: {check_name: SQL boolean
      predicate}}`` evaluated over that table's BRANCH head; any row
      where a predicate is false or NULL refuses the whole publish.
    * ``sql_expectations`` — ``{check_name: SQL query}`` run with every
      WAP member's branch head registered as a temp view under its
      member name; any ROW the query returns is a violation and refuses
      the publish (write them as "select the offending rows" queries —
      e.g. documents lacking an embedding row). This is the CROSS-TABLE
      gate per-table WAP cannot express.

    Ordering guarantees: ALL validation runs before anything moves, and
    every touched branch is pre-classified against main commits landed
    since its fork — a conflict refuses the publish before any table
    fast-forwards. Then each touched table fast-forwards (main heads
    advance one by one, but catalog pins still serve the old state —
    direct-table readers keep per-table atomicity, catalog readers see
    NOTHING yet), and one `catalog_commit` flips all pins together: the
    single moment the load becomes visible through the catalog and
    `catalogstream`. Branches and the ref are cleaned up on success.
    Returns the published catalog version."""
    import etl_demo_spark.io.manifest as m

    fs, jvm = _hadoop_fs(spark, cat_root)
    ref = _wap_load(fs, jvm, cat_root, name)
    branch = ref["branch"]
    bad_tables = set(expectations or {}) - set(ref["tables"])
    if bad_tables:
        raise ValueError(
            f"catalog_wap_publish: expectations name non-WAP tables "
            f"{sorted(bad_tables)} (WAP covers: {sorted(ref['tables'])})"
        )

    # ---- VALIDATE (everything, before anything moves) ----------------
    failed: dict[str, int] = {}
    with use_catalog_wap(spark, cat_root, name):
        heads = {
            t: read_manifested(spark, e["root"], fmt)
            for t, e in ref["tables"].items()
        }
        for tname, checks in sorted((expectations or {}).items()):
            for cname, pred in sorted(checks.items()):
                p = F.expr(pred)
                bad = heads[tname].filter(~p | p.isNull()).count()
                if bad:
                    failed[f"{tname}.{cname}"] = bad
        if sql_expectations:
            for tname, df in heads.items():
                df.createOrReplaceTempView(tname)
            try:
                for cname, sql in sorted(sql_expectations.items()):
                    bad = spark.sql(sql).count()
                    if bad:
                        failed[cname] = bad
            finally:
                for tname in heads:
                    spark.catalog.dropTempView(tname)
    if failed:
        raise ValueError(
            f"catalog_wap_publish: WAP {name!r} failed expectations "
            f"{failed} — nothing was published; fix the branches or "
            "catalog_wap_abort"
        )

    # ---- PRE-CLASSIFY vs main (refuse conflicts before any publish) --
    touched: list[str] = []
    for tname in sorted(ref["tables"]):
        root = ref["tables"][tname]["root"]
        tfs, tjvm = _hadoop_fs(spark, root)
        fork = m._branch_base(tfs, tjvm, root, branch)
        bvs = m._list_dir_versions(tfs, tjvm, m._branch_dir(root, branch))
        if not bvs:
            continue  # untouched member: branch dropped, pin unchanged
        touched.append(tname)
        M = m._load_doc(tfs, tjvm, root)
        if M["version"] != fork:
            B = m._resolve_doc(tfs, tjvm, root, fork)
            H = m._resolve_doc(tfs, tjvm, root, bvs[-1])
            reason = m._rebase_conflict(B, M, H)
            if reason is not None:
                raise ValueError(
                    f"catalog_wap_publish: {tname!r} branch conflicts with "
                    f"main commits since the fork ({reason}) — nothing was "
                    "published; re-stage on a fresh WAP"
                )

    # ---- PUBLISH: per-table fast-forwards, then ONE pin flip ---------
    pins: dict[str, int] = {}
    for tname in touched:
        pins[tname] = m.branch_fastforward(
            spark, ref["tables"][tname]["root"], branch, fmt=fmt
        )
    for tname in sorted(set(ref["tables"]) - set(touched)):
        try:
            m.branch_delete(spark, ref["tables"][tname]["root"], branch)
        except ValueError:
            pass
    out = catalog_commit(spark, cat_root, pins) if pins else ref[
        "catalog_version"
    ]
    fs.delete(jvm.org.apache.hadoop.fs.Path(_wap_path(cat_root, name)), False)
    return out
