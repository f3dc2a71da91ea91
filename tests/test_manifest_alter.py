"""ALTER TABLE for manifested tables (io/manifest.py alter_manifested):
metadata-only add/drop/rename/widen with Delta-style column mapping —
renames freeze physical names; no variant rewrites a data file."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F


def _seed(spark, path: str):
    from etl_demo_spark.io.manifest import write_manifested

    df = spark.createDataFrame(
        [(1, 10, 1.5, "A"), (2, 20, 2.5, "A"), (3, 30, 3.5, "B")],
        "id INT, qty INT, price FLOAT, seg STRING",
    )
    write_manifested(df, path, "seg", stats_cols=["qty"])


def _inventory(path: str) -> dict[str, float]:
    return {
        f: os.path.getmtime(f) for f in glob.glob(f"{path}/seg=*/__v*/*.parquet")
    }


def test_alter_add_and_widen_metadata_only(spark, tmp_path):
    from etl_demo_spark.io.manifest import alter_manifested, read_manifested

    path = str(tmp_path / "t")
    _seed(spark, path)
    before = _inventory(path)
    alter_manifested(
        spark,
        path,
        add_columns={"note": "string"},
        widen_types={"qty": "bigint", "price": "double"},
    )
    assert _inventory(path) == before, "ALTER must touch no data file"
    out = read_manifested(spark, path)
    types = dict(out.dtypes)
    assert types["qty"] == "bigint" and types["price"] == "double"
    assert out.filter("note is null").count() == 3
    got = {r.id: (r.qty, r.price) for r in out.collect()}
    assert got == {1: (10, 1.5), 2: (20, 2.5), 3: (30, 3.5)}


def test_alter_rename_reads_old_files_and_new_writes(spark, tmp_path):
    """The column-mapping contract: after a rename, old files read under
    the frozen physical name, later merges write under it, and both
    coexist in one scan; stats pruning keys by the NEW logical name."""
    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        alter_manifested,
        merge_upsert_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    alter_manifested(spark, path, rename_columns={"qty": "quantity"})
    out = read_manifested(spark, path)
    assert {r.id: r.quantity for r in out.collect()} == {1: 10, 2: 20, 3: 30}

    src = spark.createDataFrame(
        [(4, 40, 4.5, "B")], "id INT, quantity INT, price FLOAT, seg STRING"
    )
    merge_upsert_manifested(spark, path, src, ["id"], "seg")
    got = {r.id: r.quantity for r in read_manifested(spark, path).collect()}
    assert got == {1: 10, 2: 20, 3: 30, 4: 40}
    # the new file's bytes carry the PHYSICAL name
    fs, jvm = _hadoop_fs(spark, path)
    doc = _load_doc(fs, jvm, path)
    assert doc["column_mapping"]["quantity"] == "qty"
    raw = spark.read.parquet(*[
        f for f in read_manifested(spark, path).inputFiles() if "seg=B" in f
    ])
    assert "qty" in raw.columns and "quantity" not in raw.columns

    # stats rekeyed: pruning works in logical names, loses no rows
    pruned = read_manifested(spark, path, prune_ranges={"quantity": (35, 50)})
    assert {
        r.id for r in pruned.filter("quantity between 35 and 50").collect()
    } == {4}


def test_alter_readd_renamed_name_gets_fresh_physical(spark, tmp_path):
    """rename a→b then add a fresh 'a': the new column must NOT read the
    old files' bytes — its physical name is suffixed away from the frozen
    one (Delta column-mapping rule)."""
    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        alter_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    alter_manifested(spark, path, rename_columns={"qty": "quantity"})
    alter_manifested(spark, path, add_columns={"qty": "int"})
    fs, jvm = _hadoop_fs(spark, path)
    doc = _load_doc(fs, jvm, path)
    assert doc["column_mapping"]["quantity"] == "qty"
    assert doc["column_mapping"]["qty"] != "qty"
    out = read_manifested(spark, path)
    assert out.filter("qty is null").count() == 3
    assert {r.quantity for r in out.collect()} == {10, 20, 30}


def test_alter_drop_and_time_travel(spark, tmp_path):
    from etl_demo_spark.io.manifest import (
        alter_manifested,
        manifest_versions,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    alter_manifested(spark, path, drop_columns=["price"])
    out = read_manifested(spark, path)
    assert "price" not in out.columns
    assert {r.id for r in out.collect()} == {1, 2, 3}
    # pre-drop snapshot still reads the column (files were never touched)
    vs = manifest_versions(spark, path)
    prior = read_manifested(spark, path, version=vs[-2])
    assert dict(prior.dtypes)["price"] == "float"
    assert {r.price for r in prior.collect()} == {1.5, 2.5, 3.5}


def test_alter_validation_and_guards(spark, tmp_path):
    from etl_demo_spark.io.manifest import alter_manifested

    path = str(tmp_path / "t")
    _seed(spark, path)
    with pytest.raises(ValueError, match="no operation"):
        alter_manifested(spark, path)
    with pytest.raises(ValueError, match="partition column"):
        alter_manifested(spark, path, rename_columns={"seg": "segment"})
    with pytest.raises(ValueError, match="no such column"):
        alter_manifested(spark, path, drop_columns=["ghost"])
    with pytest.raises(ValueError, match="already exists"):
        alter_manifested(spark, path, add_columns={"qty": "int"})
    with pytest.raises(ValueError, match="rename target"):
        alter_manifested(spark, path, rename_columns={"qty": "price"})
    with pytest.raises(ValueError, match="not a reader-safe widening"):
        alter_manifested(spark, path, widen_types={"qty": "float"})
    with pytest.raises(ValueError, match="more than one operation"):
        alter_manifested(
            spark, path, drop_columns=["qty"], widen_types={"qty": "bigint"}
        )


def test_alter_swap_and_chain_renames_keep_physical_bytes(spark, tmp_path):
    """Swap (a<->b) and chain (a->b, b->c) renames in ONE ALTER must
    rekey the column mapping atomically from the pre-ALTER snapshot —
    sequential pop/insert silently points logical names at the wrong
    physical bytes."""
    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        alter_manifested,
        read_manifested,
    )

    # swap qty <-> price: qty must now hold the old prices and vice versa
    path = str(tmp_path / "swap")
    _seed(spark, path)
    alter_manifested(
        spark, path, rename_columns={"qty": "price", "price": "qty"}
    )
    fs, jvm = _hadoop_fs(spark, path)
    doc = _load_doc(fs, jvm, path)
    assert doc["column_mapping"]["price"] == "qty"
    assert doc["column_mapping"]["qty"] == "price"
    got = {r.id: (r.price, r.qty) for r in read_manifested(spark, path).collect()}
    assert got == {1: (10, 1.5), 2: (20, 2.5), 3: (30, 3.5)}

    # chain qty->price, price->cost in one ALTER
    path2 = str(tmp_path / "chain")
    _seed(spark, path2)
    alter_manifested(
        spark, path2, rename_columns={"qty": "price", "price": "cost"}
    )
    doc2 = _load_doc(*_hadoop_fs(spark, path2), path2)
    assert doc2["column_mapping"]["price"] == "qty"
    assert doc2["column_mapping"]["cost"] == "price"
    got2 = {
        r.id: (r.price, r.cost) for r in read_manifested(spark, path2).collect()
    }
    assert got2 == {1: (10, 1.5), 2: (20, 2.5), 3: (30, 3.5)}


def test_alter_duplicate_rename_targets_rejected(spark, tmp_path):
    from etl_demo_spark.io.manifest import alter_manifested

    path = str(tmp_path / "t")
    _seed(spark, path)
    with pytest.raises(ValueError, match="duplicate rename targets"):
        alter_manifested(
            spark, path, rename_columns={"qty": "x", "price": "x"}
        )
    # rename landing on a column ADDED in the same ALTER is also a clash
    with pytest.raises(ValueError, match="rename target"):
        alter_manifested(
            spark,
            path,
            rename_columns={"qty": "x"},
            add_columns={"x": "int"},
        )


def test_alter_drop_then_readd_surfaces_null_not_stale_bytes(spark, tmp_path):
    """Dropping a column tombstones its physical name: a later add of the
    same logical name must take a FRESH physical name so old files
    surface NULL, not the dropped column's stale bytes."""
    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        alter_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)  # no column mapping yet — drop must freeze one
    alter_manifested(spark, path, drop_columns=["price"])
    fs, jvm = _hadoop_fs(spark, path)
    doc = _load_doc(fs, jvm, path)
    assert doc["dropped_physical"] == ["price"]
    assert "price" not in doc["column_mapping"]

    alter_manifested(spark, path, add_columns={"price": "double"})
    doc = _load_doc(fs, jvm, path)
    assert doc["column_mapping"]["price"] != "price", (
        "re-added column reused the tombstoned physical name — old files "
        "would resurrect dropped data"
    )
    out = read_manifested(spark, path)
    assert out.filter("price is null").count() == 3
    assert {r.id for r in out.collect()} == {1, 2, 3}


def test_alter_rename_onto_column_dropped_same_alter(spark, tmp_path):
    """rename qty->price while dropping price in the same ALTER: the name
    is freed by the drop; the renamed column keeps its own bytes and the
    dropped column's physical name is tombstoned."""
    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        alter_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    alter_manifested(
        spark, path, drop_columns=["price"], rename_columns={"qty": "price"}
    )
    doc = _load_doc(*_hadoop_fs(spark, path), path)
    assert doc["column_mapping"]["price"] == "qty"
    assert doc["dropped_physical"] == ["price"]
    got = {r.id: r.price for r in read_manifested(spark, path).collect()}
    assert got == {1: 10, 2: 20, 3: 30}


def test_alter_composes_with_dv_and_compaction(spark, tmp_path):
    """The mapped table stays a full citizen of the DML surface: DV
    deletes, change feed, and a materializing compaction all run on a
    renamed schema; the physical rewrite lands in physical names so a
    later read still resolves."""
    from etl_demo_spark.io.manifest import (
        alter_manifested,
        compact_manifested,
        delete_rows_manifested,
        manifest_versions,
        read_changes,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    alter_manifested(spark, path, rename_columns={"qty": "quantity"})
    v_pre = manifest_versions(spark, path)[-1]
    assert delete_rows_manifested(spark, path, F.col("quantity") == 20) == 1
    v_post = manifest_versions(spark, path)[-1]

    ch = read_changes(spark, path, v_pre, v_post)
    got = {(r.id, r.quantity, r._change_type) for r in ch.collect()}
    assert got == {(2, 20, "delete")}

    compact_manifested(spark, path, min_files=1)
    got2 = sorted((r.id, r.quantity) for r in read_manifested(spark, path).collect())
    assert got2 == [(1, 10), (3, 30)]


def test_check_constraints_gate_commits(spark, tmp_path):
    """Delta-style CHECK constraints: ADD validates the existing table,
    later merges/updates validate their STAGED slice and are refused
    wholesale on violation (table unchanged, version unchanged); NULL
    passes (SQL CHECK semantics); DROP lifts the gate; ALTER refuses to
    rename/drop a constrained column."""
    import pytest

    from etl_demo_spark.io.manifest import (
        ConstraintViolation,
        add_constraint_manifested,
        alter_manifested,
        drop_constraint_manifested,
        manifest_versions,
        merge_upsert_manifested,
        read_manifested,
        update_where_manifested,
        write_manifested,
    )

    path = str(tmp_path / "t")
    rows = [(1, 10, "A"), (2, None, "A"), (3, 30, "B")]
    write_manifested(
        spark.createDataFrame(rows, "id INT, qty INT, seg STRING"), path, "seg"
    )
    add_constraint_manifested(spark, path, "qty_pos", "qty > 0")  # NULL passes

    # ADD against violating existing data is refused
    with pytest.raises(ConstraintViolation, match="qty_small"):
        add_constraint_manifested(spark, path, "qty_small", "qty < 20")

    # violating merge refused wholesale; table and version unchanged
    vs = manifest_versions(spark, path)
    bad = spark.createDataFrame([(9, -5, "A"), (8, 7, "B")], "id INT, qty INT, seg STRING")
    with pytest.raises(ConstraintViolation, match="qty_pos"):
        merge_upsert_manifested(spark, path, bad, ["id"], "seg")
    assert manifest_versions(spark, path) == vs
    assert {r.id for r in read_manifested(spark, path).collect()} == {1, 2, 3}

    # valid merge passes
    good = spark.createDataFrame([(8, 7, "B")], "id INT, qty INT, seg STRING")
    merge_upsert_manifested(spark, path, good, ["id"], "seg")
    assert {r.id for r in read_manifested(spark, path).collect()} == {1, 2, 3, 8}

    # violating UPDATE refused
    with pytest.raises(ConstraintViolation, match="qty_pos"):
        update_where_manifested(
            spark, path, {"qty": F.lit(-1)}, F.col("id") == 1, "seg"
        )

    # constrained column is rename/drop-protected
    with pytest.raises(ValueError, match="referenced by CHECK"):
        alter_manifested(spark, path, rename_columns={"qty": "quantity"})
    with pytest.raises(ValueError, match="referenced by CHECK"):
        alter_manifested(spark, path, drop_columns=["qty"])

    # DROP lifts the gate
    drop_constraint_manifested(spark, path, "qty_pos")
    update_where_manifested(
        spark, path, {"qty": F.lit(-1)}, F.col("id") == 1, "seg"
    )
    got = {r.id: r.qty for r in read_manifested(spark, path).collect()}
    assert got[1] == -1


def test_manifest_properties_surface(spark, tmp_path):
    """DESCRIBE EXTENDED for the layer: version, schema, constraints,
    mapping, DV summary — one metadata-only DataFrame."""
    from etl_demo_spark.io.manifest import (
        add_constraint_manifested,
        alter_manifested,
        delete_rows_manifested,
        manifest_properties,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    alter_manifested(spark, path, rename_columns={"qty": "quantity"})
    add_constraint_manifested(spark, path, "q_pos", "quantity > 0")
    delete_rows_manifested(spark, path, F.col("id") == 2)

    props = {r.key: r.value for r in manifest_properties(spark, path).collect()}
    assert props["n_leaves"] == "2"
    assert props["schema.quantity"] == "int"
    assert props["constraint.q_pos"] == "quantity > 0"
    assert props["column_mapping.quantity"] == "qty"
    assert props["dv.deleted_rows"] == "1"
    assert int(props["version"]) >= 4
    assert int(props["rows_physical"]) == 3  # DV rows still physical


def test_repartition_manifested_atomic_relayout(spark, tmp_path):
    """Change the partitioning in one atomic commit: rows identical, new
    k=v layout on disk, time travel reads the OLD layout, DVs are
    materialized by the rewrite, stats recompute for the new files, and
    constraints carry."""
    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        add_constraint_manifested,
        delete_rows_manifested,
        load_manifest,
        manifest_versions,
        read_manifested,
        repartition_manifested,
        write_manifested,
    )

    path = str(tmp_path / "t")
    df = spark.range(100).select(
        "id",
        (F.col("id") % 4).cast("string").alias("k"),
        (F.col("id") % 3).alias("g"),
    )
    write_manifested(df.repartition(3), path, "k", stats_cols=["id"])
    add_constraint_manifested(spark, path, "id_pos", "id >= 0")
    assert delete_rows_manifested(spark, path, F.col("id") < 10) == 10
    v_old = manifest_versions(spark, path)[-1]

    leaves = repartition_manifested(spark, path, "g")
    assert sorted(leaves) == ["g=0", "g=1", "g=2"]
    _, mapping = load_manifest(spark, path)
    assert all(rel.startswith("g=") for rel in mapping)

    got = sorted(r.id for r in read_manifested(spark, path).collect())
    assert got == list(range(10, 100))
    # the rewrite materialized the DVs and dropped the pointer
    fs, jvm = _hadoop_fs(spark, path)
    doc = _load_doc(fs, jvm, path)
    assert "dv" not in doc
    assert doc.get("constraints") == {"id_pos": "id >= 0"}
    # stats recomputed under the new layout, pruning still works
    pruned = read_manifested(spark, path, prune_ranges={"id": (90, 99)})
    assert len(pruned.inputFiles()) <= len(read_manifested(spark, path).inputFiles())
    assert sorted(
        r.id for r in pruned.filter(F.col("id") >= 90).collect()
    ) == list(range(90, 100))
    # time travel: the pre-relayout snapshot reads the OLD layout
    old = read_manifested(spark, path, version=v_old)
    assert any("/k=" in f for f in old.inputFiles())
    assert sorted(r.id for r in old.collect()) == list(range(10, 100))

    # a renamed (non-identity-mapped) column cannot become the partition
    # key — its physical name would be ambiguous as a directory name
    from etl_demo_spark.io.manifest import (
        alter_manifested,
        drop_constraint_manifested,
    )

    drop_constraint_manifested(spark, path, "id_pos")
    alter_manifested(spark, path, rename_columns={"id": "row_id"})
    with pytest.raises(ValueError, match="identity-mapped"):
        repartition_manifested(spark, path, "row_id")


def test_drop_tombstone_respected_by_merge_schema_evolution(spark, tmp_path):
    """The drop tombstone must bind ALL paths that mint physical names:
    a schema-evolving MERGE re-introducing a dropped logical name gets a
    SUFFIXED physical name, so old files surface NULL for it instead of
    the dropped column's stale bytes."""
    from pyspark.sql import functions as F

    from etl_demo_spark.io.manifest import (
        _hadoop_fs,
        _load_doc,
        alter_manifested,
        merge_upsert_manifested,
        read_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)
    alter_manifested(spark, path, drop_columns=["price"])

    src = spark.createDataFrame(
        [(4, 40, "B", 9.99)], "id INT, qty INT, seg STRING, price DOUBLE"
    )
    merge_upsert_manifested(
        spark, path, src, ["id"], "seg", schema_evolution=True
    )
    doc = _load_doc(*_hadoop_fs(spark, path), path)
    assert doc["column_mapping"]["price"] != "price", (
        "merge evolution reused the tombstoned physical name"
    )
    out = read_manifested(spark, path)
    got = {r.id: r.price for r in out.collect()}
    assert got == {1: None, 2: None, 3: None, 4: 9.99}


def test_alter_rekeys_adaptive_bloom_blobs(spark, tmp_path):
    """Renaming a bloom column rekeys its packed per-file bitsets to the
    new logical name and point-lookup pruning keeps working — files were
    never touched, so the bitsets (keyed by logical name) must follow
    the rename."""
    from pyspark.sql import functions as F

    from etl_demo_spark.io.manifest import (
        alter_manifested,
        read_manifested,
        write_manifested,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 4000).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("dt"),
    )
    write_manifested(df.repartition(8), path, "dt", bloom_cols=["id"])
    n_files = len(read_manifested(spark, path).inputFiles())

    alter_manifested(spark, path, rename_columns={"id": "item_id"})
    probe = read_manifested(spark, path, prune_points={"item_id": 1234})
    assert len(probe.inputFiles()) < n_files / 2
    assert probe.filter(F.col("item_id") == 1234).count() == 1


def test_manifest_history_operations(spark, tmp_path):
    """DESCRIBE HISTORY surface: every commit carries its operation
    label through both delta and full-snapshot encodings; resolution
    never inherits a parent's label; rows outside the retention window
    stay listed as audit metadata with readable=False."""
    from etl_demo_spark.io.manifest import (
        alter_manifested,
        delete_where_manifested,
        manifest_history,
        merge_upsert_manifested,
        update_where_manifested,
    )

    path = str(tmp_path / "t")
    _seed(spark, path)  # v1 CREATE
    src = spark.createDataFrame(
        [(4, 40, 4.5, "B")], "id INT, qty INT, price FLOAT, seg STRING"
    )
    merge_upsert_manifested(spark, path, src, ["id"], "seg")       # v2
    delete_where_manifested(spark, path, F.col("id") == 2, "seg")  # v3
    update_where_manifested(
        spark, path, {"qty": F.col("qty") + 1}, F.col("id") == 1, "seg"
    )                                                              # v4
    alter_manifested(spark, path, add_columns={"note": "string"})  # v5

    h = {r["version"]: r for r in manifest_history(spark, path).collect()}
    assert h[1]["operation"] == "CREATE" and h[1]["is_delta"] is False
    assert h[2]["operation"] == "MERGE"
    assert h[3]["operation"] == "DELETE"
    assert h[4]["operation"] == "UPDATE"
    assert h[5]["operation"] == "ALTER"
    # newest two readable (retention=2), older rows audit-only
    assert h[5]["readable"] and h[4]["readable"]
    assert not h[1]["readable"] and not h[2]["readable"] and not h[3]["readable"]
    # timestamps monotone non-decreasing along versions
    ts = [h[v]["committed_at"] for v in sorted(h)]
    assert all(a <= b for a, b in zip(ts, ts[1:]))
    # delta commits carry their parent pointer
    deltas = [r for r in h.values() if r["is_delta"]]
    assert deltas and all(r["parent"] is not None for r in deltas)


def test_alter_carries_adaptive_bloom_config_across_full_snapshot(
    spark, tmp_path
):
    """ADVICE r7 (medium): alter_manifested must carry bloom_fpr and
    bloom_bits_max, not just bloom_bits/bloom_k. With a non-default
    bloom_bits_max (65536), dropping the key on a _FULL_EVERY
    full-snapshot boundary would make prune_files_bloom fall back to a
    16384-bit build width whose probe positions no longer match the
    stored bitsets — files that DO contain the probed value would be
    wrongly pruned (silent missing rows)."""
    from pyspark.sql import functions as F

    from etl_demo_spark.io.manifest import (
        _FULL_EVERY,
        _hadoop_fs,
        _load_doc,
        alter_manifested,
        merge_upsert_manifested,
        read_manifested,
        write_manifested,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 4000).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("dt")
    )
    write_manifested(
        df.repartition(8), path, "dt", bloom_cols=["id"], bloom_bits_max=65536
    )  # v1
    alter_manifested(spark, path, add_columns={"note": "string"})  # v2
    # push past the next full-snapshot boundary with merges so the ALTER
    # doc's key set is what survives the delta chain's re-encoding
    v = 2
    while v % _FULL_EVERY != 0:
        src = spark.createDataFrame(
            [(4000 + v, str(v % 2), None)], "id BIGINT, dt STRING, note STRING"
        )
        merge_upsert_manifested(spark, path, src, ["id"], "dt")
        v += 1
    doc = _load_doc(*_hadoop_fs(spark, path), path)
    assert doc.get("bloom_bits_max") == 65536, doc.keys()
    assert "bloom_fpr" in doc
    # and pruning still finds a value that IS present
    probe = read_manifested(spark, path, prune_points={"id": 1234})
    assert probe.filter(F.col("id") == 1234).count() == 1


def test_bloom_config_validation_rejects_bad_widths(spark, tmp_path):
    """ADVICE r7 (medium): non-power-of-two bloom_bits_max (or a
    bloom_bits not a multiple of 64) silently loses set bits and
    mis-masks probes — must raise up front."""
    import pytest
    from pyspark.sql import functions as F

    from etl_demo_spark.io.manifest import manifest_init, write_manifested

    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("dt")
    )
    with pytest.raises(ValueError, match="power of two"):
        write_manifested(
            df, str(tmp_path / "a"), "dt", bloom_cols=["id"],
            bloom_bits_max=10000,
        )
    with pytest.raises(ValueError, match="power of two"):
        write_manifested(
            df, str(tmp_path / "b"), "dt", bloom_cols=["id"],
            bloom_bits_max=128,  # below the 256 floor
        )
    with pytest.raises(ValueError, match="multiple of 64"):
        write_manifested(
            df, str(tmp_path / "c"), "dt", bloom_cols=["id"], bloom_bits=100
        )
    p = str(tmp_path / "d")
    df.write.partitionBy("dt").parquet(p)
    with pytest.raises(ValueError, match="power of two"):
        manifest_init(spark, p, ["dt"], bloom_cols=["id"], bloom_bits_max=3000)
    # the valid shapes still work
    write_manifested(
        df, str(tmp_path / "e"), "dt", bloom_cols=["id"], bloom_bits_max=4096
    )
    write_manifested(
        df, str(tmp_path / "f"), "dt", bloom_cols=["id"], bloom_bits=1024
    )
