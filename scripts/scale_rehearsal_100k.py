"""100k-file METADATA rehearsal for the SPLIT stats layout.

The 10k-file rehearsal builds a real table; at 100k files the data
write alone would dominate wall-clock without telling us anything new —
the question at this scale is purely METADATA: does snapshot resolve
stay O(leaves), does a commit stay O(touched leaves), and does a
leaf-scoped read load only its leaves' stats files? So this script
synthesizes the metadata the layout would hold for a 100k-file table
(1,000 leaves x 100 files, realistic per-file stats incl. adaptive
bloom blobs at the same ~1.4 KB the real collector emits) using the
module's OWN writer/encoder/resolver paths, then times:

  * v1 publish (all leaves)          — the one-time O(table) migration
  * snapshot resolve                  — pointer map only
  * a commit touching 1 leaf          — encode + leaf stats write
  * a commit touching 10 leaves
  * leaf-scoped stats load (1 leaf)   — what a filtered read pays
  * full stats load (all leaves)      — what an unfiltered probe pays
  * embedded-layout v1 for contrast   — document bytes + resolve

Acceptance (round-7 VERDICT task 1): resolve and commit cost sublinear
in total files — O(touched leaves) — with the snapshot document
pointer-sized.

    python scripts/scale_rehearsal_100k.py --files 100000

Numbers land in docs/SCALE_LAYOUT.md (round-8 addendum).
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import random
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def synth_entries(leaf: str, vrel: str, files_per_leaf: int, rng) -> dict:
    """Per-file stats shaped exactly like _collect_file_stats output:
    min/max for one stats column, __rows, and a packed adaptive bloom
    blob at 8192 bits (the size the real collector picks for ~500-row
    files at the default fpr) — ~1.4 KB base64 per file, matching the
    measured real-table footprint."""
    out = {}
    for i in range(files_per_leaf):
        words = bytes(rng.getrandbits(8) for _ in range(8192 // 8))
        out[f"{vrel}/part-{i:05d}.parquet"] = {
            "v": [rng.randint(0, 10), rng.randint(90, 100)],
            "__rows": 500,
            "__bloom_id": base64.b64encode(words).decode(),
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=100_000)
    ap.add_argument("--leaves", type=int, default=1_000)
    args = ap.parse_args()

    from etl_demo_spark.io import manifest as M
    from etl_demo_spark.session import get_spark

    spark = get_spark(app_name="scale-100k")
    spark.sparkContext.setLogLevel("ERROR")

    files_per_leaf = max(1, args.files // args.leaves)
    root = tempfile.mkdtemp(prefix="rehearsal_100k_") + "/t"
    fs, jvm = M._hadoop_fs(spark, root)
    rng = random.Random(8)

    leaves = [f"dt={i:04d}" for i in range(args.leaves)]
    mapping = {rel: f"{rel}/{M._vdir(1)}" for rel in leaves}

    schema_json = (
        '{"type":"struct","fields":['
        '{"name":"id","type":"long","nullable":true,"metadata":{}},'
        '{"name":"v","type":"long","nullable":true,"metadata":{}},'
        '{"name":"dt","type":"string","nullable":true,"metadata":{}}]}'
    )
    base_doc = {
        "version": 1,
        "partitions": mapping,
        "schema": schema_json,
        "operation": "CREATE",
        "stats_cols": ["v"],
        "bloom_cols": ["id"],
        "bloom_k": 4,
        "bloom_fpr": 0.01,
        "bloom_bits_max": 16384,
    }

    # ---- split layout: write per-leaf stats files + pointer-map v1
    t0 = time.perf_counter()
    fm = {}
    token = "aaaaaaaa"
    for rel in leaves:
        fname = M._split_leaf_fname(1, token, rel)
        M._write_leaf_stats(
            fs, jvm, root, fname,
            synth_entries(rel, mapping[rel], files_per_leaf, rng),
        )
        fm[rel] = fname
    doc1 = {**base_doc, "files_manifests": fm, "committed_at_ms": 1}
    assert M._publish_cas(
        fs, jvm, M._manifest_path(root, 1),
        json.dumps(doc1, indent=1).encode(),
    )
    t_publish_all = time.perf_counter() - t0
    split_snapshot_bytes = os.path.getsize(
        M._manifest_path(root, 1).replace("file:", "")
    )

    # ---- resolve: pointer map only, no stats load
    t0 = time.perf_counter()
    doc = M._load_doc(fs, jvm, root)
    t_resolve = time.perf_counter() - t0
    assert len(doc["files_manifests"]) == args.leaves and "files" not in doc

    # ---- commit touching K leaves: delta encode + K leaf stats writes
    def touch_commit(version: int, k: int) -> tuple[float, int]:
        prev = M._load_doc(fs, jvm, root)
        t0 = time.perf_counter()
        touched = leaves[:k]
        new_p = dict(prev["partitions"])
        new_fm = dict(prev["files_manifests"])
        tok = f"t{version:07d}"
        for rel in touched:
            vrel = f"{rel}/{M._vdir(version, tok)}"
            new_p[rel] = vrel
            fname = M._split_leaf_fname(version, tok, rel)
            M._write_leaf_stats(
                fs, jvm, root, fname,
                synth_entries(rel, vrel, files_per_leaf, rng),
            )
            new_fm[rel] = fname
        new_doc = {
            "version": version,
            "partitions": new_p,
            "schema": prev["schema"],
            "files_manifests": new_fm,
            "operation": "MERGE",
        }
        M._carry_stats_config(prev, new_doc)
        data = M._encode_commit(prev, new_doc)
        assert M._publish_cas(fs, jvm, M._manifest_path(root, version), data)
        return time.perf_counter() - t0, len(data)

    t_commit_1, delta_bytes_1 = touch_commit(2, 1)
    t_commit_10, delta_bytes_10 = touch_commit(3, 10)

    # ---- resolve through the delta chain (still pointer-only)
    t0 = time.perf_counter()
    doc = M._load_doc(fs, jvm, root)
    t_resolve_chain = time.perf_counter() - t0

    # ---- leaf-scoped stats load vs full load
    M._LEAF_STATS_CACHE.clear()
    t0 = time.perf_counter()
    one = M._read_split_stats(fs, jvm, root, doc, leaves={leaves[5]})
    t_load_1leaf = time.perf_counter() - t0
    assert len(one) == files_per_leaf
    M._LEAF_STATS_CACHE.clear()
    t0 = time.perf_counter()
    allstats = M._read_split_stats(fs, jvm, root, doc)
    t_load_all = time.perf_counter() - t0
    n_files = len(allstats)
    stats_dir_bytes = sum(
        os.path.getsize(p)
        for p in Path(f"{root}/{M._STATS_SUBDIR}").glob("*.json")
    )

    # ---- embedded contrast: same metadata as one v1 document
    root2 = tempfile.mkdtemp(prefix="rehearsal_100k_emb_") + "/t"
    fs2, jvm2 = M._hadoop_fs(spark, root2)
    emb_files: dict = {}
    rng2 = random.Random(8)
    for rel in leaves:
        emb_files.update(
            synth_entries(rel, mapping[rel], files_per_leaf, rng2)
        )
    t0 = time.perf_counter()
    emb_doc = {**base_doc, "files": emb_files, "committed_at_ms": 1}
    assert M._publish_cas(
        fs2, jvm2, M._manifest_path(root2, 1),
        json.dumps(emb_doc, indent=1).encode(),
    )
    t_emb_publish = time.perf_counter() - t0
    emb_bytes = os.path.getsize(M._manifest_path(root2, 1).replace("file:", ""))
    t0 = time.perf_counter()
    M._load_doc(fs2, jvm2, root2)
    t_emb_resolve = time.perf_counter() - t0

    out = {
        "files": n_files,
        "leaves": args.leaves,
        "split": {
            "publish_all_sec": round(t_publish_all, 2),
            "snapshot_bytes": split_snapshot_bytes,
            "stats_dir_bytes": stats_dir_bytes,
            "resolve_sec": round(t_resolve, 4),
            "resolve_chain_sec": round(t_resolve_chain, 4),
            "commit_1leaf_sec": round(t_commit_1, 4),
            "commit_1leaf_delta_bytes": delta_bytes_1,
            "commit_10leaf_sec": round(t_commit_10, 4),
            "commit_10leaf_delta_bytes": delta_bytes_10,
            "stats_load_1leaf_sec": round(t_load_1leaf, 4),
            "stats_load_all_sec": round(t_load_all, 2),
        },
        "embedded": {
            "publish_sec": round(t_emb_publish, 2),
            "snapshot_bytes": emb_bytes,
            "resolve_sec": round(t_emb_resolve, 2),
        },
    }
    print(json.dumps(out))
    shutil.rmtree(os.path.dirname(root), ignore_errors=True)
    shutil.rmtree(os.path.dirname(root2), ignore_errors=True)


if __name__ == "__main__":
    main()
