"""Unit tests for dedup / similarity / text / multimodal operators —
the approximate ones get brute-force oracles on planted fixtures."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near-dup of 1
    (3, "completely different content about spark query engines and shuffles here"),
    (4, "The  Quick Brown fox jumps over the lazy dog near the river bank today"),  # case/ws dup of 1
    (5, "entirely unrelated text regarding neural networks and training corpora"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])


def test_embedding_near_dups_corpus_query_non_vacuous(spark):
    """The driver-run corpus query must emit real pairs (round-2 finding:
    0 rows proved nothing). The planted scaled copies guarantee ≥ n pairs
    at cosine 1.0; every emitted pair clears the 0.9 threshold."""
    from etl_demo_spark.corpus import QUERIES

    rows = QUERIES["embedding_near_dups"](spark, SF0001).collect()
    n_vecs = spark.read.parquet(f"{SF0001}/embeddings.parquet").count()
    assert len(rows) >= n_vecs  # the scaled plants alone
    assert all(r.cos_sim >= 0.9 for r in rows)
    exact = sum(1 for r in rows if r.cos_sim == 1.0)
    assert exact >= n_vecs  # orig<->scaled recovered for every vector


def test_embedding_near_dup_pairs_perturbed_recall(spark):
    """The approximate side of LSH near-dup, pinned honestly: an
    alternating ±20% reweighted copy keeps cosine ≈ 0.98 in expectation
    (E[w]/√E[w²] = 1/√1.04), but the reweighting perturbs the hyperplane
    projections, so
    single-probe bucketing recovers most-not-all of the planted pairs.
    (The corpus query `embedding_near_dups` pins the guaranteed
    scale-invariant plants with an exact oracle; this test covers the
    probabilistic-recall claim the oracle deliberately excludes.)"""
    from etl_demo_spark.vec import embedding_near_dup_pairs

    emb = (
        spark.read.parquet(f"{SF0001}/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    reweighted = emb.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * F.when(i % 2 == 0, F.lit(1.2)).otherwise(F.lit(0.8)),
        ).alias("embedding"),
    )
    pairs = embedding_near_dup_pairs(
        emb.unionByName(reweighted), threshold=0.9, planes=6
    ).collect()
    n = emb.count()
    assert all(r.cos_sim >= 0.9 for r in pairs)
    # every emitted pair is a planted one (raw corpus max cosine ≈ 0.51)
    assert all(r.id_b - r.id_a == 1_000_000 for r in pairs)
    assert len(pairs) >= 0.3 * n  # bucketing recovers a solid majority…
    # …but the perturbation does flip some buckets at planes=6 (if this
    # ever hits n, the plant stopped exercising the approximate path)
    assert len(pairs) < n


def test_exact_dedup_fingerprint_normalizes(spark, docs_df):
    from etl_demo_spark.dedup import exact_dedup_by_fingerprint

    out = exact_dedup_by_fingerprint(docs_df).collect()
    groups = {r["keeper_id"]: r["n_copies"] for r in out}
    assert groups[1] == 2  # doc 4 collapses onto doc 1 (case+whitespace)
    assert groups[2] == 1 and groups[3] == 1 and groups[5] == 1


def test_minhash_lsh_finds_planted_near_dup(spark, docs_df):
    from etl_demo_spark.dedup import jaccard_verify, minhash_lsh_candidates

    cands = minhash_lsh_candidates(docs_df, num_hashes=32, bands=16, shingle_k=3)
    verified = jaccard_verify(cands, docs_df, threshold=0.5)
    pairs = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert (1, 2) in pairs or (1, 4) in pairs  # the planted near-dups surface
    # unrelated docs never pair: every verified pair must stay within the
    # planted near-dup family {1, 2, 4} — docs 3 and 5 are unrelated to
    # everything, so no surviving pair may touch them at all
    assert all({a, b} <= {1, 2, 4} for a, b in pairs), pairs


def test_jaccard_values_match_bruteforce(spark, docs_df):
    """Exact Jaccard from the Spark pipeline equals a Python brute force."""
    from etl_demo_spark.dedup import jaccard_verify, minhash_lsh_candidates

    def shingle_set(t: str, k=3):
        toks = t.strip().split()
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    cands = minhash_lsh_candidates(docs_df, num_hashes=32, bands=16)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_verify(cands, docs_df, threshold=0.0).collect()}
    texts = dict(DOCS)
    for (a, b), j in got.items():
        sa, sb = shingle_set(texts[a]), shingle_set(texts[b])
        expected = len(sa & sb) / len(sa | sb)
        assert abs(j - expected) < 1e-12, (a, b)


def test_fused_near_dup_matches_two_stage(spark, docs_df):
    """The fused single-pass pipeline (explode→hash-agg signatures with
    hash-set verification) must produce the same pairs + identical exact
    Jaccard as the legacy candidates→jaccard_verify composition, and its
    signature mins must equal the per-row array-fold signature."""
    from etl_demo_spark.dedup import (
        hash_shingles,
        jaccard_verify,
        minhash_lsh_candidates,
        minhash_near_dup_pairs,
        minhash_signature,
        minhash_signature_table,
        shingles,
    )

    legacy = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_verify(
            minhash_lsh_candidates(docs_df, num_hashes=32, bands=16), docs_df, threshold=0.0
        ).collect()
    }
    fused = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dup_pairs(docs_df, num_hashes=32, bands=16, threshold=0.0).collect()
    }
    assert fused == legacy

    fold_sigs = {
        r["id"]: r["sig"]
        for r in docs_df.select(
            F.col("doc_id").alias("id"),
            minhash_signature(hash_shingles(shingles("text", 3)), 32).alias("sig"),
        ).collect()
    }
    agg_sigs = {
        r["id"]: r["sig"] for r in minhash_signature_table(docs_df, num_hashes=32).collect()
    }
    assert agg_sigs == fold_sigs


def test_simhash_table_equals_columnwise_fold(spark, docs_df):
    """The scalable explode+agg SimHash must produce identical signatures
    to the per-row array fold."""
    from etl_demo_spark.dedup import pack_bits, simhash_bits, simhash_table

    a = {r["id"]: r["simhash"] for r in simhash_table(docs_df).collect()}
    b = {
        r["doc_id"]: r["s"]
        for r in docs_df.select("doc_id", pack_bits(simhash_bits("text")).alias("s")).collect()
    }
    assert a == b


def test_simhash_near_for_near_dups_far_for_unrelated(spark, docs_df):
    from etl_demo_spark.dedup import hamming_distance, simhash_bits

    sigs = docs_df.select("doc_id", simhash_bits("text").alias("bits"))
    a, b = sigs.alias("a"), sigs.alias("b")
    dists = {
        (r["ida"], r["idb"]): r["d"]
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("ida"),
            F.col("b.doc_id").alias("idb"),
            hamming_distance(F.col("a.bits"), F.col("b.bits")).alias("d"),
        )
        .collect()
    }
    assert dists[(1, 2)] < dists[(1, 3)]
    assert dists[(1, 2)] < dists[(3, 5)]


# ---------------------------------------------------------------------------
# Vector similarity
# ---------------------------------------------------------------------------


def test_lsh_topk_recall_vs_bruteforce(spark):
    from etl_demo_spark.vec import brute_force_topk, lsh_topk

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    qv = [float(v) for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["vec_id"] for r in brute_force_topk(emb, qv, k=10).collect()]
    approx = [r["vec_id"] for r in lsh_topk(emb, qv, k=10, planes=4).collect()]
    # planes=4 → 16 buckets over 500 vecs (~31/bucket): decent recall floor;
    # the query vector itself must always be found (cos=1.0)
    assert 0 in approx
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.3, f"recall {recall}"


def test_ivf_topk_recall_vs_bruteforce(spark):
    from etl_demo_spark.vec import brute_force_topk, ivf_topk

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    qv = [float(v) for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["vec_id"] for r in brute_force_topk(emb, qv, k=10).collect()]
    approx = [r["vec_id"] for r in ivf_topk(emb, qv, k=10, n_cells=8, nprobe=3).collect()]
    # the query vector lives in its own best cell, so it must be found
    assert 0 in approx
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.3, f"recall {recall}"


def test_lsh_topk_exact_matches_fast_topology(spark):
    """The md5/integer exact variant (the oracle-grade twin the corpus
    query runs) behaves like an LSH: always finds the query row, recall
    vs brute force at the corpus parameters, and returns exactly k rows
    sorted by (cos_sim desc, vec_id asc)."""
    from etl_demo_spark.vec import brute_force_topk, lsh_topk_exact

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    qv = [float(v) for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["vec_id"] for r in brute_force_topk(emb, qv, k=10).collect()]
    rows = lsh_topk_exact(emb, qv, k=10, planes=6, probe_radius=2).collect()
    approx = [r["vec_id"] for r in rows]
    assert len(rows) == 10
    assert 0 in approx
    sims = [r["cos_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.3, f"recall {recall}"


def test_ivf_topk_exact_matches_fast_topology(spark):
    """Exact-arithmetic IVF twin: query row always found (its own cell is
    the closest probe by construction), recall floor vs brute force, and
    deterministic across two runs (no RNG state anywhere)."""
    from etl_demo_spark.vec import brute_force_topk, ivf_topk_exact

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    qv = [float(v) for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["vec_id"] for r in brute_force_topk(emb, qv, k=10).collect()]
    r1 = ivf_topk_exact(emb, qv, k=10, n_cells=16, nprobe=4).collect()
    r2 = ivf_topk_exact(emb, qv, k=10, n_cells=16, nprobe=4).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
    approx = [r["vec_id"] for r in r1]
    assert 0 in approx
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.3, f"recall {recall}"


def test_int8_topk_recall_vs_bruteforce(spark):
    from etl_demo_spark.vec import brute_force_topk, int8_topk

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    qv = [float(v) for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["vec_id"] for r in brute_force_topk(emb, qv, k=10).collect()]
    approx = [r["vec_id"] for r in int8_topk(emb, k=10, query_id=0).collect()]
    # quantized-dot ranking of the query against itself dominates: the
    # query row must come back, and int8 quantization error should cost
    # at most a couple of tail positions vs the exact cosine ranking
    assert 0 in approx
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, f"recall {recall}"


def test_ivf_assign_covers_all_rows(spark):
    from etl_demo_spark.vec import ivf_assign

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    assigned, centroids = ivf_assign(emb, n_cells=8)
    assert len(centroids) == 8
    stats = assigned.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cell").alias("lo"),
        F.max("cell").alias("hi"),
    ).first()
    assert stats["n"] == emb.count()
    assert 1 <= stats["lo"] and stats["hi"] <= 8


def test_cosine_self_is_one(spark):
    from etl_demo_spark.vec import brute_force_topk

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    qv = [float(v) for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    top = brute_force_topk(emb, qv, k=1).collect()[0]
    assert top["vec_id"] == 0
    assert abs(top["cos_sim"] - 1.0) < 1e-6


# ---------------------------------------------------------------------------
# Text
# ---------------------------------------------------------------------------


def test_lang_id_on_known_languages(spark):
    from etl_demo_spark.text import lang_id

    samples = [
        ("en", "the cat and the dog went to the park and it is sunny"),
        ("de", "der hund und die katze sind nicht mit dem mann"),
        ("fr", "le chat est dans la maison et les enfants pour jouer"),
        ("es", "el perro y el gato que es de los niños por la casa"),
        ("zh", "今天天气很好我们一起去公园散步吧这是一个测试"),
    ]
    df = spark.createDataFrame([Row(lang=l, text=t) for l, t in samples])
    got = {r["lang"]: r["pred"] for r in df.select("lang", lang_id("text").alias("pred")).collect()}
    assert got == {l: l for l, _ in samples}


def test_rolling_hashes_shift_invariance(spark):
    """Identical 8-token windows produce identical hashes regardless of
    surrounding context (the property winnowing relies on)."""
    from etl_demo_spark.text import rolling_hashes

    shared = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [Row(doc_id=1, text=f"PREFIX {shared} SUFFIX"), Row(doc_id=2, text=f"{shared} other tail words")]
    )
    rows = df.select("doc_id", rolling_hashes("text", window=8).alias("h")).collect()
    h = {r["doc_id"]: set(r["h"]) for r in rows}
    assert h[1] & h[2], "shared shingle hash must appear in both docs"


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


def test_media_features_deterministic(spark, docs_df):
    from etl_demo_spark.multimodal import documents_as_media, extract_features

    media = documents_as_media(docs_df)
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    for doc_id, text in DOCS:
        b = text.encode("utf-8")
        r = feats[doc_id]
        assert r["sha256"] == hashlib.sha256(b).hexdigest()
        assert r["n_bytes"] == len(b)
        assert abs(r["byte_mean"] - sum(b) / len(b)) < 1e-12


def test_decode_stubs_raise_cleanly(spark, docs_df):
    """Every decode stage is real now and follows filter-don't-fail:
    non-video blobs yield ZERO frame rows, non-image blobs yield NULL
    dims / NULL content — never task failures (see
    test_decode_image_real_headers, test_resize_images_real_png,
    test_jpeg.py, test_video.py)."""
    from etl_demo_spark.multimodal import (
        documents_as_media,
        resize_images,
        sample_video_frames,
    )

    media = documents_as_media(docs_df)
    assert sample_video_frames(media).count() == 0  # text blobs: no container
    # text blobs are not PNGs: real resize maps them to NULL content
    out = resize_images(media).limit(3).collect()
    assert all(r["content"] is None for r in out)
    assert all(r["meta"]["mime"] == "image/unsupported" for r in out)


def test_image_dimensions_parses_png_gif_bmp_jpeg():
    """Stdlib header parser vs hand-crafted streams of all four formats
    (the PNG comes from the repo's own RFC-2083 encoder)."""
    import struct

    import numpy as np

    from etl_demo_spark.io.png import png_bytes
    from etl_demo_spark.multimodal import image_dimensions

    png = png_bytes(np.zeros((7, 13, 3), dtype=np.uint8))
    assert image_dimensions(png) == (13, 7, "RGB")

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert image_dimensions(gif) == (320, 200, "P")

    # BITMAPINFOHEADER with negative (top-down) height and 24bpp
    bmp = (
        b"BM" + b"\x00" * 16
        + struct.pack("<ii", 640, -480)
        + b"\x00\x00" + struct.pack("<H", 24) + b"\x00" * 4
    )
    assert image_dimensions(bmp) == (640, 480, "RGB")

    # JPEG: SOI, APP0 segment, then SOF0 (baseline) with 3 components
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 9
    jpeg = b"\xff\xd8" + app0 + sof0
    assert image_dimensions(jpeg) == (640, 480, "RGB")

    assert image_dimensions(b"not an image at all") is None
    assert image_dimensions(b"") is None
    assert image_dimensions(png[:10]) is None  # truncated PNG header


def test_decode_image_real_headers(spark, docs_df):
    """decode_image default path: real PNG blobs decode to their true
    dimensions; non-image blobs yield NULL dims (never task failures)."""
    import numpy as np
    from pyspark.sql import Row

    from etl_demo_spark.io.png import png_bytes
    from etl_demo_spark.multimodal import decode_image, documents_as_media

    rows = [
        Row(media_id=1, content=bytearray(png_bytes(np.zeros((4, 9, 3), dtype=np.uint8)))),
        Row(media_id=2, content=bytearray(b"garbage bytes")),
        Row(media_id=3, content=None),
    ]
    media = spark.createDataFrame(rows, "media_id bigint, content binary")
    got = {r["media_id"]: r for r in decode_image(media).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["mode"]) == (9, 4, "RGB")
    assert got[2]["width"] is None and got[2]["mode"] is None
    assert got[3]["width"] is None

    # text-as-media blobs (no image headers) → all-NULL dims, no errors
    text_decoded = decode_image(documents_as_media(docs_df)).collect()
    assert len(text_decoded) == len(DOCS)
    assert all(r["width"] is None for r in text_decoded)


def test_fake_codec_plumbing_end_to_end(spark, docs_df):
    """The decode / frame-sample / resize plumbing must run for real
    (Arrow batches, declared schemas) with the deterministic fake codec:
    fixed schemas, deterministic values, correct fan-out counts, and a
    composable blob-in/blob-out resize."""
    import hashlib

    from etl_demo_spark.multimodal import (
        decode_image,
        documents_as_media,
        extract_features,
        resize_images,
        sample_video_frames,
    )

    media = documents_as_media(docs_df)
    blobs = {r["media_id"]: bytes(r["content"]) for r in media.collect()}

    dec = {r["media_id"]: r for r in decode_image(media, use_fake_codec=True).collect()}
    assert set(dec) == set(blobs)
    for mid, b in blobs.items():
        d = hashlib.sha256(b).digest()
        assert dec[mid]["width"] == 1 + d[0] % 64
        assert dec[mid]["height"] == 1 + d[1] % 64

    frames = sample_video_frames(media, every_n=40, use_fake_codec=True).collect()
    by_id: dict[int, list] = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    for mid, b in blobs.items():
        expected_n = (len(b) + 39) // 40
        got = sorted(by_id[mid], key=lambda r: r["frame_idx"])
        assert len(got) == expected_n, mid
        assert bytes(got[0]["frame"]) == b[:40]

    resized = resize_images(media, target_bytes=32, use_fake_codec=True)
    # blob-in/blob-out: the resized table feeds the SAME feature stage
    feats = {r["media_id"]: r for r in extract_features(resized).collect()}
    for mid, b in blobs.items():
        assert feats[mid]["n_bytes"] == 32
        expected = b[:32].ljust(32, b"\0")
        assert feats[mid]["sha256"] == hashlib.sha256(expected).hexdigest()


# ---------------------------------------------------------------------------
# Every corpus query executes at sf0.001 (incl. rows-only ones)
# ---------------------------------------------------------------------------


def test_all_queries_execute_smoke(spark):
    import __spark_entry__ as entrymod

    for name, fn in entrymod.queries().items():
        df = fn(spark, SF0001)
        df.count()  # the smoke IS the successful execution
        assert df.columns, name


def test_connected_components_match_union_find(spark):
    """Min-label propagation must produce exactly the components a
    Python union-find derives from the same edge list — including
    chains (A-B, B-C) that LSH-bucket cliques don't exercise."""
    from etl_demo_spark.dedup import connected_components

    edges = [(1, 2), (2, 3), (5, 6), (7, 7), (10, 11), (11, 12), (12, 13), (3, 4)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {x: find(x) for x in parent}

    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == expected


def test_corpus_prep_pipeline_end_to_end(spark, tmp_path):
    """The composed prep job: output is split-partitioned, every kept doc
    passes the gates, no two kept docs share a fingerprint, and the
    near-dup representatives are the min-id per cluster."""
    from etl_demo_spark.pipelines.corpus_prep import (
        CorpusPrepConfig,
        run_corpus_prep,
    )
    from etl_demo_spark.text import fingerprint

    out = str(tmp_path / "prep")
    stats = run_corpus_prep(
        spark, "/root/testdata/sf0.01/documents.parquet", out,
        CorpusPrepConfig(min_chars=50, min_tokens=5),
    )
    assert set(stats) <= {"train", "val", "test", "_pipeline"}
    assert "train" in stats and stats["train"]["n_docs"] > 0
    pipe = stats["_pipeline"]
    assert pipe["input_docs"] >= pipe["passed_quality_gates"] >= pipe["kept_after_dedup"]
    assert pipe["kept_after_dedup"] == sum(
        v["n_docs"] for k, v in stats.items() if k != "_pipeline"
    )

    back = spark.read.parquet(out)
    assert "split" in back.columns
    import pyspark.sql.functions as F

    assert back.filter(F.length("text") < 50).count() == 0
    dupes = (
        back.select(fingerprint("text").alias("fp"))
        .groupBy("fp").count().filter(F.col("count") > 1).count()
    )
    assert dupes == 0
    # train fraction lands near 80% (hash-uniform; wide tolerance)
    total = sum(v["n_docs"] for k, v in stats.items() if k != "_pipeline")
    assert 0.6 < stats["train"]["n_docs"] / total < 0.95


def test_stratified_sample_proportions(spark):
    """sampleBy must land near the requested per-stratum fractions and be
    reproducible for a fixed seed."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    fractions = {lang: 0.5 for lang in totals}
    s1 = docs.sampleBy("lang", fractions=fractions, seed=7)
    s2 = docs.sampleBy("lang", fractions=fractions, seed=7)
    n1 = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    n2 = {r["lang"]: r["n"] for r in s2.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert n1 == n2  # seeded reproducibility
    for lang, total in totals.items():
        if total >= 40:  # skip tiny strata where variance dominates
            frac = n1.get(lang, 0) / total
            assert 0.3 < frac < 0.7, (lang, frac, total)


def test_hll_sketch_rollup_near_exact(spark):
    """The self-certifying daily_user_sketches frame: every week's
    merged-sketch estimate is in-bound (within_bound TRUE) and the
    exact_users column matches an independently computed exact count."""
    import __spark_entry__ as em

    rows = em.queries()["daily_user_sketches"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows and all(r["within_bound"] for r in rows)

    from etl_demo_spark.io.sources import load_tables

    ev = load_tables(spark, "/root/testdata/sf0.01", tables=("events",))["events"]
    exact = {
        r["week"]: r["n"]
        for r in ev.groupBy(
            F.to_date(F.date_trunc("week", F.date_trunc("day", "ts"))).alias("week")
        ).agg(F.countDistinct("user_id").alias("n")).collect()
    }
    got = {r["week"]: r["exact_users"] for r in rows}
    assert got == exact


def test_approx_sketches_within_error_bounds(spark):
    """The self-certifying sketch frames: within_bound TRUE and the
    exact columns match independent recomputation (the estimates
    themselves live only inside the boolean now — the frames are
    hash-oracled against DuckDB by the driver)."""
    import __spark_entry__ as em

    q = em.queries()
    row = q["approx_distinct_parts"](spark, "/root/testdata/sf0.01").collect()[0]
    assert row["within_bound"] is True
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    assert row["exact_parts"] == li.select("l_partkey").distinct().count()

    row = q["approx_percentiles"](spark, "/root/testdata/sf0.01").collect()[0]
    assert row["within_bound"] is True
    assert 0 < row["p50"] <= row["p95"] <= row["p99"]


def test_star_components_match_union_find_on_random_graphs(spark):
    """large-star/small-star must agree with Python union-find on random
    graphs including long chains (the case that stresses its O(log^2 n)
    advantage over plain label propagation)."""
    import random

    from etl_demo_spark.dedup import connected_components_star

    rng = random.Random(7)
    cases = []
    # a long chain, a star, and three random graphs
    cases.append([(i, i + 1) for i in range(16)])
    cases.append([(0, i) for i in range(1, 12)])
    for _ in range(2):
        n = 30
        cases.append([
            (rng.randrange(n), rng.randrange(n)) for _ in range(20)
        ])

    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {x: find(x) for x in parent}

        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {r["id"]: r["component"] for r in connected_components_star(df).collect()}
        assert got == expected, edges


def test_cogroup_survives_streaming_legacy_conf(spark):
    """Regression: with the nanos-as-long legacy conf enabled (as the
    streaming queries leave it in a shared session), the cogroup query's
    worker frames can arrive column-less on one side — the function must
    treat that as an empty side, not crash."""
    import __spark_entry__ as em

    saved = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = em.queries()["cogroup_click_purchase_stats"](spark, "/root/testdata/sf0.001")
        assert df.count() > 0
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", saved)


def test_knn_join_self_match_ranks_first(spark):
    """In the self-join every query's nearest neighbor must be itself
    (cosine 1.0 at rank 1 — same bucket by construction), and each query
    returns at most k ranked candidates."""
    from etl_demo_spark.vec import knn_join

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    out = knn_join(emb, emb, k=3).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    assert len(by_q) == emb.count()
    for q, rows in by_q.items():
        assert len(rows) <= 3
        top = min(rows, key=lambda r: r["rank"])
        assert top["rank"] == 1 and top["c_id"] == q and top["cos_sim"] == 1.0, q


def test_cosine_batch_udf_matches_hof_fold(spark):
    """The numpy pandas-UDF cosine must agree with the JVM fold to float
    tolerance on real embeddings (different accumulation orders — exact
    equality is not expected)."""
    from pyspark.sql import functions as F

    from etl_demo_spark.vec import cosine, cosine_batch_udf

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qv = [r["embedding"] for r in emb.filter(F.col("vec_id") == 0).collect()][0]
    qcol = F.array(*[F.lit(float(v)) for v in qv])
    hof = {r["vec_id"]: r["c"] for r in emb.select(
        "vec_id", cosine(F.col("embedding"), qcol).alias("c")).collect()}
    udf = cosine_batch_udf([float(v) for v in qv])
    vec = {r["vec_id"]: r["c"] for r in emb.select(
        "vec_id", udf(F.col("embedding")).alias("c")).collect()}
    assert set(hof) == set(vec)
    for k in hof:
        assert abs(hof[k] - vec[k]) < 1e-9, k
    assert abs(vec[0] - 1.0) < 1e-9  # self-cosine


def test_term_stats_counts_docs_and_occurrences(spark):
    """df counts documents containing the term (not occurrences); total_tf
    counts occurrences. Repeats within a doc must not inflate doc_freq."""
    from etl_demo_spark.text import term_stats

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "c c c")], "doc_id long, text string"
    )
    got = {r.term: (r.doc_freq, r.total_tf) for r in term_stats(docs).collect()}
    assert got == {"a": (2, 3), "b": (1, 1), "c": (2, 4)}


def test_bm25_matches_python_reference(spark):
    """Spark BM25 equals a straightforward Python implementation on a tiny
    corpus, and a doc with more query-term hits outscores a longer doc
    with fewer."""
    import math

    from etl_demo_spark.text import bm25_scores

    corpus = {
        10: "spark join spark filter",
        11: "join scan scan scan scan scan scan",
        12: "filter scan sort",
        13: "spark",
    }
    terms = ["spark", "join"]
    k1, b = 1.2, 0.75
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in bm25_scores(docs, terms).collect()}

    n = len(corpus)
    dls = {d: len(t.split()) for d, t in corpus.items()}
    avgdl = sum(dls.values()) / n
    dfq = {t: sum(1 for txt in corpus.values() if t in txt.split()) for t in terms}

    def ref_score(doc_id):
        s = 0.0
        for t in terms:
            tf = corpus[doc_id].split().count(t)
            if tf == 0:
                continue
            idf = math.log((n - dfq[t] + 0.5) / (dfq[t] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * dls[doc_id] / avgdl))
        return s

    expected = {d: ref_score(d) for d in corpus if ref_score(d) > 0.0}
    assert set(got) == set(expected)
    for d in expected:
        assert got[d] == pytest.approx(expected[d], abs=1e-12), d
    assert got[10] > got[11]  # two hits in a short doc beat one hit in a long one


def test_kmeans_recovers_separable_blobs(spark):
    """Lloyd's iterations on three well-separated blobs: members of a blob
    land in one cluster, distinct blobs land in distinct clusters, and the
    fitted centroids sit at the blob means."""
    from etl_demo_spark.vec import kmeans_fit, kmeans_predict

    blobs = {0: [100.0, 0.0], 1: [0.0, 100.0], 2: [-100.0, -100.0]}
    rows = []
    vid = 0
    for b, center in blobs.items():
        for dx, dy in [(0, 0), (1, 0), (0, 1), (-1, 0), (0, -1)]:
            rows.append((vid, b, [center[0] + dx, center[1] + dy]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, blob int, embedding array<double>")

    centroids = kmeans_fit(df, k=3, n_iter=4)
    out = kmeans_predict(df, centroids).select("vec_id", "blob", "cluster").collect()
    by_blob: dict[int, set[int]] = {}
    for r in out:
        by_blob.setdefault(r.blob, set()).add(r.cluster)
    assert all(len(cs) == 1 for cs in by_blob.values()), by_blob
    assert len({next(iter(cs)) for cs in by_blob.values()}) == 3

    # converged centroids == blob means (offsets cancel)
    got = sorted(tuple(round(x, 9) for x in c) for c in centroids)
    want = sorted((float(c[0]), float(c[1])) for c in blobs.values())
    assert got == [tuple(w) for w in want]


def test_kmeans_exact_blobs_and_partition_invariance(spark):
    """kmeans_fit_exact: (1) recovers separable blobs like the float fit;
    (2) the selling point — centroids are BIT-IDENTICAL under any
    repartitioning (integer accumulators have no summation-order
    freedom; float means do not guarantee this); (3) empty clusters
    raise loudly instead of silently diverging from the SQL oracle."""
    import pytest as _pytest

    from etl_demo_spark.vec import _kmeans_assign_exact_udf, kmeans_fit_exact, quantize_vec_expr

    blobs = {0: [100.0, 0.0], 1: [0.0, 100.0], 2: [-100.0, -100.0]}
    rows = []
    vid = 0
    for b, center in blobs.items():
        for dx, dy in [(0, 0), (1, 0), (0, 1), (-1, 0), (0, -1)]:
            rows.append((vid, b, [center[0] + dx, center[1] + dy]))
            vid += 1
    # seeds are vec_id < k, so ids 0..2 must span blobs: reorder ids
    rows = [(i, b, v) for i, (_, b, v) in enumerate(sorted(rows, key=lambda r: (r[0] % 5, r[1])))]
    df = spark.createDataFrame(rows, "vec_id long, blob int, embedding array<double>")

    c1 = kmeans_fit_exact(df, k=3, n_iter=4)
    # blob membership: quantized centroid / 1000 lands on the blob mean
    got = sorted(tuple(round(x / 1000, 6) for x in c) for c in c1)
    want = sorted((float(c[0]), float(c[1])) for c in blobs.values())
    assert got == [tuple(w) for w in want]

    for n_parts in (1, 7):
        c2 = kmeans_fit_exact(df.repartition(n_parts), k=3, n_iter=4)
        assert c2 == c1  # bit-identical, not approximately equal

    # exact assignment ties break to the smallest cluster id
    tie_df = spark.createDataFrame([(0, [0.0, 0.0])], "vec_id long, embedding array<double>")
    assign = _kmeans_assign_exact_udf([[1000, 0], [0, 1000], [-1000, 0]])
    r = tie_df.select(assign(quantize_vec_expr("embedding")).alias("c")).first()
    assert r["c"] == 0  # clusters 0, 1, 2 all at distance 1000² — first wins

    # k > distinct points: some cluster must empty out -> loud error
    tiny = spark.createDataFrame(
        [(i, [0.0, 0.0]) for i in range(4)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="empty cluster"):
        kmeans_fit_exact(tiny, k=4, n_iter=2)


def test_pii_scrub_redacts_and_counts(spark):
    """Emails and phone-shaped numbers are replaced and counted; clean text
    passes through byte-identical."""
    from etl_demo_spark.text import pii_counts, scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@foo.co.uk or call 555-867-5309 x"),
            (2, "nothing sensitive here"),
            (3, "two mails: a@b.io c@d.org and +1 415 555 1234"),
        ],
        "id long, text string",
    )
    n_em, n_ph = pii_counts("text")
    got = {
        r.id: (r.e, r.p, r.s)
        for r in df.select(
            "id", n_em.alias("e"), n_ph.alias("p"), scrub_pii("text").alias("s")
        ).collect()
    }
    assert got[1][0] == 1 and got[1][1] == 1
    assert got[1][2] == "mail me at <EMAIL> or call <PHONE> x"
    assert got[2] == (0, 0, "nothing sensitive here")
    assert got[3][0] == 2 and got[3][1] == 1
    assert "<EMAIL>" in got[3][2] and "<PHONE>" in got[3][2]
    assert "@" not in got[3][2]


def test_incremental_dedup_across_batches(spark):
    """Batch 2 drops docs whose fingerprints were accepted in batch 1
    (even under whitespace/case reformatting), keeps novel docs, and the
    store accumulates exactly the kept fingerprints."""
    from etl_demo_spark.dedup import incremental_dedup

    b1 = spark.createDataFrame(
        [(1, "the quick fox"), (2, "hello world"), (3, "the  QUICK fox")],
        "doc_id long, text string",
    )
    kept1, store1 = incremental_dedup(b1, None)
    assert {r.doc_id for r in kept1.collect()} == {1, 2}  # 3 dups 1 within-batch

    b2 = spark.createDataFrame(
        [(10, "Hello   World"), (11, "genuinely new"), (12, "genuinely new")],
        "doc_id long, text string",
    )
    kept2, store2 = incremental_dedup(b2, store1)
    assert {r.doc_id for r in kept2.collect()} == {11}  # 10 dups batch-1 doc 2
    assert store2.count() == 3  # fox, world, new
    # idempotence: replaying batch 2 against the new store admits nothing
    kept3, _ = incremental_dedup(b2, store2)
    assert kept3.count() == 0


def test_embedding_index_build_query_and_prune(spark, tmp_path):
    """Index build writes one directory per cell with a codebook sidecar;
    querying reads ONLY the probed cell partitions (file-level pruning)
    and achieves full recall vs brute force when probing all cells."""
    from etl_demo_spark.pipelines.embedding_index import build_index, query_index
    from etl_demo_spark.vec import brute_force_topk

    src = "/root/testdata/sf0.001/embeddings.parquet"
    dest = str(tmp_path / "idx")
    n = build_index(spark, src, dest, n_cells=8)
    assert n == 8
    cell_dirs = {p.name for p in (tmp_path / "idx").glob("cell=*")}
    assert len(cell_dirs) >= 2  # vectors spread over multiple cells

    emb = spark.read.parquet(src)
    qvec = [float(v) for v in emb.orderBy("vec_id").first()["embedding"]]

    # probing every cell == exact brute force (same rounding + tiebreak)
    got_all = query_index(spark, dest, qvec, k=5, nprobe=8)
    want = brute_force_topk(emb, qvec, k=5)
    assert [(r.vec_id, r.cos_sim) for r in got_all.collect()] == [
        (r.vec_id, r.cos_sim) for r in want.collect()
    ]

    # narrow probe: the cell filter must land in the scan's
    # PartitionFilters (directory-level pruning), not a post-scan Filter
    got_narrow = query_index(spark, dest, qvec, k=5, nprobe=2)
    got_narrow.collect()
    plan = got_narrow._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan[:1500]
    # the needle's own vector must rank first when its cell is probed
    top = got_narrow.first()
    assert top.cos_sim == 1.0


def test_kmeans_parallel_init_quality_and_recall(spark, tmp_path):
    """k-means|| init (VLDB'12) must (a) return exactly k deterministic
    centers, (b) reach equal-or-lower k-means cost than hash-seed init
    after the same Lloyd's iterations, and (c) give equal-or-better IVF
    recall at the same probe count. Everything here is deterministic
    (hash-uniform coin flips + fixed driver seed), so strict comparisons
    are stable."""
    from pyspark.sql import functions as F

    from etl_demo_spark.pipelines.embedding_index import build_index, query_index
    from etl_demo_spark.vec import (
        _min_dist2_udf,
        brute_force_topk,
        kmeans_fit,
        kmeans_parallel_init,
    )

    src = "/root/testdata/sf0.001/embeddings.parquet"
    emb = spark.read.parquet(src)

    init_a = kmeans_parallel_init(emb, k=8)
    init_b = kmeans_parallel_init(emb, k=8)
    assert len(init_a) == 8 and init_a == init_b  # deterministic

    def cost(centers):
        return (
            emb.select(_min_dist2_udf(centers)(F.col("embedding")).alias("d"))
            .agg(F.sum("d")).first()[0]
        )

    c_seed = kmeans_fit(emb, k=8, n_iter=3, init="seed")
    c_par = kmeans_fit(emb, k=8, n_iter=3, init="parallel")
    assert cost(c_par) <= cost(c_seed) * 1.001  # equal-or-better clustering

    # recall at the same nprobe: parallel-init codebook >= seed-init
    qids = [r.vec_id for r in emb.select("vec_id").orderBy("vec_id").limit(200).collect()][::40]
    vecs = {
        r.vec_id: [float(v) for v in r.embedding]
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }
    want = {q: {r.vec_id for r in brute_force_topk(emb, vecs[q], k=10).collect()} for q in qids}

    recall = {}
    for init in ("seed", "parallel"):
        dest = str(tmp_path / f"idx_{init}")
        build_index(spark, src, dest, n_cells=8, kmeans_iters=3, init=init)
        hits = tot = 0
        for q in qids:
            got = {r.vec_id for r in query_index(spark, dest, vecs[q], k=10, nprobe=2).collect()}
            hits += len(want[q] & got)
            tot += len(want[q])
        recall[init] = hits / tot
    assert recall["parallel"] >= recall["seed"], recall
    assert recall["parallel"] >= 0.5, recall  # absolute floor at nprobe 2/8


def test_embedding_index_kmeans_codebook(spark, tmp_path):
    """kmeans-trained codebook: same layout and full recall when probing
    all cells; sidecar centroids are the trained ones (not raw seeds)."""
    from etl_demo_spark.pipelines.embedding_index import build_index, query_index
    from etl_demo_spark.vec import brute_force_topk

    src = "/root/testdata/sf0.001/embeddings.parquet"
    dest = str(tmp_path / "kidx")
    n = build_index(spark, src, dest, n_cells=4, kmeans_iters=2)
    assert n == 4
    import json as _json
    from pathlib import Path as _P

    from etl_demo_spark.pipelines.embedding_index import CODEBOOK_FILE

    meta = _json.loads((_P(dest) / CODEBOOK_FILE).read_text())
    assert meta["metric"] == "l2"  # k-means assigns by Euclidean distance

    emb = spark.read.parquet(src)
    qvec = [float(v) for v in emb.orderBy("vec_id").first()["embedding"]]
    got = query_index(spark, dest, qvec, k=5, nprobe=4)
    want = brute_force_topk(emb, qvec, k=5)
    assert [(r.vec_id, r.cos_sim) for r in got.collect()] == [
        (r.vec_id, r.cos_sim) for r in want.collect()
    ]

    # narrow probe must rank cells by the ASSIGNMENT metric (l2): the
    # needle's own cell is its l2-nearest centroid, so probing 1 cell
    # must still find the needle itself at cos_sim == 1.0
    top1 = query_index(spark, dest, qvec, k=1, nprobe=1).first()
    assert top1.cos_sim == 1.0


def test_minhash_family_survives_short_and_empty_docs(spark):
    """Short docs (< k tokens) and empty text must not crash the MinHash
    family (Spark's sequence(1, 0) counts DOWN), must be excluded from
    LSH banding (no all-NULL-signature candidate blowup), and real
    near-dups among normal docs must still surface."""
    from etl_demo_spark.dedup import (
        jaccard_verify,
        minhash_lsh_candidates,
        minhash_near_dup_pairs,
        shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, "hi"),                     # 1 token < k=3
            (2, ""),                       # empty
            (3, "just two"),               # 2 tokens
            (4, "the quick brown fox jumps over the lazy dog again"),
            (5, "the quick brown fox jumps over the lazy dog againn"),
        ],
        "doc_id long, text string",
    )
    sh = {r.doc_id: r.s for r in docs.select("doc_id", shingles("text").alias("s")).collect()}
    assert sh[1] == [] and sh[2] == [] and sh[3] == []
    assert len(sh[4]) == 8

    cands = minhash_lsh_candidates(docs, bands=16, num_hashes=64)
    pairs = {(r.id_a, r.id_b) for r in cands.collect()}
    assert (4, 5) in pairs
    assert all(a not in (1, 2, 3) and b not in (1, 2, 3) for a, b in pairs)

    verified = jaccard_verify(cands, docs, threshold=0.5)
    assert {(r.id_a, r.id_b) for r in verified.collect()} == {(4, 5)}

    fused = minhash_near_dup_pairs(docs, threshold=0.5)
    assert {(r.id_a, r.id_b) for r in fused.collect()} == {(4, 5)}


def test_minhash_rejects_indivisible_bands(spark):
    from etl_demo_spark.dedup import minhash_lsh_candidates

    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_candidates(docs, num_hashes=64, bands=10)


def test_rolling_hashes_survive_short_docs(spark):
    """Docs shorter than the window yield an empty hash array, not a
    sequence(1,0) slice crash."""
    from etl_demo_spark.text import rolling_hashes

    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, ""), (3, "a b c d e f g h i")],
        "id long, text string",
    )
    got = {r.id: r.h for r in df.select("id", rolling_hashes("text").alias("h")).collect()}
    assert got[1] == [] and got[2] == []
    assert len(got[3]) == 2  # 9 tokens, window 8 -> 2 positions


def test_split_assign_boundary_fractions(spark):
    """train+val == 1.0 must produce a real train/val split with an empty
    test set — not silently dump val docs into test (the 256 -> '100'
    three-char threshold bug)."""
    from etl_demo_spark.text import split_assign

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    got = {
        r.split: r.n
        for r in df.groupBy(split_assign("doc_id", 0.9, 0.1).alias("split"))
        .count().withColumnRenamed("count", "n").collect()
    }
    assert "test" not in got
    assert got["train"] + got["val"] == 1000
    assert got["val"] > 0
    # all-train degenerate config
    all_train = df.select(split_assign("doc_id", 1.0, 0.0).alias("s")).distinct().collect()
    assert {r.s for r in all_train} == {"train"}


def test_bm25_rejects_empty_and_dedupes_terms(spark):
    from etl_demo_spark.text import bm25_scores

    docs = spark.createDataFrame([(1, "spark join")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(docs, [])
    # duplicate terms: scored once, no ambiguous pivot columns
    got = bm25_scores(docs, ["spark", "spark"]).collect()
    assert len(got) == 1 and got[0].bm25 > 0


def test_media_features_null_content_yields_null_features(spark):
    """A NULL blob row produces NULL features, not a bytes(None) task
    crash; frame sampling skips NULL blobs; every_n=0 fails fast."""
    from etl_demo_spark.multimodal import (
        extract_features,
        sample_video_frames,
    )

    media = spark.createDataFrame(
        [(1, bytearray(b"abc"), ("x", 3)), (2, None, ("x", 0))],
        "media_id long, content binary, meta struct<mime string, n_bytes long>",
    )
    rows = {r.media_id: r for r in extract_features(media).collect()}
    assert rows[1].n_bytes == 3 and rows[1].sha256 is not None
    assert rows[2].sha256 is None and rows[2].n_bytes is None and rows[2].byte_mean is None

    frames = sample_video_frames(media, every_n=2, use_fake_codec=True).collect()
    assert {r.media_id for r in frames} == {1}

    with pytest.raises(ValueError, match="every_n"):
        sample_video_frames(media, every_n=0, use_fake_codec=True)


def test_edit_distance_join_equals_brute_force(spark):
    """q-gram-pruned edit-distance join == brute-force all-pairs, on a
    fixture exercising every pruning branch: short strings (< (k+1)q,
    the bounded fallback bucket), boundary distances (0 exact-dup input
    collapses, k, k+1 just over), and mixed short/long pairs."""
    from pyspark.sql import Row

    from etl_demo_spark.dedup import edit_distance_join

    words = [
        "cat", "car", "cart", "care", "bare",          # short-bucket chains
        "spark engine", "spark engines", "spork engine",
        "sparc engine", "shark engine",                 # long, ed 1-2 web
        "completely different phrase", "wholly unrelated text",
        "ab", "a", "", "xy",                            # degenerate shorts
    ]
    df = spark.createDataFrame([Row(s=w) for w in words])
    for k in (0, 1, 2):
        got = {
            (r.a, r.b): r.dist
            for r in edit_distance_join(df, str_col="s", threshold=k).collect()
        }
        import itertools

        def lev(x, y):
            prev = list(range(len(y) + 1))
            for i, cx in enumerate(x, 1):
                cur = [i]
                for j, cy in enumerate(y, 1):
                    cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (cx != cy)))
                prev = cur
            return prev[-1]

        want = {
            (a, b): lev(a, b)
            for a, b in itertools.combinations(sorted(set(words)), 2)
            if lev(a, b) <= k
        }
        assert got == want, (k, got.keys() ^ want.keys())


def test_prefix_filter_jaccard_join_equals_brute_force(spark):
    """The prefix-filtered similarity join is EXACT: same pairs and same
    jaccard values as the all-pairs join, including planted near-dups,
    at several thresholds (completeness would break first at low t)."""
    from pyspark.sql import functions as F

    from etl_demo_spark.dedup import prefix_filter_jaccard_join

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # subset keeps the BRUTE-FORCE side cheap (the quadratic theta join is
    # the oracle here, not the operator under test), spread so the
    # nested-loop comparison parallelizes
    from etl_demo_spark.ops import spread_for_cpu

    base = spread_for_cpu(docs.filter(F.col("doc_id") < 120).select("doc_id", "text"))
    # plant two extra near-dup variants of doc 0 to guarantee matches
    d0 = base.filter(F.col("doc_id") == 0).first()["text"]
    planted = spark.createDataFrame(
        [(90001, d0 + " tail"), (90002, "head " + d0)], "doc_id long, text string"
    )
    alld = base.unionByName(planted)
    sh = alld.select(
        F.col("doc_id").alias("id"),
        F.expr(
            "array_distinct(transform(sequence(1, length(text) - 4),"
            " i -> substring(text, i, 5)))"
        ).alias("shingles"),
    )
    inter = F.size(F.array_intersect("a.shingles", "b.shingles"))
    jac = inter.cast("double") / (
        F.size("a.shingles") + F.size("b.shingles") - inter
    ).cast("double")
    a, b = sh.alias("a"), sh.alias("b")
    # pre-hashed variant: the scale representation (longs per shingle);
    # identical jaccards absent 64-bit collisions (none on this corpus)
    sh_hashed = alld.select(
        F.col("doc_id").alias("id"),
        F.expr(
            "array_distinct(transform(sequence(1, length(text) - 4),"
            " i -> xxhash64(substring(text, i, 5))))"
        ).alias("shingles"),
    )
    for t in (0.5, 0.8):
        want = {
            (r["id_a"], r["id_b"]): round(r["j"], 9)
            for r in a.join(b, F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                jac.alias("j"),
            )
            .filter(F.col("j") >= t)
            .collect()
        }
        for inp, mode in ((sh, "rejoin"), (sh, "carry"), (sh_hashed, "rejoin")):
            got = {
                (r.id_a, r.id_b): round(r.jaccard, 9)
                for r in prefix_filter_jaccard_join(
                    inp, threshold=t, verify=mode
                ).collect()
            }
            assert got == want, (t, mode, len(got), len(want))
            assert any(90001 in k or 90002 in k for k in got), "planted dups missed"


def test_clustered_fixture_recall(spark):
    """The planted-cluster fixture (the realistic ANN regime — see
    vec.clustered_embeddings) must be deterministic and must lift both
    approximate indexes to >=0.8 MEAN recall@10 with the bench/corpus
    default probe parameters (lsh planes=6 radius=2, ivf 16 cells
    nprobe=4) — the >=0.8 floor the bench's `clustered` entry reports."""
    from etl_demo_spark.vec import ann_recall_report, clustered_embeddings

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    cl = clustered_embeddings(emb).persist()
    try:
        recall = ann_recall_report(cl, n_queries=5)
        assert recall["lsh"] >= 0.8, recall
        assert recall["ivf"] >= 0.8, recall
        # determinism: a second generation pass produces identical vectors
        again = clustered_embeddings(emb)
        a = cl.orderBy("vec_id").limit(5).collect()
        b = again.orderBy("vec_id").limit(5).collect()
        assert [r["embedding"] for r in a] == [r["embedding"] for r in b]
    finally:
        cl.unpersist()


# ---------------------------------------------------------------------------
# BPE tokenizer training (bpe.py)
# ---------------------------------------------------------------------------


def _ref_bpe_train(word_freqs: dict, k: int):
    """From-scratch Sennrich BPE: pair counts over (word, freq), merge the
    most frequent pair (ties → lexicographically smallest), greedy
    left-to-right non-overlapping apply. The exactness bar for bpe_train."""
    from etl_demo_spark.bpe import END

    vocab = {w: list(w) + [END] for w in word_freqs}
    merges = []
    for _ in range(k):
        counts: dict = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def _ref_apply(word: str, merges) -> list:
    from etl_demo_spark.bpe import END

    syms = list(word) + [END]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


BPE_CORPUS = {
    # overlap adversaries: greedy left-to-right must pair (1,2)(3,4), not (2,3)
    "aaaa": 11, "aaa": 7, "aa": 5, "ababab": 9, "abab": 4,
    # realistic morphology: shared suffixes/prefixes at varied frequencies
    "lowest": 6, "newest": 6, "widest": 3, "low": 5, "lower": 2, "new": 4,
    "newer": 3, "wide": 2, "wider": 1, "test": 8, "tests": 5, "tested": 3,
    "testing": 4, "retest": 1, "rest": 6, "rests": 2, "resting": 1,
    "ingest": 2, "invest": 3, "investing": 2, "string": 4, "strings": 2,
    # tie-bait: equal-count pairs force the lexicographic tie-break
    "xy": 3, "yx": 3, "xz": 3, "zx": 3, "q": 2,
}


def test_bpe_train_matches_reference_exactly(spark):
    from etl_demo_spark.bpe import bpe_train

    words = spark.createDataFrame(
        list(BPE_CORPUS.items()), "word STRING, freq LONG"
    )
    # k=40 crosses several checkpoint boundaries (checkpoint_every=8) and
    # runs past pair exhaustion on the small corpus → early-stop path too
    merges, final = bpe_train(words, 40, checkpoint_every=8)
    ref_merges, ref_vocab = _ref_bpe_train(BPE_CORPUS, 40)
    assert merges == ref_merges
    got = {r.word: list(r.symbols) for r in final.collect()}
    assert got == ref_vocab


def test_bpe_train_incremental_equals_naive_trainer(spark):
    """The incremental trainer (persisted pair-count table + per-merge
    deltas over the affected-word slice — the production-vocab scale
    shape) must be merge-for-merge AND table-for-table identical to the
    naive full-recount trainer on the adversarial corpus, including the
    overlap/tie fixtures and the past-exhaustion early stop. This
    equality is what keeps the corpus query's DuckDB recursive-CTE
    replay oracle valid for the incremental trainer."""
    from etl_demo_spark.bpe import bpe_train, bpe_train_incremental

    words = spark.createDataFrame(
        list(BPE_CORPUS.items()), "word STRING, freq LONG"
    )
    m_naive, f_naive = bpe_train(words, 40, checkpoint_every=8)
    m_incr, f_incr = bpe_train_incremental(words, 40)
    assert m_incr == m_naive
    got_n = {r.word: list(r.symbols) for r in f_naive.collect()}
    got_i = {r.word: list(r.symbols) for r in f_incr.collect()}
    assert got_i == got_n


def test_bpe_encode_matches_sequential_apply_incl_unseen(spark):
    from etl_demo_spark.bpe import bpe_encode, bpe_train

    words = spark.createDataFrame(
        list(BPE_CORPUS.items()), "word STRING, freq LONG"
    )
    merges, _ = bpe_train(words, 25)
    # seen words, an UNSEEN word built from trained subunits (rank-loop
    # apply must equal in-order sequential apply), punctuation/whitespace
    docs = spark.createDataFrame(
        [
            (1, "the lowest tests keep testing aaaa ababab"),
            (2, "unseen lowestest retesting xyq!  zx--aaab"),
            (3, ""),
            (4, None),
        ],
        "doc_id INT, text STRING",
    )
    got = {r.doc_id: list(r.bpe_tokens) for r in bpe_encode(docs, merges).collect()}
    import re

    for doc_id, text in [(1, "the lowest tests keep testing aaaa ababab"),
                         (2, "unseen lowestest retesting xyq!  zx--aaab")]:
        expect = []
        for w in re.findall("[a-z]+", text):
            expect.extend(_ref_apply(w, merges))
        assert got[doc_id] == expect, doc_id
    assert got[3] == [] and got[4] == []


def test_bpe_pair_counts_weighted(spark):
    from etl_demo_spark.bpe import _initial_symbols, pair_counts

    words = spark.createDataFrame([("ab", 3), ("b", 2)], "word STRING, freq LONG")
    got = {(r.a, r.b): r.cnt for r in pair_counts(_initial_symbols(words)).collect()}
    assert got == {("a", "b"): 3, ("b", "</w>"): 5}


# ---------------------------------------------------------------------------
# Span-level exact dedup (duplicate substrings)
# ---------------------------------------------------------------------------


def test_duplicate_span_profile_planted(spark):
    """Hand-computed fixture: an 8-token boilerplate shared by two docs
    is found as one merged span in each; a doc with NO repeated window
    is absent; overlapping duplicated windows merge into one span; a
    too-short doc yields no phantom windows (the descending-sequence
    guard)."""
    from pyspark.sql import Row

    from etl_demo_spark.dedup import duplicate_span_profile

    boiler = "please subscribe to our newsletter for updates today"  # 8 tokens
    docs = [
        Row(doc_id=1, text=f"unique alpha beta {boiler} gamma delta unique2"),
        Row(doc_id=2, text=f"{boiler} zeta eta theta completely different tail"),
        Row(doc_id=3, text="nothing here repeats anywhere at all in corpus honestly"),
        Row(doc_id=4, text="tiny doc"),  # < 8 tokens: zero windows
        # doc 5 repeats the boilerplate TWICE with a 1-token gap between
        # occurrences: windows overlap → islands merge into ONE span
        Row(doc_id=5, text=f"{boiler} x {boiler}"),
    ]
    got = {
        r.doc_id: (r.n_dup_windows, r.n_spans, r.dup_tokens)
        for r in duplicate_span_profile(spark.createDataFrame(docs)).collect()
    }
    # docs 1/2: exactly one 8-token window matches (the boilerplate);
    # doc 5: the boilerplate window at pos 0 and pos 9, plus every
    # 8-window inside "boiler x boiler" that occurs twice… compute:
    # doc5 tokens = 17; windows at 0..9; window 0 == window 9 (boiler),
    # so both are marked; gap 9 - 0 = 9 > 8 → TWO spans of 8 tokens.
    assert got[1] == (1, 1, 8)
    assert got[2] == (1, 1, 8)
    assert 3 not in got and 4 not in got
    assert got[5] == (2, 2, 16)


def test_strip_duplicate_spans_rebuild(spark):
    from pyspark.sql import Row

    from etl_demo_spark.dedup import strip_duplicate_spans

    boiler = "please subscribe to our newsletter for updates today"
    docs = [
        Row(doc_id=1, text=f"unique alpha beta {boiler} gamma delta"),
        Row(doc_id=2, text=f"{boiler} zeta eta theta completely different tail"),
        Row(doc_id=3, text="nothing here repeats anywhere at all in corpus honestly"),
        Row(doc_id=4, text="tiny doc"),
    ]
    got = {r.doc_id: r.text_deduped for r in strip_duplicate_spans(
        spark.createDataFrame(docs)).collect()}
    assert got[1] == "unique alpha beta gamma delta"
    assert got[2] == "zeta eta theta completely different tail"
    # clean docs keep their token stream (word tokens rejoined)
    assert got[3] == "nothing here repeats anywhere at all in corpus honestly"
    assert got[4] == "tiny doc"


def test_mixture_sample_targets_and_determinism(spark):
    from pyspark.sql import Row

    from etl_demo_spark.ops import mixture_sample

    rows = (
        [Row(id=i, d="big") for i in range(100)]
        + [Row(id=1000 + i, d="small") for i in range(4)]
    )
    df = spark.createDataFrame(rows)
    got = mixture_sample(df, "d", "id", alpha=0.5, seed="t").collect()
    by_d = {}
    for r in got:
        by_d.setdefault(r.d, []).append(r.id)
    # geometric-mean target: floor(sqrt(100*4)) = 20; small keeps all 4
    assert len(by_d["big"]) == 20 and len(by_d["small"]) == 4
    # deterministic: second run picks the identical ids
    again = mixture_sample(df, "d", "id", alpha=0.5, seed="t").collect()
    assert sorted(r.id for r in again) == sorted(r.id for r in got)
    # alpha=1 keeps natural proportions (everything, since n_d = c_d)
    assert mixture_sample(df, "d", "id", alpha=1.0).count() == 104
    import pytest

    with pytest.raises(ValueError):
        mixture_sample(df, "d", "id", alpha=1.5)


# ---------------------------------------------------------------------------
# Product quantization (vec.pq_*)
# ---------------------------------------------------------------------------


def test_pq_fit_encode_shapes_and_determinism(spark):
    """Codebooks are m × ksub × dsub ints; encoding yields m codes per
    vector; and the whole integer pipeline is bit-deterministic across
    repartitionings (the property the recursive-CTE oracle relies on)."""
    from etl_demo_spark.vec import pq_encode, pq_fit_exact

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    cb = pq_fit_exact(emb, m=4, ksub=8, n_iter=2)
    assert len(cb) == 4 and all(len(s) == 8 for s in cb)
    assert all(len(c) == 16 for s in cb for c in s)
    cb2 = pq_fit_exact(emb.repartition(13), m=4, ksub=8, n_iter=2)
    assert cb == cb2, "integer PQ training must be partitioning-invariant"

    codes = pq_encode(emb, cb)
    row = codes.filter(F.col("vec_id") == 0).first()
    assert len(row["codes"]) == 4
    assert all(0 <= c < 8 for c in row["codes"])
    assert codes.count() == emb.count()


def test_pq_topk_self_hit_and_recall(spark):
    """ADC ranking: the query's own code distance is the subspace
    quantization error (small), so the query row appears in its own
    top-k; on the planted-cluster fixture PQ recall@10 clears the same
    bar as the other ANN variants."""
    from etl_demo_spark.vec import (
        brute_force_topk,
        clustered_embeddings,
        pq_topk,
    )

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    got = pq_topk(emb, k=10, query_id=0, m=4, ksub=8, n_iter=2).collect()
    assert len(got) == 10
    ids = [r["vec_id"] for r in got]
    assert 0 in ids
    dists = [r["pq_dist"] for r in got]
    assert dists == sorted(dists), "ascending ADC distance"

    # ksub=32 on the 16-cluster fixture: with coarser codebooks (ksub=8)
    # within-cluster neighbors collapse onto identical codes and the
    # ranking inside a cluster degenerates to id ties — expected for a
    # COMPRESSOR (production stacks re-rank the PQ shortlist exactly);
    # finer codebooks restore the ordering this recall bar checks
    cl = clustered_embeddings(emb)
    qv = [float(v) for v in cl.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = {r["vec_id"] for r in brute_force_topk(cl, qv, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in pq_topk(cl, k=10, query_id=0, m=4, ksub=32, n_iter=3).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.5, f"clustered-fixture PQ recall {recall}"


def test_pq_validation(spark):
    import pytest

    from etl_demo_spark.vec import pq_fit_exact

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit_exact(emb, m=7)


def test_ivf_pq_topk_probes_and_ranks(spark):
    """IVF-PQ: self-hit in the probed cells, ascending ADC distance,
    exactly k rows, and candidates restricted to nprobe cells."""
    from etl_demo_spark.vec import ivf_pq_topk

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    got = ivf_pq_topk(
        emb, k=10, query_id=0, n_cells=8, nprobe=2, m=4, ksub=8, n_iter=2
    ).collect()
    assert len(got) == 10
    ids = [r["vec_id"] for r in got]
    assert 0 in ids
    dists = [r["pq_dist"] for r in got]
    assert dists == sorted(dists)


def test_ann_probe_curve_monotone_and_costed(spark):
    """The bench's recall-vs-probe operating curve: recall@k is monotone
    non-decreasing in the probe count for BOTH indexes (a larger radius /
    nprobe scans a candidate SUPERSET, so top-k can only move toward the
    exact top-k), and every point carries its theoretical scan fraction
    so the user can pick an operating point."""
    from etl_demo_spark.vec import ann_probe_curve

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    curve = ann_probe_curve(emb, n_queries=5)
    for index in ("lsh", "ivf"):
        pts = curve[index]
        assert len(pts) == 3
        recalls = [p["recall_at_k"] for p in pts]
        fracs = [p["scan_fraction"] for p in pts]
        assert recalls == sorted(recalls), (index, recalls)
        assert fracs == sorted(fracs) and fracs[-1] <= 1.0, (index, fracs)
        assert recalls[-1] > 0.0
    # the widest settings scan more and may not be free: fractions differ
    assert curve["ivf"][0]["scan_fraction"] < curve["ivf"][-1]["scan_fraction"]
    # round-10 hybrid tier: SQ8 shortlist -> exact re-rank. Monotone in
    # depth, and the deepest shortlist must beat the fixed-probe floors
    sq = curve["sq8_rerank"]
    assert len(sq) == 3
    sq_recalls = [p["recall_at_k"] for p in sq]
    assert sq_recalls == sorted(sq_recalls), sq_recalls
    assert sq_recalls[-1] >= max(
        curve["lsh"][0]["recall_at_k"], curve["ivf"][0]["recall_at_k"]
    )
    assert all(p["scan_fraction_bytes"] == 0.25 for p in sq)
    # round-10 certified tier: per-cell angular radii make the adaptive
    # probe EXACT (recall 1.0) with a measured, data-dependent fraction
    ad = curve["ivf_adaptive"]
    assert ad["recall_at_k"] == 1.0, ad
    assert ad["certified"] and 0.0 < ad["measured_scan_fraction"] <= 1.0


def test_ivf_topk_adaptive_is_exact_and_int8_rerank_lifts_floor(spark):
    """ivf_topk_adaptive returns EXACTLY the brute-force top-k (the
    angular-radius bound certifies unprobed cells); int8_rerank_topk at
    depth 64 matches the exact top-10 on this corpus."""
    from etl_demo_spark.vec import (
        brute_force_topk,
        int8_rerank_topk,
        ivf_topk_adaptive,
    )

    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin([0, 13, 37])).collect()
    }
    for qid, qv in vecs.items():
        exact = [tuple(r) for r in brute_force_topk(emb, qv, k=10).collect()]
        st: dict = {}
        adaptive = [
            tuple(r)
            for r in ivf_topk_adaptive(emb, qv, k=10, _stats=st).collect()
        ]
        assert adaptive == exact, f"qid {qid}: certified tier diverged"
        assert 0 < st["probed"] <= st["n_cells"]
        rerank = [
            tuple(r)
            for r in int8_rerank_topk(
                emb, k=10, query_id=qid, rerank_depth=64
            ).collect()
        ]
        assert rerank == exact, f"qid {qid}: sq8 re-rank missed"


def test_query_index_adaptive_certified_exact(spark, tmp_path):
    """Round-10: the built index's per-cell angular radii (codebook
    sidecar `min_cos`) certify adaptive probing — results equal the
    exact brute-force top-k, reads stay partition-pruned, and non-cosine
    or pre-radii indexes refuse loudly."""
    from etl_demo_spark.pipelines.embedding_index import (
        _sidecar_read,
        _sidecar_write,
        build_index,
        query_index_adaptive,
    )
    from etl_demo_spark.vec import brute_force_topk

    src = f"{SF0001}/embeddings.parquet"
    dest = str(tmp_path / "idx")
    build_index(spark, src, dest, n_cells=8)
    emb = spark.read.parquet(src)
    for qid in (0, 11, 29):
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qid).first()["embedding"]
        ]
        exact = [tuple(r) for r in brute_force_topk(emb, qvec, k=5).collect()]
        got = [
            tuple(r)
            for r in query_index_adaptive(spark, dest, qvec, k=5).collect()
        ]
        assert got == exact, f"qid {qid}: certified index query diverged"
    # a pre-round-10 sidecar (no radii) refuses with rebuild guidance
    import json as _json

    meta = _json.loads(_sidecar_read(spark, dest))
    meta.pop("min_cos")
    _sidecar_write(spark, dest, _json.dumps(meta))
    with pytest.raises(ValueError, match="rebuild"):
        query_index_adaptive(spark, dest, qvec, k=5)
    # a k-means (l2-assigned) index refuses: the bound lives in cosine
    dest2 = str(tmp_path / "idx2")
    build_index(spark, src, dest2, n_cells=4, kmeans_iters=1)
    with pytest.raises(ValueError, match="cosine"):
        query_index_adaptive(spark, dest2, qvec, k=5)
