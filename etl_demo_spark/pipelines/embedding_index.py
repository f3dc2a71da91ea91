"""Offline ANN index build + serve (IVF layout on plain parquet).

The deployable form of vec.py's IVF operators: ``build_index`` assigns
every vector to a coarse cell and writes the corpus ``partitionBy("cell")``
with the codebook as a JSON sidecar; ``query_index`` scores the codebook
on the driver (n_cells dot products), reads ONLY the ``nprobe`` best cell
partitions — directory-level partition pruning, the non-probed cells are
never opened — and exact-cosine re-ranks inside them.

At 100 TB this is the standard two-level ANN serving layout: the index
"build" is one narrow assignment pass + one partitioned write; a query
touches nprobe/n_cells of the data; refreshing the codebook (e.g. with
k-means centroids from vec.kmeans_fit) only changes the assignment
column, not the dataflow.

CLI: ``python -m etl_demo_spark.pipelines.embedding_index SRC DEST
[n_cells]`` builds; add ``--query id`` to run a demo query using that
vector id as the needle.

Reference lineage: the reference has no vector surface at all — this is
north-star scope (SURVEY.md §2.2 X-13) packaged like its ETL pipeline
(etl_weekly_trades.py:270-281 run_etl composition).
"""

from __future__ import annotations

import json
import math
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_demo_spark.vec import cosine, ivf_assign, kmeans_assign_udf, kmeans_fit

CODEBOOK_FILE = "_codebook.json"


def _sidecar_path(spark: SparkSession, index_dir: str):
    """(FileSystem, Path) for the codebook via the Hadoop FS API — the
    sidecar must land NEXT TO the parquet (s3://, hdfs://, file://), not
    on the driver's local disk, or query_index on a remote index breaks."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(index_dir, CODEBOOK_FILE)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _sidecar_write(spark: SparkSession, index_dir: str, text: str) -> None:
    fs, hpath = _sidecar_path(spark, index_dir)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _sidecar_read(spark: SparkSession, index_dir: str) -> str:
    fs, hpath = _sidecar_path(spark, index_dir)
    stream = fs.open(hpath)
    try:
        # IOUtils drains the Hadoop input stream fully regardless of FS
        baos = spark._jvm.java.io.ByteArrayOutputStream()
        spark._jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 65536, False)
        return bytes(baos.toByteArray()).decode("utf-8")
    finally:
        stream.close()


def build_index(
    spark: SparkSession,
    src: str,
    dest: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
    init: str = "parallel",
) -> int:
    """Assign cells and write the cell-partitioned corpus + codebook.

    ``kmeans_iters=0`` uses the hash-seeded IVF coarse quantizer;
    ``kmeans_iters>0`` trains a Lloyd's k-means codebook first (tighter
    cells → better recall at the same nprobe) — the dataflow and the
    on-disk layout are identical either way.

    Returns the number of cells written. The codebook sidecar lives
    inside the index directory so the index is self-describing."""
    df = spark.read.parquet(src)
    if kmeans_iters > 0:
        # k-means|| seeding by default (init='parallel'): spread-out seeds
        # replace the raw hash-seeded rows, so the codebook converges to
        # tighter cells in the same number of Lloyd's iterations — better
        # recall at the same nprobe with an unchanged dataflow/layout
        centroids = kmeans_fit(df, k=n_cells, n_iter=kmeans_iters,
                               id_col=id_col, vec_col=vec_col, init=init)
        assign = kmeans_assign_udf(centroids)
        # cells are 1-based on disk (matches ivf_assign's array_position)
        assigned = df.withColumn("cell", assign(F.col(vec_col)) + F.lit(1))
        metric = "l2"  # Lloyd's assigns by Euclidean distance
    else:
        assigned, centroids = ivf_assign(df, n_cells, id_col, vec_col)
        metric = "cosine"  # ivf_assign assigns by best cosine
    assigned.write.mode("overwrite").partitionBy("cell").parquet(dest)
    # per-cell ANGULAR RADII (min cosine of a member to its centroid):
    # the cell metadata `query_index_adaptive` needs to CERTIFY that an
    # unprobed cell cannot hold a better neighbor — one tiny agg over
    # the assignment the build already computed, O(cells) floats stored
    min_cos: dict[str, float] = {}
    if metric == "cosine":
        cent_df = spark.createDataFrame(
            [(i + 1, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "cell INT, __centroid ARRAY<DOUBLE>",
        )
        min_cos = {
            str(int(r["cell"])): float(r["mc"])
            for r in assigned.join(F.broadcast(cent_df), "cell")
            .groupBy("cell")
            .agg(
                F.min(
                    cosine(
                        F.col(vec_col).cast("array<double>"),
                        F.col("__centroid"),
                    )
                ).alias("mc")
            )
            .collect()
        }
    _sidecar_write(
        spark,
        dest,
        json.dumps(
            {"centroids": centroids, "id_col": id_col, "vec_col": vec_col,
             "metric": metric, "min_cos": min_cos}
        ),
    )
    return len(centroids)


def query_index(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Top-k by cosine from a built index, reading only nprobe cells.

    Probe cells are ranked with the SAME metric the build assigned
    vectors with (sidecar ``metric``): ranking a Euclidean-assigned
    (k-means) codebook by cosine would probe the wrong cells and
    silently lose recall on unnormalized embeddings."""
    meta = json.loads(_sidecar_read(spark, index_dir))
    centroids = meta["centroids"]
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    metric = meta.get("metric", "cosine")

    def cos_py(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return d / (na * nb) if na and nb else 0.0

    def neg_l2_py(a: list[float], b: list[float]) -> float:
        return -sum((x - y) * (x - y) for x, y in zip(a, b))

    score = cos_py if metric == "cosine" else neg_l2_py
    ranked = sorted(
        range(len(centroids)), key=lambda i: (-score(query_vec, centroids[i]), i)
    )
    probes = [i + 1 for i in ranked[:nprobe]]  # cells are 1-based

    q = F.array(*[F.lit(float(v)) for v in query_vec])
    # the cell filter is on the PARTITION column: Catalyst prunes the
    # non-probed cell directories out of the scan (PartitionFilters),
    # so the files of 12 of 16 cells are never opened at nprobe=4.
    cands = spark.read.parquet(index_dir).filter(F.col("cell").isin(probes))
    return (
        cands.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def query_index_adaptive(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    min_probe: int = 2,
    slack: float = 1e-6,
) -> DataFrame:
    """CERTIFIED-exact top-k from a built index with a data-dependent
    probe count — every read still partition-pruned.

    Probes the best ``min_probe`` cells, then expands ONLY into cells
    whose angular-radius bound could beat the running k-th score (for
    any member x of cell c, cos(q, x) <= cos(max(0, angle(q, c) -
    theta_c)) — angular distance is a metric on unit vectors, and
    theta_c came from the build's cell metadata). Cells failing the
    bound provably hold no better neighbor, so the result equals the
    exact brute-force top-k in at most two pruned scans. Tight
    (k-means) cells probe few; an isotropic corpus degrades toward a
    full scan but never a wrong answer — the tier `query_index`'s fixed
    nprobe cannot offer. Cosine-metric indexes only (the bound lives in
    the ranking metric); requires a round-10 sidecar with ``min_cos``."""
    meta = json.loads(_sidecar_read(spark, index_dir))
    if meta.get("metric", "cosine") != "cosine":
        raise ValueError(
            "query_index_adaptive: certified probing needs a cosine-"
            "assigned index (the bound lives in the ranking metric); "
            "this index was built with metric="
            f"{meta.get('metric')!r} — use query_index(nprobe=…)"
        )
    min_cos = meta.get("min_cos")
    if not min_cos:
        raise ValueError(
            "query_index_adaptive: this index predates per-cell radii — "
            "rebuild it (build_index now stores min_cos in the codebook "
            "sidecar)"
        )
    centroids = meta["centroids"]
    id_col, vec_col = meta["id_col"], meta["vec_col"]

    def cos_py(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return d / (na * nb) if na and nb else 0.0

    def ang(c: float) -> float:
        return math.acos(max(-1.0, min(1.0, c)))

    qcos = {i + 1: cos_py(query_vec, centroids[i]) for i in range(len(centroids))}
    live = {int(c) for c in min_cos}  # cells with members
    bound = {
        c: math.cos(max(0.0, ang(qcos[c]) - ang(float(min_cos[str(c)]))))
        for c in live
    }
    ranked = sorted(live, key=lambda c: (-qcos[c], c))
    probes = ranked[: max(1, min_probe)]

    q = F.array(*[F.lit(float(v)) for v in query_vec])

    def topk_over(cells: list[int]) -> DataFrame:
        cands = spark.read.parquet(index_dir).filter(F.col("cell").isin(cells))
        return (
            cands.select(
                F.col(id_col),
                F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
            )
            .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
            .limit(k)
        )

    rows = topk_over(probes).collect()
    t = rows[k - 1]["cos_sim"] if len(rows) >= k else -2.0
    expand = [c for c in ranked if c not in probes and bound[c] >= t - slack]
    return topk_over(probes + expand)


def main(argv: list[str] | None = None) -> None:
    import argparse

    from etl_demo_spark.session import get_spark

    p = argparse.ArgumentParser(description="IVF ANN index build/serve")
    p.add_argument("src", help="embeddings parquet path")
    p.add_argument("dest", help="index output directory")
    p.add_argument("n_cells", type=int, nargs="?", default=16)
    p.add_argument("--kmeans-iters", type=int, default=0)
    p.add_argument("--query", type=int, default=None, metavar="ID",
                   help="after building, run a demo top-10 query using this vector id as the needle")
    args = p.parse_args(argv)

    spark = get_spark(app_name="embedding-index")
    n = build_index(spark, args.src, args.dest, args.n_cells,
                    kmeans_iters=args.kmeans_iters)
    total = spark.read.parquet(args.dest).count()
    print(f"index: {total} vectors in {n} cells at {args.dest}")
    files = [str(p) for p in Path(args.dest).rglob("*.parquet")]
    print(f"cells on disk: {len({os.path.dirname(f) for f in files})} partition dirs")
    if args.query is not None:
        meta = json.loads(_sidecar_read(spark, args.dest))
        row = (
            spark.read.parquet(args.src)
            .filter(F.col(meta["id_col"]) == args.query)
            .select(meta["vec_col"])
            .first()
        )
        if row is None:
            raise SystemExit(f"--query: no vector with id {args.query}")
        needle = [float(v) for v in row[0]]
        for r in query_index(spark, args.dest, needle, k=10).collect():
            print(f"  {r[0]}\t{r[1]}")


if __name__ == "__main__":
    main()
