"""Vector similarity search over embedding columns (SURVEY.md §2.2 X-13).

The embeddings table carries ``embedding ARRAY<FLOAT>`` (64-dim here, but
nothing is dimension-specific). Two paths:

* **brute-force cosine top-k** — the correctness baseline: broadcast the
  (tiny) query vector, one narrow pass computing cosine per row, then
  TakeOrderedAndProject for the top-k. Linear scan, no shuffle — at 100 TB
  this is the "exact re-rank" stage, not the primary index.
* **sign-LSH bucketed ANN** — the scale path: deterministic random-
  hyperplane signatures bucket similar vectors together; candidate
  generation touches only colliding buckets, then exact re-rank within.

Dot products use ``zip_with`` + ``aggregate`` (JVM-side fold, sequential
and therefore deterministic) — no UDF in the hot loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double — deterministic order,
    matching DuckDB's list_dot_product accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a constant query vector.

    The query vector is a literal array (broadcast with the plan itself);
    the scan is a single narrow stage; ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def sign_lsh_signature(vec_col: Column, planes: int = 16, dim: int = 64) -> Column:
    """Deterministic random-hyperplane signature: hyperplane p's component
    for dimension i is ±1 derived from xxhash64(p, i). sign(v·h_p) gives
    one bit per plane. Pure built-ins; the 'random' planes are hash-
    derived so every executor materializes identical planes without any
    broadcast state."""
    def plane_component(p: int):
        # closure over the Python int p — NOT a default arg: pyspark reads
        # lambda arity, and a 2-parameter lambda would receive the array
        # index as its second argument, silently replacing p.
        return lambda i: F.when(
            F.shiftright(F.xxhash64(F.lit(p), i), 3).bitwiseAND(F.lit(1)) == 1, 1.0
        ).otherwise(-1.0)

    plane_bits = []
    for p in range(planes):
        contrib = F.aggregate(
            F.zip_with(
                vec_col,
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), plane_component(p)),
                lambda v, h: v.cast("double") * h,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        plane_bits.append((contrib > 0).cast("int"))
    return F.array(*plane_bits)


def lsh_bucket(vec_col: Column, planes: int = 16, dim: int = 64) -> Column:
    """Pack the sign signature into a single long bucket id (static shifts)."""
    sig = sign_lsh_signature(vec_col, planes, dim)
    packed = F.lit(0).cast("long")
    for i in range(planes):
        packed = packed.bitwiseOR(F.shiftleft(F.element_at(sig, i + 1).cast("long"), i))
    return packed


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """ANN top-k: restrict the exact re-rank to the query's LSH bucket.

    At scale the bucketed table is written partitioned by bucket id, so a
    query touches one partition (partition pruning) instead of the full
    scan; multiple probe tables (plane sets) raise recall. Recall vs the
    brute-force baseline is asserted in tests, not assumed."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket(F.col(vec_col), planes, dim).alias("bucket"),
    )
    # multi-probe: the query's own bucket plus every Hamming-distance-1
    # bucket (one sign bit flipped) — planes+1 probes lift recall sharply
    # at ~(planes+1)/2^planes of the scan cost.
    qb = bucketed.limit(1).select(lsh_bucket(q, planes, dim).alias("qbucket"))
    probes = qb.select(
        F.explode(
            F.array(
                F.col("qbucket"),
                *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(planes)],
            )
        ).alias("probe")
    )
    cands = bucketed.join(F.broadcast(probes), F.col("bucket") == F.col("probe"))
    scored = cands.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup: bucket by sign-LSH, exact cosine within
    buckets only. The bucket join replaces the O(n²) all-pairs cross join
    with per-bucket minis — the embedding twin of MinHash LSH."""
    b = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), lsh_bucket(F.col(vec_col), planes, dim).alias("bucket")
    )
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")))
    return (
        pairs.select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(cosine(F.col("l.v"), F.col("r.v")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
