"""Pin the F.expr SQL fast paths (round 11) to the composed-Column forms.

tokens / shingles_from_tokens / hash_shingles / minhash_signature /
lsh_band_keys each gained a named-column branch that emits the whole
expression as ONE SQL string (one py4j roundtrip instead of dozens —
driver-side build cost, guide §7). The two branches must stay
value-identical forever; this file is the drift alarm.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_demo_spark.dedup import (
    hash_shingles,
    lsh_band_keys,
    minhash_signature,
    shingles_from_tokens,
)
from etl_demo_spark.text import tokens

DOCS = [
    ("1", "the quick brown fox jumps over a lazy dog the quick brown"),
    ("2", "  leading   and trailing   whitespace  "),
    ("3", "two words"),
    ("4", ""),
    ("5", "repeat repeat repeat repeat repeat repeat"),
    ("6", "tab\tand\nnewline separated tokens here now"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_tokens_sql_path_matches_column_path(docs):
    a = docs.select(tokens("text").alias("t")).collect()
    b = docs.select(tokens(F.col("text")).alias("t")).collect()
    assert a == b


def test_shingles_sql_path_matches_column_path(docs):
    base = docs.select(tokens("text").alias("__toks"))
    for k in (2, 3, 5):
        a = base.select(shingles_from_tokens("__toks", k).alias("sh")).collect()
        b = base.select(
            shingles_from_tokens(F.col("__toks"), k).alias("sh")
        ).collect()
        assert a == b, f"k={k}"


def test_hash_shingles_sql_path_matches_column_path(docs):
    base = docs.select(tokens("text").alias("__toks")).select(
        shingles_from_tokens("__toks", 3).alias("sh")
    )
    a = base.select(hash_shingles("sh").alias("h")).collect()
    b = base.select(hash_shingles(F.col("sh")).alias("h")).collect()
    assert a == b


def test_minhash_signature_sql_path_matches_column_path(docs):
    shh = (
        docs.select(tokens("text").alias("__toks"))
        .select(shingles_from_tokens("__toks", 3).alias("sh"))
        .select(hash_shingles("sh").alias("shh"))
    )
    for n in (16, 32):
        a = shh.select(minhash_signature("shh", n).alias("sig")).collect()
        b = shh.select(minhash_signature(F.col("shh"), n).alias("sig")).collect()
        assert a == b, f"num_hashes={n}"
        # wrapping long arithmetic must stay non-ANSI: values are real longs
        assert any(v is not None for row in a for v in (row.sig or []))


def test_cosine_const_expr_matches_column_path(spark):
    import random

    from etl_demo_spark.vec import cosine, cosine_const_expr

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    qv = [rng.uniform(-1, 1) for _ in range(16)]
    old = df.select(
        "vec_id", F.round(cosine(F.col("embedding"), F.lit([float(v) for v in qv])), 6).alias("c")
    ).collect()
    new = df.select(
        "vec_id", cosine_const_expr("embedding", qv).alias("c")
    ).collect()
    assert old == new  # bit-identical doubles, not approx


def test_lsh_band_keys_sql_path_matches_column_path(docs):
    sig = (
        docs.select(tokens("text").alias("__toks"))
        .select(shingles_from_tokens("__toks", 3).alias("sh"))
        .select(hash_shingles("sh").alias("shh"))
        .select(minhash_signature("shh", 32).alias("sig"))
    )
    a = sig.select(lsh_band_keys("sig", 8, 4).alias("bk")).collect()
    b = sig.select(lsh_band_keys(F.col("sig"), 8, 4).alias("bk")).collect()
    assert a == b
    # NULL signature slots (short docs) must serialize via the marker on
    # both paths: band keys of an all-NULL signature are equal, non-null
    assert all(row.bk is not None for row in a)
