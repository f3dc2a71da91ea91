"""URL canonicalization and URL-level dedup (web.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


CASES = [
    # scheme/host case, www., default port, tracking param, fragment
    (
        "HTTP://WWW.Example.COM:80/Articles/item-1?utm_source=feed&cat=A&id=1#frag",
        "http://example.com/Articles/item-1?cat=A&id=1",
    ),
    # param order + trailing slash
    (
        "https://example.com:443/Articles/item-1/?id=1&cat=A",
        "https://example.com/Articles/item-1?cat=A&id=1",
    ),
    # bare host -> root path
    ("https://Example.com", "https://example.com/"),
    # all params tracking -> no query at all
    ("https://example.com/?fbclid=xyz&gclid=1&ref=tw", "https://example.com/"),
    # utm in the middle; duplicate trailing slashes
    (
        "https://example.com/a//?z=2&a=1&utm_campaign=c",
        "https://example.com/a?a=1&z=2",
    ),
    # NON-default port survives
    ("https://example.com:8443/x?a=1", "https://example.com:8443/x?a=1"),
    # path case preserved (RFC 3986: only scheme/host case-insensitive)
    ("https://example.com/CaseSensitive", "https://example.com/CaseSensitive"),
    # :443 is only default for https, not http
    ("http://example.com:443/x", "http://example.com:443/x"),
]


def test_canonical_url_cases(spark):
    from etl_demo_spark.web import canonical_url

    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "i INT, url STRING"
    )
    got = [
        r.c for r in df.select("i", canonical_url("url").alias("c")).orderBy("i").collect()
    ]
    assert got == [exp for _, exp in CASES]


def test_url_dedup_groups_variants_and_keeps_min_id(spark):
    from etl_demo_spark.web import url_dedup

    rows = [
        (7, "https://WWW.site.com/p?utm_source=a&x=1"),
        (2, "https://site.com/p/?x=1"),
        (9, "https://site.com/p?x=1#s"),
        (4, "http://site.com/p?x=1"),  # different scheme: NOT a duplicate
    ]
    out = {
        r.canonical_url: (r.doc_id, r.n_variants)
        for r in url_dedup(
            spark.createDataFrame(rows, "doc_id INT, url STRING")
        ).collect()
    }
    assert out == {
        "https://site.com/p?x=1": (2, 3),
        "http://site.com/p?x=1": (4, 1),
    }


def test_canonical_url_is_codegen_only(spark):
    """The canonicalizer must stay JVM-side: no Python stage in the plan
    (it runs inside the first dedup tier of a crawl-scale pipeline)."""
    from etl_demo_spark.web import canonical_url

    df = spark.range(10).select(
        F.concat(F.lit("https://x.com/p?id="), F.col("id")).alias("url")
    )
    plan = df.select(canonical_url("url")).queryExecution().executedPlan().toString() \
        if hasattr(df, "queryExecution") else \
        df.select(canonical_url("url"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
