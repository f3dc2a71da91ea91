"""Web-corpus URL operators: canonicalization and URL-level dedup.

The first dedup tier of every web-scale training pipeline (CommonCrawl,
C4, RefinedWeb) is URL-level: the same page is crawled many times under
trivially different URLs — scheme/host case, `www.`, default ports,
tracking parameters, parameter order, fragments, trailing slashes.
Canonicalizing before the content tiers (MinHash & friends in dedup.py)
removes the bulk of duplicates for the cost of a string projection plus
one GROUP BY on a short key — no signatures, no banding.

Everything here is a pure Catalyst expression (regexp/array built-ins,
no Python), so it runs inside whole-stage codegen and is replayable
verbatim by any ANSI engine — the corpus query's DuckDB oracle replays
the same transforms bit-for-bit.

Cite: reference etl_weekly_trades.py has no web/corpus surface; this is
part of the training-data extension mandated by SURVEY.md §2.2 (X-12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking parameters stripped by canonicalization: the analytics tags
# that vary per click but never change the page (Google Analytics utm_*,
# Facebook fbclid, Google gclid, bare ref= referrers)
_TRACKING_PREFIXES = ("utm_",)
_TRACKING_KEYS = ("fbclid", "gclid", "ref")


def _is_tracking(p: Column) -> Column:
    cond = F.lit(False)
    for pre in _TRACKING_PREFIXES:
        cond = cond | p.startswith(pre)
    for key in _TRACKING_KEYS:
        cond = cond | p.startswith(key + "=")
    return cond | (p == "")


def canonical_url(url: Column | str) -> Column:
    """The URL's canonical form:

      * scheme and host lowercased; leading ``www.`` dropped;
      * default port stripped (``:80`` for http, ``:443`` for https);
      * fragment dropped;
      * tracking parameters dropped (utm_*, fbclid, gclid, ref);
      * remaining query parameters sorted (binary/codepoint order —
        identical in Spark and ANSI engines for ASCII keys);
      * trailing slashes trimmed from the path (bare host → ``/``).

    Path CASE is preserved (paths are case-sensitive per RFC 3986; only
    scheme/host are case-insensitive). Built entirely from regexp/array
    expressions — codegen-friendly and cross-engine replayable."""
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment never survives
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    host = F.when(
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    host = F.regexp_replace(host, r"^www\.", "")
    # path+query = rest minus the hostport prefix
    pathq = F.substring(
        rest, F.length(F.regexp_extract(rest, r"^([^/?]+)", 1)) + 1, 1 << 30
    )
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(F.split(query, "&"), lambda p: ~_is_tracking(p))
    qcanon = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon == "", F.lit("")).otherwise(F.concat(F.lit("?"), qcanon)),
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level exact dedup: one row per canonical URL, keeping the
    lowest id (the deterministic keeper rule shared by the whole dedup
    ladder). Adds ``canonical_url`` and ``n_variants``. One projection +
    one hash aggregation on the canonical key — the cheapest dedup tier,
    run before any content-based one.

    Scale: shuffles only (canonical_url, id) pairs; at crawl scale the
    canonical key is ~60 bytes — the same shape as exact content dedup
    on a fingerprint (dedup.py), with partial aggregation upstream."""
    canon = df.withColumn("canonical_url", canonical_url(url_col))
    return canon.groupBy("canonical_url").agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_variants"),
    )
