"""Text-analysis operators for training-data pipelines (SURVEY.md §2.2 X-14).

Everything in the hot path is built-in `pyspark.sql.functions` (JVM-side,
codegen'd): tokenization, quality ratios, fingerprints. The only Python
stage is language-ID, which is a vectorized Arrow-batched pandas_udf
(X-11) — and even that is per-batch numpy/str ops, not per-row Python.

At 100 TB: all of these are narrow (per-row) transformations — no shuffle,
fully pipelined into the parquet scan, trivially parallel across any number
of executors.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Tokens: whitespace split of trimmed text (matches DuckDB
# string_split_regex(trim(x), '\s+') exactly, including the empty-string
# edge: both produce a single empty token).
TOKEN_RE = r"\s+"

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def tokens_sql(col: str) -> str:
    """The tokenizer as a raw SQL fragment over a named column — the
    building block the one-shot SQL compositions (dedup.py round 11)
    splice into WITH-chains. Kept next to TOKEN_RE so the two can never
    drift apart silently."""
    return f"split(trim(`{col}`), '\\\\s+')"


def tokens(text: Column | str) -> Column:
    # Named-column fast path: ONE SQL string = one py4j roundtrip to the
    # JVM, vs ~6 for the composed Column form. Identical analyzed
    # expression (split(trim(col), '\s+', -1)); value equality is pinned
    # by tests/test_expr_sql_parity.py. Build time is driver-side pure
    # overhead at any scale (guide §7) — tokens() sits under every text
    # operator, so the fold pays everywhere.
    if isinstance(text, str):
        return F.expr(tokens_sql(text))
    return F.split(F.trim(text), TOKEN_RE)


def token_count(text: Column | str) -> Column:
    """Whitespace token count — the cheap len() every pipeline wants."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish token estimate: count word/number/punctuation units with the
    GPT-2-style pre-tokenizer regex family (letters runs, digit runs,
    punctuation singles). Pure regexp — no tokenizer library needed for a
    size estimate."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def punct_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c) - F.length(F.regexp_replace(c, r"[.,!?;:]", ""))


def stopword_count(text: Column | str) -> Column:
    toks = tokens(text)
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features + a composite score in [0,1]-ish range.

    The score is a fixed-order arithmetic expression over small-integer
    ratios, so it is bit-deterministic across engines (each ratio is an
    exact small-int division; the linear combination evaluates in a fixed
    order)."""
    n_chars = F.length(F.col(text_col)).cast("long")
    n_tokens = token_count(text_col).cast("long")
    n_punct = punct_count(text_col).cast("long")
    n_stop = stopword_count(text_col).cast("long")
    punct_ratio = n_punct.cast("double") / n_chars.cast("double")
    stop_ratio = n_stop.cast("double") / n_tokens.cast("double")
    avg_token_len = n_chars.cast("double") / n_tokens.cast("double")
    score = (
        F.lit(0.5) * F.least(stop_ratio * 2, F.lit(1.0))
        + F.lit(0.3) * F.least(avg_token_len / 10, F.lit(1.0))
        - F.lit(0.2) * punct_ratio
    )
    return df.withColumns(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_punct": n_punct,
            "n_stopwords": n_stop,
            "punct_ratio": punct_ratio,
            "stopword_ratio": stop_ratio,
            "avg_token_len": avg_token_len,
            "quality_score": score,
        }
    )


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    Exact-dedup key that survives formatting differences."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def rolling_hashes(text: Column | str, window: int = 8) -> Column:
    """Per-document rolling token-window hashes (winnowing-style
    fingerprints): xxhash64 of each ``window``-token shingle. Built-ins
    only: sequence → transform → slice → concat — no UDF, no explode."""
    toks = tokens(text)
    n = F.size(toks) - F.lit(window - 1)
    # short docs (< window tokens) yield an empty array: sequence(1, 0)
    # counts DOWN in Spark (step −1 when start > stop) and would feed
    # slice an invalid start of 0 — same guard as dedup.shingles
    positions = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        positions,
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, window))),
    )


# --------------------------------------------------------------------------
# Language ID — the one Python stage: Arrow-batched pandas_udf (X-11).
# --------------------------------------------------------------------------

_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "with", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit"),
    "fr": ("le", "la", "les", "et", "est", "que", "pour"),
    "es": ("el", "la", "los", "que", "es", "y", "por"),
}


@F.pandas_udf(T.StringType())
def lang_id(texts: pd.Series) -> pd.Series:
    """Heuristic language ID: CJK-codepoint screen, then stopword-marker
    voting. Deterministic; vectorized per Arrow batch. A real pipeline
    would swap in fastText/CLD3 here — the Spark plumbing (scalar
    pandas_udf over a string column) is identical."""

    def detect(t: str) -> str:
        if not t:
            return "und"
        cjk = sum(1 for ch in t[:200] if "一" <= ch <= "鿿")
        if cjk > len(t[:200]) * 0.2:
            return "zh"
        toks = set(t.lower().split())
        best, best_hits = "und", 0
        for lang in sorted(_LANG_MARKERS):  # sorted → deterministic ties
            hits = len(toks & set(_LANG_MARKERS[lang]))
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    return texts.map(detect)


def split_assign(
    id_col: Column | str, train: float = 0.8, val: float = 0.1
) -> Column:
    """Deterministic train/val/test assignment from a stable id hash.

    Buckets the md5 of the id's decimal string by its first hex byte and
    compares against fraction thresholds AS STRINGS — no hex→int
    conversion, so the expression is exactly mirrorable in ANSI SQL
    (DuckDB: ``substr(md5(CAST(id AS VARCHAR)), 1, 2)``). Content-
    independent: editing a document never moves it between splits, and
    the assignment is reproducible across engines, runs, and cluster
    sizes (the property a training pipeline needs for leak-free
    evaluation)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    hb = F.substring(F.md5(c.cast("string")), 1, 2)

    def thr(frac: float) -> str:
        n = round(256 * frac)
        # a fraction of 1.0 rounds to 256 = "100": THREE chars, which the
        # 2-char hex bucket compares against lexicographically and loses
        # ("e7" > "100") — every bucket must win, so emit a sentinel
        # above any hex pair instead
        return "zz" if n >= 256 else format(n, "02x")

    t1 = thr(train)
    t2 = thr(train + val)
    return (
        F.when(hb < t1, "train").when(hb < t2, "val").otherwise("test")
    )


# ---------------------------------------------------------------------------
# Keyword retrieval: term statistics, TF-IDF, BM25 (SURVEY.md §2.2 X-14 —
# the retrieval half of a training-data pipeline: mine corpus vocabulary,
# score documents against keyword queries without an external index).
# ---------------------------------------------------------------------------


def term_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-term corpus statistics: document frequency + total term frequency.

    Two-level aggregation keeps the shuffle payload small at scale: the
    first groupBy (id, term) collapses within-document repeats map-side
    (partial agg), so the second shuffle carries one row per distinct
    (doc, term) — bounded by vocabulary × docs, not token count. No
    count-distinct expansion anywhere."""
    per_doc = (
        df.select(F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("tf").alias("total_tf"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 relevance of every matching document against ``query_terms``.

    Returns (id, bm25) for documents containing at least one query term.
    Okapi BM25: idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1), term score =
    idf · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).

    Scale shape: the term filter lands BEFORE the (id, term) shuffle, so
    only query-term occurrences move; document frequencies and the global
    (N, avgdl) pair are tiny aggregates broadcast back onto the scored
    rows. The per-document sum over query terms is pivoted into a fixed
    column order and added left-to-right — double addition is
    order-dependent, and a fixed-order sum is what makes the score
    bit-reproducible across engines and partitionings (corpus.py module
    docstring; only ln() itself is 1-ULP engine-dependent).
    """
    if not query_terms:
        raise ValueError("bm25_scores: query_terms must be non-empty")
    # dedupe (order-preserving): repeated terms would pivot into duplicate
    # columns and make the score references ambiguous; BM25 over a
    # duplicated term is the same term scored once anyway
    query_terms = list(dict.fromkeys(query_terms))
    # three branches (tf, the dl join, the global stats agg) all consume
    # the tokenized corpus; persist it so the regex tokenization — the
    # dominant per-row cost — runs once, not once per branch. The cache
    # holds (id, tokens), comparable to the input text in size; it is
    # tracked and released at the next unit-of-work boundary
    # (cache.release_persisted). At extreme scale, store dl as a column
    # at ingest and drop the cache.
    from etl_demo_spark.cache import tracked_persist

    toks = tracked_persist(
        df.select(F.col(id_col).alias("_id"), tokens(text_col).alias("_toks"))
    )
    dl = toks.select("_id", F.size("_toks").cast("long").alias("dl"))
    # dl is functionally dependent on _id, so it rides the (doc, term)
    # aggregation as a first() aggregate (+8 B on the already-filtered
    # rows) instead of a separate join of the per-doc length table back
    # onto tf (round 10, guide §2.1 — the dl broadcast/shuffle join is
    # gone at any scale; values identical).
    #
    # Round 11 (guide §2.4 — share one exchange): the occurrence stream is
    # repartitioned by _id BEFORE the (_id, term) aggregation.
    # hashpartitioning(_id) satisfies ClusteredDistribution for the
    # (_id, term) aggregate AND both phases of the downstream pivot
    # (Clustered(_id, term), then Clustered(_id)), so the tf aggregation
    # and the whole pivot chain on this single exchange — the old shape
    # paid a (_id, term) exchange for tf plus an (_id) exchange for the
    # pivot (plan: 5 shuffles → 4, and the removed one carried the full
    # scored-row stream). The shuffled rows are raw term occurrences
    # instead of map-side-combined (doc, term) partials, but the term
    # filter has already cut the stream to query-term occurrences (tf
    # per doc is 1–3), so the byte delta is small at any scale.
    # Deliberately NOT persisted: caching tf would pin the compute once,
    # but an InMemoryTableScan under AQE reports unknown output
    # partitioning, which re-inserts BOTH pivot exchanges above the
    # cache (measured: 5 → 6 exchanges) — worse than recomputing the
    # already-filtered occurrence aggregation in the dfreq branch, which
    # the round-10 shape did too (ReuseExchange does not fire across the
    # differently-pruned branches; see the repo optimization memo).
    tf = (
        toks.select(
            "_id", F.size("_toks").cast("long").alias("dl"), F.explode("_toks").alias("term")
        )
        .where(F.col("term").isin(*query_terms))
        .repartition("_id")
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfq"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "_id",
            "term",
            (
                F.log((F.col("n_docs") - F.col("dfq") + F.lit(0.5)) / (F.col("dfq") + F.lit(0.5)) + F.lit(1.0))
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.col("avgdl"))))
            ).alias("c"),
        )
    )
    per_term = contrib.groupBy("_id").pivot("term", query_terms).agg(F.first("c"))
    score = F.coalesce(F.col(f"`{query_terms[0]}`"), F.lit(0.0))
    for t in query_terms[1:]:
        score = score + F.coalesce(F.col(f"`{t}`"), F.lit(0.0))
    return per_term.select(F.col("_id").alias(id_col), score.alias("bm25"))


def bigram_lm_bits(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
) -> DataFrame:
    """Per-document bits-per-bigram under an add-one-smoothed bigram
    language model trained on the corpus itself, grouped by ``group_col``
    (CCNet-style perplexity filtering: documents whose token transitions
    are improbable under the in-language model are boilerplate/noise
    candidates; reference has no LM surface — this is north-star X-14).

    Model: P(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V) per group, where
    c(·) counts bigram/first-position-unigram instances over the corpus
    and V is the group's distinct-token vocabulary. Score = −Σ tf·ln P /
    (n_bigrams · ln 2). Documents with fewer than two tokens have no
    bigram and are excluded.

    Scale shape: one (doc, bigram) partial-agg shuffle collapses repeats
    map-side, then corpus counts come from groupBy + equi-joins back onto
    the tf table — NOT windows over (group, w1): a window partition for a
    stopword first-token would hold docs×fanout rows on one task, while
    the join formulation lets AQE's skew split carve exactly those hot
    keys. The vocabulary-size table is group-cardinality rows (tiny,
    broadcast); per-doc totals ride the tokenized projection as
    ``size−1`` — no extra pass. Raw double sum is order-dependent across
    engines; callers round (4dp absorbs the ~1e-12 drift — BM25
    convention, corpus.py module docstring).
    """
    from etl_demo_spark.cache import tracked_persist

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_g"),
        tokens(text_col).alias("_toks"),
    ).filter(F.size("_toks") >= 2)
    toks = tracked_persist(toks)  # bigram, vocab and length branches

    big = toks.select(
        "_id",
        "_g",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_toks") - 1),
                lambda i: F.struct(
                    F.element_at("_toks", i).alias("w1"),
                    F.element_at("_toks", i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("_id", "_g", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    tf = tracked_persist(  # consumed by cb, cu and the scoring join
        big.groupBy("_id", "_g", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    )

    cb = tf.groupBy("_g", "w1", "w2").agg(F.sum("tf").alias("cb"))
    cu = tf.groupBy("_g", "w1").agg(F.sum("tf").alias("cu"))
    vocab = (
        toks.select("_g", F.explode("_toks").alias("tok"))
        .groupBy("_g")
        .agg(F.count_distinct("tok").alias("v"))
    )
    nb = toks.select("_id", (F.size("_toks") - 1).cast("long").alias("n_bigrams"))

    contrib = (
        tf.join(cb, ["_g", "w1", "w2"])
        .join(cu, ["_g", "w1"])
        .join(F.broadcast(vocab), "_g")
        .select(
            "_id",
            "_g",
            (
                F.col("tf")
                * F.log((F.col("cb") + F.lit(1.0)) / (F.col("cu") + F.col("v")))
            ).alias("lp"),
        )
    )
    per_doc = contrib.groupBy("_id").agg(
        F.any_value("_g").alias(group_col), F.sum("lp").alias("slp")
    )
    import math

    return per_doc.join(nb, "_id").select(
        F.col("_id").alias(id_col),
        group_col,
        "n_bigrams",
        (-F.col("slp") / (F.col("n_bigrams") * F.lit(math.log(2.0)))).alias(
            "bits_per_bigram"
        ),
    )


# PII scrubbing: regex families chosen to mean the same thing in Java
# regex (Spark) and RE2 (DuckDB) — no backreferences, no lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"


def scrub_pii(text: Column | str) -> Column:
    """Redact email addresses and phone-shaped numbers (training-data
    hygiene gate). Two chained JVM-side regexp_replace passes — narrow,
    codegen'd, no Python."""
    c = F.col(text) if isinstance(text, str) else text
    out = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")


def pii_counts(text: Column | str) -> tuple[Column, Column]:
    """(email_count, phone_count) per row — audit metrics for the scrub."""
    c = F.col(text) if isinstance(text, str) else text
    return (
        F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), 0)),
        F.size(F.regexp_extract_all(c, F.lit(PII_PHONE_RE), 0)),
    )


def nfc_normalize_udf():
    """Unicode NFC normalization as an Arrow-batched pandas UDF — the
    canonicalization pass every multilingual training corpus runs before
    tokenization/dedup (decomposed sequences like 'e'+U+0301 and
    precomposed 'é' must hash identically or every content-dedup tier
    sees phantom distinct documents). Python's unicodedata implements
    the same Unicode standard as DuckDB's nfc_normalize — parity is
    pinned by the corpus oracle, so the UDF is cross-engine exact.

    NFC (not NFKC) deliberately: canonical equivalence only — it never
    changes what the text MEANS (NFKC folds ﬁ→fi, ½→1/2, which is a
    lossy modeling decision, not a canonicalization)."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    return _norm
