"""Distributed BPE tokenizer training — the vocabulary-learning side of
the LLM-data pipeline (the token-COUNTING side lives in text.py).

Byte-pair encoding training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public algorithm) is
iterative: count adjacent symbol pairs, merge the most frequent pair
everywhere, repeat k times. The naive implementation walks the corpus
every iteration; the scale insight this module is built on is that BPE
only ever consumes WORD FREQUENCIES — the (distinct word, count) table
is a lossless sufficient statistic for the whole corpus. At 100 TB of
text the word table is tens of millions of rows (Zipf), i.e. 4-6 orders
of magnitude smaller than the corpus, and every training iteration runs
on it alone:

  corpus --(one pass: pre-tokenize + groupBy word)--> word_freqs
  repeat k:  pair counts = explode adjacent pairs weighted by freq
             (one small shuffle)  ->  global argmax (ONE row to the
             driver)  ->  merge applied JVM-side (fold expression, no
             Python)  ->  lineage truncated

Everything in the training loop is built-in Spark SQL expressions —
`slice`/`arrays_zip`/`explode` for pair counting, `aggregate` (a fold)
for the merge rewrite — so the hot path never leaves the JVM; Python
touches one 1-row argmax per iteration. Encoding new text against the
learned merges is the only Arrow/pandas stage (per-word rank loop, the
GPT-2 apply algorithm), and it is embarrassingly parallel.

Correctness model: the trainer is pinned EXACTLY (merge-for-merge, with
the deterministic count-desc/pair-lexicographic tie-break) against a
from-scratch pure-Python reference implementation in
tests/test_llm_ops.py, and the pair-count stage is oracled against
DuckDB in the `bpe_pair_stats` corpus query (corpus.py). The trained
artifact is a plain DataFrame of ranked merges — joinable, storable,
versionable like any other table.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"  # word-end marker: lets merges distinguish suffixes ("st</w>")

# lowercase ASCII runs: deterministic across engines (no locale-sensitive
# case folding inside the tokenizer — see corpus.py oracle notes)
WORD_RE = "[a-z]+"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over ``df[text_col]`` — the sufficient statistic BPE
    trains on. One pre-tokenize + one groupBy shuffle; output size is the
    DISTINCT vocabulary of the corpus, not the corpus."""
    return (
        df.select(
            F.explode(F.expr(f"regexp_extract_all({text_col}, '{WORD_RE}', 0)")).alias(
                "word"
            )
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(word, symbols: array<string>, freq) — each word split to
    characters plus the END marker. `split` on a lookahead keeps it
    JVM-side; the original word rides along so the trained symbol table
    stays joinable back to text."""
    return words.select(
        "word",
        F.concat(
            # split at interior positions only: (?!$) stops the lookahead
            # matching at end-of-string, which would emit a trailing ""
            # symbol (Spark's split keeps trailing empties, limit=-1)
            F.split(F.col("word"), "(?!^)(?!$)"), F.array(F.lit(END))
        ).alias("symbols"),
        "freq",
    )


def pair_counts(symbols: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the symbol table, weighted by word
    freq: (a, b, cnt). The per-iteration shuffle — its input is the
    exploded word table (≈ vocab × avg word length rows), never the
    corpus."""
    n = F.size("symbols")
    zipped = F.arrays_zip(
        F.slice("symbols", 1, n - 1).alias("a"),
        F.slice(F.col("symbols"), 2, n - 1).alias("b"),
    )
    return (
        symbols.filter(n >= 2)
        .select(F.explode(zipped).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _apply_merge(symbols_col, a: str, b: str):
    """Fold expression rewriting every left-to-right non-overlapping
    occurrence of (a, b) into the single symbol a+b. Pure built-ins
    (`aggregate` = foldLeft), so the rewrite is codegen'd — no Python in
    the training loop. Greedy-left semantics match the reference
    algorithm: on "aaa" with merge (a,a) the fold yields [aa, a]."""
    merged = F.lit(a + b)
    return F.aggregate(
        symbols_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b))
            # guard: the last acc element must not itself be the result of
            # an overlapping merge this pass — fold marks consumed slots by
            # having already rewritten them to a+b, which != a unless a==b
            # and a+b==a (impossible: b is non-empty)
            ,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    words: DataFrame, num_merges: int, checkpoint_every: int = 8
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``num_merges`` BPE merges from a (word, freq) table.

    Returns (merges in learned order, final symbol table). Ties on the
    pair count break to the lexicographically smallest (a, b) — fully
    deterministic, pinned against the pure-Python reference in tests.

    Scale: each iteration is one pair-count shuffle over the symbol
    table + a 1-row argmax collect + a JVM fold rewrite. The symbol
    table is localCheckpoint'd every ``checkpoint_every`` iterations —
    the rewrite stacks one `aggregate` expression per merge, and
    truncating the lineage keeps analysis cost flat instead of
    quadratic in k (on a real cluster point this at a reliable
    checkpoint dir instead). Stops early when no pair remains."""
    spark = words.sparkSession
    symbols = _initial_symbols(words).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    since_checkpoint = 0
    for _ in range(num_merges):
        top = (
            pair_counts(symbols)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        symbols = symbols.select(
            "word", _apply_merge(F.col("symbols"), a, b).alias("symbols"), "freq"
        )
        since_checkpoint += 1
        if since_checkpoint >= checkpoint_every:
            symbols = symbols.localCheckpoint(eager=True)
            since_checkpoint = 0
    return merges, symbols


def _has_adjacent_pair(symbols_col, a: str, b: str):
    """Predicate: does the symbol array contain (a, b) ADJACENT? Pure
    built-ins (slice/arrays_zip/exists) — the affected-word filter of the
    incremental trainer, evaluated as a narrow scan."""
    n = F.size(symbols_col)
    zipped = F.arrays_zip(
        F.slice(symbols_col, 1, n - 1).alias("x"),
        F.slice(symbols_col, 2, n - 1).alias("y"),
    )
    return (n >= 2) & F.exists(
        zipped, lambda p: (p["x"] == F.lit(a)) & (p["y"] == F.lit(b))
    )


def bpe_train_incremental(
    words: DataFrame, num_merges: int, checkpoint_every: int = 8
) -> tuple[list[tuple[str, str]], DataFrame]:
    """`bpe_train` with INCREMENTAL pair-count maintenance — the
    production-vocab scale shape. The naive loop recomputes the global
    pair-count shuffle every merge: O(num_merges) passes over the full
    exploded symbol table, which is dead on arrival at the 32k–50k-merge
    vocabularies real tokenizers train (GPT-2's 50k merges — Radford et
    al. 2019 — over a naive loop means 50k corpus-wide shuffles).

    Here the pair-count table is a PERSISTED sufficient statistic,
    initialized with ONE full count and then maintained by deltas:
    merging (a, b) can only change the pair counts of words that contain
    (a, b) adjacently, so each iteration (i) filters the symbol table to
    the affected words (narrow scan), (ii) re-counts pairs over just that
    slice before and after the rewrite, and (iii) folds the signed delta
    into the persisted table. Per-iteration shuffle volume drops from the
    full exploded vocabulary to the affected-word slice plus the
    (a, b)-keyed pair table — and the affected slice shrinks fast down
    the Zipf curve (measured on the sf0.01 documents corpus: merge 1
    touches 16% of the vocabulary, merge 20 touches 3%).

    Exactness: identical merge list and final symbol table to
    `bpe_train` — same counts (the delta algebra is exact integer
    arithmetic), same count-desc/lexicographic tie-break — pinned by the
    equivalence test in tests/test_llm_ops.py, which also keeps the
    corpus query's DuckDB recursive-CTE replay oracle valid for this
    trainer. `cnt <= 0` rows are dropped when a pair disappears; a merge
    is never selected from a stale count because every delta lands
    before the next argmax.

    Lineage note: unlike the naive trainer (whose per-merge fold
    references the symbols column ONCE, so stacked projections grow
    linearly and an every-8 checkpoint suffices), the incremental
    rewrite's ``when(has_pair, fold)`` references it several times —
    Catalyst's project collapsing would inline that multiplicatively
    across stacked iterations. Both state tables are therefore
    checkpointed EVERY iteration: a narrow O(vocab) materialization with
    no shuffle (``checkpoint_every`` is accepted for signature parity
    and ignored). The per-iteration SHUFFLE — the cluster-cost term —
    still covers only the affected slice and the pair table."""
    del checkpoint_every  # see lineage note
    symbols = _initial_symbols(words).localCheckpoint(eager=True)
    pairs = pair_counts(symbols).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        top = (
            pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        adj = _has_adjacent_pair(F.col("symbols"), a, b)
        affected = symbols.filter(adj)
        rewritten = affected.select(
            "word", _apply_merge(F.col("symbols"), a, b).alias("symbols"), "freq"
        )
        neg = pair_counts(affected).select(
            "a", "b", (-F.col("cnt")).alias("cnt")
        )
        pairs = (
            pairs.unionByName(neg)
            .unionByName(pair_counts(rewritten))
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("cnt"))
            .filter(F.col("cnt") > 0)
            .localCheckpoint(eager=True)
        )
        symbols = symbols.select(
            "word",
            F.when(adj, _apply_merge(F.col("symbols"), a, b))
            .otherwise(F.col("symbols"))
            .alias("symbols"),
            "freq",
        ).localCheckpoint(eager=True)
    return merges, symbols


def merges_df(spark: SparkSession, merges: list[tuple[str, str]]) -> DataFrame:
    """The learned merge table as a DataFrame artifact: (rank, a, b,
    token). Store it next to the corpus snapshot it was trained on; the
    encoder below (and any external tokenizer) is a pure function of it."""
    rows = [(i, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(rows, "rank INT, a STRING, b STRING, token STRING")


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``df[text_col]`` with the learned merges (array<string>
    per row). Arrow-batched pandas UDF — the per-word loop is the GPT-2
    apply algorithm (repeatedly merge the present pair with the lowest
    rank), which reproduces exactly the sequential application of the
    merge list; a per-batch word cache exploits Zipf (each distinct word
    is encoded once per batch, not once per occurrence).

    Scale: embarrassingly parallel map stage, no shuffle; the merge
    list broadcasts with the serialized closure (k entries — KBs)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    word_re = re.compile(WORD_RE)

    def encode_word(word: str) -> list[str]:
        syms = list(word) + [END]
        while len(syms) > 1:
            best_rank, best_pair = None, None
            for p in zip(syms, syms[1:]):
                r = ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, p
            if best_pair is None:
                break
            a, b = best_pair
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

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(text):
            toks: list[str] = []
            for w in word_re.findall(text or ""):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w)
                toks.extend(got)
            return toks

        return texts.map(enc)

    return df.withColumn(out_col, encode(F.col(text_col)))
