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
