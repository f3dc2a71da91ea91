"""Deduplication operators (SURVEY.md §2.2 X-12): exact, MinHash+LSH,
SimHash, n-gram Jaccard verification.

Spark-first design: every stage is built-in DataFrame functions —
``split/transform/slice/xxhash64/array_min/explode/groupBy`` — so the whole
pipeline stays JVM-side with whole-stage codegen. No pyspark.ml, no Python
UDFs.

Scale shape (100 TB): per-doc signature computation is narrow (no shuffle);
the only shuffles are (a) the explode-band → groupBy(band) bucket join,
whose fan-in is bounded by band count × docs, and (b) the candidate-pair
verification join, bounded by LSH candidate volume (tunable via
bands/rows). That is the standard scalable near-dup topology — never the
O(n²) all-pairs join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_demo_spark.cache import tracked_persist, tracked_view
from etl_demo_spark.ops import spread_for_cpu
from etl_demo_spark.text import fingerprint, tokens, tokens_sql

# The one-shot SQL compositions below splice DataFrames into spark.sql()
# strings via cache.tracked_view: process-unique temp-view names, dropped
# at the SAME unit-of-work boundary that releases the persists. NEVER
# drop these views eagerly — dropTempView uncaches any persisted plan
# the view matches (see tracked_view's docstring for the measured
# failure). spark.sql() analyzes eagerly, so the names cannot collide
# across sequential builds.


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup, deterministic keeper: min(id) per duplicate group.
    (``dropDuplicates`` keeps an arbitrary row — fine for pipelines,
    useless for differential testing.) One hash-agg shuffle on key_cols."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies")
    )


def exact_dedup_by_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on the normalized-text md5 fingerprint — robust to
    whitespace/case formatting, shuffles 16-byte keys instead of full
    documents (the 100 TB version of groupBy(text))."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# --------------------------------------------------------------------------
# Shingles + MinHash + LSH banding
# --------------------------------------------------------------------------


def _shingles_sql(toks: str, k: int) -> str:
    """``shingles_from_tokens`` as a raw SQL fragment (spliced into the
    one-shot SQL compositions below; semantics documented on the
    function)."""
    t = f"`{toks}`"
    n_sql = f"(size({t}) - {k - 1})"
    return (
        f"array_distinct(transform("
        f"CASE WHEN {n_sql} >= 1 THEN sequence(1, {n_sql}) "
        f"ELSE CAST(array() AS array<int>) END, "
        f"i -> concat_ws(' ', slice({t}, i, {k}))))"
    )


def shingles_from_tokens(toks: Column | str, k: int = 3) -> Column:
    """k-token shingle strings from an ALREADY-PROJECTED tokens column.

    Project ``tokens(text)`` under a name in a prior select and pass that
    column here. The two-step shape matters for throughput: the tokens
    alias is referenced several times (size, sequence bound, and the
    per-position lambda), so Catalyst's CollapseProject keeps it as a
    real column evaluated ONCE per row — whereas a single fused
    expression re-runs the regex tokenizer once per shingle position
    (measured 6.7× slower on the 5k-doc bench corpus).

    Documents with fewer than k tokens yield an EMPTY array (their
    MinHash signature becomes all-NULL): Spark's ``sequence(1, 0)``
    counts DOWN to [1, 0] (default step −1 when start > stop), which
    would feed ``slice`` an invalid start of 0 and crash the job — the
    conditional makes the short-doc branch explicit instead.

    Named-column inputs take a single-``F.expr`` fast path (one py4j
    roundtrip instead of ~40 for the composed higher-order-function
    form); identical analyzed expression and values — pinned by
    tests/test_expr_sql_parity.py."""
    if isinstance(toks, str):
        return F.expr(_shingles_sql(toks, k))
    n = F.size(toks) - F.lit(k - 1)
    positions = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(positions, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )


def shingles(text: Column | str, k: int = 3) -> Column:
    """k-token shingle strings straight from text — convenience form.

    HOT-PATH WARNING: as one fused expression, the tokenizer inside the
    per-position lambda re-evaluates per shingle. Operators that shingle
    whole corpora project ``tokens(text)`` first and use
    ``shingles_from_tokens`` (see its docstring for the measured gap);
    keep this form for small frames and tests."""
    return shingles_from_tokens(tokens(text), k)


# Odd multipliers/offsets for the (a*h + b) hash family, derived from the
# golden-ratio constant (splitmix64-style). Long overflow wraps (non-ANSI)
# — exactly what a hash mix wants, and deterministic.
_MIX_A = 0x9E3779B97F4A7C15
_MIX_B = 0xBF58476D1CE4E5B9


def hash_shingles(shingle_col: Column | str) -> Column:
    """One xxhash64 per shingle — materialize this as its own projection so
    the string hashing runs exactly once (it is the expensive part).
    Named-column inputs take the one-roundtrip F.expr path."""
    if isinstance(shingle_col, str):
        return F.expr(_hash_shingles_sql(shingle_col))
    return F.transform(shingle_col, lambda s: F.xxhash64(s))


def _hash_shingles_sql(col: str) -> str:
    return f"transform(`{col}`, s -> xxhash64(s))"


def _minhash_sig_sql(col: str, num_hashes: int) -> str:
    """``minhash_signature`` as a raw SQL fragment. arrays_zip over
    unnamed array literals names its struct fields by position
    ("0"/"1") — field names are type-internal only; the transform
    output is the same array<bigint> as the Column form."""
    a = [((2 * j + 1) * _MIX_A) % (1 << 63) for j in range(num_hashes)]
    b = [((j + 1) * _MIX_B) % (1 << 63) for j in range(num_hashes)]
    arr_a = ",".join(f"{v}L" for v in a)
    arr_b = ",".join(f"{v}L" for v in b)
    return (
        f"transform(arrays_zip(array({arr_a}), array({arr_b})), "
        f"c -> array_min(transform(`{col}`, h -> c.`0` * h + c.`1`)))"
    )


def minhash_signature(hash_col: Column | str, num_hashes: int = 64) -> Column:
    """MinHash signature over precomputed shingle hashes.

    The j-th hash function is the affine mix ``a_j * h + b_j`` over the
    long hashes — 64 minhashes cost one string-hash pass (hash_shingles)
    plus cheap integer ops, instead of 64 separate string-hash passes.
    Wrapping long arithmetic is deterministic and fine for a hash family.

    Round-10: the per-j expressions are folded into ONE nested transform
    over a literal (a, b) coefficient array instead of ``num_hashes``
    separately constructed array_min(transform(...)) trees. Identical
    values (same longs, same wrapping arithmetic, same order); the
    expression tree shrinks ~num_hashes×, which cuts driver-side build +
    analysis time (measured: the 32-hash signature build dominated the
    corpus query's DataFrame construction).

    Round-11: named-column inputs emit the whole thing as ONE SQL string
    (one py4j roundtrip vs ~100 — the literal coefficient arrays alone
    were dozens of calls); same Catalyst tree after parsing, values
    pinned by tests/test_expr_sql_parity.py."""
    a = [((2 * j + 1) * _MIX_A) % (1 << 63) for j in range(num_hashes)]
    b = [((j + 1) * _MIX_B) % (1 << 63) for j in range(num_hashes)]
    if isinstance(hash_col, str):
        return F.expr(_minhash_sig_sql(hash_col, num_hashes))
    coeffs = F.arrays_zip(F.lit(a).alias("a"), F.lit(b).alias("b"))
    return F.transform(
        coeffs,
        lambda c: F.array_min(F.transform(hash_col, lambda h: c["a"] * h + c["b"])),
    )


def _band_keys_sql(col: str, bands: int, rows_per_band: int) -> str:
    """``lsh_band_keys`` as a raw SQL fragment (NULL marker identical to
    the Column form's serializer)."""
    return (
        f"transform(sequence(0, {bands - 1}), b -> xxhash64(b, "
        f"concat_ws(',', transform("
        f"slice(`{col}`, b * {rows_per_band} + 1, {rows_per_band}), "
        f"x -> coalesce(cast(x AS string), '∅')))))"
    )


def lsh_band_keys(sig_col: Column | str, bands: int, rows_per_band: int) -> Column:
    """Band keys: hash of each ``rows_per_band``-slice of the signature.
    Docs sharing any band key become candidates. NULL signature positions
    serialize as an explicit marker — ``concat_ws`` silently DROPS NULLs,
    which would make [1, NULL, 2] and [1, 2, NULL] falsely collide.
    Named-column inputs take the one-roundtrip F.expr path (values pinned
    by tests/test_expr_sql_parity.py)."""
    if isinstance(sig_col, str):
        return F.expr(_band_keys_sql(sig_col, bands, rows_per_band))

    def ser(x: Column) -> Column:
        return F.coalesce(x.cast("string"), F.lit("\u2205"))

    # one transform over the band-index sequence instead of `bands`
    # separately built xxhash64 trees \u2014 identical values (the band index
    # enters the hash as the same INT type sequence() produces), much
    # smaller expression tree (driver build/analysis cost).
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            b,
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(sig_col, b * F.lit(rows_per_band) + F.lit(1), F.lit(rows_per_band)),
                    ser,
                ),
            ),
        ),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash LSH banding.

    explode(bands) → self-join on band key with id< id ordering →
    distinct pairs. Estimated Jaccard = matching signature positions.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}): "
            "trailing signature positions would be computed but never banded, "
            "silently changing the LSH S-curve"
        )
    rows_per_band = num_hashes // bands
    # CPU-heavy per-row signature stage: spread a too-narrow input first
    df = spread_for_cpu(df)
    spark = df.sparkSession
    # ONE-SHOT SQL COMPOSITION (round 11, guide §7): the signature chain
    # is built as a single WITH-chain in one spark.sql() call instead of
    # five chained Dataset ops. Each Dataset op over this pipeline's
    # large analyzed tree cost 20–50 ms of JVM plan manipulation at
    # build time (measured); the SQL form parses+analyzes once. The CTE
    # chain lowers to the IDENTICAL Project-over-Project logical shape
    # the select chain produced — in particular __toks stays a real
    # projected column referenced by name, so CollapseProject keeps the
    # tokenizer evaluated ONCE per row (the property the old select
    # chain existed to protect; see shingles_from_tokens).
    #
    # gated CTE: docs with no shingles (< k tokens) have no MinHash
    # evidence and would all share identical all-NULL signatures — every
    # pair of them becomes a candidate (O(n²) on boilerplate-stripped
    # empties). They cannot be near-dup candidates by this family; exact
    # dedup (fingerprint) owns identical short docs. The gate runs on
    # TOKEN count, not size(shingles) — a size(sh)-shaped predicate
    # would be pushed below the projection with the whole shingle
    # expression substituted in, recomputing the shingling per row just
    # to test emptiness (measured 0.3 s → 3.0 s on the 5k-doc corpus).
    # NESTED subqueries, deliberately NOT a WITH-chain: a cached plan that
    # contains a WithCTE node is never substituted by the CacheManager
    # when the consuming query carries its own WITH clause (conflicting
    # cteIds are renumbered inside the view subtree, breaking sameResult
    # — reproduced minimally in-session, round 11). Each stage is
    # referenced exactly once, so nesting is semantically identical and
    # keeps the plan WithCTE-free, which is what lets the banded persist
    # below actually get used by the self-join and by jaccard_verify.
    docs_v = tracked_view(df, "mh_docs")
    banded = spark.sql(
        f"""
        SELECT id, sig,
               explode({_band_keys_sql("sig", bands, rows_per_band)}) AS band_key
        FROM (
          SELECT id, {_minhash_sig_sql("shh", num_hashes)} AS sig
          FROM (
            SELECT id, {_hash_shingles_sql("sh")} AS shh
            FROM (
              SELECT id, {_shingles_sql("__toks", shingle_k)} AS sh
              FROM (
                SELECT `{id_col}` AS id, {tokens_sql(text_col)} AS __toks
                FROM {docs_v}
              ) base
              WHERE size(__toks) >= {shingle_k}
            ) sh_t
          ) shh_t
        ) sig_t
        """
    )
    # Both sides of the self-join read `banded`. Plan-level exchange reuse
    # usually makes that one computation, but AQE can re-plan the two sides
    # independently and recompute the (CPU-dominant) signature stage twice —
    # observed as bimodal runtimes. Persisting pins it to exactly one pass;
    # the banded signatures are num_hashes longs + key per doc×band, a tiny
    # fraction of the input corpus, so memory cost is negligible at scale.
    # The lazy result still references the cache (no safe in-function
    # unpersist point), so it is TRACKED: cache.release_persisted() frees
    # it at the next unit-of-work boundary (corpus queries do this
    # automatically; iterative per-batch callers call it between batches).
    banded = tracked_persist(banded)
    band_v = tracked_view(banded, "mh_band")
    # self-join + distinct + estimated jaccard (= fraction of equal
    # signature positions) in one statement; CAST(n AS DOUBLE)/CAST(k AS
    # DOUBLE) is the same double division as .cast("double")/lit(float(k))
    pairs = spark.sql(
        f"""
        SELECT id_a, id_b,
               CAST(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y),
                                z -> z)) AS DOUBLE)
               / CAST({num_hashes} AS DOUBLE) AS est_jaccard
        FROM (
          SELECT DISTINCT l.id AS id_a, r.id AS id_b,
                          l.sig AS sig_a, r.sig AS sig_b
          FROM {band_v} l JOIN {band_v} r
            ON l.band_key = r.band_key AND l.id < r.id
        )
        """
    )
    return pairs


def jaccard_verify(
    candidates: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard on LSH candidates only (never all-pairs):
    |A∩B| / |A∪B| over distinct shingle sets."""
    df = spread_for_cpu(df)
    spark = df.sparkSession
    # the verify stage must touch CANDIDATE docs only: semi-join the corpus
    # down to ids that appear in a candidate pair before shingling —
    # shingle hashing cost scales with candidates, not corpus size.
    # Persist the (tiny) candidate set: it feeds both the semi-join and
    # the verification join, and without caching the whole LSH pipeline
    # would execute twice. Tracked → released at the next unit-of-work
    # boundary (cache.release_persisted).
    candidates = tracked_persist(candidates)
    # ONE-SHOT SQL COMPOSITION (round 11, guide §7) — replaces seven
    # Dataset ops each paying 20–50 ms of JVM plan manipulation over the
    # large candidate tree (measured; build time is pure driver overhead
    # at any scale). Semantics preserved exactly:
    #   * ids: DISTINCT explode(array(id_a, id_b)) = the old
    #     select(id_a) ∪ select(id_b) |> distinct() multiset;
    #   * the IN-subquery lowers to the same left-semi join the old
    #     explicit join produced (NULL ids never match in either form);
    #   * sh_t keeps __toks a real projected column (tokenizer runs once
    #     per row — see minhash_lsh_candidates);
    #   * jaccard and the threshold filter are the same expressions.
    cand_v = tracked_view(candidates, "jv_cand")
    docs_v = tracked_view(df, "jv_docs")
    # sh_t inlined twice (sides a and b) instead of a shared CTE: the old
    # Dataset form also carried two copies of the shingle subtree (one
    # per join side), and a WITH clause here would stop the CacheManager
    # from substituting the persisted candidates (see the WithCTE note in
    # minhash_lsh_candidates — measured: the whole LSH pipeline re-ran
    # once per plan branch, 3 scans became 12)
    # explicit LEFT SEMI JOIN, not an IN-subquery: the subquery rewrite
    # planned TWO extra LeftSemi joins (one per pushed-down predicate
    # copy, 4 total) with their exchanges; the explicit form plans one
    # per side, matching the old Dataset left_semi shape
    sh_subq = f"""(
          SELECT id, {_shingles_sql("__toks", shingle_k)} AS sh
          FROM (
            SELECT `{id_col}` AS id, {tokens_sql(text_col)} AS __toks
            FROM (
              SELECT d.* FROM {docs_v} d
              LEFT SEMI JOIN (
                SELECT DISTINCT cid FROM (
                  SELECT explode(array(id_a, id_b)) AS cid FROM {cand_v}
                ) exploded
              ) ids ON d.`{id_col}` = ids.cid
            ) filtered
          ) base
        )"""
    out = spark.sql(
        f"""
        SELECT * FROM (
          SELECT id_a, id_b,
                 CAST(size(array_intersect(a.sh, b.sh)) AS DOUBLE) /
                 CAST(size(array_union(a.sh, b.sh)) AS DOUBLE) AS jaccard
          FROM {cand_v} c
          JOIN {sh_subq} a ON c.id_a = a.id
          JOIN {sh_subq} b ON c.id_b = b.id
        )
        WHERE jaccard >= CAST({threshold!r} AS DOUBLE)
        """
    )
    return out


def prefix_filter_jaccard_join(
    sets_df: DataFrame,
    threshold: float,
    id_col: str = "id",
    set_col: str = "shingles",
    verify: str = "rejoin",
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (the
    AllPairs/PPJoin family — Bayardo et al., WWW'07; Xiao et al.,
    WWW'08): every pair with Jaccard ≥ ``threshold``, no false negatives,
    without the O(n²) all-pairs join that bounds `ngram_jaccard_pairs`
    and without MinHash-LSH's probabilistic recall.

    The filter: order each doc's tokens by a GLOBAL total order
    (document frequency asc, token asc — rare tokens first, minimizing
    candidates; any consistent order is correct). If |x∩y|/|x∪y| ≥ t,
    the sets must overlap within their first ``|s| − ⌈t·|s|⌉ + 1``
    tokens, so candidate pairs = equi-join on exploded PREFIX tokens —
    a plain shuffled hash join whose volume tracks how often rare
    tokens co-occur, not n². A length filter (``t·|a| ≤ |b| ≤ |a|/t``)
    prunes inside the join; exact Jaccard verifies survivors.

    Two verification topologies (``verify=``), the Vernica et al.
    (SIGMOD'10) record-carrying trade made explicit:

    - ``"rejoin"`` (default): candidates are deduplicated first, then the
      token sets are re-joined by id for exact verification. Shuffles:
      token df-count (1), doc re-sort (1), prefix self-join (1),
      candidate distinct (1), verification joins (2). The prefix-join
      exchange carries only (id, n, pos, tok) — lean at any document
      size; the right default at 100 TB.
    - ``"carry"``: the sorted token array rides through the prefix
      explode, so exact Jaccard computes INSIDE the self-join output and
      the verification joins (and their 2 exchanges) disappear —
      4 shuffles total. The cost: the prefix-join exchange carries each
      doc's full token array once per prefix token (O(prefix·|doc|) per
      doc, ~quadratic in doc size), and a pair matching k prefix tokens
      recomputes its intersection k times (the positional filter keeps k
      small). Right for short-document / high-threshold workloads where
      per-stage latency dominates; wrong for long documents.

    Float boundary slack (−1e-9) only LOOSENS the filter; the final
    exact int/int division decides thresholds. Both modes return
    identical pairs (asserted in tests/test_properties.py).

    Input: (id, set) rows, set as array<string> (pre-deduplicated, e.g.
    ``shingles()`` / char n-grams). Output: (id_a, id_b, jaccard) with
    id_a < id_b."""
    if verify not in ("rejoin", "carry"):
        raise ValueError(f"prefix_filter_jaccard_join: unknown verify mode {verify!r}")
    t = float(threshold)
    if not 0.0 < t <= 1.0:
        raise ValueError("prefix_filter_jaccard_join: threshold must be in (0, 1]")
    # persist: the shingle table feeds the token-frequency pass, the
    # prefix build, AND both verification joins — without it the
    # upstream shingling executes four times. Standard for this join:
    # the ordered token lists are materialized once in every published
    # AllPairs/PPJoin implementation. Tracked → released at the next
    # unit-of-work boundary (cache.release_persisted).
    base = tracked_persist(
        sets_df.select(
            F.col(id_col).alias("id"), F.col(set_col).alias("s"), F.size(set_col).alias("n")
        ).filter(F.col("n") > 0)
    )

    # FILTER phase runs on fixed-width long tokens, not strings: 8-byte
    # keys make the df-count shuffle, the per-doc sort, and the prefix
    # equi-join cheaper than variable-length strings. String sets are
    # hashed internally with xxhash64. Equal tokens always hash equal, so
    # a collision ADDS shared hashes, never removes them — spurious
    # candidates are rejected by the VERIFY phase, which computes Jaccard
    # on the ORIGINAL sets. The one theoretical false-negative window:
    # two DIFFERENT tokens of the SAME document colliding shrinks that
    # doc's distinct-hash count n below its true set size, tightening the
    # prefix/positional bound it is filtered under. Probability ≈
    # C(|doc|,2)/2⁶⁴ ≈ 2⁻⁴⁸ per ~300-token document — astronomically
    # small, and the oracled corpus query's exact hash-match doubles as
    # the per-run proof that no such collision occurred. Sets that
    # arrive ALREADY integer-typed (the scale-standard representation —
    # shingle-to-hash at ingest, as every MinHash-family pipeline does)
    # skip the re-hash and the filter runs on them directly. The token
    # value also serves as the total-order tiebreak — any consistent
    # global order is correct for prefix filtering.
    elem_type = sets_df.schema[set_col].dataType.elementType
    pre_hashed = isinstance(elem_type, (T.LongType, T.IntegerType))
    if verify == "carry":
        # carry mode keeps the original tokens alongside the filter keys
        # so the in-join verification stays exact under hash collisions
        toks = base.select("id", "n", F.explode("s").alias("tok_s")).select(
            "id",
            "n",
            (F.col("tok_s") if pre_hashed else F.xxhash64("tok_s")).alias("tok"),
            "tok_s",
        )
        st_entry = F.struct("df_n", "tok", "tok_s")
    else:
        toks = base.select("id", "n", F.explode("s").alias("tok_s")).select(
            "id",
            "n",
            (F.col("tok_s") if pre_hashed else F.xxhash64("tok_s")).alias("tok"),
        )
        st_entry = F.struct("df_n", "tok")
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df_n"))
    # per-doc tokens sorted by the global (df_n, tok) order; prefix length
    # p = n − ceil(t·n) + 1 (slack keeps boundary pairs IN, never out).
    # dfreq is vocabulary-sized (≪ corpus): broadcast it so re-attaching
    # frequencies to the token stream costs no exchange of the big side —
    # at web scale swap the hint for a shuffle join, the topology holds.
    ordered = (
        toks.join(F.broadcast(dfreq), "tok")
        .groupBy("id", "n")
        .agg(F.sort_array(F.collect_list(st_entry)).alias("st"))
    )
    p = F.col("n") - F.ceil(F.lit(t) * F.col("n") - F.lit(1e-9)) + F.lit(1)
    carry_cols = (
        [F.expr("transform(st, x -> x.tok_s)").alias("toks")]
        if verify == "carry"
        else []
    )
    prefix = ordered.select(
        "id",
        "n",
        *carry_cols,
        F.posexplode(
            F.slice(F.expr("transform(st, x -> x.tok)"), F.lit(1), p.cast("int"))
        ).alias("pos", "tok"),  # pos is 0-based within the full sorted list
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    # PPJoin positional filter: a match at (sorted) positions i, j caps the
    # achievable overlap at min(n_a − i, n_b − j); Jaccard ≥ t needs
    # overlap ≥ ⌈t/(1+t)·(n_a+n_b)⌉. A true pair always passes via its
    # EARLIEST common token (loosest cap), so any-match retention with
    # this per-match prune is still complete — it just drops the hopeless
    # candidates before they reach verification.
    min_overlap = F.ceil(
        F.lit(t / (1.0 + t)) * (F.col("a.n") + F.col("b.n")) - F.lit(1e-9)
    )
    match_cond = (
        (F.col("a.tok") == F.col("b.tok"))
        & (F.col("a.id") < F.col("b.id"))
        & (
            F.least("a.n", "b.n").cast("double")
            >= F.lit(t) * F.greatest("a.n", "b.n") - F.lit(1e-9)
        )
        & (
            F.least(F.col("a.n") - F.col("a.pos"), F.col("b.n") - F.col("b.pos"))
            >= min_overlap
        )
    )
    if verify == "carry":
        # exact Jaccard directly on the carried sorted arrays — same set
        # as the input sets, just reordered; no verification joins
        inter_c = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
        jac_c = inter_c.cast("double") / (
            F.col("a.n") + F.col("b.n") - inter_c
        ).cast("double")
        return (
            a.join(b, match_cond)
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                jac_c.alias("jaccard"),
            )
            .filter(F.col("jaccard") >= t)
            .distinct()
        )
    cand = (
        a.join(b, match_cond)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = base.select(F.col("id").alias("id_a"), F.col("s").alias("sa"))
    sb = base.select(F.col("id").alias("id_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = inter.cast("double") / (
        F.size("sa") + F.size("sb") - inter
    ).cast("double")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= t)
    )


def edit_distance_join(
    strings_df: DataFrame,
    str_col: str = "s",
    threshold: int = 2,
    q: int = 2,
) -> DataFrame:
    """EXACT edit-distance self-join: every unordered pair of DISTINCT
    strings with ``levenshtein ≤ threshold`` — fuzzy matching for entity
    resolution / typo-tolerant dedup, without the O(n²) all-pairs pass.

    Candidate generation has NO false negatives (q-gram count filter,
    Gravano et al., VLDB'01): if ed(x, y) ≤ k then x and y share at least
    ``max(|x|,|y|) − q + 1 − k·q`` q-grams, which is ≥ 1 whenever the
    LONGER string has length ≥ (k+1)·q. So:

    - pairs whose longer string has length ≥ (k+1)·q come from a plain
      equi-join on exploded distinct q-grams plus the length filter
      ``|len(a) − len(b)| ≤ k`` (both are necessary conditions);
    - pairs where BOTH strings are shorter than (k+1)·q but the longer
      has length ≥ k+1 use the SAME count filter at q=1 (ed ≤ k destroys
      at most k character occurrences, so ≥ max(|x|,|y|)−k ≥ 1 character
      VALUES are shared): a unigram equi-join, still never all-pairs.
      The |Σ|^((k+1)q−1) "alphabet-bounded" argument alone would not do —
      for the defaults that bound is in the millions, so a corpus
      dominated by short codes would degrade to an unpruned cross join;
    - only pairs whose LONGER string has length ≤ k remain, and for those
      ed(x, y) ≤ max(|x|,|y|) ≤ k holds unconditionally — every in-band
      pair IS a result, so the residual cross join does no wasted work
      (it is output-sized) and its input is strings of ≤ k characters.

    Exact ``levenshtein`` (JVM built-in, whole-stage codegen) verifies
    every candidate; the filter only prunes, never decides. Output:
    ``(a, b, dist)`` with a < b lexicographically, one row per distinct
    string pair."""
    k = int(threshold)
    if k < 0:
        raise ValueError("edit_distance_join: threshold must be >= 0")
    if q < 1:
        raise ValueError("edit_distance_join: q must be >= 1")
    min_long = (k + 1) * q
    base = (
        strings_df.select(F.col(str_col).alias("s"))
        .filter(F.col("s").isNotNull())
        .distinct()
        .select("s", F.length("s").alias("n"))
    )
    grams = base.select(
        "s",
        "n",
        F.explode(
            F.array_distinct(
                F.expr(f"transform(sequence(1, greatest(n - {q} + 1, 0)), i -> substring(s, i, {q}))")
            )
        ).alias("g"),
    )
    ga, gb = grams.alias("a"), grams.alias("b")
    len_ok = F.abs(F.col("a.n") - F.col("b.n")) <= F.lit(k)
    long_pairs = (
        ga.join(
            gb,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.s") < F.col("b.s"))
            & len_ok
            & (F.greatest("a.n", "b.n") >= F.lit(min_long)),
        )
        .select(F.col("a.s").alias("sa"), F.col("b.s").alias("sb"))
    )
    shorts = base.filter(F.col("n") < min_long)
    uni = shorts.select(
        "s",
        "n",
        F.explode(
            F.array_distinct(
                F.expr("transform(sequence(1, n), i -> substring(s, i, 1))")
            )
        ).alias("g"),
    )
    ua, ub = uni.alias("a"), uni.alias("b")
    short_gram_pairs = ua.join(
        ub,
        (F.col("a.g") == F.col("b.g"))
        & (F.col("a.s") < F.col("b.s"))
        & len_ok
        & (F.greatest("a.n", "b.n") >= F.lit(k + 1)),
    ).select(F.col("a.s").alias("sa"), F.col("b.s").alias("sb"))
    tiny = shorts.filter(F.col("n") <= k)
    ta, tb = tiny.alias("a"), tiny.alias("b")
    tiny_pairs = ta.join(
        tb, (F.col("a.s") < F.col("b.s")) & len_ok
    ).select(F.col("a.s").alias("sa"), F.col("b.s").alias("sb"))
    cand = long_pairs.unionByName(short_gram_pairs).unionByName(tiny_pairs).distinct()
    dist = F.levenshtein("sa", "sb")
    return (
        cand.select(F.col("sa").alias("a"), F.col("sb").alias("b"), dist.alias("dist"))
        .filter(F.col("dist") <= k)
    )


# --------------------------------------------------------------------------
# Fused near-dup pipeline (single pass, no persist)
# --------------------------------------------------------------------------


def minhash_signature_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """``(id, sig, hset)`` per document via explode → hash aggregation.

    Alternative to the per-row higher-order-function fold
    (``minhash_signature``): explode the shingles, hash each string ONCE,
    and compute all ``num_hashes`` mins as plain MIN aggregates inside one
    whole-stage-codegen'd hash aggregation with map-side partial combine.
    The shingle-hash set (``hset``) rides along via ``collect_set`` so
    exact-Jaccard verification later needs no second pass over the corpus.

    Measured A/B at bench scale (5k docs × ~300 chars, local[32], warm):
    the narrow fold + candidate-only rescan wins ~2× end-to-end — this
    path's agg shuffle carries the hash sets, and shuffled bytes cost more
    than re-deriving sets from the pruned columnar scan. Use this variant
    when the source scan is NOT cheaply re-derivable (e.g. documents
    arriving from a joined/decoded upstream stage that would otherwise
    recompute).

    Empty docs (< shingle_k tokens) keep a row with all-NULL mins and an
    empty hset, matching ``array_min`` over an empty array."""
    ex = df.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("__toks")
    ).select(
        "id", F.explode_outer(shingles_from_tokens("__toks", shingle_k)).alias("sh")
    ).select(
        "id",
        # NULL shingle (empty doc) must hash to NULL so MIN ignores it —
        # bare xxhash64(NULL) would return the seed hash, a real value.
        F.when(F.col("sh").isNotNull(), F.xxhash64("sh")).alias("h"),
    )
    mins = []
    for j in range(num_hashes):
        a = F.lit(((2 * j + 1) * _MIX_A) % (1 << 63)).cast("long")
        b = F.lit(((j + 1) * _MIX_B) % (1 << 63)).cast("long")
        mins.append(F.min(a * F.col("h") + b).alias(f"m{j}"))
    agg = ex.groupBy("id").agg(*mins, F.collect_set("h").alias("hset"))
    return agg.select(
        "id", F.array(*[F.col(f"m{j}") for j in range(num_hashes)]).alias("sig"), "hset"
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """End-to-end near-dup pairs: MinHash LSH candidates + exact n-gram
    Jaccard verification, fused into one single-pass pipeline over the
    hash-agg signature table (see ``minhash_signature_table`` for when to
    prefer this over the scan-recompute composition used by the corpus
    query — at bench scale the latter measures ~2× faster).

    Topology: one narrow shingle+hash stage feeding one hash-agg shuffle on
    doc id; the band-key self-join shuffles only ``(id, band_key)`` rows;
    verification joins the candidate pairs back to the signature table's
    shingle-hash sets, so exact Jaccard costs candidates ×
    set-intersection, never a second corpus scan. Returns
    ``(id_a, id_b, est_jaccard, jaccard)`` with ``jaccard >= threshold``."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    rows_per_band = num_hashes // bands
    # the signature table feeds FOUR plan branches (both self-join sides
    # plus the a/b verification joins); persist pins the expensive
    # shingle+hash aggregation to one execution — AQE re-plans the
    # branches independently and would otherwise recompute it (the same
    # bimodal-runtime failure minhash_lsh_candidates documents)
    sigs = tracked_persist(
        minhash_signature_table(df, text_col, id_col, num_hashes, shingle_k)
    )
    # all-NULL-signature docs (< shingle_k tokens, empty hset) carry no
    # MinHash evidence; with NULL-safe band keys they would ALL collide
    # in every band — an O(n²) candidate blowup on short docs
    sigs = sigs.filter(F.size("hset") > 0)
    banded = sigs.select(
        "id", F.explode(lsh_band_keys(F.col("sig"), bands, rows_per_band)).alias("band_key")
    )
    pairs = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band_key") == F.col("r.band_key")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    a = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), F.col("hset").alias("hset_a"))
    b = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), F.col("hset").alias("hset_b"))
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda x: x)).cast("double")
        / F.lit(float(num_hashes))
    )
    jac = (
        F.size(F.array_intersect("hset_a", "hset_b")).cast("double")
        / F.size(F.array_union("hset_a", "hset_b")).cast("double")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", est.alias("est_jaccard"), jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_bits(text: Column | str, bits: int = 64) -> Column:
    """SimHash: per token, xxhash64 contributes ±1 to each bit position;
    output bit = sign of the accumulated vector. Expressed as a pure
    aggregate fold over the token array — zero shuffles, zero UDFs.
    Bit positions are unrolled statically (shift amounts must be literals
    in the DataFrame API)."""

    def bit_contrib(t: Column) -> Column:
        h = F.xxhash64(t)
        return F.array(
            *[
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                for i in range(bits)
            ]
        )

    toks = F.array_distinct(tokens(text))
    zero = F.array_repeat(F.lit(0), bits)
    acc = F.aggregate(toks, zero, lambda acc, t: F.zip_with(acc, bit_contrib(t), lambda a, b: a + b))
    return F.transform(acc, lambda v: (v > 0).cast("int"))


def simhash_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """Scalable SimHash: explode tokens → one xxhash64 per token → 64
    conditional SUMs in a single hash aggregation → sign → packed long.

    This shape beats the per-row array fold at scale: the aggregation is
    vectorized with map-side partial aggregation (the explode never hits
    the shuffle — only 64 partial sums per doc do), and the generated code
    per expression stays small. One shuffle on ``id_col``."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    )
    h = F.xxhash64("tok")
    sums = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("id").agg(*sums)
    packed = F.lit(0).cast("long")
    for i in range(bits):
        packed = packed.bitwiseOR(
            F.shiftleft((F.col(f"b{i}") > 0).cast("long"), i)
        )
    return agg.select("id", packed.alias("simhash"))


def pack_bits(bits_col: Column, bits: int = 64) -> Column:
    """Pack an int-0/1 array into a single signed long (static shifts)."""
    packed = F.lit(0).cast("long")
    for i in range(bits):
        packed = packed.bitwiseOR(
            F.shiftleft(F.element_at(bits_col, i + 1).cast("long"), i)
        )
    return packed


def hamming_distance(bits_a: Column, bits_b: Column) -> Column:
    return F.size(F.filter(F.zip_with(bits_a, bits_b, lambda a, b: a != b), lambda x: x))


# --------------------------------------------------------------------------
# Connected components: near-dup pairs → duplicate clusters
# --------------------------------------------------------------------------


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Label every vertex of the pair graph with its component's minimum
    id — the step that turns near-dup PAIRS into duplicate CLUSTERS (keep
    ``component``, drop the rest).

    Algorithm: iterative min-label propagation. Each round every vertex
    adopts the smallest label in its closed neighborhood; converges in
    O(diameter) rounds — near-dup graphs are unions of small cliques from
    LSH buckets, so the diameter (and round count) is tiny. Each round is
    one co-keyed join + one agg on vertex id; intermediates are
    checkpoint-free because the edge set is re-derived from the (small)
    candidate pairs, not the corpus. The driver-side loop only compares a
    scalar convergence count per round (no data collects).

    At 100 TB: rounds are sequential Spark jobs over the PAIR set —
    bounded by LSH candidate volume, orders of magnitude below corpus
    size. For adversarial long-chain graphs use
    ``connected_components_star`` (large-star/small-star, O(log²(n))
    rounds); near-dup clustering rarely needs it.

    Returns ``(id, component)`` for every vertex that appears in an edge.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    sym.persist()
    labels = sym.select(F.col("u").alias("vid")).distinct().select(
        "vid", F.col("vid").alias("label")
    )
    try:
        for _ in range(max_iterations):
            neighbor_min = (
                sym.join(labels, F.col("v") == F.col("vid"))
                .groupBy(F.col("u").alias("nu"))
                .agg(F.min("label").alias("nmin"))
            )
            new_labels = (
                labels.join(neighbor_min, F.col("vid") == F.col("nu"), "left")
                .select(
                    "vid",
                    F.least(
                        F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                    ).alias("label"),
                )
            )
            # localCheckpoint truncates the per-round lineage (analysis
            # cost would compound across rounds) and leaves nothing
            # persisted behind after the call returns
            new_labels = new_labels.localCheckpoint(eager=True)
            changed = (
                new_labels.select("vid", F.col("label").alias("new_label"))
                .join(labels, "vid")
                .filter(F.col("new_label") != F.col("label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        return labels.select(
            F.col("vid").alias("id"), F.col("label").alias("component")
        )
    finally:
        sym.unpersist()


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the O(log² n)-round variant for graphs with long chains / large
    diameter, where plain min-label propagation
    (``connected_components``) needs O(diameter) rounds.

    Each round rewires edges toward stars rooted at component minima:
    large-star re-attaches every neighbor LARGER than u to the minimum
    of u's closed neighborhood; small-star re-attaches u and its
    not-larger neighbors to that minimum. Both are one co-keyed hash
    aggregation + join over the (LSH-bounded) pair set. Rounds are
    localCheckpoint-ed: without truncation the plan lineage compounds
    per round and analysis cost explodes long before data cost does.
    Convergence = the canonical edge set's (count, hash-sum) fingerprint
    stabilizing — one aggregate action per round, no full comparison.

    Returns ``(id, component)`` for every vertex in an edge, identical
    output contract to ``connected_components``."""

    def canon(e: DataFrame) -> DataFrame:
        return (
            e.filter(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
            .distinct()
        )

    def sym(e: DataFrame) -> DataFrame:
        return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def nbr_min(e_sym: DataFrame) -> DataFrame:
        # min of the CLOSED neighborhood (neighbors ∪ self)
        return (
            e_sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("m"))
        )

    def large_star(e: DataFrame) -> DataFrame:
        es = sym(e)
        j = es.join(nbr_min(es), "u")
        return canon(
            j.filter(F.col("v") > F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            )
        )

    def small_star(e: DataFrame) -> DataFrame:
        es = sym(e)
        j = es.join(nbr_min(es), "u")
        smaller = j.filter(F.col("v") <= F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        self_link = j.select(F.col("u"), F.col("m").alias("v"))
        return canon(smaller.union(self_link))

    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # vertices from the RAW edges: a self-loop-only vertex is its own
    # component and must survive even though canon() drops the loop edge
    vertices = (
        raw.select(F.col("u").alias("vid"))
        .union(raw.select(F.col("v").alias("vid")))
        .distinct()
    )
    cur = canon(raw)
    vertices = vertices.localCheckpoint(eager=True)
    cur = cur.localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_iterations):
        nxt = small_star(large_star(cur)).localCheckpoint(eager=True)
        sig = tuple(
            nxt.agg(
                F.count(F.lit(1)), F.sum(F.xxhash64("u", "v"))
            ).collect()[0]
        )
        cur = nxt
        if sig == prev_sig:
            break
        prev_sig = sig
    comp = (
        sym(cur).groupBy("u").agg(F.min("v").alias("mn"))
        .select("u", F.least("u", "mn").alias("component"))
    )
    return (
        vertices.join(comp, vertices.vid == comp.u, "left")
        .select(
            F.col("vid").alias("id"),
            F.coalesce("component", F.col("vid")).alias("component"),
        )
    )


def incremental_dedup(
    batch: DataFrame,
    seen_fps: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Cross-batch exact dedup against a persistent fingerprint store.

    A continuously-ingesting training pipeline must not re-admit a
    document it accepted in ANY earlier batch — global re-dedup per batch
    is O(corpus) and unaffordable at 100 TB. This keeps a store of
    16-byte fingerprints instead: the new batch dedups within itself
    (min-id keeper), anti-joins the store to drop cross-batch repeats,
    and emits the updated store for the next batch.

    Returns ``(kept, new_store)`` — ``kept`` the surviving (id, fp) rows
    of this batch, ``new_store`` = old store ∪ kept fingerprints.

    Scale: the store is fingerprints only (16 bytes/doc — ~1.6 TB per
    100 G docs, parquet-partitionable by fp prefix); the anti-join is a
    shuffle on fp that co-partitions with a fp-bucketed store layout, and
    within-batch dedup shuffles only the incoming batch.
    """
    fps = batch.select(
        F.col(id_col), fingerprint(text_col).alias("fp")
    )
    within = (
        fps.groupBy("fp").agg(F.min(id_col).alias(id_col))
    )
    kept = (
        within
        if seen_fps is None
        else within.join(seen_fps.select("fp"), on="fp", how="left_anti")
    )
    new_store = (
        kept.select("fp")
        if seen_fps is None
        else seen_fps.select("fp").unionByName(kept.select("fp"))
    )
    return kept.select(id_col, "fp"), new_store


def sorted_neighborhood_candidates(
    df: DataFrame,
    sort_key: Column,
    id_col: str = "doc_id",
    window: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Sorted-Neighborhood Method (SNM) blocking — the third classic
    candidate-generation family next to LSH banding (minhash_lsh_candidates)
    and prefix filtering (prefix_filter_jaccard_join): sort the corpus by a
    fuzzy blocking key, then emit exactly the pairs within ``window``
    positions of each other (Hernández & Stolfo's merge/purge method).
    Useful where near-dups share a key PREFIX (titles, URLs, names) —
    cost is n·window pairs by construction, independent of how skewed
    token frequencies are (the case that inflates prefix-filter joins).

    Scale topology: ONE wide exchange (the range shuffle inside
    ops.global_row_number — a distributed ORDER BY, no single-partition
    window), then the neighborhood self-join runs as an equi-join on
    ``floor(rank/window)`` buckets with the right side exploded to its own
    and the preceding bucket — bounded 2× fan-out, never a range join or
    cartesian. Emits (id_a, id_b) with id_a the LOWER-ranked document of
    the pair; verification (exact Jaccard etc.) composes downstream on
    candidates only.

    ``sort_key`` ties are broken by ``id_col``, so the rank — and the
    candidate set — is deterministic on any partitioning.
    """
    from etl_demo_spark.ops import global_row_number

    ranked = global_row_number(
        df.select(F.col(id_col), sort_key.alias("__snm_key")),
        [F.col("__snm_key").asc(), F.col(id_col).asc()],
        rank_col="__rn",
        num_partitions=num_partitions,
    )
    bkt = F.floor((F.col("__rn") - 1) / window)
    a = ranked.select(
        F.col(id_col).alias("id_a"), F.col("__rn").alias("__rn_a"), bkt.alias("__bkt")
    )
    b = ranked.select(
        F.col(id_col).alias("id_b"),
        F.col("__rn").alias("__rn_b"),
        F.explode(F.array(bkt, bkt - 1)).alias("__bkt"),
    )
    return (
        a.join(b, "__bkt")
        .filter(
            (F.col("__rn_b") > F.col("__rn_a"))
            & (F.col("__rn_b") <= F.col("__rn_a") + window)
        )
        .select("id_a", "id_b")
    )


def duplicate_window_positions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Span-level exact dedup, tier three of the dedup ladder (doc-level
    exact → near-dup → repeated SUBSTRINGS): mark every k-token window
    whose content occurs more than once ANYWHERE in the corpus — the
    signal behind substring-deduplicated training sets (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", which
    builds a suffix array; the fixed-k windowed variant here is the
    shuffle-friendly formulation of the same detector).

    Returns (id, pos, whash): 0-based token position of each duplicated
    window in each document. Tokens are WORD_RE words (deterministic
    cross-engine); the window key is md5 of the space-joined window —
    content-defined, so the same 50-token boilerplate matches across
    documents regardless of position.

    Scale shape: tokenize once, build per-doc window-hash arrays with
    built-in transform/slice (no Python), posexplode to (hash, id, pos),
    and one count-over-hash shuffle of 16-byte keys — corpus-token scale,
    the same order as the reference suffix-array build but embarrassingly
    parallel and spill-friendly. A self-join back on the duplicated hash
    set stays bounded because the hot side is pre-aggregated to DISTINCT
    duplicated hashes (broadcast when small)."""
    tokens = F.expr(f"regexp_extract_all({text_col}, '[a-z]+', 0)")
    n = F.size(tokens)
    # guard the short-doc case explicitly: sequence(1, 0) would generate
    # a DESCENDING [1, 0] (Spark's sequence reverses when stop < start),
    # i.e. two phantom windows, not zero
    starts = F.when(
        n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))
    ).otherwise(F.array().cast("array<int>"))
    hashes = F.transform(
        starts,
        lambda i: F.md5(F.array_join(F.slice(tokens, i, k), " ")),
    )
    windows = (
        df.select(F.col(id_col).alias("id"), F.posexplode(hashes).alias("pos", "whash"))
        # posexplode is 0-based over the sequence positions
    )
    dup = (
        windows.groupBy("whash")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select("whash")
    )
    return windows.join(dup, "whash").select("id", "pos", "whash")


def duplicate_span_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Per-document profile of duplicated token SPANS: duplicated window
    positions are dilated to token intervals [pos, pos+k) and merged
    with the gaps-and-islands pattern (a new span starts where the gap
    from the previous marked window exceeds the window length), giving
    (id, n_dup_windows, n_spans, dup_tokens) — dup_tokens is the exact
    count of tokens covered by at least one duplicated window. The
    filtering/removal decision layer consumes this profile (e.g. drop
    docs with dup_tokens/n_tokens above a threshold, or strip the spans).

    Everything after the window shuffle is per-doc window functions —
    one partition-by-id pass, no second corpus-scale shuffle."""
    marked = duplicate_window_positions(df, text_col, id_col, k)
    w = Window.partitionBy("id").orderBy("pos")
    spans = (
        marked.withColumn("__prev", F.lag("pos").over(w))
        .withColumn(
            "__new_span",
            (F.col("__prev").isNull() | (F.col("pos") - F.col("__prev") > F.lit(k))).cast("int"),
        )
        .withColumn("__span_id", F.sum("__new_span").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
    )
    per_span = spans.groupBy("id", "__span_id").agg(
        F.min("pos").alias("__start"),
        (F.max("pos") + F.lit(k)).alias("__end"),
        F.count(F.lit(1)).alias("__n_windows"),
    )
    return (
        per_span.groupBy("id")
        .agg(
            F.sum("__n_windows").alias("n_dup_windows"),
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("__end") - F.col("__start")).alias("dup_tokens"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_dup_windows",
            "n_spans",
            "dup_tokens",
        )
    )


def strip_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    out_col: str = "text_deduped",
) -> DataFrame:
    """The removal layer over `duplicate_span_profile`: rebuild each
    document's text with every duplicated span's tokens dropped (word
    tokens only — the WORD_RE tokenization this family is defined over).
    Documents with no duplicated window pass through with their token
    stream intact.

    Built entirely from relational ops + one JVM expression: the marked
    positions aggregate to a per-doc set, and the rebuild is a filter
    over posexploded tokens — no Python stage. At 100 TB the dominant
    cost stays the single window-hash shuffle in the detector; the
    rebuild adds one per-doc pass."""
    marked = duplicate_window_positions(df, text_col, id_col, k)
    # dilate window marks to covered token positions, dedup to a set
    covered = (
        marked.select(
            "id", F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))).alias("tp")
        )
        .distinct()
        .groupBy("id")
        .agg(F.collect_set("tp").alias("__drop"))
    )
    tokens = F.expr(f"regexp_extract_all({text_col}, '[a-z]+', 0)")
    base = df.withColumn("__tokens", tokens)
    joined = base.join(
        covered, base[id_col] == covered["id"], "left"
    ).drop("id")
    kept = F.filter(
        F.transform(F.col("__tokens"), lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: F.when(
            F.col("__drop").isNull(), F.lit(True)
        ).otherwise(~F.array_contains(F.col("__drop"), s["i"])),
    )
    return (
        joined.withColumn(out_col, F.array_join(F.transform(kept, lambda s: s["t"]), " "))
        .drop("__tokens", "__drop")
    )
