"""Property-based tests (SURVEY.md §5): cleaning idempotence, group-sum
conservation, net-qty checksum — on hypothesis-generated trade tables."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_demo_spark.clean import clean_trades, drop_any_null
from etl_demo_spark.pnl import aggregate_weekly, project_trades, transform

SIDES = ["buy", "sell"]
SYMBOLS = ["AAPL", "MSFT", "GOOGL"]
CLIENTS = ["gold", "silver", "bronze"]


def trade_row(valid: bool):
    ts = st.datetimes(
        min_value=datetime.datetime(2022, 12, 1), max_value=datetime.datetime(2023, 4, 1)
    ).map(lambda d: d.replace(microsecond=0).strftime("%Y-%m-%d %H:%M:%S"))
    qty = st.decimals(min_value="0.01", max_value="99.99", places=2).map(str)
    price = st.decimals(min_value="1.00", max_value="3000.00", places=2).map(str)
    if not valid:
        ts = st.sampled_from(["not_a_date", "", "2023-13-45 99:99:99"])
    return st.tuples(
        ts,
        st.integers(1001, 3005).map(str),
        st.sampled_from(CLIENTS),
        st.sampled_from(SYMBOLS),
        st.sampled_from(SIDES),
        qty,
        price,
    )


rows_strategy = st.lists(
    st.one_of(trade_row(True), trade_row(False)), min_size=1, max_size=60
)

SCHEMA = "timestamp string, user_id string, client_type string, symbol string, side string, quantity string, price string"


@pytest.fixture(scope="module")
def mk_df(spark):
    def make(rows):
        return spark.createDataFrame(rows, SCHEMA)

    return make


@given(rows=rows_strategy)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_cleaning_idempotent(mk_df, rows):
    """clean(clean(x)) == clean(x): a second drop_any_null pass removes
    nothing, and no valid row is lost (valid = parseable everywhere)."""
    df = mk_df(rows)
    cleaned = clean_trades(df)
    n1 = cleaned.count()
    assert drop_any_null(cleaned).count() == n1
    n_valid = sum(1 for r in rows if r[0] not in ("not_a_date", "", "2023-13-45 99:99:99"))
    assert n1 == n_valid


@given(rows=rows_strategy)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_group_sum_conservation(mk_df, rows):
    """sum(total_volume) is conserved through the 4-key aggregation."""
    cleaned = clean_trades(mk_df(rows))
    if cleaned.count() == 0:
        return
    pre = project_trades(cleaned).agg(F.sum("total_volume")).first()[0]
    post = aggregate_weekly(cleaned).agg(F.sum("total_volume")).first()[0]
    assert abs(pre - post) < 1e-6 * max(1.0, abs(pre))


@given(rows=rows_strategy)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_net_qty_checksum(mk_df, rows):
    """Global net_qty == buys − sells computed straight off the rows
    (the reference's `:113` checksum)."""
    cleaned = clean_trades(mk_df(rows))
    if cleaned.count() == 0:
        return
    agg = transform(cleaned)
    got = agg.agg(F.sum("net_qty")).first()[0]
    direct = cleaned.agg(
        F.sum(F.when(F.col("side") == "buy", F.col("quantity")).otherwise(-F.col("quantity")))
    ).first()[0]
    assert abs(got - direct) < 1e-6 * max(1.0, abs(direct))


@pytest.fixture(scope="module")
def spark_handle(spark):
    return spark


@given(
    quotes=st.lists(
        st.tuples(st.sampled_from(["A", "B"]), st.integers(0, 1000), st.floats(1, 100, allow_nan=False)),
        max_size=25,
    ),
    lookups=st.lists(st.tuples(st.sampled_from(["A", "B"]), st.integers(0, 1000)), min_size=1, max_size=25),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_join_matches_bisect_reference(spark_handle, quotes, lookups):
    """asof_join == per-key sorted-scan Python reference (latest quote at
    ts<=t). Quote (key, ts) pairs are deduped: equal-ts quotes have no
    defined winner in either implementation."""
    import datetime

    from etl_demo_spark.ops import asof_join

    sp = spark_handle
    seen = set()
    q2 = []
    for k, t, v in quotes:
        if (k, t) not in seen:
            seen.add((k, t))
            q2.append((k, t, round(v, 3)))
    base = datetime.datetime(2024, 1, 1)

    qdf = sp.createDataFrame(
        [(k, base + datetime.timedelta(seconds=t), v) for k, t, v in q2] or [("Z", base, 0.0)],
        "k string, qts timestamp, quote double",
    )
    ldf = sp.createDataFrame(
        [(k, base + datetime.timedelta(seconds=t)) for k, t in set(lookups)],
        "k string, ts timestamp",
    )
    out = asof_join(ldf, qdf, on="k", left_ts="ts", right_ts="qts", value_cols=["quote"])
    got = {(r["k"], r["ts"]): r["quote"] for r in out.collect()}

    by_key = {}
    for k, t, v in q2:
        by_key.setdefault(k, []).append((t, v))
    for k in by_key:
        by_key[k].sort()
    for (k, t) in set(lookups):
        cands = [(qt, v) for qt, v in by_key.get(k, []) if qt <= t]
        expect = cands[-1][1] if cands else None
        key = (k, base + datetime.timedelta(seconds=t))
        assert got[key] == expect, (k, t, got[key], expect)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(
            st.decimals(min_value="0.01", max_value="99999999.99", places=2),
            st.decimals(min_value="0.0000", max_value="0.9999", places=4),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_fixed_point_sum_equals_decimal_sum(spark, rows):
    """The scaled-long money path (money_c/rate_bp/ssum) must produce the
    bit-identical double as the exact-decimal path (dec/rate + round/cast)
    for any ≤2dp money × ≤4dp rate inputs — the equivalence the corpus
    fixed-point queries rely on."""
    from etl_demo_spark.corpus import dec, money_c, rate, rate_bp, ssum

    df = spark.createDataFrame(
        [(float(m), float(r)) for m, r in rows], "money double, disc double"
    )
    got = df.agg(
        ssum(money_c("money") * (10000 - rate_bp("disc")), 6).alias("s"),
        F.round(F.sum(dec("money") * (1 - rate("disc"))), 2).cast("double").alias("d"),
    ).first()
    assert got["s"] == got["d"], (got["s"], got["d"])


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_zorder_key_matches_python_morton(spark_handle, pts):
    """The built-in-expression Morton key must equal the reference bit
    interleave for arbitrary quantized inputs."""
    from etl_demo_spark.io.layout import zorder_key

    def morton(x: int, y: int) -> int:
        out = 0
        for i in range(16):
            out |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return out

    spark = spark_handle
    df = spark.createDataFrame(pts, ["x", "y"])
    got = [
        r["k"]
        for r in df.select(
            zorder_key([F.col("x"), F.col("y")]).alias("k")
        ).collect()
    ]
    assert got == [morton(x, y) for x, y in pts]


@given(ids=st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=100, unique=True))
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_split_assign_deterministic_and_total(spark_handle, ids):
    """Every id gets exactly one split, the assignment is stable across
    evaluations, and matches the reference md5-prefix rule."""
    import hashlib

    from etl_demo_spark.text import split_assign

    def expected(i: int) -> str:
        hb = hashlib.md5(str(i).encode()).hexdigest()[:2]
        return "train" if hb < "cd" else ("val" if hb < "e6" else "test")

    spark = spark_handle
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", split_assign("doc_id").alias("s")).collect()
    }
    assert got == {i: expected(i) for i in ids}


@given(
    target=st.lists(
        st.tuples(st.integers(0, 20), st.integers(-100, 100)),
        max_size=15,
        unique_by=lambda t: t[0],
    ),
    source=st.lists(
        st.tuples(st.integers(0, 20), st.integers(-100, 100)),
        max_size=15,
        unique_by=lambda t: t[0],
    ),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_merge_upsert_matches_dict_semantics(spark_handle, target, source):
    """merge_upsert == dict.update: source wins on matched keys,
    unmatched target rows pass through, unmatched source rows insert."""
    from etl_demo_spark.ops import merge_upsert

    spark = spark_handle
    t = spark.createDataFrame(target or [(99, 0)], "k int, v int")
    s_rows = source or []
    s = (
        spark.createDataFrame(s_rows, "k int, v int")
        if s_rows
        else spark.createDataFrame([], "k int, v int")
    )
    expected = dict(target or [(99, 0)])
    expected.update(dict(s_rows))
    got = {r["k"]: r["v"] for r in merge_upsert(t, s, ["k"]).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# Incremental dedup ≡ global dedup (cross-batch composition property)
# ---------------------------------------------------------------------------

_TEXT_POOL = [
    "alpha beta gamma", "delta epsilon", "zeta eta theta", "iota kappa",
    "lambda mu nu", "Alpha  BETA gamma",  # normalizes equal to pool[0]
]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=st.lists(
        st.lists(st.sampled_from(_TEXT_POOL), min_size=0, max_size=6),
        min_size=1,
        max_size=4,
    )
)
def test_incremental_dedup_equals_global_dedup(spark, batches):
    """Feeding batches sequentially through incremental_dedup keeps exactly
    the min-id doc per normalized fingerprint across the WHOLE stream —
    identical to one global exact dedup over the concatenation."""
    from etl_demo_spark.dedup import incremental_dedup
    from etl_demo_spark.text import fingerprint

    all_rows, next_id = [], 0
    batch_rows = []
    for b in batches:
        rows = []
        for t in b:
            rows.append((next_id, t))
            all_rows.append((next_id, t))
            next_id += 1
        batch_rows.append(rows)

    store = None
    kept_ids: set[int] = set()
    for rows in batch_rows:
        if not rows:
            continue
        bdf = spark.createDataFrame(rows, "doc_id long, text string")
        kept, store = incremental_dedup(bdf, store)
        kept_ids |= {r.doc_id for r in kept.collect()}

    if not all_rows:
        assert kept_ids == set()
        return
    full = spark.createDataFrame(all_rows, "doc_id long, text string")
    want = {
        r.keeper for r in full.select(fingerprint("text").alias("fp"), "doc_id")
        .groupBy("fp").agg(F.min("doc_id").alias("keeper")).collect()
    }
    assert kept_ids == want


# ---------------------------------------------------------------------------
# as-of join ≡ per-row brute force (whole-latest-row semantics, NULLs incl.)
# ---------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 20)),
        min_size=1, max_size=8,
    ),
    right=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(0, 20),
            st.one_of(st.none(), st.integers(0, 9).map(float)),
            st.one_of(st.none(), st.integers(0, 9).map(float)),
        ),
        min_size=0, max_size=8,
        unique_by=lambda r: (r[0], r[1]),  # one right row per (key, ts):
        # equal right timestamps have no defined winner in an as-of join
    ),
)
def test_asof_join_equals_bruteforce(spark, left, right):
    """For every left row, asof_join must return EXACTLY the value columns
    of the single latest right row with rts <= ts, including its NULL
    fields — never a blend of rows."""
    import datetime as dt

    from etl_demo_spark.ops import asof_join

    base = dt.datetime(2024, 1, 1)
    t = lambda s: base + dt.timedelta(seconds=s)
    ldf = spark.createDataFrame(
        [(k, t(s), i) for i, (k, s) in enumerate(left)],
        "k string, ts timestamp, lid long",
    )
    rdf = spark.createDataFrame(
        [(k, t(s), x, y) for (k, s, x, y) in right],
        "k string, rts timestamp, x double, y double",
    )
    got = {
        r.lid: (r.x, r.y)
        for r in asof_join(ldf, rdf, "k", "ts", "rts", ["x", "y"]).collect()
    }

    for i, (k, s) in enumerate(left):
        cands = [(rs, j, x, y) for j, (rk, rs, x, y) in enumerate(right)
                 if rk == k and rs <= s]
        want = (None, None)
        if cands:
            rs, j, x, y = max(cands, key=lambda c: c[0])
            want = (x, y)
        assert got[i] == want, (i, k, s, got[i], want)


@given(
    left=st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 120)), min_size=1, max_size=20
    ),
    right=st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 120)), min_size=1, max_size=20
    ),
    width=st.sampled_from([7, 50, 128]),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_interval_overlap_join_matches_python_reference(spark_handle, left, right, width):
    """Bucket-decomposed range join == quadratic Python reference for
    random interval sets and bucket widths (start offsets + lengths,
    including zero-length and bucket-spanning intervals); each
    overlapping pair appears exactly once."""
    from etl_demo_spark.ops import interval_overlap_join

    spark = spark_handle
    ldf = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(left)], "lid int, a_st long, a_en long"
    )
    rdf = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(right)], "rid int, b_st long, b_en long"
    )
    rows = interval_overlap_join(
        ldf, rdf, "a_st", "a_en", "b_st", "b_en", bucket_width=width
    ).collect()
    got = [(r.lid, r.rid) for r in rows]
    assert len(got) == len(set(got))  # exactly-once
    want = {
        (i, j)
        for i, (ls, ld) in enumerate(left)
        for j, (rs, rd) in enumerate(right)
        if ls <= rs + rd and rs <= ls + ld
    }
    assert set(got) == want


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-10**6, 10**6)),
            st.one_of(
                st.none(),
                st.floats(-1e9, 1e9, allow_nan=False),
                st.just(float("nan")),
            ),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs", "Cc"),
                ),
                max_size=20,
            ),
        ),
        min_size=0,
        max_size=15,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_xlsx_roundtrip_property(tmp_path_factory, rows):
    """The stdlib SpreadsheetML writer round-trips ints, floats, NaN
    (→ blank), and arbitrary (XML-escaped) unicode strings."""
    import math

    from etl_demo_spark.io.xlsx import read_xlsx_values, write_xlsx

    path = str(tmp_path_factory.mktemp("x") / "t.xlsx")
    write_xlsx(path, ["i", "f", "s"], [list(r) for r in rows])
    header, back = read_xlsx_values(path)
    assert header == ["i", "f", "s"]
    assert len(back) == len(rows)
    for (i, f, s), got in zip(rows, back):
        gi, gf, gs = got
        assert gi == i
        if f is None or (isinstance(f, float) and math.isnan(f)):
            assert gf is None
        else:
            assert gf == pytest.approx(f, rel=1e-15)
        # the reader returns numbers for numeric-looking strings only if
        # typed numeric; strings always come back as written
        assert gs == s


@given(
    st.lists(
        st.text(alphabet="abcd", min_size=0, max_size=8),
        min_size=0,
        max_size=12,
        unique=True,
    ),
    st.integers(min_value=0, max_value=3),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_edit_distance_join_property(spark_handle, words, k):
    """Randomized brute-force equivalence for the q-gram-pruned
    edit-distance join: small alphabet forces dense q-gram collisions AND
    many short strings (the fallback bucket), the two regimes where a
    pruning bug would hide."""
    import itertools

    from pyspark.sql import Row

    from etl_demo_spark.dedup import edit_distance_join

    spark = spark_handle
    if not words:
        return
    df = spark.createDataFrame([Row(s=w) for w in words], "s string")
    got = {
        (r.a, r.b): r.dist
        for r in edit_distance_join(df, str_col="s", threshold=k).collect()
    }

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
        for a, b in itertools.combinations(sorted(words), 2)
        if lev(a, b) <= k
    }
    assert got == want


# ---------------------------------------------------------------------------
# Round-6b properties: URL canonicalization, NFC normalization, PQ coding
# ---------------------------------------------------------------------------

_SCHEMES = ["http", "HTTP", "https", "HTTPS"]
_HOSTS = ["Example.COM", "www.example.com", "EXAMPLE.com:443", "a.b.org:8080"]
_PATHS = ["", "/", "/x", "/x/", "/X/y//"]
_PARAMS = ["", "?b=2&a=1", "?utm_source=s&a=1", "?fbclid=f", "?a=1&a=0"]
_FRAGS = ["", "#top"]


url_strategy = st.builds(
    lambda s, h, p, q, f: f"{s}://{h}{p}{q}{f}",
    st.sampled_from(_SCHEMES),
    st.sampled_from(_HOSTS),
    st.sampled_from(_PATHS),
    st.sampled_from(_PARAMS),
    st.sampled_from(_FRAGS),
)


@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(st.lists(url_strategy, min_size=1, max_size=12))
def test_canonical_url_idempotent(spark, urls):
    """canonical(canonical(u)) == canonical(u): the canonical form is a
    FIXED POINT — if re-canonicalizing moved anything, two pipeline runs
    would disagree on dedup keys."""
    from etl_demo_spark.web import canonical_url

    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i INT, url STRING")
    once = df.select("i", canonical_url("url").alias("c1"))
    twice = once.select("i", "c1", canonical_url("c1").alias("c2"))
    bad = twice.filter(F.col("c1") != F.col("c2")).collect()
    assert not bad, bad


@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from("abcé́̊A Åéﬁ1"),
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_nfc_normalize_idempotent_and_canonical_equivalent(spark, texts):
    """NFC is idempotent, and normalization preserves canonical
    equivalence (round-trip through Python's unicodedata agrees with the
    UDF output — the same invariant the DuckDB oracle pins)."""
    import unicodedata

    from etl_demo_spark.text import nfc_normalize_udf

    nfc = nfc_normalize_udf()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i INT, t STRING"
    )
    out = df.select("i", "t", nfc(F.col("t")).alias("n")).collect()
    for r in out:
        assert r.n == unicodedata.normalize("NFC", r.t)
        assert unicodedata.normalize("NFC", r.n) == r.n


# ---------------------------------------------------------------- blooms


@given(
    positions=st.lists(st.integers(min_value=0, max_value=(1 << 14) - 1),
                       min_size=0, max_size=200),
    target_log2=st.integers(min_value=8, max_value=14),
)
@settings(max_examples=200, deadline=None)
def test_bloom_fold_equals_direct_build(positions, target_log2):
    """Folding a bitset built at 2^14 bits down to 2^t must be
    BIT-IDENTICAL to building directly at 2^t with positions taken mod
    2^t — the identity both the adaptive build and the probe-side mask
    rely on."""
    from etl_demo_spark.io.manifest import _fold_words

    B, T = 1 << 14, 1 << target_log2
    big = [0] * (B // 64)
    small = [0] * (T // 64)
    for p in positions:
        big[p >> 6] |= 1 << (p & 63)
        q = p % T
        small[q >> 6] |= 1 << (q & 63)
    assert _fold_words(list(big), T) == small


@given(words=st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                      min_size=1, max_size=64))
@settings(max_examples=100, deadline=None)
def test_bloom_pack_roundtrip(words):
    from etl_demo_spark.io.manifest import _pack_words, _unpack_words

    assert _unpack_words(_pack_words(words)) == words
    assert _unpack_words(words) == words  # legacy list passthrough


@given(
    ndv=st.integers(min_value=0, max_value=100_000),
    k=st.integers(min_value=1, max_value=8),
    fpr=st.floats(min_value=0.001, max_value=0.2),
    cap_log2=st.integers(min_value=9, max_value=16),
)
@settings(max_examples=300, deadline=None)
def test_bloom_bits_for_contract(ndv, k, fpr, cap_log2):
    """Size is a power of two in [256, cap]; None exactly when the cap
    leaves < 2 bits per key; achieved FPR at the chosen size meets the
    target unless the cap clamped it."""
    import math

    from etl_demo_spark.io.manifest import _bloom_bits_for

    cap = 1 << cap_log2
    bits = _bloom_bits_for(ndv, k, fpr, cap)
    n = max(1, ndv)
    if cap < 2 * n:
        assert bits is None
        return
    assert bits is not None and 256 <= bits <= cap
    assert bits & (bits - 1) == 0
    if bits < cap:  # not clamped: the target FPR must be met
        achieved = (1 - math.exp(-k * n / bits)) ** k
        assert achieved <= fpr * 1.01


# ------------------------------------------------- partition transforms


@given(
    lo_h=st.integers(min_value=0, max_value=2000),
    span_h=st.integers(min_value=0, max_value=500),
    kind=st.sampled_from(["hours", "days", "months", "years"]),
)
@settings(max_examples=300, deadline=None)
def test_transform_range_enumeration_is_complete(lo_h, span_h, kind):
    """NO FALSE PRUNING: every period string a timestamp inside [lo, hi]
    maps to must appear in the enumeration — a leaf holding in-range
    rows can never be pruned. (Extra periods only cost IO, never rows.)"""
    from etl_demo_spark.io.manifest import _TIME_PYFMT, _transform_range

    base = datetime.datetime(2023, 11, 20, 7)
    lo = base + datetime.timedelta(hours=lo_h)
    hi = lo + datetime.timedelta(hours=span_h)
    spec = f"{kind}(ts)"
    vals = _transform_range(spec, lo, hi)
    assert vals is not None
    need = set()
    t = lo
    while t <= hi:
        need.add(t.strftime(_TIME_PYFMT[kind]))
        t += datetime.timedelta(hours=1)
    need.add(hi.strftime(_TIME_PYFMT[kind]))
    assert need <= set(vals), sorted(need - set(vals))


@given(
    lo=st.integers(min_value=-10_000, max_value=10_000),
    span=st.integers(min_value=0, max_value=5_000),
    n=st.integers(min_value=1, max_value=100),
)
@settings(max_examples=300, deadline=None)
def test_transform_range_truncate_int_complete(lo, span, n):
    from etl_demo_spark.io.manifest import _transform_range

    hi = lo + span
    vals = _transform_range(f"truncate({n}, v)", lo, hi)
    if vals is None:  # enumeration over cap — allowed (prune skipped)
        assert span // n + 1 > 4096
        return
    need = {str(v - (v % n)) for v in range(lo, hi + 1)}
    assert need <= set(vals)
