"""Property-based dirty-input tests (SURVEY §5.3): the cleaning kernels
must coerce adversarial cells exactly like the reference's pandas code
on the cleaned-input domain (ASCII business data — the domain the
reference operates on; SURVEY §4 documents the out-of-domain deltas
like '1e3'/'inf' which are deliberately out of contract).

Each property generates a batch of cells, runs the kernel once through
Spark, and compares against a direct Python mirror of the reference
algorithm (re/str, the same steps cartera.py:92-98 and 143-149 take).
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from etl_rj_spark.functions import (
    clean_customer_name,
    parse_date,
    parse_int_thousands,
    parse_money,
    parse_plain_money,
)

SETTINGS = dict(max_examples=12, deadline=None)

# printable-ASCII business-text alphabet
_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=30
)


def _spark_map(spark, kernel, cells):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cells)], "i int, c string")
    rows = df.select("i", kernel("c").alias("out")).collect()
    return [r.out for r in sorted(rows, key=lambda r: r.i)]


# --- X3 clean_customer_name ------------------------------------------------

def _py_clean_name(s):
    if s is None:
        return None
    s = str(s).strip().lower()
    s = re.sub(r"[^a-z0-9\s]", "", s)
    s = re.sub(r"\s+", " ", s)
    return s.strip()


@settings(**SETTINGS)
@given(st.lists(_TEXT, min_size=1, max_size=40))
def test_clean_name_matches_reference(spark, cells):
    got = _spark_map(spark, clean_customer_name, cells)
    assert got == [_py_clean_name(c) for c in cells]


# --- X4/N1 money parse -----------------------------------------------------

_MONEY_CELLS = st.one_of(
    # well-formed accounting money, with optional $, commas, parens, spaces
    st.tuples(
        st.integers(0, 10**7), st.integers(0, 99), st.booleans(), st.booleans(), st.booleans()
    ).map(
        lambda t: (
            ("(" if t[2] else "")
            + (" $" if t[3] else "$")
            + (f"{t[0]:,}" if t[4] else str(t[0]))
            + f".{t[1]:02d}"
            + (")" if t[2] else "")
        )
    ),
    # junk
    st.sampled_from(["N/A", "pending", "-", "", "$", "()", "$-"]),
    _TEXT,
)


def _py_parse_money(s):
    # exact reference chain (cartera.py:143-148): ( → -, ) → '',
    # $ → '', , → '', .strip() — whitespace survives INTERIOR, so
    # '( $1.50)' parses to null, not -1.50 (r10 ADVICE fix)
    if s is None:
        return None
    s = (
        str(s)
        .replace("(", "-")
        .replace(")", "")
        .replace("$", "")
        .replace(",", "")
        .strip()
    )
    try:
        v = float(s)
    except ValueError:
        return None
    # contract domain: plain decimal notation only (SURVEY §4 — pandas
    # accepts '1e3'/'inf'/'nan'; the cleaned accounting domain doesn't)
    if not re.fullmatch(r"-?\d+(\.\d+)?|-?\.\d+|-?\d+\.", s):
        return None
    return v


@settings(**SETTINGS)
@given(st.lists(_MONEY_CELLS, min_size=1, max_size=40))
def test_parse_money_matches_reference(spark, cells):
    # restrict to contract domain: drop cells where the python mirror
    # and plain-decimal domain disagree (scientific notation etc.)
    got = _spark_map(spark, parse_money, cells)
    expected = [_py_parse_money(c) for c in cells]
    for c, g, e in zip(cells, got, expected):
        if e is None:
            # Spark may parse a superset (e.g. '1e3'); only assert
            # agreement for in-domain cells, null for definite junk
            if not re.search(r"[0-9]", c):
                assert g is None, (c, g)
        else:
            assert g == pytest.approx(e), (c, g, e)


def _py_parse_plain_money(s):
    # exact reference chain (pending_orders.py:139-140): $ → '',
    # , → '', .strip(), pd.to_numeric coerce — NO parens negation,
    # interior whitespace survives and coerces to null
    if s is None:
        return None
    s = str(s).replace("$", "").replace(",", "").strip()
    try:
        v = float(s)
    except ValueError:
        return None
    if not re.fullmatch(r"-?\d+(\.\d+)?|-?\.\d+|-?\d+\.", s):
        return None
    return v


@settings(**SETTINGS)
@given(st.lists(st.one_of(
    _MONEY_CELLS,
    # interior/edge whitespace forms the ADVICE-r9 fix targets
    st.sampled_from(["1 234.56", " 1234.56 ", "$ 1,500.00", "(1,500.00)", "\t42.00\n"]),
), min_size=1, max_size=40))
def test_parse_plain_money_matches_reference(spark, cells):
    got = _spark_map(spark, parse_plain_money, cells)
    expected = [_py_parse_plain_money(c) for c in cells]
    for c, g, e in zip(cells, got, expected):
        if e is None:
            # strict on the fix targets: interior whitespace and
            # parens must coerce to null (no all-whitespace strip,
            # no accounting negation in the pending kernel)
            if not re.search(r"[0-9]", c) or re.search(r"\d\s+\d|[()]", c):
                assert g is None, (c, g)
        else:
            assert g == pytest.approx(e), (c, g, e)


# --- N4 thousands-int ------------------------------------------------------

@settings(**SETTINGS)
@given(st.lists(st.one_of(
    st.integers(0, 10**8).map(lambda v: f"{v:,}"),
    st.integers(0, 10**8).map(str),
    st.sampled_from(["", "x", "1.5", "12,34a"]),
), min_size=1, max_size=40))
def test_parse_int_thousands_matches_reference(spark, cells):
    # reference semantics (pending_orders.py:142-143): strip commas,
    # pd.to_numeric coerce, astype(int) truncation — '1,234.00' → 1234,
    # '1.5' → 1 (r9 parity fix; the old int-only cast nulled decimals)
    def py(s):
        s2 = str(s).replace(",", "")
        try:
            return int(float(s2))
        except ValueError:
            return None

    got = _spark_map(spark, parse_int_thousands, cells)
    assert got == [py(c) for c in cells]


# --- D1/D2 date parse ------------------------------------------------------

@settings(**SETTINGS)
@given(st.lists(st.one_of(
    st.dates().map(lambda d: d.strftime("%m/%d/%Y")),
    st.sampled_from(["13/01/2020", "00/10/2020", "2020-01-01", "not a date", ""]),
), min_size=1, max_size=40))
def test_parse_date_strict(spark, cells):
    import datetime

    def py(s):
        try:
            return datetime.datetime.strptime(s, "%m/%d/%Y").date()
        except ValueError:
            return None

    got = _spark_map(spark, lambda c: parse_date(c, "MM/dd/yyyy"), cells)
    assert got == [py(c) for c in cells]


def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


_NAME = st.text(alphabet="abcdefg 0123", min_size=1, max_size=12)


@settings(**SETTINGS)
@given(queries=st.lists(_NAME, min_size=1, max_size=6, unique=True),
       dim=st.lists(_NAME, min_size=1, max_size=6, unique=True))
def test_fuzzy_best_match_equals_bruteforce(spark, queries, dim):
    """fuzzy_best_match returns exactly the brute-force argmin
    (levenshtein ≤ 2, ties to the smaller dim id) over cleaned names."""
    from etl_rj_spark.operators.fuzzy import fuzzy_best_match

    clean = lambda s: re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", "", s.lower().strip())).strip()  # noqa: E731
    qdf = spark.createDataFrame(list(enumerate(queries)), "qid int, qn string")
    ddf = spark.createDataFrame(list(enumerate(dim)), "did int, dn string")
    got = {
        r.qid: (r.matched_did, r.dist)
        for r in fuzzy_best_match(qdf, ddf, "qid", "qn", "did", "dn").collect()
    }
    expected = {}
    for qi, q in enumerate(queries):
        cands = sorted(
            (
                (_py_levenshtein(clean(q), clean(d)), di)
                for di, d in enumerate(dim)
                if _py_levenshtein(clean(q), clean(d)) <= 2
            )
        )
        if cands:
            expected[qi] = (cands[0][1], cands[0][0])
    assert got == expected


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-100, 100)),
            st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                           min_value=-1e6, max_value=1e6)),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_quarantine_split_partitions_exactly(spark, rows):
    """quarantine_split is an exact partition of the input: every row
    lands on exactly one side, quarantine reasons equal the per-row
    failing rules in rule order, and nulls count as failures."""
    from etl_rj_spark.operators.validate import quarantine_split

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], "i int, a int, b double"
    )
    rules = {
        "a_nonneg": F.col("a") >= 0,
        "b_small": F.col("b") < 100.0,
    }
    valid, quar = quarantine_split(df, rules)
    got_valid = {r.i for r in valid.collect()}
    got_quar = {r.i: list(r.reasons) for r in quar.collect()}

    def expect(a, b):
        out = []
        if not (a is not None and a >= 0):
            out.append("a_nonneg")
        if not (b is not None and b < 100.0):
            out.append("b_small")
        return out

    for i, (a, b) in enumerate(rows):
        want = expect(a, b)
        if want:
            assert got_quar[i] == want, (i, a, b)
            assert i not in got_valid
        else:
            assert i in got_valid
            assert i not in got_quar


@given(
    texts=st.lists(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=12),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_exact_dedup_mapping_invariants(spark, texts):
    """The window-min canonical mapping: every id maps to the MINIMUM
    id of its normalized-text group, canonicals map to themselves, and
    group membership matches a direct Python computation."""
    from etl_rj_spark.operators.text_dedup import exact_dedup_mapping
    from etl_rj_spark.operators.text_analysis import normalized_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {r.doc_id: r.canonical_id for r in exact_dedup_mapping(df, "doc_id", "text").collect()}

    # python mirror of normalized_text: trim+lower+collapse whitespace
    def norm(s):
        return re.sub(r"\s+", " ", s.strip().lower())

    groups = {}
    for i, t in enumerate(texts):
        groups.setdefault(norm(t), []).append(i)
    want = {i: min(g) for g in groups.values() for i in g}
    assert got == want
    assert all(got[c] == c for c in set(got.values()))  # canonicals are fixed points


@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),        # user
            st.integers(min_value=0, max_value=10_000),   # seconds offset
            st.integers(min_value=0, max_value=100_000),  # cents
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_time_weighted_mean_bounds_and_python_mirror(spark, obs):
    """TWAP invariants: the result per key lies within [min, max] of
    the cents that carry positive duration, and equals a direct Python
    computation of sum(cents·dur) // sum(dur) over the (ts, event_id)
    order."""
    from etl_rj_spark.operators.windows import time_weighted_mean

    rows = [
        (u, float(sec), c, i) for i, (u, sec, c) in enumerate(obs)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, sec double, cents long, event_id long"
    ).withColumn("ts", F.timestamp_seconds("sec"))
    got = {
        r.user_id: (r.n_intervals, r.total_dur_us, r.twap_cents)
        for r in time_weighted_mean(
            df, "user_id", "ts", F.col("cents"), "event_id"
        ).collect()
    }

    per_user = {}
    for u, sec, c, i in rows:
        per_user.setdefault(u, []).append((sec, i, c))
    want = {}
    for u, seq in per_user.items():
        seq.sort()
        pairs = [
            (seq[k][2], int((seq[k + 1][0] - seq[k][0]) * 1_000_000))
            for k in range(len(seq) - 1)
        ]
        total = sum(d for _, d in pairs)
        if total > 0:
            want[u] = (
                len(pairs), total, sum(c * d for c, d in pairs) // total
            )
    assert got == want
    for u, (_, _, twap) in got.items():
        carrying = [c for c, d in [
            (seq_c, int((per_user[u][k + 1][0] - per_user[u][k][0]) * 1e6))
            for k, (_, _, seq_c) in enumerate(sorted(per_user[u])[:-1])
        ] if d > 0]
        if carrying:
            assert min(carrying) <= twap <= max(carrying)


@given(
    ops=st.lists(  # batches of (key, value, insert?) ops
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c"]),
                st.integers(min_value=0, max_value=1000),
                st.booleans(),
            ),
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=8, deadline=None)
def test_ivm_agg_random_fold_sequences_match_net_aggregate(spark, tmp_path_factory, ops):
    """Z-set IVM property: for ANY sequence of weighted delta batches
    (retractions included, even retracting rows never inserted — the
    algebra is closed under negative weights), the served aggregate
    equals the one-shot groupBy over the concatenated weighted rows,
    with zero-net-weight keys absent."""
    from etl_rj_spark.streaming.ivm import fold_agg_delta, serve_agg_view

    root = str(tmp_path_factory.mktemp("ivm_prop"))
    net_w, net_s = {}, {}
    fold_id = 0
    for batch in ops:
        rows = [(k, 1 if ins else -1, v) for k, v, ins in batch]
        for k, w, v in rows:
            net_w[k] = net_w.get(k, 0) + w
            net_s[k] = net_s.get(k, 0) + w * v
        if rows:
            df = spark.createDataFrame(rows, "k string, w int, v long")
        else:
            df = spark.createDataFrame([], "k string, w int, v long")
        fold_agg_delta(df, fold_id, root, ["k"], "w", "v")
        fold_id += 1
    want = {
        (k, net_w[k], net_s[k]) for k in net_w if net_w[k] != 0
    }
    schema = "k string, __w long, __s decimal(38,0)"
    got = {
        (r.k, r.n, r.total)
        for r in serve_agg_view(spark, root, ["k"], schema).collect()
    }
    assert got == want


@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.sampled_from("xyz")),
        min_size=2,
        max_size=60,
    )
)
@settings(max_examples=10, deadline=None)
def test_chi_square_matches_float_reference(spark, pairs):
    """r9 property: the exact-integer chi-square (observed-cell terms
    PLUS the empty-cell expected mass) tracks the float textbook
    statistic within per-term ppm truncation error — one truncating
    div per observed cell plus one for the aggregate missing-cell
    term, so |chi2_ppm − float·10⁶| ≤ (#observed cells + 1)."""
    from etl_rj_spark.operators.stats import chi_square_independence

    df = spark.createDataFrame(pairs, "p string, q string")
    r = chi_square_independence(df, "p", "q").collect()[0]

    n = len(pairs)
    from collections import Counter
    cells = Counter(pairs)
    rows = Counter(p for p, _ in pairs)
    cols = Counter(q for _, q in pairs)
    want = sum(
        (o - rows[a] * cols[b] / n) ** 2 / (rows[a] * cols[b] / n)
        for (a, b), o in cells.items()
    ) + sum(
        rows[a] * cols[b] / n
        for a in rows for b in cols if (a, b) not in cells
    )
    ka, kb = len(rows), len(cols)
    assert r.n == n and r.dof == (ka - 1) * (kb - 1)
    assert abs(r.chi2_ppm - want * 1e6) <= len(cells) + 1 + 1e-6 * want


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=20), st.booleans()),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=10, deadline=None)
def test_kaplan_meier_tracks_float_product(spark, subjects):
    """r9 property: the integer-ppm KM recurrence tracks the float
    product estimator stepwise — each step truncates at most 1 ppm
    and later factors only shrink earlier error, so after k steps
    |s_ppm − 10⁶·Π| ≤ k. Also re-exercises the int-cast duration
    contract with bigint input."""
    from etl_rj_spark.operators.stats import kaplan_meier

    df = spark.createDataFrame(
        [(t, 1 if ev else 0) for t, ev in subjects], "t bigint, ev int"
    )
    got = {
        r.t: (r.n_at_risk, r.d_events, r.survival_ppm)
        for r in kaplan_meier(df, "t", "ev").collect()
    }

    from collections import Counter
    d = Counter(t for t, ev in subjects if ev)
    c = Counter(t for t, ev in subjects if not ev)
    ts = sorted(set(d) | set(c))
    at_risk = len(subjects)
    prod = 1.0
    for i, t in enumerate(ts):
        prod *= (at_risk - d[t]) / at_risk
        n, dd, s = got[t]
        assert (n, dd) == (at_risk, d[t])
        assert abs(s - 1e6 * prod) <= i + 1
        at_risk -= d[t] + c[t]
