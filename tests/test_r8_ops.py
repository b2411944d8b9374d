"""Unit tests for the round-8 operator batch: distributed top-k
ranking, two-phase global rank/cumsum, and their equivalence with the
single-window forms they replace."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _rows(n, seed=7):
    # deterministic pseudo-random values with ties
    return [(i, (i * 2654435761 + seed) % 97) for i in range(n)]


def test_ranked_topk_matches_window_rank(spark):
    from etl_rj_spark.operators.windows import ranked_topk

    df = spark.createDataFrame(_rows(500), "id long, score long").repartition(8)
    got = {
        (r.id, r.score, r.rank)
        for r in ranked_topk(df, [(F.col("score"), False), ("id", True)], 10).collect()
    }
    w = Window.orderBy(F.desc("score"), "id")
    want = {
        (r.id, r.score, r.rank)
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .collect()
    }
    assert got == want


def test_ranked_topk_k_exceeds_rows_and_empty(spark):
    from etl_rj_spark.operators.windows import ranked_topk

    df = spark.createDataFrame([(1, 5), (2, 9)], "id long, score long")
    out = ranked_topk(df, [(F.col("score"), False), ("id", True)], 10).collect()
    assert [(r.id, r.rank) for r in out] == [(2, 1), (1, 2)]
    empty = df.filter(F.col("score") > 100)
    assert ranked_topk(empty, [(F.col("score"), False), ("id", True)], 5).count() == 0


def test_global_rank_cumsum_matches_single_window(spark):
    from etl_rj_spark.operators.windows import global_rank_cumsum

    df = spark.createDataFrame(_rows(400, seed=13), "id long, v long").repartition(8)
    got = {
        (r.id, int(r.rnk), int(r.cum))
        for r in global_rank_cumsum(df, "v", ["id"], num_partitions=7).collect()
    }
    w = Window.orderBy(F.desc("v"), F.col("id").asc())
    want = {
        (r.id, r.rnk, int(r.cum))
        for r in df.select(
            "id",
            F.row_number().over(w).alias("rnk"),
            F.sum(F.col("v").cast("decimal(38,0)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum"),
        ).collect()
    }
    assert got == want


def test_global_rank_cumsum_single_row_and_ties(spark):
    from etl_rj_spark.operators.windows import global_rank_cumsum

    one = spark.createDataFrame([(42, 10)], "id long, v long")
    r = global_rank_cumsum(one, "v", ["id"]).collect()[0]
    assert (int(r.rnk), int(r.cum)) == (1, 10)
    # all-equal values: rank decided purely by the tiebreak column
    ties = spark.createDataFrame([(i, 5) for i in range(20)], "id long, v long")
    out = sorted(
        (int(r.rnk), r.id) for r in global_rank_cumsum(ties, "v", ["id"], num_partitions=4).collect()
    )
    assert out == [(i + 1, i) for i in range(20)]


def test_poisson_xxhash_fast_path_distribution_sane(spark):
    from etl_rj_spark.operators.stats import poisson_bootstrap_means

    df = spark.createDataFrame([(i, 100) for i in range(2000)], "id long, v long")
    rows = poisson_bootstrap_means(df, "id", "v", replicates=4, hash="xxhash64").collect()
    assert len(rows) == 4
    for r in rows:
        # Poisson(1) draws from the 52-bit xxhash64 path: n_eff ≈ n,
        # constant values → replicate mean is exactly the constant
        assert 1700 <= r.n_eff <= 2300
        assert r.mean_value == 100


def test_poisson_unknown_hash_rejected(spark):
    import pytest

    from etl_rj_spark.operators.stats import poisson_weight_expr

    with pytest.raises(ValueError):
        poisson_weight_expr("id", "replicate", hash="sha1")


def test_skyline_ties_and_duplicates(spark):
    from etl_rj_spark.operators.stats import skyline_max2

    df = spark.createDataFrame(
        [
            (1, 10, 5), (2, 10, 5),   # duplicate skyline points: both kept
            (3, 10, 4),               # dominated by 1/2 (same x, smaller y)
            (4, 12, 5),               # dominates 1/2? same y, larger x -> yes
            (5, 8, 9),                # skyline (higher y)
            (6, 12, 3),               # dominated by 4
        ],
        "id long, x long, y long",
    )
    kept = {r.id for r in skyline_max2(df, "x", "y").collect()}
    # (12,5) dominates (10,5) via strict x; (8,9) survives on y
    assert kept == {4, 5}


def test_skyline_single_row_and_monotone(spark):
    from etl_rj_spark.operators.stats import skyline_max2

    one = spark.createDataFrame([(1, 3, 3)], "id long, x long, y long")
    assert [r.id for r in skyline_max2(one, "x", "y").collect()] == [1]
    # strictly anti-monotone staircase: everything is skyline
    stair = spark.createDataFrame(
        [(i, i, 10 - i) for i in range(5)], "id long, x long, y long"
    )
    assert skyline_max2(stair, "x", "y").count() == 5


def test_transition_counts_first_event_excluded(spark):
    from etl_rj_spark.operators.windows import transition_counts

    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (2, 1, "a")],
        "u long, t long, s string",
    )
    rows = {(r.prev_state, r.state): (r.n, r.p_ppm)
            for r in transition_counts(df, "u", "t", "s").collect()}
    # user 2's lone event contributes no transition
    assert rows == {("a", "b"): (1, 1000000), ("b", "b"): (1, 1000000)}


def test_group_entropy_degenerate_single_category(spark):
    from etl_rj_spark.operators.stats import group_entropy_ppm

    df = spark.createDataFrame(
        [(1, "x")] * 4 + [(2, "x"), (2, "y")], "g long, c string"
    )
    rows = {r.g: (r.n_events, r.n_cats, r.entropy_ppm)
            for r in group_entropy_ppm(df, "g", "c").collect()}
    assert rows[1] == (4, 1, 0)          # one category -> zero entropy
    assert rows[2] == (2, 2, 1000000)    # 50/50 -> exactly 1 bit


def test_dyadic_ewma_gap_and_edge(spark):
    import datetime

    from etl_rj_spark.operators.stats import dyadic_ewma

    d = datetime.date
    df = spark.createDataFrame(
        [(d(2024, 1, 1), 100), (d(2024, 1, 2), 200), (d(2024, 1, 12), 300)],
        "d date, x long",
    )
    rows = {r.d: r.ewma for r in dyadic_ewma(df, "d", "x", taps=10).collect()}
    assert rows[d(2024, 1, 1)] == 100  # first day: itself
    # day 2: (200*512 + 100*256) div (512+256) = 168 (exact floor)
    assert rows[d(2024, 1, 2)] == (200 * 512 + 100 * 256) // (512 + 256)
    # day 12: day 2 is 10 days back (outside taps), day 1 is 11 back
    assert rows[d(2024, 1, 12)] == 300


def test_chi_square_perfect_independence_is_zero(spark):
    from etl_rj_spark.operators.stats import chi_square_independence

    # perfectly independent 2x2: every cell o*N == r*c
    rows = (
        [("a", "x")] * 4 + [("a", "y")] * 4 + [("b", "x")] * 4 + [("b", "y")] * 4
    )
    df = spark.createDataFrame(rows, "p string, q string")
    r = chi_square_independence(df, "p", "q").collect()[0]
    assert (r.n, r.dof, r.chi2_ppm) == (16, 1, 0)


def test_chi_square_empty_cell_carries_expected_mass(spark):
    """ADVICE r8: a category combination ABSENT from the data still
    contributes (o−e)²/e = e; without it the statistic understates
    exactly the dependence signal the screen exists to catch."""
    from etl_rj_spark.operators.stats import chi_square_independence

    # 2x2 with cell (b, y) empty: N=8, r_a=r_b=4, c_x=6, c_y=2
    # chi2 = 1/3 + 1 + 1/3 + 1 = 8/3; per-cell ppm truncation:
    # 333333 + 1000000 + 333333 (observed) + 1000000 (empty) = 2666666
    rows = [("a", "x")] * 2 + [("a", "y")] * 2 + [("b", "x")] * 4
    df = spark.createDataFrame(rows, "p string, q string")
    r = chi_square_independence(df, "p", "q").collect()[0]
    assert (r.n, r.dof, r.chi2_ppm) == (8, 1, 2666666)


def test_benford_reports_missing_digits(spark, tmp_path):
    """r9 fix (same empty-cell class as chi-square): a first digit
    that never occurs must still report (n_d 0, dev −expected) — the
    inner join silently dropped exactly the anomaly rows."""
    from etl_rj_spark.analytics import REGISTRY

    df = spark.createDataFrame(
        [(i, 100.00 + i) for i in range(20)],
        "o_orderkey long, o_totalprice double",
    )
    df.write.parquet(str(tmp_path / "orders.parquet"))
    out = {
        r.digit: (r.n_d, r.dev_ppm)
        for r in REGISTRY["benford_first_digit_audit"]
        .build(spark, str(tmp_path)).collect()
    }
    assert len(out) == 9
    assert out[1][0] == 20            # every total starts with 1
    for d in range(2, 10):
        assert out[d][0] == 0 and out[d][1] < 0


def test_ols2_collinear_features_yield_null(spark):
    """ADVICE r8: det == 0 (collinear/constant features) must produce
    NULL betas on every engine, never a divide-by-zero."""
    from etl_rj_spark.operators.stats import ols2_normal_equations

    df = spark.createDataFrame(
        [(i, i * 2, i * 3) for i in range(1, 6)], "y long, x1 long, x2 long"
    )
    r = ols2_normal_equations(
        df, F.col("y"), F.col("x1"), F.col("x2")
    ).collect()[0]
    assert r.n == 5
    assert r.beta0_ppm is None and r.beta1_ppm is None and r.beta2_ppm is None


def test_kaplan_meier_bigint_and_date_diff_durations(spark):
    """ADVICE r8: a bigint-typed duration must not break the fold's
    declared struct<t:int,...> accumulator element type — the operator
    casts to int itself (documented contract: durations fit ±2³¹)."""
    from etl_rj_spark.operators.stats import kaplan_meier

    df = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (4, 0), (5, 0)], "t bigint, ev int"
    )
    rows = {r.t: r.survival_ppm for r in kaplan_meier(df, "t", "ev").collect()}
    assert rows == {1: 800000, 2: 800000, 3: 533333, 4: 533333, 5: 533333}


def test_chi_square_null_categories_are_complete_case(spark):
    """r9 review fix: NULL keys never match the marginal equi-joins,
    so keeping them in N while losing their cells injected phantom
    empty-cell mass — rows with a NULL in either column must drop
    from ALL counts (complete-case), making the NULL-bearing input
    equal the NULL-free one."""
    from etl_rj_spark.operators.stats import chi_square_independence

    clean = [("a", "x")] * 2 + [("a", "y")] * 2 + [("b", "x")] * 4
    noisy = clean + [(None, "x")] * 5 + [("a", None)] * 3 + [(None, None)]
    r_clean = chi_square_independence(
        spark.createDataFrame(clean, "p string, q string"), "p", "q"
    ).collect()[0]
    r_noisy = chi_square_independence(
        spark.createDataFrame(noisy, "p string, q string"), "p", "q"
    ).collect()[0]
    assert tuple(r_clean) == tuple(r_noisy)
    assert (r_clean.n, r_clean.dof, r_clean.chi2_ppm) == (8, 1, 2666666)


def test_benford_empty_input_keeps_nine_null_rows(spark, tmp_path):
    """r9 review fix: with the LEFT join the 9 expected rows exist
    even for an empty input, so the total must not divide — NULL ppm
    columns, never an ANSI divide-by-zero."""
    from etl_rj_spark.analytics import REGISTRY

    spark.createDataFrame(
        [], "o_orderkey long, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    rows = REGISTRY["benford_first_digit_audit"].build(
        spark, str(tmp_path)
    ).collect()
    assert len(rows) == 9
    for r in rows:
        assert r.n_d == 0 and r.observed_ppm is None and r.dev_ppm is None


def test_exact_auc_single_class_is_null(spark):
    """r9 guard family: a single-class input (no positives or no
    negatives) has no defined AUC — NULL, never an ANSI
    divide-by-zero."""
    from etl_rj_spark.operators.stats import exact_auc

    allpos = spark.createDataFrame([(i, 1) for i in range(5)], "s long, y int")
    r = exact_auc(allpos, "s", "y").collect()[0]
    assert r.auc_ppm is None and (r.n_pos, r.n_neg) == (5, 0)
    allneg = spark.createDataFrame([(i, 0) for i in range(5)], "s long, y int")
    r = exact_auc(allneg, "s", "y").collect()[0]
    assert r.auc_ppm is None and (r.n_pos, r.n_neg) == (0, 5)


def test_gini_all_zero_values_is_null(spark):
    """r9 guard family: an all-zero value column has no defined
    concentration — NULL gini, never an ANSI divide-by-zero."""
    from etl_rj_spark.operators.stats import gini_concentration

    df = spark.createDataFrame([(i, 0) for i in range(7)], "k long, v long")
    r = gini_concentration(df, "v", ["k"]).collect()[0]
    assert r.gini_ppm is None and (r.n, r.total) == (7, 0)


def test_stratified_split_exact_sizes_and_determinism(spark):
    from etl_rj_spark.operators.curation import stratified_split_exact

    df = spark.createDataFrame(
        [(i, "s" + str(i % 3)) for i in range(97)], "id long, stratum string"
    )
    out = stratified_split_exact(
        df, "stratum", "id", [("train", 8), ("val", 1), ("test", 1)]
    )
    sizes = {
        (r.stratum, r.split): r.n
        for r in out.groupBy("stratum", "split").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    # exact Hamilton apportionment: s0 has 33 rows -> 27/3/3 (train's
    # remainder 4 wins the one leftover slot); s1/s2 have 32 -> 26/3/3
    assert sizes == {
        ("s0", "train"): 27, ("s0", "val"): 3, ("s0", "test"): 3,
        ("s1", "train"): 26, ("s1", "val"): 3, ("s1", "test"): 3,
        ("s2", "train"): 26, ("s2", "val"): 3, ("s2", "test"): 3,
    }
    # deterministic: same assignment on re-run
    a = {(r.id): r.split for r in out.collect()}
    b = {(r.id): r.split for r in stratified_split_exact(
        df, "stratum", "id", [("train", 8), ("val", 1), ("test", 1)]
    ).collect()}
    assert a == b


# --- property tests: allocation/split invariants ---------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(1, 10_000)),
        min_size=1, max_size=20,
    ),
    st.integers(0, 10_000_000),
)
def test_prorate_property_sums_exactly(spark, lines, total):
    """For ANY weights and total: integer allocations, per-group sum
    EXACTLY the total, each alloc within 1 of the real-valued share."""
    from etl_rj_spark.operators.aggregates import prorate_largest_remainder

    rows = [(g, i, w, total) for i, (g, w) in enumerate(lines)]
    df = spark.createDataFrame(rows, "g long, ln long, w long, total long")
    out = prorate_largest_remainder(df, ["g"], "w", "total", ["ln"]).collect()
    by_g = {}
    wsum = {}
    for g, _, w, _ in rows:
        wsum[g] = wsum.get(g, 0) + w
    for r in out:
        by_g.setdefault(r.g, 0)
        by_g[r.g] += r.alloc
        exact = total * r.w / wsum[r.g]
        assert exact - 1 < r.alloc < exact + 1
    for g, s in by_g.items():
        assert s == total


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(1, 500), min_size=2, max_size=6))
def test_stratified_split_property_exact_and_partition(spark, sizes):
    """Splits partition each stratum exactly (no row lost/duplicated)
    and part sizes differ from the ideal share by < 1."""
    from etl_rj_spark.operators.curation import stratified_split_exact

    rows = []
    rid = 0
    for s, n in enumerate(sizes):
        for _ in range(n):
            rows.append((rid, f"s{s}"))
            rid += 1
    df = spark.createDataFrame(rows, "id long, stratum string")
    out = stratified_split_exact(
        df, "stratum", "id", [("train", 7), ("val", 2), ("test", 1)]
    ).collect()
    assert len(out) == len(rows)
    assert len({r.id for r in out}) == len(rows)
    sz = {}
    for r in out:
        sz[(r.stratum, r.split)] = sz.get((r.stratum, r.split), 0) + 1
    for s, n in enumerate(sizes):
        for part, w in [("train", 7), ("val", 2), ("test", 1)]:
            got = sz.get((f"s{s}", part), 0)
            ideal = n * w / 10
            assert ideal - 1 < got < ideal + 1, (s, n, part, got)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=40))
def test_gini_property_bounds_and_invariance(spark, vals):
    """0 ≤ G < 1; equal values → 0; G is scale-free in the values."""
    from etl_rj_spark.operators.stats import gini_concentration

    if sum(vals) == 0:
        vals = [v + 1 for v in vals]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    g = gini_concentration(df, "v", ["id"]).collect()[0]
    assert 0 <= g.gini_ppm < 1_000_000
    assert g.n == len(vals) and g.total == sum(vals)
    g2 = gini_concentration(
        df.select("id", (F.col("v") * 3).alias("v")), "v", ["id"]
    ).collect()[0]
    # scaling all values by 3 changes G only via integer-div rounding
    assert abs(g2.gini_ppm - g.gini_ppm) <= 1


def test_triangle_stats_known_graphs(spark):
    from etl_rj_spark.operators.components import triangle_stats

    # K4: 4 nodes, 6 edges, 12 wedges, 4 triangles, cc = 1
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b], "a long, b long"
    )
    r = triangle_stats(k4).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 6, 12, 4)
    assert r.global_cc_ppm == 1_000_000
    # path graph: wedges but zero triangles
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "a long, b long")
    r = triangle_stats(path).collect()[0]
    assert (r.n_triangles, r.global_cc_ppm) == (0, 0)
    # duplicate edges / reversed orientation / self-loops are cleaned
    messy = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 0), (2, 2)], "a long, b long"
    )
    r = triangle_stats(messy).collect()[0]
    assert (r.n_edges, r.n_triangles) == (3, 1)


def test_interval_overlap_join_edges(spark):
    import datetime

    from etl_rj_spark.operators.asof import interval_overlap_join

    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(0), t(10)), (2, t(30), t(40))], "lid long, ls timestamp, le timestamp"
    )
    right = spark.createDataFrame(
        [(10, t(10), t(12)),   # touches interval 1 at the closed end
         (11, t(41), t(50)),   # overlaps nothing
         (12, t(5), t(35))],   # spans both
        "rid long, rs timestamp, re timestamp",
    )
    got = {
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_seconds=60
        ).collect()
    }
    assert got == {(1, 10), (1, 12), (2, 12)}
    # tiny buckets (heavy fan-out) give identical pairs
    got_fine = {
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_seconds=7
        ).collect()
    }
    assert got_fine == got


def test_stratified_split_null_stratum_kept(spark):
    from etl_rj_spark.operators.curation import stratified_split_exact

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, None)], "id long, stratum string"
    )
    out = stratified_split_exact(
        df, "stratum", "id", [("train", 1), ("test", 1)]
    ).collect()
    # NULL stratum is a legitimate stratum: nothing dropped, 1/1 split
    assert len(out) == 4
    null_rows = [r for r in out if r.stratum is None]
    assert sorted(r.split for r in null_rows) == ["test", "train"]


def test_kaplan_meier_textbook_example(spark):
    from etl_rj_spark.operators.stats import kaplan_meier

    # classic: events at t=1 (1 of 5), t=3 (1 of 3); censored at 2, 4, 5
    df = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (4, 0), (5, 0)], "t int, ev int"
    )
    rows = {r.t: (r.n_at_risk, r.d_events, r.n_censored, r.survival_ppm)
            for r in kaplan_meier(df, "t", "ev").collect()}
    # s(1) = 1e6*4//5 = 800000; s(3) = 800000*2//3 = 533333
    assert rows[1] == (5, 1, 0, 800000)
    assert rows[2] == (4, 0, 1, 800000)   # censoring leaves s unchanged
    assert rows[3] == (3, 1, 0, 533333)
    assert rows[4] == (2, 0, 1, 533333)
    assert rows[5] == (1, 0, 1, 533333)


def test_kaplan_meier_all_events_and_all_censored(spark):
    from etl_rj_spark.operators.stats import kaplan_meier

    allev = spark.createDataFrame([(1, 1), (1, 1)], "t int, ev int")
    r = kaplan_meier(allev, "t", "ev").collect()[0]
    assert (r.t, r.n_at_risk, r.d_events, r.survival_ppm) == (1, 2, 2, 0)
    nocens = spark.createDataFrame([(2, 0), (7, 0)], "t int, ev int")
    rows = {r.t: r.survival_ppm for r in kaplan_meier(nocens, "t", "ev").collect()}
    assert rows == {2: 1000000, 7: 1000000}


def test_correlation_matrix_known_values(spark):
    from etl_rj_spark.operators.stats import correlation_matrix

    # y = 2x (r=1), z anti-correlated with x (r=-1), w constant (NULL)
    df = spark.createDataFrame(
        [(1, 2, 9, 5), (2, 4, 8, 5), (3, 6, 7, 5), (4, 8, 6, 5)],
        "x long, y long, z long, w long",
    )
    rows = {(r.m1, r.m2): r.r_9dp for r in
            correlation_matrix(df, ["x", "y", "z", "w"]).collect()}
    assert rows[("x", "y")] == 1.0
    assert rows[("x", "z")] == -1.0
    assert rows[("y", "z")] == -1.0
    assert rows[("x", "w")] is None and rows[("z", "w")] is None
    # complete-case: a NULL in any measure drops the row everywhere
    df2 = df.union(spark.createDataFrame([(5, None, 5, 5)], df.schema))
    rows2 = {(r.m1, r.m2): (r.n, r.r_9dp) for r in
             correlation_matrix(df2, ["x", "y", "z", "w"]).collect()}
    assert rows2[("x", "z")] == (4, -1.0)


def test_cohens_kappa_known_values(spark):
    from etl_rj_spark.operators.stats import cohens_kappa

    # perfect agreement -> 1e6
    perf = spark.createDataFrame([("a", "a"), ("b", "b")], "l string, p string")
    assert cohens_kappa(perf, "l", "p").collect()[0].kappa_ppm == 1_000_000
    # worse than chance -> negative (2x2 fully crossed disagreement)
    anti = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "b"), ("b", "a")], "l string, p string"
    )
    assert cohens_kappa(anti, "l", "p").collect()[0].kappa_ppm == -1_000_000
    # pe = 1 degenerate (both raters constant): NULL
    const = spark.createDataFrame([("a", "a"), ("a", "a")], "l string, p string")
    assert cohens_kappa(const, "l", "p").collect()[0].kappa_ppm is None
    # textbook asymmetric: n=100, agree=70, S=(50*60+50*40)=5000
    # kappa = (7000-5000)/(10000-5000) = 0.4
    rows = (
        [("y", "y")] * 40 + [("y", "n")] * 10
        + [("n", "y")] * 20 + [("n", "n")] * 30
    )
    df = spark.createDataFrame(rows, "l string, p string")
    assert cohens_kappa(df, "l", "p").collect()[0].kappa_ppm == 400_000


def test_js_divergence_identical_and_disjoint(spark):
    from etl_rj_spark.operators.text_analysis import js_divergence

    a = spark.createDataFrame([("x", 10), ("y", 30)], "term string, n long")
    same = js_divergence(a, a).collect()[0]
    assert same.js_ppm == 0                      # identical -> 0 bits
    b = spark.createDataFrame([("p", 5), ("q", 5)], "term string, n long")
    disjoint = js_divergence(a, b).collect()[0]
    assert disjoint.js_ppm == 1_000_000          # disjoint -> exactly 1 bit
    assert (disjoint.n_terms, disjoint.n_left, disjoint.n_right) == (4, 40, 10)
    # symmetry
    assert js_divergence(b, a).collect()[0].js_ppm == disjoint.js_ppm


def test_holt_linear_smooth_recurrence(spark):
    import datetime

    from etl_rj_spark.operators.stats import holt_linear_smooth

    d = datetime.date
    df = spark.createDataFrame(
        [(d(2024, 1, 1), 100), (d(2024, 1, 2), 120), (d(2024, 1, 3), 80)],
        "d date, x long",
    )
    rows = {r.d: (r.level, r.trend, r.forecast_next)
            for r in holt_linear_smooth(df, "d", "x").collect()}
    # t1: l=100, b=0
    assert rows[d(2024, 1, 1)] == (100, 0, 100)
    # t2: l=(120+100+0)>>1=110, b=(0+110-100)>>1=5
    assert rows[d(2024, 1, 2)] == (110, 5, 115)
    # t3: l=(80+110+5)>>1=97, b=(5+97-110)>>1=floor(-8/2)=-4
    assert rows[d(2024, 1, 3)] == (97, -4, 93)


def test_growth_accounting_classification(spark):
    import datetime

    from etl_rj_spark.analytics import REGISTRY

    # hand-built weekly presence: user 1 active wk0, wk1 (retained),
    # user 2 active wk0, wk2 (resurrected), user 3 only wk2 (new)
    d = datetime.datetime
    rows = [
        (1, d(2024, 1, 1, 10)), (1, d(2024, 1, 8, 10)),
        (2, d(2024, 1, 2, 10)), (2, d(2024, 1, 15, 10)),
        (3, d(2024, 1, 16, 10)),
    ]
    df = spark.createDataFrame(
        [(u, t, i, "view", 1.0, "{}") for i, (u, t) in enumerate(rows)],
        "user_id long, ts timestamp, event_id long, event_type string, value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(f"{tmp}/events.parquet")
        out = {
            str(r.week): (r.n_new, r.n_retained, r.n_resurrected)
            for r in REGISTRY["growth_accounting_weekly"].build(spark, tmp).collect()
        }
    assert out["2024-01-01"] == (2, 0, 0)       # users 1, 2 are new
    assert out["2024-01-08"] == (0, 1, 0)       # user 1 retained
    assert out["2024-01-15"] == (1, 0, 1)       # user 3 new, user 2 resurrected


def test_gains_table_monotone_capture(spark, sf_dir):
    from etl_rj_spark.analytics import REGISTRY

    rows = sorted(
        REGISTRY["gains_table_activity_purchase"].build(spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    # cumulative capture is nondecreasing and ends at ~100%
    caps = [r.capture_ppm for r in rows]
    assert all(a <= b for a, b in zip(caps, caps[1:]))
    assert caps[-1] >= 999_000
    # deciles partition all users
    assert sum(r.n_users for r in rows) == sum(r.n_users for r in rows)


def test_abc_classes_cover_all_parts(spark, sf_dir):
    from etl_rj_spark.analytics import REGISTRY

    rows = {r.abc: r for r in
            REGISTRY["abc_classification_parts"].build(spark, sf_dir).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    # A's classes hold the 80% / next-15% / tail revenue bands (on
    # near-uniform synthetic data A also holds most PARTS — the
    # classifier reports the data, it doesn't assume a Pareto shape)
    total = sum(r.total_cents for r in rows.values())
    assert rows["A"].total_cents >= int(total * 0.75)
    # classes PARTITION the part population
    from pyspark.sql import functions as F2

    from etl_rj_spark.sources.parquet import read_parquet_table

    n_parts = (
        read_parquet_table(spark, f"{sf_dir}/lineitem.parquet")
        .select(F2.count_distinct("l_partkey"))
        .collect()[0][0]
    )
    assert sum(r.n_parts for r in rows.values()) == n_parts


def test_stickiness_bounds(spark, sf_dir):
    from etl_rj_spark.analytics import REGISTRY

    for r in REGISTRY["stickiness_daily"].build(spark, sf_dir).collect():
        # DAU ⊆ trailing-7-day actives: ratio in (0, 1]
        assert 0 < r.stickiness_ppm <= 1_000_000
        assert r.dau <= r.wau


def test_benford_deviations_sum_near_zero(spark, sf_dir):
    from etl_rj_spark.analytics import REGISTRY

    rows = REGISTRY["benford_first_digit_audit"].build(spark, sf_dir).collect()
    # observed ppm sums to ~1e6, expected table to 999,... — so the
    # signed deviations nearly cancel regardless of the data's fit
    assert abs(sum(r.dev_ppm for r in rows)) < 20
    assert {r.digit for r in rows} <= set(range(1, 10))


# ---------------------------------------------------------------------------
# Late round-8 closers: TWAP, expectation suite, l-diversity shape
# ---------------------------------------------------------------------------

def test_time_weighted_mean_exact_small(spark):
    from etl_rj_spark.operators.windows import time_weighted_mean

    # user 1: value 100 cents for 10 s, then 300 cents for 30 s
    #   → twap = (100·10e6 + 300·30e6) // 40e6 = 250
    # user 2: single event → excluded (no duration)
    # user 3: two events at the SAME ts → total duration 0 → excluded
    rows = [
        (1, "2024-01-01 00:00:00", 1.0, 10),
        (1, "2024-01-01 00:00:10", 3.0, 11),
        (1, "2024-01-01 00:00:40", 9.9, 12),  # last: no successor
        (2, "2024-01-01 00:00:00", 5.0, 20),
        (3, "2024-01-01 00:00:00", 1.0, 30),
        (3, "2024-01-01 00:00:00", 2.0, 31),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp")).repartition(4)
    out = {
        r.user_id: (r.n_intervals, r.total_dur_us, r.twap_cents)
        for r in time_weighted_mean(
            df, "user_id", "ts",
            F.round(F.col("value") * 100).cast("long"), "event_id",
        ).collect()
    }
    assert out == {1: (2, 40_000_000, 250)}


def test_time_weighted_mean_holds_value_not_count(spark):
    from etl_rj_spark.operators.windows import time_weighted_mean

    # ten rapid updates at 900 cents in 1s each, then one 0-cent value
    # held for 990 s: arithmetic mean of samples ≈ 818, but TWAP ≈ 9
    rows = [(1, float(i), 9.0, i) for i in range(10)] + [
        (1, 10.0, 0.0, 10), (1, 1000.0, 9.0, 11)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, sec double, value double, event_id long"
    ).withColumn("ts", F.timestamp_seconds("sec"))
    (r,) = time_weighted_mean(
        df, "user_id", "ts",
        F.round(F.col("value") * 100).cast("long"), "event_id",
    ).collect()
    assert r.n_intervals == 11
    assert r.total_dur_us == 1_000_000_000
    assert r.twap_cents == (900 * 10_000_000) // 1_000_000_000  # == 9


def test_expectation_suite_counts_and_flags(spark):
    from etl_rj_spark.operators.validate import expectation_suite

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (2, None), (4, 3.0)],
        "k long, v double",
    )
    out = {
        r.rule: (r.n_violations, r.passed)
        for r in expectation_suite(
            df,
            {"v_positive": F.col("v") > 0, "k_not_null": F.col("k").isNotNull()},
            unique_cols=["k"],
        ).collect()
    }
    # NULL v counts as a violation (unknown ≠ valid); k=2 duplicated
    assert out == {
        "v_positive": (2, 0),
        "k_not_null": (0, 1),
        "unique(k)": (1, 0),
    }


def test_expectation_suite_rejects_quoted_rule_names(spark):
    import pytest

    from etl_rj_spark.operators.validate import expectation_suite

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        expectation_suite(df, {"bad'name": F.col("k").isNotNull()})


def test_ols2_matches_numpy_lstsq(spark):
    import numpy as np

    from etl_rj_spark.operators.stats import ols2_normal_equations

    rows = [
        (i, (i * 7) % 23, (i * 13) % 5,
         1000 + 37 * ((i * 7) % 23) - 210 * ((i * 13) % 5) + (i % 3))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "i long, x1 long, x2 long, y long")
    (r,) = ols2_normal_equations(
        df, F.col("y"), F.col("x1"), F.col("x2")
    ).collect()
    a = np.array([[1.0, x1, x2] for _, x1, x2, _ in rows])
    b = np.array([float(y) for *_, y in rows])
    want = np.linalg.lstsq(a, b, rcond=None)[0]
    got = np.array([r.beta0_ppm, r.beta1_ppm, r.beta2_ppm]) / 1e6
    assert r.n == 200
    assert np.allclose(got, want, atol=2e-6), (got, want)


def test_ols2_sign_split_negative_coefficient(spark):
    from etl_rj_spark.operators.stats import ols2_normal_equations

    # y = 10 - 2*x1 exactly, x2 constant-ish noise-free
    rows = [(i, i % 7, (i * 3) % 4, 10 - 2 * (i % 7)) for i in range(56)]
    df = spark.createDataFrame(rows, "i long, x1 long, x2 long, y long")
    (r,) = ols2_normal_equations(
        df, F.col("y"), F.col("x1"), F.col("x2")
    ).collect()
    assert r.beta1_ppm == -2_000_000
    assert r.beta2_ppm == 0
    assert r.beta0_ppm == 10_000_000


def test_ks_identical_and_disjoint(spark, sf_dir):
    # identical samples → D = 0; disjoint supports → D = 1
    from etl_rj_spark.analytics import REGISTRY

    # registry query smoke is covered by oracle parity; here pin the
    # metric's boundary behavior on constructed frames via the same ops
    def ks(df):
        pv = df.groupBy("cents").agg(
            F.sum("g1").alias("c1"), F.sum(F.lit(1) - F.col("g1")).alias("c2")
        )
        w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
        cum = pv.select(
            F.sum("c1").over(w).alias("cum1"), F.sum("c2").over(w).alias("cum2")
        )
        n = pv.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
        (r,) = (
            cum.join(F.broadcast(n)).groupBy("n1", "n2")
            .agg(F.max(F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))).alias("d"))
            .selectExpr("cast((d * 1000000) div (n1 * n2) as bigint) as d_ppm")
            .collect()
        )
        return r.d_ppm

    same = spark.createDataFrame(
        [(v, g) for v in (1, 2, 3, 4) for g in (0, 1)], "cents long, g1 int"
    )
    assert ks(same) == 0
    disjoint = spark.createDataFrame(
        [(1, 1), (2, 1), (10, 0), (11, 0)], "cents long, g1 int"
    )
    assert ks(disjoint) == 1_000_000


def test_cuped_perfect_covariate_removes_all_variance(spark):
    from etl_rj_spark.analytics import REGISTRY  # noqa: F401  (shape parity)

    # replicate the query's moment math on constructed (x, y = 3x):
    # corr² = 1 → var_reduction_ppm = 1_000_000, theta_ppm = 3e6
    u = spark.createDataFrame(
        [(i, i % 11, 3 * (i % 11)) for i in range(50)],
        "user_id long, x long, y long",
    ).select(
        "user_id",
        F.col("x").cast("decimal(38,0)").alias("x"),
        F.col("y").cast("decimal(38,0)").alias("y"),
    )
    m = u.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    (r,) = m.selectExpr(
        "cast(((n*sxy - sx*sy) * 1000000) div (n*sxx - sx*sx) as bigint) as theta_ppm",
        "cast(((n*sxy - sx*sy) * (n*sxy - sx*sy) * 1000000)"
        " div ((n*sxx - sx*sx) * (n*syy - sy*sy)) as bigint) as vr_ppm",
    ).collect()
    assert r.theta_ppm == 3_000_000
    assert r.vr_ppm == 1_000_000


def test_asof_join_ignores_null_right_ts(spark):
    """r9 review fix: a right row with NULL ts has no timeline
    position — it must not phantom-match left rows that precede every
    real right row."""
    from etl_rj_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k int, lts string"
    ).select("k", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(1, None, "phantom"), (1, "2024-01-01 12:00:00", "real")],
        "k int, rts string, v string",
    ).select("k", F.col("rts").cast("timestamp").alias("rts"), "v")
    r = asof_join(left, right, ["k"], "lts", "rts", ["v"]).collect()[0]
    assert r.asof_v is None and r.asof_ts is None


def test_bigram_fluency_splits_on_any_whitespace(spark):
    """r9 review fix: newline/tab-separated words must tokenize apart —
    a doc whose words repeat across lines has NO rare transitions."""
    from etl_rj_spark.operators.text_analysis import bigram_fluency_score

    df = spark.createDataFrame(
        [(1, "good day\ngood day\tgood day"), (2, "good day good day good day")],
        "id long, text string",
    )
    rows = {r.id: (r.n_bigrams, r.min_cond_ppm)
            for r in bigram_fluency_score(df, "id", "text").collect()}
    # identical token streams -> identical fluency, no phantom tokens
    assert rows[1] == rows[2]
