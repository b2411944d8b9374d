"""Edge-case unit tests for the round-7 operator batch — the cases the
sf-data oracle comparisons cannot reach (empty inputs, all-delete logs,
tie preferences, missing sketch cells)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_cdc_apply_empty_log_keeps_base(spark):
    from etl_rj_spark.operators.scd import cdc_apply_log

    base = spark.createDataFrame([(1, 100), (2, 200)], "k long, v long")
    log = spark.createDataFrame([], "k long, seq long, op string, v long")
    out = cdc_apply_log(base, log, ["k"], "seq", "op", "v").orderBy("k").collect()
    assert [(r.k, r.v, r.version) for r in out] == [(1, 100, 0), (2, 200, 0)]


def test_cdc_apply_all_deletes_empties_touched_keys(spark):
    from etl_rj_spark.operators.scd import cdc_apply_log

    base = spark.createDataFrame([(1, 100), (2, 200)], "k long, v long")
    log = spark.createDataFrame(
        [(1, 1, "U", 111), (1, 2, "D", 0), (3, 1, "U", 300)],
        "k long, seq long, op string, v long",
    )
    out = cdc_apply_log(base, log, ["k"], "seq", "op", "v").orderBy("k").collect()
    # key 1 deleted by its last op; key 2 untouched; key 3 inserted
    assert [(r.k, r.v, r.version) for r in out] == [(2, 200, 0), (3, 300, 1)]


def test_cdc_apply_delete_then_reinsert(spark):
    from etl_rj_spark.operators.scd import cdc_apply_log

    base = spark.createDataFrame([(1, 100)], "k long, v long")
    log = spark.createDataFrame(
        [(1, 1, "D", 0), (1, 2, "I", 150)], "k long, seq long, op string, v long"
    )
    out = cdc_apply_log(base, log, ["k"], "seq", "op", "v").collect()
    assert [(r.k, r.v, r.version) for r in out] == [(1, 150, 2)]


def test_nearest_event_join_tie_prefers_backward(spark):
    from etl_rj_spark.operators.asof import nearest_event_join

    left = spark.createDataFrame(
        [(1, "2024-01-10 12:00:00")], "k long, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-10 11:00:00", 10), (1, "2024-01-10 13:00:00", 20)],
        "k long, ts string, v long",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = nearest_event_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_values=["v"]
    ).collect()
    assert out[0].nearest_v == 10 and out[0].nearest_dir == "back"


def test_nearest_event_join_forward_only(spark):
    from etl_rj_spark.operators.asof import nearest_event_join

    left = spark.createDataFrame(
        [(1, "2024-01-10 12:00:00")], "k long, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-11 13:00:00", 20)], "k long, ts string, v long"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = nearest_event_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_values=["v"]
    ).collect()
    assert out[0].nearest_v == 20 and out[0].nearest_dir == "fwd"


def test_nearest_event_join_no_candidates(spark):
    from etl_rj_spark.operators.asof import nearest_event_join

    left = spark.createDataFrame(
        [(1, "2024-01-10 12:00:00")], "k long, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame([], "k long, ts timestamp, v long")
    out = nearest_event_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_values=["v"]
    ).collect()
    assert out[0].nearest_v is None and out[0].nearest_dir is None


def test_cms_estimate_missing_key_reads_zero_or_collision(spark):
    from etl_rj_spark.streaming.sketches import cms_estimate, cms_sketch

    df = spark.createDataFrame([(i % 3,) for i in range(30)], "k long")
    sk = cms_sketch(df, "k", depth=4, width=64)
    probes = spark.createDataFrame([(0, 10), (99, 0)], "k long, exact long")
    out = {r.k: r.est_n for r in cms_estimate(sk, probes, "k", 4, 64).collect()}
    # CMS never under-counts; the absent key's estimate is bounded by
    # whatever collided into its cells (0 when none did)
    assert out[0] >= 10 and out[99] >= 0


def test_cms_sketch_merge_is_addition(spark):
    from etl_rj_spark.streaming.sketches import cms_sketch

    df = spark.createDataFrame([(i % 5,) for i in range(50)], "k long")
    one = cms_sketch(df, "k", depth=4, width=64)
    two = (
        one.unionByName(one)
        .groupBy("row", "col")
        .agg(F.sum("counter").alias("counter"))
    )
    doubled = {(r.row, r.col): r.counter for r in two.collect()}
    base = {(r.row, r.col): r.counter for r in one.collect()}
    assert doubled == {k: 2 * v for k, v in base.items()}


def test_trimmed_mean_small_groups_keep_everything(spark):
    from etl_rj_spark.operators.stats import trimmed_mean_by_group

    # n < trim_denom → cut = 0 → plain mean
    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("a", 33)], "g string, v long"
    )
    r = trimmed_mean_by_group(df, "g", "v", trim_denom=10).collect()[0]
    assert (r.n_rows, r.n_kept, r.trimmed_mean) == (3, 3, 21)


def test_weighted_percentiles_degenerate_single_value(spark):
    from etl_rj_spark.operators.stats import weighted_percentiles

    df = spark.createDataFrame([(7, 3), (7, 5)], "v long, w long")
    rows = weighted_percentiles(df, "v", "w", percentiles=(50, 99)).collect()
    assert {(r.pct, r.value, r.total_weight) for r in rows} == {(50, 7, 8), (99, 7, 8)}


def test_golden_record_merge_singletons_pass_through(spark):
    from etl_rj_spark.operators.curation import golden_record_merge

    df = spark.createDataFrame(
        [(1, 100, "en", "web"), (2, 50, "fr", "book")],
        "id long, size long, lang string, src string",
    )
    out = {
        r.cluster_key: r
        for r in golden_record_merge(
            df, F.col("id").cast("string"), "id", "size", "lang", "src"
        ).collect()
    }
    assert out["1"].survivor_id == 1 and out["1"].mode_value == "en"
    assert out["2"].all_sources == "book" and out["2"].n_members == 1


def test_golden_record_survivor_completeness_then_lowest_id(spark):
    from etl_rj_spark.operators.curation import golden_record_merge

    df = spark.createDataFrame(
        [(5, 100, "en", "a"), (3, 100, "fr", "b"), (9, 40, "fr", "a")],
        "id long, size long, lang string, src string",
    )
    r = golden_record_merge(
        df, F.lit("c"), "id", "size", "lang", "src"
    ).collect()[0]
    # max size ties (5 and 3 at 100) → lowest id survives
    assert r.survivor_id == 3
    # lang mode ties 2-1 for fr
    assert r.mode_value == "fr"
    assert r.all_sources == "a,b"


def test_poisson_weights_distribution_sane(spark):
    from etl_rj_spark.operators.stats import poisson_bootstrap_means

    df = spark.createDataFrame([(i, 100) for i in range(2000)], "id long, v long")
    rows = poisson_bootstrap_means(df, "id", "v", replicates=4).collect()
    for r in rows:
        # Poisson(1): n_eff ≈ n within loose bounds; constant values →
        # every replicate mean is exactly the constant
        assert 1700 <= r.n_eff <= 2300
        assert r.mean_value == 100


def test_morton_key_interleaves_bits(spark):
    from etl_rj_spark.operators.stats import morton_key

    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    key = df.select(morton_key(F.col("a"), F.col("b"), bits=4).alias("m")).collect()[0].m
    # a bits land at even positions, b bits at odd:
    # a=101 → positions 0,4; b=011 → positions 1,3 → 0b11011
    assert key == 0b11011


def test_referential_orphan_audit_counts_orphans_and_nulls(spark):
    from etl_rj_spark.operators.validate import referential_orphan_audit

    child = spark.createDataFrame([(1,), (2,), (99,), (None,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = referential_orphan_audit(
        [("c.fk->p.pk", child, "fk", "pk", parent, "")]
    ).collect()[0]
    assert (r.child_rows, r.null_keys, r.distinct_keys, r.orphan_rows) == (4, 1, 3, 1)


def test_prorate_largest_remainder_sums_exactly(spark):
    from etl_rj_spark.operators.aggregates import prorate_largest_remainder

    # weights 300/700, total 1001: floor split is 300/700, one leftover
    # cent goes to the larger scaled remainder (judge-repro case — a
    # broken split allocates the full total to every line).
    lines = spark.createDataFrame(
        [(1, 1, 300, 1001), (1, 2, 700, 1001),
         (2, 1, 1, 7), (2, 2, 1, 7), (2, 3, 1, 7)],
        "k long, ln long, w long, total long",
    )
    out = prorate_largest_remainder(
        lines, ["k"], "w", "total", tiebreak_cols=["ln"]
    )
    rows = {(r.k, r.ln): r.alloc for r in out.collect()}
    # per-row floors + largest-remainder top-up
    assert rows[(1, 1)] + rows[(1, 2)] == 1001
    assert rows[(1, 1)] in (300, 301) and rows[(1, 2)] in (700, 701)
    # order 2: 7 cents over 3 equal weights → 3/2/2 with the extra
    # cent on the lowest line number (deterministic tiebreak)
    assert (rows[(2, 1)], rows[(2, 2)], rows[(2, 3)]) == (3, 2, 2)
    # global invariant: allocations sum to the group total
    chk = (
        out.groupBy("k")
        .agg(F.sum("alloc").alias("s"), F.max("total").alias("t"))
        .where(F.col("s") != F.col("t"))
    )
    assert chk.count() == 0


def test_prorate_largest_remainder_zero_and_negative_total(spark):
    from etl_rj_spark.operators.aggregates import prorate_largest_remainder

    lines = spark.createDataFrame(
        [(1, 1, 5, 0), (1, 2, 5, 0)],
        "k long, ln long, w long, total long",
    )
    out = prorate_largest_remainder(
        lines, ["k"], "w", "total", tiebreak_cols=["ln"]
    ).collect()
    assert all(r.alloc == 0 for r in out)
