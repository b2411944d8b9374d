"""Fuzzy name matching (operators/fuzzy.py): tier semantics, no-match
reporting, blocking recall tradeoff, and approx-sketch error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_rj_spark.operators.fuzzy import fuzzy_best_match, fuzzy_dim_lookup


def _dim(spark):
    return spark.createDataFrame(
        [(1, "Acme Foods"), (2, "Ricky Joy Candy"), (3, "Walmart")],
        "id int, name string",
    )


def test_fuzzy_best_match_picks_min_distance(spark):
    q = spark.createDataFrame([(10, "ricky joi candy"), (11, "walmrat")], "qid int, qn string")
    got = {
        r.qid: (r.matched_id, r.dist)
        for r in fuzzy_best_match(q, _dim(spark), "qid", "qn", "id", "name").collect()
    }
    assert got == {10: (2, 1), 11: (3, 2)}


def test_fuzzy_best_match_beyond_max_dist_absent(spark):
    q = spark.createDataFrame([(10, "zzzzzzzzzz")], "qid int, qn string")
    assert fuzzy_best_match(q, _dim(spark), "qid", "qn", "id", "name").count() == 0


def test_fuzzy_dim_lookup_tiers_and_unmatched_kept(spark):
    facts = spark.createDataFrame(
        [(100, "  ACME FOODS!"), (101, "wallmart"), (102, "no such co whatsoever")],
        "fact_id int, cust string",
    )
    out = fuzzy_dim_lookup(facts, _dim(spark), "cust", "id", "name").collect()
    by_id = {r.fact_id: r for r in out}
    assert len(out) == 3  # unmatched row kept, not dropped
    assert (by_id[100].matched_id, by_id[100].tier, by_id[100].dist) == (1, "exact", 0)
    assert (by_id[101].matched_id, by_id[101].tier, by_id[101].dist) == (3, "fuzzy", 1)
    assert by_id[102].matched_id is None and by_id[102].tier is None


def test_block_prefix_trades_recall_for_cost(spark):
    # typo in the first character escapes a prefix-1 block but not the
    # unblocked path
    q = spark.createDataFrame([(10, "ralmart")], "qid int, qn string")
    full = fuzzy_best_match(q, _dim(spark), "qid", "qn", "id", "name", block_prefix=0)
    blocked = fuzzy_best_match(q, _dim(spark), "qid", "qn", "id", "name", block_prefix=1)
    assert full.count() == 1 and blocked.count() == 0


def test_null_block_key_rows_not_dropped(spark):
    """ADVICE r6 #2 pin: a block key that evaluates to NULL (substring
    beyond a short cleaned name) must NOT silently drop the row — both
    sides coalesce to a shared sentinel block, so short names still
    match each other."""
    dim = spark.createDataFrame([(1, "ab"), (2, "Ricky Joy Candy")], "id int, name string")
    q = spark.createDataFrame([(10, "abc")], "qid int, qn string")
    # suffix-from-position-5 key: NULL for both 'ab' and 'abc'
    key = lambda c: F.substring(c, 5, 4)  # noqa: E731
    got = fuzzy_best_match(q, dim, "qid", "qn", "id", "name", block_key=key).collect()
    assert [(r.qid, r.matched_id, r.dist) for r in got] == [(10, 1, 1)]

    from etl_rj_spark.operators.fuzzy import fuzzy_best_match_multipass

    got2 = fuzzy_best_match_multipass(
        q, dim, "qid", "qn", "id", "name", block_keys=[key]
    ).collect()
    assert [(r.qid, r.matched_id, r.dist) for r in got2] == [(10, 1, 1)]


def test_approx_distinct_stats_error_bounds(spark, sf_dir):
    """The query's contract IS the bounded-error assertion (the *_ok
    flags must all be 1) plus the exact counts; cross-check the exact
    counts against an independent aggregation."""
    from etl_rj_spark.analytics import REGISTRY
    from etl_rj_spark.sources.parquet import read_parquet_table

    got = {r.l_returnflag: r for r in REGISTRY["approx_distinct_stats"].build(spark, sf_dir).collect()}
    li = read_parquet_table(spark, f"{sf_dir}/lineitem.parquet")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, e in exact.items():
        a = got[flag]
        assert a.exact_orders == e.orders
        assert a.exact_parts == e.parts
        assert a.approx_orders_ok == 1
        assert a.approx_parts_ok == 1
        assert a.approx_median_ok == 1


def test_lsh_topk_recall_and_self_match(spark, sf_dir):
    import pyspark.sql.functions as F2

    from etl_rj_spark.operators.similarity import cosine_topk, lsh_topk
    from etl_rj_spark.sources.parquet import read_parquet_table

    e = read_parquet_table(spark, f"{sf_dir}/embeddings.parquet")
    q = e.filter(F2.col("vec_id") < 20)
    truth = {(r.query_id, r.vec_id) for r in cosine_topk(e, q, 10).collect()}
    got = lsh_topk(e, q, 10, dim=64, bits=4, tables=8).collect()
    gset = {(r.query_id, r.vec_id) for r in got}
    assert len(gset & truth) / len(truth) >= 0.5  # measured 0.65 on this corpus
    # a query vector always collides with itself in every table → rank 1
    self_rank1 = {r.query_id for r in got if r.rank == 1 and r.vec_id == r.query_id}
    assert self_rank1 == set(range(20))


def test_cosine_near_pairs_lsh_recall(spark, sf_dir):
    import pyspark.sql.functions as F2

    from etl_rj_spark.operators.similarity import (
        cosine_near_pairs,
        cosine_near_pairs_lsh,
        vec_double,
    )
    from etl_rj_spark.sources.parquet import read_parquet_table

    e = read_parquet_table(spark, f"{sf_dir}/embeddings.parquet")
    v = vec_double("embedding")
    perturbed = F2.transform(v, lambda x, i: F2.when(i == 0, x + 0.05).otherwise(x))
    corpus = e.select("vec_id", v.alias("embedding")).unionByName(
        e.select((F2.col("vec_id") + 100000).alias("vec_id"), perturbed.alias("embedding"))
    )
    truth = {(r.id_a, r.id_b) for r in cosine_near_pairs(corpus, 0.99).collect()}
    got = {
        (r.id_a, r.id_b)
        for r in cosine_near_pairs_lsh(corpus, 0.99, dim=64).collect()
    }
    assert got <= truth  # rescoring is exact: no false positives
    # near-parallel pairs collide in ~every table → near-total recall
    assert len(got & truth) / len(truth) >= 0.95
    assert len(truth) >= e.count()  # every original/copy pair is present


def test_snapshot_diff_null_safe_compare(spark):
    from etl_rj_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, 5.0), (3, 1.0), (4, 2.0)], "k int, v double"
    )
    new = spark.createDataFrame(
        [(1, None), (2, None), (3, 1.0), (5, 9.0)], "k int, v double"
    )
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    # k=1: null == null → unchanged (suppressed); k=3 equal → suppressed
    assert got == {2: "changed", 4: "removed", 5: "added"}


def test_lsh_multiprobe_beats_single_probe_at_same_index_size(spark, sf_dir):
    """Multi-probe's contract: with the SAME corpus-side index (2
    tables × 4 bits), Hamming-1 probing must recover recall a single
    probe cannot (measured 0.795 vs 0.33 on this corpus; pinned with
    slack). Self-match stays rank 1 (the home bucket is always
    probed)."""
    import pyspark.sql.functions as F2

    from etl_rj_spark.operators.similarity import (
        cosine_topk,
        lsh_topk,
        lsh_topk_multiprobe,
    )
    from etl_rj_spark.sources.parquet import read_parquet_table

    e = read_parquet_table(spark, f"{sf_dir}/embeddings.parquet")
    q = e.filter(F2.col("vec_id") < 20)
    truth = {(r.query_id, r.vec_id) for r in cosine_topk(e, q, 10).collect()}
    got = lsh_topk_multiprobe(e, q, 10, dim=64, bits=4, tables=2).collect()
    mp = {(r.query_id, r.vec_id) for r in got}
    sp = {
        (r.query_id, r.vec_id)
        for r in lsh_topk(e, q, 10, dim=64, bits=4, tables=2).collect()
    }
    mp_recall = len(mp & truth) / len(truth)
    sp_recall = len(sp & truth) / len(truth)
    assert mp_recall >= 0.6
    assert mp_recall > sp_recall
    self_rank1 = {r.query_id for r in got if r.rank == 1 and r.vec_id == r.query_id}
    assert self_rank1 == set(range(20))
