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
