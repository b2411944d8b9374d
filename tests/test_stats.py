"""Robust-stats operators: equi-depth binning, MAD outlier screen,
mean-pooled embeddings (operators/stats.py, similarity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_equi_depth_bins_balanced_and_monotone(spark):
    from etl_rj_spark.operators.stats import equi_depth_bins

    df = spark.range(1000).select((F.col("id") * 7 % 1000).alias("v"))
    df = df.unionByName(spark.createDataFrame([(None,)], "v long"))
    out = equi_depth_bins(df, "v", 10).collect()
    by_bin = {}
    for r in out:
        if r.v is None:
            assert r.bin is None  # NULL passes through unbinned
            continue
        by_bin.setdefault(r.bin, []).append(r.v)
    assert sorted(by_bin) == list(range(10))
    assert all(len(vs) == 100 for vs in by_bin.values())  # exact equi-depth
    for b in range(9):  # monotone: bin b's values all below bin b+1's
        assert max(by_bin[b]) < min(by_bin[b + 1])


def test_equi_depth_ties_share_bin(spark):
    from etl_rj_spark.operators.stats import equi_depth_bins

    # 90 copies of one value + 10 distinct: the tie mass lands in ONE bin
    rows = [(5,)] * 90 + [(i,) for i in range(100, 110)]
    df = spark.createDataFrame(rows, "v long")
    out = equi_depth_bins(df, "v", 10).collect()
    tie_bins = {r.bin for r in out if r.v == 5}
    assert tie_bins == {0}


def test_mad_outlier_screen_flags_planted(spark):
    from etl_rj_spark.operators.stats import mad_outlier_screen

    rows = [("g", i, 100 + (i % 7)) for i in range(50)]  # tight cluster
    rows.append(("g", 900, 10_000))                      # planted outlier
    rows.append(("g", 901, None))                        # null dropped
    rows += [("h", i, 5) for i in range(10)]             # constant group
    df = spark.createDataFrame(rows, "grp string, id long, v long")
    out = {(r.grp, r.id): r for r in mad_outlier_screen(df, "grp", "v", "id").collect()}
    assert out[("g", 900)].is_outlier
    assert not any(r.is_outlier for (g, i), r in out.items() if g == "g" and i != 900)
    assert ("g", 901) not in out
    # constant group: MAD 0, median == value, nothing deviates → no flags
    assert all(not r.is_outlier for (g, _), r in out.items() if g == "h")


def test_mean_pool_embeddings_exact(spark):
    from etl_rj_spark.operators.similarity import mean_pool_embeddings

    rows = [
        ("a", [1.0, -2.0]),
        ("a", [3.0, 5.0]),
        ("a", None),          # contributes nothing
        ("b", None),          # all-NULL group absent
    ]
    df = spark.createDataFrame(rows, "g string, embedding array<double>")
    out = {r.g: r.mean_micros for r in mean_pool_embeddings(df, "g", "embedding").collect()}
    assert out == {"a": [2_000_000, 1_500_000]}


def test_cooccurrence_pairs_support_and_lift(spark):
    from etl_rj_spark.operators.stats import cooccurrence_pairs

    rows = []
    # items x,y co-occur in 4 of 6 baskets; z appears alone in 2
    for b in range(4):
        rows += [(b, "x"), (b, "y"), (b, "x")]  # dup presence collapses
    rows += [(4, "z"), (5, "z"), (5, None), (None, "x")]
    df = spark.createDataFrame(rows, "bk long, it string")
    out = {(r.item_a, r.item_b): r for r in cooccurrence_pairs(df, "bk", "it").collect()}
    assert set(out) == {("x", "y")}
    r = out[("x", "y")]
    assert r.support == 4
    # lift = 4*6/(4*4) = 1.5 -> 1_500_000 ppm
    assert r.lift_ppm == 1_500_000
    # support threshold filters the pair out
    assert cooccurrence_pairs(df, "bk", "it", min_support=5).count() == 0
