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


def test_skew_audit_reports_null_and_hot_keys(spark):
    from etl_rj_spark.operators.skew import skew_audit

    rows = [(None,)] * 300 + [("hot",)] * 650 + [(f"k{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "k string")
    got = {r.k: r for r in skew_audit(df, "k", threshold_ppm=50_000).collect()}
    assert set(got) == {None, "hot"}  # cold keys (0.1% each) silent
    assert got["hot"].share_ppm == 650_000
    assert got[None].n_rows == 300  # NULL reducer skew reported


def test_ols_slope_exact(spark):
    from etl_rj_spark.operators.stats import ols_slope_by_group

    rows = [("g", x, 3 * x + 7) for x in range(100)]       # perfect line
    rows += [("flat", x, 42) for x in range(10)]            # slope 0
    rows += [("deg", 5, 1), ("deg", 5, 9)]                  # zero x-variance → drop
    rows += [("one", 1, 1)]                                 # single point → drop
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r for r in ols_slope_by_group(df, "g", "x", "y").collect()}
    assert set(got) == {"g", "flat"}
    assert got["g"].slope_ppm == 3_000_000 and got["g"].intercept_ppm == 7_000_000
    assert got["flat"].slope_ppm == 0 and got["flat"].intercept_ppm == 42_000_000


def test_knn_label_vote_majority_and_self_exclusion(spark):
    from etl_rj_spark.operators.similarity import knn_label_vote

    # two tight clusters in 2-d; labels follow clusters except one
    # mislabeled point whose vote the majority overrides
    rows = [(i, [1.0 + 0.01 * i, 0.0], 1) for i in range(5)]
    rows.append((5, [1.05, 0.0], 2))             # mislabeled in cluster 1
    rows += [(10 + i, [0.0, 1.0 + 0.01 * i], 2) for i in range(5)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    queries = corpus.filter("vec_id in (0, 10)")
    got = {r.query_id: r for r in knn_label_vote(corpus, queries, k=5).collect()}
    assert got[0].pred_label == 1 and got[0].votes == 4   # 4 of 5 neighbors labeled 1
    assert got[10].pred_label == 2
    assert got[0].n_neighbors == 5  # self excluded, still k neighbors


def test_margin_bitext_mutual_best(spark):
    from etl_rj_spark.operators.similarity import margin_bitext_mine

    # target pool = rotated copies of the source pool (ids offset 100):
    # the planted alignment is src i <-> tgt 100+i
    import math
    srows, trows = [], []
    for i in range(8):
        a = 2 * math.pi * i / 8
        v = [math.cos(a), math.sin(a), 1.0]
        srows.append((i, v))
        trows.append((100 + i, [x * 2.0 for x in v]))  # scale-invariant cosine
    src = spark.createDataFrame(srows, "vec_id long, embedding array<double>")
    tgt = spark.createDataFrame(trows, "vec_id long, embedding array<double>")
    got = {(r.src_id, r.tgt_id) for r in margin_bitext_mine(src, tgt, k=3).collect()}
    assert got == {(i, 100 + i) for i in range(8)}
    # each side appears at most once (mutual-best is a partial matching)
    rows = margin_bitext_mine(src, tgt, k=3).collect()
    assert len({r.src_id for r in rows}) == len(rows)
    assert len({r.tgt_id for r in rows}) == len(rows)


def test_exact_auc_known_values(spark):
    from etl_rj_spark.operators.stats import exact_auc

    def auc(pairs):
        df = spark.createDataFrame(pairs, "s long, y int")
        r = exact_auc(df, "s", "y").collect()[0]
        return r.auc_ppm, r.n_pos, r.n_neg

    assert auc([(1, 0), (2, 0), (3, 1), (4, 1)]) == (1_000_000, 2, 2)   # perfect
    assert auc([(4, 0), (3, 0), (2, 1), (1, 1)])[0] == 0                 # inverted
    assert auc([(1, 0), (1, 1), (2, 0), (2, 1)])[0] == 500_000           # all tied
    # midrank tie handling: pairs (2,1)=1, (2,2)=0.5, (3,1)=1, (3,2)=1 -> 3.5/4
    assert auc([(1, 0), (2, 0), (2, 1), (3, 1)])[0] == 875_000
    # null rows dropped
    assert auc([(1, 0), (2, 1), (None, 1), (3, None)]) == (1_000_000, 1, 1)


def test_temperature_mix_resample_contract(spark):
    import pytest

    from etl_rj_spark.operators.curation import temperature_mix_resample

    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(30)]
    rows += [(2000, None), (2001, None)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix_resample(df, "source", "doc_id", temperature=2).collect()
    kept = {}
    for r in out:
        kept.setdefault(r.source, set()).add(r.doc_id)
    assert kept[None] == {2000, 2001}             # null rows pass through
    assert len(kept["small"]) == 30               # scarcest keeps 100%
    # big thins toward sqrt scaling: p_big = (sqrt(900)/900)/(sqrt(30)/30)
    # = 30/900 * 30/sqrt(30*900) ... ≈ 0.183 → ~165 of 900
    assert 100 < len(kept["big"]) < 260
    # deterministic
    again = {r.doc_id for r in temperature_mix_resample(df, "source", "doc_id", 2).collect()}
    assert again == {r.doc_id for r in out}
    with pytest.raises(ValueError, match="power of two"):
        temperature_mix_resample(df, "source", "doc_id", temperature=3)


def test_feature_hash_topic_clustering(spark):
    """Docs drawn from two disjoint vocabularies cluster into separate
    k-means cells via feature-hashed count vectors; NULL text yields a
    NULL vector."""
    from etl_rj_spark.operators.kmeans import kmeans_assign, kmeans_fit
    from etl_rj_spark.operators.text_analysis import feature_hash_vectors

    va = "alpha beta gamma delta epsilon"
    vb = "uno dos tres cuatro cinco"
    rows = [(i, f"{va} {va}") for i in range(10)]
    rows += [(100 + i, f"{vb} {vb} {vb}") for i in range(10)]
    rows.append((999, None))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = feature_hash_vectors(df, "doc_id", "text", dim=8)
    got = {r.doc_id: r.features for r in feats.collect()}
    assert got[999] is None
    assert got[0] == got[1] and sum(got[0]) == 10.0  # identical docs, 10 tokens
    fit_in = feats.filter("features is not null")
    cents = kmeans_fit(fit_in, vec_col="features", id_col="doc_id", k=2, iters=2)
    cells = {r.doc_id: r.cell for r in kmeans_assign(
        fit_in, cents, vec_col="features", id_col="doc_id").collect()}
    a_cells = {cells[i] for i in range(10)}
    b_cells = {cells[100 + i] for i in range(10)}
    assert len(a_cells) == 1 and len(b_cells) == 1 and a_cells != b_cells


def test_future_window_label(spark):
    import datetime

    from etl_rj_spark.operators.windows import future_window_label

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("u", 1, t0),
        ("u", 2, t0 + datetime.timedelta(days=3)),     # within 7d of #1
        ("u", 3, t0 + datetime.timedelta(days=20)),    # next gap 17d → #2 label 0
        ("v", 9, t0),                                  # singleton → 0, NULL gap
    ]
    df = spark.createDataFrame(rows, "u string, eid long, ts timestamp")
    got = {r.eid: r for r in future_window_label(df, "u", "ts", "eid", 7).collect()}
    assert got[1].retained == 1 and got[1].gap_seconds == 3 * 86400
    assert got[2].retained == 0 and got[2].gap_seconds == 17 * 86400
    assert got[3].retained == 0 and got[3].gap_seconds is None
    assert got[9].retained == 0 and got[9].gap_seconds is None


def test_calibration_bins_assignment(spark):
    from etl_rj_spark.operators.stats import calibration_bins

    # scores 0..99, label = score >= 50: low bins pure 0, high pure 1
    rows = [(s, 1 if s >= 50 else 0) for s in range(100)]
    rows.append((None, 1))
    rows.append((10, None))
    df = spark.createDataFrame(rows, "s long, y int")
    out = {r.bin: r for r in calibration_bins(df, "s", "y", k=10).collect()}
    assert set(out) == set(range(10))
    assert all(out[b].n == 10 for b in range(10))
    assert all(out[b].pos_rate_ppm == 0 for b in range(5))
    assert all(out[b].pos_rate_ppm == 1_000_000 for b in range(5, 10))
    assert out[0].mean_score_ppm == 4_500_000  # mean of 0..9
