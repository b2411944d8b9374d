"""Retrieval operators (operators/search.py): exact-integer TF·IDF
ranking semantics and RRF fusion properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_rj_spark.operators.search import keyword_search_topk, rrf_fuse


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "common common common rare"),
            (2, "common common"),
            (3, "common rare rare"),
            (4, "nothing matches here"),
            (5, "COMMON  rare"),  # case/whitespace-normalized
        ],
        "doc_id int, text string",
    )


def test_keyword_search_idf_weights_rare_terms(spark):
    """One 'rare' (df=3) outweighs many 'common' (df=4): doc 3 with
    rare×2 must beat doc 1 (rare×1 + common×3) and doc 2 (common×2);
    non-matching docs are absent; ranks are 1..k with id tie-break."""
    out = keyword_search_topk(_docs(spark), ["common", "rare"], k=10).collect()
    by_rank = {r.rank: r.doc_id for r in out}
    assert 4 not in {r.doc_id for r in out}
    # idf_ppm(common) = 5e6 div 4 = 1_250_000; idf_ppm(rare) = 5e6 div 3 = 1_666_666
    # doc1 = 3*1.25e6 + 1*1_666_666 = 5_416_666 ; doc3 = 2*1_666_666 + 1*1.25e6 = 4_583_332
    # doc5 = 1.25e6 + 1_666_666 = 2_916_666 ; doc2 = 2.5e6
    assert [by_rank[i] for i in range(1, 5)] == [1, 3, 5, 2]
    scores = {r.doc_id: r.score for r in out}
    assert scores[1] == 3 * 1_250_000 + 1_666_666
    assert scores[3] == 2 * 1_666_666 + 1_250_000


def test_keyword_search_query_terms_case_normalized(spark):
    """Query terms are matched against NORMALIZED tokens, and the
    operator lowercases the caller's terms symmetrically."""
    out = keyword_search_topk(_docs(spark), ["RARE"], k=10).collect()
    assert {r.doc_id for r in out} == {1, 3, 5}


def test_rrf_fuse_consensus_beats_single_list_winner(spark):
    """An id ranked mid-list in BOTH retrievers outranks an id that
    tops one list but is absent from the other:
    2/(60+3) > 1/(60+1). Absent ids contribute nothing (no NULLs)."""
    a = spark.createDataFrame([(10, 1), (30, 3)], "id int, rank int")
    b = spark.createDataFrame([(20, 1), (30, 3)], "id int, rank int")
    out = rrf_fuse([a, b], "id", k=10).collect()
    by_rank = {r.rank: r.id for r in out}
    assert by_rank[1] == 30            # consensus wins
    assert {by_rank[2], by_rank[3]} == {10, 20}
    scores = {r.id: r.rrf_score for r in out}
    assert scores[30] == 2 * (1_000_000_000 // 63)
    assert scores[10] == scores[20] == 1_000_000_000 // 61
    # equal scores → id tie-break, deterministic
    assert by_rank[2] == 10 and by_rank[3] == 20


def test_weighted_draws_distribution_and_determinism(spark):
    """Integer-CDF draws: exact output determinism, zero/null-weight
    exclusion, k slots per key, and empirical proportionality — an
    item holding 90% of the mass must win ~90% of a large draw set."""
    from etl_rj_spark.operators.curation import weighted_draws

    items = spark.createDataFrame(
        [("heavy", 900), ("light", 100), ("zero", 0), ("nullw", None)],
        "item string, w int",
    )
    keys = spark.createDataFrame([(i,) for i in range(200)], "k int")
    out = weighted_draws(items, keys, "item", "w", "k", k=10).collect()
    assert len(out) == 2000
    assert {r.slot for r in out} == set(range(1, 11))
    drawn = [r.item for r in out]
    assert "zero" not in drawn and "nullw" not in drawn
    frac_heavy = drawn.count("heavy") / len(drawn)
    assert 0.85 <= frac_heavy <= 0.95, frac_heavy
    again = weighted_draws(items, keys, "item", "w", "k", k=10).collect()
    assert {(r.k, r.slot, r.item) for r in again} == {(r.k, r.slot, r.item) for r in out}
    other = weighted_draws(items, keys, "item", "w", "k", k=10, seed="9").collect()
    assert {(r.k, r.slot, r.item) for r in other} != {(r.k, r.slot, r.item) for r in out}


def test_match_distribution_resample_reshapes_to_reference(spark):
    """Thinning must reproduce the reference's bin fractions (in
    expectation — checked within tolerance on 6k rows), keep the
    scarcest bin whole, drop bins absent from the reference, and stay
    deterministic."""
    from etl_rj_spark.operators.curation import match_distribution_resample

    # corpus: 3000 rows bin A, 2000 bin B, 1000 bin C
    rows = [(i, "A") for i in range(3000)]
    rows += [(10_000 + i, "B") for i in range(2000)]
    rows += [(20_000 + i, "C") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, bin string")
    # reference: equal A/B mass, no C
    ref = spark.createDataFrame(
        [(i, "A") for i in range(500)] + [(1000 + i, "B") for i in range(500)],
        "id long, bin string",
    )
    out = match_distribution_resample(df, ref, "bin", "id").collect()
    by_bin = {}
    for r in out:
        by_bin[r.bin] = by_bin.get(r.bin, 0) + 1
    assert "C" not in by_bin                      # absent from reference
    assert by_bin["B"] == 2000                    # scarcest matched bin kept whole
    # A thinned to match B's mass: ratio_A/ratio_B = (500/3000)/(500/2000)
    # → p_A = 2/3 → E[A kept] = 2000
    assert abs(by_bin["A"] - 2000) < 150, by_bin
    again = match_distribution_resample(df, ref, "bin", "id").collect()
    assert {(r.id) for r in again} == {(r.id) for r in out}


def test_bm25_length_normalization_and_saturation(spark):
    from etl_rj_spark.operators.search import bm25_search_topk

    docs = spark.createDataFrame(
        [
            (1, "rare word"),                       # short doc, one hit
            (2, "rare " + "filler " * 20),          # long doc, one hit
            (3, "rare rare rare rare " + "x " * 4), # tf saturates
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.score, r.rank) for r in
           bm25_search_topk(docs, ["rare"], k=10).collect()}
    # same tf, shorter doc scores higher (length normalization)
    assert out[1][0] > out[2][0]
    # higher tf scores higher, but sublinearly (saturation): tf=4 in a
    # similar-length doc must score < 4x the tf=1 short doc
    assert out[3][0] > out[1][0]
    assert out[3][0] < 4 * out[1][0]


def test_phrase_match_requires_adjacency_and_order(spark):
    from etl_rj_spark.operators.search import phrase_match_docs

    docs = spark.createDataFrame(
        [
            (1, "sort merge join"),          # 1 occurrence
            (2, "merge sort"),               # wrong order: no match
            (3, "sort the merge"),           # not adjacent: no match
            (4, "sort merge sort merge"),    # 2 occurrences
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_occurrences for r in
           phrase_match_docs(docs, ["sort", "merge"]).collect()}
    assert got == {1: 1, 4: 2}
    # three-term phrase
    got3 = {r.doc_id: r.n_occurrences for r in
            phrase_match_docs(docs, ["sort", "merge", "join"]).collect()}
    assert got3 == {1: 1}
