"""Unit tests for operator semantics not exercised by the oracle suite
(null-key dedup modes, pandas-compatible rename behavior, positional
renames, flexible column detection)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_rj_spark.operators.dedup import anti_join_new_rows
from etl_rj_spark.operators.filters import rows_where_no_column_contains
from etl_rj_spark.operators.projection import (
    first_present_column,
    rename_map,
    rename_positional,
    select_present,
    with_literals,
)
from etl_rj_spark.operators.setops import union_all_by_name


@pytest.fixture(scope="module")
def new_df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (None, "c", 30.0)], "k int, s string, v double"
    )


@pytest.fixture(scope="module")
def existing_df(spark):
    return spark.createDataFrame([(1, "a"), (9, "z"), (None, "c")], "k int, s string")


class TestAntiJoin:
    def test_error_mode_raises_on_null_key(self, new_df, existing_df):
        out = anti_join_new_rows(new_df, existing_df, ["k", "s"])
        with pytest.raises(Exception, match="null dedup key"):
            out.collect()

    def test_error_mode_clean_keys(self, spark, existing_df):
        new = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], "k int, s string, v double")
        got = anti_join_new_rows(new, existing_df, ["k", "s"]).collect()
        assert [(r.k, r.s) for r in got] == [(2, "b")]

    def test_drop_mode(self, new_df, existing_df):
        got = anti_join_new_rows(new_df, existing_df, ["k", "s"], on_null_key="drop").collect()
        assert sorted((r.k, r.s) for r in got) == [(2, "b")]

    def test_match_mode_pandas_semantics(self, new_df, existing_df):
        # pandas set-membership treats NaN keys as equal: the (None,'c')
        # row IS considered already-loaded and must be excluded.
        got = anti_join_new_rows(new_df, existing_df, ["k", "s"], on_null_key="match").collect()
        assert sorted((r.k, r.s) for r in got) == [(2, "b")]

    def test_rerun_idempotence(self, spark, new_df):
        # Ventas PDF §9 "Escenario de Recuperación": re-processing an
        # already-loaded file inserts zero rows.
        clean = new_df.na.drop(subset=["k"])
        assert anti_join_new_rows(clean, clean, ["k", "s"]).count() == 0


class TestProjection:
    def test_rename_map_ignores_missing(self, spark):
        df = spark.createDataFrame([(1, 2)], "a int, b int")
        out = rename_map(df, {"a": "x", "Customer ": "nombre"})
        assert out.columns == ["x", "b"]

    def test_rename_positional(self, spark):
        df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
        assert rename_positional(df, {1: "cuota_dinero", 2: "cuota_volumen"}).columns == [
            "a", "cuota_dinero", "cuota_volumen",
        ]

    def test_select_present(self, spark):
        df = spark.createDataFrame([(1, 2)], "a int, b int")
        assert select_present(df, ["b", "zz", "a"]).columns == ["b", "a"]

    def test_first_present_column(self, spark):
        df = spark.createDataFrame([(1,)], ["Status "])
        assert first_present_column(df, ["Validated Status ", "Status "]) == "Status "
        with pytest.raises(ValueError):
            first_present_column(df, ["nope"])

    def test_with_literals(self, spark):
        df = spark.createDataFrame([(1,)], "a int")
        row = with_literals(df, id_cliente=0, stamp=F.current_date()).collect()[0]
        assert row.id_cliente == 0 and row.stamp is not None


class TestFiltersSetops:
    def test_contains_null_safe(self, spark):
        df = spark.createDataFrame([("Total x", None), (None, "ok"), ("a", "b")], "x string, y string")
        got = rows_where_no_column_contains(df, "Total").collect()
        assert sorted([(r.x, r.y) for r in got], key=str) == sorted(
            [(None, "ok"), ("a", "b")], key=str
        )

    def test_union_drift(self, spark):
        a = spark.createDataFrame([(1, "x")], "k int, s string")
        b = spark.createDataFrame([(2, 9.5)], "k int, v double")
        out = union_all_by_name([a, b])
        assert set(out.columns) == {"k", "s", "v"}
        assert out.count() == 2


def test_incremental_near_dup_probes_index_without_corpus_rescan(spark):
    """Incremental near-dup: pairs touching the new batch are found
    via the persisted index (new x existing and new x new); pairs
    entirely inside the existing corpus are NOT re-reported."""
    from etl_rj_spark.operators.text_dedup import (
        incremental_near_dup_pairs,
        minhash_index,
    )

    base = "the quick brown fox jumps over the lazy dog again and again %d"
    old_rows = [(i, base % (i // 2)) for i in range(6)]  # 3 internal dup pairs
    new_rows = [
        (100, old_rows[0][1] + " zz"),   # near-dup of docs 0/1
        (101, "completely unrelated text about spark shuffles and parquet"),
        (102, old_rows[0][1] + " zz"),   # near-dup of 0/1 AND of 100
    ]
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    buckets, sets = minhash_index(old, "doc_id", "text")
    pairs = {
        (r.id_a, r.id_b)
        for r in incremental_near_dup_pairs(
            new, buckets, sets, "doc_id", "text", threshold=0.8
        ).collect()
    }
    assert (0, 100) in pairs and (1, 100) in pairs     # new x existing
    assert (100, 102) in pairs                          # new x new
    assert all(a >= 100 or b >= 100 for a, b in pairs)  # no old x old re-report
    assert not any(101 in p for p in pairs)             # unrelated stays clean


class TestNearDupPairsDefault:
    """near_dup_pairs — the storm-safe DEFAULT near-dup entry point
    (VERDICT r13 #5): count-gated exact-collapse-first tier order."""

    BASE = "the quick brown fox jumps over the lazy dog again and again %d"

    def test_no_storm_gate_matches_raw_operator_exactly(self, spark):
        from etl_rj_spark.operators.text_dedup import (
            minhash_lsh_dedup_pairs,
            near_dup_pairs,
        )

        rows = [(i, self.BASE % i) for i in range(8)] + [
            (100, (self.BASE % 0) + " zz")  # near-dup, NOT exact
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in near_dup_pairs(df, "doc_id", "text", threshold=0.8).collect()
        )
        raw = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in minhash_lsh_dedup_pairs(
                df, "doc_id", "text", threshold=0.8
            ).collect()
        )
        assert got == raw and (0, 100) in {(a, b) for a, b, _ in got}

    def test_storm_collapses_to_linear_star_edges(self, spark):
        from etl_rj_spark.operators.text_dedup import near_dup_pairs

        # genuinely DISTINCT base texts (BASE%i strings are one char
        # apart — near-dups of each other at τ=0.8, wrong fixture here)
        distinct = [
            (0, "spark shuffles hash partition data across every executor node"),
            (1, "parquet stores columnar pages with dictionary and rle encodings"),
            (2, "watermarks bound streaming state for late arriving event rows"),
        ]
        storm_text = self.BASE % 7
        rows = (
            distinct
            + [(7, storm_text)]
            + [(200 + i, storm_text) for i in range(20)]  # exact-dup storm of doc 7
            + [(100, storm_text + " zz")]  # near-dup of the storm content
        )
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = near_dup_pairs(df, "doc_id", "text", threshold=0.8).collect()
        star = {(r.id_a, r.id_b) for r in pairs if r.jaccard == 1.0}
        # linear: 20 (7, 200+i) edges — never the C(21,2)=210 clique
        assert star == {(7, 200 + i) for i in range(20)}
        # the near-dup surfaces ONCE, at the representative
        near = {(r.id_a, r.id_b) for r in pairs if r.jaccard < 1.0}
        assert near == {(7, 100)}
        assert len(pairs) == 21

    def test_duplicated_rows_emit_distinct_star_edges(self, spark):
        from etl_rj_spark.operators.text_dedup import near_dup_pairs

        rows = [(1, self.BASE % 0), (2, self.BASE % 0)] * 3  # replayed shard
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = near_dup_pairs(df, "doc_id", "text", threshold=0.8).collect()
        assert [(r.id_a, r.id_b, r.jaccard) for r in pairs] == [(1, 2, 1.0)]

    def test_null_text_rows_never_pair(self, spark):
        from etl_rj_spark.operators.text_dedup import near_dup_pairs

        rows = [(1, self.BASE % 0), (2, None), (3, None), (4, self.BASE % 0)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = {
            (r.id_a, r.id_b)
            for r in near_dup_pairs(df, "doc_id", "text", threshold=0.8).collect()
        }
        assert pairs == {(1, 4)}  # NULLs are content-free, not dups of each other

    def test_survivors_identical_default_vs_raw(self, spark):
        """The component-equivalence claim behind the linear star
        edges: dedup_survivors keeps EXACTLY the same corpus whether
        the pairs came from the storm-safe default or the raw
        all-pairs operator — the star spans the same components as
        the clique."""
        from etl_rj_spark.operators.text_dedup import (
            dedup_survivors,
            minhash_lsh_dedup_pairs,
            near_dup_pairs,
        )

        storm_text = self.BASE % 3
        rows = (
            [(0, "spark shuffles hash partition data across every executor node"),
             (1, "parquet stores columnar pages with dictionary and rle encodings")]
            + [(3, storm_text)]
            + [(300 + i, storm_text) for i in range(12)]   # exact-dup storm
            + [(50, storm_text + " zz")]                    # near-dup of the storm
        )
        df = spark.createDataFrame(rows, "doc_id long, text string")
        s_default = sorted(
            r.doc_id
            for r in dedup_survivors(
                df, "doc_id", near_dup_pairs(df, "doc_id", "text", threshold=0.8)
            ).collect()
        )
        s_raw = sorted(
            r.doc_id
            for r in dedup_survivors(
                df, "doc_id",
                minhash_lsh_dedup_pairs(df, "doc_id", "text", threshold=0.8),
            ).collect()
        )
        assert s_default == s_raw == [0, 1, 3]  # storm + near-dup all collapse to 3

    def test_opt_out_is_the_raw_operator(self, spark):
        from etl_rj_spark.operators.text_dedup import (
            minhash_lsh_dedup_pairs,
            near_dup_pairs,
        )

        rows = [(1, self.BASE % 0), (2, self.BASE % 0), (3, (self.BASE % 0) + " zz")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(
            (r.id_a, r.id_b)
            for r in near_dup_pairs(
                df, "doc_id", "text", threshold=0.8, exact_collapse_first=False
            ).collect()
        )
        raw = sorted(
            (r.id_a, r.id_b)
            for r in minhash_lsh_dedup_pairs(df, "doc_id", "text", threshold=0.8).collect()
        )
        assert got == raw == [(1, 2), (1, 3), (2, 3)]  # the full clique, by request


class TestStormSafeFamilies:
    """r15 (VERDICT r14 #2): the exact-collapse-first storm posture is
    the DEFAULT for every near-pair family — SimHash, n-gram Jaccard,
    PPJoin prefix, and embedding cosine — through the shared
    ``exact_collapse_star_pairs`` machinery, with component-equivalent
    survivors versus each family's raw all-pairs opt-out."""

    DISTINCT = [
        (0, "spark shuffles hash partition data across every executor node"),
        (1, "parquet stores columnar pages with dictionary and rle encodings"),
        (2, "watermarks bound streaming state for late arriving event rows"),
    ]
    STORM_TEXT = "the quick brown fox jumps over the lazy dog again and again"

    def _storm_corpus(self, spark):
        rows = (
            self.DISTINCT
            + [(7, self.STORM_TEXT)]
            + [(200 + i, self.STORM_TEXT) for i in range(15)]
        )
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_identical_unshingleable_docs_collapse_in_exact_tier(self, spark):
        """ADVICE r14 pin: two identical 3-char docs have EMPTY
        5-shingle sets, so raw LSH can never pair them — the exact
        tier pairs them anyway (identical content is a duplicate
        relation regardless of shingleability), so the default
        deduplicates the group where raw keeps every copy. This
        widening is the INTENDED behavior; the component-equivalence
        claim is scoped to shingleable text."""
        from etl_rj_spark.operators.text_dedup import (
            dedup_survivors,
            minhash_lsh_dedup_pairs,
            near_dup_pairs,
        )

        df = spark.createDataFrame(
            [(1, "abc"), (2, "abc")], "doc_id long, text string"
        )
        got = [
            (r.id_a, r.id_b, r.jaccard)
            for r in near_dup_pairs(df, "doc_id", "text", threshold=0.8).collect()
        ]
        assert got == [(1, 2, 1.0)]  # exact tier star edge
        assert minhash_lsh_dedup_pairs(df, "doc_id", "text", threshold=0.8).count() == 0
        s_default = sorted(
            r.doc_id
            for r in dedup_survivors(
                df, "doc_id", near_dup_pairs(df, "doc_id", "text", threshold=0.8)
            ).collect()
        )
        s_raw = sorted(
            r.doc_id
            for r in dedup_survivors(
                df, "doc_id",
                minhash_lsh_dedup_pairs(df, "doc_id", "text", threshold=0.8),
            ).collect()
        )
        assert s_default == [1] and s_raw == [1, 2]

    def test_simhash_storm_star_edges_and_survivor_equality(self, spark):
        from etl_rj_spark.operators.text_dedup import (
            dedup_survivors,
            simhash_near_pairs,
        )

        df = self._storm_corpus(spark)
        pairs = simhash_near_pairs(df, "doc_id", "text", max_hamming=3).collect()
        star = {(r.id_a, r.id_b) for r in pairs}
        assert star == {(7, 200 + i) for i in range(15)}  # linear, not C(16,2)=120
        assert all(r.hamming == 0 for r in pairs)
        raw = simhash_near_pairs(
            df, "doc_id", "text", max_hamming=3, exact_collapse_first=False
        )
        assert raw.count() == 120  # the clique, by request
        s_default = sorted(
            r.doc_id
            for r in dedup_survivors(
                df, "doc_id", simhash_near_pairs(df, "doc_id", "text", max_hamming=3)
            ).collect()
        )
        s_raw = sorted(
            r.doc_id for r in dedup_survivors(df, "doc_id", raw).collect()
        )
        assert s_default == s_raw == [0, 1, 2, 7]

    def test_ngram_storm_star_edges_and_prefix_parity(self, spark):
        from etl_rj_spark.operators.text_dedup import (
            dedup_survivors,
            ngram_jaccard_pairs,
            set_similarity_pairs_prefix,
        )

        df = self._storm_corpus(spark)
        got = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in ngram_jaccard_pairs(
                df, "doc_id", "text", threshold=0.7, n=3
            ).collect()
        )
        assert got == sorted(((7, 200 + i, 1.0) for i in range(15)))
        # the PPJoin prefix path stays answer-identical tier-for-tier
        pref = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in set_similarity_pairs_prefix(
                df, "doc_id", "text", threshold=0.7, n=3
            ).collect()
        )
        assert pref == got
        raw = ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.7, n=3, exact_collapse_first=False
        )
        assert raw.count() == 120
        s_default = sorted(
            r.doc_id
            for r in dedup_survivors(
                df, "doc_id",
                ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.7, n=3),
            ).collect()
        )
        s_raw = sorted(
            r.doc_id for r in dedup_survivors(df, "doc_id", raw).collect()
        )
        assert s_default == s_raw == [0, 1, 2, 7]

    def _vector_storm_corpus(self, spark):
        import math

        def vec(seed: int) -> list[float]:
            return [math.sin(seed * 31 + j) for j in range(8)]

        rows = (
            [(i, vec(i)) for i in range(3)]
            + [(7, vec(7))]
            + [(200 + i, vec(7)) for i in range(15)]   # bit-identical storm
            # near-dup, NOT identical: big enough that round(cos, 9)
            # stays < 1.0, small enough to clear the 0.99 threshold
            + [(50, [x + 2e-3 for x in vec(7)])]
        )
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_vector_storm_star_edges_and_survivor_equality(self, spark):
        from etl_rj_spark.operators.similarity import (
            cosine_near_pairs,
            near_dup_vector_pairs,
        )
        from etl_rj_spark.operators.text_dedup import dedup_survivors

        df = self._vector_storm_corpus(spark)
        pairs = near_dup_vector_pairs(df, threshold=0.99).collect()
        star = {(r.id_a, r.id_b) for r in pairs if r.score == 1.0}
        assert star == {(7, 200 + i) for i in range(15)}
        near = {(r.id_a, r.id_b) for r in pairs if r.score < 1.0}
        assert near == {(7, 50)}  # the near-dup surfaces ONCE, at the rep
        raw = cosine_near_pairs(df, 0.99)
        assert raw.count() == 16 * 15 // 2 + 16  # clique + near-dup x members
        s_default = sorted(
            r.vec_id
            for r in dedup_survivors(
                df, "vec_id",
                near_dup_vector_pairs(df, threshold=0.99).select("id_a", "id_b"),
            ).collect()
        )
        s_raw = sorted(
            r.vec_id
            for r in dedup_survivors(df, "vec_id", raw.select("id_a", "id_b")).collect()
        )
        assert s_default == s_raw == [0, 1, 2, 7]

    def test_vector_no_storm_matches_raw_and_lsh_tier_works(self, spark):
        import math

        from etl_rj_spark.operators.similarity import (
            cosine_near_pairs,
            near_dup_vector_pairs,
        )

        rows = [
            (i, [math.sin(i * 31 + j) for j in range(8)]) for i in range(6)
        ] + [(100, [math.sin(0 * 31 + j) + 1e-6 for j in range(8)])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = sorted(
            (r.id_a, r.id_b, round(r.score, 9))
            for r in near_dup_vector_pairs(df, threshold=0.99).collect()
        )
        raw = sorted(
            (r.id_a, r.id_b, round(r.score, 9))
            for r in cosine_near_pairs(df, 0.99).collect()
        )
        assert got == raw and (0, 100) in {(a, b) for a, b, _ in got}
        # the dim-routed LSH tier: identical vectors collapse BEFORE
        # bucketing, and the storm group never reaches the band join
        storm = df.unionByName(
            spark.createDataFrame(
                [(200 + i, [math.sin(0 * 31 + j) for j in range(8)]) for i in range(10)],
                "vec_id long, embedding array<double>",
            )
        )
        lsh_pairs = near_dup_vector_pairs(storm, threshold=0.99, dim=8).collect()
        pair_set = {(r.id_a, r.id_b) for r in lsh_pairs}
        # 10 linear star edges for the storm group, plus the +1e-6
        # near-dup found ONCE at the representative through the LSH
        # tier (its cosine rounds to 1.0 at 9 dp, so the pair sets —
        # not the scores — are the star/raw discriminator here); the
        # collapsed members 200+i never reach the band join, so none
        # of them re-pairs with 100
        assert pair_set == {(0, 200 + i) for i in range(10)} | {(0, 100)}

    def test_storm_calls_do_not_accumulate_persistent_rdds(self, spark):
        """VERDICT r14 What's wrong #1 regression: repeated storm-path
        calls in one session must not grow pinned storage. The r14
        storm branch persisted its mapping (CacheManager-registered —
        freed only by an explicit unpersist/clearCache, i.e. never for
        a library caller); r15 routes every materialized intermediate
        through localCheckpoint, whose blocks the ContextCleaner frees
        once the result plan is unreachable."""
        import gc
        import time

        from etl_rj_spark.operators.text_dedup import near_dup_pairs

        sc = spark.sparkContext

        def n_pinned() -> int:
            return sc._jsc.sc().getPersistentRDDs().size()

        def drain(target: int, deadline_s: float = 30.0) -> int:
            """GC both runtimes until pinned storage is back at
            ``target`` (ContextCleaner frees checkpoint blocks only
            after a JVM GC enqueues their weak refs)."""
            end = time.time() + deadline_s
            while time.time() < end:
                gc.collect()
                sc._jvm.System.gc()
                if n_pinned() <= target:
                    return n_pinned()
                time.sleep(0.5)
            return n_pinned()

        # baseline tolerates residue pinned by EARLIER tests in the
        # session — the contract under test is NON-GROWTH across calls
        baseline = drain(0, deadline_s=10.0)
        rows = [(7, self.STORM_TEXT)] + [
            (200 + i, self.STORM_TEXT) for i in range(10)
        ] + self.DISTINCT
        for _ in range(3):
            df = spark.createDataFrame(rows, "doc_id long, text string")
            out = near_dup_pairs(df, "doc_id", "text", threshold=0.8)
            assert out.count() == 10
            del out, df
            assert drain(baseline) <= baseline  # nothing NEW stays pinned


class TestChunkWindows:
    def test_boundary_chunk_counts_and_offsets(self, spark):
        from etl_rj_spark.operators.curation import chunk_windows

        df = spark.createDataFrame(
            [(1, "abcdefghij"), (2, ""), (3, None), (4, "abc"), (5, "abcd"), (6, "abcde")],
            "id long, text string",
        )
        rows = (
            chunk_windows(df, "id", "text", size=4, stride=3)
            .orderBy("id", "chunk_idx")
            .collect()
        )
        got = [(r.id, r.chunk_idx, r.chunk_start, r.chunk_text) for r in rows]
        assert got == [
            (1, 0, 0, "abcd"),  # len 10 -> 1 + ceil(6/3) = 3 chunks
            (1, 1, 3, "defg"),
            (1, 2, 6, "ghij"),
            (4, 0, 0, "abc"),   # short doc: single (short) chunk
            (5, 0, 0, "abcd"),  # exactly size: single chunk, no empty tail
            (6, 0, 0, "abcd"),  # size+1: tail chunk is the 1-char overflow window
            (6, 1, 3, "de"),
        ]
        # empty (2) and NULL (3) docs vanish entirely

    def test_rejects_bad_stride(self, spark):
        from etl_rj_spark.operators.curation import chunk_windows

        df = spark.range(1).withColumn("text", F.lit("x"))
        with pytest.raises(ValueError, match="stride"):
            chunk_windows(df, "id", "text", size=4, stride=5)
        with pytest.raises(ValueError, match="stride"):
            chunk_windows(df, "id", "text", size=4, stride=0)

    def test_no_shuffle_in_plan(self, spark):
        from etl_rj_spark.operators.curation import chunk_windows

        df = spark.range(10).withColumn("text", F.lit("y" * 200))
        plan = chunk_windows(df, "id", "text", size=64, stride=48)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestScd2Apply:
    def _dim(self, spark):
        return spark.createDataFrame(
            [(1, "A", "1995-01-01", None), (2, "B", "1995-01-01", None)],
            "k int, seg string, valid_from string, valid_to string",
        ).selectExpr(
            "k", "seg", "CAST(valid_from AS DATE) valid_from",
            "CAST(valid_to AS DATE) valid_to",
        )

    def _changes(self, spark, rows):
        return spark.createDataFrame(
            rows, "k int, seg string, effective_date string"
        ).selectExpr("k", "seg", "CAST(effective_date AS DATE) effective_date")

    def test_two_batch_fold_builds_three_interval_history(self, spark):
        from etl_rj_spark.operators.scd import scd2_apply

        dim = self._dim(spark)
        b1 = self._changes(spark, [(1, "A2", "1996-01-01")])
        b2 = self._changes(spark, [(1, "A3", "1997-01-01")])
        h = scd2_apply(scd2_apply(dim, b1, ["k"], ["seg"]), b2, ["k"], ["seg"])
        rows = sorted(
            (r.k, r.seg, str(r.valid_from), str(r.valid_to)) for r in h.collect()
        )
        assert rows == [
            (1, "A", "1995-01-01", "1996-01-01"),
            (1, "A2", "1996-01-01", "1997-01-01"),
            (1, "A3", "1997-01-01", "None"),
            (2, "B", "1995-01-01", "None"),
        ]

    def test_noop_redelivery_leaves_history_unchanged(self, spark):
        from etl_rj_spark.operators.scd import scd2_apply

        dim = self._dim(spark)
        noop = self._changes(spark, [(1, "A", "1996-01-01"), (2, "B", "1996-01-01")])
        h = scd2_apply(dim, noop, ["k"], ["seg"])
        assert sorted((r.k, r.seg, str(r.valid_to)) for r in h.collect()) == [
            (1, "A", "None"), (2, "B", "None"),
        ]

    def _canon(self, df):
        return sorted(
            (r.k, r.seg, str(r.valid_from), str(r.valid_to)) for r in df.collect()
        )

    def test_multi_matches_per_date_fold(self, spark):
        """scd2_apply_multi on a many-date batch == folding scd2_apply
        per ascending distinct date: stale changes dropped, no-op
        chains collapsed (including noop-then-real), A→B→A kept as two
        real transitions, new keys open mid-chain."""
        from pyspark.sql import functions as F

        from etl_rj_spark.operators.scd import scd2_apply, scd2_apply_multi

        dim = self._dim(spark)
        batch = self._changes(spark, [
            (1, "A9", "1990-06-01"),   # stale: before open valid_from
            (1, "A", "1996-01-01"),    # no-op vs open row
            (1, "B", "1997-01-01"),    # real
            (1, "B", "1998-01-01"),    # no-op vs surviving 1997 state
            (1, "A", "1999-01-01"),    # real flip-back (A→B→A)
            (2, "B2", "1996-07-01"),   # real, single change
            (3, "C", "1996-01-01"),    # new key, then chain
            (3, "C", "1997-01-01"),    # no-op within the new chain
            (3, "D", "1998-01-01"),    # real
        ])
        effs = [r[0] for r in batch.select("effective_date").distinct()
                .orderBy("effective_date").collect()]
        looped = dim
        for eff in effs:
            looped = scd2_apply(
                looped, batch.filter(F.col("effective_date") == F.lit(eff)),
                ["k"], ["seg"],
            )
        multi = scd2_apply_multi(dim, batch, ["k"], ["seg"])
        assert self._canon(multi) == self._canon(looped)

    def test_multi_backfill_plan_depth_independent_of_date_count(self, spark):
        """A 120-distinct-date backfill batch folds in one pass: the
        optimized plan carries a constant number of Window operators
        (the per-date loop stacked one scd2_apply layer per date)."""
        from pyspark.sql import functions as F

        from etl_rj_spark.operators.scd import scd2_apply_multi

        dim = self._dim(spark)
        batch = (
            spark.range(120)
            .select(
                F.lit(1).alias("k"),
                F.concat(F.lit("S"), F.col("id")).alias("seg"),
                F.date_add(F.lit("2000-01-01").cast("date"), F.col("id").cast("int"))
                .alias("effective_date"),
            )
        )
        h = scd2_apply_multi(dim, batch, ["k"], ["seg"])
        plan = h._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Window") <= 3, plan.count("Window")
        rows = self._canon(h)
        # 120 transitions for k=1 (every seg differs) + its closed open
        # row + k=2 untouched
        assert len(rows) == 122
        assert rows[0] == (1, "A", "1995-01-01", "2000-01-01")
        open_k1 = [r for r in rows if r[0] == 1 and r[3] == "None"]
        assert open_k1 == [(1, "S119", "2000-04-29", "None")]
        assert rows[-1] == (2, "B", "1995-01-01", "None")


class TestEpochUpsample:
    def test_weights_shape_output(self, spark):
        from etl_rj_spark.operators.curation import epoch_upsample

        df = spark.createDataFrame(
            [(i, "heavy" if i < 10 else "drop") for i in range(20)],
            "id long, src string",
        )
        out = epoch_upsample(df, "src", "id", {"heavy": 3.0, "drop": 0.0}).collect()
        assert len(out) == 30  # 10×3 + 10×0
        assert {r.epoch for r in out} == {0, 1, 2}

    def test_fractional_weight_is_deterministic(self, spark):
        from etl_rj_spark.operators.curation import epoch_upsample

        df = spark.createDataFrame([(i, "s") for i in range(200)], "id long, src string")
        a = sorted((r.id, r.epoch) for r in epoch_upsample(df, "src", "id", {"s": 1.5}).collect())
        b = sorted((r.id, r.epoch) for r in epoch_upsample(df, "src", "id", {"s": 1.5}).collect())
        assert a == b
        n = len(a)
        assert 200 < n < 400  # ~300 expected; hash fraction is not exact
        with pytest.raises(ValueError, match="negative"):
            epoch_upsample(df, "src", "id", {"s": -1.0})

    def test_null_key_keeps_integer_copies(self, spark):
        from etl_rj_spark.operators.curation import epoch_upsample

        df = spark.createDataFrame(
            [(None, "s"), (1, "s")], "id string, src string"
        )
        out = sorted(
            ((r.id, r.epoch)
             for r in epoch_upsample(df, "src", "id", {"s": 2.5}).collect()),
            key=lambda t: (t[0] is not None, t[0] or "", t[1]),
        )
        # NULL key can't hash: no fractional extra, but the two
        # guaranteed integer copies survive
        assert [e for i, e in out if i is None] == [0, 1]


class TestFixedWidth:
    FIELDS = [("k", 4, "int"), ("name", 6, "string"), ("v", 5, "bigint")]

    def test_roundtrip_and_ragged_tail_nulls(self, spark, tmp_path):
        from etl_rj_spark.sources.fixed_width import read_fixed_width, write_fixed_width

        df = spark.createDataFrame(
            [(1, "ab", 500), (23, "cdef", None)], "k int, name string, v bigint"
        )
        p = str(tmp_path / "fw")
        write_fixed_width(df, p, self.FIELDS)
        back = read_fixed_width(spark, p, self.FIELDS)
        assert sorted((r.k, r.name, r.v) for r in back.collect()) == [
            (1, "ab", 500), (23, "cdef", None),
        ]
        # ragged line: missing tail fields read as NULL, blank skipped
        with open(tmp_path / "fw2.txt", "w") as f:
            f.write("  77zz\n\n")
        short = read_fixed_width(spark, str(tmp_path / "fw2.txt"), self.FIELDS)
        assert [(r.k, r.name, r.v) for r in short.collect()] == [(77, "zz", None)]

    def test_overflow_raises_not_truncates(self, spark, tmp_path):
        from etl_rj_spark.sources.fixed_width import write_fixed_width

        df = spark.createDataFrame([(1, "toolongname", 2)], "k int, name string, v bigint")
        with pytest.raises(Exception, match="fixed-width overflow"):
            write_fixed_width(df, str(tmp_path / "fw3"), self.FIELDS)


class TestScd2MultiNullEff:
    def test_null_effective_dates_ignored_like_scd2_apply(self, spark):
        """A NULL-effective-date change must be ignored (scd2_apply's
        has_change contract) — including on a NEW key, where it would
        otherwise open a bogus NULL-valid_from row and swallow the real
        change via the no-op collapse."""
        from pyspark.sql import functions as F

        from etl_rj_spark.operators.scd import scd2_apply, scd2_apply_multi

        dim = spark.createDataFrame(
            [(1, "A", "1995-01-01", None)],
            "k int, seg string, valid_from string, valid_to string",
        ).selectExpr(
            "k", "seg", "CAST(valid_from AS DATE) valid_from",
            "CAST(valid_to AS DATE) valid_to",
        )
        batch = spark.createDataFrame(
            [(2, "B", None), (2, "B", "2000-01-01"), (1, "A2", None)],
            "k int, seg string, effective_date string",
        ).selectExpr("k", "seg", "CAST(effective_date AS DATE) effective_date")

        multi = scd2_apply_multi(dim, batch, ["k"], ["seg"])
        rows = sorted(
            (r.k, r.seg, str(r.valid_from), str(r.valid_to)) for r in multi.collect()
        )
        # k=2 opens at the REAL date; k=1 untouched (its only change was null)
        assert rows == [
            (1, "A", "1995-01-01", "None"),
            (2, "B", "2000-01-01", "None"),
        ]
        # parity with the per-date fold (which drops null-date slices)
        looped = scd2_apply(
            dim, batch.filter(F.col("effective_date").isNotNull()), ["k"], ["seg"]
        )
        assert rows == sorted(
            (r.k, r.seg, str(r.valid_from), str(r.valid_to)) for r in looped.collect()
        )


class TestBigramFluency:
    def test_word_salad_scores_below_fluent(self, spark):
        """Transitions seen often in the corpus score high; a shuffled
        bag of the same words scores low. Docs with < 2 tokens drop."""
        from etl_rj_spark.operators.text_analysis import bigram_fluency_score

        fluent = "the cat sat on the mat"
        rows = [(i, fluent) for i in range(20)]
        rows.append((100, "mat the on cat the sat"))  # same tokens, unseen transitions
        rows.append((101, "solo"))                    # one token → no output row
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in bigram_fluency_score(df, "doc_id", "text").collect()}
        assert 101 not in out
        assert out[0].n_bigrams == 5
        assert out[100].mean_cond_ppm < out[0].mean_cond_ppm
        # every replica of the fluent doc scores identically
        assert len({out[i].mean_cond_ppm for i in range(20)}) == 1
