"""Degenerate-input (empty-dataset) parity pins — the regression net
for the round-10 sweep class (`scripts/degenerate_sweep.py`): a Spark
``groupBy`` over an empty frame emits ZERO rows while an ANSI global
aggregate emits ONE all-NULL row, folds/windows over nothing return
NULL where a report needs 0, and first()-seeded operators crash.
"Empty" is a normal production state at 100 TB (a partition with no
late events, a day with no orders, a filter that matched nothing), so
every fix here pins engine == oracle on an all-empty dataset.

The full 312-query empty sweep runs out-of-band (the script); this
module pins one representative per fixed MECHANISM so a regression
fails the suite, not just the next audit.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from tests.oracle_utils import compare_spark_duck, duck_connection  # noqa: E402


@pytest.fixture(scope="module")
def empty_dir(spark):
    from degenerate_sweep import ensure_empty_dataset

    return ensure_empty_dataset(spark)


@pytest.fixture(scope="module")
def empty_con(empty_dir):
    return duck_connection(empty_dir)


#: one representative query per fixed mechanism (r10 sweep):
#: global-agg row-count parity (chi-square HAVING), ANSI-rollup
#: grand-total row (HAVING n > 0), literal-grouped contract flags
#: (theta / poisson-xxh), NULL→0 report coalescing (expectation
#: suite), vacuous recall contracts (LSH scaled), and a control that
#: was always clean (pricing_summary).
_PINS = [
    "chi_square_priority_status",
    "rollup_flag_status",
    "theta_segment_algebra",
    "poisson_bootstrap_revenue_xxh",
    "expectation_suite_orders",
    "minhash_lsh_pairs_scaled",
    "pricing_summary",
]


@pytest.mark.parametrize("name", _PINS)
def test_query_oracle_parity_on_empty_dataset(spark, empty_dir, empty_con, name):
    from etl_rj_spark.analytics import REGISTRY

    q = REGISTRY[name]
    compare_spark_duck(q.build(spark, empty_dir), empty_con, q.oracle)


@pytest.fixture(scope="module")
def single_dir(spark):
    from degenerate_sweep import ensure_single_row_dataset

    return ensure_single_row_dataset(spark)


@pytest.fixture(scope="module")
def single_con(single_dir):
    return duck_connection(single_dir)


#: one representative per n=1 mechanism (second r10 sweep regime):
#: zero-weight bootstrap replicate (nullif divisor → NULL mean, and
#: the xxh flag's vacuous-NULL contract), zero-variance correlation
#: (try_divide → NULL, DuckDB 0/0 parity), one-sided distribution
#: divergence (JS), empty population half (PSI), and the multiset
#: rank-interval form of the KLL median contract (n=1's only rank
#: is 1.0; the point form |rank − 0.5| can never pass).
_SINGLE_PINS = [
    "poisson_bootstrap_revenue",
    "poisson_bootstrap_revenue_xxh",
    "price_qty_correlation",
    "js_divergence_source_halves",
    "psi_price_drift",
    "kll_quantile_rollup",
]


@pytest.mark.parametrize("name", _SINGLE_PINS)
def test_query_oracle_parity_on_single_row_dataset(
    spark, single_dir, single_con, name
):
    from etl_rj_spark.analytics import REGISTRY

    q = REGISTRY[name]
    compare_spark_duck(q.build(spark, single_dir), single_con, q.oracle)


@pytest.fixture(scope="module")
def nullmix_dir(spark):
    from degenerate_sweep import ensure_nullmix_dataset

    return ensure_nullmix_dataset(spark)


@pytest.fixture(scope="module")
def nullmix_con(nullmix_dir):
    return duck_connection(nullmix_dir)


#: one representative per NULL-mix mechanism (third r10 sweep regime —
#: one real row + two all-NULL rows per table): window()/watermark
#: drops NULL event-times (windowed_event_counts); sketches skip NULL
#: items while GROUP BY keeps the NULL group (cms); DuckDB concat()
#: coerces NULL to '' where Spark/|| propagate (pii_scrub); Spark
#: NULLS FIRST vs SQL NULLS LAST in rank/CDF windows (ntile,
#: negative_sample); the NOT-IN three-valued-NULL trap (fuzzy);
#: NULL vectors are not clusterable points (kmeans_cells); and
#: complete-case profiling groups (kll).
_NULLMIX_PINS = [
    "windowed_event_counts",
    "cms_user_event_counts",
    "pii_scrub_docs",
    "ntile_acctbal_quartiles",
    "negative_sample_parts",
    "fuzzy_rescued_lookup",
    "kmeans_cells",
    "kll_quantile_rollup",
]


@pytest.mark.parametrize("name", _NULLMIX_PINS)
def test_query_oracle_parity_on_nullmix_dataset(
    spark, nullmix_dir, nullmix_con, name
):
    from etl_rj_spark.analytics import REGISTRY

    q = REGISTRY[name]
    compare_spark_duck(q.build(spark, nullmix_dir), nullmix_con, q.oracle)


def test_expectation_suite_empty_input_passes_every_rule(spark):
    """An empty load trivially satisfies every row-level expectation:
    0 violations, passed=1 — never NULL (a NULL report row reads as
    'unknown' and blocks a release gate that should open)."""
    from etl_rj_spark.operators.validate import expectation_suite

    df = spark.createDataFrame([], "a int, b string")
    rows = expectation_suite(
        df, {"a_not_null": F.col("a").isNotNull()}, unique_cols=["b"]
    ).collect()
    assert [(r.rule, r.n_violations, r.passed) for r in rows] == [
        ("a_not_null", 0, 1),
        ("unique(b)", 0, 1),
    ]


def test_incremental_append_empty_first_load_creates_readable_sink(spark, tmp_path):
    """K1: a first load whose batch is EMPTY still materializes a
    schema'd sink — the next read/append sees a valid empty table, not
    PATH_NOT_FOUND (a source matching nothing is a normal day)."""
    from etl_rj_spark.sinks.incremental import append_incremental

    d = str(tmp_path / "sink")
    empty = spark.createDataFrame([], "k long, v string")
    assert append_incremental(spark, empty, d, ["k"]) == 0
    back = spark.read.parquet(d)
    assert back.count() == 0 and set(back.columns) == {"k", "v"}
    # and a later real append works against the materialized empty sink
    batch = spark.createDataFrame([(1, "x")], "k long, v string")
    assert append_incremental(spark, batch, d, ["k"]) == 1


def test_snapshot_table_of_only_empty_snapshots_reads_back(spark, tmp_path):
    """K2: a snapshot table whose every append was EMPTY reads back as
    a 0-row frame with the schema preserved by the _schema sidecar —
    not UNABLE_TO_INFER_SCHEMA (partitioned writes of 0 rows land no
    files)."""
    import datetime

    from etl_rj_spark.sinks.snapshot import append_snapshot, read_latest_snapshot

    d = str(tmp_path / "snap")
    empty = spark.createDataFrame([], "k long, v string")
    append_snapshot(empty, d, snapshot_date=datetime.date(2024, 1, 1))
    back = read_latest_snapshot(spark, d)
    assert back.count() == 0
    assert set(back.columns) == {"k", "v", "fecha_carga"}


def test_stream_state_readers_serve_empty_state(spark, tmp_path):
    """The sketch maintainers' serving reads over a state table whose
    every drain was empty return 0 rows (the _schema sidecar), never
    PATH_NOT_FOUND."""
    from etl_rj_spark.streaming.fsutil import ensure_state_schema, read_state_or_schema

    d = str(tmp_path / "state")
    proto = spark.createDataFrame([], "grp string, day date, sk binary")
    ensure_state_schema(proto, d)
    back = read_state_or_schema(spark, d)
    assert back.count() == 0 and back.columns == ["grp", "day", "sk"]


def test_ivf_index_on_empty_corpus_refuses_loudly(spark, tmp_path):
    """Building an IVF index from an EMPTY corpus refuses with a
    diagnostic (k-means on zero points has no layout to train — the
    FAISS train-before-add contract), never a NoneType crash. The
    degenerate sweep records these as ``refused_by_design``."""
    from etl_rj_spark.operators.kmeans import persist_ivf_index

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    no_centroids = spark.createDataFrame([], "cid int, cv array<bigint>")
    with pytest.raises(ValueError, match="ZERO centroids"):
        persist_ivf_index(empty, no_centroids, "etl_rj_test_empty_ivf")


def test_empty_excel_sheet_lifts_as_schemad_frame(spark):
    """An empty sheet/table lifts to a 0-row Spark frame (object →
    string, int64 index → bigint) instead of
    CANNOT_INFER_EMPTY_SCHEMA."""
    import pandas as pd

    from etl_rj_spark.sources.excel_tables import _pdf_to_spark

    pdf = pd.DataFrame({"a": pd.Series(dtype="object"), "i": pd.Series(dtype="int64")})
    df = _pdf_to_spark(spark, pdf)
    assert df.count() == 0
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "bigint"]


# ---------------------------------------------------------------------------
# r11 pins: the fallback readers choose their path by EXPLICIT probe,
# never by exception-driven control flow (VERDICT r10 §wrong #1 /
# ADVICE r10). The r10 pins above prove the readers SERVE empty state
# when that is the truth; these prove they FAIL LOUDLY when it isn't.
# ---------------------------------------------------------------------------


def test_state_read_error_over_populated_table_raises(spark, tmp_path):
    """A REAL analysis error over a POPULATED state table (here: a bad
    manual write that left conflicting partition structures) must
    RAISE, not be silently served as 'empty state' via the _schema
    sidecar — at 100 TB that silent swallow turns one corrupted ledger
    directory into a sketch fold that quietly forgets all history."""
    import datetime

    from pyspark.errors import AnalysisException

    from etl_rj_spark.streaming.fsutil import ensure_state_schema, read_state_or_schema

    d = str(tmp_path / "state")
    proto = spark.createDataFrame(
        [("a", datetime.date(2024, 1, 1), bytearray(b"x"))],
        "grp string, day date, sk binary",
    )
    proto.write.partitionBy("day").parquet(d)
    ensure_state_schema(proto, d)
    # sanity: the healthy populated table reads fine
    assert read_state_or_schema(spark, d).count() == 1
    # bad manual write: a second, conflicting partition scheme
    # (Spark raises SparkRuntimeException KD009 here, not
    # AnalysisException — either way it must PROPAGATE)
    spark.createDataFrame([("b",)], "grp string").write.parquet(f"{d}/week=3")
    with pytest.raises(Exception, match="Conflicting|KD009"):
        read_state_or_schema(spark, d).collect()

    # the AnalysisException class the OLD except-driven fallback
    # swallowed: a state dir whose only VISIBLE entry is a fileless
    # partition directory (a bad manual write / interrupted delete)
    # next to a _schema sidecar. The explicit probe says 'visible
    # entries = materialized table', so the read's real
    # UNABLE_TO_INFER_SCHEMA surfaces — the anomaly is flagged, not
    # silently served as healthy empty state.
    d2 = str(tmp_path / "state2")
    proto.write.partitionBy("day").parquet(d2)
    ensure_state_schema(proto, d2)
    for day_dir in os.listdir(d2):
        if day_dir.startswith("day="):
            for f in os.listdir(os.path.join(d2, day_dir)):
                os.remove(os.path.join(d2, day_dir, f))
    with pytest.raises(AnalysisException):
        read_state_or_schema(spark, d2).collect()


def test_state_read_never_written_path_raises_original(spark, tmp_path):
    """A never-written state path propagates PATH_NOT_FOUND naming the
    ORIGINAL path — not a misleading secondary error about a _schema
    sidecar that also doesn't exist (ADVICE r10)."""
    from pyspark.errors import AnalysisException

    from etl_rj_spark.streaming.fsutil import read_state_or_schema

    missing = str(tmp_path / "never_written")
    with pytest.raises(AnalysisException) as ei:
        read_state_or_schema(spark, missing).collect()
    assert "never_written" in str(ei.value)
    assert "_schema" not in str(ei.value)


def test_latest_snapshot_read_error_over_populated_table_raises(spark, tmp_path):
    """read_latest_snapshot over a populated-but-broken snapshot table
    raises instead of serving the empty sidecar (ADVICE r10 medium: the
    old bare `except Exception` silently served an empty snapshot for
    ANY read failure — corrupt footer, permissions, transient FS)."""
    import datetime

    from etl_rj_spark.sinks.snapshot import append_snapshot, read_latest_snapshot

    d = str(tmp_path / "snap")
    one = spark.createDataFrame([(1, "x")], "k long, v string")
    append_snapshot(one, d, snapshot_date=datetime.date(2024, 1, 1))
    assert read_latest_snapshot(spark, d).count() == 1
    # bad manual write: conflicting partition scheme next to fecha_carga=
    spark.createDataFrame([(2,)], "k long").write.parquet(f"{d}/other=1")
    with pytest.raises(Exception, match="Conflicting|KD009"):
        read_latest_snapshot(spark, d).collect()


def test_orc_read_never_written_path_raises_original(spark, tmp_path):
    """read_orc on a never-written path raises naming the ORIGINAL
    path — non-partitioned ORC tables have no sidecar at all, so the
    old AnalysisException retry produced a misleading secondary error
    about `{path}/_schema` (ADVICE r10)."""
    from pyspark.errors import AnalysisException

    from etl_rj_spark.sources.columnar import read_orc

    missing = str(tmp_path / "no_orc_here")
    with pytest.raises(AnalysisException) as ei:
        read_orc(spark, missing).collect()
    assert "no_orc_here" in str(ei.value)
    assert "_schema" not in str(ei.value)


def test_snapshot_schema_sidecar_written_once(spark, tmp_path):
    """append_snapshot writes the _schema sidecar only at FIRST append:
    re-overwriting it every append costs an extra Spark job per
    snapshot and opens a last-writer-wins window during which the
    sidecar is momentarily absent — exactly when a concurrent fallback
    reader would need it (ADVICE r10)."""
    import datetime

    from etl_rj_spark.sinks.snapshot import append_snapshot

    d = str(tmp_path / "snap")
    one = spark.createDataFrame([(1, "x")], "k long, v string")
    append_snapshot(one, d, snapshot_date=datetime.date(2024, 1, 1))
    sidecar = os.path.join(d, "_schema")
    first_files = sorted(os.listdir(sidecar))
    append_snapshot(one, d, snapshot_date=datetime.date(2024, 1, 2))
    # an overwrite would have landed NEW random part-file names
    assert sorted(os.listdir(sidecar)) == first_files


def test_snapshot_sidecar_ignores_nested_nullability(spark, tmp_path):
    """ADVICE r12: the sidecar drift check must normalize NESTED
    nullability too — a parquet round-trip relaxes
    ArrayType.containsNull / inner struct flags, so a table with a
    non-null-element array column would otherwise be flagged as drift
    and rewrite the sidecar on EVERY append, reintroducing the
    per-append job and absence window the write-once skip avoids."""
    import datetime

    from etl_rj_spark.sinks.snapshot import append_snapshot

    d = str(tmp_path / "snap_arr")
    # F.array(lit, lit) infers containsNull=False; struct(lit) infers
    # non-null inner field — both relax to nullable on read-back
    batch = spark.createDataFrame([(1,)], "k long").select(
        "k",
        F.array(F.lit(1), F.lit(2)).alias("arr"),
        F.struct(F.lit("x").alias("s")).alias("st"),
    )
    assert not batch.schema["arr"].dataType.containsNull  # fixture sanity
    append_snapshot(batch, d, snapshot_date=datetime.date(2024, 1, 1))
    sidecar = os.path.join(d, "_schema")
    first_files = sorted(os.listdir(sidecar))
    append_snapshot(batch, d, snapshot_date=datetime.date(2024, 1, 2))
    assert sorted(os.listdir(sidecar)) == first_files
    # a REAL type change must still be detected as drift
    from etl_rj_spark.sinks.snapshot import _sidecar_needs_write

    drifted = batch.withColumn("arr", F.array(F.lit("a")))
    assert _sidecar_needs_write(drifted, sidecar)


def test_integrity_violation_assert_narrows_the_rollback_proof():
    """The K1 poison-batch rollback proofs accept ONLY a duplicate-key
    / cardinality violation; any other failure re-raises so the proof
    can't pass vacuously (VERDICT r10 #4 — a staging-write or
    connection failure also leaves the poison keys absent)."""
    from etl_rj_spark.analytics.coverage_suite import _assert_integrity_violation

    _assert_integrity_violation(
        Exception(
            "The statement was aborted because it would have caused a "
            "duplicate key value in a unique or primary key constraint"
        )
    )
    _assert_integrity_violation(Exception("ERROR 23505: ..."))
    # integrity SQLSTATEs are matched as SQLSTATEs, never bare numeric
    # substrings (ADVICE r12 for 21000, ADVICE r13 for 23505): a row
    # count / offset / port that merely mentions either number must
    # NOT pass the proof
    _assert_integrity_violation(Exception("... SQLSTATE: 21000 ..."))
    _assert_integrity_violation(Exception("error with state 21000: merge cardinality"))
    _assert_integrity_violation(Exception("... SQLSTATE: 23505 ..."))
    with pytest.raises(Exception, match="connection refused"):
        _assert_integrity_violation(Exception("java.net.ConnectException: connection refused"))
    with pytest.raises(Exception, match="offset"):
        _assert_integrity_violation(Exception("failed reading block at offset 21000"))
    with pytest.raises(Exception, match="21000 rows"):
        _assert_integrity_violation(Exception("analysis error: scanned 21000 rows"))
    with pytest.raises(Exception, match="23505 rows"):
        _assert_integrity_violation(Exception("analysis error: scanned 23505 rows"))
    with pytest.raises(Exception, match="offset 23505"):
        _assert_integrity_violation(Exception("failed reading block at offset 23505"))


# ---------------------------------------------------------------------------
# r11 pins: DUPSTORM-regime contracts (every row a verbatim triplicate —
# the re-ingested-shard shape). One representative per mechanism; the
# full-registry probe is scripts/degenerate_sweep.py --regime dupstorm.
# ---------------------------------------------------------------------------


def test_jaccard_pairs_distinct_under_duplicated_ids(spark):
    """_jaccard_on_sets' distinct-pairs contract: verbatim-duplicated
    corpus rows collapse to ONE (id_a, id_b, jaccard) row instead of
    fanning the verify join out multiplicity²."""
    from etl_rj_spark.operators.text_dedup import ngram_jaccard_pairs

    rows = [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")]
    corpus = spark.createDataFrame(rows * 3, "doc_id long, text string")
    out = ngram_jaccard_pairs(corpus, "doc_id", "text", threshold=0.5, n=3).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in out] == [(1, 2, 1.0)]


def test_kmeans_assign_row_grain_and_carry(spark):
    """kmeans_assign emits ONE row per input row (duplicated ids
    included) and carries payload through the map-side argmin — no
    join-back, no fanout."""
    from etl_rj_spark.operators.kmeans import kmeans_assign, kmeans_fit
    from etl_rj_spark.operators.similarity import vec_double

    rows = [(7, [1.0, 0.0]), (8, [0.0, 1.0])]
    e = spark.createDataFrame(rows * 3, "vec_id long, embedding array<double>")
    cents = kmeans_fit(e, k=2, iters=1)
    out = kmeans_assign(
        e, cents, carry={"__v": vec_double("embedding")}
    ).collect()
    assert len(out) == 6  # row grain: 3 copies each of 2 ids
    assert {r.vec_id for r in out} == {7, 8}
    # verbatim copies of one id share one cell, and the payload rode through
    by_id = {}
    for r in out:
        by_id.setdefault(r.vec_id, set()).add(r.cell)
        assert r["__v"] is not None
    assert all(len(cells) == 1 for cells in by_id.values())


def test_semdedup_duplicated_ids_no_fanout(spark):
    """SemDeDup under verbatim-duplicated ids: copies of one id share
    its fate (same-id rows never block each other), and the survivor
    frame is row-grain — 3 copies in, 3 survivor rows out, never 9."""
    from etl_rj_spark.operators.kmeans import kmeans_fit
    from etl_rj_spark.operators.similarity import semdedup

    rows = [(1, [1.0, 0.0, 0.0])]
    corpus = spark.createDataFrame(rows * 3, "vec_id long, embedding array<double>")
    cents = kmeans_fit(corpus, k=1, iters=1)
    out = semdedup(corpus, cents, threshold=0.99).collect()
    assert len(out) == 3
    assert {r.vec_id for r in out} == {1}


def test_lsh_topk_ranks_over_distinct_candidates(spark):
    """Top-k ranks are over DISTINCT (query, id, score) results: a
    corpus row duplicated by a re-ingested shard occupies ONE of the k
    slots, not several."""
    from etl_rj_spark.operators.similarity import lsh_topk

    c_rows = [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0])]
    corpus = spark.createDataFrame(c_rows * 3, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = lsh_topk(corpus, queries, k=10, dim=4, bits=2, tables=4).collect()
    got = {(r.query_id, r.vec_id) for r in out}
    assert len(out) == len(got), "duplicate corpus rows occupied extra slots"


def test_range_join_count_left_unique_row_grain_counts(spark):
    """range_join_count(left_unique=True) under a VIOLATED uniqueness
    claim: each duplicated left row counts its OWN matches (m), never
    the merged multiplicity×m — the failure the dupstorm regime's
    0-match data couldn't reach, pinned here with real matches."""
    import datetime

    from etl_rj_spark.operators.asof import range_join_count

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    errors = spark.createDataFrame(
        [(10, "u1", t0)] * 3, "event_id long, user_id string, ts timestamp"
    )
    clicks = spark.createDataFrame(
        [("u1", t0 + datetime.timedelta(minutes=m)) for m in (1, 2)],
        "user_id string, ts timestamp",
    )
    out = range_join_count(
        errors, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        window_seconds=3600, count_alias="n", left_unique=True,
    ).collect()
    assert [r.n for r in out] == [2, 2, 2]


def test_bm25_row_grain_document_model(spark):
    """BM25's corpus model is ROW-grain: a corpus with one doc
    duplicated 3× scores exactly like a corpus of 3 distinct docs with
    the same text (same N, df, tf, dl per row) — the old id-keyed
    grouping merged tf across copies while N counted them apart."""
    from etl_rj_spark.operators.search import bm25_search_topk

    text = "spark window hash spark filler words here"
    dup = spark.createDataFrame([(5, text)] * 3, "doc_id long, text string")
    distinct_ids = spark.createDataFrame(
        [(5, text), (6, text), (7, text)], "doc_id long, text string"
    )
    s_dup = sorted(r.score for r in bm25_search_topk(dup, ("spark", "window", "hash")).collect())
    s_dis = sorted(r.score for r in bm25_search_topk(distinct_ids, ("spark", "window", "hash")).collect())
    assert len(s_dup) == 3 and s_dup == s_dis


def test_topk_serve_over_empty_state_emits_zero_rows(spark, tmp_path):
    """Serving the frequent-items maintainer over an EMPTY state table
    (a stream that has seen no items yet) returns ZERO rows — never
    the ApproxTopKCombine scala.MatchError a GLOBAL combine over zero
    sketches raises (r11; the fingerprint-keyed cache rebuild exposed
    this as a stale-twin mask over the r10 empty sweep)."""
    from etl_rj_spark.streaming.fsutil import ensure_state_schema
    from etl_rj_spark.streaming.sketches import estimate_topk_partials

    d = str(tmp_path / "topk_state")
    proto = spark.range(0).selectExpr(
        "CAST(NULL AS DATE) AS day",
        "approx_top_k_accumulate(CAST(NULL AS STRING), 16) AS st",
        "CAST(array() AS ARRAY<LONG>) AS batch_ids",
    )
    ensure_state_schema(proto, d)
    assert estimate_topk_partials(spark, d, k=8, max_items=16).count() == 0


def test_quarantine_fixture_queries_rebuild_clean(spark, sf_dir):
    """r13 finding: the quarantine split caches its scan, so a fixture
    query that REWRITES its scratch path and re-reads it in the same
    session was silently served the stale cached relation (the xml
    roundtrip's corrupt row vanished on rebuild — bad.count()==1
    failed only when built twice, which is exactly what the full
    pytest run does: oracle parity builds it, then the plan audit
    rebuilds it). Each such query now refreshByPath's after the
    rewrite; this pins the double-build for the whole class."""
    from etl_rj_spark.analytics import REGISTRY

    for name in (
        "xml_feed_roundtrip",
        "jsonl_docs_roundtrip",
        "jsonl_shard_export",
        "jsonl_corrupt_quarantine",
        "csv_corrupt_quarantine",
    ):
        REGISTRY[name].build(spark, sf_dir).count()
        REGISTRY[name].build(spark, sf_dir).count()  # in-query asserts re-run
