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
