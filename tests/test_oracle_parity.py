"""The primary correctness gate, locally: every REGISTRY query with an
oracle must match DuckDB on the shared parquet tables (emulates the
driver's CORRECTNESS check at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from etl_rj_spark.analytics import REGISTRY
from tests.oracle_utils import compare_spark_duck, duck_connection

_WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = REGISTRY[name]
    df = q.build(spark, sf_dir)
    compare_spark_duck(df, duck, q.oracle)


def test_rows_only_queries_run(spark, sf_dir):
    for name, q in REGISTRY.items():
        if q.oracle is None:
            df = q.build(spark, sf_dir)
            assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0
    # every query key has a callable; oracle keys are a subset
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)


def test_no_case_colliding_oracle_aliases():
    """Registration-time guard for the r7 `prorate_order_totals` bug
    class (VERDICT r7 #1/#8): DuckDB identifiers are case-insensitive,
    so two aliases differing only by case silently collapse into one
    column. Lint every registered oracle."""
    from etl_rj_spark.analytics import REGISTRY
    from tests.oracle_utils import lint_case_colliding_aliases

    bad = {
        name: pairs
        for name, q in REGISTRY.items()
        if q.oracle and (pairs := lint_case_colliding_aliases(q.oracle))
    }
    assert not bad, f"case-colliding oracle aliases: {bad}"
