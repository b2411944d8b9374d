"""Unit tests for as-of join edge cases the oracle query doesn't
exercise: tolerance windows, no-prior-match nulls, equal-timestamp
(<=) semantics."""

from __future__ import annotations

import datetime

import pytest

from etl_rj_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def sides(spark):
    ts = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), "L1"),
            (1, ts("2024-01-01 12:00:00"), "L2"),
            (2, ts("2024-01-01 09:00:00"), "L3"),  # before any right row
        ],
        "k int, lts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 100),  # equal ts → matches (<=)
            (1, ts("2024-01-01 11:00:00"), 200),
            (2, ts("2024-01-01 09:30:00"), 300),
        ],
        "k int, rts timestamp, v int",
    )
    return left, right


def test_asof_basic_and_equal_ts(spark, sides):
    left, right = sides
    out = {r.tag: r for r in asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts", right_values=["v"]
    ).collect()}
    assert out["L1"].asof_v == 100          # equal timestamp matches
    assert out["L2"].asof_v == 200          # latest at-or-before
    assert out["L3"].asof_v is None         # no prior right row
    assert out["L3"].asof_ts is None


def test_asof_tolerance(spark, sides):
    left, right = sides
    out = {r.tag: r for r in asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_values=["v"], tolerance_seconds=1800,
    ).collect()}
    assert out["L1"].asof_v == 100          # 0s gap: inside tolerance
    assert out["L2"].asof_v is None         # 3600s gap: outside 1800s
    assert out["L2"].asof_ts is None
