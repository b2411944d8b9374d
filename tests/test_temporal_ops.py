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


def test_range_join_fractional_window_and_negative_epoch(spark):
    """Bucketing must be exact LONG floor-division: fractional windows
    round to whole µs, and pre-1970 (negative-epoch) timestamps floor
    toward -inf — `div`-style truncation would mis-bucket them."""
    from etl_rj_spark.operators.asof import range_join_count

    ts = datetime.datetime.fromisoformat
    left = spark.createDataFrame(
        [(1, ts("1969-12-31 23:59:59.800")), (1, ts("2024-01-01 00:00:00"))],
        "k int, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, ts("1969-12-31 23:59:59.900")),  # inside 0.5s of the 1969 row
            (1, ts("1970-01-01 00:00:00.400")),  # outside it
            (1, ts("2024-01-01 00:00:00.499")),  # inside 0.5s of the 2024 row
            (1, ts("2024-01-01 00:00:00.500")),  # exactly at upper bound: out
        ],
        "k int, rts timestamp",
    )
    out = {
        r.lts: r.n_in_range
        for r in range_join_count(left, right, ["k"], "lts", "rts", 0.5).collect()
    }
    assert out[ts("1969-12-31 23:59:59.800")] == 1
    assert out[ts("2024-01-01 00:00:00")] == 1

    with pytest.raises(ValueError, match="positive"):
        range_join_count(left, right, ["k"], "lts", "rts", 0)
    with pytest.raises(ValueError, match="microseconds"):
        range_join_count(left, right, ["k"], "lts", "rts", 1.5e-6)

    # fully duplicate left rows: each copy gets ITS OWN count, not the
    # merged sum across copies
    dup_left = left.unionByName(left.limit(2))
    rows = range_join_count(dup_left, right, ["k"], "lts", "rts", 0.5).collect()
    assert len(rows) == 4
    assert all(r.n_in_range == 1 for r in rows)


def test_range_join_null_nonkey_column(spark):
    """A NULL in a non-key left column must not zero the count: the
    probe's distinct/groupBy treat NULLs as equal, so the fan-out
    join-back must be null-safe too."""
    from etl_rj_spark.operators.asof import range_join_count

    ts = datetime.datetime.fromisoformat
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 00:00:00"), None), (1, ts("2024-01-01 00:00:00"), "x")],
        "k int, lts timestamp, note string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 00:00:10")), (1, ts("2024-01-01 00:00:20"))],
        "k int, rts timestamp",
    )
    out = range_join_count(left, right, ["k"], "lts", "rts", 60)
    got = {r.note: r.n_in_range for r in out.collect()}
    assert got == {None: 2, "x": 2}


def test_global_sessionize_identical_to_single_window(spark):
    """r12 window-audit fix: the two-phase global sessionize must be
    ROW-IDENTICAL to the constant-key single-window form at every
    partition count — including a session spanning many range
    partitions (the chain-collapse case: each continuing boundary
    subtracts one session start from the dense numbering,
    cumulatively)."""
    import datetime

    from pyspark.sql import functions as F

    from etl_rj_spark.operators.windows import global_sessionize, sessionize

    rows, t, i = [], datetime.datetime(2024, 1, 1), 0
    for _ in range(10):  # 10 bursts of 3 events, 400 s apart
        for _ in range(3):
            rows.append((i, t)); i += 1; t += datetime.timedelta(seconds=10)
        t += datetime.timedelta(seconds=400)
    for _ in range(30):  # one long session spanning many partitions
        rows.append((i, t)); i += 1; t += datetime.timedelta(seconds=10)
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    base = sessionize(
        df.withColumn("__g", F.lit(0)), "__g", "ts", 300, tiebreak_col="event_id"
    )
    expect = {r.event_id: r.session_id for r in base.collect()}
    assert max(expect.values()) == 11
    for p in (1, 2, 5, 13):
        got = {
            r.event_id: r.session_id
            for r in global_sessionize(
                df, "ts", 300, "event_id", num_partitions=p
            ).collect()
        }
        assert got == expect, p
    # empty input drains to an empty frame with the session column
    empty = spark.createDataFrame([], "event_id long, ts timestamp")
    out = global_sessionize(empty, "ts", 300, "event_id")
    assert out.count() == 0 and "session_id" in out.columns


def test_ntile_exact_matches_window_ntile(spark):
    """r12: ntile_exact must reproduce SQL ntile's pack-bigger-tiles-
    first semantics bit-for-bit at every (n, k, partition-count) shape
    — including NULL keys (NULLS FIRST) and n < k (one-row tiles)."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_rj_spark.operators.windows import ntile_exact

    random.seed(7)
    rows = [
        (i, random.choice([None] + list(range(50))) if i % 9 else None)
        for i in range(257)
    ]
    df = spark.createDataFrame(rows, "id long, v int")
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    for k in (3, 10, 300):
        exp = {r.id: r.t for r in df.withColumn("t", F.ntile(k).over(w)).collect()}
        for p in (1, 3, 11):
            got = {
                r.id: r.tile
                for r in ntile_exact(
                    df, [("v", True), ("id", True)], k, num_partitions=p
                ).collect()
            }
            assert got == exp, (k, p)
