"""Temporal joins Spark lacks natively: as-of join and range join.

Both are implemented as compositions of built-in operators (SURVEY's
custom-operator preference order: composition before Pandas UDF):

- ``asof_join``: union the tagged sides, one window sort per key, pick
  the last right-side value at-or-before each left row. One shuffle on
  the key — same cost as a sort-merge join, no per-group Python.
- ``range_join_count``: bucketize the time axis so candidates meet on
  (key, bucket) equi-join instead of an inequality cross join, then
  apply the exact range predicate. Interval width = bucket width →
  each left row probes exactly 2 buckets.

At 100 TB both stay pure JVM expressions; the equi-join keys
(key, bucket) give Catalyst/AQE a hash-partitionable join instead of a
BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _epoch_us(df: DataFrame, col_name: str) -> Column:
    """Integer-microsecond epoch for a timestamp column — exact
    arithmetic for bucketing/tolerance (a float epoch ulp-flipped a
    boundary comparison in round 1). TIMESTAMP_NTZ is cast first (exact
    under the pinned UTC session tz); numeric columns are taken as
    epoch seconds."""
    dt = df.schema[col_name].dataType
    if isinstance(dt, T.TimestampNTZType):
        return F.unix_micros(F.col(col_name).cast("timestamp"))
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(F.col(col_name))
    return (F.col(col_name).cast("double") * 1_000_000).cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same ``on`` key (null columns
    when no prior right row exists). ``right`` must be unique per
    (on, right_ts) — pre-aggregate if not (ties would make the match
    engine-dependent).

    ``tolerance_seconds`` optionally nulls matches older than the
    window (pandas ``merge_asof(tolerance=...)``).
    """
    on = list(on)
    rv = list(right_values)
    l_tagged = left.withColumn("__is_left", F.lit(1)).withColumn("__ts", F.col(left_ts))
    # a right row with NULL ts has no position on the timeline: drop it
    # (NULL sorts FIRST ascending, so it would phantom-match every left
    # row earlier than all real right rows — r9 review fix)
    r_proj = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"__r_{c}") for c in rv],
    ).withColumn("__is_left", F.lit(0))
    unioned = l_tagged.unionByName(r_proj, allowMissingColumns=True)

    # right rows sort before left rows at equal ts (<= semantics)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumns(
        {
            f"__m_{c}": F.last(f"__r_{c}", ignorenulls=True).over(w)
            for c in rv
        }
        | {"__m_ts": F.last(F.when(F.col("__is_left") == 0, F.col("__ts")), ignorenulls=True).over(w)}
    )
    out = matched.filter(F.col("__is_left") == 1)
    if tolerance_seconds is not None:
        in_tol = (_epoch_us(out, "__ts") - _epoch_us(out, "__m_ts")) <= F.lit(
            int(round(tolerance_seconds * 1_000_000))
        )
        out = out.withColumns(
            {f"__m_{c}": F.when(in_tol, F.col(f"__m_{c}")) for c in rv}
            | {"__m_ts": F.when(in_tol, F.col("__m_ts"))}
        )
    keep = [c for c in left.columns]
    renames = {f"__m_{c}": f"asof_{c}" for c in rv}
    out = out.select(*keep, F.col("__m_ts").alias("asof_ts"), *[F.col(k).alias(v) for k, v in renames.items()])
    return out


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int | float,
    count_alias: str = "n_in_range",
    left_unique: bool = False,
) -> DataFrame:
    """Count right rows with ``left_ts <= right_ts < left_ts + window``
    per left row (0 when none). Exact; the bucketized equi-join is only
    a candidate filter.

    ``left_unique=True`` skips the de-duplication of the probe side —
    pass it when ``left`` carries a unique key (an event id, a primary
    key): results are identical and one full shuffle of the left side
    disappears, which matters when left is fact-table sized."""
    on = list(on)
    window_us = int(round(window_seconds * 1_000_000))
    if window_us <= 0:
        raise ValueError(f"window_seconds must be positive, got {window_seconds!r}")
    if abs(window_seconds * 1_000_000 - window_us) > 1e-6:
        raise ValueError(
            f"window_seconds={window_seconds!r} is not representable in whole "
            "microseconds — the bucket grid would drift from the predicate"
        )

    # Integer-µs bucketing with LONG floor-division (SQL `div` truncates
    # toward zero, and `/` on longs is double division — either would
    # mis-bucket a boundary candidate at extreme epochs, and the bucket
    # join is the candidate filter, so a miss is silent). floor(a/b) for
    # b>0 as exact long arithmetic: (a - pmod(a, b)) div b.
    def _floor_bucket(us_col: str) -> Column:
        return F.expr(
            f"({us_col} - pmod({us_col}, {window_us})) div {window_us}"
        )

    # probe with DISTINCT left rows: duplicate left rows would merge
    # their (identical) matches in the groupBy and each copy would
    # report the sum instead of its own per-row count — the join-back
    # below fans the correct count out to every duplicate
    uniq = left if left_unique else left.distinct()
    if left_unique:
        # ROW-GRAIN even when the uniqueness claim is violated (r11
        # dupstorm fix): group on a plan-internal row id so duplicate
        # left rows each count their OWN matches instead of merging
        # into one multiplicity×-count group. The rid appears in ONE
        # linear lineage only (LEFT-join + conditional sum below) —
        # never re-evaluated on both sides of a self-join, so
        # monotonically_increasing_id's run-to-run instability cannot
        # misassign counts.
        uniq = uniq.withColumn("__lrid", F.monotonically_increasing_id())
    l = uniq.withColumn("__lus", _epoch_us(uniq, left_ts))
    bucket_l = _floor_bucket("__lus")
    l = l.withColumn("__bucket", F.explode(F.array(bucket_l, bucket_l + 1)))
    r_proj = right.select(*on, _epoch_us(right, right_ts).alias("__rus"))
    r = r_proj.withColumn("__bucket", _floor_bucket("__rus"))

    if left_unique:
        # one LEFT join + one aggregate, NO join-back (the old fast
        # path shuffled left a third time to fan counts back out):
        # unmatched rows — including NULL join keys and NULL
        # timestamps — survive the left join and sum to 0; a real
        # match lands in exactly ONE of the row's two probe buckets,
        # so the per-rid sum across both bucket copies is the exact
        # per-row count
        in_window = (
            (F.col("__rus") >= F.col("__lus"))
            & (F.col("__rus") < F.col("__lus") + F.lit(window_us))
        )
        return (
            l.join(r, on=[*on, "__bucket"], how="left")
            .groupBy(*[F.col(c) for c in uniq.columns])
            .agg(
                F.sum(F.when(in_window, 1).otherwise(0)).alias(count_alias)
            )
            .select(
                *[F.col(c) for c in left.columns],
                F.col(count_alias),
            )
        )

    # exact predicate in the same integer-µs space as the bucket grid
    hits = (
        l.join(r, on=[*on, "__bucket"])
        .filter(
            (F.col("__rus") >= F.col("__lus"))
            & (F.col("__rus") < F.col("__lus") + F.lit(window_us))
        )
        .groupBy(*[F.col(c) for c in uniq.columns])
        .agg(F.count("*").alias(count_alias))
    )
    # NULL-SAFE join-back: distinct()/groupBy above treat NULLs as
    # equal, so the fan-out join must too — a null-unsafe `on=` would
    # silently stamp 0 on any left row holding a NULL in a non-key
    # column even when right rows fall in its window
    lt, ht = left.alias("__l"), hits.alias("__h")
    cond = None
    for c in left.columns:
        eq = lt[c].eqNullSafe(ht[c])
        cond = eq if cond is None else (cond & eq)
    return lt.join(ht, cond, "left").select(
        *[lt[c] for c in left.columns],
        F.coalesce(ht[count_alias], F.lit(0)).alias(count_alias),
    )


def linear_attribution(
    purchases: DataFrame,
    touches: DataFrame,
    user_col: str,
    purchase_id: str,
    purchase_ts: str,
    value_cents: str,
    touch_type: str,
    touch_ts: str,
    window_days: int = 7,
) -> DataFrame:
    """Multi-touch LINEAR attribution: each conversion's value splits
    equally across every touch event by the same user in the preceding
    ``window_days`` — the step past the as-of join's last-touch-only
    answer. Credit is exact integer cents with floor division
    (``cents div n_touches`` per touch; the ≤ n−1 remainder cents stay
    unattributed — documented floor semantics so every engine agrees).
    Conversions with NO in-window touch report under type ``(none)``
    with full value.

    Returns one row per touch type: ``n_touches``,
    ``n_conversions`` (distinct conversions the type participated in),
    ``attributed_cents``.

    Scale: ONE shuffle joining both sides on the user key with the
    time-range predicate applied inside the join; per-user fan-out is
    bounded by per-user activity in the window. For power-user skew,
    pre-bucket both sides by (user, day) so each conversion probes
    ``window_days + 1`` buckets — the range_join_count construction;
    this form keeps the per-conversion n_touches window on the natural
    user partitioning.
    """
    from pyspark.sql import Window

    p = purchases.select(
        F.col(user_col).alias("__u"),
        F.col(purchase_id).alias("__pid"),
        F.col(purchase_ts).alias("__pts"),
        F.col(value_cents).cast("long").alias("__cents"),
    )
    t = touches.select(
        F.col(user_col).alias("__u"),
        F.col(touch_type).alias("__ttype"),
        F.col(touch_ts).alias("__tts"),
    )
    joined = p.join(
        t,
        (p["__u"] == t["__u"])
        & (t["__tts"] <= p["__pts"])
        & (t["__tts"] > p["__pts"] - F.expr(f"INTERVAL {int(window_days)} DAYS")),
        "left",
    ).select(p["__pid"], p["__cents"], t["__ttype"], t["__tts"])
    n_w = Window.partitionBy("__pid")
    credited = joined.select(
        "__pid",
        # '(none)' is RESERVED for no-in-window-touch conversions (full
        # value); a matched touch whose type is NULL (unmapped channel)
        # reports '(unknown)' with its fractional credit — conflating
        # the two made the (none) row unreadable (r9 review fix)
        F.when(F.col("__tts").isNull(), F.lit("(none)"))
        .otherwise(F.coalesce(F.col("__ttype"), F.lit("(unknown)")))
        .alias("touch_type"),
        F.count("__tts").over(n_w).alias("__n"),
        F.col("__cents"),
    ).withColumn(
        "__credit",
        F.when(F.col("__n") == 0, F.col("__cents")).otherwise(
            F.expr("__cents div __n")
        ),
    )
    return credited.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.countDistinct("__pid").alias("n_conversions"),
        F.sum("__credit").alias("attributed_cents"),
    )


def nearest_event_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
) -> DataFrame:
    """Bidirectional as-of: for each left row, attach the temporally
    NEAREST right row in either direction within the same key — the
    join ``asof_join`` cannot express (backward-only). Ties (equidistant
    candidates) prefer the backward match, the convention pandas'
    ``merge_asof(direction='nearest')`` uses. ``right`` must be unique
    per (on, right_ts) — pre-aggregate if not.

    Composition, not a new engine primitive: ONE tagged-union shuffle
    on the key, then two window passes over the same partitioning (the
    backward last-seen and the forward mirror — the second window
    re-sorts within partitions but never re-exchanges), and an exact
    integer-microsecond gap comparison picks the winner. Adds columns
    ``nearest_<v>`` for each value, plus ``nearest_ts`` and
    ``nearest_dir`` ('back' / 'fwd', null when no candidate exists).
    """
    on = list(on)
    rv = list(right_values)
    l_tagged = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    r_proj = (
        right.select(
            *on,
            F.col(right_ts).alias("__ts"),
            *[F.col(c).alias(f"__r_{c}") for c in rv],
        )
        .withColumn("__is_left", F.lit(0))
        .withColumn("__rts", F.col("__ts"))
    )
    unioned = l_tagged.unionByName(r_proj, allowMissingColumns=True)

    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").desc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cols = {"__bts": F.last("__rts", ignorenulls=True).over(w_back),
            "__fts": F.last("__rts", ignorenulls=True).over(w_fwd)}
    for c in rv:
        cols[f"__b_{c}"] = F.last(f"__r_{c}", ignorenulls=True).over(w_back)
        cols[f"__f_{c}"] = F.last(f"__r_{c}", ignorenulls=True).over(w_fwd)
    matched = unioned.withColumns(cols).filter(F.col("__is_left") == 1)

    lus = F.unix_micros(F.col("__ts").cast("timestamp"))
    bus = F.unix_micros(F.col("__bts").cast("timestamp"))
    fus = F.unix_micros(F.col("__fts").cast("timestamp"))
    back_wins = F.col("__bts").isNotNull() & (
        F.col("__fts").isNull() | ((lus - bus) <= (fus - lus))
    )
    out_cols = [
        F.when(back_wins, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}")).alias(
            f"nearest_{c}"
        )
        for c in rv
    ]
    return matched.select(
        *left.columns,
        F.when(back_wins, F.col("__bts")).otherwise(F.col("__fts")).alias("nearest_ts"),
        *out_cols,
        F.when(back_wins, F.lit("back"))
        .when(F.col("__fts").isNotNull(), F.lit("fwd"))
        .otherwise(F.lit(None).cast("string"))
        .alias("nearest_dir"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Interval × interval OVERLAP join (``ls ≤ re AND rs ≤ le``,
    closed ends) without a BroadcastNestedLoopJoin: each interval
    explodes to the time buckets it covers, candidates meet on a
    bucket EQUI-join, duplicates from multi-bucket overlaps drop via
    DISTINCT on the pair payload, and the exact predicate filters the
    candidates. The third temporal-join shape beside ``asof_join``
    (point←point) and ``range_join_count`` (point←interval).

    ``bucket_seconds`` trades fan-out for candidate precision: an
    interval of length L explodes to ~L/bucket + 1 rows — set it near
    the TYPICAL interval length so fan-out is O(1) per row and every
    bucket meet is a near-hit. All bucket arithmetic is exact integer
    micros. Columns of both inputs are kept (name-collisions are the
    caller's to resolve); output grain is one row per overlapping
    pair — the DISTINCT that collapses multi-bucket duplicates also
    collapses fully-duplicate input rows, so feed unique-keyed
    intervals (every session/burst table has a key).
    """
    step = int(bucket_seconds) * 1_000_000

    # same exact long floor-division grid as range_join_count: double
    # division or `div` on negatives would silently mis-bucket a
    # boundary candidate, and the bucket join is the candidate filter
    def bucketed(df: DataFrame, s: str, e: str) -> DataFrame:
        tagged = df.withColumn("__s_us", _epoch_us(df, s)).withColumn(
            "__e_us", _epoch_us(df, e)
        )
        b0 = F.expr(f"(__s_us - pmod(__s_us, {step})) div {step}")
        b1 = F.expr(f"(__e_us - pmod(__e_us, {step})) div {step}")
        return tagged.withColumn(
            "__bucket", F.explode(F.sequence(b0, b1))
        ).drop("__s_us", "__e_us")

    lb = bucketed(left, left_start, left_end)
    rb = bucketed(right, right_start, right_end)
    joined = lb.join(rb, "__bucket").drop("__bucket").distinct()
    return joined.filter(
        (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
    )
