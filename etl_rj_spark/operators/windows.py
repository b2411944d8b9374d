"""Window operators W1 (SURVEY.md §2.7) + sessionization.

W1 (LAG day-over-day delta) is the one reference-cited window op
(Cartera PDF §8); sessionization is the standard gap-based pattern the
events table exercises.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_lag_delta(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    value_col: str,
    prev_name: str = "prev_value",
    delta_name: str = "delta",
) -> DataFrame:
    """W1 — ``LAG(value) OVER (PARTITION BY ... ORDER BY ...)`` plus the
    day-over-day delta (Cartera PDF §8). ``order_by`` should be a total
    order (include a unique tiebreaker) for deterministic results."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    prev = F.lag(value_col).over(w)
    return df.withColumn(prev_name, prev).withColumn(
        delta_name, F.col(value_col) - F.col(prev_name)
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids per user: a new session starts when
    the time since the previous event exceeds ``gap_seconds``.

    Two stacked windows over the same (user, ts) partitioning — one
    shuffle, both windows reuse the sort.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    # integer-microsecond epoch: exact arithmetic, so a gap of exactly
    # ``gap_seconds`` can never ulp-flip across engines (a float epoch
    # did, at the 1800 s boundary); unix_timestamp alone would truncate
    # to seconds and misclassify sub-second gaps
    epoch = F.unix_micros(F.col(ts_col))
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def global_sessionize(
    df: DataFrame,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str,
    session_col: str = "session_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Gap-based sessionization over the WHOLE stream — no group key
    (incident/burst detection: "cluster all error events closer than
    5 minutes"). Calling ``sessionize`` with a constant key puts every
    row through ONE task; this form reproduces its output — dense
    1-based session ids in (ts, tiebreak) start order, the exact
    numbering an ANSI running-sum oracle replays — with NO
    unpartitioned window (r12 window-audit fix, SCALE.md §3):

    range-partition on (ts, tiebreak); per partition, a PARTITIONED
    lag/running-sum assigns local ids and each partition's first row
    provisionally starts a session; then per-partition stats (first/
    last epoch, local session count) — one row per shuffle partition,
    configuration-bounded — feed a triangular join that computes (a)
    the id offset before each partition and (b) whether the
    partition's first session CONTINUES the previous non-empty
    partition's last session (boundary gap ≤ g: subtract 1 from the
    offset, which also collapses whole-partition chains, since a
    single-session partition that continues backward passes its
    predecessor's id forward through the same arithmetic). Offsets
    are exact, so the result is row-identical to the single-window
    form at any partition count; range boundaries only move WORK, not
    ids. Two shuffles (range + stats agg) and a broadcast join back.

    ``tiebreak_col`` is required: without a total order the running
    numbering is partition-order luck — the nondeterminism class the
    dupstorm regime exists to catch."""
    sess = df.sparkSession
    p = num_partitions or int(
        sess.conf.get("spark.sql.shuffle.partitions", "200")
    )
    g_us = int(gap_seconds) * 1_000_000
    epoch = F.unix_micros(F.col(ts_col))
    part = df.repartitionByRange(
        p, F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    ).withColumn("__pid", F.spark_partition_id()).withColumn("__e", epoch)
    lw = Window.partitionBy("__pid").orderBy(ts_col, tiebreak_col)
    gap = F.col("__e") - F.lag("__e").over(lw)
    is_new = F.when(gap.isNull() | (gap > g_us), 1).otherwise(0)
    loc = part.withColumn(
        "__lsid", F.sum(is_new).over(lw.rowsBetween(Window.unboundedPreceding, 0))
    )
    stats = loc.groupBy("__pid").agg(
        F.min("__e").alias("__first"),
        F.max("__e").alias("__last"),
        F.max("__lsid").alias("__ns"),
    )
    # pass 1 — per-partition continuation flag: the boundary gap to
    # the previous NON-EMPTY partition (max of earlier __last, which
    # is monotone across range partitions) is within the session gap
    a, b = stats.alias("a"), stats.alias("b")
    adj = (
        a.join(b, F.col("b.__pid") < F.col("a.__pid"), "left")
        .groupBy(
            F.col("a.__pid").alias("__pid"),
            F.col("a.__first").alias("__first"),
            F.col("a.__ns").alias("__ns"),
        )
        .agg(F.max("b.__last").alias("__prev_last"))
        .select(
            "__pid", "__ns",
            F.when(
                F.col("__prev_last").isNotNull()
                & (F.col("__first") - F.col("__prev_last") <= g_us),
                1,
            ).otherwise(0).alias("__adj"),
        )
    )
    # pass 2 — exact id offset per partition. A row's global id is
    #   Σ_{j<i} ns_j − Σ_{j≤i} adj_j + local_sid:
    # every continuing boundary removes exactly one session START
    # from the dense global numbering, and the CUMULATIVE subtraction
    # is what collapses chains (a single-session partition that
    # continues backward passes its predecessor's id forward).
    c, d = adj.alias("c"), adj.alias("d")
    pre = (
        c.join(d, F.col("d.__pid") < F.col("c.__pid"), "left")
        .groupBy(F.col("c.__pid").alias("__pid"), F.col("c.__adj").alias("__a"))
        .agg(
            F.coalesce(F.sum("d.__ns"), F.lit(0)).alias("__sn"),
            F.coalesce(F.sum("d.__adj"), F.lit(0)).alias("__sa"),
        )
        .select(
            "__pid",
            (F.col("__sn") - F.col("__sa") - F.col("__a")).alias("__off"),
        )
    )
    return (
        loc.join(F.broadcast(pre), "__pid")
        .withColumn(session_col, (F.col("__off") + F.col("__lsid")).cast("bigint"))
        .drop("__pid", "__e", "__lsid", "__off")
    )


def future_window_label(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    id_col: str,
    horizon_days: int,
    label_col: str = "retained",
) -> DataFrame:
    """Supervised retention/churn labels WITHOUT leakage gymnastics:
    each row is labeled 1 iff the same group has ANOTHER event within
    ``horizon_days`` after it. Because events sorted by time make "any
    future event within the horizon" equivalent to "the NEXT event
    within the horizon", one ``lead`` over the (group, ts, id) window
    suffices — no self-join against the future, no per-row range scan.

    Also emits ``gap_seconds`` to the next event (NULL for each
    group's last event; its label is 0 — the right-censoring
    convention, callers typically drop rows whose observation window
    extends past the data's end). Deterministic: the window orders by
    (ts, id); gap arithmetic is exact integer micros → seconds.

    One shuffle on the group key — the same partitioning every other
    per-entity feature wants, so at scale this rides an existing
    repartition.
    """
    w = Window.partitionBy(group_col).orderBy(F.col(ts_col), F.col(id_col))
    nxt = F.lead(ts_col).over(w)
    # integer micros → whole seconds: subtract the remainder first so
    # the double division is exact (numerator a multiple of 10⁶, well
    # under 2^53) — same trick as the range-join bucketing
    diff = F.unix_micros(nxt) - F.unix_micros(F.col(ts_col))
    gap_s = ((diff - diff % F.lit(1_000_000)) / F.lit(1_000_000)).cast("long")
    return df.select(
        "*",
        F.when(
            nxt.isNotNull()
            & (nxt <= F.col(ts_col) + F.expr(f"INTERVAL {int(horizon_days)} DAYS")),
            1,
        )
        .otherwise(0)
        .alias(label_col),
        gap_s.alias("gap_seconds"),
    )


def ranked_topk(
    df: DataFrame,
    keys: Sequence[tuple[Column | str, bool]],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Distributed top-k with a 1..k rank stamp and NO unpartitioned
    window (VERDICT r7 #2): ``orderBy(...).limit(k)`` compiles to
    ``TakeOrderedAndProject`` — every partition keeps only its own
    k-element heap and the driver merges the per-partition heaps — so
    the full input never flows through one task the way a global
    ``row_number`` window does. The rank is then stamped by packing the
    ≤k survivors (bounded by the CONSTANT k, not the data) into one
    sorted array and posexploding; the plan contains no WindowExec at
    any scale.

    ``keys``: (column, ascending) pairs forming a TOTAL order (include
    a unique tiebreaker). Restrictions inherited from the array-sort
    stamp: descending keys must be numeric (they are negated to sort
    ascending inside the struct) and key values must be non-null —
    both trivially true for score/id rankings.
    """
    order_exprs, struct_keys = [], []
    for i, (c, asc) in enumerate(keys):
        col = F.col(c) if isinstance(c, str) else c
        order_exprs.append(col.asc() if asc else col.desc())
        struct_keys.append((col if asc else (-col)).alias(f"__k{i}"))
    cols = df.columns
    top = df.orderBy(*order_exprs).limit(int(k))
    packed = top.select(
        F.struct(*struct_keys, F.struct(*cols).alias("__row")).alias("__s")
    )
    arr = packed.agg(F.sort_array(F.collect_list("__s")).alias("__a"))
    exploded = arr.select(F.posexplode("__a").alias("__i", "__s"))
    return exploded.select(
        *[F.col(f"__s.__row.{c}").alias(c) for c in cols],
        (F.col("__i") + 1).cast("int").alias(rank_col),
    )


def ntile_exact(
    df: DataFrame,
    keys: "Sequence[tuple[str, bool]]",
    k: int,
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact SQL ``ntile(k)`` over a global total order WITHOUT the
    single-partition window ntile plans to (the shape
    ``ntile_acctbal_quartiles`` documents as its non-scale demo —
    this is its scale-safe equivalent, bit-identical output).

    SQL ntile semantics — n rows into k tiles, the first ``rem = n
    mod k`` tiles one row bigger (q+1 where ``q = n div k``), bigger
    tiles packed FIRST (not spread: ``((r−1)·k) div n`` distributes
    the remainder evenly and diverges from ntile once n > k·k) — are
    the closed form over the 0-based global rank r₀:
    ``r₀ < rem·(q+1) ? r₀ div (q+1) : rem + (r₀ − rem·(q+1)) div q``
    (+1), so ntile reduces to a global row_number plus one broadcast
    scalar:
    rank via the two-phase range-bucket form (range-repartition on the
    keys, PARTITIONED local row_number, exact per-partition offsets
    from a triangular join over one stats row per shuffle partition —
    the ``global_rank_cumsum`` machinery), n broadcast back. No window
    ever runs unpartitioned; range boundaries move work, not ranks.

    ``keys``: (column, ascending) pairs forming a TOTAL order (include
    a unique tiebreaker — without one the rank is partition-order
    luck). ASC uses Spark's NULLS FIRST default, matching the
    ``NULLS FIRST`` spelling the oracles pin."""
    sess = df.sparkSession
    p = num_partitions or int(
        sess.conf.get("spark.sql.shuffle.partitions", "200")
    )
    order = [
        (F.col(c).asc() if asc else F.col(c).desc()) for c, asc in keys
    ]
    part = df.repartitionByRange(p, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    lw = Window.partitionBy("__pid").orderBy(*order)
    loc = part.withColumn("__lrk", F.row_number().over(lw))
    stats = loc.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    a, b = stats.alias("a"), stats.alias("b")
    pre = (
        a.join(b, F.col("b.__pid") < F.col("a.__pid"), "left")
        .groupBy(F.col("a.__pid").alias("__pid"))
        .agg(F.coalesce(F.sum("b.__n"), F.lit(0)).alias("__off"))
    )
    total = stats.agg(F.sum("__n").alias("__tot"))
    return (
        loc.join(F.broadcast(pre), "__pid")
        .join(F.broadcast(total))
        .withColumn(
            tile_col,
            # integer arithmetic only (a double quotient would
            # ulp-flip tile boundaries); the ELSE's q is guarded with
            # greatest(q,1) — when n < k every row sits in the WHEN
            # branch (rem = n, q = 0) but ANSI mode must never see a
            # div-by-zero even on the unevaluated side
            F.expr(
                f"""cast(CASE
                  WHEN (__off + __lrk - 1)
                       < (__tot % {int(k)}) * ((__tot div {int(k)}) + 1)
                  THEN (__off + __lrk - 1) div ((__tot div {int(k)}) + 1)
                  ELSE (__tot % {int(k)})
                       + ((__off + __lrk - 1)
                          - (__tot % {int(k)}) * ((__tot div {int(k)}) + 1))
                         div greatest(__tot div {int(k)}, 1)
                END as int) + 1"""
            ),
        )
        .drop("__pid", "__lrk", "__off", "__tot")
    )


def global_rank_cumsum(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: Sequence[str],
    rank_col: str = "rnk",
    cum_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``row_number`` + running SUM over (value DESC, tiebreaks
    ASC) computed in TWO PHASES instead of one unpartitioned window
    (VERDICT r7 #3): range-repartition on the sort key, rank/cumsum
    locally per range partition (a PARTITIONED window), then shift each
    partition by the exact count/sum of everything in the partitions
    before it. The offsets come from a triangular self-join over the
    per-partition stats frame — one row per shuffle partition, a
    configuration-bounded KB — so no window ever runs without a
    partition key and no task sees more than its range's rows.

    Output values are independent of where the (sampled) range
    boundaries fall: the offsets are exact, so the result is identical
    to the single-window form row for row. ``cum_col`` is
    decimal(38,0) (overflow-proof running sum); (value, tiebreaks)
    must be a total order for a deterministic rank.

    Stays LAZY deliberately: the per-bucket frame feeds both the stats
    aggregate and the output join, and at runtime AQE's exchange reuse
    dedupes the identical range shuffles (verified: 2 ReusedExchange
    nodes in the executed adaptive plan) so the input shuffles once —
    only the cheap bucket-local window re-evaluates. A checkpoint
    barrier here would hide the window nodes from plan audits and
    force eager execution at build time.
    """
    sess = df.sparkSession
    p = num_partitions or int(sess.conf.get("spark.sql.shuffle.partitions", "200"))
    order = [F.desc(value_col)] + [F.col(c).asc() for c in tiebreak_cols]
    part = df.repartitionByRange(p, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    lw = Window.partitionBy("__pid").orderBy(*order)
    val_dec = F.col(value_col).cast("decimal(38,0)")
    loc = part.withColumn("__lrk", F.row_number().over(lw)).withColumn(
        "__lcum",
        F.sum(val_dec).over(lw.rowsBetween(Window.unboundedPreceding, 0)),
    )
    stats = loc.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__n"), F.sum(val_dec).alias("__s")
    )
    a, b = stats.alias("a"), stats.alias("b")
    pre = (
        a.join(b, F.col("b.__pid") < F.col("a.__pid"), "left")
        .groupBy(F.col("a.__pid").alias("__pid"))
        .agg(
            F.coalesce(F.sum("b.__n"), F.lit(0)).alias("__off_n"),
            F.coalesce(
                F.sum("b.__s"), F.lit(0).cast("decimal(38,0)")
            ).alias("__off_s"),
        )
    )
    return (
        loc.join(F.broadcast(pre), "__pid")
        .withColumn(rank_col, F.col("__off_n") + F.col("__lrk"))
        .withColumn(cum_col, (F.col("__off_s") + F.col("__lcum")).cast("decimal(38,0)"))
        .drop("__pid", "__lrk", "__lcum", "__off_n", "__off_s")
    )


def transition_counts(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix of an event stream: per
    entity, LAG the state over (ts, tiebreak); count (prev, cur)
    pairs; emit the row-normalized transition probability as exact
    integer ppm ``(n·10⁶) div row_total``. Each entity's first event
    (prev NULL) is excluded — it has no transition.

    One shuffle on the entity key for the LAG, then a
    vocabulary-grain aggregate (|states|² cells). Output:
    (prev_state, state, n, p_ppm).
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    pairs = (
        df.select(
            F.lag(state_col).over(w).alias("prev_state"),
            F.col(state_col).alias("state"),
        )
        .filter(F.col("prev_state").isNotNull())
        .groupBy("prev_state", "state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_tot = pairs.groupBy("prev_state").agg(F.sum("n").alias("__rt"))
    return pairs.join(F.broadcast(row_tot), "prev_state").select(
        "prev_state", "state", "n",
        F.expr("(n * 1000000) div __rt").alias("p_ppm"),
    )


def time_weighted_mean(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_cents: Column,
    tiebreak_col: str,
) -> DataFrame:
    """Time-weighted average per key (the TSDB ``time_weight`` shape —
    e.g. TimescaleDB's locked-in LOCF average): each observation's
    value holds until the key's NEXT observation, so the mean weights
    every value by how long it was current, not by how often it was
    sampled. Exact integers end to end: timestamps become epoch
    microseconds, values arrive as an integer-cents Column, and the
    result is ``sum(cents·dur_us) div sum(dur_us)`` (floor division,
    both engines; inputs are non-negative by contract).

    The last observation per key has no successor and therefore no
    duration — it is excluded (left-closed interval semantics), and
    keys with a single observation (total duration 0) drop out rather
    than divide by zero.

    One shuffle on the key for the LEAD window, then a per-key
    aggregate on the SAME partitioning (AQE reuses the exchange) —
    nothing global, scale-safe at any key cardinality. Output:
    (key, n_intervals, total_dur_us, twap_cents).
    """
    seq = df.select(
        F.col(key_col),
        value_cents.cast("decimal(38,0)").alias("__cents"),
        F.unix_micros(F.col(ts_col)).alias("__t"),
        F.col(tiebreak_col).alias("__tb"),
    )
    w = Window.partitionBy(key_col).orderBy("__t", "__tb")
    iv = (
        seq.withColumn("__t_next", F.lead("__t").over(w))
        .filter(F.col("__t_next").isNotNull())
        .withColumn("__dur", F.col("__t_next") - F.col("__t"))
    )
    return (
        iv.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum("__dur").cast("bigint").alias("total_dur_us"),
            F.expr(
                "cast(sum(__cents * __dur) div sum(__dur) as bigint)"
            ).alias("twap_cents"),
        )
        .filter(F.col("total_dur_us") > 0)
    )
