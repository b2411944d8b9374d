"""Oracle-checked queries for the temporal-join and skew operators.

DuckDB has native ASOF JOIN and unconstrained inequality joins, so the
oracles state the *semantics* directly while the Spark side proves the
scalable composition (union+window as-of; bucketized range join)
computes exactly the same thing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_rj_spark.analytics.suite import _msum, _q, _t
from etl_rj_spark.operators.asof import asof_join, range_join_count
from etl_rj_spark.operators.aggregates import money_sum
from etl_rj_spark.operators.skew import salted_join


@_q(
    "asof_purchase_last_view",
    """
    WITH v AS (SELECT user_id, ts, MAX(event_id) AS view_event_id
               FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.ts,
           v.ts AS asof_ts, v.view_event_id AS asof_view_event_id
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    bench=True,
    tags=("asof-join",),
)
def asof_purchase_last_view(spark, sf_dir):
    """As-of join: for each purchase, the user's most recent view at or
    before it (null when none). Spark side: tagged union + one window
    sort per user — no per-group Python, one shuffle."""
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    return asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts",
        right_values=["view_event_id"],
    )


@_q(
    "range_join_error_clicks",
    """
    -- rid: ROW-grain probe counts — the engine's left_unique fast path
    -- emits one output row per left INPUT ROW, so duplicated event_ids
    -- (a re-ingested shard) stay separate rows instead of collapsing
    -- into one group (r11 dupstorm parity; no-op on unique event_ids)
    WITH e AS (SELECT row_number() OVER () AS rid, event_id, user_id, ts
               FROM events WHERE event_type = 'error'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT e.event_id, e.user_id, e.ts, COUNT(c.ts) AS n_clicks
    FROM e LEFT JOIN c
      ON c.user_id = e.user_id AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 3600 SECOND
    GROUP BY e.rid, 1, 2, 3
    """,
    bench=True,
    tags=("range-join",),
)
def range_join_error_clicks(spark, sf_dir):
    """Range join: clicks within 1 hour after each error, counted per
    error. Spark side: time-bucketized equi-join (each left row probes
    2 buckets) + exact range filter — no BroadcastNestedLoopJoin."""
    e = _t(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    return range_join_count(
        errors, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        window_seconds=3600, count_alias="n_clicks",
        left_unique=True,  # event_id is unique — skip the probe dedup shuffle
    )


@_q(
    "salted_customer_rollup",
    f"""
    SELECT c_name AS nombre_cliente, COUNT(*) AS n_orders,
           {_msum('o_totalprice', 'total')}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_name
    """,
    tags=("skew", "J1"),
)
def salted_customer_rollup(spark, sf_dir):
    """Skew-mitigated join: fact side salted into 8 buckets, dimension
    replicated per bucket — results provably identical to the plain
    join (the oracle IS the plain join)."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = salted_join(o, c, on="c_custkey", salt=8)
    return joined.groupBy(F.col("c_name").alias("nombre_cliente")).agg(
        F.count("*").alias("n_orders"), money_sum("o_totalprice").alias("total")
    )


@_q(
    "snapshot_diff_orders",
    """
    WITH old AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_custkey % 5 <> 0
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_custkey % 3 <> 0
    )
    SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'added'
                WHEN new.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           COALESCE(new.o_totalprice, old.o_totalprice) AS o_totalprice,
           COALESCE(new.o_orderstatus, old.o_orderstatus) AS o_orderstatus
    FROM old FULL OUTER JOIN new USING (o_orderkey)
    WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
       OR old.o_totalprice <> new.o_totalprice
       OR old.o_orderstatus <> new.o_orderstatus
    """,
    tags=("cdc-snapshot-diff",),
)
def snapshot_diff_orders(spark, sf_dir):
    """CDC between two synthesized order snapshots: keys present only
    in one side → added/removed; shared keys with a perturbed price →
    changed; unchanged rows suppressed. The +10.0 is exact in double,
    so the changed-set is engine-stable."""
    from etl_rj_spark.operators.scd import snapshot_diff

    o = _t(spark, sf_dir, "orders")
    old = o.filter(F.col("o_custkey") % 5 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new = o.filter(F.col("o_custkey") % 3 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 10.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    return snapshot_diff(old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"])


@_q(
    "incremental_trend_merge",
    """
    SELECT CAST(o_orderdate AS DATE) AS fecha,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents,
           COUNT(*) AS n
    FROM orders
    -- MV state is keyed by date: a NULL date routes to NEITHER the
    -- stored-state nor the delta partition (r10 nullmix parity)
    WHERE o_orderdate IS NOT NULL
    GROUP BY 1
    """,
    tags=("incremental-agg",),
)
def incremental_trend_merge(spark, sf_dir):
    """Incremental materialized-view maintenance: the stored partial
    state (orders before 1996-01-01) merged with a delta batch (the
    rest) must equal the full-history aggregation — additive integer
    state (cents + counts), so the merge is order-independent."""
    from etl_rj_spark.operators.aggregates import merge_partial_sums

    o = _t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("fecha"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cut = F.lit("1996-01-01").cast("date")

    def partials(df):
        return df.groupBy("fecha").agg(
            F.sum("cents").alias("total_cents"), F.count("*").alias("n")
        )

    state = partials(o.filter(F.col("fecha") < cut))
    delta = partials(o.filter(F.col("fecha") >= cut))
    return merge_partial_sums(state, delta, ["fecha"], ["total_cents", "n"])


@_q(
    "date_spine_gap_fill",
    """
    WITH spine AS (
      SELECT CAST(d.d AS DATE) AS dia
      FROM generate_series(DATE '1996-01-01', DATE '1996-03-31', INTERVAL 1 DAY) AS d(d)
    ),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS dia, COUNT(*) AS n_orders,
             SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))/100.0 AS revenue
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s.dia, COALESCE(d.n_orders, 0) AS n_orders,
           COALESCE(d.revenue, 0.0) AS revenue,
           d.n_orders IS NULL AS is_gap
    FROM spine s LEFT JOIN daily d ON s.dia = d.dia
    ORDER BY s.dia
    """,
    tags=("temporal", "gap-fill", "date-spine"),
)
def date_spine_gap_fill(spark, sf_dir):
    """Gap-filled daily series: a generated date spine left-joined to
    the observed daily aggregate, so missing days appear as explicit
    zeros (the shape every downstream window/trend query needs — a LAG
    over a gappy series silently compares non-adjacent days). The spine
    is sequence()+explode — generated, never collected. Scale note:
    after the daily pre-aggregation BOTH join sides are bounded by the
    calendar range, not the data volume, so the outer join broadcasts
    its build side regardless of table size (a left-side broadcast
    hint on the preserved side would be ignored — the planner picks
    the agg side)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    daily = o.groupBy(F.to_date("o_orderdate").alias("dia")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("revenue"),
    )
    spine = _t(spark, sf_dir, "orders").sparkSession.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("date"),
                F.lit("1996-03-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("dia")
    )
    return (
        spine.join(daily, "dia", "left")
        .select(
            "dia",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.col("n_orders").isNull().alias("is_gap"),
        )
        .orderBy("dia")
    )


@_q(
    "funnel_conversion",
    """
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_viewed,
           CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_purchase > first_view
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_after_view
    FROM per_user
    """,
    tags=("temporal", "funnel", "A3"),
)
def funnel_conversion(spark, sf_dir):
    """View→purchase funnel: users whose first purchase followed their
    first view. One conditional-MIN aggregation per user (no join, no
    window) then one global rollup — the two-shuffle funnel shape that
    scales linearly; NULL first_purchase compares false in both
    engines, so non-purchasers fall out of the conversion count
    without explicit handling."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("first_view").isNotNull(), 1).otherwise(0)).alias("n_viewed"),
        F.sum(
            F.when(
                F.col("first_view").isNotNull()
                & (F.col("first_purchase") > F.col("first_view")),
                1,
            ).otherwise(0)
        ).alias("n_converted_after_view"),
    )


@_q(
    "cohort_retention",
    """
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
    ),
    cohorts AS (
      SELECT user_id, first_day - CAST((dayofweek(first_day) + 6) % 7 AS INTEGER) AS cohort_week
      FROM firsts
    )
    SELECT c.cohort_week,
           CAST((CAST(ts AS DATE)
                 - CAST((dayofweek(CAST(ts AS DATE)) + 6) % 7 AS INTEGER)
                 - c.cohort_week) // 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN cohorts c USING (user_id)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("cohort", "retention", "A3-generalized"),
)
def cohort_retention(spark, sf_dir):
    """Cohort retention: users grouped by the Monday-aligned week of
    their first event; each cell counts distinct users from that
    cohort active k weeks later — the standard product-analytics
    retention triangle. Week alignment is explicit date arithmetic
    (Monday epoch), identical in both engines, never locale-dependent
    WEEK() parsing.

    Scale: the first-touch table is one map-side-combinable MIN per
    user; the join back is on user_id (dim-sized vs the fact — Spark
    broadcasts when it fits); the triangle itself is a plain grouped
    COUNT DISTINCT. No window over the raw stream."""
    ev = _t(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    # Monday-aligned week start: day - ((dow + 6) % 7); Spark dayofweek
    # is 1=Sunday..7=Saturday, same as DuckDB's dayofweek()+1 shift —
    # both sides spell the shift out so the alignment is identical.
    week = F.date_sub(day, ((F.dayofweek(day) + 5) % 7).cast("int"))
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("first_day"))
    cohorts = firsts.select(
        "user_id",
        F.date_sub(
            "first_day", ((F.dayofweek("first_day") + 5) % 7).cast("int")
        ).alias("cohort_week"),
    )
    return (
        ev.select("user_id", week.alias("event_week"))
        .join(cohorts, "user_id")
        .select(
            "cohort_week",
            (F.datediff("event_week", "cohort_week") / 7).cast("long").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@_q(
    "event_type_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           CAST((n * 1000000) // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
             AS prob_ppm
    FROM pairs ORDER BY prev_type, next_type
    """,
    tags=("markov", "transitions", "W1-generalized"),
)
def event_type_transitions(spark, sf_dir):
    """First-order Markov transition matrix of event types per user
    stream (LAG over (user, ts) — the W1 window generalized), with
    integer row-normalized probabilities (ppm, exact div).

    Scale: one shuffle for the per-user window, then the pair counts
    are vocabulary-sized (|types|²) — the row-normalizing window runs
    over a tiny frame. The per-user partitions are user-activity
    bounded, the same posture sessionization already pins."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id", "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrow = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type", "next_type", "n",
        F.expr("(n * CAST(1000000 AS BIGINT)) div sum(n) OVER (PARTITION BY prev_type)")
        .cast("long").alias("prob_ppm"),
    ).orderBy("prev_type", "next_type")


@_q(
    "gap_fill_interpolate",
    """
    WITH spine AS (
      SELECT CAST(d.d AS DATE) AS dia
      FROM generate_series(DATE '1996-01-01', DATE '1996-03-31', INTERVAL 1 DAY) AS d(d)
    ),
    daily AS (
      SELECT CAST(o_orderdate AS DATE) AS dia,
             SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))/100.0 AS revenue
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        AND dayofmonth(o_orderdate) % 5 <> 0
      GROUP BY 1
    ),
    series AS (
      SELECT s.dia, d.revenue,
             last_value(d.revenue IGNORE NULLS) OVER
               (ORDER BY s.dia ROWS UNBOUNDED PRECEDING) AS prev_v,
             last_value(CASE WHEN d.revenue IS NOT NULL THEN s.dia END IGNORE NULLS)
               OVER (ORDER BY s.dia ROWS UNBOUNDED PRECEDING) AS prev_d,
             first_value(d.revenue IGNORE NULLS) OVER
               (ORDER BY s.dia ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
             first_value(CASE WHEN d.revenue IS NOT NULL THEN s.dia END IGNORE NULLS)
               OVER (ORDER BY s.dia ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
      FROM spine s LEFT JOIN daily d ON s.dia = d.dia
    )
    SELECT dia, revenue IS NOT NULL AS observed,
           CASE
             WHEN revenue IS NOT NULL THEN revenue
             WHEN prev_v IS NULL THEN next_v
             WHEN next_v IS NULL THEN prev_v
             ELSE prev_v + (next_v - prev_v) *
                  (CAST(dia - prev_d AS DOUBLE) / CAST(next_d - prev_d AS DOUBLE))
           END AS filled_revenue
    FROM series ORDER BY dia
    """,
    tags=("temporal", "gap-fill", "interpolation"),
)
def gap_fill_interpolate(spark, sf_dir):
    """Linear interpolation over series gaps (time-series imputation):
    every 5th calendar day is withheld from the daily revenue series,
    then reconstructed from its nearest observed neighbors (LOCF /
    NOCB at the edges). The interpolation is a SINGLE fixed-order
    IEEE-double expression per row — +, −, ×, ÷ are correctly rounded,
    so identical operands give bit-identical results on both engines
    (the determinism rule: only reduction ORDER is engine-dependent,
    and the only reduction here is the integer-cents daily SUM).

    Scale: one window over the spine (calendar-sized, thousands of
    rows per series — partition by series id for many series); the
    daily aggregate below it is the usual map-side-combinable SUM."""
    ord_ = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    spine = spark.sql(
        "SELECT explode(sequence(DATE '1996-01-01', DATE '1996-03-31')) AS dia"
    )
    daily = (
        ord_.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            & (F.dayofmonth("o_orderdate") % 5 != 0)
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("dia"))
        .agg(money_sum(F.col("o_totalprice")).alias("revenue"))
    )
    wp = Window.orderBy("dia").rowsBetween(Window.unboundedPreceding, 0)
    wf = Window.orderBy("dia").rowsBetween(0, Window.unboundedFollowing)
    obs_day = F.when(F.col("revenue").isNotNull(), F.col("dia"))
    series = (
        spine.join(daily, "dia", "left")
        .select(
            "dia", "revenue",
            F.last("revenue", ignorenulls=True).over(wp).alias("prev_v"),
            F.last(obs_day, ignorenulls=True).over(wp).alias("prev_d"),
            F.first("revenue", ignorenulls=True).over(wf).alias("next_v"),
            F.first(obs_day, ignorenulls=True).over(wf).alias("next_d"),
        )
    )
    ratio = F.datediff("dia", "prev_d").cast("double") / F.datediff(
        "next_d", "prev_d"
    ).cast("double")
    return series.select(
        "dia",
        F.col("revenue").isNotNull().alias("observed"),
        F.when(F.col("revenue").isNotNull(), F.col("revenue"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * ratio
        )
        .alias("filled_revenue"),
    ).orderBy("dia")


@_q(
    "pit_dimension_enrich",
    """
    WITH hist AS (
      SELECT user_id % 50 AS dim_key, 'tier_A' AS tier,
             TIMESTAMP '1970-01-01' AS valid_from,
             TIMESTAMP '2024-01-15' AS valid_to
      FROM (SELECT DISTINCT user_id % 50 AS user_id FROM events)
      UNION ALL
      SELECT user_id % 50, 'tier_B',
             TIMESTAMP '2024-01-15', NULL
      FROM (SELECT DISTINCT user_id % 50 AS user_id FROM events)
    )
    SELECT tier, COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e
    JOIN hist h
      ON e.user_id % 50 = h.dim_key
     AND e.ts >= h.valid_from
     AND (h.valid_to IS NULL OR e.ts < h.valid_to)
    GROUP BY tier ORDER BY tier
    """,
    tags=("scd2", "point-in-time", "temporal-join"),
)
def pit_dimension_enrich(spark, sf_dir):
    """Point-in-time dimension enrichment: each event joins the SCD2
    history row VALID AT ITS TIMESTAMP (valid_from ≤ ts < valid_to) —
    the lookup that makes historical reporting correct where a plain
    current-dim join silently rewrites history. The in-query history
    gives every dim key two eras split at 2024-01-15, so both interval
    arms are exercised (including the open valid_to IS NULL row).

    Scale: history is dim-sized → broadcast, so the interval predicate
    evaluates map-side with zero extra shuffle (the plan is a
    BroadcastNestedLoop-free broadcast hash join on dim_key with the
    interval as residual). A fact-sized history would switch to the
    bucketized interval strategy range_join_error_clicks pins."""
    ev = _t(spark, sf_dir, "events")
    key = (F.col("user_id") % 50).alias("dim_key")
    keys = ev.select(key).distinct()
    split = F.lit("2024-01-15").cast("timestamp")
    epoch0 = F.lit("1970-01-01").cast("timestamp")
    hist = keys.select(
        "dim_key", F.lit("tier_A").alias("tier"),
        epoch0.alias("valid_from"), split.alias("valid_to"),
    ).unionByName(
        keys.select(
            "dim_key", F.lit("tier_B").alias("tier"),
            split.alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
        )
    )
    j = ev.join(
        F.broadcast(hist),
        ((F.col("user_id") % 50) == F.col("dim_key"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    )
    return (
        j.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("tier")
    )


@_q(
    "top_event_type_per_user",
    """
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS val_c
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, event_type AS top_type, n AS top_n
    FROM counts
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY n DESC, val_c DESC, event_type DESC) = 1
    ORDER BY user_id
    """,
    tags=("A3-generalized", "argmax", "max_by"),
)
def top_event_type_per_user(spark, sf_dir):
    """Per-user dominant event type via the argmax aggregate —
    ``max_by`` (Spark) / ``arg_max`` (DuckDB). Bare max_by is
    NONDETERMINISTIC on count ties, so the ordering key is the full
    (n, integer-cents value, event_type) struct: ties fall through to
    exact integer value and finally the type name — deterministic on
    any engine/partitioning. (MAX(n) is the winner's count because n
    leads the ordering struct.)"""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("val_c"),
    )
    return (
        counts.groupBy("user_id")
        .agg(
            F.max_by(
                "event_type", F.struct("n", "val_c", "event_type")
            ).alias("top_type"),
            F.max("n").alias("top_n"),
        )
        .orderBy("user_id")
    )


@_q(
    "purchase_attribution_linear",
    """
    WITH p AS (
      SELECT event_id, user_id, ts, CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), t AS (
      SELECT user_id, event_type, ts FROM events
      WHERE event_type IN ('click', 'view')
    ), j AS (
      SELECT p.event_id, p.cents, t.event_type, t.ts AS tts
      FROM p LEFT JOIN t ON t.user_id = p.user_id
        AND t.ts <= p.ts AND t.ts > p.ts - INTERVAL 7 DAYS
    ), c AS (
      SELECT event_id, coalesce(event_type, '(none)') AS touch_type, cents,
             COUNT(tts) OVER (PARTITION BY event_id) AS n
      FROM j
    )
    SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_conversions,
           CAST(SUM(CASE WHEN n = 0 THEN cents ELSE cents // n END) AS BIGINT)
             AS attributed_cents
    FROM c GROUP BY touch_type ORDER BY touch_type
    """,
    tags=("attribution", "range-join", "W1-generalized"),
)
def purchase_attribution_linear(spark, sf_dir):
    """Multi-touch linear attribution: every purchase's value (exact
    integer cents) splits equally over the user's click/view touches in
    the preceding 7 days; floor division leaves remainder cents
    unattributed by documented contract, and untouched purchases report
    under '(none)'. The step past `asof_purchase_last_view`'s
    last-touch-only credit — same per-user join geometry, plus the
    per-conversion touch-count window on the partitioning the join
    already established."""
    from etl_rj_spark.operators.asof import linear_attribution

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    touches = e.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "event_type", "ts"
    )
    return linear_attribution(
        purchases, touches,
        user_col="user_id", purchase_id="event_id", purchase_ts="ts",
        value_cents="cents", touch_type="event_type", touch_ts="ts",
        window_days=7,
    ).orderBy("touch_type")


@_q(
    "cusum_changepoint_revenue",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders
      -- a time series has no NULL period (r10 nullmix parity)
      WHERE o_orderdate IS NOT NULL
      GROUP BY 1
    ),
    tot AS (SELECT COUNT(*) AS n, SUM(cents::HUGEINT) AS s FROM daily),
    c AS (
      SELECT day, cents,
             SUM(n * cents::HUGEINT - s) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
      FROM daily CROSS JOIN tot
    )
    SELECT day, cents, CAST(cusum AS BIGINT) AS cusum_scaled,
           abs(cusum) = MAX(abs(cusum)) OVER () AS is_changepoint
    FROM c ORDER BY day
    """,
    tags=("changepoint", "cusum", "W1-generalized"),
)
def cusum_changepoint_revenue(spark, sf_dir):
    """CUSUM mean-shift screen over daily order revenue: n-scaled
    integer deviations (no division, no float), running sum, and the
    |max| day flagged as the binary-segmentation changepoint candidate.
    The facts reduce to day grain in the one corpus-sized aggregate;
    both ordered windows run over days."""
    from etl_rj_spark.operators.stats import cusum_changepoint

    # complete-case: a time series has no NULL period (see oracle, r10)
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate").isNotNull())
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    return cusum_changepoint(daily, "day", "cents").orderBy("day")


@_q(
    "event_debounce_weekly",
    """
    WITH lagged AS (
      SELECT event_id, user_id, event_type, ts,
             LAG(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT event_id, user_id, event_type, ts
    FROM lagged
    WHERE prev_ts IS NULL OR ts > prev_ts + INTERVAL 7 DAYS
    ORDER BY event_id
    """,
    tags=("debounce", "dedup-temporal", "W1-generalized"),
)
def event_debounce_weekly(spark, sf_dir):
    """Gap debounce: keep an event only when it arrives more than 7
    days after the PREVIOUS raw event of the same (user, type) — the
    temporal dedup that collapses repeat signals into one per burst
    window (first event of each burst survives; LAG-gap formulation,
    deterministic tie-break on event_id). One shuffle on the
    (user, type) key. The hysteresis variant (gap measured from the
    previous KEPT event) needs sequential state — that lives in
    streaming/stateful.py's applyInPandasWithState tier; this is the
    window-expressible form."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    lagged = e.select(
        "event_id", "user_id", "event_type", "ts",
        F.lag("ts").over(w).alias("__prev"),
    )
    return (
        lagged.filter(
            F.col("__prev").isNull()
            | (F.col("ts") > F.col("__prev") + F.expr("INTERVAL 7 DAYS"))
        )
        .select("event_id", "user_id", "event_type", "ts")
        .orderBy("event_id")
    )


@_q(
    "nearest_view_to_purchase",
    """
    WITH v AS (SELECT user_id, ts, MAX(event_id) AS vid
               FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         b AS (SELECT p.event_id, v.ts AS bts, v.vid AS bvid
               FROM p ASOF LEFT JOIN v
                 ON p.user_id = v.user_id AND p.ts >= v.ts),
         f AS (SELECT p.event_id, v.ts AS fts, v.vid AS fvid
               FROM p ASOF LEFT JOIN v
                 ON p.user_id = v.user_id AND p.ts <= v.ts)
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN bts IS NOT NULL AND (fts IS NULL OR
                     epoch_us(p.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(p.ts))
                THEN bts ELSE fts END AS nearest_ts,
           CASE WHEN bts IS NOT NULL AND (fts IS NULL OR
                     epoch_us(p.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(p.ts))
                THEN bvid ELSE fvid END AS nearest_view_event_id,
           CASE WHEN bts IS NOT NULL AND (fts IS NULL OR
                     epoch_us(p.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(p.ts))
                THEN 'back'
                WHEN fts IS NOT NULL THEN 'fwd' END AS nearest_dir
    FROM p JOIN b USING (event_id) JOIN f USING (event_id)
    """,
    tags=("asof-join", "nearest", "bidirectional"),
)
def nearest_view_to_purchase(spark, sf_dir):
    """Bidirectional as-of: for each purchase, the user's temporally
    NEAREST view in either direction (equidistant → backward, the
    pandas merge_asof(direction='nearest') convention) — what the
    backward-only `asof_purchase_last_view` cannot answer for
    purchases preceded by nothing. One tagged-union shuffle, two
    window passes on the same partitioning, exact integer-microsecond
    gap comparison."""
    from etl_rj_spark.operators.asof import nearest_event_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    out = nearest_event_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts",
        right_values=["view_event_id"],
    )
    return out.select(
        "event_id", "user_id", "ts", "nearest_ts",
        F.col("nearest_view_event_id").alias("nearest_view_event_id"),
        "nearest_dir",
    )


@_q(
    "session_path_topk",
    """
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      -- sessions need a user and a timestamp (r10 nullmix parity;
      -- mirrors the engine filter)
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM o
    ), p AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM s GROUP BY 1, 2
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM p GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20
    """,
    tags=("path-analysis", "sessionization", "W1-generalized"),
)
def session_path_topk(spark, sf_dir):
    """Top-20 session paths: the ordered event-type sequence of every
    30-min-gap session, counted across users — the behavioral-flow
    report funnel analytics starts from. The path string is built by
    sorting each session's collected (ts, event_id, type) structs —
    array_sort on the already-grouped rows, deterministic where a bare
    collect_list is not — so the only shuffles are the session key and
    the final small path count."""
    from etl_rj_spark.operators.windows import sessionize

    # complete-case: sessions need a user and a timestamp (see oracle)
    e = (
        _t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    )
    s = sessionize(e, "user_id", "ts", 1800, tiebreak_col="event_id")
    paths = s.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


@_q(
    "ohlc_daily_value",
    """
    WITH e AS (
      SELECT CAST(ts AS DATE) AS day, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ), r AS (
      SELECT day, cents,
             row_number() OVER (PARTITION BY day ORDER BY ts, event_id) AS rf,
             row_number() OVER (PARTITION BY day ORDER BY ts DESC, event_id DESC) AS rl
      FROM e
    )
    SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(CASE WHEN rf = 1 THEN cents END) AS BIGINT) AS open_cents,
           MAX(cents) AS high_cents, MIN(cents) AS low_cents,
           CAST(MAX(CASE WHEN rl = 1 THEN cents END) AS BIGINT) AS close_cents
    FROM r GROUP BY day ORDER BY day
    """,
    tags=("ohlc", "m4-downsample", "W1-generalized"),
)
def ohlc_daily_value(spark, sf_dir):
    """OHLC / M4 downsampling: per day the first, max, min, and last
    event value (exact cents; first/last tie-broken by event_id) — the
    canonical time-series reduction that preserves a chart's visual
    extremes at any zoom level, and the bar shape every financial
    rollup starts from. One window pass per direction on the day
    partitioning the aggregate needs anyway; at scale the bucket is
    whatever the zoom requires (minute/hour/day) — same plan."""
    from pyspark.sql import Window

    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.col("ts").cast("date").alias("day"), "ts", "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    wf = Window.partitionBy("day").orderBy("ts", "event_id")
    wl = Window.partitionBy("day").orderBy(F.desc("ts"), F.desc("event_id"))
    r = e.select(
        "day", "cents",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wl).alias("rl"),
    )
    return (
        r.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.when(F.col("rf") == 1, F.col("cents"))).alias("open_cents"),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.max(F.when(F.col("rl") == 1, F.col("cents"))).alias("close_cents"),
        )
        .orderBy("day")
    )


@_q(
    "rolling_7day_active_users",
    """
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
         days AS (SELECT DISTINCT day FROM du)
    SELECT d.day, CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS wau
    FROM days d JOIN du
      ON du.day <= d.day AND du.day > d.day - 7
    GROUP BY d.day ORDER BY d.day
    """,
    tags=("active-users", "rolling-distinct", "W1-generalized"),
)
def rolling_7day_active_users(spark, sf_dir):
    """Trailing-7-day active users per day (WAU) — rolling DISTINCT,
    which no window frame can partial-aggregate: facts dedup to
    (day, user) pairs first (the one corpus-sized, map-side-combinable
    step), then each report day joins its ≤7 trailing day-slices of
    that deduped table. The 7× fan-out is the honest cost of exact
    rolling distinct; swap the distinct-count for HLL partials
    (streaming/sketches.py) when approximate WAU is acceptable and the
    fan-out is not."""
    e = _t(spark, sf_dir, "events")
    du = e.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    days = du.select("day").distinct().withColumnRenamed("day", "d")
    return (
        days.join(
            du,
            (F.col("day") <= F.col("d")) & (F.col("day") > F.date_sub(F.col("d"), 7)),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(F.col("d").alias("day"), "wau")
        .orderBy("day")
    )


@_q(
    "trending_event_types",
    """
    WITH dt AS (
      SELECT CAST(ts AS DATE) AS day, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), spine AS (SELECT DISTINCT day FROM dt),
    rolled AS (
      SELECT s.day, dt.event_type, CAST(SUM(dt.n) AS BIGINT) AS n7
      FROM spine s JOIN dt ON dt.day <= s.day AND dt.day > s.day - 7
      GROUP BY 1, 2
    )
    SELECT day, event_type, n7,
           CAST(row_number() OVER (PARTITION BY day ORDER BY n7 DESC, event_type)
                AS BIGINT) AS rnk
    FROM rolled QUALIFY rnk <= 3 ORDER BY day, rnk
    """,
    tags=("trending", "rolling-topk", "W1-generalized"),
)
def trending_event_types(spark, sf_dir):
    """Trending leaderboard: top-3 event types per day by trailing-7-
    day volume. Facts reduce to (day, type) counts first, the rolling
    sum joins each report day to its ≤7 trailing slices of that
    day-grain table, and the rank window runs per day over ≤|types|
    rows — every post-reduction step is dimension-sized."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    dt = e.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    spine = dt.select("day").distinct().withColumnRenamed("day", "d")
    rolled = (
        spine.join(
            dt,
            (F.col("day") <= F.col("d")) & (F.col("day") > F.date_sub(F.col("d"), 7)),
        )
        .groupBy("d", "event_type")
        .agg(F.sum("n").alias("n7"))
    )
    w = Window.partitionBy("d").orderBy(F.desc("n7"), "event_type")
    return (
        rolled.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select(F.col("d").alias("day"), "event_type", "n7", "rnk")
        .orderBy("day", "rnk")
    )
