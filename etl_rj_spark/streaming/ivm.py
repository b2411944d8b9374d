"""Incremental view maintenance (IVM) of a two-sided equi-join.

Every other maintainer in the taxonomy holds ADDITIVE state (sketches,
pair counts, moments) — fold in a batch, merge by algebra. A JOIN view
is different: it is BILINEAR in its inputs, so the delta of the view
under insert-only deltas ΔA, ΔB is the classic DBSP / differential-
dataflow product rule:

    ΔV  =  ΔA ⋈ B_new  ∪  A_old ⋈ ΔB
        (= ΔA ⋈ B_old ∪ A_old ⋈ ΔB ∪ ΔA ⋈ ΔB — the three-term form)

Each matched pair is produced EXACTLY once across all folds: a pair
(a, b) with a arriving in batch i and b in batch j materializes in
fold max(i, j) and no other — the disjointness that makes the
maintained view equal the from-scratch join without deduplication.

State layout — a SIXTH point in the maintenance taxonomy, the
append-only ledgered log: unlike the snapshot-versioned Markov state
(`transitions.py`, whole-state rewrite per fold), a join view only
GROWS under insert-only deltas, so each fold appends three
batch-partitioned directories (``a/batch=<id>``, ``b/batch=<id>``,
``view/batch=<id>``) and publishes them with a per-batch commit
marker written LAST. Serving unions only committed batch dirs; a
crash mid-fold leaves uncommitted partials that the deterministic
retry overwrites in place; redelivery of a committed id is a no-op
(K1 posture, same as `sources/manifest.py`). Nothing is ever
rewritten — per-fold write cost is O(|ΔA| + |ΔB| + |ΔV|), not
O(|state|).

100 TB posture: the accumulated logs are the big side and the deltas
are small — each fold's two joins are delta-vs-log, so the delta side
broadcasts (or, with logs written bucketed by the join key, the fold
is a bucket-local probe with no log-side shuffle). The view log is
append-only parquet partitioned by batch — compaction is the same
snapshot-retention pass the IVF index and moments ledger document.

The JOIN maintainer's contract is insert-only; deletes/updates take
weighted (z-set) deltas, which `fold_agg_delta`/`serve_agg_view`
below implement for the GROUP BY side of the algebra (weight −1
retracts; a fully retracted group disappears at serve time).
`operators/scd.py:cdc_apply_log` covers keyed upsert semantics.

Single writer per state root (foreachBatch's sequential guarantee).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _committed(spark: SparkSession, root: str, ledger: str) -> list[int]:
    # scheme-aware: FileSystem.get(conf) would resolve the DEFAULT
    # filesystem and throw 'Wrong FS' on an s3a:// state root
    from etl_rj_spark.streaming.fsutil import committed_batch_ids

    return committed_batch_ids(spark, f"{root}/{ledger}")


def committed_batches(spark: SparkSession, root: str) -> list[int]:
    """Sorted batch ids whose commit marker exists (metadata-only)."""
    return _committed(spark, root, "ledger")


def _read_log(
    spark: SparkSession, root: str, side: str, ids: list[int], schema
) -> DataFrame:
    if not ids:
        return spark.createDataFrame([], schema)
    paths = [f"{root}/{side}/batch={i}" for i in ids]
    return spark.read.schema(schema).parquet(*paths)


def join_delta_view(
    da: DataFrame,
    db: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    key_a: str,
    key_b: str,
) -> DataFrame:
    """The product-rule delta ΔV = ΔA ⋈ B_new ∪ A_old ⋈ ΔB as a lazy
    plan — factored out of :func:`fold_join_delta` so its physical
    shape is pinnable (tests/test_plans.py): both joins are
    delta-vs-log, and because the deltas are micro-batch-sized (and
    localCheckpointed, so their size statistics are exact) Spark
    broadcasts the delta side against the accumulated log — no
    log-side shuffle at any state size. A backfill-sized delta falls
    back to a shuffle join by the same statistics, which is the right
    call there too."""
    b_new = b_old.unionByName(db)
    return da.join(b_new, F.col(key_a) == F.col(key_b)).unionByName(
        a_old.join(db, F.col(key_a) == F.col(key_b))
    )


def fold_join_delta(
    delta_a: DataFrame,
    delta_b: DataFrame,
    batch_id: int,
    root: str,
    key_a: str,
    key_b: str,
) -> None:
    """Fold one pair of insert-only deltas into the maintained join
    view. ΔV = ΔA ⋈ B_new ∪ A_old ⋈ ΔB; appends ΔA, ΔB and ΔV under
    ``batch=<id>`` and commits the id LAST. Redelivering a committed
    id is a no-op; a retried half-written fold overwrites its own
    deterministic output. Column names must be disjoint across the
    two sides (standard star-schema hygiene)."""
    spark = delta_a.sparkSession
    done = committed_batches(spark, root)
    if int(batch_id) in done:
        return  # redelivery of a committed fold
    a_old = _read_log(spark, root, "a", done, delta_a.schema)
    b_old = _read_log(spark, root, "b", done, delta_b.schema)

    da = delta_a.localCheckpoint()
    db = delta_b.localCheckpoint()
    dv = join_delta_view(da, db, a_old, b_old, key_a, key_b)

    vdir = f"batch={int(batch_id)}"
    da.write.mode("overwrite").parquet(f"{root}/a/{vdir}")
    db.write.mode("overwrite").parquet(f"{root}/b/{vdir}")
    dv.write.mode("overwrite").parquet(f"{root}/view/{vdir}")
    # commit marker LAST: the batch exists only once all three logs
    # are fully written
    spark.createDataFrame([(int(batch_id),)], "batch_id long").write.mode(
        "overwrite"
    ).parquet(f"{root}/ledger/{vdir}")


def serve_join_view(spark: SparkSession, root: str, schema) -> DataFrame:
    """Serving read of the maintained view: union of committed view
    batch dirs (uncommitted partials invisible by construction)."""
    return _read_log(spark, root, "view", committed_batches(spark, root), schema)


def fold_agg_delta(
    delta: DataFrame,
    batch_id: int,
    root: str,
    key_cols: list[str],
    weight_col: str,
    value_col: str,
) -> None:
    """Fold one WEIGHTED (z-set) delta batch into a maintained
    GROUP BY aggregate — the retraction-capable complement to the
    insert-only join maintainer above: each delta row carries an
    integer weight (+1 insert, −1 retract), and the maintained state
    per key is the pair (Σw, Σw·value), which is ADDITIVE in deltas —
    deletes are just negative weight, no tombstone bookkeeping.

    Same append-only ledgered log as the join view: each fold writes
    ONLY its per-key partial aggregate of the delta (O(|Δ| distinct
    keys), nothing rewrites) under ``agg/batch=<id>`` and commits the
    id LAST into the shared ledger-dir namespace (``aggledger``).
    Serving merges committed partials and drops keys whose net weight
    reached zero — a fully retracted group DISAPPEARS, exactly as the
    from-scratch aggregate would have it. Periodic compaction of old
    partials into one is the same snapshot-retention pass documented
    for the moments ledger."""
    spark = delta.sparkSession
    done = _committed(spark, root, "aggledger")
    if int(batch_id) in done:
        return
    # cast BEFORE the product/sum: w·value in native int64 silently
    # wraps on overflow (non-ANSI) — the exact z-set claim needs the
    # whole accumulation in decimal(38,0) (same rule as moments.py)
    part = delta.groupBy(*key_cols).agg(
        F.sum(F.col(weight_col)).cast("bigint").alias("__w"),
        F.sum(F.col(weight_col).cast("decimal(38,0)") * F.col(value_col))
        .cast("decimal(38,0)").alias("__s"),
    )
    vdir = f"batch={int(batch_id)}"
    part.write.mode("overwrite").parquet(f"{root}/agg/{vdir}")
    spark.createDataFrame([(int(batch_id),)], "batch_id long").write.mode(
        "overwrite"
    ).parquet(f"{root}/aggledger/{vdir}")


def serve_agg_view(
    spark: SparkSession, root: str, key_cols: list[str], schema
) -> DataFrame:
    """Merge committed per-batch partials into the current aggregate:
    (keys, n = Σw, total = Σw·value), keys with net weight 0 dropped.
    The served ``total`` is int64 by CONTRACT (values are cents-scale;
    a per-key net total near 9.2·10¹⁸ is out of contract) — the
    accumulation itself is decimal(38,0), so the ledger never wraps
    even when intermediate partials are huge; under ANSI mode an
    out-of-contract serve fails loudly at this cast."""
    ids = _committed(spark, root, "aggledger")
    log = _read_log(spark, root, "agg", ids, schema)
    return (
        log.groupBy(*key_cols)
        .agg(
            F.sum("__w").cast("bigint").alias("n"),
            F.sum("__s").cast("decimal(38,0)").alias("__t"),
        )
        .filter(F.col("n") != 0)
        .withColumn("total", F.col("__t").cast("bigint"))
        .drop("__t")
    )
