"""JSONL shard export — the write twin of ``sources/jsonl.py``: a
curated corpus leaves the engine as size-bounded, optionally
compressed ``.jsonl`` shards that downstream tokenizer/loader workers
consume one-per-task.

Shard sizing is the scale decision: readers of compressed shards get
one task per file (gzip is non-splittable), so the WRITER must bound
shard size — ``max_records_per_file`` caps rows per shard and
``num_shards`` sets a floor on shard count via repartition. Rows can
optionally be routed round-robin by a hash of a key column so re-runs
produce identical shard membership (deterministic, unlike Spark's
default task-split assignment under AQE coalescing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    num_shards: int | None = None,
    max_records_per_file: int | None = None,
    compression: str | None = None,
    shard_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as JSONL shards.

    ``shard_by``: deterministic shard assignment — rows are routed by
    ``xxhash64(key) % num_shards`` (stable across re-runs and
    partitionings), so incremental consumers can diff shard-by-shard.
    Without it, ``repartition(num_shards)`` balances by round-robin.
    """
    out = df
    if shard_by is not None:
        if not num_shards:
            raise ValueError("shard_by requires num_shards")
        shard = F.pmod(F.xxhash64(F.col(shard_by)), F.lit(num_shards))
        # Route each xxhash bucket to ITS OWN output partition. A bare
        # repartition(n, "__shard") applies the hash-partitioner's
        # murmur3 to the bucket id, which is NOT a bijection on
        # {0..n-1}: two buckets routinely share one part file while
        # others come out empty, breaking the one-bucket-per-shard-file
        # contract. The partitioner's exact function is
        # pmod(murmur3_hash(cols), n) (= F.hash), so find for every
        # bucket b a representative long v_b with pmod(hash(v_b), n)
        # == b and repartition on v_b — the partition index then
        # EQUALS the xxhash bucket.
        spark = df.sparkSession
        reps: dict[int, int] = {}
        lo = 0
        while len(reps) < num_shards:
            for r in (
                spark.range(lo, lo + 64 * num_shards)
                .select("id", F.pmod(F.hash("id"), F.lit(num_shards)).alias("b"))
                .collect()
            ):
                reps.setdefault(r.b, r.id)
            lo += 64 * num_shards
            if lo > 1_000_000 * num_shards:  # pragma: no cover - guard
                raise RuntimeError("could not find shard representatives")
        from itertools import chain

        mapping = F.create_map(
            *[F.lit(x) for x in chain.from_iterable(reps.items())]
        )
        out = (
            out.withColumn("__shard", shard)
            # cast matters: the representatives were probed as LONGs
            # (spark.range) and murmur3 differs by physical width — an
            # int-typed route would hash differently and re-break the
            # bijection
            .withColumn("__route", mapping[F.col("__shard")].cast("long"))
            .repartition(num_shards, "__route")
            .drop("__shard", "__route")
        )
    elif num_shards:
        out = out.repartition(num_shards)
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
