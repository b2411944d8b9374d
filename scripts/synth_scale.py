#!/usr/bin/env python3
"""Synthesize an N× scale-ladder dataset from a base sf dir.

Every relational table is replicated ``copies`` times with per-copy
key-space offsets (key += copy × 10⁷), so join fan-outs and group
sizes are PRESERVED while row counts grow N× — a 10× lineitem joins
10× orders rows at the same per-key multiplicity, which is the honest
way to grow TPC-H-shaped data without inventing new value
distributions. Dimension tables (region, nation) and the LLM tables
(documents, embeddings — their bench queries self-replicate in-query)
are copied through unchanged as the held-constant control.

Usage: python scripts/synth_scale.py <base_sf_dir> <out_dir> <copies> [--llm]
(BASELINE.md's ladder used copies=5; round-5 adds copies=10.)

``--hotkey`` (r13, VERDICT r12 #4): instead of replicating, copy the
base tree with the degenerate-sweep HOTKEY_COLS recipe applied at
FULL bench scale — each listed join/group column rewritten so the
first row's value owns ~99% of the table (every 100th row keeps its
original value as the deterministic cold tail). This is the
bench-scale twin of the correctness-only hotkey regime: the tree the
recorded skew envelope (BASELINE.md §hotkey ladder) is timed on.
``copies`` is ignored with ``--hotkey``.

``--llm`` (r12, VERDICT r11 #6): ALSO replicate documents (doc_id)
and embeddings (vec_id) with the same per-copy id offsets, so the
r9–r11 operators that read those tables (BM25 search, k-means/IVF
carry-through) get an honest N× ladder too. Text/vector payloads are
copied verbatim — postings lists, DF counts, and cell masses grow N×
at unchanged per-key shape, which is the throughput question. Do NOT
point the pair-quadratic near-dup bench rows at an ``--llm`` tree:
verbatim copies are near-dup CLIQUES, so candidate pairs grow N²,
which measures the workload change, not the engine.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_rj_spark.session import get_spark  # noqa: E402
from etl_rj_spark.sources.parquet import read_parquet_table  # noqa: E402

STEP = 10_000_000  # key-space offset per copy; >> any base key range

OFFSET_COLS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
}
PASSTHROUGH = ["region", "nation", "documents", "embeddings"]


LLM_OFFSET_COLS = {"documents": ["doc_id"], "embeddings": ["vec_id"]}


def build_hotkey(base: str, out: str) -> None:
    """Copy ``base`` to ``out`` with the hotkey rewrite (no Spark —
    one pyarrow pass per single-file table, same code shape as
    degenerate_sweep.ensure_hotkey_dataset's writer)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from degenerate_sweep import HOTKEY_COLS

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for f in sorted(os.listdir(base)):
        if not f.endswith(".parquet"):
            continue
        t = f.rsplit(".", 1)[0]
        tbl = pq.read_table(os.path.join(base, f))
        for colname in HOTKEY_COLS.get(t, []):
            i = tbl.schema.get_field_index(colname)
            col = tbl.column(i)
            vals = col.to_pylist()
            if not vals:
                continue
            hot = vals[0]
            new = [v if j % 100 == 0 else hot for j, v in enumerate(vals)]
            tbl = tbl.set_column(
                i, tbl.schema.field(colname), pa.array(new, type=col.type)
            )
        pq.write_table(tbl, os.path.join(out, f))
        print(t, "hotkey" if t in HOTKEY_COLS else "passthrough", flush=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if a not in ("--llm", "--hotkey")]
    llm = "--llm" in sys.argv[1:]
    base, out, copies = args[0], args[1], int(args[2])
    if "--hotkey" in sys.argv[1:]:
        build_hotkey(base, out)
        return
    offset_cols = dict(OFFSET_COLS)
    passthrough = list(PASSTHROUGH)
    if llm:
        offset_cols.update(LLM_OFFSET_COLS)
        passthrough = [t for t in passthrough if t not in LLM_OFFSET_COLS]
    spark = get_spark(app_name="synth-scale")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t, keys in offset_cols.items():
        df = read_parquet_table(spark, f"{base}/{t}.parquet")
        # fail fast if a base key range reaches the per-copy offset:
        # overlapping copies would silently change join fan-outs and
        # distinct counts — the very properties the ladder measures
        mx = df.agg(*[F.max(k).alias(k) for k in keys]).first()
        for k in keys:
            if mx[k] is not None and mx[k] >= STEP:
                raise SystemExit(
                    f"{t}.{k} max {mx[k]} >= STEP {STEP}: copies would "
                    "collide — raise STEP for this base scale"
                )
        parts = []
        for c in range(copies):
            p = df
            for k in keys:
                p = p.withColumn(k, F.col(k) + F.lit(c * STEP))
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(t, "x", copies, flush=True)
    for t in passthrough:
        read_parquet_table(spark, f"{base}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
        print(t, "passthrough", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
