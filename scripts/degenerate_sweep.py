#!/usr/bin/env python3
"""Degenerate-input parity sweep: run every registered query against an
ALL-EMPTY dataset (each of the ten tables with its real schema and zero
rows) and compare the engine against its DuckDB oracle.

Why this exists: empty/degenerate input is the one regime the per-round
correctness gate never samples, and it is where the engine and an
ANSI-SQL oracle structurally disagree — a Spark ``groupBy`` over an
empty frame emits ZERO rows while a SQL global aggregate emits ONE
all-NULL row (the ADVICE-r9 chi-square finding, generalized), windows
over nothing differ from folds over nothing, and ``first()``-style
seeds return None. At 100 TB "empty" happens constantly in practice: a
partition with no late events, a day with no orders, a source whose
filter matched nothing — so a divergence here is a real production bug,
not a test curiosity.

For each query: build on the empty dir, collect, run the oracle on
empty views, and compare with the SAME canonicalization the driver
uses (tests/oracle_utils.py). Statuses:
  ok          — full match (usually 0 == 0 rows, or matching 1-row reports)
  rows_only   — no oracle registered; engine ran without error
  refused_by_design — raised the documented refusal (EXPECTED_REFUSAL:
                the IVF index builders, which need a non-empty
                training corpus exactly like FAISS train-before-add)
  DIVERGES    — both engines ran; row count / schema / values differ
  ENGINE_ERR  — the Spark build raised on empty input
  ORACLE_ERR  — the DuckDB oracle raised on empty input

Usage:
  python scripts/degenerate_sweep.py [--regime empty|single|nullmix]
                                     [--out out.json] [name ...]

Regimes: ``empty`` (default) — every table with its real schema and
ZERO rows; ``single`` — every table exactly ONE row (first row of
sf0.001, FK integrity deliberately not preserved), which probes the
n=1 classes empty input can't reach: zero variance, one-class
categoricals, one-element windows/folds, partnerless joins;
``nullmix`` — one real row plus two ALL-NULL rows per table (keys
included), which probes NULL keys/values coexisting with real data
through every join, group, parse, and aggregate.

The empty dataset is synthesized under /tmp/sf_empty from the sf0.001
schemas (limit 0) and reused across runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from pyspark.sql import SparkSession  # noqa: E402

from oracle_utils import TABLES, compare_spark_duck, duck_connection  # noqa: E402

BASE = "/root/testdata/sf0.001"
EMPTY = "/tmp/sf_empty"

#: Queries whose correct behavior on an EMPTY dataset is a LOUD
#: REFUSAL, not a 0-row result: building an IVF index requires a
#: trained cell layout, and k-means on zero points has nothing to
#: train on (the same contract FAISS has — train() before add()).
#: Each entry maps query name → required substring of the refusal
#: message; a matching raise records as ``refused_by_design`` (green),
#: anything else stays ENGINE_ERR (red).
EXPECTED_REFUSAL = {
    "ann_ivf_index_probe": "ZERO centroids",
    "ann_ivf_index_append_probe": "ZERO centroids",
    "stream_ivf_maintenance": "ZERO centroids",
    # K1 sink contract (SURVEY §4): a NULL dedup key cannot
    # fingerprint — the sink refuses with "normalize keys first"
    # rather than silently treating NULL as a value (nullmix regime)
    "incremental_anti_join": "null dedup key",
}


def ensure_empty_dataset(spark: SparkSession) -> str:
    marker = os.path.join(EMPTY, "_built")
    if os.path.exists(marker):
        return EMPTY
    os.makedirs(EMPTY, exist_ok=True)
    # single-FILE parquet per table (pyarrow), zero rows, exact base
    # schema — both duck_connection and the engine's readers expect the
    # testdata layout (one file, not a Spark part-file directory), and
    # the pyarrow rewrite preserves even the events table's
    # TIMESTAMP(NANOS) physical type so the empty twin exercises the
    # same nanosAsLong scan path as the real data
    import pyarrow.parquet as pq

    for t in TABLES:
        schema = pq.read_schema(f"{BASE}/{t}.parquet")
        pq.write_table(schema.empty_table(), f"{EMPTY}/{t}.parquet")
    with open(marker, "w") as f:
        f.write("ok")
    return EMPTY


SINGLE = "/tmp/sf_single"


def ensure_single_row_dataset(spark: SparkSession) -> str:
    """The second degenerate regime: every table exactly ONE row (the
    first row of the sf0.001 table). Probes the failure classes empty
    input can't reach — zero variance/denominator with n=1, one-class
    categoricals, one-element windows/folds, self-joins that find no
    partner — while both engines still see IDENTICAL data, so any
    divergence is structural, not data luck. FK integrity across
    tables is deliberately NOT preserved (a lineitem row whose order
    is missing is itself a real degenerate state: joins must emit
    empty, not error)."""
    marker = os.path.join(SINGLE, "_built")
    if os.path.exists(marker):
        return SINGLE
    os.makedirs(SINGLE, exist_ok=True)
    import pyarrow.parquet as pq

    for t in TABLES:
        tbl = pq.read_table(f"{BASE}/{t}.parquet")
        pq.write_table(tbl.slice(0, 1), f"{SINGLE}/{t}.parquet")
    with open(marker, "w") as f:
        f.write("ok")
    return SINGLE


NULLMIX = "/tmp/sf_nullmix"


def ensure_nullmix_dataset(spark: SparkSession) -> str:
    """The third degenerate regime: every table = its FIRST real row
    plus two ALL-NULL rows (every column NULL, keys included). Probes
    NULL keys and NULL values COEXISTING with real data through every
    join (NULL never equi-matches), group (NULL is its own group in
    both engines), kernel parse, and aggregate — the shape of a dirty
    100 TB corpus, where a null-ridden shard rides next to clean data
    in the same scan. Both engines see identical rows, so any
    divergence is structural."""
    marker = os.path.join(NULLMIX, "_built")
    if os.path.exists(marker):
        return NULLMIX
    os.makedirs(NULLMIX, exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    for t in TABLES:
        tbl = pq.read_table(f"{BASE}/{t}.parquet")
        nulls = pa.table(
            {f.name: pa.nulls(2, f.type) for f in tbl.schema},
            schema=tbl.schema,
        )
        pq.write_table(
            pa.concat_tables([tbl.slice(0, 1), nulls]),
            f"{NULLMIX}/{t}.parquet",
        )
    with open(marker, "w") as f:
        f.write("ok")
    return NULLMIX


def main() -> int:
    args = list(sys.argv[1:])
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i:i + 2]
    regime = "empty"
    if "--regime" in args:
        i = args.index("--regime")
        regime = args[i + 1]
        if regime not in ("empty", "single", "nullmix"):
            raise SystemExit(f"unknown --regime {regime!r} (empty|single|nullmix)")
        del args[i:i + 2]
    only = set(args)

    from etl_rj_spark.analytics import ordered_registry  # noqa: E402

    reg = ordered_registry()
    names = [n for n in reg if not only or n in only]

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .appName("degenerate-sweep")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    build = {"empty": ensure_empty_dataset, "single": ensure_single_row_dataset,
             "nullmix": ensure_nullmix_dataset}[regime]
    sf_dir = build(spark)
    con = duck_connection(sf_dir)
    t0 = time.time()
    detail: dict[str, dict] = {}
    counts = {"ok": 0, "rows_only": 0, "refused_by_design": 0,
              "DIVERGES": 0, "ENGINE_ERR": 0, "ORACLE_ERR": 0}
    for n in names:
        q = reg[n]
        t1 = time.time()
        try:
            df = q.build(spark, sf_dir)
            if q.oracle is None:
                cnt = df.count()
                counts["rows_only"] += 1
                detail[n] = {"status": "rows_only", "rows": cnt}
            else:
                try:
                    rel = con.sql(q.oracle)
                    rel.fetchall()
                except Exception as oe:  # noqa: BLE001
                    counts["ORACLE_ERR"] += 1
                    detail[n] = {"status": "ORACLE_ERR", "err": str(oe)[:800]}
                else:
                    try:
                        compare_spark_duck(df, con, q.oracle)
                        counts["ok"] += 1
                        detail[n] = {"status": "ok"}
                    except AssertionError as ae:
                        counts["DIVERGES"] += 1
                        detail[n] = {"status": "DIVERGES", "err": str(ae)[:800]}
        except Exception as e:  # noqa: BLE001 — sweep must finish
            if n in EXPECTED_REFUSAL and EXPECTED_REFUSAL[n] in str(e):
                counts["refused_by_design"] += 1
                detail[n] = {"status": "refused_by_design", "err": str(e)[:200]}
            else:
                counts["ENGINE_ERR"] += 1
                detail[n] = {"status": "ENGINE_ERR", "err": str(e)[:800]}
        detail[n]["sec"] = round(time.time() - t1, 2)
    summary = dict(counts)
    summary.update({"regime": regime, "checked": len(names),
                    "wall_sec": round(time.time() - t0, 1)})
    if out_path:
        with open(out_path, "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
    for n, d in detail.items():
        if d["status"] not in ("ok", "rows_only", "refused_by_design"):
            print(f"{d['status']:<10} {n}: {d.get('err', '')[:200]}")
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
