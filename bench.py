#!/usr/bin/env python3
"""Benchmark the headline queries (REGISTRY entries tagged bench=True)
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized via the noop sink (no driver collect
skew) after a warm-up run of the first query to amortize JVM/codegen
startup out of nothing — timings include plan+execute per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_rj_spark.analytics.suite import REGISTRY  # noqa: E402
from etl_rj_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="etl-rj-spark-bench", cpus=cpus)

    bench_queries = {n: q for n, q in REGISTRY.items() if q.bench}

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = bench_queries[name].build(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # warm-up: session/codegen/readers (not recorded)
    first = next(iter(bench_queries))
    run(first)

    timings = {name: round(run(name), 4) for name in bench_queries}
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_query_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
