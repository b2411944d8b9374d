#!/usr/bin/env python3
"""Capture .explain("formatted") for every bench-tagged query into
plans/r15/<name>_<suffix>.txt (suffix = argv[1], default "before").

Optimization-round evidence artifact (guide §1.1/§7.2): the judge
cannot run Spark, so plan claims in OPTIMIZATION_r15.md ("2 Exchange →
1", "SortMergeJoin → BroadcastHashJoin", "PushedFilters now includes
X") are checked against these committed files. The captured plan is
the pre-execution AQE plan (isFinalPlan=false) — the static shape:
Exchange count, join strategy, PushedFilters/ReadSchema, codegen
spans. bench_build (when set) is the timed path, so that is what is
captured.

Usage: python scripts/r15_capture_plans.py [before|after] [name ...]
(no names → all bench queries).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_rj_spark.analytics.suite import REGISTRY  # noqa: E402
from etl_rj_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="r15-plan-capture")

    bench = {n: q for n, q in REGISTRY.items() if q.bench}
    targets = names or sorted(bench)
    for name in targets:
        q = bench[name]
        build = q.bench_build or q.build
        try:
            df = build(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"PLAN CAPTURE ERROR: {type(ex).__name__}: {ex}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
