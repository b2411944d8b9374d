#!/usr/bin/env python3
"""Unpartitioned-window audit: enumerate every WindowExec with an
EMPTY partition spec across ALL registered queries' optimized plans
and fail unless each one is covered by the documented bounded-grain
allowlist (SCALE.md §3).

Why: an unpartitioned window funnels its whole input through ONE
task — the first thing that dies at 100 TB. The repo's design rule
permits them ONLY over frames bounded by construction (a period
series, a bounded VALUE vocabulary after a value-grain aggregate, or
a catalog/config table — never a token/content vocabulary, never row
grain). Until r12 that rule lived in SCALE.md prose and per-query
plan pins; this audit makes it a standing CONTRACT over the entire
registry, so the next operator that sneaks a global ``Window.orderBy``
onto an unbounded grain fails CI with its query name in hand, the
round it lands (the same conversion the staleness check applied to
the rotation discipline).

Method: build each query's DataFrame (no execution), walk the
OPTIMIZED logical plan for ``Window`` nodes with an empty
partitionSpec, and report ``query -> [window ordering columns]``.
The allowlist keys on query name; a listed query must still justify
itself in SCALE.md §3 (grain stated there). Streaming/maintainer
queries that pre-materialize state via side effects at BUILD time run
here too — their serve-side plans are what the audit sees.

Usage: python scripts/window_audit.py [sf_dir] [--out out.json]
Exit 0 = every unpartitioned window is allowlisted; 1 otherwise.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: query name -> documented bounded grain (SCALE.md §3). Every entry
#: must name ONE of the licensed grains (period series / bounded
#: value vocabulary / catalog table / explicit demo). Adding a query
#: here without a SCALE.md §3 justification is a review smell by
#: design. Verified against the r12 full-registry audit: 17 queries
#: carry unpartitioned windows, every one on a bounded grain; the two
#: audit findings (token_dist_chi2_drift's token-vocabulary
#: whole-frame windows, session_error_overlap's constant-key global
#: sessionize) were REWRITTEN, not allowlisted.
ALLOWLIST: dict[str, str] = {
    # -- period series (calendar grain: ≤ a few k rows at any SF)
    "rolling_7day_revenue": "period series (day grain)",
    "cusum_changepoint_revenue": "period series (day grain)",
    "gap_fill_interpolate": "period series (day grain)",
    "max_drawdown_daily_revenue": "period series (day grain)",
    "seasonal_adjusted_outlier_days": "period series (day grain)",
    # -- bounded value vocabulary (cents/scores/durations/lengths —
    #    domain-bounded, NOT content vocabulary)
    "exact_auc_purchase_value": "integer-score vocabulary (contract-pinned)",
    "ks_two_sample_values": "cents-vocabulary CDF (value-grain agg)",
    "km_view_to_purchase_survival": "integer-duration vocabulary",
    "weighted_percentiles_price": "cents vocabulary (value-grain agg)",
    "psi_price_drift": "cents vocabulary (value-grain agg)",
    "interpurchase_gap_stats": "integer-gap vocabulary (value-grain agg)",
    "percentile_rank_chars": "doc-length vocabulary (value-grain agg)",
    "gains_table_activity_purchase":
        "activity-count vocabulary + 10-row decile series",
    "topk_sketch_rollup": "event-type category vocabulary",
    # -- catalog/config tables (dimension-bounded)
    "negative_sample_parts": "parts-catalog CDF (weighted_draws)",
    "skyline_parts": "parts catalog (docstring-bounded)",
    # -- explicit demonstrations (documented non-scale shapes with a
    #    named scale-safe twin)
    "ntile_acctbal_quartiles":
        "documented ntile demo on a dim table (bit-identical scale-safe "
        "twin: ntile_acctbal_quartiles_scaled via windows.ntile_exact)",
}


def unpartitioned_windows(df) -> list[str]:
    """Ordering specs of Window nodes with an EMPTY partitionSpec in
    the OPTIMIZED logical plan (string-parsed: the py4j node API is
    version-brittle, the text form is stable).

    The node prints up to three bracket groups —
    ``Window [exprs], [partitionSpec], [orderSpec]`` — and OMITS empty
    trailing groups, so the 2-group form is ambiguous: partition-only
    (fine) vs order-only (the single-partition shape this audit
    hunts). Order specs always carry a sort direction (``ASC``/
    ``DESC``); partition specs never do — that token disambiguates.
    The 1-group form (neither partition nor order: a whole-frame
    aggregate window) is also single-partition and is flagged."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    out = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: ")
        if not s.startswith("Window ["):
            continue
        groups, depth, cur = [], 0, ""
        for ch in s[len("Window "):]:
            if ch == "[":
                depth += 1
            if depth:
                cur += ch
            if ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(cur)
                    cur = ""
        if len(groups) >= 3:
            if groups[1].strip("[] ") != "":
                continue  # partitioned
            out.append(groups[2][:160])
        elif len(groups) == 2:
            spec = groups[1]
            if " ASC" in spec or " DESC" in spec:
                out.append(spec[:160])  # order-only → single partition
            # else: partition-only → fine
        else:
            out.append("<whole-frame aggregate window>")
    return out


def main() -> int:
    args = list(sys.argv[1:])
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession

    from etl_rj_spark.analytics import ordered_registry

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .appName("window-audit")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    reg = ordered_registry()
    t0 = time.time()
    found: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, q in reg.items():
        try:
            wins = unpartitioned_windows(q.build(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — audit must finish
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            continue
        if wins:
            found[name] = wins
    violations = sorted(set(found) - set(ALLOWLIST))
    unused = sorted(set(ALLOWLIST) - set(found))
    summary = {
        "queries": len(reg),
        "with_unpartitioned_window": len(found),
        "allowlisted": len(set(found) & set(ALLOWLIST)),
        "violations": len(violations),
        "allowlist_unused": unused,
        "build_errors": len(errors),
        "wall_sec": round(time.time() - t0, 1),
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"found": found, "errors": errors}, f, indent=1,
                      sort_keys=True)
    for n in violations:
        print(f"VIOLATION {n}: {found[n]}")
    for n, e in errors.items():
        print(f"BUILD_ERR {n}: {e}")
    print(json.dumps(summary))
    spark.stop()
    return 1 if violations or errors else 0


if __name__ == "__main__":
    sys.exit(main())
