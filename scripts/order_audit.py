#!/usr/bin/env python3
"""Order-determinism audit: enumerate every ORDER-DEPENDENT aggregate
(``collect_list`` / ``collect_set`` / ``first`` / ``last`` /
``nth_value``) across ALL registered queries' optimized plans and fail
unless each one is deterministic by construction or covered by the
documented allowlist (VERDICT r14 #6 — the third plan audit, next to
window_audit and crossjoin_audit).

Why: Spark evaluates these against whatever row order the partitioning
delivered, so their raw results differ run-to-run under shuffle/AQE
re-planning — at 100 TB that is a silent nondeterminism bug (two runs
of the same query disagree; a driver-vs-oracle hash comparison flakes).
The house style already avoids them — ``array_sort``-wrapped
collections, ``min_by/max_by`` with total tie-breakers, ordered
windows with explicit tie-break columns — but until r15 only by
discipline; this audit makes it a standing CONTRACT over the registry,
like the unpartitioned-window and cross-join contracts before it.

DETERMINISTIC-BY-CONSTRUCTION (never flagged):
- a collection nested anywhere inside ``array_sort(...)`` /
  ``sort_array(...)`` — the wrapper makes the order canonical;
- ``first``/``last`` immediately followed by ``FILTER (WHERE (gid...``
  — the RewriteDistinctAggregates compiler rewrite (exactly one input
  row matches per group, so "first" is the only value);
- ``first``/``last``/``nth_value`` evaluated OVER a window WHOSE
  ORDER SPEC IS NON-EMPTY (``windowspecdefinition(... ASC/DESC ...)``)
  — deterministic given the engine's house rule that window orderings
  carry total tie-breakers (enforced by review + the per-query
  oracles, which hash-compare exact values).

Everything else must be allowlisted BY QUERY NAME with a documented
reason, or the audit exits 1 naming the query.

Usage: python scripts/order_audit.py [sf_dir] [--out out.json]
Exit 0 = every order-dependent aggregate is deterministic-by-
construction or allowlisted; 1 otherwise.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: query name -> why its unsorted collection is deterministic anyway.
#: Adding a query here requires the justification to hold at the VALUE
#: level (the driver hash-compares values), not just "close enough".
#: EMPTY at r15 by design: the initial audit found 13 queries with
#: unsorted collections — the kmeans broadcast-centroid pack (argmin
#: consumer, value-level order-free), the scaled contracts' per-base
#: value lists (pair-SUM consumer, order-free), and the KLL sketch
#: rollup (band-stable but merge-order-sensitive in the last ulp) —
#: and every one was REWRITTEN onto ``array_sort`` at the source
#: instead of allowlisted, the same posture the r12 window audit took
#: with its two findings. Prefer that: an allowlist entry documents a
#: risk, a canonical sort deletes it.
ALLOWLIST: dict[str, str] = {}

_PAT = re.compile(r"\b(collect_list|collect_set|first|last|nth_value)\(")
_SORT_WRAPPERS = {"array_sort", "sort_array"}


def _call_end(s: str, open_idx: int) -> int:
    """Index just past the ')' matching the '(' at ``open_idx``."""
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    return len(s)


def _enclosing_calls(s: str, pos: int) -> list[str]:
    """Names of calls whose parenthesis span encloses ``pos``."""
    stack: list[tuple[str, int]] = []  # (name, open_idx)
    out: list[str] = []
    name = ""
    i = 0
    while i < pos:
        ch = s[i]
        if ch.isalnum() or ch == "_":
            name += ch
        elif ch == "(":
            stack.append((name, i))
            name = ""
        elif ch == ")":
            if stack:
                stack.pop()
            name = ""
        else:
            name = ""
        i += 1
    for nm, open_idx in stack:
        if _call_end(s, open_idx) > pos:
            out.append(nm)
    return out


def order_dependent_aggs(df) -> list[str]:
    """Flagged ``fn(args)`` snippets in the OPTIMIZED logical plan that
    are NOT deterministic-by-construction (see module docstring)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    out = []
    for raw in plan.splitlines():
        line = raw.rstrip()
        for m in _PAT.finditer(line):
            fn = m.group(1)
            open_idx = m.end() - 1
            end = _call_end(line, open_idx)
            suffix = line[end:]
            if fn in ("first", "last", "nth_value"):
                # compiler-generated distinct-agg rewrite: exactly one
                # input row per group carries gid — order-free
                if re.match(r"\s*FILTER \(WHERE \(gid", suffix):
                    continue
                # ordered window evaluation
                wm = re.match(r"\s*windowspecdefinition\(", suffix)
                if wm:
                    spec_open = end + len(wm.group(0)) - 1
                    spec = line[spec_open:_call_end(line, spec_open)]
                    if " ASC" in spec or " DESC" in spec:
                        continue
                out.append(f"{fn}: {line[m.start():min(end, m.start() + 160)]}")
                continue
            # collections: fine only inside a canonicalizing sorter
            if _SORT_WRAPPERS & set(_enclosing_calls(line, m.start())):
                continue
            out.append(f"{fn}: {line[m.start():min(end, m.start() + 160)]}")
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
        .appName("order-audit")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    reg = ordered_registry()
    t0 = time.time()
    found: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, q in reg.items():
        try:
            aggs = order_dependent_aggs(q.build(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — audit must finish
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            continue
        if aggs:
            found[name] = sorted(set(aggs))
    violations = sorted(set(found) - set(ALLOWLIST))
    unused = sorted(set(ALLOWLIST) - set(found))
    summary = {
        "queries": len(reg),
        "with_order_dependent_agg": len(found),
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
