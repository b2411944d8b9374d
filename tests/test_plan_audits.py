"""Full-registry plan-audit contracts, in CI (ADVICE r12 / VERDICT r12
#6; third audit VERDICT r14 #6): every registered query's optimized
plan is checked for the two 100-TB scale-killers — unpartitioned
windows (whole input through ONE task) and unbounded cross joins
(quadratic blow-up) — against the documented allowlists in
scripts/window_audit.py and scripts/crossjoin_audit.py, plus (r15)
the order-determinism contract of scripts/order_audit.py: no unsorted
collect_list/collect_set/first/last whose value can depend on
partition/row order.

Until r13 the window audit's "fails CI the round it lands" claim was
aspirational: nothing in the suite invoked it (the staleness invariant
got test_driver_verdict_staleness_invariant when it converted from
convention to contract; this is the same conversion for the plan
audits). One registry pass serves all three checks — each query is
built once and every plan walk runs on the same DataFrame.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_driver_prefix_integrity():
    """The staged rotation's 50-name driver prefix must reference only
    live registry names and be exactly 50 long (ADVICE r13):
    ordered_registry() used to SILENTLY drop unknown _PRIORITY names,
    so a typo or a query rename would shrink the verdicted prefix with
    no failure signal. The assert now lives in ordered_registry()
    itself (it runs on every driver invocation); this test pins it at
    CI time too and proves the prefix is exactly _PRIORITY."""
    from etl_rj_spark.analytics import (
        _DRIVER_PREFIX_LEN,
        _PRIORITY,
        REGISTRY,
        ordered_registry,
    )

    assert set(_PRIORITY) <= set(REGISTRY)
    assert len(_PRIORITY) == len(set(_PRIORITY)) == _DRIVER_PREFIX_LEN
    ordered = list(ordered_registry())
    assert ordered[:_DRIVER_PREFIX_LEN] == _PRIORITY
    assert len(ordered) == len(REGISTRY)


def test_plan_audits_full_registry(spark, sf_dir):
    """Builds all registered queries at sf0.001 (side-effect fixtures
    included — the audits see the serve-side plans) and asserts ZERO
    build errors, zero unallowlisted unpartitioned windows, and zero
    unallowlisted cross joins. A new query that sneaks a global
    Window.orderBy or an all-pairs crossJoin onto an unbounded grain
    fails here with its name in hand, the round it lands."""
    from crossjoin_audit import ALLOWLIST as XJ_ALLOW
    from crossjoin_audit import cross_joins
    from order_audit import ALLOWLIST as ORD_ALLOW
    from order_audit import order_dependent_aggs
    from window_audit import ALLOWLIST as WIN_ALLOW
    from window_audit import unpartitioned_windows

    from etl_rj_spark.analytics import ordered_registry

    win_found: dict[str, list[str]] = {}
    xj_found: dict[str, list[str]] = {}
    ord_found: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, q in ordered_registry().items():
        try:
            df = q.build(spark, sf_dir)
        except Exception as e:  # noqa: BLE001 — report ALL failures at once
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            continue
        wins = unpartitioned_windows(df)
        if wins:
            win_found[name] = wins
        joins = cross_joins(df)
        if joins:
            xj_found[name] = joins
        aggs = order_dependent_aggs(df)
        if aggs:
            ord_found[name] = aggs

    assert not errors, f"query build errors: {errors}"
    win_violations = sorted(set(win_found) - set(WIN_ALLOW))
    assert not win_violations, {
        n: win_found[n] for n in win_violations
    }
    xj_violations = sorted(set(xj_found) - set(XJ_ALLOW))
    assert not xj_violations, {
        n: xj_found[n] for n in xj_violations
    }
    ord_violations = sorted(set(ord_found) - set(ORD_ALLOW))
    assert not ord_violations, {
        n: ord_found[n] for n in ord_violations
    }
