#!/usr/bin/env python3
"""Bounded-staleness invariant over the driver verdicts (VERDICT r11
#8): FAIL when the verification rotation has let any registered query
fall too far behind the external correctness gate.

The per-round driver checks a 50-name prefix of ``ordered_registry()``
and records verdicts in ``CORRECTNESS_r{N}.json``. The rotation
discipline (re-stage the prefix every round: changed contracts first,
then oldest-green backfill) has so far been convention; this check
makes it a CONTRACT the test suite enforces:

  1. EVERY registered query has at least one driver verdict ever
     (the never-checked count is zero), unless it is staged in the
     CURRENT 50-name prefix — i.e. a brand-new query is allowed
     exactly one round of grace, the round that will verdict it.
  2. No query's NEWEST verdict is older than ``MAX_AGE_ROUNDS``
     rounds behind the newest recorded round, unless the query is
     staged in the current prefix (scheduled for re-drive this
     round).

Calibration: at r12 HEAD (rounds 1–11 recorded) the oldest
un-restaged verdicts are r5 ⇒ age 6 — passes with MAX_AGE_ROUNDS=7
even before the r12 prefix credit; the r4 tail (age 7) is entirely
inside the staged r12 prefix. At r9 HEAD (rounds 1–8 recorded) 67
queries had NO verdict at all and only 50 fit the prefix ⇒ rule 1
fails — exactly the debt this invariant exists to surface.

Usage: python scripts/staleness_check.py [repo_root]
Exit 0 = invariant holds; 1 = violations (printed).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

MAX_AGE_ROUNDS = 7


def load_latest_verdicts(
    repo: str, upto_round: int | None = None
) -> tuple[dict[str, int], int]:
    """(newest verdict round per query, newest recorded round).
    ``upto_round`` truncates history — used by the regression test to
    replay the invariant against an EARLIER round's recorded state."""
    latest: dict[str, int] = {}
    newest = 0
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        if upto_round is not None and rnd > upto_round:
            continue
        newest = max(newest, rnd)
        try:
            data = json.load(open(p))
        except Exception:
            continue
        for name in data:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest, newest


def staleness_violations(
    repo: str,
    max_age: int = MAX_AGE_ROUNDS,
    upto_round: int | None = None,
) -> list[str]:
    sys.path.insert(0, repo)
    from etl_rj_spark.analytics import ordered_registry

    reg = ordered_registry()
    prefix = set(list(reg)[:50])
    latest, newest = load_latest_verdicts(repo, upto_round)
    if not newest:
        return ["no CORRECTNESS_r*.json files found"]
    out = []
    for name in reg:
        rnd = latest.get(name)
        if rnd is None:
            if name not in prefix:
                out.append(
                    f"{name}: NEVER driver-checked and not staged in the "
                    "current 50-name prefix"
                )
        elif newest - rnd > max_age and name not in prefix:
            out.append(
                f"{name}: newest verdict r{rnd} is {newest - rnd} rounds "
                f"behind r{newest} (max {max_age}) and not staged for "
                "re-drive"
            )
    return out


def main() -> int:
    repo = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    violations = staleness_violations(repo)
    for v in violations:
        print("STALE:", v)
    print(json.dumps({"violations": len(violations)}))
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
