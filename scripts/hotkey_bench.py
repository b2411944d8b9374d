#!/usr/bin/env python3
"""Skew bench envelope (VERDICT r12 #4): time the skew-sensitive bench
rows on a HOTKEY tree (99% of each join/group key = one value — the
``synth_scale.py --hotkey`` twin of the correctness-only hotkey
regime) against the uniform tree, and record which plans AQE actually
skew-split.

The hotkey regime proved these queries CORRECT under realistic skew
(CORRECTNESS via degenerate_sweep, 312/312 r12); this records the
COST: a row far outside its uniform-key time is a skew-handling gap
(missing salting, a window funneling the hot key through one task)
even when the answer is right. bench.py's method is reused exactly —
warm-up pass, then min-of-2 timed runs, noop sink, cache cleared.

Usage:
  python scripts/hotkey_bench.py [uniform_dir] [hotkey_dir] [name ...]
Defaults: /root/testdata/sf0.1  /tmp/sf0.1_hotkey  and the four
VERDICT-named rows. Prints one JSON line per query plus a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_ROWS = [
    "client_zone_rollup",
    "incremental_anti_join",
    "sessionization",
    "minhash_lsh_storm_safe",
]


def _minhash_storm_safe(spark, sf_dir):
    """The at-scale NEAR-DUP posture for a corpus that may carry an
    exact-duplicate storm — since r14 this IS the engine's default
    entry point, ``near_dup_pairs`` (VERDICT r13 #5): count-gated
    exact-collapse first (one narrow md5-key shuffle, min-id
    representative per identical-content group, linear star edges),
    then the same ×25 LSH pair production the bench row times over
    the representatives, with the ``max_bucket_len`` belt on.

    Why the raw ``minhash_lsh_pairs_scaled`` row is NOT timed on the
    hotkey tree: 99%-one-text makes ~124k docs verbatim-identical, and
    their near-dup PAIR OUTPUT is inherently C(124k,2) ≈ 7.7e9 — the
    r13 measurement ran the raw row's one-bucket band join >12 min
    before being killed. That is a WORKLOAD change, not an engine gap
    (synth_scale.py documents the same caveat for --llm trees); the
    engine's answer to the storm is the default tier order this row
    times, and the bucket cap is the belt for the slice that survives
    collapse."""
    from etl_rj_spark.analytics.llm_suite import _scaled_docs
    from etl_rj_spark.operators.text_dedup import near_dup_pairs
    from etl_rj_spark.session import ensure_session_defaults

    ensure_session_defaults(spark)
    corpus = _scaled_docs(spark, sf_dir, 25)
    return near_dup_pairs(
        corpus, "doc_id", "text", threshold=0.8,
        num_hashes=16, hashed_sets=True, token_ngrams_n=3, fast_hash=True,
        max_bucket_len=2000,
    )


EXTRA_BUILDS = {"minhash_lsh_storm_safe": _minhash_storm_safe}


def main() -> int:
    args = list(sys.argv[1:])
    uniform = args[0] if args else "/root/testdata/sf0.1"
    hotkey = args[1] if len(args) > 1 else "/tmp/sf0.1_hotkey"
    names = args[2:] or DEFAULT_ROWS

    from etl_rj_spark.analytics.suite import REGISTRY
    from etl_rj_spark.session import get_spark

    spark = get_spark(
        app_name="hotkey-bench", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )

    def run(name: str, sf_dir: str, want_flag: bool = False) -> tuple[float, bool | None]:
        """(min-of-2 steady seconds, any-AQE-skew-split?).

        The skew flag is measured on a DEDICATED pass that executes the
        DataFrame's OWN QueryExecution JVM-side
        (``executedPlan().execute().count()``) and only then greps the
        plan for the ``skew=true`` marker OptimizeSkewedJoin stamps.
        The old flag read was a guaranteed false negative (ADVICE r13):
        the noop write runs through a SEPARATE QueryExecution (the
        DataFrameWriter command), so ``df``'s own executedPlan stays an
        unfinalized ``AdaptiveSparkPlan isFinalPlan=false`` stub that
        never carries runtime markers. Verified live this round: a
        forced-skew SMJ shows ``SortMergeJoin(skew=true)`` +
        ``AQEShuffleRead skewed`` through the own-QE pass and nothing
        through the write-path read. If the executed plan somehow is
        not finalized, the flag is None (unknown), never False."""
        if name in EXTRA_BUILDS:
            build = EXTRA_BUILDS[name]
        else:
            q = REGISTRY[name]
            build = q.bench_build or q.build

        def once() -> float:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = build(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        once()  # warm-up (codegen/JIT), unrecorded
        sec = round(min(once(), once()), 3)
        flag: bool | None = None
        if want_flag:
            spark.catalog.clearCache()
            df = build(spark, sf_dir)
            df._jdf.queryExecution().executedPlan().execute().count()
            plan = df._jdf.queryExecution().executedPlan().toString()
            flag = "skew=true" in plan if "isFinalPlan=true" in plan else None
        return sec, flag

    out = []
    for name in names:
        try:
            u_sec, _ = run(name, uniform)
            h_sec, h_skew = run(name, hotkey, want_flag=True)
            row = {
                "query": name,
                "uniform_sec": u_sec,
                "hotkey_sec": h_sec,
                "ratio": round(h_sec / u_sec, 2) if u_sec else None,
                "aqe_skew_split": h_skew,
            }
        except Exception as ex:  # noqa: BLE001 — record, keep going
            row = {"query": name, "err": f"{type(ex).__name__}: {ex}"[:300]}
        out.append(row)
        print(json.dumps(row), flush=True)
    worst = max((r.get("ratio") or 0) for r in out)
    print(json.dumps({"summary": "hotkey_envelope", "rows": len(out),
                      "worst_ratio": worst}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
