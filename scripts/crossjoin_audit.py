#!/usr/bin/env python3
"""Cartesian-join audit: enumerate every cross join across ALL
registered queries' optimized plans and fail unless each one is
covered by the documented bounded-side allowlist (SCALE.md §4/§12).

Why: an all-pairs crossJoin is quadratic in its inputs — the other
first-thing-that-dies at 100 TB besides the unpartitioned window
(scripts/window_audit.py, the contract this one mirrors per VERDICT
r12 #6). The repo's design rule permits a cross join ONLY when at
least one side is bounded by construction: a broadcast ONE-ROW pack
(a scalar stats frame, a collect_list'd ≤k centroid/codebook array,
a calendar/threshold grid) or an explicitly-labeled brute-force
baseline whose scale path exists under a different name. Candidate
generation for dedup/ANN must stay bucketed (LSH bands, k-means
cells, n-gram postings, prefix filters) — a bucketed join never
optimizes to a Cartesian node, so any NEW `Join Cross` in a plan is
either a deliberately-bounded pack join (allowlist it WITH its grain)
or a scale bug (fix it).

Method: build each query's DataFrame (no execution), walk the
OPTIMIZED logical plan for ``Join Cross`` / ``CartesianProduct``
nodes, and report ``query -> [join lines]``. The allowlist keys on
query name; a listed query must state its bounded side. Mirrors
window_audit.py's method exactly (string-parsed plan: the py4j node
API is version-brittle, the text form is stable).

Usage: python scripts/crossjoin_audit.py [sf_dir] [--out out.json]
Exit 0 = every cross join is allowlisted; 1 otherwise.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: query name -> the BOUNDED side of its cross join(s). Every entry
#: must name one of the licensed shapes: a one-row broadcast pack
#: (scalar stats / packed ≤k centroids / packed codebook / packed
#: vocabulary array), a ≤k-row dimension grid, or the explicitly
#: documented brute-force baseline. Adding a query here without that
#: justification is a review smell by design.
ALLOWLIST: dict[str, str] = {
    # Verified against the r13 full-registry audit (28 queries carry
    # cross joins; every bounded side checked at its call site).
    # -- packed ≤k centroid / codebook one-row broadcasts (kmeans.py
    #    _assign / _assign_topn / PQ codebooks: the ≤k table is
    #    collect_list'd into ONE broadcast row; the cross is a pure
    #    map over the corpus scan)
    "ann_kmeans_ivf_topk": "packed ≤k-centroid one-row broadcast (kmeans._assign)",
    "ann_ivf_index_probe": "packed ≤k-centroid one-row broadcast",
    "ann_ivf_index_append_probe": "packed ≤k-centroid one-row broadcast",
    "ann_ivfpq_topk": "packed centroid + per-segment ≤256-entry codebook packs",
    "ann_pq_adc_topk": "per-segment ≤256-entry codebook one-row packs",
    "stream_ivf_maintenance": "packed ≤k-centroid one-row broadcast",
    "kmeans_cells": "packed ≤k-centroid one-row broadcast",
    "cell_balanced_sample": "packed ≤k-centroid one-row broadcast",
    "doc_topic_cells": "packed ≤k-centroid one-row broadcast",
    "hard_negative_mining": "packed ≤k-centroid one-row broadcast",
    "knn_label_vote": "packed ≤k-centroid broadcast + ≤q-query pack",
    "margin_bitext_pairs": "pooled-side broadcast (≤k-pool × ≤k-pool)",
    # -- one-row broadcast scalar/stats packs (grouping-less aggregate
    #    or limit(1) — ≤1 row by construction)
    "embedding_standardize": "one-row broadcast per-dim mean/std pack (similarity.py:614)",
    "temperature_mix_docs": "one-row broadcast max-ratio pack (curation.py:391)",
    "distribution_match_resample": "one-row broadcast ratio pack (curation.py:657)",
    "important_stock_q11": "one-row broadcast grand-total pack (tpch_hard_suite.py:863)",
    "min_cost_supplier_q2": "one-row broadcast supplier-count pack (_derived_partsupp)",
    "promotion_suppliers_q20": "one-row broadcast supplier-count pack (_derived_partsupp)",
    "minhash_lsh_pairs_scaled":
        "in-query recall contract: 1-row got × 1-row expected "
        "(llm_suite.py:1781); the pair generation itself is the banded join",
    "embedding_near_pairs_lsh_scaled":
        "in-query recall contract: 1-row got × 1-row expected; "
        "pair generation is the LSH bucket join",
    "negative_sample_parts": "parts-catalog CDF pack (weighted_draws)",
    # -- bounded CATEGORY grid × marginal (left side is a ≤|categories|
    #    vocabulary, never content/row grain)
    "token_dist_chi2_drift":
        "≤|sources|-category grid × token marginal (quality_suite.py:1148; "
        "the token side stays aggregate-grain, SCALE.md §3)",
    # -- broadcast dimension theta-joins (levenshtein ≤2 band: the
    #    dim/catalog side is broadcast-bounded; a theta-join prints as
    #    Cross + filter)
    "fuzzy_name_best_match": "broadcast name-catalog levenshtein band (fuzzy.py:85)",
    "fuzzy_rescued_lookup": "broadcast name-catalog levenshtein band",
    # -- explicitly-labeled brute-force baselines (scale path exists
    #    under a different name) and packed ≤q query arrays
    "cosine_topk_bruteforce":
        "documented brute-force ANN baseline (packed ≤20-query broadcast; "
        "scale path: ann_lsh_topk / ann_kmeans_ivf_topk)",
    "cosine_topk_scaled": "packed ≤20-query broadcast × corpus scan",
    "ann_eval_recall_mrr": "packed ≤q-query/truth broadcast",
    "hybrid_search_rrf": "packed ≤q-query broadcast",
}


def cross_joins(df) -> list[str]:
    """Cross-join node lines in the OPTIMIZED logical plan. ``Join
    Cross`` is the logical node; CartesianProduct only appears
    physical-side but is matched defensively."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    out = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: ")
        if s.startswith("Join Cross") or "CartesianProduct" in s:
            out.append(s[:160])
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
        .appName("crossjoin-audit")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    reg = ordered_registry()
    t0 = time.time()
    found: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, q in reg.items():
        try:
            joins = cross_joins(q.build(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — audit must finish
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            continue
        if joins:
            found[name] = joins
    violations = sorted(set(found) - set(ALLOWLIST))
    unused = sorted(set(ALLOWLIST) - set(found))
    summary = {
        "queries": len(reg),
        "with_cross_join": len(found),
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
