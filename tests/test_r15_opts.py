"""Round-15 optimization regression tests.

Each test pins the STRUCTURAL property an r15 optimization bought, so a
refactor cannot silently reintroduce the cost (OPTIMIZATION_r15.md has
the measurements):

- the Poisson draw hash is materialized once per row (inline, the
  md5/conv chain re-evaluates per weight-CASE branch — conditional
  evaluation sits outside codegen subexpression elimination);
- the xxhash64 production draw hashes the native (id, replicate)
  columns, never a per-row rendered string;
- the MinHash signature's emptiness guard blocks CollapseProject from
  inlining a shingle-hash projection into the num_hashes signature
  lambdas (inlined, hashing re-runs once per hash function);
- q21 reads lineitem/orders once (the lazy two-branch flags plan
  compiled two full joins);
- the triangle edge build is join-free (per-order in-row pair
  expansion) and numerically identical to the old self-join shape.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_rj_spark.analytics.suite import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_poisson_md5_draw_values_unchanged(spark):
    """The two-step (h52 column, CASE over column) restructure must
    keep every md5 draw bit-identical to the published contract:
    u52 = int(md5(f"{id}:{replicate}").hexdigest()[:13], 16)."""
    from etl_rj_spark.operators.stats import _POIS1_T52, poisson_h52_expr

    df = spark.createDataFrame(
        [(i, r) for i in (1, 7, 12345) for r in (0, 3)], "id long, replicate int"
    )
    rows = df.select(
        "id", "replicate", poisson_h52_expr("id", "replicate").alias("h")
    ).collect()
    for row in rows:
        expected = int(
            hashlib.md5(f"{row.id}:{row.replicate}".encode()).hexdigest()[:13], 16
        )
        assert row.h == expected, (row, expected)
    assert len(_POIS1_T52) == 5


def test_poisson_plans_hash_once_and_no_string_build(spark, sf_dir):
    """bootstrap_median_revenue's plan evaluates md5 exactly once per
    fanned row (the weight CASE reads the materialized __h52 column);
    the xxhash64 production plan builds no per-row string at all."""
    plan = _formatted_plan(REGISTRY["bootstrap_median_revenue"].build(spark, sf_dir))
    assert plan.count("md5(") == 1, plan.count("md5(")

    bench = REGISTRY["poisson_bootstrap_revenue_xxh"]
    plan = _formatted_plan(bench.bench_build(spark, sf_dir))
    assert "concat_ws" not in plan
    assert plan.count("xxhash64") == 1, plan.count("xxhash64")
    # the replicate sum runs in BIGINT, not per-row Decimal boxing
    assert "decimal(38,0)" not in plan


def test_minhash_signature_null_for_empty_sets(spark):
    """Empty / NULL shingle-hash sets yield a NULL signature (one cell,
    same no-signal meaning as the old array-of-NULL-minima); non-empty
    signatures are the documented xxhash64(i, x) minima."""
    from etl_rj_spark.operators.text_dedup import minhash_signature_from_hashes

    df = spark.createDataFrame(
        [(1, [3, 9]), (2, []), (3, None)], "id long, h array<long>"
    )
    rows = {
        r.id: r.sig
        for r in df.select(
            "id", minhash_signature_from_hashes("h", 4).alias("sig")
        ).collect()
    }
    assert rows[2] is None and rows[3] is None
    expected = [
        min(
            # i is INT (sequence of int literals), x is BIGINT (the
            # array element type) — xxhash64 is type-sensitive
            spark.sql(f"SELECT xxhash64({i}, CAST({x} AS BIGINT)) AS v").collect()[0].v
            for x in (3, 9)
        )
        for i in range(4)
    ]
    assert rows[1] == expected


def test_minhash_signature_projection_not_collapsed(spark, sf_dir):
    """The shingle-hash projection must appear ONCE in the signature
    plan — CollapseProject inlining it into the signature lambdas would
    re-run the whole hashing pass num_hashes× per row (measured 47 s vs
    2 s at the 312k-doc scaled corpus). The emptiness guard gives the
    hash column two static references, which blocks the collapse."""
    from etl_rj_spark.operators.text_dedup import (
        minhash_signature_from_hashes,
        shingle_hashes,
    )
    from etl_rj_spark.sources.parquet import read_parquet_table

    d = read_parquet_table(spark, f"{sf_dir}/documents.parquet")
    sig = d.select(
        "doc_id", shingle_hashes("text", 5, 3, fast=True).alias("__h")
    ).select("doc_id", minhash_signature_from_hashes("__h", 16).alias("__sig"))
    plan = _formatted_plan(sig)
    # two stacked Projects survive optimization (CollapseProject must
    # refuse), and the signature-bearing block reads the __h COLUMN —
    # the shingle tokenizer stays out of the signature lambdas
    sig_blocks = [b for b in plan.split("\n\n") if "__sig" in b and "Project" in b]
    assert sig_blocks, plan
    for b in sig_blocks:
        assert "split(" not in b, b[:500]


def test_q21_single_scan_per_table(spark, sf_dir):
    """q21 reads each table exactly once. r14's lazy two-branch plan
    held 10 parquet scans; r15 fixed that with a localCheckpoint
    barrier (≤ 2 scans visible post-barrier); r16 replaces the culprit
    aggregate + semi-join with a window over the same l_orderkey
    partitioning, so `flags` has a single consumer and the fully LAZY
    plan reads lineitem/orders/supplier once each — no barrier, no
    SortMergeJoin."""
    df = REGISTRY["exclusive_late_supplier_q21"].build(spark, sf_dir)
    plan = _formatted_plan(df)
    assert plan.count("lineitem.parquet") == 1, plan
    assert plan.count("orders.parquet") == 1, plan
    assert plan.count("supplier.parquet") == 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_triangle_edges_join_free_and_equivalent(spark, sf_dir):
    """The per-order in-row pair expansion emits exactly the multiset
    the old distinct→self-join→groupBy shape did, with no join below
    the edge aggregate."""
    from etl_rj_spark.sources.parquet import read_parquet_table

    li = read_parquet_table(spark, f"{sf_dir}/lineitem.parquet")
    pres = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    b = pres.select(F.col("o"), F.col("p").alias("p2"))
    old_edges = (
        pres.alias("a")
        .join(b, "o")
        .filter(F.col("p") < F.col("p2"))
        .groupBy(F.col("p").alias("u"), F.col("p2").alias("v"))
        .agg(F.count(F.lit(1)).alias("sup"))
    )
    parts = li.groupBy(F.col("l_orderkey").alias("o")).agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    n = F.size("ps")
    pair_structs = F.when(
        n >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, n.cast("long")),
                    lambda j: F.struct(
                        F.element_at(F.col("ps"), i.cast("int")).alias("u"),
                        F.element_at(F.col("ps"), j.cast("int")).alias("v"),
                    ),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<struct<u:bigint,v:bigint>>"))
    new_edges = (
        parts.select(F.explode(pair_structs).alias("pr"))
        .select("pr.u", "pr.v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("sup"))
    )
    assert sorted(map(tuple, old_edges.collect())) == sorted(
        map(tuple, new_edges.collect())
    )


def test_triangle_stats_empty_graph_zero_edges(spark):
    """n_edges now derives from Σd div 2 — an EMPTY graph must still
    report 0 edges (the old COUNT(*) semantics), never a NULL sum."""
    from etl_rj_spark.operators.components import triangle_stats

    e = spark.createDataFrame([], "a long, b long")
    row = triangle_stats(e, "a", "b").collect()[0]
    assert row.n_edges == 0 and row.n_nodes == 0 and row.n_triangles == 0
