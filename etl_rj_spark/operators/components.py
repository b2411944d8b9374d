"""Connected components — the cluster step of near-duplicate detection
(pair lists → dup clusters, each labeled by its minimum member id).

Two implementations:

- :func:`connected_components` — plain min-label propagation,
  O(diameter) rounds. Each iteration is one join + one aggregation;
  convergence is checked with a count per round (a driver action, but
  O(iterations) of them and each reads only the label frame). Right
  for dup graphs: dense cliques with tiny diameters converge in 2-3
  rounds.

Both loops truncate lineage each round with an eager
``localCheckpoint()`` — an iterative plan that references the previous
round's frame twice would otherwise double in size every round and OOM
the driver on plan *construction* long before data size matters. On a
real cluster with executor loss to worry about, swap in
``sc.setCheckpointDir`` + ``.checkpoint()`` (durable, same lineage
truncation); localCheckpoint trades fault tolerance for speed, the
right call for a handful of rounds.
- :func:`connected_components_star` — alternating large-star /
  small-star contraction (Kiveris et al., "Connected Components in
  MapReduce and Beyond", public algorithm), O(log² n) rounds
  regardless of diameter. The scale path for path/chain-shaped graphs
  (e.g. transitive near-dup chains) where plain propagation would need
  O(diameter) shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id reachable. Raises if not converged within
    ``max_iterations`` (dup graphs converge in a handful)."""
    sym = (
        edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .localCheckpoint()
    )

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        candidates = sym.join(
            labels, sym.src == labels.node
        ).select(F.col("dst").alias("node"), "component")
        # carry the old label through the same aggregation so the
        # convergence check is a filter over the materialized frame —
        # no extra join-and-scan per round (every node has exactly one
        # old row: labels covers all nodes of the symmetrized edges)
        merged = (
            labels.select("node", "component", F.lit(1).alias("__o"))
            .union(candidates.select("node", "component", F.lit(0).alias("__o")))
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.min(F.when(F.col("__o") == 1, F.col("component"))).alias("__old"),
            )
            .localCheckpoint()
        )
        changed = merged.filter(F.col("component") < F.col("__old")).count()
        labels = merged.select("node", "component")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components: no convergence in {max_iterations} iterations")


def _edge_signature(e: DataFrame) -> tuple[int, int]:
    """(count, xor-ish hash-sum) fingerprint of an edge multiset — one
    aggregate action; equal signatures on consecutive rounds = fixed
    point (hash-collision odds negligible and a false "converged" is
    caught by the star-shape invariant of the final assembly)."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components_star(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 30,
) -> DataFrame:
    """(node, component) via alternating large-star/small-star edge
    contraction — O(log² n) rounds independent of graph diameter.

    large-star: every node points its LARGER neighbors at the minimum
    of its neighborhood; small-star: every node points its smaller
    neighbors (and itself) at that minimum. Both strictly shrink a
    potential function, and the fixed point is a forest of stars
    (v → root); components read off directly.
    """
    e = (
        edges.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    sig = _edge_signature(e)
    for _ in range(max_rounds):
        # large-star over the symmetric view
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # small-star over max→min directed edges
        directed = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        smins = directed.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            directed.join(smins, "u")
            .select(F.col("v").alias("n"), F.col("m"))
            .union(smins.select(F.col("u").alias("n"), F.col("m")))
            .filter(F.col("n") != F.col("m"))
            .select(F.col("n").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        new_sig = _edge_signature(small)
        e = small
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(f"connected_components_star: no fixed point in {max_rounds} rounds")
    # star-forest invariant (the check _edge_signature's collision note
    # relies on): at a true fixed point every edge points node → root
    # and no node is both — a residual chain (u→v, v→w) means the
    # signature equality was a hash collision on a still-contracting
    # edge set, and silently reading components off it would mislabel
    chained = (
        e.select("u").join(e.select(F.col("v").alias("u")), "u", "left_semi").count()
    )
    if chained:
        raise RuntimeError(
            "connected_components_star: fixed-point signature matched but the "
            f"edge set is not a star forest ({chained} chained nodes) — "
            "signature hash collision; rerun with a different max_rounds"
        )
    # fixed point is stars (node → root, root < node): components read off
    comp = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    # nodes isolated by contraction (singletons in the original edge list
    # never lose their component: they appear as their own root)
    all_nodes = (
        edges.select(F.col(id_a).alias("node"))
        .union(edges.select(F.col(id_b).alias("node")))
        .distinct()
    )
    known = comp.union(roots)
    leftover = all_nodes.join(known.select("node"), "node", "left_anti").withColumn(
        "component", F.col("node")
    )
    return known.union(leftover).groupBy("node").agg(
        F.min("component").alias("component")
    )


def pagerank_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """PageRank with EXACT integer arithmetic — the iterative graph
    centrality companion to :func:`connected_components` (public
    algorithm, Page et al. 1999). Ranks are parts-per-``scale`` int64;
    every update is ``base + Σ ((r(u)·damping) div 100) div outdeg(u)``
    with a pinned operation order, so the result is bit-identical on
    any engine/partitioning — floats would drift per reduction order.

    Fixed ``iterations`` (power iteration, unrolled); dangling-node
    mass is dropped (ranks then sum to < scale — the standard
    simplification; redistribute via one extra agg per round if the
    exact distribution matters). Returns ``(node, rank_ppb)``.

    Scale: per iteration, one shuffle join of ranks onto edges (hash
    on src) + one aggregation on dst — the Pregel-on-DataFrames
    posture; rank state is O(nodes), never materialized on the
    driver. The lazy plan grows linearly with ``iterations``; past
    ~15 rounds cut lineage with ``localCheckpoint`` as the
    connected-components loops do.
    """
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    nodes = (
        e.select(F.col("__src").alias("node"))
        .union(e.select(F.col("__dst").alias("node")))
        .distinct()
    )
    n1 = nodes.agg(F.count(F.lit(1)).alias("__n"))
    outdeg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
    base_expr = f"({(100 - damping_pct) * scale} div 100) div __n"
    ranks = nodes.join(F.broadcast(n1)).select(
        "node", F.expr(f"{scale} div __n").alias("rank_ppb")
    )
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["__src"] == ranks["node"])
            .join(outdeg, "__src")
            .select(
                F.col("__dst").alias("node"),
                F.expr(f"((rank_ppb * {damping_pct}) div 100) div __deg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .join(F.broadcast(n1))
            .select(
                "node",
                (F.expr(base_expr) + F.coalesce(F.col("__in"), F.lit(0))).alias(
                    "rank_ppb"
                ),
            )
        )
    return ranks


def triangle_stats(
    edges: DataFrame, a: str = "a", b: str = "b"
) -> DataFrame:
    """Exact triangle count + global clustering coefficient of an
    undirected simple graph, with the DEGREE-ORIENTATION trick that
    makes triangle counting feasible at scale (public algorithm —
    Schank & Wagner 2005 / Suri & Vassilvitskii 2011): orient every
    edge from its (degree, id)-smaller endpoint to the larger, which
    caps every out-neighborhood at O(√m); wedges then enumerate as the
    oriented adjacency self-joined on its source — O(m^1.5) candidate
    pairs instead of Σdeg² — and each triangle is counted exactly once
    when the closing edge exists (checked oriented, a join not a
    broadcast: the edge set is corpus-sized).

    Input: one row per undirected edge, either orientation, self-loops
    and duplicates tolerated (canonicalized + distinct'd first).
    Output: one row (n_nodes, n_edges, n_wedges, n_triangles,
    global_cc_ppm = 3·T·10⁶ div wedges — the fraction of wedges that
    close; 0-wedge graphs report NULL).
    """
    # materialize the canonical edge set once: degrees, orientation and
    # the closing-edge probe all reuse it — lazy lineage would re-run
    # the caller's (possibly expensive) edge construction three times
    e = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ranked = e.join(du, "u").join(dv, "v")
    # orient from (deg, id)-smaller to larger: total order, no cycles
    oriented = ranked.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
        )
        .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
        .alias("o")
    ).select(F.col("o.s").alias("s"), F.col("o.t").alias("t")).localCheckpoint()
    o1 = oriented.select(F.col("s"), F.col("t").alias("t1"))
    o2 = oriented.select(F.col("s"), F.col("t").alias("t2"))
    wedges_or = o1.join(o2, "s").filter(F.col("t1") < F.col("t2"))
    closing = oriented.select(
        F.least("s", "t").alias("cu"), F.greatest("s", "t").alias("cv")
    )
    tri = wedges_or.join(
        closing,
        (F.least("t1", "t2") == F.col("cu"))
        & (F.greatest("t1", "t2") == F.col("cv")),
        "left_semi",
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    # n_nodes, n_wedges AND n_edges all come from the one degree table:
    # Σd = 2·|E| exactly on the canonical simple-edge set, which drops
    # the separate full edge-count pass (r15, guide §1.2 — don't
    # recompute what an existing aggregate already carries)
    wedge_total = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"),
        # coalesce: an EMPTY graph must keep reporting n_edges = 0 (the
        # old COUNT(*) semantics), not a NULL sum
        F.coalesce(F.expr("sum(d) div 2"), F.lit(0).cast("bigint")).alias("n_edges"),
    )
    return (
        wedge_total.join(F.broadcast(tri))
        .select(
            "n_nodes", "n_edges", "n_wedges",
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
            F.expr(
                "case when n_wedges > 0 then"
                " cast((cast(n_triangles as decimal(38,0)) * 3000000)"
                " div n_wedges as bigint) end"
            ).alias("global_cc_ppm"),
        )
    )
