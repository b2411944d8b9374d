"""Connected components: plain min-label propagation vs the
large-star/small-star contraction scale path — same results, different
round complexity (O(diameter) vs O(log² n))."""

from __future__ import annotations

import random

import pytest

from etl_rj_spark.operators.components import (
    connected_components,
    connected_components_star,
)


def _comp_map(rows):
    return {r.node: r.component for r in rows}


def _reference_components(edges):
    """Driver-side union-find ground truth."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to final minima
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("algo", [connected_components, connected_components_star])
def test_clique_and_chain_components(spark, algo):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (20, 21), (21, 22), (22, 23)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = _comp_map(algo(df).collect())
    assert got == _reference_components(edges)


@pytest.mark.parametrize("algo", [connected_components, connected_components_star])
def test_random_graph_matches_union_find(spark, algo):
    rng = random.Random(42)
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = _comp_map(algo(df).collect())
    assert got == _reference_components(edges)


def test_long_path_star_converges_plain_does_not(spark):
    """A 160-node path (diameter 159): plain propagation cannot finish
    in 20 rounds — the star contraction converges in O(log) rounds and
    labels the whole path with its minimum."""
    edges = [(i, i + 1) for i in range(160)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(df, max_iterations=20)
    got = _comp_map(connected_components_star(df).collect())
    assert got == {i: 0 for i in range(161)}


def test_star_forest_invariant_catches_false_fixed_point(spark, monkeypatch):
    """If the edge-multiset signature ever collided (false "converged"
    on a still-contracting edge set), the star-forest check must refuse
    to read components off the chained edges instead of mislabeling.
    Simulated by forcing the signature to a constant so the loop breaks
    after round 1 on a path graph that needs several rounds."""
    from etl_rj_spark.operators import components as C

    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    monkeypatch.setattr(C, "_edge_signature", lambda e: (0, 0))
    with pytest.raises(RuntimeError, match="not a star forest"):
        C.connected_components_star(df)
