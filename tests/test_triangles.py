"""triangle_stats (graph/triangles.py) against hand-countable graphs
and a brute-force combinatorial oracle on a seeded random graph."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from automated_etl_pipeline_spark.graph.triangles import triangle_stats


def _stats(spark, edges):
    df = spark.createDataFrame(
        [(min(u, v), max(u, v)) for u, v in edges], "u long, v long"
    )
    return triangle_stats(df).collect()[0]


def test_k4_complete_graph(spark):
    edges = list(itertools.combinations(range(4), 2))
    r = _stats(spark, edges)
    assert r["n_nodes"] == 4
    assert r["n_edges"] == 6
    assert r["n_triangles"] == 4
    # every node: deg 3 -> C(3,2)=3 wedges; 4 nodes -> 12
    assert r["n_wedges_total"] == 12
    # clustering of a complete graph is exactly 1
    assert r["clustering_coeff"] == pytest.approx(1.0)


def test_path_graph_has_no_triangles(spark):
    edges = [(i, i + 1) for i in range(6)]
    r = _stats(spark, edges)
    assert r["n_triangles"] == 0
    assert r["n_wedges_total"] == 5  # each interior node contributes 1
    assert r["clustering_coeff"] == 0.0


def test_star_hub_skew_is_wedge_bounded(spark):
    # hub 0 with 30 spokes: deg(0)=30 -> 435 undirected wedges, but
    # orientation points every edge INTO the hub (spokes have deg 1),
    # so the oriented wedge join generates ZERO candidates — the
    # skew-resistance property the orientation exists for.
    edges = [(0, i) for i in range(1, 31)]
    r = _stats(spark, edges)
    assert r["n_triangles"] == 0
    assert r["n_wedges_total"] == 435
    assert r["n_wedges_oriented"] == 0


def test_random_graph_matches_bruteforce(spark):
    rng = random.Random(42)
    nodes = list(range(25))
    edges = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(90)}
    )
    eset = set(edges)
    expected = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    r = _stats(spark, edges)
    assert r["n_triangles"] == expected
    assert r["n_edges"] == len(edges)
    # every triangle is found via exactly one oriented wedge, and the
    # oriented wedge count can never exceed the undirected total
    assert r["n_wedges_oriented"] <= r["n_wedges_total"]


def test_triangle_multiplicity_is_exactly_once(spark):
    # two triangles sharing an edge: (0,1,2) and (0,1,3)
    edges = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]
    r = _stats(spark, edges)
    assert r["n_triangles"] == 2
