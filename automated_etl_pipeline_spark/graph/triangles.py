"""Distributed triangle counting by degree-ordered wedge joins.

The naive triangle count joins the edge list with itself twice —
O(sum_v deg(v)^2) wedges, which a power-law hub turns into a
quadratic blowup on one key.  The standard fix (Schank & Wagner 2005;
Suri & Vassilvitskii's MR-friendly variant) orients every undirected
edge from the endpoint with (lower degree, lower id) to the higher
one: each node's OUT-degree is then bounded by O(sqrt(|E|)), so the
wedge join generates at most O(|E|^1.5) candidates total regardless
of skew — the best possible for exact counting — and every triangle
is generated exactly once (from its unique minimum-degree corner).

All three steps are equi-joins + partial-aggregated counts:

1. degrees: one groupBy over the exploded endpoints;
2. orientation: two dim-style joins of the edge list against the
   (node, degree) table (broadcastable when the node set is reduced);
3. wedges: self-join of the oriented list on the source, closing
   join against the canonical edge list on (min, max).

Emitted stats are all integers: node/edge/wedge/triangle counts, the
undirected wedge total sum_v C(deg v, 2), and the global clustering
coefficient as the exact ratio 3*T / wedges_total rounded to 6 dp
(single IEEE division of two integers — identical cross-engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One-row frame of triangle statistics for an undirected simple
    graph given as distinct canonical edges ``(u, v)`` with ``u < v``.
    """
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        edges.join(
            deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u"
        ).join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
    )
    low_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(low_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(low_first, F.col("v")).otherwise(F.col("u")).alias("t"),
    )
    a, b = oriented.alias("a"), oriented.alias("b")
    wedges = a.join(
        b, (F.col("a.s") == F.col("b.s")) & (F.col("a.t") < F.col("b.t"))
    ).select(F.col("a.t").alias("wv"), F.col("b.t").alias("ww"))
    # one pass over the wedge join: edges (u, v) are unique, so the
    # left join preserves wedge cardinality and count(u) counts the
    # closed wedges — the expensive O(|E|^1.5) stage runs ONCE
    wedge_tri = wedges.join(
        edges, (F.col("wv") == F.col("u")) & (F.col("ww") == F.col("v")), "left"
    ).agg(
        F.count(F.lit(1)).alias("n_wedges_oriented"),
        F.count("u").alias("n_triangles"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n")).select("n")
    n_edges = edges.agg(F.count(F.lit(1)).alias("n")).select("n")
    # exact integer: sum d(d-1) is even; >>1 halves without the
    # double-division rounding that diverges from the oracle past 2^53
    n_wedges_total = deg.agg(
        F.shiftright(
            F.sum(F.col("d") * (F.col("d") - 1)).cast("bigint"), 1
        ).alias("n")
    ).select("n")
    # four single-row aggregates combined broadcast-style
    out = (
        n_nodes.withColumnRenamed("n", "n_nodes")
        .crossJoin(F.broadcast(n_edges.withColumnRenamed("n", "n_edges")))
        .crossJoin(
            F.broadcast(n_wedges_total.withColumnRenamed("n", "n_wedges_total"))
        )
        .crossJoin(F.broadcast(wedge_tri))
    )
    return out.select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("n_edges").cast("bigint").alias("n_edges"),
        F.col("n_wedges_total").cast("bigint").alias("n_wedges_total"),
        F.col("n_wedges_oriented").cast("bigint").alias("n_wedges_oriented"),
        F.col("n_triangles").cast("bigint").alias("n_triangles"),
        F.when(
            F.col("n_wedges_total") == 0, F.lit(0.0)
        )
        .otherwise(
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges_total"), 6
            )
        )
        .alias("clustering_coeff"),
    )
