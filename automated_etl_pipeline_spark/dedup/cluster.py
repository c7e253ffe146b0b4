"""Connected components over the near-duplicate pair graph — the
clustering step that turns pairwise dedup output into keep/drop sets.

Pairwise near-dedup (minhash.py / simhash.py) emits edges; dropping
``doc_b`` of every edge is only one-hop and over-deletes chains
(a-b, b-c drops both b and c even though c may only resemble b). The
correct grouping is the connected component, with one survivor per
component (the min id).

Spark-first formulation: iterative min-label propagation —
every vertex starts labeled with itself; each round every vertex takes
the min of its own and its neighbors' labels; fixpoint in
O(component diameter) rounds. This is the simple variant of the
small-star/large-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond"); near-dup components are shallow
(diameter ~ a few hops), so few rounds suffice.

Scale notes:
- Each round is one join + one groupBy on the edge list — all hash
  shuffles on vertex ids. Labels only ever decrease, so convergence is
  monotone; the loop exits when sum(labels) stops changing (one tiny
  aggregate per round, no row-level diff join).
- ``localCheckpoint`` per round truncates the lineage — without it the
  plan doubles every iteration and the driver dies long before the
  data does (the classic iterative-DataFrame trap).
- Oracle: a DuckDB recursive CTE reaches the same fixpoint
  (min reachable id == min label of the component).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) — component = min vertex id reachable via edges
    (undirected). Vertices with no edges form singleton components."""
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
        .localCheckpoint()
    )
    # isolated vertices are their own component and never change —
    # keep them out of the iteration (in a dedup corpus they are the
    # overwhelming majority) and union them back at the end
    all_v = vertices.select(F.col(id_col).alias("vid"))
    edge_v = sym.select(F.col("a").alias("vid")).distinct()
    singletons = all_v.join(edge_v, "vid", "left_anti").select(
        "vid", F.col("vid").alias("label")
    )
    labels = edge_v.select("vid", F.col("vid").alias("label")).localCheckpoint()
    # convergence probe: labels only ever decrease, so the label sum is
    # strictly monotone until fixpoint. Summed as DECIMAL(38,0) — a
    # BIGINT sum of 64-bit hash ids overflows (ANSI mode: crash;
    # legacy: silent wrap and a bogus convergence signal).
    label_sum = lambda df: df.agg(  # noqa: E731
        F.sum(F.col("label").cast("decimal(38,0)"))
    ).first()[0]
    prev_sum = label_sum(labels)
    converged = False
    # max_iter productive rounds + 1 confirmation round: a component
    # whose diameter exactly equals max_iter changes the sum on every
    # productive round and needs the extra pass to prove the fixpoint
    for _ in range(max_iter + 1):
        nbr = (
            sym.join(labels, sym.b == labels.vid)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr, labels.vid == nbr.a, "left")
            .select(
                "vid",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        cur_sum = label_sum(labels)
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise ValueError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter); raise max_iter — "
            "returning partial labels would silently mislabel components"
        )
    return labels.unionByName(singletons).select(
        F.col("vid").alias(id_col), F.col("label").alias("component")
    )


def dedup_keep_set(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """One survivor per component (the min id): the correct global
    keep-set for cascade deletion."""
    comp = connected_components(vertices, edges, id_col, src_col, dst_col)
    return comp.filter(F.col(id_col) == F.col("component")).select(id_col)
