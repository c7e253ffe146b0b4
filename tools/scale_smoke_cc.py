"""Connected-components smoke: does the alternating-star algorithm
hold its O(log n)-round shape as graphs grow and deepen, and where is
the crossover against min-label propagation?

The r11 claim (dedup/cluster.py): propagation costs O(diameter)
rounds — right for the shallow clusters near-dup dedup emits, wrong
for deep graphs; `connected_components_stars` costs O(log n) rounds
for ANY shape.  This smoke measures both on the two extreme shapes:

1. **Shallow clusters** (dedup-like): N nodes in groups of 5, a
   4-edge star per group.  Diameter 2 — propagation's home turf.
2. **Deep chains**: paths of length D.  Propagation needs D rounds
   (run only at small D to demonstrate the slope, with max_iter
   raised accordingly); stars should stay at ~log2(D)+-const rounds
   no matter how large D grows.

Invariants checked in-run (exact, every shape): every chain labels
entirely to vertex 0 of its path; every cluster labels to its group
min.

Usage: python tools/scale_smoke_cc.py [reps]
Methodology per SCALE_SMOKE_r06: medians of alternating fresh-session
reps; run STANDALONE — wall numbers under concurrent JVMs are void.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from automated_etl_pipeline_spark.session import get_spark


def clusters_run(n_nodes: int, algo: str) -> dict:
    from automated_etl_pipeline_spark.dedup import cluster as cc

    spark = get_spark("cc-smoke", master="local[32]", shuffle_partitions=64)
    verts = spark.range(n_nodes).select(F.col("id"))
    # groups of 5: edges (5k, 5k+j) for j in 1..4
    edges = (
        spark.range(n_nodes // 5)
        .select((F.col("id") * 5).alias("base"))
        .select(
            "base",
            F.explode(F.sequence(F.lit(1), F.lit(4))).alias("j"),
        )
        .select(
            F.col("base").alias("src"), (F.col("base") + F.col("j")).alias("dst")
        )
        .localCheckpoint(eager=True)
    )
    stats: dict = {}
    t0 = time.time()
    if algo == "stars":
        out = cc.connected_components_stars(
            verts, edges, stats_out=stats
        )
    else:
        out = cc.connected_components(verts, edges)
    bad = out.filter(
        F.col("component") != (F.col("id") - F.col("id") % 5)
    ).count()
    wall = time.time() - t0
    spark.stop()
    return {
        "shape": f"clusters-{n_nodes}",
        "algo": algo,
        "wall": round(wall, 2),
        "rounds": stats.get("rounds"),
        "violations": int(bad),
    }


def chain_run(depth: int, algo: str) -> dict:
    from automated_etl_pipeline_spark.dedup import cluster as cc

    spark = get_spark("cc-smoke", master="local[32]", shuffle_partitions=64)
    verts = spark.range(depth)
    edges = (
        spark.range(depth - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        .localCheckpoint(eager=True)
    )
    stats: dict = {}
    t0 = time.time()
    if algo == "stars":
        out = cc.connected_components_stars(
            verts, edges, max_iter=200, stats_out=stats
        )
    else:
        out = cc.connected_components(verts, edges, max_iter=depth + 1)
    bad = out.filter(F.col("component") != 0).count()
    wall = time.time() - t0
    spark.stop()
    return {
        "shape": f"chain-{depth}",
        "algo": algo,
        "wall": round(wall, 2),
        "rounds": stats.get("rounds"),
        "violations": int(bad),
    }


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    shapes = [
        ("clusters", 1_000_000, "prop"),
        ("clusters", 1_000_000, "stars"),
        ("clusters", 4_000_000, "stars"),
        ("chain", 100, "prop"),
        ("chain", 200, "prop"),
        ("chain", 10_000, "stars"),
        ("chain", 1_000_000, "stars"),
    ]
    walls: dict[tuple, list[float]] = {s: [] for s in shapes}
    results: dict[tuple, dict] = {}
    for r in range(reps):
        for shape in shapes:
            kind, size, algo = shape
            res = clusters_run(size, algo) if kind == "clusters" else chain_run(size, algo)
            walls[shape].append(res["wall"])
            results[shape] = res
            print(f"rep{r} {res}", flush=True)
    print("\n== medians ==")
    for shape in shapes:
        med = statistics.median(walls[shape])
        res = results[shape]
        print(
            f"{res['shape']:>16} algo={res['algo']:5} wall_median={med:7.2f}s"
            f" rounds={res['rounds']} violations={res['violations']}"
        )


if __name__ == "__main__":
    main()
