"""Late-r12 operator smoke: do the triangle counter, the Gram/count-min
bounded-shuffle reductions, and the containment prefix join hold their
claimed shapes as data grows?

Claims under test (each operator's docstring):

- ``graph/triangles.triangle_stats`` — after degree-ordered
  orientation the wedge join is bounded by oriented wedges, NOT the
  undirected total ``sum C(deg,2)``.  A planted hub makes the two
  diverge: the star's quadratic wedge total must not surface in the
  wall clock because every spoke->hub edge orients INTO the hub and
  generates zero oriented candidates.
- ``similarity/gram.gram_upper_triangle`` and
  ``functions/countmin.cm_build`` — map-side combine caps each task's
  shuffle output at d(d+1)/2 = 2,080 (resp. d*w = 1,024) rows, so
  with the input coalesced to a FIXED partition count the aggregate
  exchange's record count must stay CONSTANT while input rows grow
  16x (measured via the JVM SQLMetrics, tools/metrics_report.py).
- ``dedup/containment.containment_pairs`` — shingle-keyed equi-joins
  only: wall and output grow ~linearly on SALTED replicas (salting
  keeps replicas from cross-matching; unsalted replicas are the
  genuine-duplicate-blowup case that exact dedup must absorb first).

Usage: python tools/scale_smoke_r12b.py [base_sf_dir] [reps]
Defaults: /root/testdata/sf0.1, 2 reps.

Methodology per SCALE_SMOKE_r06: medians over reps, run STANDALONE —
wall numbers under concurrent JVMs are void.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from automated_etl_pipeline_spark.session import get_spark
from tools.metrics_report import report


def synth_edges(spark, n_nodes: int, n_rand: int, hub_spokes: int):
    """Seed-free deterministic graph: n_rand md5-derived random edges
    over n_nodes plus a hub (node 0) with hub_spokes spokes."""
    r = spark.range(n_rand).select(
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("u"), "id")), 1, 12), 16, 10)
            .cast("long") % n_nodes
        ).alias("a"),
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("v"), "id")), 1, 12), 16, 10)
            .cast("long") % n_nodes
        ).alias("b"),
    )
    rand = (
        r.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
    )
    hub = spark.range(1, hub_spokes + 1).select(
        F.lit(0).cast("long").alias("u"), F.col("id").alias("v")
    )
    return rand.unionAll(hub).distinct()


def run_triangles(spark, r: int) -> tuple[float, dict]:
    from automated_etl_pipeline_spark.graph.triangles import triangle_stats
    from automated_etl_pipeline_spark.plans.materialize import materialize

    edges = materialize(
        synth_edges(
            spark, n_nodes=2000 * r, n_rand=8000 * r, hub_spokes=1500 * r
        )
    )
    t0 = time.perf_counter()
    row = triangle_stats(edges).collect()[0]
    return time.perf_counter() - t0, row.asDict()


def _shuffle_records(tree) -> int:
    return sum(
        v.get("shuffle records written", 0) + v.get("shuffleRecordsWritten", 0)
        for _, _, v in tree
    )


def run_gram(spark, base: str, r: int) -> tuple[float, dict]:
    from automated_etl_pipeline_spark.similarity.gram import gram_upper_triangle

    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    reps = spark.range(r).select(F.col("id").alias("__r"))
    big = (
        emb.crossJoin(F.broadcast(reps))
        .select("vec_id", "embedding")
        .coalesce(8)
        .localCheckpoint(eager=True)
    )
    n = big.count()
    t0 = time.perf_counter()
    g = gram_upper_triangle(big)
    tree = report(g)
    wall = time.perf_counter() - t0
    return wall, {"n_vecs": n, "shuffle_records": _shuffle_records(tree)}


def run_cm(spark, base: str, r: int) -> tuple[float, dict]:
    from automated_etl_pipeline_spark.functions.countmin import cm_build

    docs = spark.read.parquet(f"{base}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    reps = spark.range(r).select(F.col("id").alias("__r"))
    toks = (
        docs.crossJoin(F.broadcast(reps))
        .select(F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 3)
    )
    occ = (
        toks.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("t", i),
                        F.element_at("t", i + 1),
                        F.element_at("t", i + 2),
                    ),
                )
            ).alias("g")
        )
        .coalesce(8)
        .localCheckpoint(eager=True)
    )
    n = occ.count()
    t0 = time.perf_counter()
    tree = report(cm_build(occ, "g"))
    wall = time.perf_counter() - t0
    return wall, {"n_items": n, "shuffle_records": _shuffle_records(tree)}


def run_containment(spark, base: str, r: int) -> tuple[float, dict]:
    from automated_etl_pipeline_spark.dedup.containment import containment_pairs

    docs = spark.read.parquet(f"{base}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    n0 = docs.count()
    reps = spark.range(r).select(F.col("id").alias("__r"))
    big = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("__r") * n0 * 10).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda t: F.concat(t, F.lit("_r"), F.col("__r")),
                ),
                " ",
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    t0 = time.perf_counter()
    n_pairs = containment_pairs(big, threshold=0.8).count()
    return time.perf_counter() - t0, {"n_docs": n0 * r, "n_pairs": n_pairs}


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    walls: dict[tuple[str, int], list[float]] = {}
    stats: dict[tuple[str, int], dict] = {}
    plans = [
        ("triangles", [1, 4, 16], lambda sp, r: run_triangles(sp, r)),
        ("gram", [1, 4, 16], lambda sp, r: run_gram(sp, base, r)),
        ("countmin", [1, 4, 16], lambda sp, r: run_cm(sp, base, r)),
        ("containment", [1, 2, 4], lambda sp, r: run_containment(sp, base, r)),
    ]
    for rep in range(n_reps):
        for name, shapes, fn in plans:
            for r in shapes:
                spark = get_spark(f"smoke_r12b_{name}_{r}x_{rep}")
                wall, out = fn(spark, r)
                walls.setdefault((name, r), []).append(wall)
                stats[(name, r)] = out
                print(
                    f"[rep{rep}] {name} {r}x: {wall:.2f}s {out}", flush=True
                )
    print("\n== medians ==")
    for (name, r), ws in sorted(walls.items()):
        print(f"{name} {r}x: {statistics.median(ws):.2f}s {stats[(name, r)]}")
    # invariant checks
    tri16 = stats[("triangles", 16)]
    assert tri16["n_wedges_oriented"] * 10 < tri16["n_wedges_total"], (
        "hub construction failed to separate oriented vs total wedges"
    )
    g1, g16 = stats[("gram", 1)], stats[("gram", 16)]
    assert g16["shuffle_records"] <= g1["shuffle_records"] * 2, (
        "gram shuffle records grew with input — map-side combine broken"
    )
    c1, c16 = stats[("countmin", 1)], stats[("countmin", 16)]
    assert c16["shuffle_records"] <= c1["shuffle_records"] * 2, (
        "count-min shuffle records grew with input"
    )
    ct = stats[("containment", 4)]
    assert ct["n_pairs"] == stats[("containment", 1)]["n_pairs"] * 4, (
        "salted replicas should scale containment output exactly linearly"
    )
    print("invariants ok")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
