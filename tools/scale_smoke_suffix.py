"""Suffix-array smoke: does prefix doubling hold its shape as the
corpus grows, and does a duplication-heavy corpus change the cost?

The operator's 100-TB claim (dedup/suffix_array.py docstring) is
structural: O(log Lmax) doubling rounds — bounded by the LONGEST
DOCUMENT, not the corpus — each round one equi-join plus one
re-densify, no global windows, driver materializations bounded by
shuffle-partition counts.  This smoke measures the two axes that
claim implies:

1. **Corpus growth at fixed Lmax** (replicas of sf0.1 documents with
   per-replica token salts => no cross-replica duplicates): rounds
   must stay at ceil(log2(Lmax+1)) and wall should grow ~linearly
   with token count (each round's join/aggregate is size-proportional
   with fixed round count).
2. **Duplication density** (unsalted replicas => every doc occurs R
   times, every position's match_len is maximal): same corpus size as
   the salted shape — measures whether heavy duplication (long LCPs,
   dense spans) changes the cost shape.  It should NOT: the LCP
   descent does the same ceil(log2)+1 level joins regardless of how
   long the matches are (greedy skips, never scans).

Correctness cross-check per shape: in the salted corpus every
position's match_len must equal its unsalted-base value ONLY within
its own replica — cheaper invariant used here: the dup-heavy corpus
must report every real position with match_len == remaining doc
length (every suffix recurs in the doc's R-1 twins), verified
exactly; the salted corpus must reproduce the 1x base corpus's total
sum(match_len) per replica.

Usage: python tools/scale_smoke_suffix.py [base_sf_dir] [reps]
Defaults: /root/testdata/sf0.1, 2 reps, shapes 1x / 4x / 8x salted
+ 4x dup-heavy.

Methodology per SCALE_SMOKE_r06: medians of alternating fresh-session
reps; invariants checked once in a final session.  Run STANDALONE —
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


def corpus(spark, base_dir: str, replicas: int, salted: bool):
    docs = spark.read.parquet(f"{base_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = spark.range(replicas).select(F.col("id").alias("__r"))
    out = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("__r") * n).alias("doc_id"),
        (
            F.when(
                F.lit(salted) & (F.trim("text") != ""),
                # per-replica token salt: suffix every token with _r<i>
                # via transform over the FILTERED split array — a
                # bijective rename even when the base text carries
                # consecutive spaces (a regexp_replace of every single
                # space would glue 'a  b' into the token '_r0b', r10
                # ADVICE), matching the whitespace normalization the
                # operator itself applies
                F.array_join(
                    F.transform(
                        F.filter(F.split("text", " "), lambda t: t != ""),
                        lambda t: F.concat(t, F.lit("_r"), F.col("__r")),
                    ),
                    " ",
                ),
            ).otherwise(F.col("text"))
        ).alias("text"),
    )
    return out.repartition(32)


def one_run(base_dir: str, replicas: int, salted: bool) -> dict:
    from automated_etl_pipeline_spark.dedup import suffix_array as sa

    spark = get_spark(
        "suffix-smoke", master="local[32]", shuffle_partitions=64
    )
    docs = corpus(spark, base_dir, replicas, salted).localCheckpoint(eager=True)
    n_tokens = docs.select(
        F.sum(F.size(F.filter(F.split("text", " "), lambda t: t != "")))
    ).collect()[0][0]
    t0 = time.time()
    ml = sa.match_lengths(docs)
    total = ml.agg(
        F.count(F.lit(1)).alias("n"), F.sum("match_len").alias("s")
    ).collect()[0]
    wall = time.time() - t0
    out = {
        "replicas": replicas,
        "salted": salted,
        "n_tokens": int(n_tokens),
        "positions": int(total["n"]),
        "sum_match_len": int(total["s"]),
        "wall": round(wall, 2),
    }
    spark.stop()
    return out


def dup_invariant(base_dir: str, replicas: int) -> int:
    """Dup-heavy corpus: every real position must have match_len ==
    tokens_remaining (its full suffix recurs in a twin doc).  Returns
    the violation count (must be 0)."""
    from automated_etl_pipeline_spark.dedup import suffix_array as sa

    spark = get_spark(
        "suffix-smoke-inv", master="local[32]", shuffle_partitions=64
    )
    docs = corpus(spark, base_dir, replicas, salted=False).localCheckpoint(
        eager=True
    )
    ml = sa.match_lengths(docs)
    lens = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("__len"),
    )
    bad = (
        ml.join(lens, "doc_id")
        .filter(F.col("match_len") != F.col("__len") - F.col("pos"))
        .count()
    )
    spark.stop()
    return bad


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    shapes = [(1, True), (4, True), (8, True), (4, False)]
    walls: dict[tuple[int, bool], list[float]] = {s: [] for s in shapes}
    results: dict[tuple[int, bool], dict] = {}
    for r in range(reps):
        for shape in shapes:
            res = one_run(base, *shape)
            walls[shape].append(res["wall"])
            results[shape] = res
            print(f"rep{r} {res}", flush=True)
    print("\n== medians ==")
    base_med = None
    for shape in shapes:
        med = statistics.median(walls[shape])
        res = results[shape]
        if shape == (1, True):
            base_med = med
        ratio = med / base_med if base_med else float("nan")
        print(
            f"replicas={shape[0]:2d} salted={shape[1]} tokens={res['n_tokens']:>9,}"
            f" wall_median={med:7.2f}s x_vs_1x={ratio:5.2f}"
        )
    one = results[(1, True)]["sum_match_len"]
    for r in (4, 8):
        got = results[(r, True)]["sum_match_len"]
        ok = "ok" if got == r * one else "VIOLATION"
        print(
            f"salted-replica invariant {r}x: sum_match_len {got:,}"
            f" == {r} * {one:,}: {ok}"
        )
    bad = dup_invariant(base, 4)
    print(f"dup-heavy invariant violations (must be 0): {bad}")


if __name__ == "__main__":
    main()
