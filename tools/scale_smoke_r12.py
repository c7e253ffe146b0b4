"""r12 operator smoke: do the Kneser-Ney scorer, the HTML extractor,
and the pinned-logit quality filter hold their claimed shapes as the
corpus grows?

Claims under test (each operator's docstring):
- ``kneser_ney.kn_doc_scores`` — three partial-aggregated
  equi-shuffles for the LM statistics plus natural-key scoring joins:
  wall should grow ~linearly in corpus size, no super-linear stage.
- ``html.extract_text`` — one projection of chained JVM regex/replace
  expressions: map-side linear, no shuffle before the report agg.
- ``quality_filter.pinned_logit_columns`` — one integer projection:
  map-side linear.

Corpus: the KN scorer runs on SALTED replicas of sf0.1 documents
(per-replica bijective token rename, the suffix-smoke construction)
so the LM's type tables GROW with the corpus — the adversarial shape
for the scorer's join tables.  The map-side html/logit ops run on
UNSALTED replicas (salting inflates n_chars ~40% and pushes the
pinned logit's keep rate to zero — a threshold artifact unrelated to
scale).

Correctness cross-checks per shape (exactness, not wall):
- KN: per-part doc counts must follow the exact
  ceil(N*0.25)/ceil(N*0.75) cut arithmetic at every size (per-replica
  vocabularies do NOT factorize the LM — T and V grow R-fold and
  shift the continuation floor — so value identities across sizes
  don't hold by design).
- HTML: n_docs == R * base and every extracted string non-empty.
- Logit: n_kept identical across reps of the same shape
  (determinism) and 0 < n_kept < n_docs (non-degenerate split).

Usage: python tools/scale_smoke_r12.py [base_sf_dir] [reps]
Defaults: /root/testdata/sf0.1, 2 reps, shapes 1x / 4x / 16x.

Methodology per SCALE_SMOKE_r06: medians of alternating fresh-session
reps.  Run STANDALONE — wall numbers under concurrent JVMs are void.
"""

from __future__ import annotations

import math
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from automated_etl_pipeline_spark.session import get_spark


def corpus(spark, base_dir: str, replicas: int, salted: bool):
    # salted replicas give the KN LM a vocabulary that GROWS with the
    # corpus (its adversarial shape); the map-side html/logit ops run
    # UNSALTED — salting inflates n_chars ~40% and pushes the pinned
    # logit's keep rate to zero, which would break the non-degenerate
    # invariant for a reason unrelated to scale
    docs = spark.read.parquet(f"{base_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = spark.range(replicas).select(F.col("id").alias("__r"))
    return docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("__r") * n).alias("doc_id"),
        F.when(
            F.lit(salted) & (F.trim("text") != ""),
            F.array_join(
                F.transform(
                    F.filter(F.split("text", " "), lambda t: t != ""),
                    lambda t: F.concat(t, F.lit("_r"), F.col("__r")),
                ),
                " ",
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
    )


def run_kn(spark, docs) -> dict:
    from automated_etl_pipeline_spark.functions.kneser_ney import kn_partition

    target = docs.filter(F.col("lang") == "en")
    parts = (
        kn_partition(docs, target)
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r["part"]: r["n"] for r in parts}


def run_html(spark, docs) -> dict:
    from automated_etl_pipeline_spark.functions.html import extract_text

    wrapper = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit('</title><style>p{x:1}</style><script>s="</p>";</script>'
              "</head><body><p>"),
        F.col("text"),
        F.lit("</p><div>footer &amp; nav</div></body></html>"),
    )
    row = (
        docs.select(extract_text(wrapper).alias("x"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("x")).alias("chars"),
            F.sum(F.when(F.length("x") > 0, 0).otherwise(1)).alias("empty"),
        )
        .collect()[0]
    )
    return {"n": row["n"], "chars": row["chars"], "empty": row["empty"]}


def run_logit(spark, docs) -> dict:
    from automated_etl_pipeline_spark.ml.quality_filter import (
        pinned_logit_columns,
        raw_text_counts,
    )

    z, keep = pinned_logit_columns()
    row = (
        raw_text_counts(docs)
        .select(keep.alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("k"), 1).otherwise(0)).alias("kept"),
        )
        .collect()[0]
    )
    return {"n": row["n"], "kept": row["kept"]}


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    shapes = [1, 4, 16]
    ops = {"kn": run_kn, "html": run_html, "logit": run_logit}
    walls: dict[tuple[str, int], list[float]] = {}
    results: dict[tuple[str, int], dict] = {}
    for rep in range(n_reps):
        for r in shapes:
            spark = get_spark(f"smoke_r12_{r}x_{rep}")
            salted = corpus(spark, base, r, salted=True).localCheckpoint(
                eager=True
            )
            plain = corpus(spark, base, r, salted=False).localCheckpoint(
                eager=True
            )
            for name, fn in ops.items():
                docs = salted if name == "kn" else plain
                t0 = time.perf_counter()
                out = fn(spark, docs)
                walls.setdefault((name, r), []).append(
                    time.perf_counter() - t0
                )
                prev = results.setdefault((name, r), out)
                assert prev == out, f"{name}@{r}x nondeterministic: {prev} vs {out}"
            spark.stop()
    base_n = results[("logit", 1)]["n"]
    for (name, r), ws in sorted(walls.items()):
        med = statistics.median(ws)
        print(f"{name:6s} {r:3d}x  wall_median={med:7.2f}s  reps={[round(w,2) for w in ws]}  out={results[(name, r)]}")
    # invariants
    for r in shapes:
        kn = results[("kn", r)]
        scored = kn.get("head", 0) + kn.get("middle", 0) + kn.get("tail", 0)
        assert kn.get("head", 0) == math.ceil(scored * 0.25), (r, kn)
        assert kn.get("head", 0) + kn.get("middle", 0) == math.ceil(
            scored * 0.75
        ), (r, kn)
        h = results[("html", r)]
        assert h["n"] == base_n * r and h["empty"] == 0, (r, h)
        lg = results[("logit", r)]
        assert lg["n"] == base_n * r and 0 < lg["kept"] < lg["n"], (r, lg)
    print("invariants ok")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
