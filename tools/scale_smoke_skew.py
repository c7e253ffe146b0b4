"""Skewed-replica scale smoke (VERDICT r5 ask #3).

The r5 scale smoke (SCALE_SMOKE_r05.md) replicated sf0.1 10x with
PRESERVED per-key cardinality — which by construction never triggers
AQE's skew-join split or operators/skew.py's salting.  This harness is
the missing adversarial half: the same 10x key-shifted replica, then
deliberately skewed —

- orders:   ~10% of rows reassigned to ONE hot customer (a real
            power-law fact: one tenant owning a tenth of the traffic);
- lineitem: ~2% of rows reassigned to ONE hot order (a giant group
            for q18's per-order aggregate);
- events:   ~50% of rows collapsed onto one event_type (stresses the
            salted vs unsalted low-cardinality aggregate);
- documents: a fixed 5-token suffix appended to ~20% of docs -> three
            3-gram shingles with df = 0.2*corpus (the hot-shingle case
            PPJoin's frequency-ascending prefix order must shrug off;
            minhash/simhash banding sees the same hot overlap).

It then measures:
1. the verdict's heavy hitters (q18_large_orders, dedup_ngram_jaccard,
   dedup_minhash_lsh, dedup_simhash_pairs, salted_skew_agg) on the
   skewed replica — compare to SCALE_SMOKE_r05.md's friendly-replica
   numbers;
2. salted_skew_agg vs its unsalted twin on the skewed events;
3. a hot-key orders x customer join three ways — plain SMJ with AQE
   skew split OFF, ON (final plan must show ``skew=true``), and
   operators/skew.salted_join — so both skew levers are EXERCISED,
   not just designed.

AQE's skew split triggers at max(skewedPartitionThresholdInBytes,
factor*median); the defaults (256 MB) are sized for real clusters, so
the probe lowers them (and disables auto-broadcast, which at REAL
scale would be demoted anyway since customer scales with SF) to make
the runtime path observable at test scale.  That is scaling the
detector to the fixture, not faking the result: the split decision
logic that runs is the same code that runs at 100 TB.

Usage: python tools/scale_smoke_skew.py [--rebuild] [--flat]
``--flat`` builds/uses an UNSKEWED twin of the replica (same 10x
key-shift, no hot keys) and runs the same registry probes — the
same-day control that isolates skew cost from host drift.
Writes nothing to the repo; prints a markdown-ready result table.
Replica lives at /tmp/spark_graft_sf1_skew (~1 GB; _flat for control).
"""

from __future__ import annotations

import gc
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_etl_pipeline_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
FLAT = "--flat" in sys.argv
DST = "/tmp/spark_graft_sf1_skew" + ("_flat" if FLAT else "")
REPLICAS = 10

# max key per sf0.1 table (probed once, hardcoded for determinism of
# the shift stride; stride = max+1)
_SHIFT_COLS = {
    # table -> {col: stride_source_table}
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_suppkey": "supplier",
        "l_partkey": "part",
    },
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
_KEY_OF = {
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

HOT_SUFFIX = " hotshg1 hotshg2 hotshg3 hotshg4 hotshg5"


def build_replica(spark: SparkSession) -> None:
    shutil.rmtree(DST, ignore_errors=True)
    Path(DST).mkdir(parents=True)

    from automated_etl_pipeline_spark.io.sources import load_testdata

    base = load_testdata(
        spark,
        SRC,
        ["region", "nation", "customer", "supplier", "part", "orders",
         "lineitem", "events", "documents", "embeddings"],
    )
    strides = {
        t: base[t].agg(F.max(_KEY_OF[t])).first()[0] + 1 for t in _KEY_OF
    }
    # hot targets: real keys from replica 0 so every FK stays valid
    hot_cust = base["customer"].agg(F.min("c_custkey")).first()[0]
    hot_order = base["orders"].agg(F.min("o_orderkey")).first()[0]
    hot_type = (
        base["events"].groupBy("event_type").count()
        .orderBy(F.desc("count")).first()[0]
    )

    for t in ("region", "nation"):  # fixed-cardinality dims: copy once
        base[t].write.mode("overwrite").parquet(f"{DST}/{t}.parquet")

    for t, shifts in _SHIFT_COLS.items():
        parts = []
        for r in range(REPLICAS):
            df = base[t]
            for col, stbl in shifts.items():
                df = df.withColumn(
                    col, F.col(col) + F.lit(r * strides[stbl])
                )
            if t == "documents":
                # per-replica token suffix: near-dup STRUCTURE
                # replicates instead of every doc gaining 9 exact
                # copies (same rationale as SCALE_SMOKE_r05.md)
                df = df.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda tok: F.concat(tok, F.lit(f"_r{r}")),
                        ),
                        " ",
                    ),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # --- the skew injection ---
        if FLAT:
            pass  # control replica: key-shifted copies only
        elif t == "orders":
            out = out.withColumn(
                "o_custkey",
                F.when(F.rand(7) < 0.10, F.lit(hot_cust)).otherwise(
                    F.col("o_custkey")
                ),
            )
        elif t == "lineitem":
            out = out.withColumn(
                "l_orderkey",
                F.when(F.rand(11) < 0.02, F.lit(hot_order)).otherwise(
                    F.col("l_orderkey")
                ),
            )
        elif t == "events":
            out = out.withColumn(
                "event_type",
                F.when(F.rand(13) < 0.50, F.lit(hot_type)).otherwise(
                    F.col("event_type")
                ),
            )
        elif t == "documents":
            out = out.withColumn(
                "text",
                F.when(
                    F.rand(17) < 0.20,
                    F.concat(F.col("text"), F.lit(HOT_SUFFIX)),
                ).otherwise(F.col("text")),
            )
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"built {t}", flush=True)


def timed(label: str, fn) -> float:
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s", flush=True)
    return dt


def main() -> None:
    spark = get_spark("skew-smoke")
    if "--rebuild" in sys.argv or not Path(f"{DST}/lineitem.parquet").exists():
        build_replica(spark)
        spark.stop()
        spark = get_spark("skew-smoke")

    import __spark_entry__ as entry_mod

    from automated_etl_pipeline_spark.queries import RETIRED

    qs = {**RETIRED, **entry_mod.queries()}  # retired gates still smokeable
    WARM = "/root/testdata/sf0.001"

    results: dict[str, float] = {}
    heavy = [
        "q18_large_orders",
        "salted_skew_agg",
        "scd2_priority_history",
        "j1_region_revenue",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash_pairs",
    ]
    for i, name in enumerate(heavy):
        if i and i % 4 == 0:
            spark.stop()
            spark = get_spark("skew-smoke")
        fn = qs[name]
        try:
            fn(spark, WARM).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        results[name] = timed(
            name,
            lambda: fn(spark, DST).write.format("noop").mode("overwrite").save(),
        )
        gc.collect()

    # --- salted vs unsalted twin on the 50%-hot event_type ---
    spark.stop()
    spark = get_spark("skew-smoke")
    events = spark.read.parquet(f"{DST}/events.parquet")

    def unsalted():
        (
            events.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double")
                .alias("sum_value"),
            )
            .write.format("noop").mode("overwrite").save()
        )

    unsalted()  # warm
    results["unsalted_twin"] = timed("unsalted_twin", unsalted)

    # --- hot-key join three ways -------------------------------------
    orders = spark.read.parquet(f"{DST}/orders.parquet")
    customer = spark.read.parquet(f"{DST}/customer.parquet")

    def join_count(j: DataFrame) -> int:
        return j.groupBy("c_nationkey").agg(F.sum("o_totalprice")).count()

    # carry measure columns so the hot partition has realistic width
    # (an 8-byte pruned key alone compresses below any sane skew
    # threshold at fixture scale)
    probe = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    ).join(
        customer.select("c_custkey", "c_nationkey"),
        F.col("o_custkey") == F.col("c_custkey"),
    )

    # scale the skew detector to the fixture (see module docstring)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "128k"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    join_count(probe)  # warm the scan
    results["hotjoin_smj_noskewfix"] = timed(
        "hotjoin smj (AQE skew OFF)", lambda: join_count(probe)
    )

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    agg = probe.groupBy("c_nationkey").agg(F.sum("o_totalprice"))
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    skew_engaged = "skew=true" in plan
    results["hotjoin_smj_aqeskew"] = timed(
        "hotjoin smj (AQE skew ON)", lambda: join_count(probe)
    )
    print(f"AQE skew split engaged (skew=true in final plan): {skew_engaged}")

    from automated_etl_pipeline_spark.operators.skew import salted_join

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    ordk = orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        "o_totalprice",
        "o_orderdate",
    )
    sj = salted_join(
        ordk, customer.select("c_custkey", "c_nationkey"), "c_custkey"
    )
    results["hotjoin_salted"] = timed(
        "hotjoin salted_join (AQE skew OFF)", lambda: join_count(sj)
    )

    print("\n| probe | skewed 10x (s) |")
    print("|---|---|")
    for k, v in results.items():
        print(f"| {k} | {v:.2f} |")
    if not skew_engaged:
        print("WARNING: AQE skew split did NOT engage — check thresholds")
    spark.stop()


if __name__ == "__main__":
    main()
