"""Benchmark harness: times every registry query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <scale factor>}

Each query executes via the noop sink (forces full computation of every
column, no driver collect bottleneck, no disk write skew). One warm-up
of a tiny query first so JVM/codegen startup isn't billed to the first
query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from automated_etl_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    spark = get_spark("bench")

    # Warm-up: JVM, parquet footer reads, codegen caches.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    import gc

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # drop dangling localCheckpoint/cache blocks between queries:
        # collecting the py4j proxies makes the JVM-side Datasets
        # unreachable, and local-mode allocation pressure plus the
        # ContextCleaner then releases their blocks (measured: cut a
        # 66-query sf0.1 run from 167s to 108s; forcing System.gc()
        # per query was tried and bought nothing further)
        gc.collect()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": f"total_wall_sec_{len(timings)}_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
