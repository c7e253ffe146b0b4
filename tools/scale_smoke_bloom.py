"""Bloom point-lookup file-skipping scale smoke (r15, VERDICT r14
ask #1).

``manifest_bloom_point_lookup`` proves pruned point lookups CORRECT;
this measures the 100-TB payoff: on a high-cardinality UNSORTED key,
per-file zone maps degenerate (every file's [min, max] straddles any
probe, so an equality lookup scans O(files)), while per-file Bloom
sidecars keep the scanned set at the files that actually hold the key
plus a false-positive tail that is a fixed small FRACTION per file —
the scanned COUNT stays O(1) as the table grows when bitmaps are
sized to the per-file key count.

Per shape R in (1, 4, 16):
- a table of 100k x R unique keys, committed as 4R appends of 25k
  keys each, hash-scattered so every file spans nearly the full key
  range (repartition(2): 8R files of ~12.5k keys; 131072-bit bitmaps
  -> ~1% fp per file);
- one fixed-position probe key (the 12_345th smallest, present at
  every R) looked up via read_table_pruned with eq= (bloom+zone) and
  with only the equality range predicate (zone-only);
- reported: files_total, files scanned by each mechanism, the scanned
  fractions, and result equality vs the unpruned filter.

Usage: python tools/scale_smoke_bloom.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from automated_etl_pipeline_spark.io.manifest import (  # noqa: E402
    commit_append,
    read_table,
    read_table_pruned,
)
from automated_etl_pipeline_spark.session import get_spark  # noqa: E402

BASE_N = 100_000
PROBE_RANK = 12_345
BLOOM_BITS = 131_072


def build_table(spark, rep: int, root: str) -> int:
    n = BASE_N * rep
    n_appends = 4 * rep
    keys = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    )
    for a in range(n_appends):
        # hash-scatter membership so each append (hence each file)
        # spans nearly the full key range — the worst case for zone
        # maps, the normal case for an ingest-ordered table whose key
        # is not the clustering column
        chunk = keys.filter(F.pmod(F.xxhash64("k"), n_appends) == a)
        commit_append(
            chunk.repartition(2),
            root,
            f"a{a}",
            stats_cols=["k"],
            bloom_cols=["k"],
            bloom_bits=BLOOM_BITS,
        )
    return n_appends


def main() -> None:
    spark = get_spark(
        "bloom-smoke", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    print(
        f"# bloom point-lookup smoke: {BASE_N}xR keys, 4R appends x 2 "
        f"files, m={BLOOM_BITS}, probe = key {PROBE_RANK}"
    )
    print(
        "# R | files | bloom_scan | zone_scan | bloom_frac | zone_frac"
        " | rows_ok | build_s | probe_ms"
    )
    for rep in (1, 4, 16):
        root = tempfile.mkdtemp(prefix=f"spark_graft_bloomsmoke_{rep}_")
        try:
            t0 = time.perf_counter()
            build_table(spark, rep, root)
            build_s = time.perf_counter() - t0
            probe = PROBE_RANK  # keys are 0..N-1: rank == value
            t1 = time.perf_counter()
            pruned, total, n_bloom = read_table_pruned(
                spark, root, eq={"k": probe}
            )
            got = pruned.filter(F.col("k") == probe).collect()
            probe_ms = (time.perf_counter() - t1) * 1000
            _, _, n_zone = read_table_pruned(
                spark, root, predicates={"k": (probe, probe)}
            )
            truth = (
                read_table(spark, root).filter(F.col("k") == probe).collect()
            )
            rows_ok = sorted(map(tuple, got)) == sorted(map(tuple, truth))
            print(
                f"{rep:3d} | {total:5d} | {n_bloom:10d} | {n_zone:9d} | "
                f"{n_bloom / total:10.3f} | {n_zone / total:9.3f} | "
                f"{int(rows_ok):7d} | {build_s:7.1f} | {probe_ms:8.0f}"
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
