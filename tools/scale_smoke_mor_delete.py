"""Merge-on-read DELETE scale smoke (r14).

``manifest_delete_merge_on_read`` proves the protocol CORRECT; this
measures the 100-TB payoff: deleting a fixed small key fraction from
a growing table.

Per shape R in (1, 4, 16), orders (sf0.1) replicated Rx into a
manifest table (one append per replica, 4 files each):

- **MoR delete**: ``commit_delete`` of the keys with
  ``o_orderkey % 250 == 0`` (~0.4% of keys) — measure bytes written
  (the delete-key files) and data files rewritten (always 0);
- **CoW delete** (the rewrite a format without MoR is forced into):
  ``commit_rewrite`` of the anti-joined table — measure bytes written
  and files rewritten;
- **read overhead**: wall of the same aggregate over (a) the
  pre-delete table, (b) the table with the pending MoR delete
  (anti-join at read), (c) after compaction materializes it; plus the
  row counts proving (b) == (c).

Expected at scale: MoR bytes grow with the KEY set (the answer), CoW
bytes with the TABLE; the MoR read tax is one broadcast-size
anti-join, repaid at the next scheduled compaction.

Usage: python tools/scale_smoke_mor_delete.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from automated_etl_pipeline_spark.io.manifest import (  # noqa: E402
    commit_append,
    commit_delete,
    commit_rewrite,
    current_version,
    manifest_delete_files,
    manifest_files,
    read_table,
)
from automated_etl_pipeline_spark.session import get_spark  # noqa: E402

KEY_MOD = 250  # delete ~0.4% of order keys


def _bytes(paths: list[str]) -> int:
    return sum(os.path.getsize(p) for p in paths)


def _agg_wall(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
    ).collect()[0]
    return time.perf_counter() - t0, int(row["n"])


def run_shape(spark, sf_dir: str, rep: int) -> dict:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = tempfile.mkdtemp(prefix="mor_smoke_")
    try:
        for r in range(rep):
            commit_append(
                orders.withColumn(
                    "o_orderkey", F.col("o_orderkey") * rep + r
                ).repartition(4),
                root,
                f"a{r}",
            )
        files_before = set(manifest_files(root))
        data_bytes = _bytes(sorted(files_before))
        w_pre, n_pre = _agg_wall(read_table(spark, root))

        keys = read_table(spark, root).filter(
            F.col("o_orderkey") % KEY_MOD == 0
        ).select("o_orderkey")
        t0 = time.perf_counter()
        commit_delete(keys, root, "d1", ["o_orderkey"])
        mor_commit_wall = time.perf_counter() - t0
        mor_bytes = _bytes([d["path"] for d in manifest_delete_files(root)])
        mor_rewritten = len(files_before - set(manifest_files(root)))

        w_mor, n_mor = _agg_wall(read_table(spark, root))

        # CoW twin: the rewrite a MoR-less format is forced into
        base = current_version(root)
        t0 = time.perf_counter()
        commit_rewrite(read_table(spark, root), root, "cow", expected_base=base)
        cow_wall = time.perf_counter() - t0
        files_after = set(manifest_files(root))
        cow_bytes = _bytes(sorted(files_after))
        w_compact, n_compact = _agg_wall(read_table(spark, root))

        return {
            "rep": rep,
            "rows": n_pre,
            "data_bytes": data_bytes,
            "mor_bytes": mor_bytes,
            "mor_files_rewritten": mor_rewritten,
            "mor_commit_wall": mor_commit_wall,
            "cow_bytes": cow_bytes,
            "cow_wall": cow_wall,
            "read_pre": w_pre,
            "read_mor": w_mor,
            "read_compacted": w_compact,
            "rows_mor": n_mor,
            "rows_compacted": n_compact,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    print(
        "rep rows data_MB mor_KB mor_rewritten mor_commit_s "
        "cow_MB cow_s read_pre read_mor read_compacted rows_ok"
    )
    for rep in (1, 4, 16):
        r = run_shape(spark, sf_dir, rep)
        print(
            f"{r['rep']}x {r['rows']} {r['data_bytes']/1e6:.1f} "
            f"{r['mor_bytes']/1e3:.1f} {r['mor_files_rewritten']} "
            f"{r['mor_commit_wall']:.2f} {r['cow_bytes']/1e6:.1f} "
            f"{r['cow_wall']:.2f} {r['read_pre']:.2f} {r['read_mor']:.2f} "
            f"{r['read_compacted']:.2f} "
            f"{r['rows_mor'] == r['rows_compacted']}"
        )


if __name__ == "__main__":
    main()
