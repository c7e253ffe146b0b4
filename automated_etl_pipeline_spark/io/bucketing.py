"""Bucketed tables — co-located joins without shuffles.

Bucketing pre-shuffles a table ONCE at write time: rows are hash-
partitioned into a fixed number of buckets by the join/aggregation
key (and optionally sorted within buckets). Every later join or
aggregation on that key then reads co-located data — the plan has no
Exchange on the bucketed side(s), which at 100 TB converts the
dominant repeated cost (shuffling the fact table per query) into a
one-time write cost.

Rules that make it work (asserted in tests/test_bucketing.py):
- both sides bucketed by the join key with the SAME bucket count
  (or a multiple, with spark.sql.bucketing.coalesceBucketsInJoin);
- bucket count sized so one bucket ≈ one healthy task (128-256 MB);
- sortBy(join key) additionally removes the SortMergeJoin's sort when
  each bucket is a single file (write with one task per bucket).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table in
    the session warehouse."""
    writer = df.write.format(format).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a warehouse table (bucket metadata rides along — Catalyst
    plans shuffle-free joins/aggs on the bucket key automatically)."""
    return spark.table(table)
