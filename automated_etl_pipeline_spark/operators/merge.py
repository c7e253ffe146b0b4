"""Upsert / MERGE-INTO semantics over snapshot tables (warehouse CDC).

The reference's load policy is blind WRITE_APPEND (spark-bq-dag.py:124)
— correct only for immutable facts.  Mutable entities (customers,
orders that change status) need MERGE: new batch rows REPLACE matching
snapshot rows, non-matching rows insert, absent rows survive.  Delta
Lake spells this ``MERGE INTO``; on plain parquet the engine rewrites
the snapshot with last-writer-wins semantics, which is what this
operator expresses relationally.

Dataflow: union(snapshot tagged 0, updates tagged epoch) →
row_number() over (key ORDER BY version DESC, tag DESC) → keep rank 1.
A window, not a join: one shuffle on the key, no null-handling
asymmetry between matched/unmatched branches, and multiple update
batches compose by unioning more tagged inputs.

Scale notes:
- One hash shuffle on the merge key; the window's per-key sort is over
  snapshot+batch copies of that key only (2-3 rows typical).
- At petabyte scale the rewrite should be partition-pruned: join the
  update batch's distinct partition values first and rewrite only
  touched partitions (the standard copy-on-write MERGE trick).  The
  relational core — this operator — is unchanged by that optimization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    snapshot: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    version_col: str | None = None,
) -> DataFrame:
    """Last-writer-wins MERGE: updates replace snapshot rows on key
    match, insert otherwise.

    With ``version_col`` set, the highest version wins regardless of
    which side it came from (out-of-order CDC batches merge
    correctly); ties break toward ``updates``.  Without it, ``updates``
    always wins — plain upsert.
    """
    tagged = snapshot.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    order = (
        [F.col(version_col).desc(), F.col("__src").desc()]
        if version_col
        else [F.col("__src").desc()]
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__src", "__rn")
    )


def merge_delete(
    snapshot: DataFrame, tombstones: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """MERGE ... WHEN MATCHED THEN DELETE: anti-join on the key set."""
    return snapshot.join(
        F.broadcast(tombstones.select(*key_cols).distinct()),
        list(key_cols),
        "left_anti",
    )
