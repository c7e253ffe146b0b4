"""Bloom-filter semi-join pruning — the runtime-filter pattern.

The 100 TB problem: a selective predicate lives on a small dimension
(``s_acctbal > 4500``) but the cost lives in the fact scan
(``lineitem``).  A plain semi join still shuffles (or at best
broadcast-hashes) every fact row; a Bloom filter built from the
reduced dimension keys and evaluated *inside the fact scan's
projection* drops most non-matching rows before any join machinery
runs — exactly what Spark's own ``InjectRuntimeFilter`` does with
``BloomFilterAggregate``/``BloomFilterMightContain``, re-expressed
here with portable arithmetic so a DuckDB oracle can reproduce the
filter bit-for-bit and the gate can hash-compare the *decisions*
(pass counts, false positives, verified results), not just the final
answer.

Construction (identical in both engines):

- Two base hashes per key from one md5: ``h1 = int(md5(key)[0:8],
  16)``, ``h2 = int(md5(key)[8:16], 16)``.
- k probe positions by Kirsch-Mitzenmacher double hashing
  (``pos_i = (h1 + i*h2) mod m``) — k positions from one digest,
  the standard trick that loses nothing asymptotically (Kirsch &
  Mitzenmacher 2006).
- The set-bit inventory is aggregated distributed-side as
  ``DISTINCT (pos)`` — a partial+final aggregate bounded by m rows —
  and the driver folds it into the bitmap (PySpark's ``shiftleft``
  only takes a literal shift amount, so the variable bit-fold is the
  one step done on m collected integers rather than in the JVM).

Probing: the bitmap is inlined as an m-char '0'/'1' string literal
and probed with ``substr(bits, pos+1, 1) = '1'`` — ``Column.substr``
accepts column arguments, so the probe is a pure column expression in
the fact scan: no join, no UDF, whole-stage-codegen eligible.
Spark's own runtime filter broadcasts its bitmap the same way; m/8
bytes ride into every task as part of the serialized plan.

Sizing at scale: m should be ~10-15 bits per expected distinct key
(1% fp at k=7); the gate pins m=1024/k=4 so the sf0.1 leg actually
*exercises* the false-positive path (n≈490 keys saturates to ~50% fp)
while sf0.01 (n=49) runs nearly fp-free — false positives are always
re-verified by the exact semi join on the surviving rows, so the
result is exact at every saturation level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from automated_etl_pipeline_spark.functions.hashutil import md5_double_hash

M_BITS = 1024
K_HASHES = 4


def _positions(key: Column) -> list[Column]:
    h1, h2 = md5_double_hash(key)
    return [(h1 + F.lit(i) * h2) % M_BITS for i in range(K_HASHES)]


def bloom_build(keys: DataFrame, key_col: str) -> str:
    """Aggregate the distinct non-null keys of ``keys[key_col]`` into
    an m-bit Bloom bitmap; returns the bitmap as an m-char '0'/'1'
    string (index = position).  Distributed: explode k positions per
    key, one partial+final DISTINCT aggregation over at most m
    position groups; the driver holds only the <= m set positions."""
    pos_rows = (
        keys.filter(F.col(key_col).isNotNull())
        .select(F.explode(F.array(*_positions(F.col(key_col)))).alias("p"))
        .distinct()
        .collect()
    )
    bits = ["0"] * M_BITS
    for r in pos_rows:
        bits[r["p"]] = "1"
    return "".join(bits)


def bloom_might_contain(key: Column, bitmap: str) -> Column:
    """Pure-expression probe: true iff all k bits for ``key`` are set
    in the inlined bitmap literal.  NULL keys probe false."""
    if len(bitmap) != M_BITS:
        raise ValueError(f"bitmap must be {M_BITS} chars, got {len(bitmap)}")
    lit = F.lit(bitmap)
    checks = [
        lit.substr(p.cast("int") + 1, F.lit(1)) == "1" for p in _positions(key)
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return F.when(key.isNull(), F.lit(False)).otherwise(out)
