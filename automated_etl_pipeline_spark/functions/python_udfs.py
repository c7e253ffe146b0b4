"""The Python UDF surface done right (SURVEY.md §2.9 M1): when logic
genuinely can't be a column expression, there is a fast shape and a
slow shape for every UDF kind.

- Row-at-a-time ``F.udf`` — NEVER in a hot path (pickled Python per
  row); the engine does not use it anywhere.
- ``@pandas_udf`` (Arrow-vectorized) — scalar and grouped-aggregate
  forms; batches cross the JVM/Python boundary as Arrow columns,
  ~10-100x the row-at-a-time throughput.
- ``@udtf`` (table function, Spark 3.5+) — one row in, many rows out,
  registered into SQL; the lateral-join surface.

Both demos below are deliberately SQL-expressible (geometric mean =
exp(avg(ln)); sentence split = explode(split)) so the DuckDB oracle
can verify the Python path value-for-value — proving the boundary
crossing is lossless, which is the thing worth testing about UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("double")
def geometric_mean(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDF: exp(mean(ln(x))) per group, one
    Arrow batch per group partition — the UDAF surface."""
    return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))


@pandas_udf("long")
def log_sum_e4(v: pd.Series) -> int:
    """Grouped-aggregate pandas UDF returning the integer
    ``sum(floor(ln(x) * 1e4))`` per group.  The geometric mean derives
    as ``exp(log_sum_e4 / 1e4 / n)``, but unlike ``exp(avg(ln(x)))``
    the gate value is an integer SUM — summation order cannot move it
    (the r9 determinism rule: UDF boundary-crossing proofs use
    integer-valued statistics).  Honest residual: ``ln`` is not a
    correctly-rounded IEEE op, so numpy's log and a SQL engine's can
    disagree by a few ulps; a per-row floor tie then needs ln(x)*1e4
    within ~1e-11 of an integer (~1e-6 odds across the whole orders
    table per run) — a 4-orders-of-magnitude improvement over the
    ROUND(exp(avg(ln)),4) construct it replaced, not a proof.
    Inputs must be finite and positive; anything else raises rather
    than silently corrupting the sum (np.floor(NaN).astype(int64) is
    undefined — r9 code review)."""
    x = v.to_numpy(dtype="float64")
    if not np.all(np.isfinite(x)) or np.any(x <= 0):
        raise ValueError(
            "log_sum_e4 requires finite positive inputs (NULL/NaN/"
            "non-positive values have no logarithm); filter first"
        )
    return int(np.floor(np.log(x) * 1e4).astype(np.int64).sum())


@pandas_udf("long")
def cents_sum(v: pd.Series) -> int:
    """Grouped-aggregate pandas UDF: exact ``sum(floor(x * 100))``
    per group as int64 — the transcendental-free Arrow
    boundary-crossing proof (r10 ADVICE: ln is not correctly rounded,
    so a floor(ln(x)*1e4) gate could flip one row's term on an engine
    whose libm differs by an ulp at a floor boundary; floor(x*100) of
    the same IEEE double uses only required-IEEE mul/floor and is
    bit-identical everywhere).  The float->int conversion happens
    INSIDE Python/numpy, so a lossy Arrow crossing (truncated batch,
    wrong column, row reordering feeding a stateful accumulator)
    still breaks the oracle hash."""
    x = v.to_numpy(dtype="float64")
    if not np.all(np.isfinite(x)):
        raise ValueError(
            "cents_sum requires finite inputs; filter NULL/NaN first"
        )
    # magnitude guard (r10 review): astype(int64) WRAPS silently on
    # overflow — reject-don't-corrupt, like the finiteness check.
    # |x| < 9e13 keeps floor(x*100) exact in double and inside int64.
    if np.any(np.abs(x) >= 9e13):
        raise ValueError(
            "cents_sum requires |x| < 9e13 (int64 cent range);"
            " larger magnitudes would wrap silently"
        )
    # the GROUP sum needs its own guard: ~1e3 near-bound elements
    # wrap an int64 .sum() silently even though every element passed
    # the per-element check (r10 review #2).  Sum in Python ints
    # (exact at any width) and reject a total outside int64 — the
    # declared 'long' return type cannot carry it.
    total = int(np.floor(x * 100).astype(np.int64).astype(object).sum())
    if not -(2**63) <= total < 2**63:
        raise ValueError(
            "cents_sum group total overflows int64; split the group"
            " or reduce magnitudes"
        )
    return total


@pandas_udf("long")
def cents_sq_mod_sum(v: pd.Series) -> int:
    """Grouped-aggregate pandas UDF: ``sum((floor(x*100))^2 mod 1e9)``
    per group — a second, quadratic integer moment so the UDAF gate is
    sensitive to individual values, not just their linear sum (two
    rows swapping mass keep cents_sum but move this).  The square is
    computed on the REDUCED residue ((c mod 1e9)^2 mod 1e9 == c^2 mod
    1e9), so the intermediate stays < 1e18 — no int64 wrap at any
    allowed magnitude (r10 review); the summed residues (< 1e9 each)
    fit ~9e9 group rows in int64.  Inner residues use dividend-sign
    semantics (np.fmod) so the traced values match SQL ``%`` step for
    step; note the FINAL value is residue-convention-INVARIANT either
    way — numpy's divisor-sign residue and SQL's dividend-sign
    residue are congruent mod m, squares of congruents are congruent,
    and the outer ``%`` acts on a non-negative square in every
    engine, so all conventions canonicalize to c^2 mod m (the r10
    ADVICE divergence claim was wrong; pinned cross-engine on
    negatives in tests/test_pipeline_ml.py)."""
    x = v.to_numpy(dtype="float64")
    if not np.all(np.isfinite(x)):
        raise ValueError(
            "cents_sq_mod_sum requires finite inputs; filter NULL/NaN"
            " first"
        )
    if np.any(np.abs(x) >= 9e13):
        raise ValueError(
            "cents_sq_mod_sum requires |x| < 9e13 (int64 cent range);"
            " larger magnitudes would wrap silently"
        )
    c = np.floor(x * 100).astype(np.int64)
    cm = np.fmod(c, 1_000_000_000)
    return int(np.fmod(cm * cm, 1_000_000_000).sum())


@udtf(returnType="sentence_idx int, sentence string")
class SplitSentences:
    """UDTF: one document row -> one row per '.'-delimited sentence.
    Lateral-join surface (SQL: ``SELECT ... FROM docs, SplitSentences(text)``)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, s in enumerate(x for x in text.split(". ") if x):
            yield i, s


def register_all(spark) -> None:
    """Expose the UDTF/UDFs to the SQL surface by name."""
    spark.udtf.register("split_sentences", SplitSentences)
    spark.udf.register("geometric_mean", geometric_mean)
    spark.udf.register("log_sum_e4", log_sum_e4)
    spark.udf.register("cents_sum", cents_sum)
    spark.udf.register("cents_sq_mod_sum", cents_sq_mod_sum)
