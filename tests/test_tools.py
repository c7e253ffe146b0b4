"""Unit tests for the self-check gate's value normalization
(tools/check_correctness.py) — the NaN / negative-zero symmetry fixes
from round 2's ADVICE.md.

No SparkSession needed: normalize() is pure.
"""

from __future__ import annotations

import math

from tools.check_correctness import normalize


def test_nan_normalizes_identically_both_directions():
    # NaN == NaN must pass (same normalized string), and NaN must NOT
    # collapse into NULL (they must normalize differently).
    spark_side = normalize([(float("nan"), 1)])
    oracle_side = normalize([(float("nan"), 1)])
    assert spark_side == oracle_side
    null_side = normalize([(None, 1)])
    assert spark_side != null_side


def test_negative_zero_folds_into_positive_zero():
    assert normalize([(-0.0,)]) == normalize([(0.0,)])
    # and the folded string is the positive form
    assert normalize([(-0.0,)])[0][0] == "0.000000000"


def test_float_rounding_unchanged():
    a = normalize([(1.23456789012345,)])
    b = normalize([(1.234567890,)])
    assert a == b  # 9-digit round still in force
    assert not math.isnan(float(a[0][0]))
