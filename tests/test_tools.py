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


def test_lrv_rotation_orders_stale_first(tmp_path, monkeypatch):
    """__spark_entry__ must order queries never-verified first, then by
    least-recently-green round; hash mismatch must NOT count as green;
    no_oracle clean runs must count."""
    import json

    import __spark_entry__ as e

    files = {
        "CORRECTNESS_r01.json": {
            "q_green_r1": {"rows_match": True, "schema_match": True, "hash_match": True},
            "q_hash_mismatch": {"rows_match": True, "schema_match": True, "hash_match": False},
            "q_no_oracle": {"rows_match": None, "schema_match": None, "hash_match": None,
                            "spark_rows": 5, "err": "no_oracle"},
        },
        "CORRECTNESS_r02.json": {
            "q_green_r2": {"rows_match": True, "schema_match": True, "hash_match": True},
        },
    }
    for name, data in files.items():
        (tmp_path / name).write_text(json.dumps(data))
    monkeypatch.setattr(e, "_REPO", tmp_path)
    last = e._last_green_round()
    assert last["q_green_r1"] == 1 and last["q_green_r2"] == 2
    assert last["q_no_oracle"] == 1
    assert "q_hash_mismatch" not in last  # stays in the fresh group


def test_scale_smoke_suffix_salt_is_bijective_on_irregular_whitespace(
    spark, tmp_path
):
    """r10 ADVICE (conclusion right, example wrong): salting by
    regexp-replacing every single space turned 'a  b' into
    'a_r0 _r0 b_r0' — an extra salt-only token '_r0' per consecutive
    space, so the rename was not bijective and the salted-replica
    invariant could falsely VIOLATION on whitespace-irregular corpora.
    The transform-over-filtered-split salt must map the same base
    token to the same salted token and add none."""
    from tools.scale_smoke_suffix import corpus

    base = str(tmp_path / "base")
    spark.createDataFrame(
        [(0, "a  b"), (1, " a b ")], "doc_id long, text string"
    ).write.parquet(f"{base}/documents.parquet")
    out = {
        (r["doc_id"]): r["text"]
        for r in corpus(spark, base, replicas=2, salted=True).collect()
    }
    # replica r: doc ids shifted by r * (max_id + 1) = r * 2
    assert out[0 + 2] == "a_r1 b_r1"
    assert out[1 + 2] == "a_r1 b_r1"
    assert out[0] == "a_r0 b_r0"
