"""Differential tests for the DSIR operator (functions/dsir.py).

The hashing (xxhash64 -> bucket) is taken as ground truth from the
Spark side (deterministic by construction); everything downstream —
add-one smoothing, the log-ratio weights, the Gumbel top-k — is
recomputed in pure Python (hashlib md5 IS replicable) and compared.
"""

from __future__ import annotations

import hashlib
import math

from automated_etl_pipeline_spark.functions.dsir import (
    bucket_log_probs,
    dsir_select,
    hashed_ngram_counts,
    importance_weights,
)

B = 64  # tiny bucket space => collisions exercised
N = 2

TARGET = {
    100: "the cat sat on the mat",
    101: "the cat ate the fish",
    102: "a cat and the mat",
}
RAW = {
    0: "the cat sat on the mat again",   # in-domain
    1: "the cat sat quietly",            # in-domain-ish
    2: "quantum flux capacitor array",   # off-domain
    3: "flux array of quantum fields",   # off-domain
    4: "x",                              # too short for a bigram
}


def _df(spark, docs):
    return spark.createDataFrame(list(docs.items()), "doc_id long, text string")


def _counts(spark, docs):
    rows = hashed_ngram_counts(_df(spark, docs), n=N, buckets=B).collect()
    out: dict[int, dict[int, int]] = {}
    for r in rows:
        out.setdefault(r["doc_id"], {})[r["bucket"]] = r["cnt"]
    return out


def _py_logp(bucket_totals: dict[int, int]) -> dict[int, float]:
    total = sum(bucket_totals.values())
    return {
        b: math.log((bucket_totals.get(b, 0) + 1) / (total + B)) for b in range(B)
    }


def test_ngram_counts_shape(spark):
    cnt = _counts(spark, RAW)
    toks = {d: [t for t in s.split(" ") if t] for d, s in RAW.items()}
    for d, ts in toks.items():
        expect = max(0, len(ts) - N + 1)
        assert sum(cnt.get(d, {}).values()) == expect
    # identical texts produce identical bags
    c2 = _counts(spark, {7: RAW[0], 8: RAW[0]})
    assert c2[7] == c2[8]


def test_bucket_log_probs_normalized(spark):
    rows = bucket_log_probs(_df(spark, TARGET), n=N, buckets=B).collect()
    assert len(rows) == B
    assert abs(sum(math.exp(r["logp"]) for r in rows) - 1.0) < 1e-9
    # differential vs python from the Spark-side counts
    per_doc = _counts(spark, TARGET)
    totals: dict[int, int] = {}
    for bags in per_doc.values():
        for b, c in bags.items():
            totals[b] = totals.get(b, 0) + c
    expect = _py_logp(totals)
    for r in rows:
        assert abs(r["logp"] - expect[r["bucket"]]) < 1e-12


def _py_weights(spark):
    raw_bags = _counts(spark, RAW)
    tgt_bags = _counts(spark, TARGET)

    def totals(bags):
        t: dict[int, int] = {}
        for bb in bags.values():
            for b, c in bb.items():
                t[b] = t.get(b, 0) + c
        return t

    lt, lr = _py_logp(totals(tgt_bags)), _py_logp(totals(raw_bags))
    return {
        d: sum(c * (lt[b] - lr[b]) for b, c in raw_bags.get(d, {}).items())
        for d in RAW
    }


def test_importance_weights_differential(spark):
    got = {
        r["doc_id"]: (r["n_ngrams"], r["weight"])
        for r in importance_weights(
            _df(spark, RAW), _df(spark, TARGET), n=N, buckets=B
        ).collect()
    }
    expect = _py_weights(spark)
    assert set(got) == set(RAW)
    for d, w in expect.items():
        assert abs(got[d][1] - w) < 1e-9, d
    # directional: in-domain docs outrank off-domain docs
    assert min(got[0][1], got[1][1]) > max(got[2][1], got[3][1])
    # the bigram-less doc scores exactly 0 with 0 ngrams
    assert got[4] == (0, 0.0)


def test_dsir_select_matches_python_gumbel(spark):
    seed, k = 7, 3
    got = [
        (r["doc_id"], r["score"])
        for r in dsir_select(
            _df(spark, RAW), _df(spark, TARGET), k=k, seed=seed, n=N, buckets=B
        ).collect()
    ]
    w = _py_weights(spark)

    def score(d):
        h = int(
            hashlib.md5(f"{d}:{seed}".encode()).hexdigest()[:8], 16
        )
        u = (h + 0.5) / 4294967296.0
        return w[d] - math.log(-math.log(u))

    expect = sorted(((score(d), d) for d in RAW), key=lambda t: (-t[0], t[1]))[:k]
    assert [d for d, _ in got] == [d for _, d in expect]
    for (d, s), (es, _) in zip(got, expect):
        assert abs(s - es) < 1e-9
    # determinism: same seed, same selection
    again = [
        r["doc_id"]
        for r in dsir_select(
            _df(spark, RAW), _df(spark, TARGET), k=k, seed=seed, n=N, buckets=B
        ).collect()
    ]
    assert again == [d for d, _ in got]


def test_dsir_plan_shape(spark):
    """Scale contract: the LM joins are explicit broadcasts, selection
    is TakeOrderedAndProject (per-partition heaps, no global sort),
    and nothing row-wise Python appears anywhere."""
    from automated_etl_pipeline_spark.plans.explain import (
        executed_plan,
        uses_python_udf,
    )

    df = dsir_select(_df(spark, RAW), _df(spark, TARGET), k=3, n=N, buckets=B)
    plan = executed_plan(df)
    assert not uses_python_udf(plan)
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 2  # target + raw LM joins
