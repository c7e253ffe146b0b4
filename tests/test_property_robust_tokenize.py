"""Hypothesis differential properties for the r10 operators.

- ``robust_group_stats_int`` (the exact-integer MAD path the
  quality_mad_outliers gate runs) vs a pure-Python statistics oracle
  AND vs the float operator it parallels: med2 must equal 2x the
  rank-midpoint median exactly, mad4 4x the MAD, and the integer
  z-cut must agree with the rational inequality evaluated in exact
  Fraction arithmetic — randomized over tie-heavy frames, degenerate
  groups (MAD = 0), and single-row groups.
- BPE tokenizer: decode(encode(x)) must equal whitespace-normalized x
  for ARBITRARY unicode words and any merge budget (losslessness is
  claimed by construction; this searches for the construction's
  counterexample).

Examples are kept small (each is a Spark job); the session-scoped
spark fixture is shared, so suppress hypothesis's fixture health
check deliberately.
"""

from __future__ import annotations

from fractions import Fraction
from statistics import median

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from automated_etl_pipeline_spark.functions.tokenize import (
    fidelity_report,
    learn_bpe_merges,
    word_freq,
)
from automated_etl_pipeline_spark.operators.robust import (
    robust_group_stats_int,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small value range => heavy ties, frequent MAD = 0 degeneracy
GROUPED_INTS = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 12)),
    min_size=1,
    max_size=40,
)


@settings(**_SETTINGS)
@given(rows=GROUPED_INTS)
def test_robust_int_matches_exact_python_oracle(spark, rows):
    df = spark.createDataFrame(rows, "g long, v long")
    got = {
        r.g: r
        for r in robust_group_stats_int(df, "v", ["g"]).collect()
    }
    by_g: dict[int, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        r = got[g]
        med = median(vals)  # rank-midpoint for ints (may be .5)
        assert r.n_rows == len(vals)
        assert r.med2 == int(2 * med)
        adevs = [abs(Fraction(v) - Fraction(med)) for v in vals]
        mad = median(sorted(adevs))
        assert r.mad4 == int(4 * mad)
        # the integer cut must agree with the exact rational
        # inequality adev > 1.4826 * k * MAD  (1.4826 = 14826/10^4)
        for k, field in ((3, "n_outliers"), (2, "n_mild")):
            want = (
                0
                if mad == 0
                else sum(
                    a > Fraction(14826 * k, 10_000) * mad for a in adevs
                )
            )
            assert getattr(r, field) == want, (g, k, vals)


# Co (private use) excluded: U+E000 is the reserved EOW marker, which
# the tokenizer REJECTS by contract (pinned in test_tokenize.py) —
# everything else, emoji and all, must round-trip.
WORD = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Zs", "Zl", "Zp", "Cc", "Co")
    ),
    min_size=1,
    max_size=6,
)


@settings(**_SETTINGS)
@given(
    words=st.lists(WORD, min_size=1, max_size=12),
    n_merges=st.sampled_from([0, 1, 5, 30]),
)
def test_bpe_roundtrip_lossless_on_arbitrary_unicode(
    spark, words, n_merges
):
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    merges = learn_bpe_merges(word_freq(df), n_merges=n_merges)
    rep = fidelity_report(df, merges).collect()[0]
    assert rep.n_roundtrip_ok == rep.n_docs == 1
    assert rep.n_words == len(words)
    assert rep.n_tokens >= rep.n_words


# --- CCNet partitioner (functions/perplexity.py) ----------------------

# words over a 2-letter alphabet => heavy hash-bucket collisions; a
# doc-unique suffix token keeps bags distinct so no two docs tie on h
# by equal bags (the cut oracle consumes SPARK's h values, so only a
# float-coincidence tie could make rank order ambiguous)
_CCNET_DOC = st.lists(
    st.sampled_from(["a", "b", "ab", "ba"]), min_size=0, max_size=6
).map(" ".join)
_CCNET_CORPUS = st.lists(_CCNET_DOC, min_size=1, max_size=12)


@settings(**_SETTINGS)
@given(raw=_CCNET_CORPUS, target=_CCNET_CORPUS)
def test_ccnet_cuts_match_exact_oracle_on_spark_scores(spark, raw, target):
    """Random corpora (empty docs, all-short docs, single-doc pools):
    the head/middle/tail assignment must equal the exact rank-cut
    oracle applied to the operator's own cross-entropy scores — this
    searches the two-phase global-rank + ceil-cut machinery for
    counterexamples, independent of the score values themselves."""
    import math

    from automated_etl_pipeline_spark.functions.perplexity import (
        ccnet_partition,
        doc_cross_entropy,
    )

    rawd = {i: (f"{t} u{i} u{i}".strip()) for i, t in enumerate(raw)}
    tgtd = {100 + i: t for i, t in enumerate(target)}
    raw_df = spark.createDataFrame(
        list(rawd.items()), "doc_id long, text string"
    )
    tgt_df = spark.createDataFrame(
        list(tgtd.items()), "doc_id long, text string"
    )
    scores = {
        r["doc_id"]: r["h"]
        for r in doc_cross_entropy(raw_df, tgt_df, n=2, buckets=16).collect()
    }
    rows = ccnet_partition(raw_df, tgt_df, n=2, buckets=16).collect()
    got = {r["doc_id"]: r["part"] for r in rows}
    assert len(rows) == len(rawd)
    ranked = sorted((h, d) for d, h in scores.items() if h is not None)
    total = len(ranked)
    # mirror the operator's cut formula exactly (float-sum semantics)
    ch = math.ceil(total * (1.0 / 3.0))
    cm = math.ceil(total * (1.0 / 3.0 + 1.0 / 3.0))
    for rk, (_, d) in enumerate(ranked):
        expect = "head" if rk < ch else "middle" if rk < cm else "tail"
        assert got[d] == expect, (d, rk, total)
    for d, h in scores.items():
        if h is None:
            assert got[d] == "empty", d
