"""Differential tests for the distributed suffix-array operator
(dedup/suffix_array.py) against brute-force pure-Python oracles.

The oracles re-derive, per corpus:
- the suffix-array ORDER, emulating the operator's exact key space
  (dense token ranks >= 0, per-doc sentinel rank = -offset-2);
- per-position longest-match lengths by the O(n^2 L) all-pairs scan
  (Lee et al. semantics: any other position, same doc included);
- merged duplicated spans by interval union.

Corpora stay tiny (tens of tokens) — each case is a full
prefix-doubling run, so the cost is Spark jobs, not data.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from automated_etl_pipeline_spark.dedup.suffix_array import (
    duplicated_spans,
    longest_repeat,
    match_lengths,
    suffix_ranks,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _toks(text: str) -> list[str]:
    return [t for t in text.split(" ") if t]


def py_match_lengths(docs: dict[int, str]) -> dict[tuple[int, int], int]:
    toks = {d: _toks(t) for d, t in docs.items()}
    positions = [(d, p) for d in sorted(toks) for p in range(len(toks[d]))]

    def common(a, b):
        (da, pa), (db, pb) = a, b
        ta, tb = toks[da], toks[db]
        h = 0
        while pa + h < len(ta) and pb + h < len(tb) and ta[pa + h] == tb[pb + h]:
            h += 1
        return h

    return {
        x: max((common(x, y) for y in positions if y != x), default=0)
        for x in positions
    }


def py_suffix_order(docs: dict[int, str]) -> list[tuple[int, int]]:
    """Expected (doc_id, pos) sequence in suffix-array order,
    including sentinel rows (pos = len(tokens)), emulating the
    operator's key space exactly."""
    toks = {d: _toks(t) for d, t in docs.items()}
    vocab = {t: i for i, t in enumerate(sorted({t for ts in toks.values() for t in ts}))}
    offsets, acc = {}, 0
    for d in sorted(toks):
        offsets[d] = acc
        acc += len(toks[d]) + 1
    keys = []
    for d in sorted(toks):
        ranked = [vocab[t] for t in toks[d]] + [-offsets[d] - 2]
        for p in range(len(ranked)):
            keys.append((tuple(ranked[p:]), (d, p)))
    keys.sort()
    return [pos for _, pos in keys]


def _df(spark, docs: dict[int, str]):
    return spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )


CRAFTED = {
    0: "the cat sat on the mat",
    1: "the cat sat on a hat",
    2: "completely different tokens here",
    3: "the cat sat on the mat",  # full duplicate of doc 0
    4: "x",
    5: "",
}


def test_match_lengths_crafted(spark):
    got = {
        (r["doc_id"], r["pos"]): r["match_len"]
        for r in match_lengths(_df(spark, CRAFTED)).collect()
    }
    assert got == py_match_lengths(CRAFTED)


def test_suffix_order_crafted(spark):
    final, levels, _low = suffix_ranks(_df(spark, CRAFTED))
    rows = final.orderBy("rank").select("doc_id", "pos", "rank").collect()
    n = len(rows)
    assert [r["rank"] for r in rows] == list(range(n)), "ranks must be a dense total order"
    # sentinel rows carry pos = len(tokens); real rows keep their pos
    assert [(r["doc_id"], r["pos"]) for r in rows] == py_suffix_order(CRAFTED)


def test_duplicated_spans_crafted(spark):
    # min_len 3: "the cat sat on" x3 and "the mat" tail of docs 0/3
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in duplicated_spans(_df(spark, CRAFTED), min_len=3).collect()
    }
    ml = py_match_lengths(CRAFTED)
    covered: dict[int, set[int]] = {}
    for (d, p), l in ml.items():
        if l >= 3:
            covered.setdefault(d, set()).update(range(p, p + l))
    expected = set()
    for d, ps in covered.items():
        run: list[int] = []
        for p in sorted(ps) + [max(ps) + 2]:
            if run and p > run[-1] + 1:
                expected.add((d, run[0], run[-1], run[-1] - run[0] + 1))
                run = []
            if p <= max(ps):
                run.append(p)
    assert spans == expected


def test_longest_repeat_crafted(spark):
    row = longest_repeat(_df(spark, CRAFTED)).collect()[0]
    # the maximal repeat is the full 6-token doc 0 == doc 3
    assert row["length"] == 6
    assert row["phrase"] == "the cat sat on the mat"
    assert {row["doc_id"], row["other_doc_id"]} == {0, 3}


def test_no_repeats_corpus(spark):
    docs = {0: "a b c", 1: "d e f"}
    got = {
        (r["doc_id"], r["pos"]): r["match_len"]
        for r in match_lengths(_df(spark, docs)).collect()
    }
    assert set(got.values()) == {0}
    assert duplicated_spans(_df(spark, docs), min_len=1).count() == 0
    assert longest_repeat(_df(spark, docs)).collect()[0]["length"] == 0


def test_null_text_is_empty_doc(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, None), (2, "a b")], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["pos"]): r["match_len"]
        for r in match_lengths(df).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (2, 0): 2, (2, 1): 1}


def test_single_doc_internal_repeat(spark):
    # "a b a b a" — suffix 0 vs suffix 2 share "a b a"
    docs = {7: "a b a b a"}
    got = {
        (r["doc_id"], r["pos"]): r["match_len"]
        for r in match_lengths(_df(spark, docs)).collect()
    }
    assert got == py_match_lengths(docs)
    assert got[(7, 0)] == 3


@given(
    texts=st.lists(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=4,
    )
)
@settings(**_SETTINGS)
def test_match_lengths_property(spark, texts):
    docs = dict(enumerate(texts))
    got = {
        (r["doc_id"], r["pos"]): r["match_len"]
        for r in match_lengths(_df(spark, docs)).collect()
    }
    assert got == py_match_lengths(docs)


def test_chained_arithmetic_rekey_matches_densify_fallback(spark, monkeypatch):
    """r15 opt: arithmetic re-key rounds CHAIN while the rank-space
    bound stays under _ARITH_UBOUND_LIMIT (it squares per round).  A
    long low-vocab doc drives many doubling rounds, so the default
    path runs several consecutive arithmetic rounds; pinning the limit
    to 0 forces the densify-every-round fallback.  Both paths must
    produce the identical dense suffix-array order and identical
    match lengths."""
    import automated_etl_pipeline_spark.dedup.suffix_array as sa

    docs = {
        0: "a b " * 20 + "a",            # 41 tokens, k doubles 6 times
        1: "b a " * 7,
        2: "a b a b c",
        3: "",
    }
    final, *_rest = sa.suffix_ranks(_df(spark, docs))
    fast_order = [
        (r["doc_id"], r["pos"])
        for r in final.orderBy("rank").select("doc_id", "pos").collect()
    ]
    fast_ml = {
        (r["doc_id"], r["pos"]): r["match_len"]
        for r in sa.match_lengths(_df(spark, docs)).collect()
    }
    monkeypatch.setattr(sa, "_ARITH_UBOUND_LIMIT", 0)
    final_slow, *_rest = sa.suffix_ranks(_df(spark, docs))
    slow_order = [
        (r["doc_id"], r["pos"])
        for r in final_slow.orderBy("rank").select("doc_id", "pos").collect()
    ]
    slow_ml = {
        (r["doc_id"], r["pos"]): r["match_len"]
        for r in sa.match_lengths(_df(spark, docs)).collect()
    }
    assert fast_order == slow_order == py_suffix_order(docs)
    assert fast_ml == slow_ml == py_match_lengths(docs)


def test_longest_repeat_degenerate_one_row(spark):
    """r10 ADVICE: the one-row contract must hold for corpora with no
    adjacent suffix pair (empty corpus, all-empty docs, single token)."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    row = longest_repeat(empty).collect()
    assert len(row) == 1
    assert row[0]["length"] == 0 and row[0]["doc_id"] is None
    # one empty-text doc: a single sentinel position, zero pairs
    one_empty = spark.createDataFrame([(0, "")], "doc_id long, text string")
    row = longest_repeat(one_empty).collect()
    assert len(row) == 1 and row[0]["length"] == 0
    # NULL text behaves as empty (the corpus_positions contract)
    one_null = spark.createDataFrame([(0, None)], "doc_id long, text string")
    row = longest_repeat(one_null).collect()
    assert len(row) == 1 and row[0]["length"] == 0


def test_longest_repeat_with_null_texts_alongside_real(spark):
    """The final phrase join must coalesce NULL text like
    corpus_positions does (r10 ADVICE) — a NULL doc in the corpus must
    not poison the result row."""
    df = spark.createDataFrame(
        [(0, "x y z w"), (1, None), (2, "x y z w")],
        "doc_id long, text string",
    )
    row = longest_repeat(df).collect()[0]
    assert row["length"] == 4
    assert row["phrase"] == "x y z w"


def test_remove_duplicate_spans_crafted(spark):
    from automated_etl_pipeline_spark.dedup.suffix_array import (
        remove_duplicate_spans,
    )

    docs = {
        0: "the cat sat on the mat today ok",   # 8 tokens
        1: "intro x the cat sat on the mat y",  # shares the 6-token span
        2: "p q r s t u v w",                   # unique
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in remove_duplicate_spans(_df(spark, docs), min_len=6).collect()
    }
    # the shared 6-token span 'the cat sat on the mat' is cut from both
    assert got[0] == (8, 6, "today ok")
    assert got[1] == (9, 6, "intro x y")
    assert got[2] == (8, 0, "p q r s t u v w")


def test_remove_duplicate_spans_full_duplicate_and_threshold(spark):
    from automated_etl_pipeline_spark.dedup.suffix_array import (
        remove_duplicate_spans,
    )

    docs = {0: "a b c d e", 1: "a b c d e", 2: "a b x"}
    got = {
        r["doc_id"]: (r["n_removed"], r["text_clean"])
        for r in remove_duplicate_spans(_df(spark, docs), min_len=5).collect()
    }
    # docs 0/1 duplicate each other fully; doc 2's 2-token match with
    # them ('a b') is below min_len and survives
    assert got[0] == (5, "")
    assert got[1] == (5, "")
    assert got[2] == (0, "a b x")


def test_w0_window_boundaries(spark):
    """r15 opt: doubling starts at k = _W0 (8) from a map-side
    token-slot key, and the LCP descent's final < _W0 tokens resolve
    via one content join.  Pin the boundary cases: suffix lengths of
    exactly _W0-1/_W0/_W0+1 tokens, a shared span LONGER than _W0
    (coarse rank step + content remainder), and same-content docs
    whose order is decided only by the sentinel tiebreak."""
    from automated_etl_pipeline_spark.dedup.suffix_array import _W0

    assert _W0 == 8  # the crafted lengths below straddle this
    docs = {
        0: "w1 w2 w3 w4 w5 w6 w7",                    # 7 tokens (< _W0)
        1: "w1 w2 w3 w4 w5 w6 w7 w8",                 # 8 tokens (= _W0)
        2: "w1 w2 w3 w4 w5 w6 w7 w8 w9",              # 9 tokens (> _W0)
        3: "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 z",    # 11-token shared span
        4: "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 q",
        5: "w1 w2 w3 w4 w5 w6 w7",                    # full dup of doc 0
    }
    got = {
        (r["doc_id"], r["pos"]): r["match_len"]
        for r in match_lengths(_df(spark, docs)).collect()
    }
    assert got == py_match_lengths(docs)
    # the > _W0 shared span must come out exact, not rounded to 8
    assert got[(3, 0)] == 11 and got[(4, 0)] == 11
    final, levels, _low = suffix_ranks(_df(spark, docs))
    rows = final.orderBy("rank").select("doc_id", "pos").collect()
    assert [(r["doc_id"], r["pos"]) for r in rows] == py_suffix_order(docs)
    assert levels and levels[0][0] == _W0


def test_w0_all_windows_unique_skips_doubling(spark):
    """When every _W0-window is already unique (n0 == n) the doubling
    loop is skipped outright; ranks must still be the dense total
    suffix order."""
    docs = {0: "a b c d e f g h i j", 1: "k l m"}
    final, levels, _low = suffix_ranks(_df(spark, docs))
    rows = final.orderBy("rank").select("doc_id", "pos", "rank").collect()
    assert [r["rank"] for r in rows] == list(range(len(rows)))
    assert [(r["doc_id"], r["pos"]) for r in rows] == py_suffix_order(docs)
    # only the level-_W0 frame exists: no doubling round ran
    assert [plen for plen, _ in levels] == [8]
    got = {
        (r["doc_id"], r["pos"]): r["match_len"]
        for r in match_lengths(_df(spark, docs)).collect()
    }
    assert got == py_match_lengths(docs)
