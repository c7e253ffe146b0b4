"""Property-based tests (SURVEY.md §5.4): invariants that hold for ALL
inputs, batched into one Spark job per example set so hypothesis stays
fast against a JVM."""

from __future__ import annotations

from datetime import date

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from automated_etl_pipeline_spark.operators.cleaning import (
    DEFAULT_DATE_FORMATS,
    multi_format_date,
)

_PYFMT = {
    "MM/dd/yyyy": "%m/%d/%Y",
    "yyyy-MM-dd": "%Y-%m-%d",
    "dd-MM-yyyy": "%d-%m-%Y",
    "dd/MM/yyyy": "%d/%m/%Y",
}

_dates = st.dates(min_value=date(1880, 1, 1), max_value=date(2100, 12, 31))


@given(st.lists(st.tuples(_dates, st.sampled_from(DEFAULT_DATE_FORMATS)), min_size=1, max_size=40))
@settings(max_examples=8, deadline=None)
def test_multi_format_date_roundtrip(spark, cases):
    """Any date rendered in any supported format parses back to itself
    *unless an earlier format in the precedence list also matches* —
    then the earlier format wins (load-bearing order, SURVEY §4.3)."""
    rows = [(i, d.strftime(_PYFMT[f]), f) for i, (d, f) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i long, s string, fmt string")
    got = {
        r.i: r.parsed
        for r in df.select("i", multi_format_date("s").alias("parsed")).collect()
    }
    for i, (d, f) in enumerate(cases):
        rendered = d.strftime(_PYFMT[f])
        expected = None
        for cand in DEFAULT_DATE_FORMATS:  # first-format-wins reference model
            try:
                expected = __import__("datetime").datetime.strptime(
                    rendered, _PYFMT[cand]
                ).date()
                break
            except ValueError:
                continue
        assert got[i] == expected, (rendered, f, got[i], expected)


@given(
    st.lists(
        st.lists(st.sampled_from("ab cd ef gh ij kl mn op".split()), min_size=1, max_size=200),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=6, deadline=None)
def test_chunking_reassembles_to_original(spark, docs):
    """Chunks with the overlap stripped concatenate back to the exact
    original token sequence (no token lost or duplicated at seams)."""
    from automated_etl_pipeline_spark.queries_llm import CHUNK_STRIDE, CHUNK_TOKENS

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = df.select("doc_id", F.split("text", " ").alias("t"))
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t"), F.lit(CHUNK_STRIDE)),
                lambda s: F.struct(
                    ((s - 1) / CHUNK_STRIDE).cast("int").alias("idx"),
                    F.slice("t", s, CHUNK_TOKENS).alias("ctoks"),
                ),
            )
        ).alias("c"),
    ).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append((r.c.idx, r.c.ctoks))
    overlap = CHUNK_TOKENS - CHUNK_STRIDE
    for i, toks_in in enumerate(docs):
        parts = [c for _, c in sorted(by_doc[i])]
        rebuilt = list(parts[0])
        for p in parts[1:]:
            rebuilt += p[overlap:] if len(p) > overlap else []
        # trailing chunks shorter than the overlap contribute nothing new
        assert rebuilt == toks_in, (i, len(toks_in))


@given(
    st.lists(st.sampled_from("w1 w2 w3 w4 w5 w6 w7 w8".split()), min_size=3, max_size=30),
    st.lists(st.sampled_from("w1 w2 w3 w4 w5 w6 w7 w8".split()), min_size=3, max_size=30),
)
@settings(max_examples=6, deadline=None)
def test_jaccard_bounds_and_identity(spark, ta, tb):
    """0 <= jaccard <= 1; identical texts always score exactly 1.0."""
    from automated_etl_pipeline_spark.dedup.ngram_jaccard import jaccard_pairs

    df = spark.createDataFrame(
        [(1, " ".join(ta)), (2, " ".join(ta)), (3, " ".join(tb))],
        "doc_id long, text string",
    )
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(df, threshold=0.0).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert all(0.0 <= j <= 1.0 for j in pairs.values())


@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 1000)),
        min_size=1,
        max_size=25,
        unique=True,
    ),
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 1000), st.integers(0, 99)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: (t[0], t[1]),
    ),
)
@settings(max_examples=8, deadline=None)
def test_asof_forward_is_backward_under_time_reversal(spark, lefts, rights):
    """Metamorphic pin for the two as-of directions: FORWARD on (k, t)
    must equal BACKWARD on (k, -t) for every input — the directions are
    exact mirrors, so any asymmetry (tie handling, boundary
    inclusivity, NULL-when-no-match) is a bug in one of them."""
    from datetime import datetime, timedelta

    from automated_etl_pipeline_spark.operators.asof import asof_join

    def ts(sec: int):
        return datetime(2024, 1, 1) + timedelta(seconds=sec)

    def run(direction: str, neg: bool):
        sgn = -1 if neg else 1
        left = spark.createDataFrame(
            [(k, ts(sgn * t), i) for i, (k, t) in enumerate(lefts)],
            "k long, t timestamp, lid long",
        )
        right = spark.createDataFrame(
            [(k, ts(sgn * t), float(v)) for k, t, v in rights],
            "k long, t timestamp, v double",
        )
        return {
            r.lid: r.v
            for r in asof_join(
                left, right, ["k"], "t", ["v"], direction=direction
            ).collect()
        }

    assert run("forward", neg=False) == run("backward", neg=True)


@given(
    st.lists(
        st.lists(st.sampled_from("aa bb cc dd".split()), min_size=0, max_size=24),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=8, deadline=None)
def test_span_removal_matches_python_reference(spark, corpora):
    """dedup/spans.removal_spans vs a direct pure-Python model (W=3,
    4-token alphabet so duplicated windows are dense): owner =
    lowest doc_id per duplicated window hash; removal intervals
    [pos, pos+W-1] for non-owner occurrences; merge when the gap
    between window starts is <= W.  Catches off-by-ones at exact
    overlap/adjacency boundaries the testdata never hits."""
    from collections import defaultdict

    from automated_etl_pipeline_spark.dedup.spans import removal_spans

    W = 3
    docs = [(i, " ".join(toks)) for i, toks in enumerate(corpora)]

    # --- reference model -------------------------------------------
    owners: dict[tuple, int] = {}
    holders: dict[tuple, set] = defaultdict(set)
    for doc_id, toks in enumerate(corpora):
        for p in range(len(toks) - W + 1):
            w = tuple(toks[p : p + W])
            holders[w].add(doc_id)
            owners.setdefault(w, doc_id)
    expected = {}
    for doc_id, toks in enumerate(corpora):
        pos = sorted(
            p + 1
            for p in range(len(toks) - W + 1)
            if len(holders[tuple(toks[p : p + W])]) >= 2
            and owners[tuple(toks[p : p + W])] < doc_id
        )
        if not pos:
            continue
        spans = []
        for p in pos:
            if spans and p <= spans[-1][1] - W + 1 + W:  # gap <= W
                spans[-1][1] = max(spans[-1][1], p + W - 1)
            else:
                spans.append([p, p + W - 1])
        removed = sum(e - s + 1 for s, e in spans)
        expected[doc_id] = (len(spans), removed, len(toks), len(toks) - removed)

    # --- engine ----------------------------------------------------
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.tokens_removed, r.n_tokens, r.tokens_kept)
        for r in removal_spans(df, w=W).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),     # key
            st.integers(min_value=0, max_value=50),    # ts
            st.sampled_from(["A", "B", None]),         # attr (nullable)
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=6),             # num_chunks
)
@settings(max_examples=8, deadline=None)
def test_scd2_chunked_equals_plain_property(spark, updates, num_chunks):
    """scd2_history_chunked ≡ scd2_history on arbitrary change streams:
    any key mix, duplicate timestamps (tiebreak = synthetic seq),
    NULL attrs, any chunk count — the boundary stitch must reproduce
    the plain operator's runs exactly."""
    from automated_etl_pipeline_spark.operators.scd import (
        scd2_history,
        scd2_history_chunked,
    )

    rows = [(k, ts, i, a) for i, (k, ts, a) in enumerate(updates)]
    df = spark.createDataFrame(rows, "k int, ts int, seq int, attr string")
    plain = scd2_history(df, ["k"], ["attr"], ts_col="ts", tiebreak="seq")
    chunked = scd2_history_chunked(
        df, ["k"], ["attr"], ts_col="ts", tiebreak="seq", num_chunks=num_chunks
    )
    cols = sorted(plain.columns)
    assert sorted(chunked.columns) == cols
    norm = lambda d: sorted(  # noqa: E731
        tuple(str(r[c]) for c in cols) for r in d.collect()
    )
    assert norm(plain) == norm(chunked)


@given(
    st.lists(
        st.integers(min_value=0, max_value=40), min_size=1, max_size=400
    ),
    st.integers(min_value=1, max_value=6),
    st.sampled_from([0.05, 0.1, 0.25]),
)
@settings(max_examples=8, deadline=None)
def test_heavy_hitters_equals_exact_property(spark, items, parts, phi):
    """heavy_hitters == the exact phi-heavy set for ARBITRARY streams,
    k values at the guarantee boundary, and partition layouts — the
    no-miss theorem (functions/heavy_hitters.py) as a property, not a
    planted example.  k is chosen as the SMALLEST the precondition
    phi > 1/(k+1) allows, so the sketch has the least slack the math
    permits."""
    import math

    from automated_etl_pipeline_spark.functions.heavy_hitters import heavy_hitters

    k = max(1, int(math.ceil(1.0 / phi)))  # 1/(k+1) < phi minimally
    df = spark.createDataFrame(
        [(x,) for x in items], "x long"
    ).repartition(parts)
    got = {(r["x"], r["cnt"]) for r in heavy_hitters(df, "x", phi, k=k).collect()}
    n = len(items)
    from collections import Counter

    want = {(x, c) for x, c in Counter(items).items() if c >= phi * n}
    assert got == want


_HOST_LABEL = st.from_regex(r"[a-z][a-z0-9]{0,6}", fullmatch=True)
_SUFFIX_POOL = ["com", "org", "io", "co.uk", "ac.uk", "com.au", "github.io"]


@given(
    st.lists(
        st.tuples(
            st.lists(_HOST_LABEL, min_size=0, max_size=3),  # subdomain labels
            st.one_of(st.sampled_from(_SUFFIX_POOL), _HOST_LABEL),  # tail
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=8, deadline=None)
def test_registrable_domain_matches_python_reference(spark, hosts):
    """registrable_domain == a direct Python longest-suffix reference
    for arbitrary hosts: random label stacks over a tail that may or
    may not be a known public suffix (when it isn't, or when the host
    IS a bare suffix, the domain must be NULL)."""
    from automated_etl_pipeline_spark.operators.urls import registrable_domain

    host_strs = [
        ".".join(labels + [tail]) for labels, tail in hosts
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(host_strs)], "doc_id long, host string"
    )
    suff = spark.createDataFrame([(s,) for s in _SUFFIX_POOL], "suffix string")
    got = {
        r["doc_id"]: r["domain"]
        for r in registrable_domain(df, suff, id_col="doc_id").collect()
    }

    def ref(h: str):
        labels = h.split(".")
        best = None
        for m in range(1, min(4, len(labels)) + 1):
            cand = ".".join(labels[-m:])
            if cand in _SUFFIX_POOL:
                best = m
        if best is None or len(labels) <= best:
            return None
        return ".".join(labels[-(best + 1):])

    for i, h in enumerate(host_strs):
        assert got[i] == ref(h), (h, got[i], ref(h))
