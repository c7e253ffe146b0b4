"""The shared DuckDB k-gram coverage fragment
(queries_llm._kgram_coverage_ctes) vs the pure-Python brute-force
match-length oracle (tests/test_suffix_array.py) on random corpora.

The fragment is the ONE derivation behind three gate oracles
(suffix stats, span removal, curation e2e) — this property test pins
it against an INDEPENDENT third implementation, so a fragment edit
that silently weakens all three oracles at once fails here.  No
SparkSession needed: both sides are oracle-side.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from automated_etl_pipeline_spark.queries_llm import _kgram_coverage_ctes
from tests.test_suffix_array import py_match_lengths


def duckdb_match_lengths(docs: dict[int, str]) -> dict[tuple[int, int], int]:
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE raw (did BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO raw VALUES (?, ?)", list(docs.items())
        )
        sql = f"""
        WITH corpus AS (
          SELECT did,
                 list_filter(string_split(coalesce(text, ''), ' '),
                             w -> w != '') AS t
          FROM raw
        ), {_kgram_coverage_ctes()}
        SELECT p.did, p.pos, coalesce(m.match_len, 0)
        FROM posn p LEFT JOIN ml m ON p.did = m.did AND p.pos = m.pos
        """
        return {(d, p): ml for d, p, ml in con.execute(sql).fetchall()}
    finally:
        con.close()


def test_crafted():
    docs = {
        0: "a b c d e",
        1: "c d e f",       # shares 'c d e' with 0
        2: "a b c d e",     # verbatim twin of 0
        3: "",              # empty
        4: "zz",            # unique token
    }
    got = duckdb_match_lengths(docs)
    assert got == py_match_lengths(docs)
    # spot values: doc 0/2 are twins -> full-suffix matches everywhere
    assert got[(0, 0)] == 5 and got[(2, 0)] == 5
    assert got[(1, 0)] == 3  # 'c d e' occurs in 0/2
    assert got[(4, 0)] == 0


@settings(max_examples=20, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "ab", "x"]),
            min_size=0,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_random_corpora_match_python_brute_force(texts):
    docs = dict(enumerate(texts))
    assert duckdb_match_lengths(docs) == py_match_lengths(docs)
