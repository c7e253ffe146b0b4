"""dedup/lines.py — CCNet-style line-level dedup (r11)."""

from __future__ import annotations

from automated_etl_pipeline_spark.dedup.lines import (
    doc_lines,
    keep_first_lines,
    rebuild_documents,
)


def _df(spark, docs: dict[int, str | None]):
    return spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )


def _py_rebuild(docs: dict[int, str], width: int) -> dict[int, tuple]:
    """Brute-force oracle: first occurrence in (doc_id, idx) order."""
    lines: dict[int, list[str]] = {}
    for d in sorted(docs):
        t = (docs[d] or "").split(" ")
        lines[d] = [
            " ".join(t[i : i + width]) for i in range(0, max(len(t), 1), width)
        ]
    seen: set[str] = set()
    out = {}
    for d in sorted(docs):
        kept = []
        for line in lines[d]:
            if line not in seen:
                seen.add(line)
                kept.append(line)
        out[d] = (len(lines[d]), len(kept), " ".join(kept))
    return out


def test_first_occurrence_keep_rule(spark):
    docs = {
        0: "a b c d e f",  # lines (w=3): 'a b c', 'd e f'
        1: "a b c x y z",  # 'a b c' dup of doc 0 -> removed
        2: "d e f",        # dup of doc 0 line 1 -> fully removed
        3: "x y z a b c",  # both lines already seen -> fully removed
    }
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["rebuilt"])
        for r in rebuild_documents(_df(spark, docs), width=3).collect()
    }
    assert got == _py_rebuild(docs, 3)
    assert got[2] == (1, 0, "")
    assert got[3] == (2, 0, "")


def test_tail_chunk_and_width_one(spark):
    docs = {0: "p q r s t", 1: "t s"}  # w=2: tail 't' kept; 't s' != 's t'
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["rebuilt"])
        for r in rebuild_documents(_df(spark, docs), width=2).collect()
    }
    assert got == _py_rebuild(docs, 2)


def test_null_and_empty_text(spark):
    docs = {0: "a b", 1: None, 2: "", 3: "a b"}
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["rebuilt"])
        for r in rebuild_documents(_df(spark, docs), width=2).collect()
    }
    # NULL and '' both produce one empty line; the first ('' at doc 1)
    # survives, doc 2's duplicate empty line is removed; doc 3 is a
    # full duplicate of doc 0
    assert got[0] == (1, 1, "a b")
    assert got[1] == (1, 1, "")
    assert got[2] == (1, 0, "")
    assert got[3] == (1, 0, "")


def test_doc_lines_hash_is_md5_of_line(spark):
    rows = doc_lines(_df(spark, {7: "m n o p"}), width=4).collect()
    import hashlib

    assert len(rows) == 1
    assert rows[0]["line_hash"] == hashlib.md5(b"m n o p").hexdigest()


def test_keep_first_prefers_lower_doc_then_idx(spark):
    # same line twice within ONE doc: idx 0 survives, idx 1 removed
    docs = {5: "a b a b"}
    kept = keep_first_lines(doc_lines(_df(spark, docs), width=2)).collect()
    assert [(r["doc_id"], r["idx"]) for r in kept] == [(5, 0)]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    texts=st.lists(
        st.lists(st.sampled_from("abc"), min_size=0, max_size=9).map(" ".join),
        min_size=1,
        max_size=5,
    ),
    width=st.integers(min_value=1, max_value=3),
)
@settings(**_SETTINGS)
def test_rebuild_matches_python_oracle_property(spark, texts, width):
    """Differential: first-occurrence keep + rebuild against the
    brute-force python oracle on random small corpora, all widths."""
    docs = dict(enumerate(texts))
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["rebuilt"])
        for r in rebuild_documents(_df(spark, docs), width=width).collect()
    }
    assert got == _py_rebuild(docs, width)
