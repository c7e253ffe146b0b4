"""functions/html.py — HTML/boilerplate extraction (r12).

Unit edge cases pin the documented contract (non-greedy block
removal, single-level entity decode, malformed-markup degradation);
the hypothesis property test builds random tag NESTINGS around known
words — expected text is computable by construction — and checks the
extractor recovers exactly the visible words at any depth.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from automated_etl_pipeline_spark.functions.html import extract_text


def _run(spark, payloads: list[str | None]) -> list[str]:
    df = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)],
                               "i long, h string")
    rows = df.select("i", extract_text(F.col("h")).alias("x")).collect()
    return [r["x"] for r in sorted(rows, key=lambda r: r["i"])]


def test_edge_cases(spark):
    got = _run(spark, [
        None,
        "",
        "plain text no markup",
        # comment containing tags and a script opener
        "a<!-- <script>junk</script> <b> -->b",
        # script with an embedded closer-lookalike string
        '<script>var s = "</p>";</script>ok',
        # style with braces; uppercase tags; attributes
        '<STYLE media="all">p{x:1}</STYLE><P CLASS="z">c</P>',
        # closer with attribute junk (browser behavior)
        "<script>x</script aria>done",
        # nested same-family blocks degrade, never throw
        "<noscript>a<template>b</template>c</noscript>d",
        # entities: one decode level only
        "5 &lt; 6 &amp;&amp; &amp;lt;literal&amp;gt; &quot;q&#39;s&quot;&nbsp;!",
        # decoded angle brackets are NOT re-parsed as tags
        "&lt;b&gt;not a tag&lt;/b&gt;",
        # whitespace collapse across newlines and tabs
        "<div>\n  a\t\tb\n</div>\n<p> c </p>",
        # UNCLOSED script (truncated crawl payload): source must not
        # leak into text — opener-to-EOF fallback (r12 review)
        '<p>intro</p><script>var k = "secret"; track()',
        "<style>p{x:1}",
    ])
    assert got[0] == ""
    assert got[1] == ""
    assert got[2] == "plain text no markup"
    assert got[3] == "a b"
    assert got[4] == "ok"
    assert got[5] == "c"
    assert got[6] == "done"
    # noscript content is invisible text: the whole block — nested
    # template included — drops at the noscript closer
    assert got[7] == "d"
    assert got[8] == '5 < 6 && &lt;literal&gt; "q\'s" !'
    assert got[9] == "<b>not a tag</b>"
    assert got[10] == "a b c"
    assert got[11] == "intro"
    assert got[12] == ""


_TAGS = ["div", "p", "span", "b", "em", "section", "li"]


def _wrap(words: list[str], rng: random.Random, depth: int = 0) -> str:
    """Random nested markup whose visible text is exactly
    ``' '.join(words)``: words are split into segments, each segment
    either stays bare, nests inside a random tag (recursively), or is
    preceded by invisible junk (comment / script / style block)."""
    if not words:
        parts = []
    else:
        cut = rng.randint(1, len(words))
        head, tail = words[:cut], words[cut:]
        choice = rng.random()
        if depth < 4 and choice < 0.5:
            tag = rng.choice(_TAGS)
            attrs = rng.choice(["", ' class="x"', " id='y' data-z=1"])
            seg = f"<{tag}{attrs}>{_wrap(head, rng, depth + 1)}</{tag}>"
        else:
            seg = " ".join(head)
        junk = ""
        if choice > 0.7:
            junk = rng.choice([
                "<!-- hidden <b>bold</b> -->",
                '<script>if (1 < 2) { s = "</div>"; }</script>',
                "<style>a>b{c:d}</style>",
            ])
        parts = [junk, seg, _wrap(tail, rng, depth)]
    return " ".join(p for p in parts if p)


@settings(max_examples=25, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcdefg", min_size=1, max_size=5),
        min_size=0, max_size=12,
    ),
    seed=st.integers(0, 2**31),
)
def test_nesting_property(spark, words, seed):
    html = _wrap(words, random.Random(seed))
    [got] = _run(spark, [f"<html><body>{html}</body></html>"])
    assert got == " ".join(words)


def test_unclosed_comment_does_not_leak(spark):
    """Truncated payload ending mid-comment: the comment body and the
    literal '<!--' must degrade to whitespace, matching the unclosed
    content-element contract (r12 review #2)."""
    from pyspark.sql import functions as F

    from automated_etl_pipeline_spark.functions.html import extract_text

    df = spark.createDataFrame(
        [("visible text <!-- tracking boilerplate <div>x",)], "h string"
    )
    got = df.select(extract_text(F.col("h")).alias("t")).collect()[0]["t"]
    assert got == "visible text"
