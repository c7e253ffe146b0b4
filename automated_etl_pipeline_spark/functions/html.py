"""HTML / boilerplate text extraction as pure regexp column
expressions — the curation stage every web-crawl pipeline runs BEFORE
language ID, quality scoring, perplexity partitioning, and dedup
(CCNet, C4, RefinedWeb all start from WET/WARC HTML payloads).

The extractor is deliberately a STREAMING-SAFE approximation, not a
DOM parser: chained ``regexp_replace`` passes that (1) drop comments,
(2) drop <script>/<style>/<noscript>/<template> elements WITH their
content (non-greedy dot-all — an embedded ``</p>`` inside a script
string does not terminate the block early), (3) strip every remaining
tag to a space, (4) decode the six ubiquitous entities (``&amp;``
LAST, so ``&amp;lt;`` correctly yields the literal ``&lt;``), and
(5) collapse whitespace.  That is the same altitude as the reference
extractors used for LLM corpora (resiliparse/justext are
quality-tuned variants of exactly these passes); a full HTML5 parser
is out of scope and its absence is visible — malformed markup
degrades to extra whitespace, never to an exception.

Pattern portability: every pattern sits in the Java-regex ∩ RE2
subset (functions/redact.py's contract) — inline ``(?is)`` flags,
non-greedy repetition, character classes; no lookarounds, no
backreferences — so the same pattern set runs on Spark, DuckDB, Go,
or Rust unchanged.

Scale: the whole extractor is one projection of chained JVM regex
expressions — no UDF, no shuffle; at 100 TB it rides the scan that
already reads the payload column and stays inside whole-stage
codegen.

Reference parity note: the reference pipeline
(nareshpendyala/Automated-ETL-Pipeline) ingests structured CSV and
has no HTML surface; this extends the engine's LLM-curation family
(SURVEY.md §2.11, VERDICT r11 ask #5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Elements whose CONTENT is boilerplate, dropped wholesale.  Applied
# before generic tag stripping so their bodies never leak into text.
_CONTENT_ELEMENTS = ("script", "style", "noscript", "template")

# Entity decode table, applied in order — &amp; MUST come last so
# double-encoded sequences (&amp;lt;) decode exactly one level.
ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def extract_text(html: Column) -> Column:
    """Visible text of an HTML payload: comments and
    script/style/noscript/template elements removed with their
    content, remaining tags stripped to spaces, common entities
    decoded, whitespace collapsed, ends trimmed.  NULL html yields
    the empty string (curation pipelines treat a bodyless page as an
    empty doc, the operators/cleaning.py posture)."""
    out = F.coalesce(html, F.lit(""))
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    # UNCLOSED comment (truncated payload): same degradation contract
    # as the unclosed content-elements below — drop to end of string,
    # or the comment body plus a literal '<!--' would leak through the
    # generic tag strip (r12 review #2)
    out = F.regexp_replace(out, r"(?s)<!--.*$", " ")
    for el in _CONTENT_ELEMENTS:
        # closer tolerates attribute junk (</script aria>) the way
        # browsers do; \b keeps </scripty> from closing a script
        out = F.regexp_replace(out, rf"(?is)<{el}\b.*?</{el}\b[^>]*>", " ")
        # UNCLOSED block (truncated crawl payload): drop opener to end
        # of string, or the whole script/style source would leak into
        # the extracted text through the generic tag strip below
        # (r12 review — the documented degradation is whitespace,
        # never leaked source)
        out = F.regexp_replace(out, rf"(?is)<{el}\b[^>]*>.*$", " ")
    out = F.regexp_replace(out, r"<[^>]*>", " ")
    for ent, rep in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    # explicit ASCII-whitespace class, NOT \s: Java \s includes
    # vertical tab (\x0B) but RE2 \s does not — the one divergence in
    # an otherwise-shared subset (r12 review); this class is identical
    # in both and spells out exactly Java's \s
    out = F.regexp_replace(out, r"[ \t\n\x0B\f\r]+", " ")
    return F.trim(out)
