"""Text normalization for dedup keys: accent folding, case folding,
punctuation/whitespace canonicalization — all JVM expressions.

Exact dedup keyed on raw bytes misses trivially-reformatted copies
('Café  Menu!!' vs 'cafe menu'); every production dedup cascade
normalizes first (CCNet lowercases + strips accents/punctuation before
hashing lines; C4/Gopher variants do the same per document).  This
module is that stage as pure column expressions:

- ``fold_accents``: 1:1 ``translate`` over an explicit Latin-1/Latin
  Extended vowel+consonant table (both cases).  ``translate`` is a
  character map — no regex engine, codegen-friendly, and the table is
  the documented contract (NOT a full Unicode NFKD — Spark SQL has no
  native normalizer; payloads beyond the table pass through unchanged
  and a real multilingual corpus would front this with an ICU pass in
  the ingest decoder).
- ``normalize_text_key``: fold -> lower -> every non-alphanumeric run
  becomes ONE space -> trim.  Idempotent by construction (second
  application is the identity — tests assert it), so cascades can
  re-normalize safely.

Scale: one projection, no shuffle, no UDF; the normalized key feeds
the existing exact-dedup groupBy unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PAIRS: list[tuple[str, str]] = [
    ("áàâäãå", "a"), ("ÁÀÂÄÃÅ", "A"),
    ("éèêë", "e"), ("ÉÈÊË", "E"),
    ("íìîï", "i"), ("ÍÌÎÏ", "I"),
    ("óòôöõø", "o"), ("ÓÒÔÖÕØ", "O"),
    ("úùûü", "u"), ("ÚÙÛÜ", "U"),
    ("ç", "c"), ("Ç", "C"),
    ("ñ", "n"), ("Ñ", "N"),
    ("ýÿ", "y"), ("Ý", "Y"),
]

ACCENTED = "".join(src for src, _ in _PAIRS)
PLAIN = "".join(dst * len(src) for src, dst in _PAIRS)
assert len(ACCENTED) == len(PLAIN)


def fold_accents(c: Column) -> Column:
    """Map table-listed accented characters to their base letters."""
    return F.translate(c, ACCENTED, PLAIN)


def normalize_text_key(c: Column) -> Column:
    """Canonical dedup key: accent-fold, lowercase, collapse every
    non-alphanumeric run to one space, trim.  NULL-safe (NULL in,
    NULL out)."""
    return F.trim(
        F.regexp_replace(F.lower(fold_accents(c)), "[^a-z0-9]+", " ")
    )
