"""Shared engine-portable hash derivations.

``md5_double_hash`` is a PINNED cross-engine contract: the Bloom
filter (operators/bloom.py), the count-min sketch
(functions/countmin.py), and their DuckDB oracles all rebuild exactly
``h1 = int(md5(key)[0:8], 16)``, ``h2 = int(md5(key)[8:16], 16)`` and
derive probe positions as ``(h1 + i*h2) mod m`` (Kirsch &
Mitzenmacher 2006: k hashes from one digest).  One implementation
here, so an edit cannot silently break one operator's engine parity
while the other still matches (r12 review #8)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_double_hash(key: Column) -> tuple[Column, Column]:
    """Two 32-bit base hashes from one md5 of the key's string form."""
    d = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(d, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(d, 9, 8), 16, 10).cast("long")
    return h1, h2
