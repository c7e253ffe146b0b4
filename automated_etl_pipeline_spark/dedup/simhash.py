"""SimHash near-duplicate detection (Charikar 2002, as used in
Manku et al. 2007 for web-scale dedup).

64-bit content fingerprint: each distinct token votes ±1 on every bit
position (from its md5), the sign of the vote sum sets the bit; texts
with small Hamming distance between fingerprints are near-duplicates.

Portability design (mirrors dedup/minhash.py): token bits come from md5
hex via nibble arithmetic — ``bit_j(t) = (nibble(md5(t), j div 4) >>
(3 - j % 4)) & 1`` — expressible identically in Spark SQL and DuckDB,
so fingerprints (and therefore pair results) are oracle-checkable.

Scale:
- Fingerprinting is a shuffle-free HOF expression (64 filter-counts
  over the distinct-token array per row, all in codegen).
- Candidate generation bands the 64-bit code into 4×16-bit quarters
  (pigeonhole: hamming ≤ 3 ⇒ at least one identical quarter), so the
  join key is a 4-hex-char block — the standard Manku trick that turns
  an O(n²) scan into 4 hash joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"

# bit j (0..63) of token t, from the first 16 hex chars of md5(t):
_BIT = (
    f"(shiftright(instr('{HEX}', substr(md5({{t}}), CAST({{j}} div 4 AS INT) + 1, 1)) - 1,"
    f" 3 - CAST({{j}} % 4 AS INT)) & 1)"
)


def simhash_bits_expr(tokens_col: str) -> str:
    """SQL expression: 64-element 0/1 array — bit j set iff more than
    half the distinct tokens have md5 bit j set."""
    bit = _BIT.format(t="t", j="j")
    return (
        f"transform(sequence(0, 63), j -> "
        f"IF(2 * size(filter({tokens_col}, t -> {bit} = 1)) > size({tokens_col}), 1, 0))"
    )


def simhash_hex_expr(bits_col: str) -> str:
    """SQL expression: rebuild the 64-bit array into 16 hex chars."""
    return (
        f"concat_ws('', transform(sequence(0, 15), nb -> substr('{HEX}', "
        f"1 + 8 * element_at({bits_col}, 4 * nb + 1) "
        f"+ 4 * element_at({bits_col}, 4 * nb + 2) "
        f"+ 2 * element_at({bits_col}, 4 * nb + 3) "
        f"+ element_at({bits_col}, 4 * nb + 4), 1)))"
    )


def hamming_hex_expr(a: str, b: str) -> str:
    """SQL expression: Hamming distance between two 16-hex fingerprints
    (sum of popcounts of XORed nibbles)."""
    nib = f"(instr('{HEX}', substr({{s}}, i + 1, 1)) - 1)"
    x = f"({nib.format(s=a)} ^ {nib.format(s=b)})"
    pop = (
        f"((shiftright({x}, 3) & 1) + (shiftright({x}, 2) & 1) "
        f"+ (shiftright({x}, 1) & 1) + ({x} & 1))"
    )
    return f"aggregate(sequence(0, 15), 0, (acc, i) -> acc + {pop})"


def with_simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash) — distinct whitespace tokens, 64-bit hex code."""
    toks = F.array_distinct(F.split(F.col(text_col), " "))
    return (
        docs.select(F.col(id_col), toks.alias("toks"))
        .select(id_col, F.expr(simhash_bits_expr("toks")).alias("bs"))
        .select(id_col, F.expr(simhash_hex_expr("bs")).alias("simhash"))
    )


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via 4-quarter
    banding (complete for max_hamming ≤ 3 by pigeonhole)."""
    sh = with_simhash(docs, id_col, text_col)
    quarters = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(3)),
            lambda q: F.struct(
                q.alias("q"), F.substring("simhash", q * 4 + 1, 4).alias("qk")
            ),
        )
    )
    banded = sh.select(id_col, "simhash", quarters.alias("band")).select(
        id_col, "simhash", "band.q", "band.qk"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.qk") == F.col("b.qk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        pairs.withColumn("hamming", F.expr(hamming_hex_expr("sh_a", "sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
