"""Exact n-gram (shingle) Jaccard near-duplicate pairs.

The third point on the dedup accuracy/cost curve (alongside
``dedup/minhash.py``'s probabilistic LSH and ``dedup/simhash.py``'s
bit-fingerprints): candidates come from an inverted shingle index
(any pair sharing at least one *discriminative* shingle), and every
candidate is verified with the exact set Jaccard — no approximation in
the similarity value itself.

Scale design:
- The inverted index is one explode + one self-equi-join on the shingle
  string. Worst case is sum(df^2) over shingles, so ultra-common
  ("hot") shingles are dropped from the index with a relative
  document-frequency cap (``max_df_frac``) — the classic stop-shingle
  trick. Pairs that share *only* hot shingles are missed, but such
  pairs are overwhelmingly low-Jaccard at any realistic threshold;
  verification always uses the full shingle sets, so reported values
  are exact.
- The candidate join shuffles on the shingle key (well-distributed by
  construction once hot keys are capped). Verification joins shingle
  arrays back by doc id — two broadcast-or-shuffle hash joins.
- The next refinement at 100 TB is positional prefix filtering
  (PPJoin): index only the first ceil((1-t)*|S|)+1 shingles of each
  doc in a global frequency order. Kept out of v1 for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# THE shingle definition is shared with MinHash — near-dedup stages of
# a cascade must agree on what a shingle is, and both modules' oracle
# SQL mirrors this single implementation.
from automated_etl_pipeline_spark.dedup.minhash import shingle_set as token_ngrams


def shingle_hash60(s: Column) -> Column:
    """60-bit shingle hash: first 15 hex chars of md5, parsed base-16.

    Why not minhash.shingle_hashes' 32-bit variant: that width exists
    for the permutation arithmetic (products must stay under BIGINT);
    here the hash IS the set element, and at 32 bits a corpus-wide
    birthday collision is likely (n²/2³³), silently perturbing an
    "exact" Jaccard.  60 bits keeps collisions negligible AND parses
    identically in DuckDB (('0x' || 15 hex)::BIGINT < 2⁶³ never
    overflows; 16 hex could)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
    max_df_frac: float = 0.1,
    min_common: int = 2,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for all pairs with exact shingle-set
    Jaccard >= threshold that share >= min_common shingles of relative
    document frequency <= max_df_frac.

    ``min_common`` is a count filter on the candidate join (PPJoin's
    counting step): pairs sharing a single discriminative shingle are
    overwhelmingly chance collisions far below any useful threshold,
    and dropping them shrinks the verification input by ~an order of
    magnitude. The shingle table is localCheckpoint-ed — the index
    self-join plus the two verification joins would otherwise
    re-execute the shingle pass three times (persist(MEMORY_AND_DISK)
    at cluster scale).

    Shingles are 60-bit-hashed ONCE up front (``shingle_hash60``): the
    index join keys and the verification arrays are then 8-byte longs
    instead of raw n-gram strings — a several-fold smaller shuffle
    payload for the exact-verify join, with identical Jaccard values
    (the oracle hashes its sets the same way; collisions at 60 bits
    are ~n²/2⁶¹)."""
    sh = (
        docs.select(
            F.col(id_col),
            F.array_distinct(
                F.transform(token_ngrams(F.col(text_col), n), shingle_hash60)
            ).alias("s"),
        )
        .filter(F.size("s") > 0)
        .localCheckpoint()
    )

    inv = sh.select(id_col, F.explode("s").alias("g"))
    n_docs = sh.agg(F.count(F.lit(1)).alias("n_docs"))
    keep = (
        inv.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") <= F.col("n_docs") * max_df_frac)
        .select("g")
    )
    # checkpoint the capped index: both sides of the candidate
    # self-join consume it, and each would otherwise re-run the
    # explode + df-agg + semi-join pipeline
    inv = inv.join(keep, "g", "left_semi").localCheckpoint()

    a, b = inv.alias("a"), inv.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
        .select("doc_a", "doc_b")
    )

    sa, sb = sh.alias("sa"), sh.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.s"), F.col("sb.s")))
    union = F.size(F.col("sa.s")) + F.size(F.col("sb.s")) - inter
    jac = F.round(inter.cast("double") / union, 6)
    return (
        cand.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
