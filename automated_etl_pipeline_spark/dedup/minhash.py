"""MinHash + LSH near-duplicate detection (LLM-pipeline extension).

Pipeline: tokenize → k-shingle → MinHash signature → LSH banding →
candidate pairs → exact-Jaccard verification. The standard near-dedup
cascade for LLM training corpora (Broder 1997's resemblance sketch;
banding analysis as in Mining of Massive Datasets ch.3).

Engine-portability design: permutations are simulated with
``md5(perm_id ':' shingle)`` and band keys with ``md5`` over signature
slices — identical hex in Spark and DuckDB, so the whole pipeline is
oracle-checkable (unlike engine-native hash(): xxhash64 vs murmur).

Scale analysis (100 TB corpus):
- Signatures are pure higher-order-function column expressions — zero
  shuffles, zero Python; O(P·|shingles|) per row inside codegen.
- The only shuffles are (a) groupBy(band_idx, band_hash) whose input is
  docs × B rows of ~50 bytes, (b) the pair self-join on doc ids.
- Bucket skew (a boilerplate shingle-set shared by millions of docs)
  is the classic hazard: ``max_bucket`` caps pair blowup per bucket and
  AQE skew-join handles the joins.

With P=12 permutations in B=4 bands × r=3 rows, the S-curve threshold
is (1/B)^(1/r) ≈ 0.63 — pairs with J ≥ 0.8 are caught w.p. ≥ 97%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_PERM = 12
DEFAULT_BANDS = 4
DEFAULT_SHINGLE_K = 3


def shingle_set(text: Column | str, k: int = DEFAULT_SHINGLE_K) -> Column:
    """Distinct k-token shingles of a whitespace-tokenized text."""
    t = F.split(F.col(text) if isinstance(text, str) else text, " ")
    idx = F.sequence(F.lit(1), F.size(t) - (k - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(t, i + j) for j in range(k)]
    )
    return F.array_distinct(F.transform(idx, gram))


def minhash_signature(shingles: Column, num_perm: int = DEFAULT_NUM_PERM) -> Column:
    """P-element signature: per permutation p, min md5('p:' + shingle).

    Lexicographic min over hex digests ≡ min over a random permutation
    of the shingle universe; identical in any engine with md5.
    """
    perms = F.sequence(F.lit(0), F.lit(num_perm - 1))
    return F.transform(
        perms,
        lambda p: F.array_min(
            F.transform(
                shingles, lambda s: F.md5(F.concat(p.cast("string"), F.lit(":"), s))
            )
        ),
    )


def lsh_bands(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Array of (band_idx, band_hash): md5 over each signature slice."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band_idx"),
            F.md5(
                F.concat_ws("|", F.slice(sig, b * rows_per_band + 1, rows_per_band))
            ).alias("band_hash"),
        ),
    )


def candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = DEFAULT_SHINGLE_K,
    max_bucket: int = 1000,
) -> DataFrame:
    """Distinct LSH candidate pairs (id_a < id_b).

    ``max_bucket`` drops degenerate buckets (near-identical boilerplate
    shared by huge doc sets) whose pair count would be quadratic; such
    docs are better handled by exact dedup upstream.
    """
    rows_per_band = num_perm // bands
    sh = docs.filter(F.size(F.split(text_col, " ")) >= shingle_k).select(
        F.col(id_col), shingle_set(text_col, shingle_k).alias("shingles")
    )
    sig = sh.select(id_col, minhash_signature(F.col("shingles"), num_perm).alias("sig"))
    banded = sig.select(
        id_col, F.explode(lsh_bands(F.col("sig"), bands, rows_per_band)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    # pairs within each bucket via nested HOFs (no UDF):
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )


def near_duplicate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = DEFAULT_SHINGLE_K,
) -> DataFrame:
    """Verified near-dup pairs: LSH candidates with exact shingle-set
    Jaccard ≥ threshold → (doc_a, doc_b, jaccard)."""
    cands = candidate_pairs(docs, id_col, text_col, num_perm, bands, shingle_k)
    sh = docs.filter(F.size(F.split(text_col, " ")) >= shingle_k).select(
        F.col(id_col), shingle_set(text_col, shingle_k).alias("sh")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def deduplicate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """Drop the higher-id member of every near-dup pair (greedy keep-min;
    one-hop, not transitive closure — iterate for full clustering)."""
    pairs = near_duplicate_pairs(docs, id_col, text_col, threshold)
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")
