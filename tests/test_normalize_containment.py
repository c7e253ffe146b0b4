"""functions/normalize.py and dedup/containment.py unit contracts."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from automated_etl_pipeline_spark.dedup.containment import containment_pairs
from automated_etl_pipeline_spark.functions.normalize import (
    ACCENTED,
    PLAIN,
    normalize_text_key,
)


def _norm(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "t string")
    return [r["k"] for r in df.select(normalize_text_key(F.col("t")).alias("k")).collect()]


def test_normalize_folds_cases_accents_punct(spark):
    got = _norm(
        spark,
        [
            "Café  MENU!!",
            "  cafe menu  ",
            "CAFÉ-menu",
            "cafe\tmenu\n",
            "ÀÉÎÕÜ çñ",
        ],
    )
    assert got[:4] == ["cafe menu"] * 4
    assert got[4] == "aeiou cn"


def test_normalize_is_idempotent_and_null_safe(spark):
    samples = ["Déjà vu -- Encore!", "a  b   c", "", "  ", None, "123 GO"]
    df = spark.createDataFrame([(v,) for v in samples], "t string")
    once = df.select(normalize_text_key(F.col("t")).alias("k"))
    twice = once.select(normalize_text_key(F.col("k")).alias("k"))
    assert [r["k"] for r in once.collect()] == [r["k"] for r in twice.collect()]
    vals = [r["k"] for r in once.collect()]
    assert vals[2] == "" and vals[3] == ""
    assert vals[4] is None


def test_fold_table_is_consistent():
    assert len(ACCENTED) == len(PLAIN)
    assert len(set(ACCENTED)) == len(ACCENTED)  # no char mapped twice


def _pairs(spark, docs, threshold):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        (r["doc_sub"], r["doc_super"]): r["containment"]
        for r in containment_pairs(df, threshold=threshold).collect()
    }


def test_planted_fragment_is_contained_not_jaccard_similar(spark):
    words = [f"w{i}" for i in range(60)]
    full = " ".join(words)
    frag = " ".join(words[:22])  # ~37% of the parent
    got = _pairs(spark, [(1, full), (2, frag)], 0.8)
    assert (2, 1) in got and got[(2, 1)] == 1.0
    assert (1, 2) not in got  # the direction matters


def test_mutual_copies_appear_both_directions(spark):
    text = " ".join(f"t{i}" for i in range(30))
    got = _pairs(spark, [(1, text), (2, text)], 0.8)
    assert got[(1, 2)] == 1.0 and got[(2, 1)] == 1.0


def test_completeness_vs_bruteforce_on_random_sets(spark):
    """Prefix-filtered result must equal the brute-force directed
    containment over every pair, on seeded random word documents."""
    rng = random.Random(9)
    vocab = [f"v{i}" for i in range(40)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 60))))
        for i in range(30)
    ]

    def shingles(text):
        t = text.split(" ")
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    sets = {i: shingles(x) for i, x in docs if len(shingles(x)) > 0}
    expected = {}
    for a, b in itertools.permutations(sets, 2):
        c = round(len(sets[a] & sets[b]) / len(sets[a]), 6)
        if c >= 0.5:
            expected[(a, b)] = c
    got = _pairs(spark, docs, 0.5)
    assert got == expected
