"""Prototype: fused SimHash bit-vote vs current 64-HOF version. Timing at sf0.1."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from automated_etl_pipeline_spark.session import get_spark
from automated_etl_pipeline_spark.dedup import simhash as sh

spark = get_spark()
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
docs.count()


def explode_bits(docs, id_col="doc_id", text_col="text"):
    """Explode distinct tokens -> hash -> groupBy(doc) with 64 codegen sums."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    )
    hashed = toks.select(
        id_col, F.substring(F.md5("tok"), 1, 16).alias("hm")
    ).select(
        id_col,
        F.conv(F.substring("hm", 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring("hm", 9, 8), 16, 10).cast("long").alias("h2"),
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for j in range(32):
        aggs.append(
            F.sum(F.shiftright(F.col("h1"), 31 - j).bitwiseAND(F.lit(1))).alias(f"c{j}")
        )
    for j in range(32):
        aggs.append(
            F.sum(F.shiftright(F.col("h2"), 31 - j).bitwiseAND(F.lit(1))).alias(
                f"c{32 + j}"
            )
        )
    counted = hashed.groupBy(id_col).agg(*aggs)
    bit = lambda k: F.when(2 * F.col(f"c{k}") > F.col("n"), 1).otherwise(0)
    return counted.select(id_col, F.array(*[bit(k) for k in range(64)]).alias("bs"))


def struct_agg_bits(docs, id_col="doc_id", text_col="text"):
    """One F.aggregate pass with a 64-field struct accumulator."""
    toks = F.array_distinct(F.split(F.col(text_col), " "))
    hashed = docs.select(
        F.col(id_col),
        F.transform(toks, lambda t: F.substring(F.md5(t), 1, 16)).alias("hm"),
    )
    parsed = hashed.select(
        id_col,
        F.transform(
            "hm", lambda m: F.conv(F.substring(m, 1, 8), 16, 10).cast("long")
        ).alias("h1"),
        F.transform(
            "hm", lambda m: F.conv(F.substring(m, 9, 8), 16, 10).cast("long")
        ).alias("h2"),
        F.size("hm").alias("n"),
    )

    def counters(arr):
        zero = F.struct(*[F.lit(0).cast("long").alias(f"c{j}") for j in range(32)])
        return F.aggregate(
            F.col(arr),
            zero,
            lambda acc, v: F.struct(
                *[
                    (acc[f"c{j}"] + F.shiftright(v, 31 - j).bitwiseAND(F.lit(1))).alias(
                        f"c{j}"
                    )
                    for j in range(32)
                ]
            ),
        )

    counted = parsed.select(
        id_col, "n", counters("h1").alias("k1"), counters("h2").alias("k2")
    )
    bit = lambda h, j: F.when(2 * F.col(h)[f"c{j}"] > F.col("n"), 1).otherwise(0)
    return counted.select(
        id_col,
        F.array(
            *[bit("k1", j) for j in range(32)], *[bit("k2", j) for j in range(32)]
        ).alias("bs"),
    )


def timeit(name, df):
    t = time.time()
    out = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.aggregate("bs", F.lit(0), lambda a, b: a + b)).alias("bitsum"),
    ).collect()[0]
    print(f"{name}: {time.time() - t:.2f}s  rows={out['n']} bitsum={out['bitsum']}")


timeit("current(64-HOF)", sh.simhash_bits(docs))
timeit("explode+groupBy", explode_bits(docs))
timeit("struct-aggregate", struct_agg_bits(docs))
# correctness cross-check on sf0.01
d2 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
a = sh.simhash_bits(d2).withColumnRenamed("bs", "bs_a")
b = explode_bits(d2).withColumnRenamed("bs", "bs_b")
c = struct_agg_bits(d2).withColumnRenamed("bs", "bs_c")
j = a.join(b, "doc_id").join(c, "doc_id")
diff = j.filter(
    (F.col("bs_a") != F.col("bs_b")) | (F.col("bs_a") != F.col("bs_c"))
).count()
print("mismatched rows sf0.01:", diff)
