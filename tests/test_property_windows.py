"""Hypothesis differential properties for the r9 window operators.

The hand-written tests (test_rolling.py, test_prefix.py) pin the known
boundary cases; these randomized properties search the space the
authors DIDN'T think of: arbitrary tie patterns, degenerate windows,
bucket widths that divide / don't divide the order range, negative
measures, duplicate rows.  Oracle = the naive single-window plan the
operators exist to replace — equality must be exact (integer sums).

Examples are kept small (each is a Spark job); the session-scoped
spark fixture is shared, so suppress hypothesis's fixture health
check deliberately.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.window import Window

from automated_etl_pipeline_spark.operators.prefix import bucketed_prefix_sum
from automated_etl_pipeline_spark.operators.rolling import (
    trailing_integer_moments,
)

# tight value ranges force order ties, bucket-boundary hits and
# window-edge collisions far more often than wide ones would
ROWS = st.lists(
    st.tuples(
        st.integers(0, 2),        # key
        st.integers(0, 40),       # order position
        st.integers(0, 9),        # tiebreak
        st.integers(-5, 5),       # measure
    ),
    min_size=1,
    max_size=50,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(rows=ROWS, span=st.sampled_from([0, 1, 5, 17, 100]))
def test_trailing_moments_equal_sliding_frame(spark, rows, span):
    df = spark.createDataFrame(rows, "k long, us long, tb long, x long")
    win = (
        Window.partitionBy("k").orderBy("us").rangeBetween(-span, 0)
    )
    want = sorted(
        tuple(r)
        for r in df.select(
            "k",
            "us",
            "x",
            F.sum("x").over(win).alias("sc"),
            F.sum(F.col("x") * F.col("x")).over(win).alias("s2c"),
            F.count(F.lit(1)).over(win).alias("n"),
        ).collect()
    )
    got = sorted(
        (r.k, r.us, r.x, r.sc, r.s2c, r.n)
        for r in trailing_integer_moments(df, "k", "us", "x", span).collect()
    )
    assert got == want


@settings(**_SETTINGS)
@given(rows=ROWS, bucket=st.sampled_from([1, 3, 7, 1000]))
def test_bucketed_prefix_equal_single_window(spark, rows, bucket):
    # prefix needs a total order: dedupe (k, us, tb) triples
    seen, uniq = set(), []
    for k, us, tb, x in rows:
        if (k, us, tb) not in seen:
            seen.add((k, us, tb))
            uniq.append((k, us, tb, x))
    df = spark.createDataFrame(uniq, "k long, us long, tb long, x long")
    w = (
        Window.partitionBy("k")
        .orderBy("us", "tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.k, r.us, r.tb): r.prefix
        for r in df.withColumn("prefix", F.sum("x").over(w)).collect()
    }
    got = {
        (r.k, r.us, r.tb): r.prefix
        for r in bucketed_prefix_sum(df, "k", "us", "tb", "x", bucket).collect()
    }
    assert got == want
