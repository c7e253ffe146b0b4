"""Unit tests for operators/cleaning.py (SURVEY.md §2.7 F1-F5)."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from automated_etl_pipeline_spark.operators import cleaning


def test_multi_format_date_all_formats(spark):
    df = spark.createDataFrame(
        [("06/15/2014",), ("2014-06-15",), ("15-06-2014",), ("15/06/2014",), ("garbage",), (None,)],
        "s string",
    )
    out = df.select(cleaning.multi_format_date("s").alias("d")).collect()
    expected = datetime.date(2014, 6, 15)
    assert [r.d for r in out] == [expected] * 4 + [None, None]


def test_multi_format_date_ambiguous_precedence(spark):
    # '03-02-1900': invalid under yyyy-MM-dd (strict), so dd-MM-yyyy wins
    # → 1900-02-03, NOT a lenient mis-parse (SURVEY.md §4.3).
    df = spark.createDataFrame([("03-02-1900",)], "s string")
    (row,) = df.select(cleaning.multi_format_date("s").alias("d")).collect()
    assert row.d == datetime.date(1900, 2, 3)


def test_nan_to_null(spark):
    df = spark.createDataFrame(
        [Row(x=1.0, y="a"), Row(x=float("nan"), y="b")],
        T.StructType(
            [T.StructField("x", T.DoubleType()), T.StructField("y", T.StringType())]
        ),
    )
    out = cleaning.nan_to_null(df).collect()
    assert out[0].x == 1.0
    assert out[1].x is None
    assert not any(v is not None and math.isnan(v) for v in [r.x for r in out])


def test_fill_nulls_typed(spark):
    df = spark.createDataFrame(
        [Row(score=None, neutral=None), Row(score=3, neutral=True)],
        "score int, neutral boolean",
    )
    out = cleaning.fill_nulls(df, {"score": -1, "neutral": False}).collect()
    assert (out[0].score, out[0].neutral) == (-1, False)
    assert (out[1].score, out[1].neutral) == (3, True)


def test_normalize_case(spark):
    df = spark.createDataFrame([("SCOTLAND", 1), ("rio de janeiro", 2)], "name string, k int")
    out = cleaning.normalize_case(df, ["name"]).collect()
    assert [r.name for r in out] == ["Scotland", "Rio De Janeiro"]
    assert [r.k for r in out] == [1, 2]  # non-string untouched


def test_cast_to_schema(spark):
    df = spark.createDataFrame([("5", "2.5")], "a string, b string")
    target = T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.DoubleType())]
    )
    out = cleaning.cast_to_schema(df, target)
    assert [f.dataType for f in out.schema.fields] == [T.IntegerType(), T.DoubleType()]
    (row,) = out.collect()
    assert (row.a, row.b) == (5, 2.5)


# ----------------------------------------------------------------------
# fk_audit (operators/quality.py): the orphan arithmetic, pinned on
# planted-orphan frames (the registry gate's clean testdata correctly
# reports 0 orphans everywhere, so the counting path is proven here).
# ----------------------------------------------------------------------


def test_fk_audit_counts_planted_orphans(spark):
    from automated_etl_pipeline_spark.operators.quality import fk_audit

    child = spark.createDataFrame(
        # 3 rows -> parent 1; 2 rows -> parent 2; 4 orphan rows over
        # 2 missing keys; 2 NULL-key rows (orphans by contract)
        [(1,), (1,), (1,), (2,), (2,), (9,), (9,), (8,), (8,), (None,), (None,)],
        "fk int",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    row = fk_audit(child, "fk", parent, "pk", "t").collect()[0]
    assert row["fk"] == "t"
    assert row["n_rows"] == 11
    # COUNT(DISTINCT fk) semantics: NULL is not a key (ADVICE r8);
    # NULL rows are broken out in n_null_rows instead
    assert row["n_distinct_keys"] == 4  # 1, 2, 9, 8
    assert row["n_orphan_rows"] == 6  # 9,9,8,8 + the two NULLs
    assert row["n_null_rows"] == 2


def test_fk_audit_clean_relationship_zero_orphans(spark):
    from automated_etl_pipeline_spark.operators.quality import fk_audit

    child = spark.createDataFrame([(i % 3,) for i in range(30)], "fk int")
    parent = spark.createDataFrame([(0,), (1,), (2,), (3,)], "pk int")
    row = fk_audit(child, "fk", parent, "pk", "clean").collect()[0]
    assert (
        row["n_rows"],
        row["n_distinct_keys"],
        row["n_orphan_rows"],
        row["n_null_rows"],
    ) == (30, 3, 0, 0)
