"""Custom Python Data Source (io/pysource.py): partition planning,
filter pushdown folding, and generated-row determinism."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    LessThan,
    StringStartsWith,
)

from automated_etl_pipeline_spark.io.pysource import _Reader, _row, register


def test_pushdown_folds_id_range_and_returns_rest():
    r = _Reader({"n_rows": "1000", "n_parts": "4"})
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("id",), 100),
                LessThan(("id",), 600),
                StringStartsWith(("other",), "x"),  # unsupported -> returned
            ]
        )
    )
    assert r.lo == 100 and r.hi == 600
    assert leftover == [StringStartsWith(("other",), "x")]
    # partitions cover exactly [100, 600) with no overlap
    parts = r.partitions()
    covered = sorted((p.start, p.end) for p in parts)
    assert covered[0][0] == 100 and covered[-1][1] == 600
    assert all(a[1] == b[0] for a, b in zip(covered, covered[1:]))


def test_pushdown_equality_collapses_to_single_row():
    r = _Reader({"n_rows": "1000"})
    rest = list(r.pushFilters([EqualTo(("id",), 42)]))
    assert rest == [] and (r.lo, r.hi) == (42, 43)
    rows = [row for p in r.partitions() for row in r.read(p)]
    assert rows == [_row(42)]


def test_source_rows_match_formula_through_spark(spark):
    register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 5000)
        .option("n_parts", 4)
        .load()
    )
    got = df.filter(F.col("id").isin(0, 1, 4999)).orderBy("id").collect()
    assert [tuple(r) for r in got] == [_row(0), _row(1), _row(4999)]
    assert df.count() == 5000
    # unsupported predicate still evaluated correctly post-scan
    assert df.filter(F.col("user_id") == 3).count() == 5000 // 150 + (1 if 3 < 5000 % 150 else 0)
