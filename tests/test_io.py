"""Source/sink tests (SURVEY.md §2.1 S1-S5)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from automated_etl_pipeline_spark.io.sinks import (
    NotNullViolation,
    validate_not_null,
    write_parquet_append,
)
from automated_etl_pipeline_spark.io.sources import read_csv
from automated_etl_pipeline_spark import schemas


def test_read_csv_explicit_schema(spark, football_csv):
    df = read_csv(spark, football_csv, schemas.FOOTBALL_RESULTS, mode="PERMISSIVE")
    assert df.schema == schemas.FOOTBALL_RESULTS
    assert df.count() == 8
    # typed read: score is int, neutral is boolean
    row = df.filter(df.home_team == "SCOTLAND").first()
    assert row.home_score == 0 and row.neutral is False


def test_validate_not_null_passes_and_fails(spark):
    clean = spark.createDataFrame([Row(a=1, b="x")], "a int, b string")
    assert validate_not_null(clean) is clean
    dirty = spark.createDataFrame([Row(a=1, b=None)], "a int, b string")
    with pytest.raises(NotNullViolation, match="b"):
        validate_not_null(dirty, ["a", "b"])


def test_idempotent_append_run_id(spark, tmp_path):
    """S5 + SURVEY.md §4.3: same run_id re-written twice → no duplicates;
    a second run_id appends."""
    path = str(tmp_path / "warehouse")
    df = spark.createDataFrame([Row(k=1), Row(k=2)], "k int")
    write_parquet_append(df, path, run_id="r1")
    write_parquet_append(df, path, run_id="r1")  # retry — must not duplicate
    assert spark.read.parquet(path).count() == 2
    write_parquet_append(df, path, run_id="r2")
    assert spark.read.parquet(path).count() == 4


def test_normalize_nanos_pre_epoch_matches_duckdb(spark, tmp_path):
    """Pin _normalize_nanos's floor-division ns→µs semantics for
    PRE-EPOCH values against the DuckDB oracle (ADVICE r2: DuckDB's
    cast path could be truncation-toward-zero in some versions — this
    test fails loudly if the installed DuckDB disagrees)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from automated_etl_pipeline_spark.io.sources import _normalize_nanos

    nanos = [-1, -999, -1000, -1001, -1_500_000_001, 0, 1, 1999, 1_500_000_001]
    tbl = pa.table({"ts": pa.array(nanos, type=pa.timestamp("ns"))})
    path = str(tmp_path / "nanos.parquet")
    pq.write_table(tbl, path)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sdf = _normalize_nanos(spark.read.parquet(path))
    got = sorted(r.ts for r in sdf.collect())

    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT CAST(ts AS TIMESTAMP) FROM '{path}' "
        ).fetchall()
    )
    assert got == want


def test_normalize_ntz_to_timestamp_matches_duckdb(spark, tmp_path):
    """Pin the TIMESTAMP_NTZ path of _normalize_nanos (round-3 driver
    testdata regeneration: parquet µs with isAdjustedToUTC=false, the
    pandas/pyarrow default).  Under the UTC-pinned session the NTZ →
    TIMESTAMP cast must be a pure type change: wall-clock values equal
    DuckDB's naive read of the same file, and downstream NTZ-unsafe
    expressions (unix_micros) work."""
    import datetime

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from automated_etl_pipeline_spark.io.sources import _normalize_nanos

    vals = [
        datetime.datetime(2024, 1, 1, 0, 0, 0),
        datetime.datetime(2024, 6, 15, 23, 59, 59, 999999),
        datetime.datetime(1969, 12, 31, 23, 59, 59, 500000),
    ]
    tbl = pa.table({"ts": pa.array(vals, type=pa.timestamp("us"))})
    path = str(tmp_path / "ntz.parquet")
    pq.write_table(tbl, path)

    raw = spark.read.parquet(path)
    assert isinstance(raw.schema["ts"].dataType, T.TimestampNTZType)
    sdf = _normalize_nanos(raw)
    assert isinstance(sdf.schema["ts"].dataType, T.TimestampType)
    # NTZ-unsafe expression now works and values are unshifted
    got = sorted(r.us for r in sdf.select(F.unix_micros("ts").alias("us")).collect())
    # duckdb epoch_us treats the naive timestamp as UTC — same contract
    want = sorted(
        r[0] for r in duckdb.sql(f"SELECT epoch_us(ts) FROM '{path}'").fetchall()
    )
    assert got == want


def test_normalize_ntz_is_session_timezone_independent(tmp_path):
    """r9: a non-UTC session must read the SAME instants as UTC —
    the bare NTZ->timestamp cast shifted them by the session offset
    (caught by the --tz matrix leg).  The loader pins wall-as-UTC by
    PURE DATE ARITHMETIC on the NTZ value (epoch-day*86400e6 +
    intraday micros -> timestamp_micros; io/sources._normalize_nanos)
    — NOT via from_utc_timestamp(cast, session), which is still wrong
    for wall times inside a DST spring-forward gap, where the cast
    resolves the nonexistent local time forward before the offset is
    undone; the gap value in this frame pins that too."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from automated_etl_pipeline_spark.io.sources import _normalize_nanos

    vals = [
        datetime.datetime(2024, 1, 1, 0, 0, 0),
        datetime.datetime(2024, 6, 15, 12, 30, 45, 123456),
        # inside the US spring-forward gap: 02:30 local does not exist
        # on 2024-03-10 in America/New_York — a cast-based conversion
        # resolves it forward and shifts the instant (r9 code review);
        # the pure-date-arithmetic path must not care
        datetime.datetime(2024, 3, 10, 2, 30, 0),
        # pre-epoch wall time: negative epoch day + positive intraday
        datetime.datetime(1969, 12, 31, 23, 59, 59, 500000),
    ]
    tbl = pa.table({"ts": pa.array(vals, type=pa.timestamp("us"))})
    path = str(tmp_path / "ntz_tz.parquet")
    pq.write_table(tbl, path)

    spark = SparkSession.getActiveSession() or SparkSession.builder.master(
        "local[2]"
    ).getOrCreate()
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        micros = {}
        for tz in ("UTC", "Asia/Kolkata", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            sdf = _normalize_nanos(spark.read.parquet(path))
            micros[tz] = sorted(
                r.us for r in sdf.select(F.unix_micros("ts").alias("us")).collect()
            )
        assert micros["Asia/Kolkata"] == micros["UTC"]
        assert micros["America/New_York"] == micros["UTC"]
        # and the UTC reading is the wall-as-UTC contract, gap and
        # pre-epoch values included
        want = sorted(
            int(round(
                v.replace(tzinfo=datetime.timezone.utc).timestamp()
                * 1_000_000
            ))
            for v in vals
        )
        assert micros["UTC"] == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
