"""SCD-2 history operator tests (operators/scd.py)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from automated_etl_pipeline_spark.operators.scd import current_version, scd2_history


def _updates(spark):
    rows = [
        # key 1: A, A, B, A  -> 3 versions (A x2, B, A)
        (1, "2020-01-01", 10, "A"),
        (1, "2020-02-01", 11, "A"),
        (1, "2020-03-01", 12, "B"),
        (1, "2020-04-01", 13, "A"),
        # key 2: NULL -> NULL -> C : null run collapses, null->C changes
        (2, "2020-01-01", 20, None),
        (2, "2020-02-01", 21, None),
        (2, "2020-03-01", 22, "C"),
        # key 3: single row
        (3, "2020-06-01", 30, "Z"),
    ]
    return spark.createDataFrame(
        rows, "k int, d string, seq int, attr string"
    ).withColumn("d", F.to_date("d"))


def test_scd2_runs_and_validity(spark):
    hist = scd2_history(
        _updates(spark), ["k"], ["attr"], ts_col="d", tiebreak="seq"
    ).orderBy("k", "version")
    rows = hist.collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)

    k1 = by_key[1]
    assert [r.attr for r in k1] == ["A", "B", "A"]
    assert [r.n_updates for r in k1] == [2, 1, 1]
    assert k1[0].valid_from == datetime.date(2020, 1, 1)
    # intervals chain: each valid_to equals the next valid_from
    assert k1[0].valid_to == k1[1].valid_from == datetime.date(2020, 3, 1)
    assert k1[1].valid_to == k1[2].valid_from == datetime.date(2020, 4, 1)
    assert k1[2].valid_to is None

    k2 = by_key[2]
    assert [r.attr for r in k2] == [None, "C"]  # NULL run kept, NULL->C change
    assert [r.n_updates for r in k2] == [2, 1]

    assert len(by_key[3]) == 1 and by_key[3][0].valid_to is None


def test_scd2_current_version(spark):
    hist = scd2_history(_updates(spark), ["k"], ["attr"], ts_col="d", tiebreak="seq")
    live = {r.k: r.attr for r in current_version(hist).collect()}
    assert live == {1: "A", 2: "C", 3: "Z"}


def test_scd2_tiebreak_orders_same_day(spark):
    rows = [(1, "2020-01-01", 2, "B"), (1, "2020-01-01", 1, "A")]
    df = (
        _updates(spark)
        .sparkSession.createDataFrame(rows, "k int, d string, seq int, attr string")
        .withColumn("d", F.to_date("d"))
    )
    hist = scd2_history(df, ["k"], ["attr"], ts_col="d", tiebreak="seq").orderBy(
        "version"
    )
    assert [r.attr for r in hist.collect()] == ["A", "B"]  # seq order wins


def test_winnowing_guarantee(spark):
    """Two docs sharing a run of >= k+w-1 tokens MUST share >= 1
    fingerprint (Schleimer et al. 2003, theorem 1)."""
    from automated_etl_pipeline_spark.dedup.winnow import winnow_fingerprint_set

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens = k+w-1
    rows = [
        (1, "x1 y1 z1 " + shared + " p1 q1"),
        (2, "a2 b2 " + shared + " r2 s2 t2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = df.select(
        "doc_id",
        winnow_fingerprint_set(F.split("text", " "), k=4, w=5).alias("fp"),
    )
    a, b = [set(r.fp) for r in fp.orderBy("doc_id").collect()]
    assert a & b, "winnowing guarantee violated: no shared fingerprint"


# ---------------- MERGE / upsert (operators/merge.py) ----------------


def test_merge_upsert_last_writer_wins(spark):
    from automated_etl_pipeline_spark.operators.merge import merge_upsert

    snap = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "k int, v string, ver int"
    )
    upd = spark.createDataFrame(
        [(2, "B", 2), (4, "D", 2)], "k int, v string, ver int"
    )
    got = {r.k: r.v for r in merge_upsert(snap, upd, ["k"]).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_merge_upsert_version_wins_over_source(spark):
    """A LATE-arriving stale batch (lower version) must not clobber a
    newer snapshot row when version_col is given."""
    from automated_etl_pipeline_spark.operators.merge import merge_upsert

    snap = spark.createDataFrame([(1, "new", 5)], "k int, v string, ver int")
    stale = spark.createDataFrame([(1, "old", 3)], "k int, v string, ver int")
    got = merge_upsert(snap, stale, ["k"], version_col="ver").collect()
    assert got[0].v == "new"
    # equal versions: updates side wins (tie toward the batch)
    tie = spark.createDataFrame([(1, "tie", 5)], "k int, v string, ver int")
    got2 = merge_upsert(snap, tie, ["k"], version_col="ver").collect()
    assert got2[0].v == "tie"


def test_merge_delete_tombstones(spark):
    from automated_etl_pipeline_spark.operators.merge import merge_delete

    snap = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    dead = spark.createDataFrame([(2,), (9,)], "k int")
    got = sorted(r.k for r in merge_delete(snap, dead, ["k"]).collect())
    assert got == [1, 3]


# ------------- invariants on seeded random change streams -------------


def _random_stream(spark, seed=11, n=400, keys=25):
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = [
        (
            int(rng.integers(1, keys + 1)),
            f"2020-{1 + int(rng.integers(0, 12)):02d}-{1 + int(rng.integers(0, 28)):02d}",
            i,
            str(rng.choice(["A", "B", "C", None])),
        )
        for i in range(n)
    ]
    rows = [(k, d, s, None if a == "None" else a) for k, d, s, a in rows]
    return spark.createDataFrame(
        rows, "k int, d string, seq int, attr string"
    ).withColumn("d", F.to_date("d"))


def test_scd2_invariants_random(spark):
    df = _random_stream(spark)
    hist = scd2_history(df, ["k"], ["attr"], ts_col="d", tiebreak="seq").cache()
    # every input row lands in exactly one run
    assert hist.agg(F.sum("n_updates")).first()[0] == df.count()
    # exactly one open (valid_to IS NULL) version per key
    open_per_key = (
        hist.filter(F.col("valid_to").isNull()).groupBy("k").count().collect()
    )
    assert all(r["count"] == 1 for r in open_per_key)
    assert len(open_per_key) == df.select("k").distinct().count()
    # versions are contiguous 1..n per key
    bad = (
        hist.groupBy("k")
        .agg(F.count("*").alias("n"), F.max("version").alias("mx"), F.min("version").alias("mn"))
        .filter((F.col("mx") != F.col("n")) | (F.col("mn") != 1))
        .count()
    )
    assert bad == 0
    # no zero-length intervals: valid_to (when set) >= valid_from
    assert hist.filter(F.col("valid_to") < F.col("valid_from")).count() == 0


def test_merge_invariants_random(spark):
    from automated_etl_pipeline_spark.operators.merge import merge_upsert

    snap = _random_stream(spark, seed=3).dropDuplicates(["k"])
    upd = _random_stream(spark, seed=4).dropDuplicates(["k"]).filter("k % 2 = 0")
    merged = merge_upsert(snap, upd, ["k"]).cache()
    # key set = union of key sets; one row per key
    assert merged.count() == merged.select("k").distinct().count()
    expect_keys = {
        r.k for r in snap.select("k").union(upd.select("k")).distinct().collect()
    }
    assert {r.k for r in merged.select("k").collect()} == expect_keys
    # idempotent: re-applying the same batch changes nothing
    again = merge_upsert(merged, upd, ["k"])
    assert again.exceptAll(merged).count() == 0 and merged.exceptAll(again).count() == 0


# ---------------------------------------------------------------------------
# Chunked SCD-2 (SCALE_SMOKE_r06 residual-risk mitigation, r6 ask #6):
# scd2_history_chunked must be EXACTLY scd2_history, while never running
# a single-partition window over one key's full history.
# ---------------------------------------------------------------------------


def _hist_rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.collect()
    )


def test_scd2_chunked_equals_plain_on_mixed_keys(spark):
    from automated_etl_pipeline_spark.operators.scd import scd2_history_chunked

    up = _updates(spark)
    plain = scd2_history(up, ["k"], ["attr"], ts_col="d", tiebreak="seq")
    chunked = scd2_history_chunked(
        up, ["k"], ["attr"], ts_col="d", tiebreak="seq", num_chunks=4
    )
    assert _hist_rows(plain) == _hist_rows(chunked)


def test_scd2_chunked_hot_key_spans_partitions(spark):
    """A synthetic >>-hot key (100k updates, runs of varying length,
    including runs that STRADDLE chunk boundaries) plus two normal
    keys: the chunked output must equal the plain operator's, and the
    hot key's history must actually be split across many range
    partitions (the whole point of the mitigation)."""
    from automated_etl_pipeline_spark.operators.scd import scd2_history_chunked

    n = 100_000
    hot = spark.range(n).select(
        F.lit(1).alias("k"),
        F.col("id").alias("seq"),
        F.date_add(F.lit("2020-01-01").cast("date"), (F.col("id") / 16).cast("int")).alias("d"),
        # run-length pattern: value changes every 1000 rows, with a few
        # single-row runs sprinkled in (change every row near multiples
        # of 10007) — guarantees both long straddling runs and short ones
        F.when(
            F.col("id") % 10007 < 3, F.concat(F.lit("x"), F.col("id"))
        )
        .otherwise(F.concat(F.lit("v"), (F.col("id") / 1000).cast("long")))
        .cast("string")
        .alias("attr"),
    )
    cold = spark.createDataFrame(
        [(2, 0, "2020-01-01", "A"), (2, 1, "2020-02-01", "B"), (3, 0, "2021-01-01", None)],
        "k int, seq long, d string, attr string",
    ).select("k", "seq", F.to_date("d").alias("d"), "attr")
    up = hot.select("k", "seq", "d", "attr").unionByName(cold)

    n_chunks = 16
    spread = (
        up.repartitionByRange(n_chunks, "k", "d", "seq")
        .select(F.spark_partition_id().alias("pid"))
        .where(F.lit(True))
        .distinct()
        .count()
    )
    assert spread >= 8, f"hot key only landed in {spread} partitions"

    plain = scd2_history(up, ["k"], ["attr"], ts_col="d", tiebreak="seq")
    chunked = scd2_history_chunked(
        up, ["k"], ["attr"], ts_col="d", tiebreak="seq", num_chunks=n_chunks
    )
    assert _hist_rows(plain) == _hist_rows(chunked)


def test_scd2_chunked_null_key_spans_chunks(spark):
    """ADVICE r7: a NULL key whose history crosses chunk edges. The
    offset joins use null-safe key equality — with plain equality the
    NULL key never received its stitch offset (coalesced to 0), so runs
    from different chunks collided into one wrongly-merged history.
    Many rows for the NULL key across 8 chunks + straddling runs force
    the stitch path; a non-null key rides along as a control."""
    from automated_etl_pipeline_spark.operators.scd import scd2_history_chunked

    n = 4_000
    nullk = spark.range(n).select(
        F.lit(None).cast("int").alias("k"),
        F.col("id").alias("seq"),
        F.date_add(F.lit("2020-01-01").cast("date"), (F.col("id") / 8).cast("int")).alias("d"),
        F.concat(F.lit("v"), (F.col("id") / 97).cast("long")).alias("attr"),
    )
    ctrl = spark.createDataFrame(
        [(5, 0, "2020-01-01", "A"), (5, 1, "2020-03-01", "B")],
        "k int, seq long, d string, attr string",
    ).select("k", "seq", F.to_date("d").alias("d"), "attr")
    up = nullk.unionByName(ctrl)
    plain = scd2_history(up, ["k"], ["attr"], ts_col="d", tiebreak="seq")
    chunked = scd2_history_chunked(
        up, ["k"], ["attr"], ts_col="d", tiebreak="seq", num_chunks=8
    )
    assert _hist_rows(plain) == _hist_rows(chunked)


def test_scd2_chunked_single_chunk_degenerates_to_plain(spark):
    from automated_etl_pipeline_spark.operators.scd import scd2_history_chunked

    up = _updates(spark)
    plain = scd2_history(up, ["k"], ["attr"], ts_col="d", tiebreak="seq")
    chunked = scd2_history_chunked(
        up, ["k"], ["attr"], ts_col="d", tiebreak="seq", num_chunks=1
    )
    assert _hist_rows(plain) == _hist_rows(chunked)
