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


def test_stream_reader_drains_bounded_source(spark, tmp_path):
    """readStream over the authored source: micro-batches of batch_size
    until n_rows, then an empty batch with an unchanged offset ends the
    drain; the union of batches is exactly the deterministic row set."""
    register(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", 350)
        .option("batch_size", 100)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pysrc_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM pysrc_stream").collect())
    assert got == [_row(i) for i in range(350)]


def test_manifest_writer_two_phase_commit(spark, tmp_path):
    """Authored sink: every task's part file is listed in the
    driver-committed _MANIFEST.json, totals match, and manifest-trusting
    readers see exactly the written rows."""
    import json
    import os

    register(spark)
    out = str(tmp_path / "sink")
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 1000)
        .option("n_parts", 4)
        .load()
    )
    df.write.format("manifest_jsonl").option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["total_rows"] == 1000
    assert sum(f["n_rows"] for f in manifest["files"]) == 1000
    n = 0
    ids = set()
    for f in manifest["files"]:
        assert os.path.exists(f["path"])
        with open(f["path"]) as fh:
            for line in fh:
                ids.add(json.loads(line)["id"])
                n += 1
    assert n == 1000 and ids == set(range(1000))


def test_manifest_writer_empty_commit_publishes_manifest(tmp_path):
    """ADVICE r4: a zero-partition input never calls write(), so commit
    must create the directory itself and publish an empty manifest."""
    import json
    import os

    from automated_etl_pipeline_spark.io.pysource import _ManifestWriter

    out = str(tmp_path / "never_created")
    w = _ManifestWriter({"path": out})
    w.commit([])  # no write() ever ran
    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest == {"files": [], "total_rows": 0}


def test_manifest_writer_abort_removes_reported_parts(tmp_path):
    from automated_etl_pipeline_spark.io.pysource import _ManifestWriter, _PartFile

    w = _ManifestWriter({"path": str(tmp_path / "s")})
    import os

    os.makedirs(str(tmp_path / "s"), exist_ok=True)
    p = str(tmp_path / "s" / "part-x.jsonl")
    open(p, "w").write("{}\n")
    w.abort([_PartFile(p, 1), None])  # None = failed task with no message
    assert not os.path.exists(p)


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
