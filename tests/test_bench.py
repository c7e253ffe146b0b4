"""bench.py harness contract (VERDICT r3 ask #2): one broken query must
never zero out the round's perf signal — the JSON line always comes out,
failures land under "errors", and the survivors are timed."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_bench_survives_failing_query(monkeypatch, capsys):
    import bench
    import __spark_entry__ as entry_mod

    def fake_queries():
        def ok(spark, sf_dir):
            return spark.range(5)

        def boom(spark, sf_dir):
            raise RuntimeError("synthetic query failure")

        def ok2(spark, sf_dir):
            return spark.range(3)

        return {"q_ok": ok, "q_boom": boom, "q_ok2": ok2}

    monkeypatch.setattr(entry_mod, "queries", fake_queries)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_COLD", "1")  # skip warm pass

    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)

    assert set(out["queries"]) == {"q_ok", "q_ok2"}
    assert all(isinstance(v, float) for v in out["queries"].values())
    assert "synthetic query failure" in out["errors"]["q_boom"]
    assert out["mode"] == "cold"
    assert out["value"] > 0
