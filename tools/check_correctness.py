"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, sorted
column names, and order-insensitive values. Use while iterating so
mismatches surface before the round gate does.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(rows: list[tuple], ndigits: int = 9) -> list[tuple]:
    """Sort-key-safe normalization: floats rounded, everything stringified."""
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    # v + 0.0 folds -0.0 into +0.0 (IEEE): both sides
                    # normalize to the same string
                    vals.append(f"{round(v + 0.0, ndigits):.9f}")
            elif v is None:
                vals.append("\x00NULL")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from automated_etl_pipeline_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    import gc

    for name, fn in qs.items():
        if only and name not in only:
            continue
        gc.collect()  # release prior queries' checkpoint blocks (see bench.py)
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sorted(sdf.columns)
            spark_rows = [tuple(r[c] for c in spark_cols) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(spark_rows)} (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetch_arrow_table()
            oracle_cols = sorted(odf.column_names)
            # Arrow to_pylist preserves SQL NULL (None) vs float NaN —
            # pandas would fold NULL floats into NaN, which forced the old
            # NaN->None remap and silently passed Spark-NULL vs oracle-NaN
            # divergences.  normalize() now treats NaN identically on both
            # sides, so NaN==NaN passes and NULL-vs-NaN fails loudly.
            oracle_rows = [
                tuple(d[c] for c in oracle_cols) for d in odf.to_pylist()
            ]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {type(e).__name__}: {e}")
            continue
        problems = []
        if spark_cols != oracle_cols:
            problems.append(f"cols spark={spark_cols} oracle={oracle_cols}")
        if len(spark_rows) != len(oracle_rows):
            problems.append(f"rowcount spark={len(spark_rows)} oracle={len(oracle_rows)}")
        if not problems:
            a, b = normalize(spark_rows), normalize(oracle_rows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: rows={len(spark_rows)} [{time.time()-t0:.1f}s]")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
