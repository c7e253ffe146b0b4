"""TPC-H Q2/Q11/Q20 pytest oracle gates (VERDICT r6 ask #4).

The driver testdata carries no partsupp table, so these partsupp-bound
shapes can't be registry queries.  Here a deterministic seeded
generator (tpch_partsupp.write_partsupp_parquet) builds partsupp over
the REAL sf0.01 part/supplier keys into a tmp parquet; Spark and the
DuckDB oracle read the same file; results compare on row count +
sorted column names + normalized values — the driver's t2 semantics
(tools/check_correctness.normalize).
"""

from __future__ import annotations

import duckdb
import pytest

from automated_etl_pipeline_spark.tpch_partsupp import (
    QUERIES,
    SUPP_PER_PART,
    generate_partsupp,
    write_partsupp_parquet,
)
from tools.check_correctness import TABLES, normalize

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def partsupp_path(tmp_path_factory) -> str:
    p = tmp_path_factory.mktemp("tpch") / "partsupp.parquet"
    return write_partsupp_parquet(SF_DIR, str(p))


@pytest.fixture(scope="module")
def oracle(partsupp_path):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    con.execute(
        f"CREATE VIEW partsupp AS SELECT * FROM '{partsupp_path}'"
    )
    yield con
    con.close()


def test_generator_is_deterministic_and_tpch_shaped():
    rows = generate_partsupp(list(range(200)), 100, seed=42)
    assert rows == generate_partsupp(list(range(200)), 100, seed=42)
    assert len(rows) == 200 * SUPP_PER_PART
    by_part = {}
    for p, s, aq, sc in rows:
        by_part.setdefault(p, set()).add(s)
        assert 1 <= aq <= 9999
        # quarter-dollar grid: binary-exact doubles (see module doc)
        assert 1.0 <= sc <= 1000.0 and sc * 4 == int(sc * 4)
    # dbgen guarantee: every part has SUPP_PER_PART DISTINCT suppliers
    assert all(len(s) == SUPP_PER_PART for s in by_part.values())


@pytest.mark.parametrize("n_sup,n_part", [(10, 200), (100, 20_000), (1000, 20_000)])
def test_spread_collision_free_over_full_key_ranges(n_sup, n_part):
    """ADVICE r7: the original dbgen step (S//4 + p//S) collides at the
    testdata's fixed small S — e.g. S=100, p ∈ [7500, 7600) mapped all
    four i to ONE supplier — and the 200-key shape test above never saw
    it.  Sweep the FULL part-key range of every (suppliers, parts)
    combination the fixtures use: 4 distinct suppliers for every part."""
    rows = generate_partsupp(list(range(n_part)), n_sup, seed=7)
    assert len(rows) == n_part * SUPP_PER_PART
    by_part: dict[int, set[int]] = {}
    for p, s, _, _ in rows:
        by_part.setdefault(p, set()).add(s)
    assert all(len(s) == SUPP_PER_PART for s in by_part.values())


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_matches_duckdb_oracle(name, spark, partsupp_path, oracle):
    fn, sql = QUERIES[name]
    sdf = fn(spark, SF_DIR, partsupp_path)
    spark_cols = sorted(sdf.columns)
    srows = [tuple(r[c] for c in spark_cols) for r in sdf.collect()]

    rel = oracle.sql(sql)
    duck_cols_orig = list(rel.columns)
    order = sorted(range(len(duck_cols_orig)), key=lambda i: duck_cols_orig[i])
    drows = [tuple(r[i] for i in order) for r in rel.fetchall()]

    assert spark_cols == sorted(duck_cols_orig)
    assert len(srows) == len(drows) and len(srows) > 0, (
        f"{name}: spark={len(srows)} oracle={len(drows)} (empty gates "
        "pass trivially — predicates must select rows at sf0.01)"
    )
    assert normalize(srows) == normalize(drows)


def test_collision_region_7500_7600_pinned():
    """VERDICT r8 ask #8: exercise the documented collision region
    explicitly.  At S=100, dbgen's own step S//4 + p//S is ≡ 0 (mod S)
    for every p ∈ [7500, 7600) (step = 25 + 75 = 100), so the naive
    spread maps all four i to ONE supplier there; the bounded step
    (tpch_partsupp.py:12) must keep all four distinct."""
    S = 100
    for p in range(7500, 7600):
        naive_step = S // 4 + p // S
        naive = {(p + i * naive_step) % S for i in range(SUPP_PER_PART)}
        assert len(naive) == 1  # the documented dbgen collapse is real
    rows = generate_partsupp(list(range(7500, 7600)), S, seed=7)
    by_part: dict[int, set[int]] = {}
    for p, s, _, _ in rows:
        by_part.setdefault(p, set()).add(s)
    assert set(by_part) == set(range(7500, 7600))
    assert all(len(s) == SUPP_PER_PART for s in by_part.values())
