"""Star-schema builder tests (SURVEY.md §2.2 P3, §2.5 W1, §2.3 J1-J2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_etl_pipeline_spark.operators.star import DimSpec, build_dim, build_star, join_star


def _wide(spark):
    return spark.createDataFrame(
        [
            ("2014-06-15", "Germany", 4),
            ("2014-06-15", "France", 3),
            ("2014-07-13", "Germany", 1),
        ],
        "d string, team string, score int",
    )


def test_build_dim_dedups_and_is_deterministic(spark):
    df = _wide(spark)
    spec = DimSpec("date_dim", ["d"], "date_id")
    dim1 = build_dim(df, spec).collect()
    dim2 = build_dim(df.repartition(7), spec).collect()  # partitioning-independent
    assert sorted((r.date_id, r.d) for r in dim1) == [(1, "2014-06-15"), (2, "2014-07-13")]
    assert sorted(map(tuple, dim1)) == sorted(map(tuple, dim2))


def test_build_star_fact_fks_resolve(spark):
    df = _wide(spark)
    star = build_star(
        df,
        dims=[DimSpec("date_dim", ["d"], "date_id"), DimSpec("team_dim", ["team"], "team_id")],
        fact_measures=["score"],
    )
    fact = star["fact"]
    assert set(fact.columns) == {"date_id", "team_id", "score"}
    assert fact.count() == 3
    # round-trip: joining dims back reconstructs the original rows
    joined = join_star(
        fact,
        {"date_dim": (star["date_dim"], "date_id"), "team_dim": (star["team_dim"], "team_id")},
    )
    orig = {(r.d, r.team, r.score) for r in df.collect()}
    back = {(r.d, r.team, r.score) for r in joined.collect()}
    assert orig == back


def test_fact_join_uses_broadcast(spark):
    df = _wide(spark)
    star = build_star(df, [DimSpec("date_dim", ["d"], "date_id")], ["score"])
    joined = join_star(star["fact"], {"date_dim": (star["date_dim"], "date_id")})
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_build_star_keeps_null_natural_keys(spark):
    df = spark.createDataFrame(
        [("2014-06-15", "Germany", 4), (None, "France", 3)],
        "d string, team string, score int",
    )
    star = build_star(df, [DimSpec("date_dim", ["d"], "date_id")], ["score"])
    # the NULL-date row must resolve to the NULL dim row, not be dropped
    assert star["fact"].count() == 2
    assert star["date_dim"].count() == 2
    joined = join_star(star["fact"], {"date_dim": (star["date_dim"], "date_id")})
    assert {(r.d, r.score) for r in joined.collect()} == {
        ("2014-06-15", 4),
        (None, 3),
    }


def test_build_star_hash_mode_has_no_window(spark):
    df = _wide(spark)
    star = build_star(
        df,
        [DimSpec("date_dim", ["d"], "date_id"), DimSpec("team_dim", ["team"], "team_id")],
        ["score"],
        key_mode="hash",
    )
    plan = star["fact"]._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # fully distributed: no global-sort rank


def test_hash_key_mode_stable_and_unique(spark):
    from automated_etl_pipeline_spark.operators.star import (
        DimSpec,
        build_dim,
        validate_unique_keys,
    )

    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("a", 3)], "city string, x int"
    )
    spec = DimSpec(name="city_dim", natural_cols=["city"], key_col="city_id")
    d1 = build_dim(df, spec, key_mode="hash")
    d2 = build_dim(df.repartition(7), spec, key_mode="hash")
    assert {(r.city, r.city_id) for r in d1.collect()} == {
        (r.city, r.city_id) for r in d2.collect()
    }  # stable under repartitioning
    validate_unique_keys(d1, "city_id")  # no collision on 2 keys
