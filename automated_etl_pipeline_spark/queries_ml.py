"""ML-layer queries (SURVEY.md §2.9 M2-M5) over the shared testdata.

No DuckDB oracle — GLM fitting and Monte-Carlo simulation are not
SQL-expressible, so the driver records the weaker rows+schema check
(per the __spark_entry__ contract); value-level guarantees live in
tests/test_pipeline_ml.py (prediction invariants, seeded-simulation
reproducibility, probability mass checks).

Scale posture: training-frame construction and scoring are DataFrames
end-to-end (distributed IRLS in GeneralizedLinearRegression); only the
final simulation consumes a collected dict — deliberately driver-side,
matching the reference's ~32-team bracket scale (SURVEY.md §2.9 M4-M5
— the matrices are 11x11; distributing them would be overhead, not
parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from automated_etl_pipeline_spark.queries import _t, query


@query("m2_poisson_expected")
def m2_poisson_expected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2-M3: weighted log-link Poisson GLM (ml/poisson.py) fit on
    lineitem — E[l_quantity | l_returnflag, l_linestatus] — then scored
    on the distinct category combinations (the reference's
    fit-then-predict-pairings shape, ml_project.py:211-221)."""
    from automated_etl_pipeline_spark.ml.poisson import fit_poisson_rates

    (li,) = _t(spark, sf_dir, "lineitem")
    # deterministic ~1% training sample: a 2-categorical-feature GLM is
    # saturated by a few thousand rows, and the fit (driver-coordinated
    # IRLS iterations) dominates this query's runtime.
    # localCheckpoint: the pipeline fit makes MANY passes (2 indexer
    # distinct scans + per-IRLS-iteration aggregates), each of which
    # would otherwise re-run the parquet scan + filter (measured 2.6x)
    train = (
        li.filter(F.col("l_orderkey") % 100 == 0)
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_quantity").cast("double").alias("qty"),
        )
        .localCheckpoint()
    )
    rates = fit_poisson_rates(
        train, categorical_cols=["l_returnflag", "l_linestatus"], label_col="qty"
    )
    combos = train.select("l_returnflag", "l_linestatus").distinct()
    # In-query invariants (VERDICT r8 ask #5): the driver's
    # rows+schema check on a no-oracle gate pins shape only, so the
    # gate itself now asserts the GLM's defining properties as
    # boolean columns — a broken fit flips them to false:
    #  - positive_rate: a log-link Poisson mean is always > 0;
    #  - mass_preserved: at the IRLS optimum the intercept score
    #    equation gives sum(mu_i) == sum(y_i) over the training rows
    #    (ml_project.py:236-251 is the reference's analogous
    #    simulation-invariant block); checked at 1e-4 relative.
    cells = train.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("qty").alias("__sy")
    )
    pred = rates.predict(combos, out_col="expected_qty").join(
        cells, ["l_returnflag", "l_linestatus"]
    )
    tot = Window.partitionBy()  # 6-row cell frame, bounded
    mass_pred = F.sum(F.col("expected_qty") * F.col("__n")).over(tot)
    mass_obs = F.sum("__sy").over(tot)
    return (
        pred.select(
            "l_returnflag",
            "l_linestatus",
            F.round("expected_qty", 4).alias("expected_qty"),
            (F.col("expected_qty") > 0).alias("positive_rate"),
            (
                F.abs(mass_pred - mass_obs) / mass_obs < 1e-4
            ).alias("mass_preserved"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query("m5_tournament_sim")
def m5_tournament_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4-M5: Poisson outcome matrices + seeded Monte-Carlo tournament
    (ml/simulate.py) over 8 'teams' = the most-populous nations, with
    expected goals derived from relative customer counts. The strength
    aggregation is distributed; the 8-team bracket simulation is
    driver-side by design (see module docstring)."""
    from automated_etl_pipeline_spark.ml.simulate import tournament_win_probability

    nation, customer = _t(spark, sf_dir, "nation", "customer")
    strengths = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), "n_name")
        .limit(8)
        .collect()
    )
    teams = [r.n_name for r in strengths]
    s = {r.n_name: r.n_customers for r in strengths}
    expected = {
        (a, b): 0.5 + 2.0 * s[a] / (s[a] + s[b])
        for a in teams
        for b in teams
        if a != b
    }
    groups = [teams[:4], teams[4:]]
    p_win = tournament_win_probability(groups, expected, n_sims=200, seed=42)
    # In-query invariants (VERDICT r8 ask #5), mirroring the
    # reference's simulation sanity block (ml_project.py:236-251):
    #  - wins: integer win counts (p * n_sims, exact by construction);
    #  - mass_ok: the win counts partition the simulations exactly;
    #  - rank_sane: the strongest seed beats the weakest seed;
    #  - seed_stable: a second seeded run reproduces bit-identically.
    p_win2 = tournament_win_probability(groups, expected, n_sims=200, seed=42)
    n_sims = 200
    wins = {t: int(round(p * n_sims)) for t, p in p_win.items()}
    mass_ok = sum(wins.values()) == n_sims
    strongest, weakest = teams[0], teams[-1]
    rank_sane = p_win.get(strongest, 0.0) >= p_win.get(weakest, 0.0)
    seed_stable = p_win == p_win2
    return spark.createDataFrame(
        [
            (t, float(p), wins[t], mass_ok, rank_sane, seed_stable)
            for t, p in sorted(p_win.items())
        ],
        "team string, p_win double, wins long, mass_ok boolean,"
        " rank_sane boolean, seed_stable boolean",
    )


# ----------------------------------------------------------------------
# Python UDF surface (functions/python_udfs.py) — Arrow-vectorized
# grouped-agg UDF with a pure-SQL oracle proving the boundary crossing
# is lossless.
# ----------------------------------------------------------------------


@query(
    "udaf_geometric_mean_price",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(SUM(((CAST(floor(o_totalprice * 100) AS BIGINT)
                      % 1000000000)
                     * (CAST(floor(o_totalprice * 100) AS BIGINT)
                        % 1000000000))
                    % 1000000000) AS BIGINT) AS sum_sq_mod
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def udaf_geometric_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The M1 grouped-aggregate (Arrow-batched) pandas-UDAF surface,
    gated on TWO transcendental-free exact integer moments computed
    inside Python per group: sum(floor(price*100)) and the quadratic
    checksum sum((floor(price*100))^2 mod 1e9).  A lossy Arrow
    boundary crossing (dropped/duplicated batch rows, wrong column
    binding, dtype truncation) moves one of them; nothing in the gate
    depends on a non-correctly-rounded libm function, closing the r9
    ADVICE flake where numpy log and the oracle engine's ln could
    disagree by an ulp exactly at a floor(ln(x)*1e4) boundary
    (~1e-6/run odds — now 0 by construction: mul/floor/mod are
    exact).  The geometric-mean UDAF itself (exp(mean(ln)) — the
    user-facing statistic this query serves) remains on the operator
    surface and is pinned same-engine in tests/test_pipeline_ml.py,
    where a tolerance is expressible."""
    from automated_etl_pipeline_spark.functions.python_udfs import (
        cents_sq_mod_sum,
        cents_sum,
    )

    (orders,) = _t(spark, sf_dir, "orders")
    # Spark can't mix built-in aggregates with a grouped pandas UDAF
    # in one agg; the count comes from a plain agg joined back (the
    # grouped frames are priority-cardinality, broadcast-sized).
    counts = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    moments = orders.groupBy("o_orderpriority").agg(
        cents_sum("o_totalprice").alias("sum_cents"),
        cents_sq_mod_sum("o_totalprice").alias("sum_sq_mod"),
    )
    return (
        counts.join(F.broadcast(moments), "o_orderpriority")
        .orderBy("o_orderpriority")
    )
