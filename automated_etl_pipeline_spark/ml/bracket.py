"""Exact tournament win probabilities as shared-text SQL (M5 as a hash
gate, VERDICT r13 ask #1) + the M4 polynomial-probability machinery it
builds on.

The derandomization (finishing what M4 started in r13): with match
outcome probabilities expressed as ratios of pure POLYNOMIAL sums in
the two expected-goal rates (exp(-lh-lv) cancels in the truncated,
normalized probabilities — no transcendental anywhere), the whole
8-team tournament is exactly computable:

- group stage: 6 matches per 4-team group, 3^6 = 729 outcome vectors,
  each with probability = a fixed-association product of six
  polynomial ratios; standings are pure integer arithmetic over the
  outcome vector (3/1/0 points, ties broken by input slot order —
  mirroring ml/simulate.round_robin_table's stable sort);
- knockout: semifinal 1 = group-1 first vs second, semifinal 2 =
  group-2 first vs second, winners meet in the final with the group-1
  side at home (mirroring ml/simulate.knockout_bracket's pairing of
  qualified = [g1_1st, g1_2nd, g2_1st, g2_2nd]); draw mass
  redistributes proportionally, so the knockout win probability is
  S_HOME / (S_HOME + S_AWAY) — another polynomial ratio.

Cross-engine determinism is the r9 integer-space rule extended once
more: every DOUBLE is produced by a fully-parenthesized shared-text
expression both engines parse identically (bit-identical IEEE), and
the ONLY aggregations are over BIGINTs — each outcome vector's
probability is floored onto a 1e-15 grid BEFORE the per-(first,second)
class masses are summed, so no float sum's association order can leak
into the hash.  The quantization error is <= 729 ulps of 1e-15 per
class — invisible at the e6 output grid, and in any case IDENTICAL in
both engines (the gate's semantics ARE the quantized pipeline).

Reference semantics: ml_project.py:245-350 (unseeded Monte-Carlo over
the same group→knockout structure); our seeded MC operator surface
stays in ml/simulate.py, property-tested against
``exact_champion_probs`` below (tests/test_pipeline_ml.py).
"""

from __future__ import annotations

from itertools import combinations, product

# ---------------------------------------------------------------------
# Shared-text polynomial fragments (moved verbatim from queries_ml.py
# r13 so the bracket gate can reuse them without a circular import;
# queries_ml re-imports these, and tests pin the m4 oracle text).
# ---------------------------------------------------------------------

M4_MAX_GOALS = 6
_FACT = [1.0, 1.0, 2.0, 6.0, 24.0, 120.0, 720.0]


def m4_dbl(lit: str) -> str:
    """A numeric literal FORCED to DOUBLE: both Spark and DuckDB parse
    bare decimal-point literals as DECIMAL and then apply their own
    (different!) decimal division scale rules — the m4 gate's first
    cut diverged by one ulp exactly that way.  CAST(x AS DOUBLE) pins
    both engines to IEEE double arithmetic."""
    return f"CAST({lit} AS DOUBLE)"


_FACT_LIT = [m4_dbl(f"{f:.1f}") for f in _FACT]


def m4_pow(col: str, k: int) -> str:
    """lam^k as an explicit left-associated product — identical parse
    in Spark SQL and DuckDB (pow() is libm-backed and banned here)."""
    if k == 0:
        return m4_dbl("1.0")
    out = col
    for _ in range(k - 1):
        out = f"({out} * {col})"
    return out


def m4_sum(cells: list[tuple[int, int]]) -> str:
    """Fully-parenthesized left-associated sum of Poisson-kernel terms
    lh^i/i! * lv^j/j! over the given (i, j) cells."""
    terms = [
        f"(({m4_pow('lh', i)} / {_FACT_LIT[i]})"
        f" * ({m4_pow('lv', j)} / {_FACT_LIT[j]}))"
        for i, j in cells
    ]
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


_CELLS = [(i, j) for i in range(M4_MAX_GOALS + 1) for j in range(M4_MAX_GOALS + 1)]
S_HOME = m4_sum([(i, j) for i, j in _CELLS if i > j])
S_DRAW = m4_sum([(i, j) for i, j in _CELLS if i == j])
S_AWAY = m4_sum([(i, j) for i, j in _CELLS if i < j])
TOT = f"(({S_HOME} + {S_DRAW}) + {S_AWAY})"
E6 = m4_dbl("1000000.0")
M4_PROB_EXPRS = {
    "p_home_e6": f"CAST(floor(({S_HOME} / {TOT}) * {E6}) AS BIGINT)",
    "p_draw_e6": f"CAST(floor(({S_DRAW} / {TOT}) * {E6}) AS BIGINT)",
    "p_away_e6": f"CAST(floor(({S_AWAY} / {TOT}) * {E6}) AS BIGINT)",
}
LAMBDA_H = f"{m4_dbl('0.5')} + ({m4_dbl('2.0')} * s_a) / (s_a + s_b)"
LAMBDA_V = f"{m4_dbl('0.5')} + ({m4_dbl('2.0')} * s_b) / (s_a + s_b)"

# ---------------------------------------------------------------------
# The bracket gate SQL
# ---------------------------------------------------------------------

E15 = m4_dbl("1000000000000000.0")

# group-local match list in ml/simulate.round_robin_table's
# combinations() order: slots are 1-based within the group
_MATCHES = list(combinations([1, 2, 3, 4], 2))  # (1,2)(1,3)(1,4)(2,3)(2,4)(3,4)
_ONAMES = {m: f"o{m[0]}{m[1]}" for m in _MATCHES}
_MNAMES = {m: f"m{m[0]}{m[1]}" for m in _MATCHES}


def _points_expr(slot: int) -> str:
    """Group points for the team at local ``slot``: 3 a win, 1 a draw,
    summed over its three matches (home in matches where it is the
    lower slot — combinations order — away otherwise)."""
    parts = []
    for m in _MATCHES:
        o = f"v.{_ONAMES[m]}"
        if m[0] == slot:  # home
            parts.append(f"(CASE {o} WHEN 0 THEN 3 WHEN 1 THEN 1 ELSE 0 END)")
        elif m[1] == slot:  # away
            parts.append(f"(CASE {o} WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END)")
    out = parts[0]
    for p in parts[1:]:
        out = f"({out} + {p})"
    return out


def _chain(op: str, terms: list[str]) -> str:
    """Fixed left association — the shared-text float-determinism rule."""
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} {op} {t})"
    return out


def bracket_exact_sql() -> str:
    """The complete exact-bracket query, one text for BOTH engines.

    Pipeline: top-8 strengths → seeds 1..8 (groups = seeds 1-4 / 5-8,
    matching m5's teams[:4]/teams[4:]) → per-ordered-pair truncated
    normalized match probabilities (polynomial ratios) → 729 outcome
    vectors per group with e15-quantized masses → per-(first,second)
    BIGINT class masses via a slot-stable ranking → pivoted one-row
    frame → semifinal/final propagation as fixed-association scalar
    arithmetic → (team, seed, p_champ_e6)."""
    # per-vector probability: product of the six CASE-selected factors
    factor = {
        m: (
            f"(CASE v.{_ONAMES[m]} WHEN 0 THEN {_MNAMES[m]}.ph "
            f"WHEN 1 THEN {_MNAMES[m]}.pd ELSE {_MNAMES[m]}.pa END)"
        )
        for m in _MATCHES
    }
    prob = _chain("*", [factor[m] for m in _MATCHES])
    pts = {s: _points_expr(s) for s in (1, 2, 3, 4)}

    mp_joins = "\n  ".join(
        f"JOIN mp {_MNAMES[m]} ON {_MNAMES[m]}.sa = ((v.g - 1) * 4) + {m[0]} "
        f"AND {_MNAMES[m]}.sb = ((v.g - 1) * 4) + {m[1]}"
        for m in _MATCHES
    )

    # pivot columns: class masses q{g}_{first}_{second} (local slots)
    q_cols = ",\n    ".join(
        f"MAX(CASE WHEN g = {g} AND fs = {i} AND ss = {j} "
        f"THEN q_mass ELSE 0 END) AS q{g}_{i}_{j}"
        for g in (1, 2)
        for i in range(1, 5)
        for j in range(1, 5)
        if i != j
    )
    # knockout probabilities: within-group ordered pairs (semis) and
    # group1-home cross pairs (the final)
    k_pairs = [
        ((g - 1) * 4 + i, (g - 1) * 4 + j)
        for g in (1, 2)
        for i in range(1, 5)
        for j in range(1, 5)
        if i != j
    ] + [(i, j) for i in range(1, 5) for j in range(5, 9)]
    k_cols = ",\n    ".join(
        f"MAX(CASE WHEN sa = {a} AND sb = {b} THEN pk END) AS k_{a}_{b}"
        for a, b in k_pairs
    )

    def q_d(g: int, i: int, j: int) -> str:
        return f"(CAST(q{g}_{i}_{j} AS DOUBLE) / {E15})"

    # semifinal-win probability per global seed
    sw_cols = []
    for seed in range(1, 9):
        g = 1 if seed <= 4 else 2
        base = (g - 1) * 4
        local = seed - base
        terms = []
        for other in range(1, 5):
            if other == local:
                continue
            a, b = base + local, base + other
            # as FIRST (home in the semi): advance w.p. k(a, b)
            terms.append(f"({q_d(g, local, other)} * k_{a}_{b})")
            # as SECOND (away in the semi): advance w.p. 1 - k(b, a)
            terms.append(
                f"({q_d(g, other, local)} * ({m4_dbl('1.0')} - k_{b}_{a}))"
            )
        sw_cols.append(f"{_chain('+', terms)} AS sw{seed}")
    sw_select = ",\n    ".join(sw_cols)

    # champion probability per seed: own semi-win times the
    # opponent-weighted final-win sum (group-1 side is home)
    ch_cols = []
    for seed in range(1, 9):
        if seed <= 4:
            finals = [f"(sw{y} * k_{seed}_{y})" for y in range(5, 9)]
        else:
            finals = [
                f"(sw{x} * ({m4_dbl('1.0')} - k_{x}_{seed}))"
                for x in range(1, 5)
            ]
        ch_cols.append(f"(sw{seed} * {_chain('+', finals)}) AS c{seed}")
    ch_select = ",\n    ".join(ch_cols)

    champ_case = (
        "CASE s.seed "
        + " ".join(f"WHEN {k} THEN ch.c{k}" for k in range(1, 9))
        + " END"
    )

    return f"""
WITH str8 AS (
  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
  ORDER BY cnt DESC, n_name LIMIT 8
), seeds AS (
  SELECT n_name AS team, cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, n_name) AS BIGINT) AS seed
  FROM str8
), lam AS (
  SELECT a.seed AS sa, b.seed AS sb,
         {LAMBDA_H} AS lh,
         {LAMBDA_V} AS lv
  FROM (SELECT seed, cnt AS s_a FROM seeds) a
  CROSS JOIN (SELECT seed, cnt AS s_b FROM seeds) b
  WHERE a.seed != b.seed
), poly AS (
  SELECT sa, sb,
         {S_HOME} AS sh,
         {S_DRAW} AS sd,
         {S_AWAY} AS sw
  FROM lam
), mp AS (
  SELECT sa, sb,
         (sh / ((sh + sd) + sw)) AS ph,
         (sd / ((sh + sd) + sw)) AS pd,
         (sw / ((sh + sd) + sw)) AS pa,
         (sh / (sh + sw)) AS pk
  FROM poly
), o3 AS (
  SELECT 0 AS o UNION ALL SELECT 1 UNION ALL SELECT 2
), vec AS (
  SELECT grp.g,
         a1.o AS o12, a2.o AS o13, a3.o AS o14,
         a4.o AS o23, a5.o AS o24, a6.o AS o34,
         (((((a1.o * 3 + a2.o) * 3 + a3.o) * 3 + a4.o) * 3 + a5.o) * 3
          + a6.o) AS vec_id
  FROM (SELECT 1 AS g UNION ALL SELECT 2) grp
  CROSS JOIN o3 a1 CROSS JOIN o3 a2 CROSS JOIN o3 a3
  CROSS JOIN o3 a4 CROSS JOIN o3 a5 CROSS JOIN o3 a6
), vq AS (
  SELECT v.g, v.vec_id,
         CAST(floor({prob} * {E15}) AS BIGINT) AS mass,
         {pts[1]} AS pts1,
         {pts[2]} AS pts2,
         {pts[3]} AS pts3,
         {pts[4]} AS pts4
  FROM vec v
  {mp_joins}
), up AS (
  SELECT g, vec_id, mass, 1 AS slot, pts1 AS pts FROM vq
  UNION ALL SELECT g, vec_id, mass, 2 AS slot, pts2 AS pts FROM vq
  UNION ALL SELECT g, vec_id, mass, 3 AS slot, pts3 AS pts FROM vq
  UNION ALL SELECT g, vec_id, mass, 4 AS slot, pts4 AS pts FROM vq
), rk AS (
  SELECT g, vec_id, mass, slot,
         ROW_NUMBER() OVER (
           PARTITION BY g, vec_id ORDER BY pts DESC, slot ASC
         ) AS rnk
  FROM up
), q AS (
  SELECT g, vec_id, MAX(mass) AS mass,
         MAX(CASE WHEN rnk = 1 THEN slot END) AS fs,
         MAX(CASE WHEN rnk = 2 THEN slot END) AS ss
  FROM rk GROUP BY g, vec_id
), qa AS (
  SELECT g, fs, ss, CAST(SUM(mass) AS BIGINT) AS q_mass
  FROM q GROUP BY g, fs, ss
), qp AS (
  SELECT
    {q_cols}
  FROM qa
), kp AS (
  SELECT
    {k_cols}
  FROM mp
), sw AS (
  SELECT
    {sw_select},
    kp.*
  FROM qp CROSS JOIN kp
), ch AS (
  SELECT
    {ch_select}
  FROM sw
)
SELECT s.team, s.seed,
       CAST(floor(({champ_case}) * {E6}) AS BIGINT) AS p_champ_e6
FROM seeds s CROSS JOIN ch
ORDER BY s.seed
"""


# ---------------------------------------------------------------------
# Python exact mirror — the property-test anchor for the seeded MC
# simulator (and an independent implementation the SQL gate is checked
# against in tests/test_pipeline_ml.py).
# ---------------------------------------------------------------------


def _truncated_probs(
    lh: float, lv: float, max_goals: int
) -> tuple[float, float, float]:
    """Normalized truncated (home, draw, away) — the same conditioning
    simulate_match applies when it divides by p.sum()."""
    import math

    ph = [math.exp(-lh) * lh**k / math.factorial(k) for k in range(max_goals + 1)]
    pa = [math.exp(-lv) * lv**k / math.factorial(k) for k in range(max_goals + 1)]
    h = sum(ph[i] * pa[j] for i in range(max_goals + 1) for j in range(i))
    d = sum(ph[i] * pa[i] for i in range(max_goals + 1))
    a = sum(ph[i] * pa[j] for i in range(max_goals + 1) for j in range(i + 1, max_goals + 1))
    t = h + d + a
    return h / t, d / t, a / t


def exact_champion_probs(
    groups: list[list[str]],
    expected: dict[tuple[str, str], float],
    max_goals: int = M4_MAX_GOALS,
) -> dict[str, float]:
    """Exact P(champion) per team under ml/simulate.py's tournament
    semantics with outcomes truncated at ``max_goals`` and normalized:
    enumerate each group's 3^6 outcome vectors, rank by (points desc,
    input order), propagate the knockout bracket exactly.  Two groups
    of four only (the gate's frame; the MC simulator stays general)."""
    if len(groups) != 2 or any(len(g) != 4 for g in groups):
        raise ValueError("exact_champion_probs covers the 2x4 bracket frame")

    def pk(a: str, b: str) -> float:
        h, _, aw = _truncated_probs(
            expected[(a, b)], expected[(b, a)], max_goals
        )
        return h / (h + aw)

    # per-group (first, second) distribution
    qdist: list[dict[tuple[str, str], float]] = []
    for g in groups:
        matches = list(combinations(g, 2))
        mp = {
            m: _truncated_probs(
                expected[(m[0], m[1])], expected[(m[1], m[0])], max_goals
            )
            for m in matches
        }
        dist: dict[tuple[str, str], float] = {}
        for vec in product((0, 1, 2), repeat=len(matches)):
            p = 1.0
            pts = {t: 0 for t in g}
            for m, o in zip(matches, vec):
                p *= mp[m][o]
                if o == 0:
                    pts[m[0]] += 3
                elif o == 2:
                    pts[m[1]] += 3
                else:
                    pts[m[0]] += 1
                    pts[m[1]] += 1
            table = sorted(g, key=lambda t: -pts[t])  # stable on input order
            key = (table[0], table[1])
            dist[key] = dist.get(key, 0.0) + p
        qdist.append(dist)

    # semifinal-win probability per team (semi = group first vs second)
    semi_win: dict[str, float] = {t: 0.0 for g in groups for t in g}
    for gi, dist in enumerate(qdist):
        for (first, second), qm in dist.items():
            k = pk(first, second)
            semi_win[first] += qm * k
            semi_win[second] += qm * (1.0 - k)

    champ: dict[str, float] = {}
    for x in groups[0]:
        champ[x] = semi_win[x] * sum(
            semi_win[y] * pk(x, y) for y in groups[1]
        )
    for y in groups[1]:
        champ[y] = semi_win[y] * sum(
            semi_win[x] * (1.0 - pk(x, y)) for x in groups[0]
        )
    return champ
