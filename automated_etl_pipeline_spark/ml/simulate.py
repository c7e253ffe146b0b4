"""Poisson outcome matrices + seeded Monte-Carlo tournament simulation
(SURVEY.md §2.9 M4-M5; ml_project.py:218-350).

Deliberately driver-side numpy: the reference simulates 32 teams — a
matrix per pairing is 11×11 doubles and the bracket is trivially small.
The distributed part of the workflow is upstream (training-frame
construction + GLM fit + pairing scoring, all DataFrames); simulation
consumes a collected {(team, opponent): expected_goals} dict. Seeded
RNG makes every simulation reproducible (the reference's
np.random.choice at ml_project.py:245-266 is unseeded).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache
from itertools import combinations

import numpy as np


@dataclass(frozen=True)
class MatchProbs:
    home_win: float
    draw: float
    away_win: float


@lru_cache(maxsize=8192)
def outcome_probs(
    exp_home: float, exp_away: float, max_goals: int = 10
) -> MatchProbs:
    """M4 — win/draw/loss from the outer product of two Poisson pmfs
    (ml_project.py:218-239: tril/diag/triu sums).  Memoized (r14): a
    tournament revisits the same ~k^2 pairings every simulation, and
    the matrix build dominated n_sims scaling; the cache is bounded
    and the result is a frozen dataclass."""
    goals = np.arange(max_goals + 1)
    facts = np.array([math.factorial(int(g)) for g in goals], dtype=float)
    ph = np.exp(-exp_home) * exp_home**goals / facts
    pa = np.exp(-exp_away) * exp_away**goals / facts
    m = np.outer(ph, pa)
    return MatchProbs(
        home_win=float(np.tril(m, -1).sum()),
        draw=float(np.diag(m).sum()),
        away_win=float(np.triu(m, 1).sum()),
    )


def simulate_match(
    probs: MatchProbs, rng: np.random.Generator, allow_draw: bool = True
) -> str:
    """One draw from {home, draw, away}; knockout games redistribute the
    draw mass proportionally (elimination can't end drawn,
    ml_project.py:251)."""
    if allow_draw:
        p = np.array([probs.home_win, probs.draw, probs.away_win])
        return rng.choice(["home", "draw", "away"], p=p / p.sum())
    p = np.array([probs.home_win, probs.away_win])
    return rng.choice(["home", "away"], p=p / p.sum())


def round_robin_table(
    teams: list[str],
    expected: dict[tuple[str, str], float],
    rng: np.random.Generator,
) -> list[tuple[str, int]]:
    """M5 group stage — every pair plays once (combinations(group, 2),
    ml_project.py:297-312): 3 points a win, 1 a draw; returns the
    standings sorted by points (stable on input team order)."""
    points = {t: 0 for t in teams}
    for a, b in combinations(teams, 2):
        probs = outcome_probs(expected[(a, b)], expected[(b, a)])
        result = simulate_match(probs, rng)
        if result == "home":
            points[a] += 3
        elif result == "away":
            points[b] += 3
        else:
            points[a] += 1
            points[b] += 1
    return sorted(points.items(), key=lambda kv: -kv[1])


def knockout_bracket(
    teams: list[str],
    expected: dict[tuple[str, str], float],
    rng: np.random.Generator,
) -> str:
    """M5 knockout — pairwise elimination until one team remains
    (ml_project.py:346-350)."""
    field = list(teams)
    if len(field) & (len(field) - 1):
        raise ValueError("knockout field must be a power of two")
    while len(field) > 1:
        nxt = []
        for i in range(0, len(field), 2):
            a, b = field[i], field[i + 1]
            probs = outcome_probs(expected[(a, b)], expected[(b, a)])
            nxt.append(a if simulate_match(probs, rng, allow_draw=False) == "home" else b)
        field = nxt
    return field[0]


def tournament_win_probability(
    groups: list[list[str]],
    expected: dict[tuple[str, str], float],
    n_sims: int = 1000,
    seed: int = 42,
) -> dict[str, float]:
    """Full tournament: group stages → top-2 advance → knockout; returns
    P(win) per team over n_sims seeded simulations."""
    rng = np.random.default_rng(seed)
    wins: dict[str, int] = {}
    for _ in range(n_sims):
        qualified: list[str] = []
        for g in groups:
            table = round_robin_table(g, expected, rng)
            qualified += [table[0][0], table[1][0]]
        champ = knockout_bracket(qualified, expected, rng)
        wins[champ] = wins.get(champ, 0) + 1
    return {t: w / n_sims for t, w in sorted(wins.items(), key=lambda kv: -kv[1])}
