"""Receding-horizon MPC driver: solve, apply the first control slice on
the exact dynamics, re-solve from the new state.

The per-solve machinery is mpc/solver.py; this is the outer control loop a
production deployment runs (north star: "MPC / trajectory-optimization
engine" — the rollout/solve blocks are in-graph, the receding loop is the
host-side policy)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import step as S
from ..target import hamming_cost
from . import solver as solver_mod


class MPCRun(NamedTuple):
    boards: jax.Array  # packed uint32[steps+1, 64, 2] visited states
    applied: jax.Array  # packed uint32[steps, 64, 2] applied toggles
    costs: jax.Array  # float[steps] hard cost of each solve


def run(problem, key, steps, apply_horizon=1, n_candidates=16,
        solve_iters=80, warm_start=True):
    """Drive the system ``steps`` generations, re-solving every
    ``apply_horizon`` applied control slices.  Returns the visited
    trajectory, applied controls and per-solve costs."""
    boards = [problem.initial]
    applied = []
    costs = []
    cur = problem
    logits = None
    t = 0
    while t < steps:
        key, sub = jax.random.split(key)
        if logits is None or not warm_start:
            logits = solver_mod.init_logits(sub, cur, n_candidates)
        lg, _ = solver_mod.solve_gradient(logits, cur, iters=solve_iters)
        sol = solver_mod.rescore_and_select(lg, cur)
        costs.append(float(sol.cost))

        n_apply = min(apply_horizon, cur.horizon, steps - t)
        board = boards[-1]
        for i in range(n_apply):
            toggle = sol.controls[i]
            board = S.step(board ^ toggle)
            applied.append(toggle)
            boards.append(board)
        t += n_apply

        remaining = cur.horizon  # keep a constant lookahead window
        cur = cur._replace(initial=board)
        if warm_start:
            # shift the candidate controls by the applied steps; pad with
            # fresh noise at the tail
            key, sub = jax.random.split(key)
            tail = solver_mod.init_logits(sub, cur, lg.shape[0])[:, :n_apply]
            logits = jnp.concatenate([lg[:, n_apply:], tail], axis=1)

    return MPCRun(
        jnp.stack(boards), jnp.stack(applied) if applied else
        jnp.zeros((0, 64, 2), jnp.uint32), jnp.asarray(costs)
    )


def final_error(run_result: MPCRun, target):
    return hamming_cost(run_result.boards[-1], target)
