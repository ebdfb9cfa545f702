#!/usr/bin/env python
"""Secondary benchmarks beyond the headline steps/s (bench.py):

* stable propagation fixpoints/s (reference: 6.7e5 on one Xeon core,
  BASELINE.md)
* CompleteStable solves/s via the batched beam (reference: ~0.3-1 ms/solve
  on CPU DFS)
* MPC horizon-32 solves/s (north-star target: >= 1000/s on v5e-16,
  i.e. ~62.5/s per chip)

Prints one JSON line per metric.  Timing uses chained calls + host
readback (block_until_ready is unreliable through tunneled backends).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed_diff(fn, state, reps):
    """K-difference timing: (time(reps+1 chained) - time(1)) / reps."""
    s = fn(state)
    np.asarray(jax.tree_util.tree_leaves(s)[0])  # warm

    def chain(k):
        t0 = time.perf_counter()
        cur = state
        for _ in range(k):
            cur = fn(cur)
        np.asarray(jax.tree_util.tree_leaves(cur)[0])
        return time.perf_counter() - t0

    base = chain(1)
    total = chain(reps + 1)
    return max((total - base) / reps, 1e-9)


def bench_propagate(B=1024):
    from lifeapi_tpu.core import board, rle
    from lifeapi_tpu.stable import propagate as P

    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    unknown = board.zoi(board.zoi(eater)) & ~eater
    st = P.make(
        state=jnp.broadcast_to(board.to_dense(eater), (B, 64, 64)),
        unknown=jnp.broadcast_to(board.to_dense(unknown), (B, 64, 64)),
    )

    def fn(s):
        res = P.propagate(s)
        # feed the (converged) output back in; fixpoint re-verification is
        # the workload unit
        return res.stable

    dt = timed_diff(fn, st, reps=10)
    fixpoints_per_sec = B / dt
    print(json.dumps({
        "metric": "stable_propagate_fixpoints_per_sec",
        "value": fixpoints_per_sec,
        "unit": "fixpoints/s",
        "vs_baseline": fixpoints_per_sec / 6.7e5,
    }))


def bench_beam_complete(B=256):
    from lifeapi_tpu.core import board, rle
    from lifeapi_tpu.stable import complete as C
    from lifeapi_tpu.stable import propagate as P

    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(20, 20), (21, 20)])
    unknown = (board.zoi(eater) & ~eater) | hide
    st = P.make(
        state=jnp.broadcast_to(board.to_dense(eater & ~hide), (B, 64, 64)),
        unknown=jnp.broadcast_to(board.to_dense(unknown), (B, 64, 64)),
    )

    t0 = time.perf_counter()
    res = C.complete_stable_beam(st, frontier=4, iters=24, minimise=True)
    np.asarray(res.best_pop)
    dt = time.perf_counter() - t0
    solves_per_sec = B / dt
    # reference DFS: ~0.3 ms/solve => 3333 solves/s on one core
    print(json.dumps({
        "metric": "complete_stable_solves_per_sec",
        "value": solves_per_sec,
        "unit": "solves/s",
        "vs_baseline": solves_per_sec / 3333.0,
        "found_fraction": float(np.asarray(res.found).mean()),
    }))


def bench_mpc(n_candidates=64, horizon=32, iters=100):
    from lifeapi_tpu.core import board, rle
    from lifeapi_tpu.mpc import CostWeights, MPCProblem, solver
    from lifeapi_tpu.target import LifeTarget

    target = LifeTarget.from_state(board.move(rle.parse("2o$2o!"), 31, 31))
    mask = jnp.zeros((64, 64), bool).at[20:44, 20:44].set(True)
    problem = MPCProblem(
        initial=board.empty(), target=target, horizon=horizon,
        control_mask=mask, weights=CostWeights(),
    )
    logits0 = solver.init_logits(jax.random.key(0), problem, n_candidates)

    def fn(lg):
        out, _ = solver.solve_gradient(lg, problem, iters=iters)
        return out

    dt = timed_diff(fn, logits0, reps=3)
    # one "solve" = one full candidate optimization (the north-star unit)
    solves_per_sec = n_candidates / dt
    print(json.dumps({
        "metric": "mpc_horizon32_solves_per_sec_per_chip",
        "value": solves_per_sec,
        "unit": "solves/s",
        "vs_baseline": solves_per_sec / 62.5,  # 1000/s on 16 chips
    }))


if __name__ == "__main__":
    bench_propagate()
    bench_beam_complete()
    bench_mpc()
