#!/usr/bin/env python
"""Portfolio minimality sweep (round-2 VERDICT directive #5).

>= 20 hard-ish completion instances; for each, the exhaustive host DFS
(reference CompleteStableStep recursion, minimise) and the beam portfolio
WITH the seeded BigZOI re-minimise pass (complete_stable_portfolio
reminimise=True).  Reports the population-gap distribution and wall
clocks.  Acceptance: portfolio pop <= DFS pop + 1 on every instance
(asserted), with the fraction of exact matches reported.

Instances: eater / block / composite seeds with k cells hidden and a
2-ring unknown area — solvable by DFS in bounded time yet non-trivial
(several hundred branch decisions).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lifeapi_tpu.core import board, rle  # noqa: E402
from lifeapi_tpu.stable import complete as C  # noqa: E402
from lifeapi_tpu.stable import host as H  # noqa: E402

SEEDS = [
    "2b2o$bobo$bo$2o!",        # eater
    "2o$2o!",                  # block
    "b2o$o2bo$b2o!",           # beehive
    "b2o$o2bo$bobo$2bo!",      # loaf
    "2o$obo$bo!",              # boat
]


def make_instances(n=20, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    out = []
    for i in range(n):
        s = SEEDS[i % len(SEEDS)]
        base = board.move(rle.parse(s), 20 + int(rng.integers(0, 8)),
                          20 + int(rng.integers(0, 8)))
        cells = [tuple(map(int, c)) for c in np.argwhere(
            np.asarray(board.to_dense(base)))]
        k = 2 + i % 3
        hide_idx = rng.choice(len(cells), size=min(k, len(cells)),
                              replace=False)
        hide = board.from_cells([cells[j] for j in hide_idx])
        unknown = (board.zoi(board.zoi(base)) & ~base) | hide
        out.append((base & ~hide, unknown))
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    instances = make_instances(n)

    gaps, exact, dfs_total, port_total = [], 0, 0.0, 0.0
    for i, (state, unknown) in enumerate(instances):
        hst = H.HostStable(
            np.asarray(board.to_dense(state)).copy(),
            np.asarray(board.to_dense(unknown)).copy(),
            np.zeros((64, 64), np.uint8),
        )
        t0 = time.perf_counter()
        r, best = C.complete_stable(hst, timeout=120.0, minimise=True)
        dfs_s = time.perf_counter() - t0
        assert r == C.CompletionResult.COMPLETED, (i, r)
        dfs_pop = int(best.sum())

        t0 = time.perf_counter()
        res = C.complete_stable_portfolio(
            state, unknown, jax.random.key(1000 + i), replicas=256,
            frontier=4, iters=96, minimise=True, reminimise=True,
        )
        port_s = time.perf_counter() - t0
        assert res.found, i
        gap = res.best_pop - dfs_pop
        assert gap <= 1, (i, res.best_pop, dfs_pop)
        gaps.append(gap)
        exact += gap <= 0
        dfs_total += dfs_s
        port_total += port_s

    print(json.dumps({
        "metric": "portfolio_minimality_sweep",
        "value": exact / len(gaps),
        "unit": "fraction pop == DFS-minimal (or better)",
        "instances": len(gaps),
        "max_gap": max(gaps),
        "mean_gap": sum(gaps) / len(gaps),
        "dfs_total_seconds": round(dfs_total, 3),
        "portfolio_total_seconds": round(port_total, 3),
        "note": "portfolio = 256 replicas + seeded BigZOI re-minimise "
                "pass; gap asserted <= +1 on every instance",
    }), flush=True)


if __name__ == "__main__":
    main()
