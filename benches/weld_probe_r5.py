#!/usr/bin/env python
"""Round-5 probe for the weld escalation composition (VERDICT r04
directive #4): on the catxeater workload, how do tier-2 beam depth and
tier-3 DFS budget trade off?

Reports, as JSON lines:
  * tier-1 (F=4, 24 iters): proved / found / undetermined counts + time
  * tier-2 (F=8) at several iters: proved / found / residue + time
  * host DFS determination counts on the final residue at staged budgets
    (5 ms and 50 ms), with per-stage wall-clock

Run: PYTHONPATH=/root/.axon_site:/root/repo python benches/weld_probe_r5.py [tier2_iters...]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import jax.numpy as jnp  # noqa: E402

from lifeapi_tpu import weld as W  # noqa: E402
from lifeapi_tpu.core import board, rle  # noqa: E402
from lifeapi_tpu.stable import complete as C  # noqa: E402
from lifeapi_tpu.stable import host as HO  # noqa: E402

CATALYST = (
    "2o$o2bob2o$b3obobo$5bobo$b5ob3o$bo4bo3bo$4bobo2b2o$4b2o!",
    "4o$5o2bo$4o$5o4bo$b5ob5o$b12o$b12o$b12o$4b9o$4b4o!",
)


def _weld(pair, dx, dy):
    state = board.move(rle.parse(pair[0]), 20 + dx, 20 + dy)
    required = board.move(rle.parse(pair[1]), 19 + dx, 19 + dy)
    return W.from_required(state, required)


def main():
    tier2_iters = [int(x) for x in sys.argv[1:]] or [768, 1536, 3072]

    a = _weld(CATALYST, 0, 0)
    b = _weld(CATALYST, 0, 0)
    window = np.zeros((64, 64), bool)
    for dx in range(-20, 23):
        for dy in range(-20, 23):
            window[dx % 64, dy % 64] = True
    good0 = board.from_dense(jnp.asarray(~window))

    known_bad = W.interaction_offsets(a, b)
    to_test = ~board.to_dense(known_bad) & jnp.asarray(window)
    offsets = [tuple(map(int, xy)) for xy in np.argwhere(np.asarray(to_test))]
    print(json.dumps({"probe": "offsets", "n": len(offsets)}), flush=True)

    build = W._build_placements

    # ---- tier 1
    batch_size, F1, it1 = 4096, 4, 24
    t0 = time.perf_counter()
    undetermined = []
    for lo in range(0, len(offsets), batch_size):
        chunk = offsets[lo:lo + batch_size]
        padded = chunk + [chunk[0]] * (batch_size - len(chunk))
        sts = build(a, b, jnp.asarray(padded, jnp.int32))
        res = C.complete_stable_beam(
            sts, frontier=F1, iters=it1, minimise=False,
            return_boards=False)
        proved = np.asarray(res.proved_inconsistent)
        found = np.asarray(res.found)
        for i, xy in enumerate(chunk):
            if not proved[i] and not found[i]:
                undetermined.append(xy)
    t1 = time.perf_counter() - t0
    n1p = len(offsets) - len(undetermined)
    print(json.dumps({"probe": "tier1", "iters": it1,
                      "determined": n1p, "residue": len(undetermined),
                      "seconds": round(t1, 3)}), flush=True)

    # ---- tier 2 variants (each from the same tier-1 residue)
    residues = {}
    for it2 in tier2_iters:
        cap = max(1, (batch_size * F1) // 8)
        t0 = time.perf_counter()
        residue = []
        nprove = nfound = 0
        for lo in range(0, len(undetermined), cap):
            chunk = undetermined[lo:lo + cap]
            padded = chunk + [chunk[0]] * (cap - len(chunk))
            sts = build(a, b, jnp.asarray(padded, jnp.int32))
            res = C.complete_stable_beam(
                sts, frontier=8, iters=it2, minimise=False,
                return_boards=False, batch_tile=128)
            proved = np.asarray(res.proved_inconsistent)
            found = np.asarray(res.found)
            for i, xy in enumerate(chunk):
                if proved[i]:
                    nprove += 1
                elif found[i]:
                    nfound += 1
                else:
                    residue.append(xy)
        t2 = time.perf_counter() - t0
        residues[it2] = residue
        print(json.dumps({"probe": "tier2", "iters": it2,
                          "proved": nprove, "completed": nfound,
                          "residue": len(residue),
                          "seconds": round(t2, 3)}), flush=True)

    # ---- tier 3 staged DFS on the deepest tier-2's residue
    residue = residues[tier2_iters[-1]]
    if residue:
        sts = build(a, b, jnp.asarray(residue, jnp.int32))
        states = np.asarray(sts.state)
        unknowns = np.asarray(sts.unknown)
        ruleds = np.asarray(sts.ruled)
        for budget in (0.005, 0.05):
            t0 = time.perf_counter()
            det = inc = 0
            for i in range(len(residue)):
                host_st = HO.HostStable(
                    states[i].copy(), unknowns[i].copy(), ruleds[i].copy())
                r, _ = C.complete_stable(host_st, timeout=budget,
                                         minimise=False)
                if r != C.CompletionResult.TIMEOUT:
                    det += 1
                if r == C.CompletionResult.INCONSISTENT:
                    inc += 1
            t3 = time.perf_counter() - t0
            print(json.dumps({"probe": "tier3", "budget": budget,
                              "instances": len(residue),
                              "determined": det, "inconsistent": inc,
                              "seconds": round(t3, 3)}), flush=True)


if __name__ == "__main__":
    main()
