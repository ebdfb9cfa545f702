#!/usr/bin/env python
"""Parameter sweep of the whole-search beam kernel on the chip: frontier
width F, lane tile, fixpoint cap.  One process, one warmup; prints one
JSON line per config."""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import statistics

import numpy as np
import jax
import jax.numpy as jnp

SIMPLE = "--simple" in sys.argv  # library default: off


def bench_beam(B, F, iters, tile):
    from lifeapi_tpu.core import board, rle
    from lifeapi_tpu.stable import complete as C
    from lifeapi_tpu.stable import propagate as P
    from lifeapi_tpu.ops import stable_pallas as SP

    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(20, 20), (21, 20)])
    unknown = (board.zoi(eater) & ~eater) | hide
    st = P.make(
        state=jnp.broadcast_to(board.to_dense(eater & ~hide), (B, 64, 64)),
        unknown=jnp.broadcast_to(board.to_dense(unknown), (B, 64, 64)),
    )
    from lifeapi_tpu.stable import bitplane as BP

    bst0 = BP.from_dense_stable(st)
    planes = SP._to_kernel_planes(bst0)
    L = B * F
    planes0 = tuple(jnp.repeat(p, F, axis=1) for p in planes)
    lane = jnp.arange(L)
    act = lane % F == 0
    active_row = jnp.broadcast_to(
        jnp.where(act, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))[None, :], (8, L)
    )

    import functools

    @functools.partial(jax.jit, static_argnames=("m",))
    def run_m(planes0, active_row, m):
        def body(i, acc):
            rolled = tuple(jnp.roll(p, i, axis=0) for p in planes0)
            out = SP.beam_search_planes(
                rolled, active_row, F=F, iters=iters, minimise=True,
                batch_tile=tile, simple_phase=SIMPLE,
            )
            return acc + jnp.sum(out[2][:, ::F], dtype=jnp.uint32)

        return jax.lax.fori_loop(0, m, body, jnp.uint32(0))

    out = SP.beam_search_planes(planes0, active_row, F=F, iters=iters,
                                minimise=True, batch_tile=tile,
                                simple_phase=SIMPLE)
    found = np.asarray(out[3])[0, ::F]

    # kernel-marginal via on-device fori_loop M-differencing (round-4
    # discipline: single-call timings fold in the ~26 ms dispatch floor
    # and compress config differences)
    def timed(m):
        t0 = time.perf_counter()
        np.asarray(run_m(planes0, active_row, m))
        return time.perf_counter() - t0

    timed(1); timed(5)
    slopes = []
    for _ in range(5):
        slopes.append((timed(5) - timed(1)) / 4)
    dt = statistics.median(slopes)
    if dt <= 0:
        print(json.dumps({"config": f"B={B} F={F} iters={iters} "
                          f"tile={tile} simple={SIMPLE}",
                          "error": "non-positive slope"}), flush=True)
        return 0.0
    print(json.dumps({
        "config": f"B={B} F={F} iters={iters} tile={tile} simple={SIMPLE}",
        "solves_per_sec": B / dt,
        "found": float((found != 0).mean()),
        "vs_baseline": B / dt / 3333.0,
        "note": "kernel-marginal (M-differenced)",
    }), flush=True)
    return B / dt


if __name__ == "__main__":
    configs = [
        (2048, 4, 24, 128),
        (2048, 4, 24, 256),
        (8192, 4, 24, 256),
        (2048, 8, 16, 128),
    ]
    for cfg in configs:
        try:
            bench_beam(*cfg)
        except Exception as exc:  # e.g. scoped-VMEM overflow at wide F/tile
            import json
            print(json.dumps({"config": str(cfg),
                              "error": str(exc)[:200]}), flush=True)
