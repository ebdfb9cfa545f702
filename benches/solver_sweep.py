#!/usr/bin/env python
"""Solver-path sweeps on the chip: propagate-fixpoint lane tiles and
end-to-end beam batch sizes.  One JSON line per config."""

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


def _median_time(fn, reps=5):
    fn()  # warm/compile
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return statistics.median(out)


def bench_fixpoint(B, tile, M=512):
    from lifeapi_tpu.core import board, rle
    from lifeapi_tpu.ops import stable_pallas as SP
    from lifeapi_tpu.stable import bitplane as BP

    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    unknown = board.zoi(board.zoi(eater)) & ~eater
    st = BP.make(
        state=jnp.broadcast_to(eater, (B, 64, 2)),
        unknown=jnp.broadcast_to(unknown, (B, 64, 2)),
    )

    import functools

    @functools.partial(jax.jit, static_argnames=("m",))
    def run(st, m):
        def body(i, acc):
            sti = BP.BitStable(
                jnp.roll(st.state, i, axis=-2),
                jnp.roll(st.unknown, i, axis=-2),
                st.ruled,
            )
            res = SP.propagate_fused_inkernel(sti, batch_tile=tile,
                                              simple_phase=SIMPLE)
            return acc + jnp.sum(res.stable.ruled[0])

        return jax.lax.fori_loop(0, m, body, jnp.uint32(0))

    # kernel-marginal via M-differencing (round-4 discipline: the single
    # dispatch's ~26 ms floor was previously folded into the rate)
    dt1 = _median_time(lambda: np.asarray(run(st, 1)))
    dtm = _median_time(lambda: np.asarray(run(st, M + 1)))
    dt = (dtm - dt1) / M
    if dt <= 0:
        print(json.dumps({"config": f"fixpoint B={B} tile={tile} "
                          f"simple={SIMPLE}", "error": "non-positive "
                          "M-difference"}), flush=True)
        return
    print(json.dumps({
        "config": f"fixpoint B={B} tile={tile} simple={SIMPLE}",
        "fixpoints_per_sec": B / dt,
        "vs_baseline": B / dt / 6.7e5,
        "note": "kernel-marginal (M-differenced)",
    }), flush=True)


def bench_beam_e2e(B, F=4, iters=24, tile=256):
    from lifeapi_tpu.core import board, rle
    from lifeapi_tpu.stable import bitplane as BP
    from lifeapi_tpu.stable import complete as C

    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(20, 20), (21, 20)])
    unknown = (board.zoi(eater) & ~eater) | hide
    bst = BP.make(
        state=jnp.broadcast_to(eater & ~hide, (B, 64, 2)),
        unknown=jnp.broadcast_to(unknown, (B, 64, 2)),
    )

    res = {}

    def run():
        res["r"] = C.complete_stable_beam(
            bst, frontier=F, iters=iters, minimise=True, dense=False,
            batch_tile=tile, simple_phase=SIMPLE,
        )

    dt = _median_time(run)
    print(json.dumps({
        "config": f"beam_e2e B={B} F={F} tile={tile} simple={SIMPLE}",
        "solves_per_sec": B / dt,
        "found": float(res["r"].found.mean()),
        "vs_baseline": B / dt / 3333.0,
    }), flush=True)


if __name__ == "__main__":
    import sys
    if "fix2" in sys.argv:
        for cfg in ((4096, 128), (4096, 256), (8192, 256), (16384, 256),
                    (16384, 128)):
            # tile 512 exceeds the 16 MB scoped-VMEM limit (17.85 MB
            # stack, measured round 4) and is omitted
            try:
                bench_fixpoint(*cfg)
            except Exception as exc:
                print(json.dumps({"config": str(cfg),
                                  "error": str(exc)[:200]}), flush=True)
    else:
        for tile in (128, 256):
            bench_fixpoint(1024, tile)
        bench_fixpoint(4096, 256)
        for B in (4096, 8192):
            bench_beam_e2e(B)
