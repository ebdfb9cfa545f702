#!/usr/bin/env python
"""Round-5 beam-kernel lane-tile A/B: the calibration kernel measured a
strongly tile-dependent issue ceiling (5.9e12 lane-ops/s at tile 128 vs
3.1e12 at tile 512 — benches/calibrate_r5.py), so re-sweep the fused
beam's lane_tile at the standard bench config.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benches/beam_tile_r5.py [tiles...]
"""

import functools
import json
import sys
import time

import numpy as np

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import jax.numpy as jnp

from lifeapi_tpu.core import board, rle
from lifeapi_tpu.stable import bitplane as BP
from lifeapi_tpu.stable import complete as C


from _bench_util import median_slope as _median_slope  # noqa: E402


def main():
    tiles = [int(t) for t in sys.argv[1:]] or [128, 256, 512]
    B, F, iters = 8192, 4, 24
    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(20, 20), (21, 20)])
    unknown = (board.zoi(eater) & ~eater) | hide
    bst = BP.make(
        state=jnp.broadcast_to(eater & ~hide, (B, 64, 2)),
        unknown=jnp.broadcast_to(unknown, (B, 64, 2)),
    )
    seed0 = jnp.zeros((B, 64, 2), jnp.uint32)
    bound0 = jnp.zeros((B,), jnp.int32)

    for tile in tiles:
        kw = dict(F=F, iters=iters, minimise=True, b_pad=B,
                  lane_tile=tile, interpret=False, use_seed=False,
                  needs_pack=False, simple_phase=False, use_bound=False)

        @functools.partial(jax.jit, static_argnames=("m",))
        def run_m(bst, m, kw=tuple(sorted(kw.items()))):
            kwd = dict(kw)

            def body(i, acc):
                sti = BP.BitStable(
                    jnp.roll(bst.state, i, axis=-2),
                    jnp.roll(bst.unknown, i, axis=-2),
                    bst.ruled,
                )
                buf = C._fused_beam_run(sti, seed0, bound0, **kwd)
                return acc + jnp.sum(buf[:, 128:131], dtype=jnp.uint32)

            return jax.lax.fori_loop(0, m, body, jnp.uint32(0))

        def timed(m):
            t0 = time.perf_counter()
            out = run_m(bst, m)
            np.asarray(out)
            return time.perf_counter() - t0

        med, spr = _median_slope(timed, 1, 9)
        if med is None:
            print(json.dumps({"metric": f"beam_tile{tile}",
                              "error": "unstable"}), flush=True)
            continue
        print(json.dumps({
            "metric": f"beam_solves_per_sec_tile{tile}",
            "value": B / med, "unit": "solves/s (kernel-marginal)",
            "spread": round(spr, 3)}), flush=True)


if __name__ == "__main__":
    main()
