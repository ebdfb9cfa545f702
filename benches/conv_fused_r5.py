#!/usr/bin/env python
"""Round-5 measurement: fused Pallas sparse-convolve kernel vs the XLA
extraction loop (VERDICT r04 directive #1).

Prints one JSON line per metric.  M-differencing per bench.py discipline
(ONE dispatch, on-device fori_loop, host-readback fence, median slope).
Run: PYTHONPATH=/root/.axon_site:/root/repo python benches/conv_fused_r5.py [tiles...]
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

from lifeapi_tpu.core import board
from lifeapi_tpu.core import convolve as CV
from lifeapi_tpu.ops import conv_sparse_pallas as CSP


from _bench_util import median_slope as _median_slope  # noqa: E402


def make_inputs(B, cells=7, seed=0):
    rng = np.random.default_rng(seed)
    da = rng.random((B, 64, 64)) < 0.1
    db = np.zeros((B, 64, 64), bool)
    for i in range(B):
        db[i, rng.integers(20, 28, cells), rng.integers(20, 28, cells)] = True
    return (board.from_dense(jnp.asarray(da)),
            board.from_dense(jnp.asarray(db)))


def main():
    # args: TILE or TILE:UNROLL
    combos = []
    for arg in sys.argv[1:]:
        if ":" in arg:
            t, u = arg.split(":")
            combos.append((int(t), int(u)))
        else:
            combos.append((int(arg), 2))
    combos = combos or [(512, 2)]
    B = 4096
    a, b = make_inputs(B)

    # -- bit-exactness of the REAL (non-interpret) kernel vs the XLA loop
    small_a, small_b = make_inputs(256, seed=1)
    ref = np.asarray(CV.convolve_sparse_device(small_a, small_b))
    got = np.asarray(CSP.convolve_sparse_fused(small_a, small_b))
    exact = bool((ref == got).all())
    print(json.dumps({"metric": "conv_fused_bit_exact", "value": exact,
                      "boards": 256}), flush=True)
    if not exact:
        return

    for tile, unroll in combos:
        @functools.partial(jax.jit, static_argnames=("m",))
        def run_m(a, b, m, tile=tile, unroll=unroll):
            def body(i, acc):
                ai = jnp.roll(a, i, axis=-2)
                res = CSP.convolve_sparse_fused(ai, b, batch_tile=tile,
                                                unroll=unroll)
                return acc + jnp.sum(res, dtype=jnp.uint32)

            return jax.lax.fori_loop(0, m, body, jnp.uint32(0))

        def timed(m):
            t0 = time.perf_counter()
            out = run_m(a, b, m)
            np.asarray(out)
            return time.perf_counter() - t0

        med, spr = _median_slope(timed, 1, 4097)
        if med is None:
            print(json.dumps({"metric": f"conv_fused_tile{tile}_u{unroll}",
                              "error": "unstable"}), flush=True)
            continue
        rate = B / med
        print(json.dumps({
            "metric": f"conv_fused_per_sec_tile{tile}_u{unroll}",
            "value": rate,
            "unit": "conv/s", "vs_baseline": rate / 1.0e7,
            "spread": round(spr, 3)}), flush=True)

    # -- the XLA extraction loop, same discipline, for the head-to-head
    @functools.partial(jax.jit, static_argnames=("m",))
    def run_xla(a, b, m):
        def body(i, acc):
            ai = jnp.roll(a, i, axis=-2)
            res = CV.convolve_sparse_device(ai, b)
            return acc + jnp.sum(res, dtype=jnp.uint32)

        return jax.lax.fori_loop(0, m, body, jnp.uint32(0))

    def timed_xla(m):
        t0 = time.perf_counter()
        out = run_xla(a, b, m)
        np.asarray(out)
        return time.perf_counter() - t0

    med, spr = _median_slope(timed_xla, 1, 1025)
    if med is not None:
        rate = B / med
        print(json.dumps({
            "metric": "conv_xla_loop_per_sec", "value": rate,
            "unit": "conv/s", "vs_baseline": rate / 1.0e7,
            "spread": round(spr, 3)}), flush=True)


if __name__ == "__main__":
    main()
