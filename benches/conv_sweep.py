#!/usr/bin/env python
"""Diagnostic sweep of the convolution paths on the chip.

All timings are ONE jitted dispatch whose fori_loop iterates on-device
(host-chained dispatches measure tunnel RTT, not compute), with a host
readback fence."""

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lifeapi_tpu.core import board, convolve as CV
from lifeapi_tpu.ops import conv_pallas as CP

B = 4096
M = 8


def _time_once(run, a, b, reps=3):
    import statistics

    np.asarray(run(a, b))  # warm/compile
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(a, b))
        out.append(time.perf_counter() - t0)
    return statistics.median(out)


def timed_loop(make_body, label, p=0.1, feedback=True):
    """Device time per conv via M-DIFFERENCING: dt(M=9) - dt(M=1) over 8
    iterations, removing dispatch/readback fixed costs.  ``feedback``
    chains the output into the next input; otherwise the roll harness."""
    def mk_run(M):
        @jax.jit
        def run(a, b):
            if feedback:
                def body(i, a):
                    return make_body(a, b)

                return jax.lax.fori_loop(0, M, body, a)

            def body(i, acc):
                return acc + jnp.sum(make_body(jnp.roll(a, i, axis=-2), b))

            return jax.lax.fori_loop(0, M, body, jnp.float32(0))

        return run

    rng = np.random.default_rng(0)
    dense = jnp.asarray((rng.random((B, 64, 64)) < p).astype(np.float32))
    db = jnp.asarray((rng.random((B, 64, 64)) < p).astype(np.float32))
    # M=129: ~40-170 ms of differential compute — small Ms drown in the
    # tunnel's bursty tens-of-ms dispatch jitter (round-3 finding)
    dt1 = _time_once(mk_run(1), dense, db)
    dt9 = _time_once(mk_run(129), dense, db)
    if dt9 <= dt1:
        print(json.dumps({"variant": label, "error":
                          "non-positive M-difference", "m1_ms": dt1 * 1e3,
                          "m9_ms": dt9 * 1e3}), flush=True)
        return
    dt = (dt9 - dt1) / 128
    print(json.dumps({"variant": label, "conv_per_sec": B / dt,
                      "per_iter_ms": dt * 1e3, "m1_ms": dt1 * 1e3,
                      "vs_baseline": B / dt / 1e7}), flush=True)


def timed_loop_packed(nb, label, p=0.02):
    """Packed-in/packed-out library path (conv_small_packed — what
    convolve() actually calls); roll harness on the small packed arrays."""
    def mk_run(M):
        @jax.jit
        def run(pa, pb):
            def body(i, acc):
                out = CP.conv_small_packed(
                    jnp.roll(pa, i, axis=-2), pb, nb=nb)
                return acc + jnp.sum(out, dtype=jnp.uint32)

            return jax.lax.fori_loop(0, M, body, jnp.uint32(0))

        return run

    rng = np.random.default_rng(0)
    pa = board.from_dense(jnp.asarray(rng.random((B, 64, 64)) < p))
    pb = board.from_dense(jnp.asarray(rng.random((B, 64, 64)) < p))
    dt1 = _time_once(mk_run(1), pa, pb)
    dt9 = _time_once(mk_run(129), pa, pb)
    if dt9 <= dt1:
        print(json.dumps({"variant": label, "error":
                          "non-positive M-difference", "m1_ms": dt1 * 1e3,
                          "m9_ms": dt9 * 1e3}), flush=True)
        return
    dt = (dt9 - dt1) / 128
    print(json.dumps({"variant": label, "conv_per_sec": B / dt,
                      "per_iter_ms": dt * 1e3, "m1_ms": dt1 * 1e3,
                      "vs_baseline": B / dt / 1e7}), flush=True)


def _mm_only_kernel(a_ref, b_ref, w_ref, v_ref, out_ref, *, nb):
    """Probe: the 4 wide matmuls + turns, NO mod reductions (wrong
    results — isolates the VPU mod cost)."""
    xa = a_ref[:].reshape(nb * 64, 64)
    xb = b_ref[:].reshape(nb * 64, 64)
    x = jnp.concatenate([xa, xb], axis=0)
    x2 = jnp.concatenate([x, x], axis=1)
    w = w_ref[:]
    v = v_ref[:]
    s1 = CP._mm(x2, w)
    s2 = CP._mm(CP._blockt2(s1, 2 * nb), w)
    fa, fb = s2[: nb * 64], s2[nb * 64:]
    prod = fa * fb
    i1 = CP._mm(prod, v)
    i2 = CP._mm(CP._blockt2(i1, nb), v)
    out_ref[:] = i2[:, :64].astype(jnp.int32).reshape(nb, 64, 64)


@functools.partial(jax.jit, static_argnames=("nb",))
def mm_only(da, db, nb=32):
    grid = (B // nb,)
    W, V, _, _ = CP._pair_matrices()
    spec = pl.BlockSpec((nb, 64, 64), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mm_only_kernel, nb=nb),
        out_shape=jax.ShapeDtypeStruct((B, 64, 64), jnp.int32),
        grid=grid,
        in_specs=[spec, spec, wspec, wspec],
        out_specs=spec,
    )(da.astype(jnp.bfloat16), db.astype(jnp.bfloat16),
      jnp.asarray(W, jnp.bfloat16), jnp.asarray(V, jnp.bfloat16))


def main():
    # roll harness only: a feedback-carried 67 MB fori loop is
    # pathologically slow through this stack (m1 = 2.4 s fixed)
    timed_loop(
        lambda a, b: (
            CP.conv_counts_fused(a, b, nb=64) > 0).astype(jnp.float32),
        "fused_paired nb=64 uint8-in", feedback=False,
    )
    for nb in (64, 128):
        timed_loop(
            lambda a, b, nb=nb: CP.conv_small_fused(
                a, b, nb=nb, out_or=True).astype(jnp.float32),
            f"small_single_prime nb={nb} uint8-in", p=0.02, feedback=False,
        )
    # nb=128 packed exceeds the 16 MB scoped-VMEM limit (measured round
    # 3) — the packed kernel holds unpack + byte-pack buffers on top of
    # the transform stacks; nb=64 is the packed-path maximum.
    timed_loop_packed(64, "small_packed nb=64 (library default path)")


if __name__ == "__main__":
    main()
