#!/usr/bin/env python
"""Diagnostic sweep of the convolution paths on the chip.

Separates: (1) the fused kernel alone on pre-unpacked dense inputs,
(2) a no-corner-turn probe kernel (WRONG results — isolates the block
transpose cost), (3) the end-to-end packed API, (4) the XLA NTT path.
Each timing is a K-call chain with a host readback fence."""

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


def timed_chain(fn, a, b, reps=8):
    out = fn(a, b)
    np.asarray(out)  # warm + fence
    t0 = time.perf_counter()
    x = a
    for _ in range(reps):
        x = fn(x, b)
    np.asarray(x)
    dt = time.perf_counter() - t0
    return dt / reps


def _noturn_kernel(a_ref, b_ref, *rest, nb):
    """Probe: same matmul/mod structure, corner turns REMOVED (results
    wrong; perf isolation only)."""
    w1_ref, v1_ref, w2_ref, v2_ref, out_ref = rest
    p1, p2 = CV._NTT_PRIMES
    xa = a_ref[:].reshape(nb * 64, 64)
    xb = b_ref[:].reshape(nb * 64, 64)

    def one_prime(w, v, p):
        s1 = CV._mod_p(CP._mm(jnp.concatenate([xa, xb], axis=0), w), p)
        s2 = CV._mod_p(CP._mm(s1, w), p)
        fa, fb = s2[: nb * 64], s2[nb * 64:]
        prod = CV._mod_p(fa * fb, p)
        i1 = CV._mod_p(CP._mm(prod, v), p)
        i2 = CV._mod_p(CP._mm(i1, v), p)
        return i2

    c1 = one_prime(w1_ref[:], v1_ref[:], p1)
    c2 = one_prime(w2_ref[:], v2_ref[:], p2)
    inv_p1 = pow(p1, p2 - 2, p2)
    t = CV._mod_p((c2 - c1) * inv_p1, p2)
    out_ref[:] = (c1 + p1 * t).astype(jnp.int32).reshape(nb, 64, 64)


@functools.partial(jax.jit, static_argnames=("nb",))
def noturn_fused(da, db, nb=64):
    grid = (B // nb,)
    (W1, V1), (W2, V2) = CV._ntt_matrices()
    spec = pl.BlockSpec((nb, 64, 64), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((64, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_noturn_kernel, nb=nb),
        out_shape=jax.ShapeDtypeStruct((B, 64, 64), jnp.int32),
        grid=grid,
        in_specs=[spec, spec, wspec, wspec, wspec, wspec],
        out_specs=spec,
    )(da.astype(jnp.bfloat16), db.astype(jnp.bfloat16),
      jnp.asarray(W1, jnp.bfloat16), jnp.asarray(V1, jnp.bfloat16),
      jnp.asarray(W2, jnp.bfloat16), jnp.asarray(V2, jnp.bfloat16))


def main():
    rng = np.random.default_rng(0)
    dense = jnp.asarray((rng.random((B, 64, 64)) < 0.1).astype(np.float32))
    db = jnp.asarray((rng.random((B, 64, 64)) < 0.1).astype(np.float32))

    for nb in (32, 64):
        fn = jax.jit(functools.partial(
            lambda a, b, nb: (CP.conv_counts_fused(a, b, nb=nb) > 0
                              ).astype(jnp.float32), nb=nb))
        dt = timed_chain(fn, dense, db)
        print(json.dumps({"variant": f"fused_kernel_dense_io nb={nb}",
                          "conv_per_sec": B / dt}), flush=True)

    fn = jax.jit(lambda a, b: (noturn_fused(a, b) > 0).astype(jnp.float32))
    dt = timed_chain(fn, dense, db)
    print(json.dumps({"variant": "noturn_probe nb=64",
                      "conv_per_sec": B / dt}), flush=True)

    # end-to-end packed API (includes XLA pack/unpack)
    pa = board.from_dense(dense > 0.5)
    pb = board.from_dense(db > 0.5)
    fn = jax.jit(lambda a, b: CV.convolve(a, b))
    dt = timed_chain(fn, pa, pb)
    print(json.dumps({"variant": "packed_api_fused",
                      "conv_per_sec": B / dt}), flush=True)

    fn = jax.jit(lambda a, b: CV.convolve(a, b, method="ntt"))
    dt = timed_chain(fn, pa, pb)
    print(json.dumps({"variant": "packed_api_xla_ntt",
                      "conv_per_sec": B / dt}), flush=True)


if __name__ == "__main__":
    main()
