"""Synthetic calibration kernel: a KNOWN number of VPU ops in the same
mix as the bit-kernels (elementwise and/or/xor/add/shift + sublane
rolls), so the fixpoint/step/beam kernels' post-CSE op counts
(utils/roofline.py) can be divided by an EMPIRICAL lane-ops/s ceiling
instead of a datasheet model (VERDICT r04 directive #8: XLA's
cost_analysis is opaque for Mosaic custom calls, so the ceiling must be
measured, not read off).

An "op" below is one elementwise uint32 operation over a [64, tile]
block (= 64 * tile lane-ops).  The op chain is serially dependent with
no algebraic identities, so neither XLA nor Mosaic can CSE/DCE/strength-
reduce it; the measured rate at a given tile is the practical ceiling
for kernels of this mix at that tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32

# ops per loop iteration, by mix (counted by hand to match the kernel
# bodies below; a funnel shift = 3 ops: two shifts + or)
ELEMWISE_UNIT = 4        # xor + shl + add + shr per unit
UNITS_PER_ITER = 4
ROLL_OPS = 2             # two sublane rolls per iteration (mix="rolls")


def ops_per_iter(mix):
    base = ELEMWISE_UNIT * UNITS_PER_ITER
    return base + (ROLL_OPS if mix == "rolls" else 0)


def _roll1(x, up):
    if up:
        return jnp.concatenate([x[-1:], x[:-1]], axis=0)
    return jnp.concatenate([x[1:], x[:1]], axis=0)


def _calib_kernel(a_ref, b_ref, out_ref, *, iters, mix):
    a = a_ref[:]
    b = b_ref[:]

    def body(_, c):
        a, b = c
        if mix == "rolls":
            a = _roll1(a, True)
            b = _roll1(b, False)
        for _ in range(UNITS_PER_ITER):
            a = a ^ (b << 1)
            b = b + (a >> 3)
        return a, b

    a, b = jax.lax.fori_loop(0, iters, body, (a, b))
    out_ref[:] = a ^ b


@functools.partial(
    jax.jit, static_argnames=("iters", "mix", "batch_tile", "interpret"))
def calibrate(a, b, iters=4096, mix="elemwise", batch_tile=512,
              interpret=False):
    """a/b: uint32[64, B].  Returns uint32[64, B]; total counted ops =
    iters * ops_per_iter(mix) array-ops over [64, batch_tile] blocks."""
    n_cols, bsz = a.shape
    assert n_cols == 64
    batch_tile = min(batch_tile, bsz)
    assert bsz % batch_tile == 0
    grid = (bsz // batch_tile,)
    spec = pl.BlockSpec(
        (64, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_calib_kernel, iters=iters, mix=mix),
        out_shape=jax.ShapeDtypeStruct(a.shape, U32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(a, b)
