"""Fused Pallas kernel for the traced-operand sparse OR-convolution.

TPU-native counterpart of the reference's run-decomposition ``Convolve``
(LifeAPI.hpp:1284-1370): the operand is read at RUNTIME and the cost
scales with its population.  The XLA while_loop form
(core.convolve.convolve_sparse_device) already does that, but every
peeled cell round-trips HBM (argmax + onehot select + 12 conditional
rolls per iteration as separate fusions).  Here the whole peel loop runs
in ONE kernel with every intermediate in VMEM/VREGs — the same locality
win the fused catalyst kernel measured at ~30x over its XLA scan
(ops/step_pallas.py:209-269, BENCH_NOTES round 4).

Layout: boards as ``uint32[64, B]`` lo/hi pairs (batch on lanes, columns
on sublanes — see step_pallas).  Per while-iteration, each lane peels the
first ON cell of ITS operand: first nonempty column by an iota-min
reduce, lowest set bit by ``w & -w``, its y by popcount, then the input
board is translated by the cell's (x, y) with 6 + 6 per-lane conditional
static rolls (the in-kernel form of core.board.move_dyn) and OR-ed into
the accumulator.  The loop ends when every lane's operand is exhausted,
so one call costs max-population-over-the-tile iterations of pure VPU
work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32

# measured on v5e (benches/conv_fused_r5.py, round 5, 7-cell operands):
# 4.5e7 / 6.8e7 conv/s at tiles 128 / 256 (shallow-M) and 6.75e7 at
# tile 512 under deep-M differencing (spread 1.015) = 81% of the
# calibrated tile-512 ceiling; unroll > 1 loses 16-18% (wasted peels),
# tile 1024 loses ~30%
DEFAULT_BATCH_TILE = 512


def _roll_cols_k(x, k):
    """Circular roll of the column (sublane) axis by +k (cell x -> x+k)."""
    return jnp.concatenate([x[-k:], x[:-k]], axis=0)


def _or_rows(x):
    """Bitwise-OR over the sublane axis, keepdims — uint32[64, T] ->
    uint32[1, T].  Static log2 fold (Mosaic has no unsigned reductions)."""
    for s in (32, 16, 8, 4, 2, 1):
        x = x[0:s, :] | x[s:2 * s, :]
    return x


def _conv_sparse_body(a_lo, a_hi, col_iota, carry):
    rem_lo, rem_hi, acc_lo, acc_hi = carry
    pc = jax.lax.population_count

    # Boolean masks + jnp.where throughout: a vector select is ONE VPU op
    # where the (t & m) | (s & ~m) mask idiom is three.  (i1 vectors are
    # only problematic as while_loop CARRIES; body-local bools are fine.)

    # -- extract the first ON cell of each lane's remaining operand
    nz = (rem_lo | rem_hi) != 0  # [64, T]
    x = jnp.min(jnp.where(nz, col_iota, 64), axis=0, keepdims=True)  # [1, T]
    onehot = col_iota == x  # [64, T]
    lo_w = _or_rows(jnp.where(onehot, rem_lo, U32(0)))  # [1, T]
    hi_w = _or_rows(jnp.where(onehot, rem_hi, U32(0)))
    use_lo = lo_w != 0
    bit_lo = lo_w & (~lo_w + U32(1))
    bit_hi = hi_w & (~hi_w + U32(1))
    y = jnp.where(use_lo, pc(bit_lo - 1).astype(jnp.int32),
                  32 + pc(bit_hi - 1).astype(jnp.int32))  # [1, T]
    live = x < 64  # [1, T] lanes that still had a cell

    rem_lo = jnp.where(onehot & use_lo, rem_lo & ~bit_lo, rem_lo)
    rem_hi = jnp.where(onehot & ~use_lo, rem_hi & ~bit_hi, rem_hi)

    # -- translate the input by (x, y), per lane (binary decomposition:
    # conditional static rolls, the kernel form of board.move_dyn)
    s_lo, s_hi = a_lo, a_hi
    for k_log in range(6):  # column axis: roll sublanes by x
        k = 1 << k_log
        m = (x & k) != 0
        s_lo = jnp.where(m, _roll_cols_k(s_lo, k), s_lo)
        s_hi = jnp.where(m, _roll_cols_k(s_hi, k), s_hi)
    for k_log in range(5):  # row axis: 64-bit rotate towards higher y
        k = 1 << k_log
        m = (y & k) != 0
        s_lo, s_hi = (
            jnp.where(m, (s_lo << k) | (s_hi >> (32 - k)), s_lo),
            jnp.where(m, (s_hi << k) | (s_lo >> (32 - k)), s_hi),
        )
    m32 = (y & 32) != 0  # rotate by 32 = half-word swap
    ns_lo = jnp.where(m32, s_hi, s_lo)
    ns_hi = jnp.where(m32, s_lo, s_hi)

    acc_lo = jnp.where(live, acc_lo | ns_lo, acc_lo)
    acc_hi = jnp.where(live, acc_hi | ns_hi, acc_hi)
    return rem_lo, rem_hi, acc_lo, acc_hi


def _conv_sparse_kernel(a_lo_ref, a_hi_ref, b_lo_ref, b_hi_ref,
                        out_lo_ref, out_hi_ref, *, unroll=1):
    a_lo = a_lo_ref[:]
    a_hi = a_hi_ref[:]
    rem_lo = b_lo_ref[:]
    rem_hi = b_hi_ref[:]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, a_lo.shape, 0)

    def cond(c):
        return jnp.any((c[0] | c[1]) != 0)

    body1 = functools.partial(_conv_sparse_body, a_lo, a_hi, col_iota)

    def body(c):
        # a peel of an exhausted lane is a masked no-op, so unrolling
        # trades at most unroll-1 wasted peels for 1/unroll of the
        # while-cond reduce+sync overhead
        for _ in range(unroll):
            c = body1(c)
        return c

    zero = jnp.zeros_like(a_lo)
    _, _, acc_lo, acc_hi = jax.lax.while_loop(
        cond, body, (rem_lo, rem_hi, zero, zero),
    )
    out_lo_ref[:] = acc_lo
    out_hi_ref[:] = acc_hi


def _counts_sparse_body(a_lo, a_hi, col_iota, n_planes, carry):
    """One peel with bit-sliced counter accumulation: the shifted copy
    ripple-adds into ``n_planes`` packed counter planes (2 ops per plane
    per half) instead of OR-ing (core.convolve.convolve_counts_sparse_
    device semantics, fused)."""
    rem_lo, rem_hi = carry[0], carry[1]
    planes = carry[2:]
    # reuse the OR body's extraction + translation on a throwaway acc
    rem_lo, rem_hi, add_lo, add_hi = _conv_sparse_body(
        a_lo, a_hi, col_iota,
        (rem_lo, rem_hi, jnp.zeros_like(a_lo), jnp.zeros_like(a_hi)))
    new = []
    for i in range(n_planes):
        p_lo, p_hi = planes[2 * i], planes[2 * i + 1]
        new.append(p_lo ^ add_lo)
        new.append(p_hi ^ add_hi)
        add_lo = p_lo & add_lo  # carry
        add_hi = p_hi & add_hi
    return (rem_lo, rem_hi) + tuple(new)


def _counts_sparse_kernel(a_lo_ref, a_hi_ref, b_lo_ref, b_hi_ref,
                          *out_refs, n_planes):
    a_lo = a_lo_ref[:]
    a_hi = a_hi_ref[:]
    rem_lo = b_lo_ref[:]
    rem_hi = b_hi_ref[:]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, a_lo.shape, 0)

    def cond(c):
        return jnp.any((c[0] | c[1]) != 0)

    zero = jnp.zeros_like(a_lo)
    init = (rem_lo, rem_hi) + tuple(zero for _ in range(2 * n_planes))
    out = jax.lax.while_loop(
        cond,
        functools.partial(_counts_sparse_body, a_lo, a_hi, col_iota,
                          n_planes),
        init,
    )
    for i in range(2 * n_planes):
        out_refs[i][:] = out[2 + i]


@functools.partial(jax.jit,
                   static_argnames=("batch_tile", "interpret", "unroll"))
def conv_sparse_lohi(a_lo, a_hi, b_lo, b_hi,
                     batch_tile=DEFAULT_BATCH_TILE, interpret=False,
                     unroll=1):
    """OR-convolution with a runtime-sparse operand, fused.  All inputs
    uint32[64, B] (kernel layout), B a multiple of the batch tile.
    Returns (out_lo, out_hi)."""
    n_cols, b = a_lo.shape
    assert n_cols == 64
    batch_tile = min(batch_tile, b)
    assert b % batch_tile == 0, (b, batch_tile)
    grid = (b // batch_tile,)
    spec = pl.BlockSpec(
        (64, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    shp = jax.ShapeDtypeStruct(a_lo.shape, U32)
    return pl.pallas_call(
        functools.partial(_conv_sparse_kernel, unroll=unroll),
        out_shape=(shp, shp),
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        interpret=interpret,
    )(a_lo, a_hi, b_lo, b_hi)


@functools.partial(
    jax.jit, static_argnames=("n_planes", "batch_tile", "interpret"))
def counts_sparse_lohi(a_lo, a_hi, b_lo, b_hi, n_planes=6,
                       batch_tile=DEFAULT_BATCH_TILE, interpret=False):
    """Bit-sliced EXACT counts with a runtime-sparse operand, fused.
    Returns 2*n_planes arrays uint32[64, B] (counter planes, lo/hi
    interleaved); counts are exact up to 2**n_planes - 1."""
    n_cols, b = a_lo.shape
    assert n_cols == 64
    batch_tile = min(batch_tile, b)
    assert b % batch_tile == 0, (b, batch_tile)
    grid = (b // batch_tile,)
    spec = pl.BlockSpec(
        (64, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    shp = jax.ShapeDtypeStruct(a_lo.shape, U32)
    return pl.pallas_call(
        functools.partial(_counts_sparse_kernel, n_planes=n_planes),
        out_shape=tuple(shp for _ in range(2 * n_planes)),
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=tuple(spec for _ in range(2 * n_planes)),
        interpret=interpret,
    )(a_lo, a_hi, b_lo, b_hi)


def counts_sparse_fused(a, b, n_planes=6, batch_tile=DEFAULT_BATCH_TILE,
                        interpret=False):
    """Packed-board entry for fused sparse counts: ``a``/``b``
    uint32[..., 64, 2] broadcastable, ``b`` the runtime-sparse operand.
    Returns ``n_planes`` packed counter planes uint32[..., 64, 2]
    (bit i of the per-cell count in plane i)."""
    from . import step_pallas as SP

    shape = jnp.broadcast_shapes(a.shape, b.shape)
    ab = jnp.broadcast_to(a, shape).reshape((-1, 64, 2))
    bb = jnp.broadcast_to(b, shape).reshape((-1, 64, 2))
    B = ab.shape[0]
    if B >= batch_tile:
        tile = batch_tile
    else:
        tile = B if interpret else 128  # Pallas lane tiles >= 128 on TPU
    pad = -B % tile
    if pad:
        z = jnp.zeros((pad, 64, 2), U32)
        ab = jnp.concatenate([ab, z])
        bb = jnp.concatenate([bb, z])
    a_lo, a_hi = SP.to_kernel_layout(ab)
    b_lo, b_hi = SP.to_kernel_layout(bb)
    flat = counts_sparse_lohi(a_lo, a_hi, b_lo, b_hi, n_planes=n_planes,
                              batch_tile=tile, interpret=interpret)
    return [
        SP.from_kernel_layout(flat[2 * i], flat[2 * i + 1])[:B]
        .reshape(shape)
        for i in range(n_planes)
    ]


def convolve_sparse_fused(a, b, batch_tile=DEFAULT_BATCH_TILE,
                          interpret=False, unroll=1):
    """Packed-board entry: ``a``/``b`` uint32[..., 64, 2] (broadcastable),
    ``b`` the runtime-sparse operand.  Bit-identical to
    core.convolve.convolve_sparse_device (tests/test_convolve.py), one
    kernel dispatch instead of an XLA while_loop that round-trips HBM
    per peeled cell."""
    from . import step_pallas as SP

    shape = jnp.broadcast_shapes(a.shape, b.shape)
    ab = jnp.broadcast_to(a, shape).reshape((-1, 64, 2))
    bb = jnp.broadcast_to(b, shape).reshape((-1, 64, 2))
    B = ab.shape[0]
    if B >= batch_tile:
        tile = batch_tile
    else:
        tile = B if interpret else 128  # Pallas lane tiles >= 128 on TPU
    pad = -B % tile
    if pad:
        z = jnp.zeros((pad, 64, 2), U32)
        ab = jnp.concatenate([ab, z])
        bb = jnp.concatenate([bb, z])  # empty operand: zero iterations
    a_lo, a_hi = SP.to_kernel_layout(ab)
    b_lo, b_hi = SP.to_kernel_layout(bb)
    out_lo, out_hi = conv_sparse_lohi(
        a_lo, a_hi, b_lo, b_hi, batch_tile=tile, interpret=interpret,
        unroll=unroll)
    return SP.from_kernel_layout(out_lo, out_hi)[:B].reshape(shape)
