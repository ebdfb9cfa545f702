"""Fused multi-step Life rollout as a Pallas TPU kernel.

The reference steps one board at a time on one CPU core (LifeAPI.hpp:
1196-1216); here thousands of boards are stepped in lockstep on the VPU.

Kernel layout: a batch of boards is two ``uint32[64, B]`` arrays ``lo``/
``hi`` — columns on the sublane axis, batch on the lane axis, so every
bitwise op processes 8x128 lanes of independent boards.  64-bit column
rotates become 32-bit funnel shifts between the two half-words; the
column-neighbour stencil is a +-1 sublane roll.  T generations are fused in
one kernel invocation so board state stays in VMEM for the whole horizon
(HBM traffic is amortized to 2 reads + 2 writes per rollout, not per step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32

# Tuned on TPU v5e: 128-lane batch tiles keep VREG pressure low enough that
# Mosaic does not spill the CSA intermediates; larger tiles measurably lose
# throughput (5.5e8 vs 7.0e8 steps/s at tile 256 vs 128).
DEFAULT_BATCH_TILE = 128
DEFAULT_UNROLL = 4


def _rotl1(lo, hi):
    """64-bit rotate towards higher y by 1, elementwise on half-words."""
    return (lo << 1) | (hi >> 31), (hi << 1) | (lo >> 31)


def _rotr1(lo, hi):
    return (lo >> 1) | (hi << 31), (hi >> 1) | (lo << 31)


def _roll_cols(x, shift):
    """Circular roll along the column (sublane) axis 0."""
    if shift == 1:
        return jnp.concatenate([x[-1:], x[:-1]], axis=0)
    if shift == -1:
        return jnp.concatenate([x[1:], x[:1]], axis=0)
    raise ValueError(shift)


def step_lohi(lo, hi):
    """One Life generation on kernel-layout boards (same CSA/Rokicki netlist
    as :func:`lifeapi_tpu.core.step.step`; bit-exact)."""
    al_lo, al_hi = _rotl1(lo, hi)
    ar_lo, ar_hi = _rotr1(lo, hi)

    # vertical 3-sums (reference CountRows, LifeAPI.hpp:897-907)
    x_lo = al_lo ^ ar_lo
    x_hi = al_hi ^ ar_hi
    c0_lo = x_lo ^ lo
    c0_hi = x_hi ^ hi
    c1_lo = (x_lo & lo) | (al_lo & ar_lo)
    c1_hi = (x_hi & hi) | (al_hi & ar_hi)

    u0_lo = _roll_cols(c0_lo, 1)
    u0_hi = _roll_cols(c0_hi, 1)
    u1_lo = _roll_cols(c1_lo, 1)
    u1_hi = _roll_cols(c1_hi, 1)
    b0_lo = _roll_cols(c0_lo, -1)
    b0_hi = _roll_cols(c0_hi, -1)
    b1_lo = _roll_cols(c1_lo, -1)
    b1_hi = _roll_cols(c1_hi, -1)

    # Rokicki next-state formula (reference LifeAPI.hpp:837-848)
    def rok(a, aw, ae, bU0, bU1, bB0, bB1):
        s0 = aw ^ ae
        s1 = aw & ae
        ts0 = bB0 ^ bU0
        ts1 = (bB0 & bU0) | (ts0 & s0)
        return (bB1 ^ bU1 ^ ts1 ^ s1) & ((bB1 | bU1) ^ (ts1 | s1)) & ((ts0 ^ s0) | a)

    nlo = rok(lo, al_lo, ar_lo, u0_lo, u1_lo, b0_lo, b1_lo)
    nhi = rok(hi, al_hi, ar_hi, u0_hi, u1_hi, b0_hi, b1_hi)
    return nlo, nhi


def step_eo(e, o):
    """One Life generation in even/odd interleaved packing: ``e`` holds
    bits y = 0,2,..,62 of the column, ``o`` the odd bits (see
    bitops.interleave_split).  Same CSA/Rokicki netlist, but the +-1-bit
    column rotates collapse to single 32-bit rotates (with free word
    swaps), saving ~10% of the per-step ops.  Bit-exact with step_lohi."""
    re = (o << 1) | (o >> 31)  # rotl64 by 1 == (rotl32(o), e)
    rr = (e >> 1) | (e << 31)  # rotr64 by 1 == (o, rotr32(e))
    x_e = re ^ o
    x_o = e ^ rr
    u_e = re & o
    u_o = e & rr
    c0_e = x_e ^ e
    c0_o = x_o ^ o
    c1_e = (x_e & e) | u_e
    c1_o = (x_o & o) | u_o

    u0_e = _roll_cols(c0_e, 1)
    u0_o = _roll_cols(c0_o, 1)
    u1_e = _roll_cols(c1_e, 1)
    u1_o = _roll_cols(c1_o, 1)
    b0_e = _roll_cols(c0_e, -1)
    b0_o = _roll_cols(c0_o, -1)
    b1_e = _roll_cols(c1_e, -1)
    b1_o = _roll_cols(c1_o, -1)

    def rok(a, s0, s1, bU0, bU1, bB0, bB1):
        ts0 = bB0 ^ bU0
        ts1 = (bB0 & bU0) | (ts0 & s0)
        return (bB1 ^ bU1 ^ ts1 ^ s1) & ((bB1 | bU1) ^ (ts1 | s1)) & ((ts0 ^ s0) | a)

    ne = rok(e, x_e, u_e, u0_e, u1_e, b0_e, b1_e)
    no = rok(o, x_o, u_o, u0_o, u1_o, b0_o, b1_o)
    return ne, no


def _rollout_kernel_eo(e_ref, o_ref, out_e_ref, out_o_ref, *, steps,
                       unroll=DEFAULT_UNROLL):
    e = e_ref[:]
    o = o_ref[:]

    main, rem = divmod(steps, unroll)

    def body(_, carry):
        ee, oo = carry
        for _ in range(unroll):
            ee, oo = step_eo(ee, oo)
        return ee, oo

    e, o = jax.lax.fori_loop(0, main, body, (e, o))
    for _ in range(rem):
        e, o = step_eo(e, o)
    out_e_ref[:] = e
    out_o_ref[:] = o


def _controlled_kernel_eo(te_ref, to_ref, e_ref, o_ref, out_e_ref, out_o_ref,
                          *, steps):
    e = e_ref[:]
    o = o_ref[:]

    def body(t, carry):
        ee, oo = carry
        ee = ee ^ te_ref[t]
        oo = oo ^ to_ref[t]
        return step_eo(ee, oo)

    e, o = jax.lax.fori_loop(0, steps, body, (e, o))
    out_e_ref[:] = e
    out_o_ref[:] = o


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret"))
def controlled_rollout_eo(e, o, toggles_e, toggles_o,
                          batch_tile=DEFAULT_BATCH_TILE, interpret=False):
    """MPC hard path, fused: per-generation control toggles XORed in, then
    the bit-exact step — the whole horizon in VMEM (counterpart of
    mpc.soft.hard_rollout, but one kernel instead of T dispatch rounds).

    e/o: uint32[64, B]; toggles_e/o: uint32[T, 64, B]."""
    steps, n_cols, b = toggles_e.shape
    assert n_cols == 64 and e.shape == (64, b)
    batch_tile = min(batch_tile, b)
    assert b % batch_tile == 0
    grid = (b // batch_tile,)
    board_spec = pl.BlockSpec(
        (64, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    tog_spec = pl.BlockSpec(
        (steps, 64, batch_tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_controlled_kernel_eo, steps=steps),
        out_shape=(
            jax.ShapeDtypeStruct(e.shape, U32),
            jax.ShapeDtypeStruct(o.shape, U32),
        ),
        grid=grid,
        in_specs=[tog_spec, tog_spec, board_spec, board_spec],
        out_specs=(board_spec, board_spec),
        interpret=interpret,
    )(toggles_e, toggles_o, e, o)


def controlled_rollout(boards, toggles, batch_tile=DEFAULT_BATCH_TILE,
                       interpret=False):
    """packed boards uint32[B, 64, 2] + packed toggles uint32[T, B, 64, 2]
    -> final packed boards after T controlled generations (bit-exact with
    mpc.soft.hard_rollout)."""
    from ..core import bitops

    lo, hi = to_kernel_layout(boards)
    e, o = bitops.interleave_split(lo, hi)
    tlo = jnp.moveaxis(toggles[..., 0], -1, -2)  # [T, 64, B]
    thi = jnp.moveaxis(toggles[..., 1], -1, -2)
    te, to = bitops.interleave_split(tlo, thi)
    e, o = controlled_rollout_eo(e, o, te, to, batch_tile=batch_tile,
                                 interpret=interpret)
    lo, hi = bitops.interleave_merge(e, o)
    return from_kernel_layout(lo, hi)


def _catalyst_kernel_eo(be_ref, bo_ref, e_ref, o_ref, pe_ref, po_ref,
                        ze_ref, zo_ref, out_e_ref, out_o_ref,
                        acc_e_ref, acc_o_ref, *, steps):
    """Fused catalyst-search rollout: step the placed boards, compare each
    generation against the (lane-broadcast) baseline trajectory inside
    the catalyst ZOI, OR the differences into an interaction
    accumulator.  The whole horizon stays in VMEM — the XLA scan path
    round-trips HBM every generation (search.py)."""
    e = e_ref[:]
    o = o_ref[:]
    pe = pe_ref[:]
    po = po_ref[:]
    ze = ze_ref[:]
    zo = zo_ref[:]

    def body(t, carry):
        ee, oo, ae, ao = carry
        ee, oo = step_eo(ee, oo)
        # baseline board after t+1 generations, one lane broadcast wide
        ae = ae | ((ee ^ (be_ref[t] | pe)) & ze)
        ao = ao | ((oo ^ (bo_ref[t] | po)) & zo)
        return ee, oo, ae, ao

    z = jnp.zeros_like(e)
    e, o, ae, ao = jax.lax.fori_loop(0, steps, body, (e, o, z, z))
    out_e_ref[:] = e
    out_o_ref[:] = o
    acc_e_ref[:] = ae
    acc_o_ref[:] = ao


@functools.partial(
    jax.jit, static_argnames=("batch_tile", "interpret")
)
def catalyst_rollout_eo(base_e, base_o, e, o, pe, po, ze, zo,
                        batch_tile=DEFAULT_BATCH_TILE, interpret=False):
    """e/o, pe/po (placed catalyst), ze/zo (catalyst ZOI): uint32[64, B];
    base_e/base_o: uint32[T, 64, 1] — the baseline reaction after each of
    the T generations.  Returns (final_e, final_o, acc_e, acc_o); a lane
    interacted iff its acc planes are nonzero."""
    steps = base_e.shape[0]
    n_cols, b = e.shape
    assert n_cols == 64 and base_e.shape == (steps, 64, 1)
    batch_tile = min(batch_tile, b)
    assert b % batch_tile == 0, (b, batch_tile)
    grid = (b // batch_tile,)
    spec = pl.BlockSpec(
        (64, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    base_spec = pl.BlockSpec(
        (steps, 64, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    shp = jax.ShapeDtypeStruct(e.shape, U32)
    return pl.pallas_call(
        functools.partial(_catalyst_kernel_eo, steps=steps),
        out_shape=(shp, shp, shp, shp),
        grid=grid,
        in_specs=[base_spec, base_spec] + [spec] * 6,
        out_specs=(spec, spec, spec, spec),
        interpret=interpret,
    )(base_e, base_o, e, o, pe, po, ze, zo)


def _rollout_kernel(lo_ref, hi_ref, out_lo_ref, out_hi_ref, *, steps):
    lo = lo_ref[:]
    hi = hi_ref[:]

    unroll = DEFAULT_UNROLL
    main, rem = divmod(steps, unroll)

    def body(_, carry):
        l, h = carry
        for _ in range(unroll):
            l, h = step_lohi(l, h)
        return l, h

    lo, hi = jax.lax.fori_loop(0, main, body, (lo, hi))
    for _ in range(rem):
        lo, hi = step_lohi(lo, hi)
    out_lo_ref[:] = lo
    out_hi_ref[:] = hi


def to_kernel_layout(boards):
    """packed uint32[B, 64, 2] -> (lo, hi) uint32[64, B]."""
    lo = jnp.transpose(boards[..., 0])
    hi = jnp.transpose(boards[..., 1])
    return lo, hi


def from_kernel_layout(lo, hi):
    """(lo, hi) uint32[64, B] -> packed uint32[B, 64, 2]."""
    return jnp.stack([jnp.transpose(lo), jnp.transpose(hi)], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("steps", "batch_tile", "interpret")
)
def rollout_lohi(lo, hi, steps, batch_tile=DEFAULT_BATCH_TILE, interpret=False):
    """Advance all boards ``steps`` generations.  lo/hi: uint32[64, B] with
    B a multiple of the batch tile (pad with dead boards if needed)."""
    n_cols, b = lo.shape
    assert n_cols == 64
    batch_tile = min(batch_tile, b)
    assert b % batch_tile == 0, (b, batch_tile)
    grid = (b // batch_tile,)
    spec = pl.BlockSpec(
        (64, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    out_lo, out_hi = pl.pallas_call(
        functools.partial(_rollout_kernel, steps=steps),
        out_shape=(
            jax.ShapeDtypeStruct(lo.shape, U32),
            jax.ShapeDtypeStruct(hi.shape, U32),
        ),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(steps) * 64 * 2 * 40 * b,
            bytes_accessed=4 * 64 * b * 4,
            transcendentals=0,
        ),
    )(lo, hi)
    return out_lo, out_hi


@functools.partial(
    jax.jit, static_argnames=("steps", "batch_tile", "interpret", "unroll")
)
def rollout_eo(e, o, steps, batch_tile=DEFAULT_BATCH_TILE, interpret=False,
               unroll=DEFAULT_UNROLL):
    """Advance interleaved-packed boards (see bitops.interleave_split)
    ``steps`` generations — the fastest path (~1.27e9 steps/s on v5e)."""
    n_cols, b = e.shape
    assert n_cols == 64
    batch_tile = min(batch_tile, b)
    assert b % batch_tile == 0, (b, batch_tile)
    grid = (b // batch_tile,)
    spec = pl.BlockSpec(
        (64, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_rollout_kernel_eo, steps=steps, unroll=unroll),
        out_shape=(
            jax.ShapeDtypeStruct(e.shape, U32),
            jax.ShapeDtypeStruct(o.shape, U32),
        ),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        interpret=interpret,
    )(e, o)


def rollout(boards, steps, batch_tile=DEFAULT_BATCH_TILE, interpret=False):
    """packed uint32[B, 64, 2] -> packed, advanced ``steps`` generations on
    the fused interleaved kernel path.  Layout conversion (transpose +
    even/odd bit compress) happens once per rollout, amortized over T
    steps."""
    from ..core import bitops

    lo, hi = to_kernel_layout(boards)
    e, o = bitops.interleave_split(lo, hi)
    e, o = rollout_eo(e, o, steps, batch_tile=batch_tile, interpret=interpret)
    lo, hi = bitops.interleave_merge(e, o)
    return from_kernel_layout(lo, hi)
