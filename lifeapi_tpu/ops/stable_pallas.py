"""Fused Pallas kernel for one still-life propagation step.

The jnp bit-plane path (stable/bitplane.py) is HBM-bound: ~700 elementwise
ops per step each round-tripping the 10-plane state through HBM.  This
kernel runs the whole step — synchronise + count + update + signal —
inside VMEM on kernel-layout half-planes, so HBM traffic drops to one
read + one write of the 10 planes per step.

Layout: each plane is a pair of ``uint32[64, B]`` arrays (low/high column
half-words, batch on lanes — the same layout as ops/step_pallas).  The
per-cell circuits are the SAME functions as the jnp path
(stable/bitplane.sync_circuit / update_circuit / signal_circuit — pure
elementwise), with the cross-cell primitives (9-counts, hollow ZOI)
reimplemented here with funnel shifts and sublane rolls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..stable import bitplane as BP

U32 = jnp.uint32

N_PLANES = 10  # state, unknown, 8 ruled


def _rotl1(lo, hi):
    return (lo << 1) | (hi >> 31), (hi << 1) | (lo >> 31)


def _rotr1(lo, hi):
    return (lo >> 1) | (hi << 31), (hi >> 1) | (lo << 31)


def _roll_cols(x, shift):
    if shift == 1:
        return jnp.concatenate([x[-1:], x[:-1]], axis=0)
    return jnp.concatenate([x[1:], x[:1]], axis=0)


def _half_add(a, b):
    return a ^ b, a & b


def _full_add(a, b, c):
    half = a ^ b
    return half ^ c, (a & b) | (c & half)


def _count9(lo, hi):
    """9-cell inclusive counts as LSB-first nibbles, one per half:
    ((b0..b3)_lo, (b0..b3)_hi).  Same CSA structure as
    core.step.neighbour_counts, on kernel-layout half-planes."""
    out = []
    al_lo, al_hi = _rotl1(lo, hi)
    ar_lo, ar_hi = _rotr1(lo, hi)
    for a, l, r in ((lo, al_lo, ar_lo), (hi, al_hi, ar_hi)):
        bit0 = l ^ r ^ a
        bit1 = ((l ^ r) & a) | (l & r)
        out.append((bit0, bit1))
    (c0_lo, c1_lo), (c0_hi, c1_hi) = out

    def combine(c0, c1):
        u0 = _roll_cols(c0, 1)
        u1 = _roll_cols(c1, 1)
        l0 = _roll_cols(c0, -1)
        l1 = _roll_cols(c1, -1)
        uc0, uc_carry0 = _half_add(u0, c0)
        uc1, uc2 = _full_add(u1, c1, uc_carry0)
        on0, on_carry0 = _half_add(uc0, l0)
        on1, on_carry1 = _full_add(uc1, l1, on_carry0)
        on2, on3 = _half_add(uc2, on_carry1)
        return (on0, on1, on2, on3)

    return combine(c0_lo, c1_lo), combine(c0_hi, c1_hi)


def _zoi_hollow(lo, hi):
    """8-neighbour dilation without the center, per half."""
    ul_lo, ul_hi = _rotl1(lo, hi)
    dr_lo, dr_hi = _rotr1(lo, hi)
    t_lo = lo | ul_lo | dr_lo
    t_hi = hi | ul_hi | dr_hi
    mid_lo = ul_lo | dr_lo
    mid_hi = ul_hi | dr_hi
    out_lo = _roll_cols(t_lo, 1) | _roll_cols(t_lo, -1) | mid_lo
    out_hi = _roll_cols(t_hi, 1) | _roll_cols(t_hi, -1) | mid_hi
    return out_lo, out_hi


def _step_planes(planes):
    """One propagation step on a tuple of 20 in-register plane arrays
    (10 planes x lo/hi).  Returns (new_planes, changed, abort) with
    changed/abort as [64, Bt] bitmask arrays."""
    lo = {i: planes[2 * i] for i in range(N_PLANES)}
    hi = {i: planes[2 * i + 1] for i in range(N_PLANES)}
    # plane order: 0=state, 1=unknown, 2..9 ruled[0..7]

    halves = []
    for h in (lo, hi):
        halves.append({
            "state": h[0], "unknown": h[1],
            "ruled": tuple(h[2 + i] for i in range(8)),
        })

    # 1. synchronise (elementwise per half)
    synced = []
    abort = [None, None]
    changed = [None, None]
    for k, ph in enumerate(halves):
        st1, un1, rl1, ab, ch = BP.sync_circuit(ph["state"], ph["unknown"],
                                                ph["ruled"])
        synced.append({"state": st1, "unknown": un1, "ruled": rl1})
        abort[k] = ab
        changed[k] = ch

    # 2. counts on the synced planes (cross-half).  Signal's counts are
    # derivable from update's (state and unknown are disjoint, so
    # count9(state|unknown) == on9 + unk9), so only TWO 9-counts are
    # needed per step instead of the reference's three
    # (LifeStable.hpp:558-675).
    s_lo, s_hi = synced[0]["state"], synced[1]["state"]
    u_lo, u_hi = synced[0]["unknown"], synced[1]["unknown"]
    on9 = _count9(s_lo, s_hi)
    unk9 = _count9(u_lo, u_hi)

    # 3. update + 4. signal (elementwise per half, shared interval)
    from ..stable import nibble as nb

    sig = []
    for k in range(2):
        ph = synced[k]
        A = nb.sub_bit(on9[k], ph["state"])
        Un = nb.sub_bit(unk9[k], ph["unknown"])
        AU = nb.add(A, Un)
        rl2, ab_u, ch_u = BP.update_circuit_interval(
            ph["state"], ph["unknown"], ph["ruled"], A, AU
        )
        ph["ruled"] = rl2
        abort[k] = abort[k] | ab_u
        changed[k] = changed[k] | ch_u
        sig.append(
            BP.signal_circuit_post(ph["state"], ph["unknown"], rl2, A, Un, AU)
        )

    # 5. broadcast signals (cross-half ZOI) and apply
    son_lo, soff_lo, con_lo, coff_lo = sig[0]
    son_hi, soff_hi, con_hi, coff_hi = sig[1]
    offz_lo, offz_hi = _zoi_hollow(soff_lo, soff_hi)
    onz_lo, onz_hi = _zoi_hollow(son_lo, son_hi)
    offz = (offz_lo | coff_lo, offz_hi | coff_hi)
    onz = (onz_lo | con_lo, onz_hi | con_hi)

    for k in range(2):
        ph = synced[k]
        unknown_before = ph["unknown"]
        # conflict: both signals hitting a still-unknown cell (reference
        # LifeStable.hpp:666-667)
        abort[k] = abort[k] | (offz[k] & onz[k] & unknown_before)

        off_cells = offz[k] & ph["unknown"]
        ph["state"] = ph["state"] & ~off_cells
        ph["unknown"] = ph["unknown"] & ~off_cells
        rl = list(ph["ruled"])
        rl[0] = rl[0] | off_cells
        rl[1] = rl[1] | off_cells
        on_cells = onz[k] & ph["unknown"]
        ph["state"] = ph["state"] | on_cells
        ph["unknown"] = ph["unknown"] & ~on_cells
        for i in range(2, 8):
            rl[i] = rl[i] | on_cells
        ph["ruled"] = tuple(rl)
        changed[k] = changed[k] | off_cells | on_cells

    new_planes = []
    for i in range(N_PLANES):
        for k in range(2):
            ph = synced[k]
            if i == 0:
                new_planes.append(ph["state"])
            elif i == 1:
                new_planes.append(ph["unknown"])
            else:
                new_planes.append(ph["ruled"][i - 2])
    return tuple(new_planes), changed[0] | changed[1], abort[0] | abort[1]


def _step_kernel(*refs):
    # refs: 20 inputs (10 planes x lo/hi), then 22 outputs
    ins = refs[:20]
    outs = refs[20:]
    planes = tuple(r[:] for r in ins)
    new_planes, changed, abort = _step_planes(planes)
    for i in range(20):
        outs[i][:] = new_planes[i]
    outs[20][:] = changed
    outs[21][:] = abort


def _simple_quiescence(planes, alive, max_iters):
    """Cheap-rule phase (reference ``PropagateSimple``, LifeStable.hpp:
    505-524): iterate the 2-plane state/unknown-only rule
    (stable/bitplane.simple_circuit) until no active lane changes.  Each
    iteration costs two 9-counts plus a ~60-op elementwise circuit —
    about 42% of the full sync+update+signal step (utils/roofline) — and
    reaches the same quiescence on pure forced-cell chains.  Only the
    state/unknown planes change; the next full pass's synchronise
    reconciles the ruled planes (same contract as the dense/packed jnp
    paths).  Returns (planes, aborted, changed) lane masks.

    Measured on v5e (round 3, benches/solver_sweep.py + beam_sweep.py
    --no-simple A/B): the phase LOSES ~14% on the fixpoint workload
    (7.55e6 -> 6.47e6 fixpoints/s) and ~13% on the beam at B=8192
    (132.1k -> 114.4k solves/s): these workloads' deductions are
    update/signal-bound, the cheap rule converges immediately with no
    deductions, and every outer iteration still pays the inner
    while_loop.  Hence ``simple_phase`` DEFAULTS TO OFF; the phase is
    kept (and tested for fixpoint equality) for workloads with long
    forced-cell chains where the reference's PropagateSimple pays."""
    zeros = jnp.zeros_like(planes[0])

    def lane_any(plane):
        any_l = jnp.any(plane != 0, axis=0, keepdims=True)
        mask = jnp.where(any_l, U32(0xFFFFFFFF), U32(0))
        return jnp.broadcast_to(mask, plane.shape)

    def cond(c):
        return jnp.any(c[4] != 0) & (c[7] < max_iters)

    def body(c):
        sl, sh, ul, uh, s_alive, s_abort, s_changed, sit = c
        on9 = _count9(sl, sh)
        unk9 = _count9(ul, uh)
        res = [
            BP.simple_circuit(s, u, on9[k], unk9[k])
            for k, (s, u) in enumerate(((sl, ul), (sh, uh)))
        ]
        onz = _zoi_hollow(res[0][3], res[1][3])
        onz = (onz[0] | res[0][3], onz[1] | res[1][3])
        offz = _zoi_hollow(res[0][2], res[1][2])
        offz = (offz[0] | res[0][2], offz[1] | res[1][2])
        new_s, new_u, ab, ch = [], [], zeros, zeros
        for k, (s, u) in enumerate(((sl, ul), (sh, uh))):
            new_off, new_on, _, _, abort_c = res[k]
            st1 = s | new_on
            un1 = u & ~new_on & ~new_off
            st2 = st1 | (onz[k] & un1)
            abort_c = abort_c | (offz[k] & onz[k] & un1)
            un2 = un1 & ~offz[k] & ~onz[k]
            new_s.append(st2)
            new_u.append(un2)
            ab = ab | abort_c
            ch = ch | (un2 ^ u)
        abort_l = lane_any(ab)
        changed_l = lane_any(ch)
        apply = s_alive & ~abort_l
        apply_b = apply[0:1, :] != 0  # lane-uniform: 1-op vector select
        sl = jnp.where(apply_b, new_s[0], sl)
        sh = jnp.where(apply_b, new_s[1], sh)
        ul = jnp.where(apply_b, new_u[0], ul)
        uh = jnp.where(apply_b, new_u[1], uh)
        s_abort = s_abort | (s_alive & abort_l)
        s_changed = s_changed | (s_alive & changed_l)
        s_alive = apply & changed_l
        return sl, sh, ul, uh, s_alive, s_abort, s_changed, sit + 1

    sl, sh, ul, uh, _, s_abort, s_changed, _ = jax.lax.while_loop(
        cond, body,
        (planes[0], planes[1], planes[2], planes[3], alive, zeros, zeros,
         jnp.int32(0)),
    )
    return (sl, sh, ul, uh) + tuple(planes[4:]), s_abort, s_changed


def _run_fixpoint(planes, max_iters, alive0=None, simple_phase=False,
                  unroll=1):
    """In-VMEM propagate fixpoint: loop the step until no active board in
    the tile changes.  Returns (planes, aborted, changed_ever) with
    aborted/changed as per-lane uint32 bitmasks (lane-constant).
    ``alive0`` optionally restricts which lanes participate (uint32 lane
    mask, e.g. the beam's active frontier slots).  ``simple_phase`` runs
    the cheap 2-plane rule to quiescence before each full pass (reference
    ``PropagateSimple`` composition); the fixpoint reached is identical —
    every simple-rule deduction is also made by the full circuit — so
    this is purely a speed knob (asserted by tests/test_stable_pallas).
    Default OFF: measured to lose 13-14% on the standard workloads (see
    _simple_quiescence).  ``unroll`` runs that many steps per loop
    iteration (sound: deductions are monotone and each step is masked
    per lane, so an extra step past a lane's fixpoint is a no-op) — an
    A/B knob for the in-kernel while_loop's per-iteration overhead."""
    ones = ~jnp.zeros_like(planes[0])
    zeros = jnp.zeros_like(planes[0])

    def lane_any(plane):
        """Broadcast per-lane OR over sublanes back to a full uint32 mask
        (all-ones / all-zeros per lane — NOT bool, which would promote to a
        1-bit mask under uint32 bitwise ops)."""
        any_l = jnp.any(plane != 0, axis=0, keepdims=True)
        mask = jnp.where(any_l, U32(0xFFFFFFFF), U32(0))
        return jnp.broadcast_to(mask, plane.shape)

    def cond(carry):
        _, alive, _, _, it = carry
        return jnp.any(alive != 0) & (it < max_iters)

    def one_step(planes, alive, aborted, changed_ever):
        """One masked propagate step: lanes that abort keep their old
        planes; quiesced/dead lanes are unaffected."""
        new_planes, changed, abort = _step_planes(planes)
        abort_l = lane_any(abort)
        changed_l = lane_any(changed)
        apply = alive & ~abort_l
        # per-lane select as a bool vector select (1 VPU op/plane vs 3
        # for the mask-AND-OR idiom; `apply` is lane-uniform so one row
        # suffices).  i1 vectors stay out of the while CARRY — alive/
        # aborted remain uint32 masks.
        apply_b = apply[0:1, :] != 0
        planes = tuple(
            jnp.where(apply_b, n, o) for n, o in zip(new_planes, planes)
        )
        aborted = aborted | (alive & abort_l)
        changed_ever = changed_ever | (alive & changed_l)
        alive = apply & changed_l
        return planes, alive, aborted, changed_ever

    def body(carry):
        planes, alive, aborted, changed_ever, it = carry
        if simple_phase:
            planes, s_abort, s_changed = _simple_quiescence(
                planes, alive, max_iters
            )
            aborted = aborted | s_abort
            changed_ever = changed_ever | s_changed
            alive = alive & ~s_abort
        for _ in range(unroll):
            planes, alive, aborted, changed_ever = one_step(
                planes, alive, aborted, changed_ever)
        return planes, alive, aborted, changed_ever, it + unroll

    alive_init = ones if alive0 is None else alive0
    planes, _, aborted, changed_ever, _ = jax.lax.while_loop(
        cond, body, (planes, alive_init, zeros, zeros, jnp.int32(0))
    )
    return planes, aborted, changed_ever


def _fixpoint_kernel(*refs, max_iters, simple_phase=False, unroll=1):
    """Entire propagate fixpoint in VMEM.  Outputs the final planes plus
    per-lane consistent / changed bitmasks (uint32[64, Bt])."""
    ins = refs[:20]
    outs = refs[20:]
    planes = tuple(r[:] for r in ins)
    planes, aborted, changed_ever = _run_fixpoint(
        planes, max_iters, simple_phase=simple_phase, unroll=unroll)
    for i in range(20):
        outs[i][:] = planes[i]
    outs[20][:] = changed_ever
    outs[21][:] = ~aborted  # consistent mask


def _priority_planes(planes):
    """Branch-priority level masks (stable/bitplane.branch_levels) on
    kernel-layout half-planes.  Returns 8 arrays, interleaved lo/hi per
    level: (l1_lo, l1_hi, l2_lo, l2_hi, l3_lo, l3_hi, settable_lo,
    settable_hi)."""
    from ..stable import nibble as nb

    lo = {i: planes[2 * i] for i in range(N_PLANES)}
    hi = {i: planes[2 * i + 1] for i in range(N_PLANES)}
    halves = []
    for h in (lo, hi):
        halves.append({
            "state": h[0], "unknown": h[1],
            "ruled": tuple(h[2 + i] for i in range(8)),
        })

    s_lo, s_hi = halves[0]["state"], halves[1]["state"]
    u_lo, u_hi = halves[0]["unknown"], halves[1]["unknown"]
    on9 = _count9(s_lo, s_hi)
    unk9 = _count9(u_lo, u_hi)

    vparts = [
        BP.vulnerable_circuit(ph["state"], ph["unknown"], ph["ruled"],
                              on9[k], unk9[k])
        for k, ph in enumerate(halves)
    ]
    onz = _zoi_hollow(vparts[0][0], vparts[1][0])
    offz = _zoi_hollow(vparts[0][1], vparts[1][1])
    vuln = [
        (onz[k] | vparts[k][2]) & (offz[k] | vparts[k][3]) for k in range(2)
    ]

    d_lo, d_hi = halves[0]["ruled"][2], halves[1]["ruled"][2]
    dz = _zoi_hollow(d_lo, d_hi)
    dzoi = (dz[0] | d_lo, dz[1] | d_hi)

    out = []
    for k in range(2):
        ph = halves[k]
        perturbed = ph["ruled"][0]
        for r in ph["ruled"][1:]:
            perturbed = perturbed | r
        settable = dzoi[k] & perturbed & ph["unknown"]
        out.append((
            vuln[k] & settable,
            settable & nb.eq_const(unk9[k], 2),
            settable & nb.eq_const(unk9[k], 3),
            settable,
        ))
    res = []
    for j in range(4):
        res.append(out[0][j])
        res.append(out[1][j])
    return tuple(res)


def _fixpoint_beam_kernel(*refs, max_iters, simple_phase=False):
    """Fixpoint + branch-priority masks in one kernel (the beam search's
    whole per-round device work on the 10-plane state)."""
    ins = refs[:20]
    outs = refs[20:]
    planes = tuple(r[:] for r in ins)
    planes, aborted, changed_ever = _run_fixpoint(
        planes, max_iters, simple_phase=simple_phase)
    prio = _priority_planes(planes)
    for i in range(20):
        outs[i][:] = planes[i]
    outs[20][:] = changed_ever
    outs[21][:] = ~aborted
    for j in range(8):
        outs[22 + j][:] = prio[j]


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret"))
def propagate_step_planes(planes, batch_tile=128, interpret=False):
    """One fused propagation step.  planes: tuple of 20 uint32[64, B]
    arrays (10 planes x lo/hi).  Returns (new_planes, changed[64, B],
    abort[64, B])."""
    b = planes[0].shape[1]
    batch_tile = min(batch_tile, b)
    assert b % batch_tile == 0
    grid = (b // batch_tile,)
    spec = pl.BlockSpec((64, batch_tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((64, b), U32) for _ in range(22)
    )
    outs = pl.pallas_call(
        _step_kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[spec] * 20,
        out_specs=(spec,) * 22,
        interpret=interpret,
    )(*planes)
    return outs[:20], outs[20], outs[21]


def _to_kernel_planes(bst: BP.BitStable):
    """BitStable (packed [B, 64, 2] planes) -> 20 uint32[64, B] arrays."""
    planes = (bst.state, bst.unknown) + tuple(bst.ruled)
    out = []
    for p in planes:
        out.append(jnp.transpose(p[..., 0]))
        out.append(jnp.transpose(p[..., 1]))
    return tuple(out)


def _from_kernel_planes(planes):
    packed = []
    for i in range(N_PLANES):
        lo = jnp.transpose(planes[2 * i])
        hi = jnp.transpose(planes[2 * i + 1])
        packed.append(jnp.stack([lo, hi], axis=-1))
    return BP.BitStable(packed[0], packed[1], tuple(packed[2:]))


@functools.partial(jax.jit, static_argnames=("max_iters", "batch_tile",
                                             "interpret", "simple_phase",
                                             "unroll"))
def propagate_fused_inkernel(bst: BP.BitStable, max_iters=256,
                             batch_tile=128, interpret=False,
                             simple_phase=False, unroll=1):
    """Whole propagate fixpoint in ONE pallas call: the while_loop runs in
    VMEM, boards in a tile iterate until the slowest converges.  Contract:
    per-board (consistent, changed); planes of INCONSISTENT boards are
    unspecified (the reference discards them, LifeStable.hpp:723)."""
    planes = _to_kernel_planes(bst)
    b = planes[0].shape[1]
    batch_tile = min(batch_tile, b)
    assert b % batch_tile == 0
    grid = (b // batch_tile,)
    spec = pl.BlockSpec((64, batch_tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out_shapes = tuple(jax.ShapeDtypeStruct((64, b), U32) for _ in range(22))
    outs = pl.pallas_call(
        functools.partial(_fixpoint_kernel, max_iters=max_iters,
                          simple_phase=simple_phase, unroll=unroll),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[spec] * 20,
        out_specs=(spec,) * 22,
        interpret=interpret,
    )(*planes)
    out = _from_kernel_planes(outs[:20])
    changed = jnp.any(outs[20] != 0, axis=0)
    consistent = jnp.all(outs[21] != 0, axis=0)
    return BP.BitPropagateResult(out, consistent, changed)


@functools.partial(jax.jit, static_argnames=("max_iters", "batch_tile",
                                             "interpret", "simple_phase"))
def propagate_fused_beam_planes(planes, max_iters=256, batch_tile=128,
                                interpret=False, simple_phase=False):
    """Kernel-layout variant of :func:`propagate_fused_beam`: takes and
    returns 20 uint32[64, L] half-planes directly (no packing transposes).
    Returns ``(new_planes, changed[64, L], consistent[64, L], prio)`` where
    changed/consistent are lane-constant bitmasks and ``prio`` is the
    8-tuple of priority half-planes (lo/hi interleaved per level, see
    _priority_planes).  Used by the beam search, whose frontier lives in
    kernel layout across rounds."""
    b = planes[0].shape[1]
    batch_tile = min(batch_tile, b)
    assert b % batch_tile == 0
    grid = (b // batch_tile,)
    spec = pl.BlockSpec((64, batch_tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out_shapes = tuple(jax.ShapeDtypeStruct((64, b), U32) for _ in range(30))
    outs = pl.pallas_call(
        functools.partial(_fixpoint_beam_kernel, max_iters=max_iters,
                          simple_phase=simple_phase),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[spec] * 20,
        out_specs=(spec,) * 30,
        interpret=interpret,
    )(*planes)
    return outs[:20], outs[20], outs[21], outs[22:]


@functools.partial(jax.jit, static_argnames=("max_iters", "batch_tile",
                                             "interpret", "simple_phase"))
def propagate_fused_beam(bst: BP.BitStable, max_iters=256, batch_tile=128,
                         interpret=False, simple_phase=False):
    """Propagate fixpoint AND branch-priority masks in ONE pallas call.
    Returns ``(BitPropagateResult, levels)`` where ``levels`` is the
    4-tuple of packed masks from stable/bitplane.branch_levels evaluated
    on the propagated planes (unspecified for inconsistent boards, like
    the planes themselves)."""
    planes = _to_kernel_planes(bst)
    b = planes[0].shape[1]
    batch_tile = min(batch_tile, b)
    assert b % batch_tile == 0
    grid = (b // batch_tile,)
    spec = pl.BlockSpec((64, batch_tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out_shapes = tuple(jax.ShapeDtypeStruct((64, b), U32) for _ in range(30))
    outs = pl.pallas_call(
        functools.partial(_fixpoint_beam_kernel, max_iters=max_iters,
                          simple_phase=simple_phase),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[spec] * 20,
        out_specs=(spec,) * 30,
        interpret=interpret,
    )(*planes)
    out = _from_kernel_planes(outs[:20])
    changed = jnp.any(outs[20] != 0, axis=0)
    consistent = jnp.all(outs[21] != 0, axis=0)
    levels = tuple(
        jnp.stack(
            [jnp.transpose(outs[22 + 2 * j]),
             jnp.transpose(outs[22 + 2 * j + 1])],
            axis=-1,
        )
        for j in range(4)
    )
    return BP.BitPropagateResult(out, consistent, changed), levels


@functools.partial(jax.jit, static_argnames=("max_iters", "batch_tile",
                                             "interpret"))
def propagate_fused(bst: BP.BitStable, max_iters=256, batch_tile=128,
                    interpret=False):
    """Fixpoint propagation with the fused step kernel; same contract as
    stable.bitplane.propagate (per-board consistency/changed masks)."""
    planes = _to_kernel_planes(bst)
    b = planes[0].shape[1]
    consistent0 = jnp.ones((b,), bool)
    changed0 = jnp.zeros((b,), bool)
    active0 = jnp.ones((b,), bool)

    def cond(carry):
        _, _, _, active, it = carry
        return jnp.any(active) & (it < max_iters)

    def body(carry):
        planes, consistent, changed_ever, active, it = carry
        new_planes, changed_p, abort_p = propagate_step_planes(
            planes, batch_tile=batch_tile, interpret=interpret
        )
        step_changed = jnp.any(changed_p != 0, axis=0)
        step_abort = jnp.any(abort_p != 0, axis=0)
        ok = ~step_abort
        apply = active & ok
        planes = tuple(
            jnp.where(apply[None, :], n, o) for n, o in zip(new_planes, planes)
        )
        consistent = consistent & (~active | ok)
        changed_ever = changed_ever | (active & step_changed)
        active = active & ok & step_changed
        return planes, consistent, changed_ever, active, it + 1

    planes, consistent, changed_ever, _, _ = jax.lax.while_loop(
        cond, body, (planes, consistent0, changed0, active0, jnp.int32(0))
    )
    out = _from_kernel_planes(planes)
    return BP.BitPropagateResult(out, consistent, changed_ever)


# ---------------------------------------------------------------------------
# Whole-beam-search kernel
# ---------------------------------------------------------------------------
#
# The reference explores one DFS path at a time (CompleteStableStep,
# LifeStable.hpp:1340-1412).  The TPU engine keeps, per problem, a frontier
# of F candidate partial boards in F adjacent VPU lanes and advances ALL of
# them per round.  This kernel runs the ENTIRE search — propagate fixpoint,
# leaf harvest, branch-cell choice, OFF/ON child construction and
# keep-best-F selection — inside one pallas_call, so the 10-plane frontier
# never leaves VMEM between rounds.  Cross-slot steps (harvest argmin,
# candidate ranking, child gather) are lane-group rotates: O(F log F)
# register ops instead of the XLA-level argsort + one-hot gather chains
# that previously dominated each round.
#
# Decision-for-decision equivalent to the packed jnp runner in
# stable/complete.py (same branch cells, same tie-breaking, same drop
# accounting) — asserted by tests/test_stable_pallas.py.

_INT32_MAX = jnp.iinfo(jnp.int32).max
_LEAF_SENTINEL = 1 << 20  # > max leaf key (4096*16 + 15)


def _grot(x, k, F):
    """Rotate lanes left by ``k`` within groups of ``F`` lanes (F a power
    of two dividing the lane count): out[.., g*F + j] = x[.., g*F + (j+k)%F].
    Two full-width lane rolls + a lane-position select; never reads across
    a group boundary."""
    k = k % F
    if k == 0:
        return x
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) % F
    return jnp.where(lane < F - k, jnp.roll(x, -k, axis=-1),
                     jnp.roll(x, F - k, axis=-1))


def _or_rows(x):
    """Bitwise-OR over the sublane (row) axis, keepdims: uint32[64, T] ->
    uint32[1, T].  Static log2 fold — Mosaic has no unsigned reductions,
    so jnp.max/sum over uint32 would fail to lower."""
    for s in (32, 16, 8, 4, 2, 1):
        x = x[0:s, :] | x[s:2 * s, :]
    return x


def _greduce(x, F, op):
    """Reduce over each lane group of F (power of two); every lane of a
    group ends up holding the group reduction (log2 F rotate-combines)."""
    k = 1
    while k < F:
        x = op(x, _grot(x, k, F))
        k *= 2
    return x


def _beam_kernel(*refs, F, iters, minimise, max_fix_iters, use_seed=False,
                 simple_phase=False, use_bound=False):
    act_ref = refs[0]
    idx = 1
    if use_bound:
        bound_ref = refs[1]
        idx = 2
    in_planes = refs[idx:idx + 20]
    idx += 20
    if use_seed:
        seed_lo0, seed_hi0 = refs[idx][:], refs[idx + 1][:]
        idx += 2
    else:
        seed_lo0 = seed_hi0 = None
    out_refs = refs[idx:]
    (best_lo_ref, best_hi_ref, best_pop_ref, found_ref, complete_ref,
     active_any_ref) = out_refs

    planes0 = tuple(r[:] for r in in_planes)
    T = planes0[0].shape[1]
    FULL = U32(0xFFFFFFFF)

    # All per-lane flags (active / found / complete) are carried as uint32
    # lane masks (FULL / 0), NOT bools: Mosaic cannot legalize i1 vector
    # carries through the while_loop's scf.yield.
    active0 = act_ref[:][0:1, :]  # uint32 mask (1, T)
    lane_slot = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1) % F
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (64, T), 0)

    def rowmask(b):
        return jnp.where(b, FULL, U32(0))

    def cond(c):
        return jnp.any(c[1] != 0) & (c[7] < iters)

    def body(c):
        planes, active, best_lo, best_hi, best_pop, found, complete, it = c

        alive0 = jnp.broadcast_to(active, planes[0].shape)
        planes, aborted, _ = _run_fixpoint(planes, max_fix_iters,
                                           alive0=alive0,
                                           simple_phase=simple_phase)
        ok = active & ~aborted[0:1, :]  # aborted is lane-constant

        s_lo, s_hi = planes[0], planes[1]
        pop = (jnp.sum(jax.lax.population_count(s_lo).astype(jnp.int32),
                       axis=0, keepdims=True)
               + jnp.sum(jax.lax.population_count(s_hi).astype(jnp.int32),
                         axis=0, keepdims=True))
        if minimise:
            # population bound (reference LifeStable.hpp:1351-1355)
            ok = ok & rowmask(pop < best_pop)
        else:
            ok = ok & ~found

        prio = _priority_planes(planes)
        if use_seed:
            # seed-proximity restriction (reference useSeed,
            # LifeStable.hpp:1366-1375): intersect every priority level
            # with the smallest seed-ZOI-dilation touching the settable
            # set.  Leaf-ness is unchanged: for ok lanes the restricted
            # settable is nonempty iff the unrestricted one was (the
            # growth loop guarantees intersection; empty-seed lanes are
            # unrestricted).  Same ordering as the jnp runner.
            st_lo, st_hi = prio[6], prio[7]
            has_set = ok & rowmask(_or_rows(st_lo | st_hi) != 0)
            semask = rowmask(_or_rows(seed_lo0 | seed_hi0) == 0)
            sz0 = (seed_lo0 | semask, seed_hi0 | semask)

            def _grow_mask(sl, sh):
                inter = _or_rows((st_lo & sl) | (st_hi & sh))
                return has_set & rowmask(inter == 0)

            def zcond(zc):
                sl, sh, zit = zc
                return jnp.any(_grow_mask(sl, sh) != 0) & (zit < 33)

            def zbody(zc):
                sl, sh, zit = zc
                zl, zh = _zoi_hollow(sl, sh)
                nl, nh = zl | sl, zh | sh
                g = _grow_mask(sl, sh)
                return (nl & g) | (sl & ~g), (nh & g) | (sh & ~g), zit + 1

            sz_lo, sz_hi, _ = jax.lax.while_loop(
                zcond, zbody, (sz0[0], sz0[1], jnp.int32(0))
            )
            prio = tuple(
                p & (sz_lo if j % 2 == 0 else sz_hi)
                for j, p in enumerate(prio)
            )
        set_lo, set_hi = prio[6], prio[7]
        is_leaf = ok & rowmask(_or_rows(set_lo | set_hi) == 0)

        # -- harvest: best leaf of this round per problem (key packs the
        # slot index for the same lowest-slot tie-break as argmin)
        leaf_key = jnp.where(is_leaf != 0, pop * 16 + lane_slot,
                             jnp.int32(_LEAF_SENTINEL))
        gmin = _greduce(leaf_key, F, jnp.minimum)
        has_leaf = gmin < _LEAF_SENTINEL
        round_pop = jnp.where(has_leaf, gmin >> 4, _INT32_MAX)
        better = round_pop < best_pop
        winner = is_leaf & rowmask(leaf_key == gmin)
        win_lo = _greduce(s_lo & winner, F, jnp.bitwise_or)
        win_hi = _greduce(s_hi & winner, F, jnp.bitwise_or)
        bm = rowmask(better)
        best_lo = (win_lo & bm) | (best_lo & ~bm)
        best_hi = (win_hi & bm) | (best_hi & ~bm)
        best_pop = jnp.where(better, round_pop, best_pop)
        found = found | bm
        ok = ok & ~is_leaf

        # -- branch cell: first cell of the highest nonempty priority
        # level (reference branch order, LifeStable.hpp:1377-1391)
        ch_lo, ch_hi = set_lo, set_hi
        for k in (2, 1, 0):
            hm = rowmask(jnp.any((prio[2 * k] | prio[2 * k + 1]) != 0,
                                 axis=0, keepdims=True))
            ch_lo = (prio[2 * k] & hm) | (ch_lo & ~hm)
            ch_hi = (prio[2 * k + 1] & hm) | (ch_hi & ~hm)
        nz = (ch_lo | ch_hi) != 0
        col = jnp.min(jnp.where(nz, col_iota, 64), axis=0, keepdims=True)
        onehot_col = col_iota == col
        lo_w = _or_rows(jnp.where(onehot_col, ch_lo, U32(0)))
        hi_w = _or_rows(jnp.where(onehot_col, ch_hi, U32(0)))
        use_lo = lo_w != U32(0)
        bit_lo = lo_w & (~lo_w + U32(1))
        bit_hi = hi_w & (~hi_w + U32(1))
        cell_lo = jnp.where(onehot_col & use_lo, bit_lo, U32(0)) & ok
        cell_hi = jnp.where(onehot_col & ~use_lo, bit_hi, U32(0)) & ok

        # -- rank the 2F children per problem: key orders by population,
        # then OFF-before-ON, then slot — the exact stable-argsort order
        # of the packed jnp runner
        BIG = jnp.int32(_LEAF_SENTINEL)
        score_off = jnp.where(ok != 0, pop, BIG)
        score_on = jnp.where(ok != 0, pop + 1, BIG)
        key_off = score_off * (2 * F) + lane_slot
        key_on = score_on * (2 * F) + F + lane_slot
        rank_off = jnp.zeros_like(key_off)
        rank_on = jnp.zeros_like(key_on)
        for k in range(F):
            ro = _grot(key_off, k, F)
            rn = _grot(key_on, k, F)
            rank_off = (rank_off + (ro < key_off).astype(jnp.int32)
                        + (rn < key_off).astype(jnp.int32))
            rank_on = (rank_on + (ro < key_on).astype(jnp.int32)
                       + (rn < key_on).astype(jnp.int32))

        # an active candidate ranked beyond capacity is dropped: the
        # search is no longer exhaustive (soundness of proved_inconsistent)
        dropped_row = ok & rowmask((rank_off >= F) | (rank_on >= F))
        dropped = _greduce(dropped_row, F, jnp.bitwise_or)
        complete = complete & ~dropped

        # -- gather: destination slot j takes the candidate ranked j
        # (ranks are a permutation of 0..2F-1, so exactly one per slot)
        g = [jnp.zeros_like(p) for p in planes]
        g_cl = jnp.zeros_like(cell_lo)
        g_ch = jnp.zeros_like(cell_hi)
        ison = jnp.zeros((1, T), U32)
        nact = jnp.zeros((1, T), U32)
        for k in range(F):
            sel_off = _grot(rank_off, k, F) == lane_slot
            sel_on = _grot(rank_on, k, F) == lane_slot
            sm = rowmask(sel_off | sel_on)
            for i in range(len(g)):
                g[i] = g[i] | (_grot(planes[i], k, F) & sm)
            g_cl = g_cl | (_grot(cell_lo, k, F) & sm)
            g_ch = g_ch | (_grot(cell_hi, k, F) & sm)
            ison = ison | rowmask(sel_on)
            nact = nact | (_grot(ok, k, F) & sm)
        new_active = nact

        new_planes = []
        for i in range(N_PLANES):
            for h in range(2):
                gp = g[2 * i + h]
                gc = g_cl if h == 0 else g_ch
                if i == 0:  # state
                    gp = (ison & (gp | gc)) | (~ison & (gp & ~gc))
                elif i == 1:  # unknown
                    gp = gp & ~gc
                elif i in (2, 3):  # ruled live2/live3: OFF rules out
                    gp = (ison & gp) | (~ison & (gp | gc))
                else:  # ruled dead*: ON rules out
                    gp = (ison & (gp | gc)) | (~ison & gp)
                new_planes.append(gp)

        return (tuple(new_planes), new_active, best_lo, best_hi, best_pop,
                found, complete, it + 1)

    best_lo0 = jnp.zeros((64, T), U32)
    best_hi0 = jnp.zeros((64, T), U32)
    if use_bound:
        # branch-and-bound with a known incumbent (reference re-minimise
        # seeds maxPop with the first pass's best, LifeStable.hpp:1444):
        # candidates at/above the bound prune immediately; `found` stays
        # false unless a strictly better completion is found
        best_pop0 = bound_ref[:][0:1, :]
    else:
        best_pop0 = jnp.full((1, T), _INT32_MAX, jnp.int32)
    found0 = jnp.zeros((1, T), U32)
    complete0 = jnp.full((1, T), FULL, U32)
    out = jax.lax.while_loop(
        cond, body,
        (planes0, active0, best_lo0, best_hi0, best_pop0, found0,
         complete0, jnp.int32(0)),
    )
    _, activeF, best_lo, best_hi, best_pop, found, complete, _ = out

    best_lo_ref[:] = best_lo
    best_hi_ref[:] = best_hi
    best_pop_ref[:] = jnp.broadcast_to(best_pop, (8, T))
    found_ref[:] = jnp.broadcast_to(found, (8, T))
    complete_ref[:] = jnp.broadcast_to(complete, (8, T))
    active_any_ref[:] = jnp.broadcast_to(
        _greduce(activeF, F, jnp.bitwise_or), (8, T))


@functools.partial(jax.jit, static_argnames=("F", "iters", "minimise",
                                             "batch_tile", "interpret",
                                             "max_fix_iters",
                                             "simple_phase"))
def beam_search_planes(planes, active_row, *, F, iters, minimise,
                       batch_tile=128, interpret=False, max_fix_iters=256,
                       seed_planes=None, simple_phase=False,
                       bound_row=None):
    """Run the ENTIRE beam completion search in one pallas_call.

    ``planes``: 20 uint32[64, L] half-planes (L = B*F lanes, slot index
    fastest).  ``active_row``: uint32[8, L] lane mask of initially active
    slots.  Each lane-group of F is one independent problem; each grid
    tile runs its own round loop until every problem in it exhausts its
    frontier or ``iters`` rounds pass.  Returns ``(best_lo, best_hi,
    best_pop, found, complete, active_any)`` — best planes are
    lane-replicated per group; rows are [8, L] (read any sublane)."""
    L = planes[0].shape[1]
    batch_tile = min(batch_tile, L)
    assert F & (F - 1) == 0 and 2 <= F <= 16, "F must be a power of two <= 16"
    assert L % batch_tile == 0 and batch_tile % F == 0
    grid = (L // batch_tile,)
    pspec = pl.BlockSpec((64, batch_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    rspec = pl.BlockSpec((8, batch_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((64, L), U32),
        jax.ShapeDtypeStruct((64, L), U32),
        jax.ShapeDtypeStruct((8, L), jnp.int32),
        jax.ShapeDtypeStruct((8, L), U32),
        jax.ShapeDtypeStruct((8, L), U32),
        jax.ShapeDtypeStruct((8, L), U32),
    )
    use_seed = seed_planes is not None
    use_bound = bound_row is not None
    seed_in = tuple(seed_planes) if use_seed else ()
    bound_in = (bound_row,) if use_bound else ()
    ispec = pl.BlockSpec((8, batch_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_beam_kernel, F=F, iters=iters, minimise=minimise,
                          max_fix_iters=max_fix_iters, use_seed=use_seed,
                          simple_phase=simple_phase, use_bound=use_bound),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[rspec] + [ispec] * use_bound + [pspec] * (20 + 2 * use_seed),
        out_specs=(pspec, pspec, rspec, rspec, rspec, rspec),
        interpret=interpret,
    )(active_row, *bound_in, *planes, *seed_in)
