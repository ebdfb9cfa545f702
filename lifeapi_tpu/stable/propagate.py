"""Batched still-life constraint propagation (AC-style fixpoint).

Counterpart of the reference ``LifeStable`` propagation stack
(LifeStable.hpp:39-729).  Representation is dense and batched: per cell a
bool ``state`` (known ON), bool ``unknown``, and a uint8 ``ruled`` options
mask (bit set = option ruled out, same convention as the reference's
inverted planes, LifeStable.hpp:44-53) over ``[..., 64, 64]`` grids indexed
``[x, y]``.  Neighbour counts come from 3x3 rolled sums; the per-cell rule
netlists become closed-form vectorized interval rules (rules_vec.py; the
LUT forms in options.py remain the tested specification).  The fixpoint runs
under ``lax.while_loop`` with per-board convergence and consistency masks,
so thousands of independent CSPs propagate in lockstep (SURVEY.md section
7).  The reference's strip variants (LifeStable.hpp:731-1249) are
deliberately absent: whole-board data parallelism is free here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import board as board_mod
from . import options as opt
from . import rules_vec

N = 64


class Stable(NamedTuple):
    """Batched partial still-life (reference ``LifeStable``,
    LifeStable.hpp:39-53)."""

    state: jax.Array  # bool[..., 64, 64] known ON
    unknown: jax.Array  # bool[..., 64, 64]
    ruled: jax.Array  # uint8[..., 64, 64] options ruled out

    @property
    def batch_shape(self):
        return self.state.shape[:-2]


class PropagateResult(NamedTuple):
    """Per-board consistency/progress flags (reference
    LifeStable.hpp:123-126)."""

    stable: Stable
    consistent: jax.Array  # bool[...]
    changed: jax.Array  # bool[...]


def make(state=None, unknown=None, batch=()):
    """Fresh Stable; ``state``/``unknown`` may be packed boards or dense."""
    def to_dense(x):
        if x is None:
            return jnp.zeros((*batch, N, N), dtype=bool)
        if x.dtype == jnp.uint32:
            return board_mod.to_dense(x)
        return x.astype(bool)

    s = to_dense(state)
    u = to_dense(unknown)
    shape = jnp.broadcast_shapes(s.shape, u.shape)
    s = jnp.broadcast_to(s, shape)
    u = jnp.broadcast_to(u, shape) & ~s
    return Stable(s, u, jnp.zeros(shape, dtype=jnp.uint8))


def count9(dense_bool):
    """3x3 window sum including the center, int32, torus."""
    x = dense_bool.astype(jnp.int32)
    v = x + jnp.roll(x, 1, axis=-1) + jnp.roll(x, -1, axis=-1)
    return v + jnp.roll(v, 1, axis=-2) + jnp.roll(v, -1, axis=-2)


def zoi_dense(dense_bool):
    x = dense_bool
    v = x | jnp.roll(x, 1, axis=-1) | jnp.roll(x, -1, axis=-1)
    return v | jnp.roll(v, 1, axis=-2) | jnp.roll(v, -1, axis=-2)


def zoi_hollow_dense(dense_bool):
    x = dense_bool
    v = x | jnp.roll(x, 1, axis=-1) | jnp.roll(x, -1, axis=-1)
    mid = jnp.roll(x, 1, axis=-1) | jnp.roll(x, -1, axis=-1)
    return jnp.roll(v, 1, axis=-2) | jnp.roll(v, -1, axis=-2) | mid


def center_code(st: Stable):
    """Dense three-state code: 0=OFF, 1=ON, 2=UNKNOWN."""
    return jnp.where(
        st.unknown, jnp.int32(opt.UNKNOWN), st.state.astype(jnp.int32)
    )


# ---------------------------------------------------------------------------
# Cell-level access (reference LifeStable.hpp:284-364)
# ---------------------------------------------------------------------------


def get_options(st: Stable, x, y):
    """Possible-options mask of one cell (reference ``GetOptions``)."""
    return (~st.ruled[..., x, y]) & jnp.uint8(0xFF)


def restrict_cells(st: Stable, cells, options_mask):
    """Rule out everything outside ``options_mask`` on the given cells
    (reference ``RestrictOptions(LifeState, StableOptions)``,
    LifeStable.hpp:308-318).  ``cells``: dense bool mask."""
    add = jnp.uint8((~options_mask) & 0xFF)
    return st._replace(ruled=jnp.where(cells, st.ruled | add, st.ruled))


def set_on(st: Stable, cells):
    """Force cells ON (reference ``SetOn``, LifeStable.hpp:320-329)."""
    return Stable(
        st.state | cells,
        st.unknown & ~cells,
        jnp.where(cells, st.ruled | jnp.uint8(opt.DEAD_MASK), st.ruled),
    )


def set_off(st: Stable, cells):
    """Force cells OFF (reference ``SetOff``, LifeStable.hpp:330-335)."""
    return Stable(
        st.state & ~cells,
        st.unknown & ~cells,
        jnp.where(cells, st.ruled | jnp.uint8(opt.LIVE_MASK), st.ruled),
    )


def set_cell_on(st: Stable, x, y):
    return set_on(st, _cell_mask(st, x, y))


def set_cell_off(st: Stable, x, y):
    return set_off(st, _cell_mask(st, x, y))


def _cell_mask(st: Stable, x, y):
    m = jnp.zeros((N, N), dtype=bool).at[x, y].set(True)
    return jnp.broadcast_to(m, st.state.shape)


# ---------------------------------------------------------------------------
# Lattice ops (reference LifeStable.hpp:217-282, :1461-1479)
# ---------------------------------------------------------------------------


def join(a: Stable, b: Stable):
    """Least upper bound: keeps only what both agree on (reference
    ``Join``, LifeStable.hpp:217-233)."""
    unknown = a.unknown | b.unknown | (a.state ^ b.state)
    return Stable(a.state & ~unknown, unknown, a.ruled & b.ruled)


def graft(a: Stable, b: Stable):
    """Overlay b's decided region onto a (reference ``Graft``,
    LifeStable.hpp:235-251): cells where b has DEAD0 ruled out carry b's
    constraints."""
    modified = (b.ruled & opt.DEAD0).astype(bool)
    unknown = a.unknown & ~(~b.unknown & modified)
    state = a.state | b.state
    ruled = a.ruled | jnp.where(modified, b.ruled, jnp.uint8(0))
    return Stable(state, unknown, ruled)


def clear_unmodified(st: Stable):
    """Drop unknown cells far from any decided region (reference
    ``ClearUnmodified``, LifeStable.hpp:253-264)."""
    modified_zoi = zoi_dense((st.ruled & opt.DEAD0).astype(bool))
    unknown = st.unknown & modified_zoi
    out = Stable(st.state, unknown, st.ruled)
    return update_options(out).stable


def differences(a: Stable, b: Stable):
    """Dense mask of any differing plane (reference ``Differences``,
    LifeStable.hpp:266-282)."""
    return (a.state ^ b.state) | (a.unknown ^ b.unknown) | (a.ruled != b.ruled)


def equal(a: Stable, b: Stable):
    return ~jnp.any(differences(a, b), axis=(-2, -1))


def compatible_with(a: Stable, b: Stable):
    """Reference ``CompatibleWith`` (LifeStable.hpp:1468-1479)."""
    bad = (a.ruled & ~b.ruled) != 0
    bad |= ~a.unknown & ~b.unknown & (a.state ^ b.state)
    return ~jnp.any(bad, axis=(-2, -1))


def compatible_with_state(a: Stable, desired_state):
    """Reference LifeStable.hpp:1461-1466."""
    d = make(state=desired_state, batch=a.batch_shape)
    d = stabilise_options(d).stable
    return compatible_with(a, d)


# ---------------------------------------------------------------------------
# Propagation kernels
# ---------------------------------------------------------------------------


def synchronise_state_known(st: Stable):
    """Reconcile the option planes with state/unknown (reference
    ``SynchroniseStateKnown``, LifeStable.hpp:526-556)."""
    known_on = ~st.unknown & st.state
    known_off = ~st.unknown & ~st.state
    ruled = st.ruled
    maybe_dead_before = (ruled & opt.DEAD_MASK) != opt.DEAD_MASK
    maybe_live_before = (ruled & opt.LIVE_MASK) != opt.LIVE_MASK
    changes = (maybe_dead_before & known_on) | (maybe_live_before & known_off)

    ruled = jnp.where(known_on, ruled | jnp.uint8(opt.DEAD_MASK), ruled)
    ruled = jnp.where(known_off, ruled | jnp.uint8(opt.LIVE_MASK), ruled)

    maybe_dead = (ruled & opt.DEAD_MASK) != opt.DEAD_MASK
    maybe_live = (ruled & opt.LIVE_MASK) != opt.LIVE_MASK
    abort = jnp.any(~maybe_live & ~maybe_dead, axis=(-2, -1))

    forced_on = maybe_live & ~maybe_dead
    changes |= ~st.state & forced_on
    state = st.state | forced_on

    still_unknown = maybe_live & maybe_dead
    changes |= st.unknown & ~still_unknown
    unknown = st.unknown & still_unknown

    return PropagateResult(
        Stable(state, unknown, ruled), ~abort, jnp.any(changes, axis=(-2, -1))
    )


def update_options(st: Stable):
    """Prune per-cell options from ON / unknown counts (reference
    ``UpdateOptions``, LifeStable.hpp:558-615, netlist stable_count)."""
    on9 = count9(st.state)
    unk9 = count9(st.unknown)
    add, abort_cells = rules_vec.update_bits(center_code(st), on9, unk9)
    abort = jnp.any(abort_cells, axis=(-2, -1))
    changed = jnp.any((add & ~st.ruled) != 0, axis=(-2, -1))
    return PropagateResult(
        st._replace(ruled=st.ruled | add), ~abort, changed
    )


def signal_neighbours(st: Stable):
    """Broadcast forced values to unknown neighbours (reference
    ``SignalNeighbours``, LifeStable.hpp:617-675, netlist stable_signal)."""
    on9 = count9(st.state)
    m9 = count9(st.state | st.unknown)
    bits = rules_vec.signal_bits(center_code(st), st.ruled, on9, m9)
    sig_on = (bits & 1) != 0
    sig_off = (bits & 2) != 0
    cen_on = (bits & 4) != 0
    cen_off = (bits & 8) != 0

    off_zoi = zoi_hollow_dense(sig_off) | cen_off
    on_zoi = zoi_hollow_dense(sig_on) | cen_on

    abort = jnp.any(off_zoi & on_zoi & st.unknown, axis=(-2, -1))
    changes = jnp.any((off_zoi | on_zoi) & st.unknown, axis=(-2, -1))

    out = set_off(st, off_zoi & st.unknown)
    out = set_on(out, on_zoi & out.unknown)
    return PropagateResult(out, ~abort, changes)


def propagate_simple_step(st: Stable):
    """Cheap state/unknown-only rule (reference ``PropagateSimpleStep``,
    LifeStable.hpp:414-503, netlist stable_simple)."""
    on9 = count9(st.state)
    unk9 = count9(st.unknown)
    bits = rules_vec.simple_bits(center_code(st), on9, unk9)
    new_off = ((bits & 1) != 0) & st.unknown
    new_on = ((bits & 2) != 0) & st.unknown
    sig_off = (bits & 4) != 0
    sig_on = (bits & 8) != 0
    abort = jnp.any((bits & 16) != 0, axis=(-2, -1))

    state = st.state | new_on
    unknown = st.unknown & ~new_on & ~new_off

    off_zoi = zoi_dense(sig_off)
    on_zoi = zoi_dense(sig_on)
    state = state | (on_zoi & unknown)
    unknown = unknown & ~off_zoi & ~on_zoi
    abort |= jnp.any(off_zoi & on_zoi & (st.unknown & ~new_on & ~new_off),
                     axis=(-2, -1))

    changed = jnp.any(unknown != st.unknown, axis=(-2, -1))
    return PropagateResult(Stable(state, unknown, st.ruled), ~abort, changed)


def _masked(old: Stable, new: Stable, active):
    """Apply ``new`` only on active boards (freeze finished/inconsistent)."""
    a = active[..., None, None]
    return Stable(
        jnp.where(a, new.state, old.state),
        jnp.where(a, new.unknown, old.unknown),
        jnp.where(a, new.ruled, old.ruled),
    )


def _fixpoint(step_fn, st: Stable, max_iters=256):
    """Run ``step_fn`` per board until no active board changes (reference
    fixpoint loops, e.g. LifeStable.hpp:718-729), with per-board masks."""
    batch = st.batch_shape
    consistent0 = jnp.ones(batch, dtype=bool)
    changed_ever0 = jnp.zeros(batch, dtype=bool)
    active0 = jnp.ones(batch, dtype=bool)

    def cond(carry):
        _, _, _, active, it = carry
        return jnp.any(active) & (it < max_iters)

    def body(carry):
        cur, consistent, changed_ever, active, it = carry
        res = step_fn(cur)
        nxt = _masked(cur, res.stable, active & res.consistent)
        consistent = consistent & (~active | res.consistent)
        changed_ever = changed_ever | (active & res.changed)
        active = active & res.consistent & res.changed
        return nxt, consistent, changed_ever, active, it + 1

    out, consistent, changed_ever, _, _ = jax.lax.while_loop(
        cond, body, (st, consistent0, changed_ever0, active0, jnp.int32(0))
    )
    return PropagateResult(out, consistent, changed_ever)


def propagate_step(st: Stable):
    """One full propagation pass (reference ``PropagateStep``,
    LifeStable.hpp:695-716)."""
    r1 = synchronise_state_known(st)
    r2 = update_options(r1.stable)
    r3 = signal_neighbours(r2.stable)
    consistent = r1.consistent & r2.consistent & r3.consistent
    changed = r1.changed | r2.changed | r3.changed
    return PropagateResult(r3.stable, consistent, changed)


@jax.jit
def propagate(st: Stable):
    """Fixpoint of propagate_step (reference ``Propagate``,
    LifeStable.hpp:718-729)."""
    return _fixpoint(propagate_step, st)


@jax.jit
def stabilise_options(st: Stable):
    """Fixpoint of synchronise+update (reference ``StabiliseOptions``,
    LifeStable.hpp:677-693)."""

    def step(cur):
        r1 = synchronise_state_known(cur)
        r2 = update_options(r1.stable)
        return PropagateResult(
            r2.stable, r1.consistent & r2.consistent, r1.changed | r2.changed
        )

    return _fixpoint(step, st)


@jax.jit
def propagate_simple(st: Stable):
    """Fixpoint of the simple rule, then options stabilisation (reference
    ``PropagateSimple``, LifeStable.hpp:505-524)."""
    r = _fixpoint(propagate_simple_step, st)
    r2 = stabilise_options(r.stable)
    return PropagateResult(
        r2.stable, r.consistent & r2.consistent, r.changed
    )


def perturbed_unknowns(st: Stable):
    """Unknown cells with any option already ruled out (reference
    ``PerturbedUnknowns``, LifeStable.hpp:154-157)."""
    return (st.ruled != 0) & st.unknown


def vulnerable(st: Stable):
    """Branch-point heuristic mask (reference ``Vulnerable``,
    LifeStable.hpp:366-412, netlist stable_vulnerable)."""
    on9 = count9(st.state)
    unk9 = count9(st.unknown)
    bits = rules_vec.vulnerable_bits(center_code(st), st.ruled, on9, unk9)
    v_on = (bits & 1) != 0
    v_off = (bits & 2) != 0
    vc_on = (bits & 4) != 0
    vc_off = (bits & 8) != 0
    on = zoi_hollow_dense(v_on) | vc_on
    off = zoi_hollow_dense(v_off) | vc_off
    return on & off


# ---------------------------------------------------------------------------
# Lookahead (reference LifeStable.hpp:1251-1338)
# ---------------------------------------------------------------------------


def test_cells(st: Stable, cell_mask):
    """Try ON and OFF for one cell per board (dense one-hot ``cell_mask``),
    propagate each, keep the forced branch or the join (reference
    ``TestUnknown``, LifeStable.hpp:1251-1284, using full propagation as in
    the commented-out whole-board variant at :1286-1319)."""
    on_r = propagate(set_on(st, cell_mask))
    off_r = propagate(set_off(st, cell_mask))

    both = on_r.consistent & off_r.consistent
    only_on = on_r.consistent & ~off_r.consistent
    only_off = ~on_r.consistent & off_r.consistent
    neither = ~on_r.consistent & ~off_r.consistent

    joined = join(on_r.stable, off_r.stable)

    def pick(sel_on, sel_off, sel_join, a, b, c, orig):
        m_on = sel_on[..., None, None]
        m_off = sel_off[..., None, None]
        m_j = sel_join[..., None, None]
        return jnp.where(m_on, a, jnp.where(m_off, b, jnp.where(m_j, c, orig)))

    out = Stable(
        pick(only_on, only_off, both, on_r.stable.state, off_r.stable.state,
             joined.state, st.state),
        pick(only_on, only_off, both, on_r.stable.unknown, off_r.stable.unknown,
             joined.unknown, st.unknown),
        pick(only_on, only_off, both, on_r.stable.ruled, off_r.stable.ruled,
             joined.ruled, st.ruled),
    )
    changed = only_on | only_off | (both & jnp.any(differences(joined, st), axis=(-2, -1)))
    return PropagateResult(out, ~neither, changed)


def _first_cell_mask(dense_mask):
    """One-hot [..., 64, 64] of the lexicographically first set cell per
    board (all-zero when the mask is empty)."""
    flat = dense_mask.reshape(*dense_mask.shape[:-2], N * N)
    idx = jnp.argmax(flat, axis=-1)
    onehot = jax.nn.one_hot(idx, N * N, dtype=bool).reshape(dense_mask.shape)
    return onehot & dense_mask


def propagate_and_test(st: Stable, max_cells=16):
    """Alternate full propagation with lookahead on vulnerable cells until
    nothing changes (reference ``PropagateAndTest``, LifeStable.hpp:163-184;
    the reference tests every cell of Vulnerable().ZOI(), here a bounded
    number of cells per board per round, batched)."""
    res = propagate(st)
    consistent = res.consistent
    changed_ever = res.changed
    cur = res.stable

    def cond(carry):
        cur, consistent, changed_ever, active, rounds = carry
        return jnp.any(active) & (rounds < max_cells)

    def body(carry):
        cur, consistent, changed_ever, active, rounds = carry
        candidates = vulnerable(cur) & cur.unknown
        cell = _first_cell_mask(candidates)
        has_cell = jnp.any(cell, axis=(-2, -1))
        res = test_cells(cur, cell & active[..., None, None])
        nxt = _masked(cur, res.stable, active & has_cell & res.consistent)
        consistent = consistent & (~active | res.consistent)
        changed_now = active & has_cell & res.changed
        changed_ever = changed_ever | changed_now
        active = active & res.consistent & changed_now
        return nxt, consistent, changed_ever, active, rounds + 1

    active0 = consistent & jnp.ones(st.batch_shape, bool)
    out, consistent, changed_ever, _, _ = jax.lax.while_loop(
        cond, body,
        (cur, consistent, changed_ever, active0, jnp.int32(0)),
    )
    return PropagateResult(out, consistent, changed_ever)


# ---------------------------------------------------------------------------
# I/O (reference LifeStable.hpp:196-202, :1481-1487)
# ---------------------------------------------------------------------------


def to_rle(st: Stable):
    """LifeBellman RLE: 'C' = ON, 'E' = unknown, '.' = OFF (reference
    LifeStable.hpp:1481-1487).  Single board only."""
    import numpy as np

    from ..core import rle as rle_mod

    s = np.asarray(st.state)
    u = np.asarray(st.unknown)
    table = np.array([".", "A", "E", "C"])
    idx = s.astype(int) + ((s | u).astype(int) << 1)

    return rle_mod.write_rle_planes(lambda x, y: table[idx[x, y]])


def to_rle_with_header(st: Stable):
    return "x = 0, y = 0, rule = LifeBellman\n" + to_rle(st)
