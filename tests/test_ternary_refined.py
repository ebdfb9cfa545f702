"""Options-refined ternary stepping (reference
bitslicing/unknown_step_refined.py:51-85 semantics).

Two layers of checking, mirroring the strategy used for the other
stable-solver circuits:

1. exhaustive per-cell equivalence of the packed circuit against an
   independently written scalar spec over the FULL input grid (all option
   masks x center states x count combinations), with counts injected
   directly as nibble planes;
2. end-to-end soundness on a real board: every brute-force completion of
   the stable background must step inside the refined result's bounds,
   and "stable unknown" guarantees must hold in every completion.
"""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from lifeapi_tpu.core import board, rle
from lifeapi_tpu.core.step import step as life_step
from lifeapi_tpu.stable import bitplane as BP
from lifeapi_tpu.stable import nibble as nb
from lifeapi_tpu.stable import options as opt

N = 64
OPTS = ((2, True), (3, True), (0, False), (1, False), (2, False),
        (4, False), (5, False), (6, False))


def spec_refined(ruled_mask, cur, a_cur, a_stab, u_stab):
    """Scalar spec: enumerate achievable stable options, step each
    scenario, aggregate — written directly from the semantics (stable
    unknowns sit at their stable values, so option count n contributes
    n - a_stab current ONs)."""
    possible = [i for i in range(8) if not (ruled_mask >> i) & 1]
    maybe_live = any(OPTS[i][1] for i in possible)
    maybe_dead = any(not OPTS[i][1] for i in possible)
    m_on = m_off = m_unst = False
    any_valid = False
    for i in possible:
        cnt, live = OPTS[i]
        if not (a_stab <= cnt <= a_stab + u_stab):
            continue
        any_valid = True
        c = cnt - a_stab + a_cur
        center_on = live if cur == opt.UNKNOWN else (cur == opt.ON)
        stepped_on = (c in (2, 3)) if center_on else (c == 3)
        m_on |= stepped_on
        m_off |= not stepped_on
        m_unst |= stepped_on != live
    keep_unknown = (cur == opt.UNKNOWN) and maybe_live and maybe_dead
    inconsistent = not any_valid
    next_unknown = keep_unknown or (m_on and m_off) or inconsistent
    next_on = m_on and not m_off and not next_unknown
    unstable = (keep_unknown and m_unst) or inconsistent
    return next_on, next_unknown, unstable


def test_refined_circuit_exhaustive():
    """Every (ruled mask, center, a_stab, u_stab, a_cur) combination in
    one batched circuit evaluation, vs the scalar spec."""
    cases = []
    for ruled_mask in range(256):
        for cur in (opt.OFF, opt.ON, opt.UNKNOWN):
            for a_stab in range(9):
                for u_stab in range(9 - a_stab):
                    for a_cur in range(9):
                        cases.append((ruled_mask, cur, a_cur, a_stab, u_stab))
    arr = np.array(cases, dtype=np.int32)
    n = len(arr)
    cells = N * N
    nboards = -(-n // cells)
    pad = nboards * cells - n
    arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
    rm, cur, a_cur, a_stab, u_stab = (
        arr[:, i].reshape(nboards, N, N) for i in range(5)
    )

    cur_on = board.from_dense(jnp.asarray(cur == opt.ON))
    cur_unk = board.from_dense(jnp.asarray(cur == opt.UNKNOWN))
    ruled = tuple(
        board.from_dense(jnp.asarray((rm >> i) & 1 == 1)) for i in range(8)
    )
    A_cur = nb.encode(jnp.asarray(a_cur))
    A_stab = nb.encode(jnp.asarray(a_stab))
    U_stab = nb.encode(jnp.asarray(u_stab))

    got_on, got_unk, got_unst = BP.refined_step_circuit(
        cur_on, cur_unk, ruled, A_cur, A_stab, U_stab
    )
    got_on = np.asarray(board.to_dense(got_on)).reshape(-1)[:n]
    got_unk = np.asarray(board.to_dense(got_unk)).reshape(-1)[:n]
    got_unst = np.asarray(board.to_dense(got_unst)).reshape(-1)[:n]

    exp = np.array([spec_refined(*c) for c in cases], dtype=bool)
    assert (got_on == exp[:, 0]).all()
    assert (got_unk == exp[:, 1]).all()
    assert (got_unst == exp[:, 2]).all()


def _completions(state_d, unknown_d):
    """All still-life completions of a dense partial board (assign every
    unknown cell, keep assignments that are fixpoints of the Life step)."""
    cells = list(zip(*np.nonzero(unknown_d)))
    out = []
    for bits in itertools.product((False, True), repeat=len(cells)):
        full = state_d.copy()
        for (x, y), b in zip(cells, bits):
            full[x, y] = b
        p = board.from_dense(jnp.asarray(full))
        if bool(board.equal(life_step(p), p)):
            out.append(full)
    return out


def test_refined_step_sound_on_completions():
    """Eater with 4 hidden cells + an active blinker: for EVERY still-life
    completion, the exact step of the completed current board must lie
    within the refined step's three-state result, and every unknown cell
    NOT flagged unstable must really be stable in every completion."""
    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(22, 20), (23, 20), (23, 21), (21, 23)])
    state = eater & ~hide
    # active blinker two cells clear of the eater's bounding box
    blinker = board.from_cells([(27, 26), (27, 27), (27, 28)])

    state_d = np.asarray(board.to_dense(state))
    unknown_d = np.asarray(board.to_dense(hide))
    comps = _completions(state_d, unknown_d)
    assert len(comps) >= 1  # the eater itself at minimum

    # stable knowledge: propagate the partial board's option planes
    bst = BP.make(state=state, unknown=hide)
    res = BP.propagate(BP.BitStable(bst.state[None], bst.unknown[None],
                                    tuple(r[None] for r in bst.ruled)))
    assert bool(res.consistent[0])
    stable = BP.BitStable(res.stable.state[0], res.stable.unknown[0],
                          tuple(r[0] for r in res.stable.ruled))

    cur_state = stable.state | blinker
    cur_unknown = stable.unknown
    nxt_on, nxt_unk, unstable = BP.step_ternary_refined(
        cur_state, cur_unknown, stable
    )
    nxt_on_d = np.asarray(board.to_dense(nxt_on))
    nxt_unk_d = np.asarray(board.to_dense(nxt_unk))
    unstable_d = np.asarray(board.to_dense(unstable))
    unk0_d = np.asarray(board.to_dense(cur_unknown))
    blink_d = np.asarray(board.to_dense(blinker))

    # refined must beat the naive interval step (strictly fewer or equal
    # unknowns) — the whole point of using the stable options
    naive_on, naive_unk = BP.step_ternary_packed(cur_state, cur_unknown,
                                                 naive=True)
    naive_unk_d = np.asarray(board.to_dense(naive_unk))
    assert (nxt_unk_d <= naive_unk_d).all()

    for full in comps:
        # (cells propagate forced are agreed on by every still-life
        # completion — propagation is sound — so cur_full below is
        # consistent with `full` on them)
        cur_full = (np.asarray(board.to_dense(cur_state)) & ~unk0_d) | (
            full & unk0_d
        )
        stepped = np.asarray(
            board.to_dense(life_step(board.from_dense(jnp.asarray(cur_full))))
        )
        known = ~nxt_unk_d
        # known-next cells must match the exact step of every completion
        assert (stepped[known] == nxt_on_d[known]).all()
        # unknown cells not flagged unstable must be stable in this
        # completion (next value == stable value)
        guaranteed = unk0_d & ~unstable_d
        assert (stepped[guaranteed] == full[guaranteed]).all()


def test_refined_equals_exact_when_fully_known():
    """No unknowns anywhere: the refined step must equal the exact step."""
    rng = np.random.default_rng(7)
    d = rng.random((4, N, N)) < 0.3
    cur = board.from_dense(jnp.asarray(d))
    none = jnp.zeros_like(cur)
    # stable background: all cells known OFF (empty still life), current
    # state is an arbitrary active pattern on top of it
    stable = BP.make(state=jnp.broadcast_to(board.empty(), cur.shape),
                     unknown=jnp.broadcast_to(board.empty(), cur.shape))
    nxt_on, nxt_unk, unstable = BP.step_ternary_refined(cur, none, stable)
    assert bool(board.is_empty(nxt_unk).all())
    assert bool(board.is_empty(unstable).all())
    exact = life_step(cur)
    assert bool(jnp.all(board.equal(nxt_on, exact)))


def test_reachability_bounds_sound_over_completions():
    """mpc.reachability: for EVERY completion of the stable background,
    the exact Hamming cost at the horizon must lie within the interval
    rollout's [lower, upper] bounds."""
    from lifeapi_tpu.mpc import reachability as RC
    from lifeapi_tpu.target import LifeTarget, hamming_cost

    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(22, 20), (23, 20)])
    state = eater & ~hide
    bst = BP.make(state=state, unknown=hide)
    res = BP.propagate(BP.BitStable(bst.state[None], bst.unknown[None],
                                    tuple(r[None] for r in bst.ruled)))
    assert bool(res.consistent[0])
    stable = BP.BitStable(res.stable.state[0], res.stable.unknown[0],
                          tuple(r[0] for r in res.stable.ruled))

    blinker = board.from_cells([(30, 30), (30, 31), (30, 32)])
    target = LifeTarget.from_state(eater)
    T = 4

    cur = stable.state | blinker
    on, unk, _ = RC.refined_rollout(cur, stable.unknown, stable, T)
    lower, upper = RC.hamming_bounds(on, unk, target)

    state_d = np.asarray(board.to_dense(state))
    unk_d = np.asarray(board.to_dense(stable.unknown))
    comps = _completions(
        np.asarray(board.to_dense(stable.state)), unk_d
    )
    assert len(comps) >= 1
    for full in comps:
        cur_full = board.from_dense(jnp.asarray(
            (np.asarray(board.to_dense(cur)) & ~unk_d) | (full & unk_d)
        ))
        b = cur_full
        for _ in range(T):
            b = life_step(b)
        cost = int(hamming_cost(b, target))
        assert int(lower) <= cost <= int(upper), (int(lower), cost, int(upper))


def test_prune_candidates_keeps_reachable():
    """prune_candidates must keep a candidate that provably recovers the
    target and prune one whose wanted cells are certainly destroyed."""
    from lifeapi_tpu.mpc import reachability as RC
    from lifeapi_tpu.target import LifeTarget

    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(22, 20)])
    state = eater & ~hide
    bst = BP.make(state=state, unknown=hide)
    res = BP.propagate(BP.BitStable(bst.state[None], bst.unknown[None],
                                    tuple(r[None] for r in bst.ruled)))
    stable = BP.BitStable(res.stable.state[0], res.stable.unknown[0],
                          tuple(r[0] for r in res.stable.ruled))
    target = LifeTarget.from_state(eater)

    quiet = stable.state  # nothing active: eater certainly survives
    # a block slammed into the eater's face destroys it in every
    # completion
    smash = stable.state | board.from_cells(
        [(20, 21), (20, 22), (21, 21), (21, 22)]
    )
    initials = jnp.stack([quiet, smash])
    keep, lower, upper = RC.prune_candidates(
        initials, stable, target, steps=4, max_cost=0
    )
    assert bool(keep[0]), (int(lower[0]), int(upper[0]))
    assert int(upper[0]) == 0  # certainly recovers
    assert not bool(keep[1])  # provably cannot have cost 0


# ---------------------------------------------------------------------------
# Tracked (sound multi-step) refined circuit + unknown_keep semantics
# ---------------------------------------------------------------------------

# center classes: known-ON/OFF x tracking/free, tracking-unknown, free-unknown
CLS_KON_T, CLS_KON_F, CLS_KOFF_T, CLS_KOFF_F, CLS_TU, CLS_FU = range(6)


def _spec_tracked_vec(rm, cls, a_cur, tn, f, a_stab, u_stab):
    """Vectorized enumerative spec of the tracked circuit: for every case,
    enumerate the tracking-sum s_t and free-sum fc CONTRIBUTIONS as
    integers (no interval closed forms — independent of the circuit's
    derivation) and aggregate maybe_on/maybe_off/violate/any_valid."""
    m_on = np.zeros(rm.shape, bool)
    m_off = np.zeros(rm.shape, bool)
    violate = np.zeros(rm.shape, bool)
    any_valid = np.zeros(rm.shape, bool)
    tracking = (cls == CLS_KON_T) | (cls == CLS_KOFF_T) | (cls == CLS_TU)
    for i, (cnt, live) in enumerate(OPTS):
        valid = ((rm >> i) & 1 == 0) & (a_stab <= cnt) & (cnt <= a_stab + u_stab)
        # tracked known centers admit only matching-polarity options
        if live:
            valid &= ~(cls == CLS_KOFF_T)
        else:
            valid &= ~(cls == CLS_KON_T)
        any_valid |= valid
        r = cnt - a_stab
        lo = np.maximum(0, r - (u_stab - tn))
        up = np.minimum(r, tn)
        for s_t in range(9):
            st_ok = valid & (lo <= s_t) & (s_t <= up)
            if not st_ok.any():
                continue
            for fc in range(9):
                ok = st_ok & (fc <= f)
                if not ok.any():
                    continue
                c = a_cur + s_t + fc
                nxt_on_center_on = (c == 3) | (c == 2)
                nxt_on_center_off = c == 3
                # center hypotheses per class
                h_on = (cls == CLS_KON_T) | (cls == CLS_KON_F) | (
                    (cls == CLS_TU) & live) | (cls == CLS_FU)
                h_off = (cls == CLS_KOFF_T) | (cls == CLS_KOFF_F) | (
                    (cls == CLS_TU) & (not live)) | (cls == CLS_FU)
                m_on |= ok & ((h_on & nxt_on_center_on)
                              | (h_off & nxt_on_center_off))
                m_off |= ok & ((h_on & ~nxt_on_center_on)
                               | (h_off & ~nxt_on_center_off))
                # keep: stepping FROM the option's center must reproduce it
                stays = nxt_on_center_on if live else ~nxt_on_center_off
                violate |= ok & ~stays
    inconsistent = ~any_valid
    next_unknown = (m_on & m_off) | inconsistent
    next_on = m_on & ~m_off
    keep = tracking & any_valid & ~violate
    return next_on, next_unknown, keep


def test_tracked_circuit_exhaustive_vs_enumerative_spec():
    """Every feasible (class, a_cur, tn, f, a_stab, u_stab) count
    combination x a structured sample of ruled masks, packed circuit vs
    the enumerative spec."""
    rng = np.random.default_rng(0)
    masks = sorted({0, 0xFF} | {1 << i for i in range(8)}
                   | {0xFF ^ (1 << i) for i in range(8)}
                   | {int(x) for x in rng.integers(0, 256, 24)})
    counts = []
    for a_stab in range(9):
        for u_stab in range(9 - a_stab):
            for tn in range(u_stab + 1):
                for a_cur in range(9 - tn):
                    for f in range(9 - tn - a_cur):
                        counts.append((a_cur, tn, f, a_stab, u_stab))
    counts = np.array(counts, np.int32)
    cases = []
    for rm in masks:
        for cls in range(6):
            block = np.empty((len(counts), 7), np.int32)
            block[:, 0] = rm
            block[:, 1] = cls
            block[:, 2:] = counts
            cases.append(block)
    arr = np.concatenate(cases)
    n = len(arr)
    cells = N * N
    nboards = -(-n // cells)
    arr = np.concatenate([arr, np.repeat(arr[-1:], nboards * cells - n,
                                         axis=0)])
    rm, cls, a_cur, tn, f, a_stab, u_stab = (
        arr[:, i].reshape(nboards, N, N) for i in range(7)
    )

    cur_on = board.from_dense(jnp.asarray((cls == CLS_KON_T)
                                          | (cls == CLS_KON_F)))
    track_unk = board.from_dense(jnp.asarray(cls == CLS_TU))
    free_unk = board.from_dense(jnp.asarray(cls == CLS_FU))
    tracking = board.from_dense(jnp.asarray(
        (cls == CLS_KON_T) | (cls == CLS_KOFF_T) | (cls == CLS_TU)))
    ruled = tuple(
        board.from_dense(jnp.asarray((rm >> i) & 1 == 1)) for i in range(8)
    )
    got = BP.refined_step_tracked_circuit(
        cur_on, track_unk, free_unk, tracking, ruled,
        nb.encode(jnp.asarray(a_cur)), nb.encode(jnp.asarray(tn)),
        nb.encode(jnp.asarray(f)), nb.encode(jnp.asarray(a_stab)),
        nb.encode(jnp.asarray(u_stab)),
    )
    got = [np.asarray(board.to_dense(g)).reshape(-1)[:n] for g in got]

    flat = [x.reshape(-1)[:n] for x in (rm, cls, a_cur, tn, f, a_stab,
                                        u_stab)]
    exp_on, exp_unk, exp_keep = _spec_tracked_vec(*flat)
    assert (got[0] == exp_on).all()
    assert (got[1] == exp_unk).all()
    assert (got[2] == exp_keep).all()


def test_tracked_circuit_degenerates_to_refined():
    """With every unknown tracking (tn == u_stab, f == 0) the tracked
    step's known-cell claims must AGREE with the plain refined circuit
    wherever the plain circuit claims a known value (the tracked form may
    be strictly tighter on stable-unknown centers, never looser)."""
    rng = np.random.default_rng(1)
    for _ in range(3):
        eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
        hide = board.from_cells([(22, 20), (21, 21)])
        state = eater & ~hide
        bst = BP.make(state=state, unknown=hide)
        res = BP.propagate(BP.BitStable(
            bst.state[None], bst.unknown[None],
            tuple(r[None] for r in bst.ruled)))
        stable = BP.BitStable(res.stable.state[0], res.stable.unknown[0],
                              tuple(r[0] for r in res.stable.ruled))
        x, y = int(rng.integers(15, 27)), int(rng.integers(15, 27))
        act = board.from_cells([(x, y)]) & ~stable.state & ~stable.unknown
        cur = stable.state | act
        r_on, r_unk, _ = BP.step_ternary_refined(cur, stable.unknown, stable)
        tr0 = BP.initial_tracking(cur, stable.unknown, stable)
        t_on, t_unk, _ = BP.step_ternary_tracked(cur, stable.unknown, tr0,
                                                 stable)
        # wherever refined claims known, tracked claims the same value
        known_r = ~r_unk
        assert bool(board.is_empty(known_r & t_unk))
        assert bool(board.is_empty(known_r & (r_on ^ t_on)))


def test_tracked_rollout_sound_over_completions():
    """Multi-step brute-force soundness (the round-3 fix): eater-based
    instances with hidden + boundary unknowns and an active cell; every
    claimed-known cell must match the exact trajectory of EVERY
    completion at every step.  (The untracked rollout fails this on ~57%
    of these instances.)"""
    rng = np.random.default_rng(3)
    eater_d = np.asarray(board.to_dense(
        board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)))
    cells = np.argwhere(eater_d)
    nbr = sum(np.roll(np.roll(eater_d, dx, 0), dy, 1)
              for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    bnd = np.argwhere(~eater_d & (nbr > 0))
    from lifeapi_tpu.stable import propagate as P

    tested = 0
    for trial in range(80):
        if tested >= 12:
            break
        hide = np.zeros((N, N), bool)
        for j in rng.choice(len(cells), size=2, replace=False):
            hide[tuple(cells[j])] = True
        unk = hide.copy()
        for j in rng.choice(len(bnd), size=3, replace=False):
            unk[tuple(bnd[j])] = True
        st = P.make(state=jnp.asarray(eater_d & ~hide),
                    unknown=jnp.asarray(unk))
        res = P.propagate(st)
        if not bool(np.asarray(res.consistent)):
            continue
        bst = BP.from_dense_stable(res.stable)
        s0 = np.asarray(board.to_dense(bst.state))
        u0 = np.asarray(board.to_dense(bst.unknown))
        if not 0 < u0.sum() <= 7:
            continue
        act = np.zeros((N, N), bool)
        act[18 + int(rng.integers(0, 8)), 18 + int(rng.integers(0, 8))] = True
        act &= ~s0 & ~u0
        if not act.any():
            continue
        cs = board.from_dense(jnp.asarray(s0 | act))
        cu = bst.unknown
        tr = BP.initial_tracking(cs, cu, bst)
        claims = []
        for _ in range(4):
            cs, cu, tr = BP.step_ternary_tracked(cs, cu, tr, bst)
            claims.append((np.asarray(board.to_dense(cs)),
                           np.asarray(board.to_dense(cu))))
        comps = _completions(s0, u0)
        if not comps:
            continue
        tested += 1
        for full in comps:
            d = board.from_dense(jnp.asarray(full | act))
            for t, (on, un) in enumerate(claims):
                d = life_step(d)
                dd = np.asarray(board.to_dense(d))
                assert not ((~un) & (on != dd)).any(), (trial, t)
    assert tested >= 8


def test_keep_stable_covers_quiescent_background():
    """unknown_keep sanity: with no activity, every cell of a propagated
    stable background provably stays at its stable value."""
    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(22, 20), (23, 20)])
    bst0 = BP.make(state=eater & ~hide, unknown=hide)
    res = BP.propagate(BP.BitStable(
        bst0.state[None], bst0.unknown[None],
        tuple(r[None] for r in bst0.ruled)))
    assert bool(res.consistent[0])
    stable = BP.BitStable(res.stable.state[0], res.stable.unknown[0],
                          tuple(r[0] for r in res.stable.ruled))
    keep = BP.keep_stable(stable.state, stable.unknown, stable)
    # every populated / unknown cell (and its whole ZOI) is kept
    region = board.zoi(stable.state | stable.unknown)
    assert bool(board.is_empty(region & ~keep))
