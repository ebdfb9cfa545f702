import numpy as np
import jax.numpy as jnp

from lifeapi_tpu.core import board, step
from lifeapi_tpu.stable import complete as C
from lifeapi_tpu.stable import host as H
from lifeapi_tpu.stable import options as opt
from lifeapi_tpu.stable import propagate as P
from lifeapi_tpu.stable import ternary
from oracle import life_step_dense, random_dense

N = 64
EATER = [(0, 0), (1, 0), (0, 1), (2, 1), (2, 2), (2, 3), (3, 3)]
BLOCK = [(0, 0), (0, 1), (1, 0), (1, 1)]


def dense(cells, off=(20, 20)):
    d = np.zeros((N, N), bool)
    for x, y in cells:
        d[x + off[0], y + off[1]] = True
    return d


def is_still_life(d):
    return (life_step_dense(d) == d).all()


def test_eater_is_still_life():
    assert is_still_life(dense(EATER))


def test_propagate_consistent_on_still_life_with_unknowns(rng):
    truth = dense(EATER)
    hide = (rng.random((N, N)) < 0.05) & H.zoi(truth)
    st = P.make(
        state=jnp.asarray(truth & ~hide),
        unknown=jnp.asarray(hide | ~H.zoi(H.zoi(truth))),
    )
    res = P.propagate(st)
    assert bool(res.consistent)
    out = res.stable
    # soundness: no cell forced against the truth
    forced_on = np.asarray(out.state & ~out.unknown)
    forced_off = np.asarray(~out.state & ~out.unknown)
    # restrict to the solvable region: cells we started knowing or hid
    assert not (forced_on & ~truth & ~np.asarray(st.unknown)).any()
    assert not (forced_off & truth).any()


def test_propagate_detects_contradiction():
    # a lone ON cell with all neighbours known OFF can't be stable
    state = np.zeros((N, N), bool)
    state[30, 30] = True
    st = P.make(state=jnp.asarray(state), unknown=jnp.zeros((N, N), bool))
    res = P.propagate(st)
    assert not bool(res.consistent)


def test_propagate_batch_mixes_consistent_and_not():
    truth = dense(EATER)
    bad = np.zeros((N, N), bool)
    bad[30, 30] = True
    states = jnp.asarray(np.stack([truth, bad]))
    unknowns = jnp.zeros((2, N, N), bool)
    res = P.propagate(P.make(state=states, unknown=unknowns))
    assert bool(res.consistent[0])
    assert not bool(res.consistent[1])


def test_host_device_propagate_agree(rng):
    for _ in range(5):
        truth = dense(EATER, off=(rng.integers(5, 40), rng.integers(5, 40)))
        hide = (rng.random((N, N)) < 0.5) & H.zoi(truth)
        state = truth & ~hide
        unknown = hide

        hst = H.HostStable(state, unknown)
        ok_h, _ = hst.propagate()

        res = P.propagate(P.make(state=jnp.asarray(state), unknown=jnp.asarray(unknown)))
        assert bool(res.consistent) == ok_h
        if ok_h:
            assert (np.asarray(res.stable.state) == hst.state).all()
            assert (np.asarray(res.stable.unknown) == hst.unknown).all()
            assert (np.asarray(res.stable.ruled) == hst.ruled).all()


def test_complete_stable_reconstructs_eater():
    truth = dense(EATER)
    hide = np.zeros((N, N), bool)
    hide[20, 20] = True  # eater cell (0,0)
    hide[21, 20] = True  # eater cell (1,0)
    st = H.HostStable(truth & ~hide, hide)
    result, best = C.complete_stable(st, timeout=5.0, minimise=True)
    assert result == C.CompletionResult.COMPLETED
    assert is_still_life(best)
    # known cells must be respected
    assert (best & ~hide & ~truth).sum() == 0
    assert ((truth & ~hide) & ~best).sum() == 0


def test_complete_stable_block_from_seed():
    state = np.zeros((N, N), bool)
    state[30, 30] = True
    unknown = H.zoi(H.zoi(H.zoi(state))) & ~state
    st = H.HostStable(state, unknown)
    result, best = C.complete_stable(st, timeout=10.0, minimise=True)
    assert result == C.CompletionResult.COMPLETED
    assert is_still_life(best)
    assert best[30, 30]
    assert best.sum() == 4  # minimal still life containing a cell: block


def test_complete_stable_empty_cases():
    st = H.HostStable()
    result, best = C.complete_stable(st, timeout=1.0)
    assert result == C.CompletionResult.COMPLETED
    assert best.sum() == 0


def test_test_cells_lookahead():
    # an ON cell with exactly 2 known ON neighbours, one unknown neighbour
    # elsewhere: trying both values must keep consistency info
    truth = dense(BLOCK)
    hide = np.zeros((N, N), bool)
    hide[20, 20] = True
    st = P.make(state=jnp.asarray(truth & ~hide), unknown=jnp.asarray(hide))
    res0 = P.propagate(st)
    assert bool(res0.consistent)
    cell_mask = jnp.asarray(hide)
    res = P.test_cells(res0.stable, cell_mask)
    assert bool(res.consistent)
    out = res.stable
    # block minus one cell: the hidden cell is NOT forced (the other three
    # cells could also be part of other still lifes)... but if it was
    # decided, it must agree with some completion; weak check: still
    # consistent and the three known cells unchanged
    assert bool(P.propagate(out).consistent)


def test_propagate_and_test():
    # lookahead must stay consistent on a satisfiable instance and find at
    # least as much as plain propagation
    truth = dense(EATER)
    hide = H.zoi(truth) & ~truth
    st = P.make(state=jnp.asarray(truth), unknown=jnp.asarray(hide))
    plain = P.propagate(st)
    res = P.propagate_and_test(st)
    assert bool(res.consistent)
    plain_unknowns = int(np.asarray(plain.stable.unknown).sum())
    test_unknowns = int(np.asarray(res.stable.unknown).sum())
    assert test_unknowns <= plain_unknowns
    # soundness: the eater itself remains compatible
    full_truth = P.make(state=jnp.asarray(truth), unknown=jnp.zeros((N, N), bool))
    forced_off_wrong = np.asarray(
        ~res.stable.state & ~res.stable.unknown
    ) & truth
    assert not forced_off_wrong.any()


def test_beam_matches_dfs_quality():
    truth = dense(EATER)
    hide = np.zeros((N, N), bool)
    hide[20, 20] = True
    hide[21, 20] = True
    st_host = H.HostStable(truth & ~hide, hide)
    _, best_dfs = C.complete_stable(st_host, timeout=5.0, minimise=True)

    st = P.make(
        state=jnp.asarray((truth & ~hide))[None],
        unknown=jnp.asarray(hide)[None],
    )
    res = C.complete_stable_beam(st, frontier=4, iters=16, minimise=True)
    assert res.found[0]
    assert is_still_life(res.best[0])
    assert res.best_pop[0] <= best_dfs.sum()


def test_ternary_step_no_unknowns_matches_exact(rng):
    d = random_dense(rng, p=0.4)
    s, u = ternary.step_ternary(jnp.asarray(d), jnp.zeros((N, N), bool))
    assert not np.asarray(u).any()
    assert (np.asarray(s) == life_step_dense(d)).all()


def test_ternary_step_soundness(rng):
    d = random_dense(rng, p=0.35)
    unk = random_dense(rng, p=0.08)
    s, u = ternary.step_ternary(jnp.asarray(d & ~unk), jnp.asarray(unk))
    s, u = np.asarray(s), np.asarray(u)
    # any completion of the unknowns must step inside the ternary bounds
    for _ in range(8):
        fill = random_dense(rng, p=0.5) & unk
        concrete = (d & ~unk) | fill
        nxt = life_step_dense(concrete)
        # where ternary says known, the concrete step must agree
        assert (nxt[~u] == s[~u]).all()


def test_ternary_naive_matches_reference_semantics(rng):
    d = random_dense(rng, p=0.35)
    unk = random_dense(rng, p=0.1)
    s, u = ternary.step_ternary(jnp.asarray(d & ~unk), jnp.asarray(unk), naive=True)
    # naive: unknown centers stay unknown (reference unknown_step.py:4)
    assert np.asarray(u)[unk].all()


def test_stable_rle():
    truth = dense(EATER)
    unknown = H.zoi(truth) & ~truth
    st = P.make(state=jnp.asarray(truth), unknown=jnp.asarray(unknown))
    s = P.to_rle(st)
    assert "C" in s and "E" in s
    assert P.to_rle_with_header(st).startswith("x = 0, y = 0, rule = LifeBellman")


def test_join_and_compatible():
    truth = dense(EATER)
    st1 = P.make(state=jnp.asarray(truth), unknown=jnp.zeros((N, N), bool))
    st2 = P.make(state=jnp.zeros((N, N), bool), unknown=jnp.asarray(truth))
    j = P.join(st1, st2)
    # join forgets everything they disagree on
    assert bool(jnp.all(j.unknown == (st1.state | st2.unknown)))
    assert bool(P.compatible_with(st1, st1))


def test_windowed_propagate_matches_full(rng):
    """DFS-style mutation/propagate sequences: the windowed fixpoint
    (HostStable auto-windows after the first full propagate) must agree
    exactly with a clone that is forced onto the full-board path."""
    from lifeapi_tpu.stable import host as H

    for trial in range(8):
        state = np.zeros((64, 64), bool)
        anchors = rng.integers(18, 40, size=(2, 2))
        for x, y in anchors:
            state[x, y] = True
        unknown = np.zeros((64, 64), bool)
        for x, y in anchors:
            unknown[x - 2:x + 3, y - 2:y + 3] = True
        unknown &= ~state

        a = H.HostStable(state, unknown)
        b = H.HostStable(state, unknown)
        ok_a = a.propagate()
        b._full_done = False  # never allow the window path
        ok_b = b.propagate()
        b._full_done = False
        assert ok_a == ok_b
        for _ in range(6):
            ua = np.argwhere(a.unknown)
            if len(ua) == 0 or not ok_a[0]:
                break
            cell = tuple(ua[rng.integers(0, len(ua))])
            mask = np.zeros((64, 64), bool)
            mask[cell] = True
            if rng.random() < 0.5:
                a.set_on(mask)
                b.set_on(mask)
            else:
                a.set_off(mask)
                b.set_off(mask)
            ok_a = a.propagate()
            ok_b = b.propagate()
            b._full_done = False
            assert ok_a[0] == ok_b[0], trial
            if ok_a[0]:
                assert (a.state == b.state).all()
                assert (a.unknown == b.unknown).all()
                assert (a.ruled == b.ruled).all()


def test_windowed_dfs_matches_unwindowed(rng):
    """complete_stable with the windowed propagate + windowed branch
    queries must return bit-identical results to the full-board path."""
    from lifeapi_tpu.stable import complete as C
    from lifeapi_tpu.stable import host as H

    for _ in range(3):
        k = int(rng.integers(2, 4))
        anchors = [tuple(map(int, a))
                   for a in rng.integers(18, 38, size=(k, 2))]
        state = np.zeros((64, 64), bool)
        unknown = np.zeros((64, 64), bool)
        for x, y in anchors:
            state[x, y] = True
            unknown[x - 2:x + 3, y - 2:y + 3] = True
        unknown &= ~state

        r1, b1 = C.complete_stable(H.HostStable(state, unknown),
                                   timeout=30.0, minimise=True)
        orig_qw = H.HostStable.query_window
        orig_pr = H.HostStable.propagate
        H.HostStable.query_window = lambda self: None

        def full_prop(self):
            self._full_done = False
            return orig_pr(self)

        H.HostStable.propagate = full_prop
        try:
            r2, b2 = C.complete_stable(H.HostStable(state, unknown),
                                       timeout=30.0, minimise=True)
        finally:
            H.HostStable.query_window = orig_qw
            H.HostStable.propagate = orig_pr
        assert r1 == r2
        assert (b1 == b2).all()


def test_complete_stable_strict_refuses_restricted_verdict(monkeypatch):
    """Round 5: with strict=True, an INCONSISTENT verdict held at a
    budget break while the search area was still ring-restricted must
    degrade to TIMEOUT (the reference loop's budget-artifact class);
    the default stays reference-faithful.  Deterministic via a fake
    clock that advances one second per reading."""
    import itertools

    import numpy as np

    from lifeapi_tpu.stable import complete as C
    from lifeapi_tpu.stable.host import HostStable

    # a lone ON cell whose neighbours are all known-OFF is inconsistent
    # in the FIRST ring already; the unknowns sit outside ring 1, so the
    # verdict is ring-restricted when the (fake) deadline expires
    state = np.zeros((64, 64), bool)
    state[32, 32] = True
    unknown = np.zeros((64, 64), bool)
    unknown[40:43, 40:43] = True

    class FakeTime:
        def __init__(self):
            self.c = itertools.count()

        def monotonic(self):
            return float(next(self.c))

    for strict, expected in ((False, C.CompletionResult.INCONSISTENT),
                             (True, C.CompletionResult.TIMEOUT)):
        monkeypatch.setattr(C, "time", FakeTime())
        st = HostStable(state.copy(), unknown.copy(),
                        np.zeros((64, 64), np.uint8))
        # deadline 1.5 fake-seconds: the ring-1 step's entry check reads
        # t=1 (within budget, so it runs and proves the RESTRICTED
        # instance inconsistent), the loop's break check reads t=2
        # (expired) — the exact artifact scenario
        result, _ = C.complete_stable(st, timeout=1.5, strict=strict)
        assert result == expected, (strict, result)
