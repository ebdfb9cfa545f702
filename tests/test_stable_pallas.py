"""The fused Pallas propagate must agree exactly with the jnp bit-plane
path (which agrees with the dense path, which agrees with the scalar
spec)."""

import numpy as np
import jax
import jax.numpy as jnp

from lifeapi_tpu.core import board, rle
from lifeapi_tpu.ops import stable_pallas as SP
from lifeapi_tpu.stable import bitplane as BP
from lifeapi_tpu.stable import propagate as P
from oracle import random_dense

N = 64


def _interp():
    return jax.devices()[0].platform != "tpu"


def _assert_same(a: BP.BitStable, b: BP.BitStable, mask=None):
    sel = (lambda x: np.asarray(x)) if mask is None else (
        lambda x: np.asarray(x)[mask]
    )
    assert (sel(a.state) == sel(b.state)).all()
    assert (sel(a.unknown) == sel(b.unknown)).all()
    for ra, rb in zip(a.ruled, b.ruled):
        assert (sel(ra) == sel(rb)).all()


def test_fused_step_matches_jnp_step(rng):
    for trial in range(3):
        state = random_dense(rng, p=0.15, batch=(8,))
        unknown = random_dense(rng, p=0.25, batch=(8,)) & ~state
        bst = BP.make(
            state=board.from_dense(jnp.asarray(state)),
            unknown=board.from_dense(jnp.asarray(unknown)),
        )
        # one fused step
        planes = SP._to_kernel_planes(bst)
        new_planes, changed_p, abort_p = SP.propagate_step_planes(
            planes, batch_tile=8, interpret=_interp()
        )
        got = SP._from_kernel_planes(new_planes)
        got_changed = np.asarray(jnp.any(changed_p != 0, axis=0))
        got_abort = np.asarray(jnp.any(abort_p != 0, axis=0))

        # reference: the jnp bit-plane step
        expect = BP.propagate_step(bst)
        exp_abort = ~np.asarray(expect.consistent)

        assert (got_abort == exp_abort).all()
        ok = ~got_abort & ~exp_abort
        _assert_same(got, expect.stable, mask=ok)
        # changed flags agree on consistent boards
        assert (got_changed[ok] == np.asarray(expect.changed)[ok]).all()


def test_fused_propagate_matches_jnp(rng):
    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(20, 20), (21, 20)])
    unknown = (board.zoi(eater) & ~eater) | hide
    B = 8
    bst = BP.make(
        state=jnp.broadcast_to(eater & ~hide, (B, 64, 2)),
        unknown=jnp.broadcast_to(unknown, (B, 64, 2)),
    )
    got = SP.propagate_fused(bst, batch_tile=8, interpret=_interp())
    expect = BP.propagate(bst)
    assert (np.asarray(got.consistent) == np.asarray(expect.consistent)).all()
    ok = np.asarray(got.consistent)
    _assert_same(got.stable, expect.stable, mask=ok)


def test_fused_propagate_detects_contradiction(rng):
    lone = board.from_cells([(30, 30)])
    bst = BP.make(
        state=jnp.broadcast_to(lone, (4, 64, 2)),
        unknown=jnp.zeros((4, 64, 2), jnp.uint32),
    )
    got = SP.propagate_fused(bst, batch_tile=4, interpret=_interp())
    assert not np.asarray(got.consistent).any()


def test_inkernel_fixpoint_matches_jnp(rng):
    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(20, 20), (21, 20)])
    unknown = (board.zoi(eater) & ~eater) | hide
    B = 8
    bst = BP.make(
        state=jnp.broadcast_to(eater & ~hide, (B, 64, 2)),
        unknown=jnp.broadcast_to(unknown, (B, 64, 2)),
    )
    got = SP.propagate_fused_inkernel(bst, batch_tile=8, interpret=_interp())
    expect = BP.propagate(bst)
    assert (np.asarray(got.consistent) == np.asarray(expect.consistent)).all()
    ok = np.asarray(got.consistent)
    _assert_same(got.stable, expect.stable, mask=ok)
    # inconsistency detection too
    lone = board.from_cells([(30, 30)])
    bst2 = BP.make(state=jnp.broadcast_to(lone, (4, 64, 2)),
                   unknown=jnp.zeros((4, 64, 2), jnp.uint32))
    got2 = SP.propagate_fused_inkernel(bst2, batch_tile=4, interpret=_interp())
    assert not np.asarray(got2.consistent).any()


def test_inkernel_fixpoint_random_instances(rng):
    from lifeapi_tpu.stable import host as H

    B = 8
    states, unknowns = [], []
    for i in range(B):
        truth = np.zeros((N, N), bool)
        for _ in range(5):
            x, y = rng.integers(4, 56, 2)
            truth[x:x + 2, y:y + 2] = True
        hide = (rng.random((N, N)) < 0.3) & H.zoi(truth)
        states.append(truth & ~hide)
        unknowns.append(hide | (H.zoi(H.zoi(truth)) & ~truth))
    bst = BP.make(
        state=board.from_dense(jnp.asarray(np.stack(states))),
        unknown=board.from_dense(jnp.asarray(np.stack(unknowns))),
    )
    got = SP.propagate_fused_inkernel(bst, batch_tile=8, interpret=_interp())
    expect = BP.propagate(bst)
    assert (np.asarray(got.consistent) == np.asarray(expect.consistent)).all()
    ok = np.asarray(got.consistent)
    _assert_same(got.stable, expect.stable, mask=ok)


def test_simple_phase_reaches_same_fixpoint(rng):
    """The cheap-rule phase (round-2 VERDICT #3) is a pure speed knob:
    fixpoints with and without it are identical (every simple-rule
    deduction is subsumed by the full circuit, and propagation closure is
    confluent)."""
    from lifeapi_tpu.stable import host as H

    B = 8
    states, unknowns = [], []
    for i in range(B):
        truth = np.zeros((N, N), bool)
        for _ in range(5):
            x, y = rng.integers(4, 56, 2)
            truth[x:x + 2, y:y + 2] = True
        hide = (rng.random((N, N)) < 0.3) & H.zoi(truth)
        states.append(truth & ~hide)
        unknowns.append(hide | (H.zoi(H.zoi(truth)) & ~truth))
    bst = BP.make(
        state=board.from_dense(jnp.asarray(np.stack(states))),
        unknown=board.from_dense(jnp.asarray(np.stack(unknowns))),
    )
    with_p = SP.propagate_fused_inkernel(bst, batch_tile=8,
                                         interpret=_interp(),
                                         simple_phase=True)
    without = SP.propagate_fused_inkernel(bst, batch_tile=8,
                                          interpret=_interp(),
                                          simple_phase=False)
    assert (np.asarray(with_p.consistent)
            == np.asarray(without.consistent)).all()
    ok = np.asarray(with_p.consistent)
    _assert_same(with_p.stable, without.stable, mask=ok)


def test_fused_propagate_random_instances(rng):
    from lifeapi_tpu.stable import host as H

    B = 8
    states, unknowns = [], []
    for i in range(B):
        truth = np.zeros((N, N), bool)
        for _ in range(5):
            x, y = rng.integers(4, 56, 2)
            truth[x:x + 2, y:y + 2] = True
        hide = (rng.random((N, N)) < 0.3) & H.zoi(truth)
        states.append(truth & ~hide)
        unknowns.append(hide | (H.zoi(H.zoi(truth)) & ~truth))
    bst = BP.make(
        state=board.from_dense(jnp.asarray(np.stack(states))),
        unknown=board.from_dense(jnp.asarray(np.stack(unknowns))),
    )
    got = SP.propagate_fused(bst, batch_tile=8, interpret=_interp())
    expect = BP.propagate(bst)
    assert (np.asarray(got.consistent) == np.asarray(expect.consistent)).all()
    ok = np.asarray(got.consistent)
    _assert_same(got.stable, expect.stable, mask=ok)


def test_beam_fused_matches_jnp_beam():
    """complete_stable_beam(fused=True) must find the same incumbents as
    the jnp-propagate beam (identical branch decisions, so identical
    trajectories)."""
    from lifeapi_tpu.stable import complete as C

    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(20, 20), (21, 20)])
    unknown = (board.zoi(eater) & ~eater) | hide
    st = P.make(
        state=jnp.broadcast_to(board.to_dense(eater & ~hide), (2, N, N)),
        unknown=jnp.broadcast_to(board.to_dense(unknown), (2, N, N)),
    )
    ref = C.complete_stable_beam(st, frontier=2, iters=10, minimise=True,
                                 fused=False)
    got = C.complete_stable_beam(st, frontier=2, iters=10, minimise=True,
                                 fused=True, interpret=_interp())
    assert (got.found == ref.found).all()
    assert (got.best_pop == ref.best_pop).all()
    assert (got.best == ref.best).all()


def test_beam_fused_padding_path():
    """B*F >= 128 with B not a multiple of the pad step exercises the
    lane-padding branch of the kernel-layout beam runner; results must
    still match the packed jnp runner problem-for-problem."""
    from lifeapi_tpu.stable import complete as C

    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(20, 20), (21, 20)])
    unknown = (board.zoi(eater) & ~eater) | hide
    B = 33  # pad step for F=4 is 32 -> padded to 64
    st = P.make(
        state=jnp.broadcast_to(board.to_dense(eater & ~hide), (B, N, N)),
        unknown=jnp.broadcast_to(board.to_dense(unknown), (B, N, N)),
    )
    ref = C.complete_stable_beam(st, frontier=4, iters=6, minimise=True,
                                 fused=False)
    got = C.complete_stable_beam(st, frontier=4, iters=6, minimise=True,
                                 fused=True, interpret=_interp())
    assert (got.found == ref.found).all()
    assert (got.best_pop == ref.best_pop).all()
    assert (got.best == ref.best).all()
    assert (got.proved_inconsistent == ref.proved_inconsistent).all()


def test_fused_beam_levels_match_jnp(rng):
    """propagate_fused_beam's priority masks must equal
    bitplane.branch_levels of the jnp-propagated planes (consistent
    boards)."""
    from lifeapi_tpu.stable import host as H

    B = 8
    states, unknowns = [], []
    for i in range(B):
        truth = np.zeros((N, N), bool)
        for _ in range(4):
            x, y = rng.integers(4, 56, 2)
            truth[x:x + 2, y:y + 2] = True
        hide = (rng.random((N, N)) < 0.25) & H.zoi(truth)
        states.append(truth & ~hide)
        unknowns.append(hide | (H.zoi(H.zoi(truth)) & ~truth))
    bst = BP.make(
        state=board.from_dense(jnp.asarray(np.stack(states))),
        unknown=board.from_dense(jnp.asarray(np.stack(unknowns))),
    )
    got, got_levels = SP.propagate_fused_beam(bst, batch_tile=8,
                                              interpret=_interp())
    expect = BP.propagate(bst)
    exp_levels = BP.branch_levels(expect.stable)
    ok = np.asarray(got.consistent)
    assert (ok == np.asarray(expect.consistent)).all()
    for g, e in zip(got_levels, exp_levels):
        assert (np.asarray(g)[ok] == np.asarray(e)[ok]).all()


def test_beam_fused_minimise_false_inconsistent():
    """fused=True with minimise=False (the weld.unweldable_mask mode):
    found / proved_inconsistent / best must match the jnp runner on a
    batch mixing a satisfiable instance with an unsatisfiable one."""
    from lifeapi_tpu.stable import complete as C

    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(20, 20), (21, 20)])
    unknown = (board.zoi(eater) & ~eater) | hide
    sat_state = board.to_dense(eater & ~hide)
    sat_unknown = board.to_dense(unknown)
    # unsatisfiable: a lone ON cell whose whole neighbourhood is known OFF
    lone = board.to_dense(board.from_cells([(40, 40)]))
    none = np.zeros((N, N), bool)
    st = P.make(
        state=jnp.asarray(np.stack([sat_state, lone, sat_state])),
        unknown=jnp.asarray(np.stack([sat_unknown, none, sat_unknown])),
    )
    ref = C.complete_stable_beam(st, frontier=8, iters=16, minimise=False,
                                 fused=False)
    got = C.complete_stable_beam(st, frontier=8, iters=16, minimise=False,
                                 fused=True, interpret=_interp())
    assert (got.found == ref.found).all()
    assert (got.proved_inconsistent == ref.proved_inconsistent).all()
    assert got.found[0] and not got.found[1]
    assert got.proved_inconsistent[1]
    assert (got.best[got.found] == ref.best[ref.found]).all()
    assert (got.best_pop[got.found] == ref.best_pop[ref.found]).all()


def test_beam_seeded_fused_matches_jnp():
    """Seed-proximity branching (reference useSeed, LifeStable.hpp:
    1366-1375): the fused kernel and the jnp runner must make identical
    decisions under a seed restriction, and the result must still be a
    genuine still life."""
    from lifeapi_tpu.core.step import step as life_step
    from lifeapi_tpu.stable import complete as C

    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(20, 20), (21, 20), (22, 21)])
    unknown = (board.zoi(board.zoi(eater)) & ~eater) | hide
    B = 3
    st = P.make(
        state=jnp.broadcast_to(board.to_dense(eater & ~hide), (B, N, N)),
        unknown=jnp.broadcast_to(board.to_dense(unknown), (B, N, N)),
    )
    seed = jnp.broadcast_to(eater & ~hide, (B, 64, 2))
    ref = C.complete_stable_beam(st, frontier=4, iters=24, minimise=True,
                                 fused=False, seed=seed)
    got = C.complete_stable_beam(st, frontier=4, iters=24, minimise=True,
                                 fused=True, interpret=_interp(), seed=seed)
    assert (got.found == ref.found).all()
    assert (got.best_pop == ref.best_pop).all()
    assert (got.best == ref.best).all()
    assert (got.proved_inconsistent == ref.proved_inconsistent).all()
    for i in range(B):
        if ref.found[i]:
            b = board.from_dense(jnp.asarray(ref.best[i]))
            assert bool(board.equal(life_step(b), b))
    assert ref.found.any()


def test_beam_fused_random_instances_match_jnp(rng):
    """Randomized decision-equivalence sweep of the whole-search kernel vs
    the packed jnp runner (minimise=True, F=8)."""
    from lifeapi_tpu.stable import complete as C
    from lifeapi_tpu.stable import host as H

    B = 6
    states, unknowns = [], []
    for i in range(B):
        truth = np.zeros((N, N), bool)
        for _ in range(3):
            x, y = rng.integers(8, 52, 2)
            truth[x:x + 2, y:y + 2] = True
        hide = (rng.random((N, N)) < 0.35) & H.zoi(truth)
        states.append(truth & ~hide)
        unknowns.append(hide | (H.zoi(truth) & ~truth))
    st = P.make(
        state=jnp.asarray(np.stack(states)),
        unknown=jnp.asarray(np.stack(unknowns)),
    )
    ref = C.complete_stable_beam(st, frontier=8, iters=12, minimise=True,
                                 fused=False)
    got = C.complete_stable_beam(st, frontier=8, iters=12, minimise=True,
                                 fused=True, interpret=_interp())
    assert (got.found == ref.found).all()
    assert (got.best_pop == ref.best_pop).all()
    assert (got.best == ref.best).all()
    assert (got.proved_inconsistent == ref.proved_inconsistent).all()


def test_beam_init_bound():
    """init_bound = branch-and-bound with a known incumbent: candidates
    at/above the bound prune; found means strictly better."""
    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(20, 20), (21, 20)])
    unknown = (board.zoi(eater) & ~eater) | hide
    from lifeapi_tpu.stable import complete as C

    bst = BP.make(
        state=jnp.broadcast_to(eater & ~hide, (4, 64, 2)),
        unknown=jnp.broadcast_to(unknown, (4, 64, 2)),
    )
    # fused + jnp paths: bound 7 (the minimum) -> nothing strictly better
    for fused in (True, False):
        r_tight = C.complete_stable_beam(
            bst, frontier=4, iters=24, minimise=True, fused=fused,
            interpret=_interp() if fused else False, dense=False,
            init_bound=7,
        )
        assert not r_tight.found.any(), fused
        # bound 8: the pop-7 eater must be found
        r_loose = C.complete_stable_beam(
            bst, frontier=4, iters=24, minimise=True, fused=fused,
            interpret=_interp() if fused else False, dense=False,
            init_bound=8,
        )
        assert r_loose.found.all(), fused
        assert (np.asarray(r_loose.best_pop) == 7).all(), fused


def test_complete_stable_beam_queued_matches_per_chunk():
    """Round 5: the queued multi-batch API must equal per-chunk fused
    beam calls exactly, including the non-multiple padding path and a
    chunk too small for the lane-tile knee."""
    import jax.numpy as jnp
    import numpy as np

    from lifeapi_tpu.core import board, rle
    from lifeapi_tpu.stable import bitplane as BP
    from lifeapi_tpu.stable import complete as C

    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(20, 20), (21, 20)])
    unknown = (board.zoi(eater) & ~eater) | hide
    B = 21  # deliberately not a chunk multiple
    sts = jnp.stack([jnp.roll(eater & ~hide, i, axis=-2) for i in range(B)])
    uns = jnp.stack([jnp.roll(unknown, i, axis=-2) for i in range(B)])
    bst = BP.make(state=sts, unknown=uns)

    ref = C.complete_stable_beam(bst, frontier=4, iters=16, fused=True,
                                 interpret=True, return_boards=False)
    got = C.complete_stable_beam_queued(bst, chunk=8, frontier=4, iters=16,
                                        interpret=True)
    assert (ref.found == got.found).all()
    assert (ref.best_pop == got.best_pop).all()
    assert (ref.proved_inconsistent == got.proved_inconsistent).all()
