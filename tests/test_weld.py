import numpy as np
import jax.numpy as jnp

from lifeapi_tpu import weld as W
from lifeapi_tpu.core import board, rle, step
from lifeapi_tpu.stable import complete as C
from lifeapi_tpu.stable import host as HO
from lifeapi_tpu.stable import propagate as P

# the reference test fixtures (tests/LifeWeldTest.cpp), parsed with correct
# bare-$ semantics (the snapshot test relied on the buggy ConstantParse,
# SURVEY.md section 2.7)
STILL_LIFES = [
    "2b2o$bobo$bo$2o!",
    "2o$2o!",
]

REQUIRED_PAIRS = [
    ("2b2o$bobo$bo$2o!", "2b2o$b3o$b4o$5o$4o$4o!", (-1, -1)),
    (
        "2o$o2bob2o$b3obobo$5bobo$b5ob3o$bo4bo3bo$4bobo2b2o$4b2o!",
        "4o$5o2bo$4o$5o4bo$b5ob5o$b12o$b12o$b12o$4b9o$4b4o!",
        (-1, -1),
    ),
    (
        "4b2ob2o$3bobobobo$b3o3bobo$o4bobob3o$b3ob2obo3bo$3bo4bo2b2o$5b3o$4b2o!",
        "4b2o$3b2o2bo2b2o$b4o6bo$6obob5o$15o$15o$b14o$3b12o$4b6o$4b4o!",
        (-1, -1),
    ),
]


def _parse_centered(s, dx=0, dy=0):
    # parse then move into mid-board so ZOIs don't straddle the seam
    return board.move(rle.parse(s), 20 + dx, 20 + dy)


def test_weld_of_still_life_is_step_invariant():
    # reference LifeWeldTest.StableTest intent
    for s in STILL_LIFES:
        st = _parse_centered(s)
        w = W.LifeWeld.from_state(st)
        assert bool(W.step(w).equal(w)), s


def test_from_required_is_step_invariant():
    # reference LifeWeldTest.RequiredTest intent
    for s, req, (dx, dy) in REQUIRED_PAIRS:
        state = _parse_centered(s)
        required = _parse_centered(req, dx, dy)
        w = W.from_required(state, required)
        assert bool(W.step(w).equal(w)), s
        # the stator was actually stripped somewhere (frozen counts exist)
        assert not bool(board.is_empty(w.all_frozen())), s


def test_weld_step_matches_plain_step_without_frozen(rng):
    from oracle import random_dense

    d = random_dense(rng, p=0.3)
    st = board.from_dense(jnp.asarray(d))
    w = W.LifeWeld.from_state(st)
    assert bool(board.equal(W.step(w).state, step.step(st)))


def test_weld_step_n():
    glider = board.move(rle.parse("bob$2bo$3o!"), 30, 30)
    w = W.LifeWeld.from_state(glider)
    w4 = W.step_n(w, 4)
    assert bool(board.equal(w4.state, board.move(glider, 1, 1)))


def test_to_target_and_interaction_counts():
    st = _parse_centered(STILL_LIFES[0])
    req = _parse_centered("2b2o$b3o$b4o$5o$4o$4o!", -1, -1)
    w = W.from_required(st, req)
    t = W.to_target(w)
    assert bool(board.contains(w.state, t.wanted))
    out1, out2, out_more = W.interaction_counts(w)
    # masked to the non-frozen ZOI
    nf_zoi = board.zoi(w.state & ~w.all_frozen())
    assert bool(board.is_empty(out1 & ~nf_zoi))


def test_to_stable_is_consistent_and_completable():
    st = _parse_centered(STILL_LIFES[0])
    w = W.LifeWeld.from_state(st)
    stab = W.to_stable(w)
    res = P.propagate(stab)
    assert bool(res.consistent)
    host_st = HO.HostStable(
        np.asarray(stab.state), np.asarray(stab.unknown), np.asarray(stab.ruled)
    )
    result, best = C.complete_stable(host_st, timeout=3.0, minimise=False)
    assert result == C.CompletionResult.COMPLETED


def test_bellman_rle():
    st = _parse_centered(STILL_LIFES[0])
    req = _parse_centered("2b2o$b3o$b4o$5o$4o$4o!", -1, -1)
    w = W.from_required(st, req)
    s = W.to_bellman_rle(w)
    assert "C" in s


def test_interaction_offsets_frozen_aware():
    st = _parse_centered(STILL_LIFES[1])  # block
    w = W.LifeWeld.from_state(st)
    offs = W.interaction_offsets(w, w)
    # offset (0,0) overlaps: must be flagged
    assert bool(board.get_cell(offs, 0, 0))
    # far-away offsets don't interact
    assert not bool(board.get_cell(offs, 30, 30))


def test_unweldable_mask_beam_never_marks_weldable_placements():
    """Two plain still lifes weld at every non-interacting offset; the
    beam engine's inconsistency proofs must mark nothing."""
    a = W.LifeWeld.from_state(_parse_centered("2o$2o!"))
    b = W.LifeWeld.from_state(_parse_centered("2b2o$bobo$bo$2o!"))

    window = np.zeros((64, 64), bool)
    window[3:7, 1:5] = True
    good0 = board.from_dense(jnp.asarray(~window))

    inter = np.asarray(board.to_dense(W.interaction_offsets(a, b)))
    beam_bad = np.asarray(board.to_dense(W.unweldable_mask(
        a, b, starting_good=good0, engine="beam",
        batch_size=16, beam_iters=16)))
    assert not (beam_bad & window & ~inter).any()


def test_unweldable_mask_beam_subset_of_host():
    """Every placement the beam proves unweldable must also be
    INCONSISTENT for the reference-faithful host DFS engine."""
    state = _parse_centered(REQUIRED_PAIRS[0][0])
    required = _parse_centered(REQUIRED_PAIRS[0][1], -1, -1)
    a = W.from_required(state, required)
    b = W.LifeWeld.from_state(_parse_centered("2o$2o!"))

    window = np.zeros((64, 64), bool)
    window[1:5, 1:4] = True
    good0 = board.from_dense(jnp.asarray(~window))

    inter = np.asarray(board.to_dense(W.interaction_offsets(a, b)))
    host_bad = np.asarray(board.to_dense(W.unweldable_mask(
        a, b, starting_good=good0, solve_timeout=3.0)))
    beam_bad = np.asarray(board.to_dense(W.unweldable_mask(
        a, b, starting_good=good0, engine="beam",
        batch_size=16, beam_iters=16)))
    hw = host_bad & window & ~inter
    bw = beam_bad & window & ~inter
    assert (bw <= hw).all()


def test_unweldable_mask_host_return_stats():
    """Round-5 review: return_stats must be honored by BOTH engines."""
    a = W.LifeWeld.from_state(_parse_centered("2o$2o!"))
    b = W.LifeWeld.from_state(_parse_centered("2o$2o!"))
    window = np.zeros((64, 64), bool)
    window[3:5, 3:5] = True
    good0 = board.from_dense(jnp.asarray(~window))
    mask, stats = W.unweldable_mask(
        a, b, starting_good=good0, engine="host", solve_timeout=0.02,
        return_stats=True)
    assert mask.shape == (64, 2)
    assert stats["placements"] >= 0 and "host_determined" in stats


def test_to_stable_with_history_pipeline():
    """End-to-end Bellman workflow (reference ToStable(active, duration,
    mask), LifeWeld.hpp:327-400 — previously untested): strip an eater's
    stator, replay the glider reaction under option restrictions,
    complete a stator, and verify the completed background still
    performs the reaction bit-exactly."""
    from lifeapi_tpu.core.step import step_n
    from lifeapi_tpu.stable import propagate as P
    from lifeapi_tpu.symmetry import transforms as tr
    from lifeapi_tpu.symmetry.transforms import SymmetryTransform as T

    def build(pat, pre_dx=0, pre_dy=0, dx=0, dy=0):
        b = board.move(rle.parse(pat), pre_dx, pre_dy)
        b = tr.transform(b, T.Rotate270)
        return board.move(b, 24 + dx, 24 + dy)

    glider = board.move(rle.parse("bob$2bo$3o!"), 8, 8)
    catalyst = build("2b2o$bobo$bo$2o!", dx=0, dy=4)
    required = build("2b2o$b3o$b4o$5o$4o$4o!", pre_dx=-1, pre_dy=-1,
                     dx=0, dy=4)
    w = W.from_required(catalyst, required)
    assert bool(W.step(w).equal(w))
    assert not bool(board.is_empty(catalyst & ~w.state))  # stator stripped

    H = 64
    stab = W.to_stable_with_history(w, glider, H)
    area = board.big_zoi(catalyst)
    stab = P.set_off(stab, board.to_dense(~area & ~w.state))
    host_st = HO.HostStable(
        np.asarray(stab.state), np.asarray(stab.unknown),
        np.asarray(stab.ruled))
    result, best = C.complete_stable(host_st, timeout=30.0, minimise=True)
    assert result == C.CompletionResult.COMPLETED
    background = board.from_dense(jnp.asarray(best))
    assert bool(board.equal(step_n(background, 1), background))
    final = step_n(background | glider, H)
    assert bool(board.equal(final, background))
