import numpy as np
import jax.numpy as jnp

from lifeapi_tpu.core import board, step
from oracle import life_step_dense, neighbour_count_dense, random_dense

GLIDER = [(1, 0), (2, 1), (0, 2), (1, 2), (2, 2)]
BLOCK = [(0, 0), (0, 1), (1, 0), (1, 1)]
BLINKER = [(0, 0), (1, 0), (2, 0)]


def test_step_matches_dense_oracle(rng):
    d = random_dense(rng, p=0.35, batch=(8,))
    p = board.from_dense(jnp.asarray(d))
    got = np.asarray(board.to_dense(step.step(p)))
    expect = life_step_dense(d)
    assert (got == expect).all()


def test_step_alt_differential(rng):
    # The reference's StepAltTest (tests/StepAltTest.cpp:5-13): two
    # independently derived step implementations must agree on random boards.
    d = random_dense(rng, p=0.5, batch=(2048,))
    p = board.from_dense(jnp.asarray(d))
    a = step.step(p)
    b = step.step_alt(p)
    assert bool(board.equal(a, b).all())


def test_step_known_patterns():
    # block is a still life
    blk = board.from_cells(BLOCK)
    assert bool(board.equal(step.step(blk), blk))
    # blinker has period 2
    bl = board.from_cells(BLINKER)
    assert bool(board.equal(step.step_n(bl, 2), bl))
    assert not bool(board.equal(step.step(bl), bl))
    # glider translates by (1,1) every 4 generations
    g = board.from_cells(GLIDER)
    assert bool(board.equal(step.step_n(g, 4), board.move(g, 1, 1)))


def test_step_torus_wrap():
    # glider crossing the seam must wrap cleanly
    g = board.move(board.from_cells(GLIDER), 62, 62)
    d = np.asarray(board.to_dense(g))
    for _ in range(16):
        g = step.step(g)
        d = life_step_dense(d)
    assert (np.asarray(board.to_dense(g)) == d).all()


def test_neighbour_counts(rng):
    d = random_dense(rng, p=0.4)
    p = board.from_dense(jnp.asarray(d))
    planes = step.neighbour_counts(p)
    got = np.asarray(step.count_planes_to_int(*planes))
    expect = neighbour_count_dense(d, include_center=True)
    assert (got == expect).all()


def test_with_exactly(rng):
    d = random_dense(rng, p=0.4)
    p = board.from_dense(jnp.asarray(d))
    planes = step.neighbour_counts(p)
    cnt = neighbour_count_dense(d, include_center=True)
    for n in range(10):
        got = np.asarray(board.to_dense(step.with_exactly(planes, n)))
        assert (got == (cnt == n)).all(), n


def test_count_add_subtract(rng):
    d1 = random_dense(rng, p=0.3)
    d2 = random_dense(rng, p=0.3)
    p1 = step.neighbour_counts(board.from_dense(jnp.asarray(d1)))
    p2 = step.neighbour_counts(board.from_dense(jnp.asarray(d2)))
    s = step.add_counts(p1, p2)
    got = np.asarray(step.count_planes_to_int(*s))
    expect = (
        neighbour_count_dense(d1) + neighbour_count_dense(d2)
    ) % 16
    assert (got == expect).all()
    # subtract: (a + b) - b == a
    diff = step.subtract_counts(s, p2)
    got = np.asarray(step.count_planes_to_int(*diff))
    assert (got == neighbour_count_dense(d1) % 16).all()


def test_interaction_counts(rng):
    # Reference predict-then-simulate test style
    # (tests/InteractionTest.cpp:30-55): check against masks built from
    # CountNeighbourhood.
    d = random_dense(rng, p=0.3, batch=(4,))
    p = board.from_dense(jnp.asarray(d))
    out1, out2, out_more, nxt = step.interaction_counts_and_next(p)
    cnt = neighbour_count_dense(d, include_center=False)
    off = ~d
    assert (np.asarray(board.to_dense(out1)) == (off & (cnt == 1))).all()
    assert (np.asarray(board.to_dense(out2)) == (off & (cnt == 2))).all()
    assert (np.asarray(board.to_dense(out_more)) == (off & (cnt >= 3))).all()
    assert (np.asarray(board.to_dense(nxt)) == life_step_dense(d)).all()


def test_step_for_cell(rng):
    d = random_dense(rng, p=0.4)
    p = board.from_dense(jnp.asarray(d))
    nxt = life_step_dense(d)
    for x, y in [(0, 0), (5, 63), (63, 0), (17, 31), (31, 32)]:
        assert bool(step.step_for_cell(p, x, y)) == bool(nxt[x, y])


def test_stepped_trajectory():
    g = board.from_cells(GLIDER)
    traj = step.stepped_trajectory(g, 8)
    assert traj.shape == (8, 64, 2)
    assert bool(board.equal(traj[3], step.step_n(g, 4)))
