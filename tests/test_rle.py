import numpy as np
import jax.numpy as jnp

from lifeapi_tpu.core import board, rle
from lifeapi_tpu import history
from oracle import random_dense

GLIDER_RLE = "bob$2bo$3o!"
EATER_RLE = "2o$obo$2bo$2b2o!"


def test_parse_glider():
    p = rle.parse(GLIDER_RLE)
    assert board.on_cells(p) == [(0, 2), (1, 0), (1, 2), (2, 1), (2, 2)]


def test_bare_dollar_advances_row():
    # The intended semantics (Parsing.hpp:162-164) that the reference's
    # ConstantParse drops (SURVEY.md section 2.7): a bare $ is one row.
    p = rle.parse("2o$2o!")
    assert int(board.population(p)) == 4
    assert board.on_cells(p) == [(0, 0), (0, 1), (1, 0), (1, 1)]


def test_multi_dollar_and_header():
    p = rle.parse("x = 3, y = 5, rule = B3/S23\no3$o!")
    assert board.on_cells(p) == [(0, 0), (0, 3)]


def test_roundtrip_is_centered_move(rng):
    # parse(to_rle(b)) == move(b, -32, -32), like the reference writer
    d = random_dense(rng, p=0.2)
    p = board.from_dense(jnp.asarray(d))
    back = rle.parse(rle.to_rle(p))
    assert bool(board.equal(back, board.move(p, -32, -32)))


def test_write_parse_fixture():
    p = rle.parse(EATER_RLE)
    s = rle.to_rle(board.move(p, 32, 32))  # undo centering for round trip
    assert rle.parse(s) is not None
    back = rle.parse(s)
    assert bool(board.equal(back, p))


def test_row_rle_runs():
    boards = [np.asarray(board.to_dense(rle.parse("3o!")))] * 2
    s = rle.row_rle(boards)
    assert "$" in s and "o" in s


def test_format_grid_contains_pattern():
    p = board.from_cells([(0, 0)])
    s = rle.format_grid(np.asarray(board.to_dense(p)))
    assert "O" in s
    assert len(s.splitlines()) == 64


def test_history_roundtrip():
    h = history.LifeHistory.create(
        state=board.from_cells([(1, 1), (2, 2)]),
        marked=board.from_cells([(1, 1)]),
        original=board.from_cells([(2, 2)]),
    )
    s = h.rle()
    # chars: (1,1) state+marked = C; (2,2) state+original = E
    assert "C" in s and "E" in s
    h2 = history.parse(s).move(32, 32)  # undo writer centering
    assert bool(board.equal(h2.state, h.state))
    assert bool(board.equal(h2.marked, h.marked))
    assert bool(board.equal(h2.original, h.original))


def test_history_parse_bellman():
    h = history.parse_bellman("C2E$!")
    assert board.on_cells(h.state) == [(0, 0)]
    assert board.on_cells(h.history) == [(1, 0), (2, 0)]
