import numpy as np
import jax

from lifeapi_tpu.state import LifeState
from lifeapi_tpu.core import strips
from lifeapi_tpu.symmetry import SymmetryTransform as T

GLIDER_RLE = "bob$2bo$3o!"


def test_wrapper_basic():
    g = LifeState.parse(GLIDER_RLE)
    assert int(g.population) == 5
    assert bool((g.stepped(4) == g.moved(1, 1)))
    assert not bool(g.is_empty)
    assert bool((~g | g).is_empty == False)


def test_wrapper_pytree():
    g = LifeState.parse(GLIDER_RLE)
    stepped = jax.jit(lambda s: s.stepped())(g)
    assert isinstance(stepped, LifeState)
    assert bool(stepped == g.stepped())


def test_wrapper_transform_and_match():
    g = LifeState.parse(GLIDER_RLE)
    t = g.transformed(T.Rotate90)
    back = t.transformed(T.Rotate270)
    assert bool(back == g)
    m = (g.moved(7, 9)).match(g)
    assert bool(m.get(7, 9))


def test_count_neighbours():
    blk = LifeState.from_cells([(0, 0), (0, 1), (1, 0), (1, 1)])
    assert int(blk.count_neighbours((0, 0))) == 3
    assert int(blk.count_neighbours((2, 2))) == 1


def test_strips_roundtrip():
    g = LifeState.parse(GLIDER_RLE).moved(10, 10)
    s = g.get_strip(10)
    assert s.shape == (4, 2)
    cleared = g.set_strip(10, np.zeros((4, 2), dtype=np.uint32))
    # strip of width 4 at column 10 covers columns 9..12
    for x, y in g.on_cells():
        expect = not (9 <= x <= 12)
        assert bool(cleared.get(x, y)) == expect


def test_patch_roundtrip():
    g = LifeState.parse(GLIDER_RLE).moved(20, 20)
    val = g.get_patch((21, 21), 2)
    blank = LifeState()
    restored = blank.set_patch((21, 21), 2, val)
    # the patch covers the whole glider
    assert bool(restored == g)


def test_strip_indices():
    mask = (1 << 5) | (1 << 6) | (1 << 40)
    starts = strips.strip_indices(mask)
    # windows cover all set columns without wrapping
    covered = set()
    for s in starts:
        assert 0 <= s <= 60
        covered.update(range(s, s + 4))
    assert {5, 6, 40} <= covered
