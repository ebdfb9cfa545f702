import numpy as np
import jax
import jax.numpy as jnp

from lifeapi_tpu.core import board, rle, step
from lifeapi_tpu.stable import options as opt
from lifeapi_tpu.stable.api import LifeStable

EATER = "2b2o$bobo$bo$2o!"


def _eater():
    return board.move(rle.parse(EATER), 20, 20)


def test_wrapper_basic_flow():
    e = _eater()
    st = LifeStable.from_boards(state=e, unknown=board.zoi(e) & ~e)
    st, consistent, changed = st.propagate()
    assert bool(consistent)
    st.sanity_check()
    # plane views reflect sync: known-ON cells have all dead options ruled
    dead0 = st.plane("dead0")
    assert bool(board.contains(dead0, e))


def test_wrapper_complete():
    e = _eater()
    unknown = board.zoi(e) & ~e
    # hide two cells
    hide = board.from_cells([(20, 20), (21, 20)])
    st = LifeStable.from_boards(state=e & ~hide, unknown=unknown | hide)
    result, best = st.complete_stable(timeout=5.0, minimise=True)
    d = np.asarray(board.to_dense(best))
    from oracle import life_step_dense

    assert (life_step_dense(d) == d).all()


def test_wrapper_set_and_options():
    st = LifeStable.from_boards(batch=())
    st = st.set_cell_on((5, 5))
    assert int(st.get_options((5, 5))) == opt.LIVE_MASK
    st = st.set_cell_off((7, 7))
    assert int(st.get_options((7, 7))) == opt.DEAD_MASK


def test_wrapper_moved_transformed():
    e = _eater()
    st = LifeStable.from_boards(state=e, unknown=board.zoi(e) & ~e)
    mv = st.moved(3, 4)
    assert bool(board.equal(mv.state, board.move(e, 3, 4)))
    from lifeapi_tpu.symmetry import SymmetryTransform as T

    tr = st.transformed(T.Rotate90)
    back = tr.transformed(T.Rotate270)
    assert bool(board.equal(back.state, e))


def test_wrapper_jit_pytree():
    e = _eater()
    st = LifeStable.from_boards(state=e, unknown=board.zoi(e) & ~e)

    @jax.jit
    def f(s):
        out, cons, _ = s.propagate()
        return out, cons

    out, cons = f(st)
    assert bool(cons)


def test_api_portfolio():
    e = _eater()
    hide = board.from_cells([(20, 20), (21, 20)])
    st = LifeStable.from_boards(
        state=e & ~hide, unknown=(board.zoi(e) & ~e) | hide
    )
    res = st.complete_stable_portfolio(
        jax.random.key(0), replicas=16, frontier=4, iters=24
    )
    assert res.found
    from lifeapi_tpu.core.step import step as life_step

    b = jnp.asarray(res.best)
    assert bool(board.equal(life_step(b), b))
