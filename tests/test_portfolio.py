"""Single-hard-instance portfolio search (complete.complete_stable_portfolio):
orbit-randomized beam replicas of ONE problem in one batched kernel call."""

import numpy as np
import jax
import jax.numpy as jnp

from lifeapi_tpu.core import board, rle
from lifeapi_tpu.core.step import step as life_step
from lifeapi_tpu.stable import complete as C


def test_portfolio_reconstructs_eater():
    eater = board.move(rle.parse("2b2o$bobo$bo$2o!"), 20, 20)
    hide = board.from_cells([(20, 20), (21, 20), (22, 20)])
    unknown = (board.zoi(eater) & ~eater) | hide
    state = eater & ~hide
    res = C.complete_stable_portfolio(
        state, unknown, jax.random.key(0), replicas=32, frontier=4,
        iters=24, fused=False,
    )
    assert res.found
    b = jnp.asarray(res.best)
    # a genuine still life, consistent with the knowns, inside the area,
    # in the ORIGINAL orientation (back-transform correctness)
    assert bool(board.equal(life_step(b), b))
    assert bool(board.is_empty(state & ~b))
    assert bool(board.is_empty(b & ~(state | unknown)))
    # minimal known completion of this instance is the eater itself
    assert res.best_pop <= int(board.population(eater))


def test_portfolio_unsat_instance():
    lone = board.from_cells([(40, 40)])
    none = jnp.zeros((64, 2), jnp.uint32)
    res = C.complete_stable_portfolio(
        lone, none, jax.random.key(1), replicas=16, frontier=4, iters=8,
        fused=False,
    )
    assert not res.found
    assert res.found_fraction == 0.0
